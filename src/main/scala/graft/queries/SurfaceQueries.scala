package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables._

/** SQL-surface completeness wave: the grouping/join/reshape forms a
  * user porting reference notebooks would reach for next — CUBE
  * rollups, full-outer reconciliation, ordered list aggregation,
  * unpivot, and the distribution window functions. Each is a thin
  * declarative plan (single hash aggregate or partitioned window), so
  * the 100 TB story is Catalyst's, not ours; the catalog entries pin
  * the semantics against DuckDB.
  */
object SurfaceQueries {

  def queries: Seq[GraftQuery] = Seq(
    q76CubeRevenue, q77FullOuter, q78OrderedListAgg, q79Unpivot,
    q84DistributionWindows, q91VariantJson, q92SessionWindow,
    q94UpsertApply, q97NullSafeJoin, q98EditDistance, q115BagSetOps,
    q116NthValue, q130SnapshotDiff)

  /** CUBE over (returnflag, linestatus): all 2^2 grouping sets in ONE
    * pass — Spark expands the sets inside a single hash aggregate
    * (Expand + partial agg), not 4 scans. Group keys are coalesced to
    * 'ALL' on both sides so the subtotal rows sort/hash identically
    * (fixture columns are non-null, so the sentinel is unambiguous).
    */
  val q76CubeRevenue = GraftQuery(
    "q76_cube_revenue",
    "CUBE(returnflag, linestatus) subtotals in one aggregate pass",
    Some("""SELECT COALESCE(l_returnflag, 'ALL') AS rf,
        COALESCE(l_linestatus, 'ALL') AS ls,
        COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS qty
      FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
      ORDER BY 1, 2"""),
    (s, d) => lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("n"), col("qty"))
      .orderBy(col("rf"), col("ls")))

  /** Full-outer reconciliation: which side of customer⋈orders has
    * unmatched rows. Each side is pre-filtered (low nations / urgent
    * orders) so all three classes actually occur in the fixtures —
    * every fixture customer has orders, so the unfiltered join never
    * exercises the outer legs. The join keys stay the shuffle keys;
    * the CASE classification is a scan-stage expression.
    */
  val q77FullOuter = GraftQuery(
    "q77_full_outer",
    "filtered customer FULL OUTER JOIN orders, classified by side",
    Some("""SELECT CASE WHEN o.o_orderkey IS NULL THEN 'customer_only'
          WHEN c.c_custkey IS NULL THEN 'order_only' ELSE 'both' END AS side,
        COUNT(*) AS n
      FROM (SELECT * FROM customer WHERE c_nationkey < 13) c
      FULL OUTER JOIN
        (SELECT * FROM orders WHERE o_orderpriority = '1-URGENT') o
        ON c.c_custkey = o.o_custkey
      GROUP BY 1 ORDER BY 1"""),
    (s, d) => customer(s, d).filter(col("c_nationkey") < 13)
      .join(orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "full_outer")
      .select(when(col("o_orderkey").isNull, "customer_only")
        .when(col("c_custkey").isNull, "order_only")
        .otherwise("both").as("side"))
      .groupBy(col("side"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("side")))

  /** Ordered list aggregation: per-customer priorities gathered into
    * ONE deterministic string. `collect_list` order is
    * partition-dependent, so the list is `array_sort`ed before
    * `concat_ws` — sorting by the value itself is the only
    * shuffle-order-independent contract (DuckDB's `ORDER BY` inside
    * string_agg states the same one). Arrays never reach the result
    * schema (the r2 q52 lesson: the driver compare can't sort array
    * cells).
    */
  val q78OrderedListAgg = GraftQuery(
    "q78_ordered_list_agg",
    "per-customer sorted priority list via collect_list→array_sort",
    Some("""SELECT o_custkey, COUNT(*) AS n,
        string_agg(o_orderpriority, ',' ORDER BY o_orderpriority) AS prios
      FROM orders GROUP BY 1 ORDER BY 1"""),
    (s, d) => orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"),
        concat_ws(",", array_sort(collect_list(col("o_orderpriority"))))
          .as("prios"))
      .orderBy(col("o_custkey")))

  /** Unpivot (wide measures → long rows) via `stack` — a Generate over
    * the aggregated 6-row frame, so the reshape costs nothing after
    * the aggregate. The oracle is the portable UNION ALL form.
    */
  val q79Unpivot = GraftQuery(
    "q79_unpivot",
    "unpivot per-flag measure columns to (metric, value) rows",
    Some("""WITH a AS (
        SELECT l_returnflag, ROUND(SUM(l_quantity), 2) AS qty,
          ROUND(SUM(l_extendedprice), 2) AS price,
          ROUND(SUM(l_discount), 2) AS disc
        FROM lineitem GROUP BY 1)
      SELECT l_returnflag, 'disc' AS metric, disc AS value FROM a
      UNION ALL
      SELECT l_returnflag, 'price' AS metric, price AS value FROM a
      UNION ALL
      SELECT l_returnflag, 'qty' AS metric, qty AS value FROM a
      ORDER BY 1, 2"""),
    (s, d) => lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(round(sum(col("l_quantity")), 2).as("qty"),
        round(sum(col("l_extendedprice")), 2).as("price"),
        round(sum(col("l_discount")), 2).as("disc"))
      .selectExpr("l_returnflag",
        "stack(3, 'qty', qty, 'price', price, 'disc', disc) AS (metric, value)")
      .orderBy(col("l_returnflag"), col("metric")))

  /** Semi-structured props via VariantType (Spark 4): `try_parse_json`
    * once into a variant, then typed `variant_get` paths — the
    * open-schema sibling of q21's `get_json_object`. Variant stores a
    * parsed binary form, so repeated path extraction doesn't re-parse
    * the JSON text per path (get_json_object does) — the difference
    * between 1 and k parses per row when k paths are read at 100 TB.
    * try_parse_json, not parse_json: one malformed props row must
    * yield NULL like q21 and the oracle do, not abort the scan (the
    * q108 null-on-error contract).
    */
  val q91VariantJson = GraftQuery(
    "q91_variant_json",
    "typed variant_get over try_parse_json'd props (q21's variant twin)",
    Some("""SELECT event_type,
        CAST(SUM(CAST(props ->> 'k' AS BIGINT)) AS BIGINT) AS k_sum,
        MAX(CAST(props ->> 'k' AS BIGINT)) AS k_max,
        ROUND(AVG(CAST(props ->> 'k' AS BIGINT)), 4) AS k_avg,
        COUNT(*) AS n
      FROM events GROUP BY 1 ORDER BY 1"""),
    (s, d) => events(s, d)
      .select(col("event_type"),
        variant_get(try_parse_json(col("props")), "$.k", "long").as("k"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("k_sum"), max(col("k")).as("k_max"),
        round(avg(col("k")), 4).as("k_avg"), count(lit(1)).as("n"))
      .orderBy(col("event_type")))

  /** Native session windows: `session_window(ts, gap)` merges events
    * closer than the gap into one window inside a single aggregate —
    * no lag/islands window pass (q37's form), and the SAME expression
    * works under `readStream` + watermark, where the islands trick
    * cannot (it needs the whole history sorted). Session identity:
    * an event extends a session iff it lands strictly inside
    * [start, last+gap) — the oracle's islands CTE uses `>= gap` for a
    * new session to match. Timestamps compare as epoch-µs (the
    * TIMESTAMP(NANOS) fixture rule).
    */
  val q92SessionWindow = GraftQuery(
    "q92_session_window",
    "per-user session rollup via native session_window(ts, 4h)",
    Some("""WITH o AS (
        SELECT user_id, epoch_us(ts) AS us FROM events),
      flagged AS (
        SELECT user_id, us,
          CASE WHEN LAG(us) OVER w IS NULL
            OR us - LAG(us) OVER w >= 14400000000 THEN 1 ELSE 0 END AS is_new
        FROM o WINDOW w AS (PARTITION BY user_id ORDER BY us)),
      sess AS (
        SELECT user_id, us,
          SUM(is_new) OVER (PARTITION BY user_id ORDER BY us
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM flagged)
      SELECT user_id, CAST(sid AS INTEGER) AS sid, COUNT(*) AS n_events,
        MIN(us) AS first_us, MAX(us) AS last_us
      FROM sess GROUP BY 1, 2 ORDER BY 1, 2"""),
    (s, d) => {
      val sessions = events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "4 hours"))
        .agg(count(lit(1)).as("n_events"),
          min(unix_micros(col("ts"))).as("first_us"),
          max(unix_micros(col("ts"))).as("last_us"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("first_us"))
      sessions
        .select(col("user_id"), row_number().over(w).as("sid"),
          col("n_events"), col("first_us"), col("last_us"))
        .orderBy(col("user_id"), col("sid"))
    })

  /** MERGE/upsert semantics without a table format: a CDC change set
    * (upserts + deletes) applied to a base table through ONE full-outer
    * join on the key — unmatched base rows pass through, matched
    * non-delete rows take the change's values, deletes drop, unmatched
    * changes insert. This is the Delta/Iceberg MERGE INTO contract
    * expressed as a plain shuffle join (copy-on-write style), so it
    * runs at any scale Spark joins run. The change set here is derived
    * deterministically from the base (updates for key%10==0, deletes
    * for key%17==0, inserts above max key) so the oracle can derive
    * the identical set.
    */
  val q94UpsertApply = GraftQuery(
    "q94_upsert_apply",
    "CDC upsert+delete change set applied via full-outer merge join",
    Some("""WITH changes AS (
        SELECT c_custkey AS k,
          CASE WHEN c_custkey % 17 = 0 THEN 'D' ELSE 'U' END AS op,
          c_acctbal + 100 AS new_bal
        FROM customer WHERE c_custkey % 10 = 0 OR c_custkey % 17 = 0
        UNION ALL
        SELECT (SELECT MAX(c_custkey) FROM customer) + 1 + n AS k, 'I' AS op,
          1000.0 + n AS new_bal
        FROM (SELECT unnest(range(5)) AS n)),
      merged AS (
        SELECT COALESCE(c.c_custkey, ch.k) AS k,
          CASE WHEN ch.k IS NULL THEN c.c_acctbal ELSE ch.new_bal END AS bal,
          CASE WHEN ch.k IS NULL THEN 'keep'
            WHEN c.c_custkey IS NULL THEN 'insert'
            WHEN ch.op = 'D' THEN 'delete' ELSE 'update' END AS action
        FROM customer c FULL OUTER JOIN changes ch ON c.c_custkey = ch.k)
      SELECT action, COUNT(*) AS n, ROUND(SUM(bal), 2) AS bal_sum
      FROM merged WHERE action <> 'delete'
      GROUP BY 1 ORDER BY 1"""),
    (s, d) => {
      val base = customer(s, d).select(col("c_custkey"), col("c_acctbal"))
      val updates = base
        .filter(col("c_custkey") % 10 === 0 || col("c_custkey") % 17 === 0)
        .select(col("c_custkey").as("k"),
          when(col("c_custkey") % 17 === 0, "D").otherwise("U").as("op"),
          (col("c_acctbal") + 100).as("new_bal"))
      val maxKey = base.agg(max(col("c_custkey")).as("mk"))
      val inserts = maxKey
        .select(explode(sequence(lit(0), lit(4))).as("n"), col("mk"))
        .select((col("mk") + 1 + col("n")).as("k"), lit("I").as("op"),
          (lit(1000.0) + col("n")).as("new_bal"))
      val changes = updates.unionByName(inserts)
      base.join(changes, col("c_custkey") === col("k"), "full_outer")
        .select(
          when(col("k").isNull, col("c_acctbal")).otherwise(col("new_bal"))
            .as("bal"),
          when(col("k").isNull, "keep")
            .when(col("c_custkey").isNull, "insert")
            .when(col("op") === "D", "delete").otherwise("update")
            .as("action"))
        .filter(col("action") =!= "delete")
        .groupBy(col("action"))
        .agg(count(lit(1)).as("n"), round(sum(col("bal")), 2).as("bal_sum"))
        .orderBy(col("action"))
    })

  /** Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): ordinary
    * `=` drops null-keyed rows from BOTH sides silently — the classic
    * silent-data-loss bug when a dirty key column enters a join.
    * Nulls are planted deterministically (nullif on a modulo), the
    * null-safe join keeps the null⋈null matches, and the count
    * difference vs the plain join is exactly the null-pair block.
    * `<=>` keys still hash-partition (null is one key), so the join
    * stays a plain shuffle join at scale.
    */
  val q97NullSafeJoin = GraftQuery(
    "q97_null_safe_join",
    "null-safe vs plain equality join over a planted-null key",
    Some("""WITH a AS (SELECT nullif(c_custkey % 50, 0) AS k FROM customer),
      b AS (SELECT nullif(o_custkey % 50, 0) AS k FROM orders
            WHERE o_orderkey % 100 = 0)
      SELECT
        (SELECT COUNT(*) FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k)
          AS nullsafe_pairs,
        (SELECT COUNT(*) FROM a JOIN b ON a.k = b.k) AS plain_pairs,
        (SELECT COUNT(*) FROM a WHERE k IS NULL) *
          (SELECT COUNT(*) FROM b WHERE k IS NULL) AS null_block"""),
    (s, d) => {
      val a = customer(s, d)
        .select(nullif(col("c_custkey") % 50, lit(0)).as("k"))
      val b = orders(s, d).filter(col("o_orderkey") % 100 === 0)
        .select(nullif(col("o_custkey") % 50, lit(0)).as("ko"))
      val nullsafe = a.join(b, col("k") <=> col("ko")).count()
      val plain = a.join(b, col("k") === col("ko")).count()
      val nullBlock = a.filter(col("k").isNull).count() *
        b.filter(col("ko").isNull).count()
      import s.implicits._
      Seq((nullsafe, plain, nullBlock))
        .toDF("nullsafe_pairs", "plain_pairs", "null_block")
    })

  /** Edit-distance near-dup (levenshtein) between each document and
    * its source-neighbor (next doc_id in the same source) — the
    * short-string fuzzy-match primitive (titles, names) next to the
    * token-level Jaccard family. Neighbor pairing via one lead window
    * keeps it O(n) pairs; all-pairs edit distance at scale is the
    * LSH/prefix regime, not this one, and the 40-char cap bounds the
    * DP cost per pair.
    */
  val q98EditDistance = GraftQuery(
    "q98_edit_distance",
    "levenshtein to the next same-source doc over 40-char prefixes",
    Some("""WITH t AS (
        SELECT source, doc_id, substr(lower(trim(text)), 1, 40) AS p,
          LEAD(substr(lower(trim(text)), 1, 40)) OVER
            (PARTITION BY source ORDER BY doc_id) AS np,
          LEAD(doc_id) OVER (PARTITION BY source ORDER BY doc_id) AS nid
        FROM documents)
      SELECT source, doc_id, nid AS next_doc,
        CAST(levenshtein(p, np) AS BIGINT) AS dist
      FROM t WHERE np IS NOT NULL ORDER BY source, doc_id"""),
    (s, d) => {
      val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      documents(s, d)
        .select(col("source"), col("doc_id"),
          substring(lower(trim(col("text"))), 1, 40).as("p"))
        .withColumn("np", lead(col("p"), 1).over(w))
        .withColumn("next_doc", lead(col("doc_id"), 1).over(w))
        .filter(col("np").isNotNull)
        .select(col("source"), col("doc_id"), col("next_doc"),
          levenshtein(col("p"), col("np")).cast("long").as("dist"))
        .orderBy(col("source"), col("doc_id"))
    })

  /** Distribution window functions (percent_rank / cume_dist) over
    * per-customer order counts WITHIN nation — the window is
    * partitioned by nation (25 groups), never global, so no
    * single-partition exchange exists at any scale. Ties broken by
    * custkey on both sides for a deterministic hash.
    */
  val q84DistributionWindows = GraftQuery(
    "q84_distribution_windows",
    "percent_rank + cume_dist of order counts within nation",
    Some("""WITH oc AS (
        SELECT c.c_nationkey, c.c_custkey, COUNT(o.o_orderkey) AS n_orders
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2)
      SELECT c_nationkey, c_custkey, CAST(n_orders AS BIGINT) AS n_orders,
        -- Spark-semantics rounding (the q267 treatment): percent_rank
        -- emits exact rationals like 41/640 = 0.0640625 whose 6dp
        -- rounding sits ON the half boundary at sf0.1 group sizes —
        -- Spark rounds the shortest decimal repr half-up, DuckDB the
        -- binary value, and they split there. VARCHAR reproduces the
        -- shortest repr; DECIMAL rounding is half-away-from-zero.
        CAST(ROUND(CAST(CAST(percent_rank() OVER
            (PARTITION BY c_nationkey ORDER BY n_orders, c_custkey)
          AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE) AS pr,
        CAST(ROUND(CAST(CAST(cume_dist() OVER
            (PARTITION BY c_nationkey ORDER BY n_orders, c_custkey)
          AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE) AS cd
      FROM oc ORDER BY 1, 2"""),
    (s, d) => {
      val oc = customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_nationkey"), col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("n_orders"), col("c_custkey"))
      oc.select(col("c_nationkey"), col("c_custkey"), col("n_orders"),
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd"))
        .orderBy(col("c_nationkey"), col("c_custkey"))
    })

  /** Bag-semantics set operations — `exceptAll`/`intersectAll` keep
    * DUPLICATE CARDINALITY (q17/q18 are the distinct forms): a key
    * appearing 5× returned and 3× finalized survives EXCEPT ALL twice.
    * Spark plans both as a single aggregate computing per-key
    * multiplicity deltas — one shuffle, no pairwise matching. */
  val q115BagSetOps = GraftQuery(
    "q115_bag_set_ops",
    "EXCEPT ALL / INTERSECT ALL multiplicity semantics on orderkeys",
    Some("""WITH r AS (SELECT l_orderkey FROM lineitem
          WHERE l_returnflag = 'R'),
        f AS (SELECT l_orderkey FROM lineitem WHERE l_linestatus = 'F'),
        ea AS (SELECT l_orderkey FROM r EXCEPT ALL SELECT l_orderkey FROM f),
        ia AS (SELECT l_orderkey FROM r INTERSECT ALL
          SELECT l_orderkey FROM f)
      SELECT (SELECT COUNT(*) FROM ea) AS except_all_n,
        (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) FROM ea)
          AS except_all_keys,
        (SELECT COUNT(*) FROM ia) AS intersect_all_n,
        (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) FROM ia)
          AS intersect_all_keys"""),
    (s, d) => {
      val r = lineitem(s, d).where(col("l_returnflag") === "R")
        .select(col("l_orderkey"))
      val f = lineitem(s, d).where(col("l_linestatus") === "F")
        .select(col("l_orderkey"))
      val ea = r.exceptAll(f).agg(count(lit(1)).as("except_all_n"),
        countDistinct(col("l_orderkey")).as("except_all_keys"))
      val ia = r.intersectAll(f).agg(count(lit(1)).as("intersect_all_n"),
        countDistinct(col("l_orderkey")).as("intersect_all_keys"))
      ea.crossJoin(ia)
    })

  /** first_value / nth_value / last_value over an unbounded frame —
    * "the k-th event of each user" without a self-join. The ordering
    * key is (ts, event_id): event_id breaks timestamp ties so both
    * engines agree row-for-row, and the oracle orders by epoch-µs
    * (events.parquet is ns precision; Spark reads µs). Values are
    * returned verbatim (no arithmetic), so the compare is exact. */
  val q116NthValue = GraftQuery(
    "q116_nth_value",
    "per-user first/second/last event value via nth_value windows",
    Some("""WITH w AS (
        SELECT user_id,
          first_value(value) OVER win AS first_v,
          nth_value(value, 2) OVER win AS second_v,
          last_value(value) OVER win AS last_v,
          ROW_NUMBER() OVER (PARTITION BY user_id
            ORDER BY epoch_us(ts), event_id) AS rn
        FROM events
        WINDOW win AS (PARTITION BY user_id
          ORDER BY epoch_us(ts), event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
      SELECT user_id, first_v, second_v, last_v
      FROM w WHERE rn = 1 ORDER BY user_id"""),
    (s, d) => {
      val win = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      events(s, d)
        .select(col("user_id"),
          first(col("value")).over(win).as("first_v"),
          nth_value(col("value"), 2).over(win).as("second_v"),
          last(col("value")).over(win).as("last_v"),
          row_number().over(Window.partitionBy(col("user_id"))
            .orderBy(col("ts"), col("event_id"))).as("rn"))
        .where(col("rn") === 1)
        .select(col("user_id"), col("first_v"), col("second_v"),
          col("last_v"))
        .orderBy(col("user_id"))
    })

  /** Snapshot reconciliation — the inverse of q94's CDC apply: given
    * two table versions, derive the change set (added / removed /
    * changed / same) with ONE full-outer join on the key and a value
    * comparison — the regression check every ETL rewrite ships with.
    * v2 is derived deterministically from v1 (drops, price bumps, and
    * key-shifted inserts) so both engines build the identical pair of
    * snapshots. At 100 TB both sides shuffle once on the key; the
    * classification is a map over the joined row. */
  val q130SnapshotDiff = GraftQuery(
    "q130_snapshot_diff",
    "full-outer snapshot diff: added/removed/changed/same + value delta",
    Some("""WITH v1 AS (
        SELECT o_orderkey AS k, o_totalprice AS p FROM orders),
      v2 AS (
        SELECT o_orderkey AS k,
          CASE WHEN o_orderkey % 100 = 0
            THEN ROUND(o_totalprice * 1.1, 2) ELSE o_totalprice END AS p
        FROM orders WHERE o_orderkey % 97 <> 0
        UNION ALL
        SELECT o_orderkey + 20000000, o_totalprice FROM orders
        WHERE o_orderkey % 101 = 0),
      d AS (
        SELECT COALESCE(v1.k, v2.k) AS k, v1.p AS p1, v2.p AS p2,
          CASE WHEN v1.k IS NULL THEN 'added'
               WHEN v2.k IS NULL THEN 'removed'
               WHEN v1.p <> v2.p THEN 'changed'
               ELSE 'same' END AS status
        FROM v1 FULL OUTER JOIN v2 ON v1.k = v2.k)
      SELECT status, COUNT(*) AS n,
        ROUND(SUM(COALESCE(p2, 0) - COALESCE(p1, 0)), 2) AS value_delta
      FROM d GROUP BY 1 ORDER BY 1"""),
    (s, d) => {
      val v1 = orders(s, d)
        .select(col("o_orderkey").as("k"), col("o_totalprice").as("p"))
      val v2 = orders(s, d)
        .where(col("o_orderkey") % 97 =!= 0)
        .select(col("o_orderkey").as("k"),
          when(col("o_orderkey") % 100 === 0,
            round(col("o_totalprice") * 1.1, 2))
            .otherwise(col("o_totalprice")).as("p"))
        .unionAll(orders(s, d).where(col("o_orderkey") % 101 === 0)
          .select((col("o_orderkey") + 20000000L).as("k"),
            col("o_totalprice").as("p")))
      v1.withColumnRenamed("k", "k1").withColumnRenamed("p", "p1")
        .join(v2.withColumnRenamed("k", "k2").withColumnRenamed("p", "p2"),
          col("k1") === col("k2"), "full_outer")
        .select(
          when(col("k1").isNull, "added")
            .when(col("k2").isNull, "removed")
            .when(col("p1") =!= col("p2"), "changed")
            .otherwise("same").as("status"),
          col("p1"), col("p2"))
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n"),
          round(sum(coalesce(col("p2"), lit(0)) - coalesce(col("p1"), lit(0))), 2)
            .as("value_delta"))
        .orderBy(col("status"))
    })
}
