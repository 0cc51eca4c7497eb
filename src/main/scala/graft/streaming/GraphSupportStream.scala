package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** One arriving order basket — the graph family's ingest unit (an
  * order is atomic: its lineitems land together, the q191 wave
  * convention). `parts` keeps duplicates: pair multiplicity within a
  * basket is cnt(u)·cnt(v), matching the lineitem-level counts the
  * CopurchaseLayout and q191's merge use. */
case class Basket(orderkey: Long, parts: Seq[Long])

/** One pair contribution after basket fan-out + the stream-static
  * yesterday-count attach. */
case class PairContrib(u: Long, v: Long, orderkey: Long, mult: Long,
    yc: Long)

/** An edge whose support first crossed the threshold — the admission
  * signal q191's delta enumeration consumes. */
case class EdgeRow(u: Long, v: Long)

/** Per-pair support state: which orders have contributed (replay
  * suppression — a re-delivered basket adds no new orders, so counts
  * never inflate) and the accumulated wave count. `seen` is bounded by
  * the pair's PRE-threshold contributions only: at the crossing the
  * processor emits and collapses the state to an `emitted` tombstone
  * (post-threshold contributions are ignored anyway), so a popular
  * pair's state never grows with its popularity. */
case class PairSupport(seen: Seq[Long], waveCount: Long,
    emitted: Boolean)

/** Keyed by the (u, v) pair: accumulate wave-side support on top of
  * the static yesterday count and emit the pair ONCE, in the
  * micro-batch where total support first reaches `threshold`. Pairs
  * already at threshold yesterday are filtered out upstream and never
  * create state; state is therefore O(sub-threshold pairs the wave
  * actually touches) — the wave's footprint, never the graph. No
  * event-time expiry: the support count is the OPERATIONAL state of
  * the admission service (evicting it would forget support); a
  * deployment would bound it with the same day-horizon policy as the
  * admission flags, a retention choice, not a correctness one.
  */
class PairSupportProcessor(threshold: Long)
    extends StatefulProcessor[(Long, Long), PairContrib, EdgeRow] {

  @transient private var st: ValueState[PairSupport] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[PairSupport](
      "support", Encoders.product[PairSupport], TTLConfig.NONE)

  override def handleInputRows(key: (Long, Long),
      rows: Iterator[PairContrib],
      timerValues: TimerValues): Iterator[EdgeRow] = {
    val prev = Option(st.get()).getOrElse(PairSupport(Seq.empty, 0L, false))
    // Already emitted: post-threshold contributions can never matter
    // (the pair fired exactly once, counts only grow), so the batch is
    // dropped in O(1) and the tombstone state stays constant-size.
    if (prev.emitted) Iterator.empty
    else {
      val rs = rows.toSeq
      // one contribution per order, first occurrence wins: a basket
      // replayed in the SAME batch carries identical multiplicity, so
      // dropping repeats loses nothing
      val fresh = rs.groupBy(_.orderkey).view
        .filterKeys(o => !prev.seen.contains(o))
        .mapValues(_.head.mult).toMap
      if (fresh.isEmpty) Iterator.empty
      else {
        val yc = rs.head.yc
        val waveCount = prev.waveCount + fresh.values.sum
        // while un-emitted, yc + prev.waveCount < threshold is an
        // invariant (upstream filters yc >= threshold; the state below
        // only stays un-emitted when the total is still short), so a
        // crossing check on `after` alone is the full before/after test
        if (yc + waveCount >= threshold) {
          st.update(PairSupport(Seq.empty, waveCount, emitted = true))
          Iterator.single(EdgeRow(key._1, key._2))
        } else {
          st.update(PairSupport(prev.seen ++ fresh.keys, waveCount, false))
          Iterator.empty
        }
      }
    }
  }
}

/** Streaming support maintenance for the co-purchase graph — the
  * stream twin of q191's additive count merge: order baskets arrive,
  * each fans out to its within-basket part pairs (multiplicity
  * cnt(u)·cnt(v), the lineitem-level convention), yesterday's
  * persisted counts attach STREAM-STATIC (stateless; per-batch cost
  * scales with the batch, never the graph), and a single
  * transformWithState emits every edge exactly when its merged
  * support first reaches the prune threshold. After the whole wave
  * has streamed, the emitted set IS q191's delta edge set — the
  * input its delta-triangle enumeration starts from.
  * GraphSupportStreamSpec pins that equality, including basket
  * replays across and within batches.
  */
object GraphSupportStream {

  /** (orderkey, parts) basket stream → edges crossing `threshold`,
    * given the static yesterday pair counts (u, v, c). */
  def supportCrossings(baskets: Dataset[Basket], yesterday: DataFrame,
                       threshold: Long = 2L): Dataset[EdgeRow] = {
    val spark = baskets.sparkSession
    import spark.implicits._
    val pairs = baskets.flatMap { b =>
      val cnt = b.parts.groupBy(identity).map { case (p, ps) =>
        p -> ps.size.toLong }
      val ks = cnt.keys.toSeq.sorted
      for {
        i <- ks.indices.iterator
        j <- (i + 1) until ks.size
      } yield (ks(i), ks(j), b.orderkey, cnt(ks(i)) * cnt(ks(j)))
    }.toDF("u", "v", "orderkey", "mult")
    pairs
      .join(yesterday.select(col("u"), col("v"), col("c").as("yc")),
        Seq("u", "v"), "left")
      .withColumn("yc", coalesce(col("yc"), lit(0L)))
      // already-admitted pairs never create state (and never re-emit)
      .where(col("yc") < threshold)
      .as[PairContrib]
      .groupByKey(r => (r.u, r.v))
      .transformWithState(new PairSupportProcessor(threshold),
        TimeMode.None(), OutputMode.Append())
  }
}
