package graft.queries

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{Exchange, ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Catalog-WIDE plan lint (round-5 verdict #5): the 40 PlansSpec pins
  * protect chosen queries; this suite sweeps EVERY catalog entry's
  * post-execution (AQE-final) physical plan at sf0.001 and rejects the
  * scale-killer shapes wholesale, so a regression in an unpinned query
  * can't land silently:
  *
  *  - CartesianProduct — the all-pairs join Spark falls back to when a
  *    join degenerates; always a rewrite bug here (broadcast attaches
  *    plan as BroadcastNestedLoopJoin, which stays legal).
  *  - Planned single-partition shuffle — the "funnel the corpus through
  *    one task" shape (global window rank, global row_number). Allowed
  *    only where it is provably bounded: feeding a scalar aggregate
  *    (1-row output) or a global limit (≤ k rows).
  *  - Global window — a WindowExec with an empty partitionSpec
  *    serializes its whole input into one task at 100 TB even when the
  *    shuffle above it is range-partitioned.
  *  - CodegenFallback predicate in a scan stage — a non-codegen filter
  *    at the scan breaks both whole-stage codegen and pushdown where
  *    data volume is highest (parse/decode PROJECTIONS at the scan are
  *    the operator's own work and stay legal; the lint is about
  *    predicates).
  */
class PlanLintSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** (node, parent) pairs across the whole executed tree, descending
    * into AQE stages, reused exchanges, codegen spans and subqueries —
    * the wrappers `SparkPlan.children` alone does not cross. */
  private def nodes(p: SparkPlan, parent: Option[SparkPlan] = None)
      : Seq[(SparkPlan, Option[SparkPlan])] = {
    val kids: Seq[SparkPlan] = (p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case qs: QueryStageExec => Seq(qs.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case other => other.children
    }) ++ p.subqueries
    (p, parent) +: kids.flatMap(nodes(_, Some(p)))
  }

  /** Strip the wrappers that sit between an exchange and its logical
    * neighbour (codegen spans, input adapters, AQE stages). */
  private def unwrap(p: SparkPlan): SparkPlan = p match {
    case w: WholeStageCodegenExec => unwrap(w.child)
    case i: InputAdapter => unwrap(i.child)
    case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
    case qs: QueryStageExec => unwrap(qs.plan)
    case r: ReusedExchangeExec => unwrap(r.child)
    case other => other
  }

  private def isScalarAgg(p: SparkPlan): Boolean = unwrap(p) match {
    case h: aggregate.HashAggregateExec => h.groupingExpressions.isEmpty
    case o: aggregate.ObjectHashAggregateExec => o.groupingExpressions.isEmpty
    case s: aggregate.SortAggregateExec => s.groupingExpressions.isEmpty
    case _ => false
  }

  /** Is `p` inside the scan stage — i.e. does its narrow unary chain
    * reach a file scan without crossing an exchange/agg/join/sort? */
  private def inScanStage(p: SparkPlan): Boolean = unwrap(p) match {
    case _: FileSourceScanExec => true
    case _: Exchange | _: aggregate.BaseAggregateExec | _: SortExec => false
    case u if u.children.size == 1 => inScanStage(u.children.head)
    case _ => false
  }

  /** Named exceptions, each with its boundedness argument — the lint's
    * point is that every global funnel is either provably bounded or a
    * bug, so additions here need a rows-bound rationale, not a shrug.
    */
  private val boundedGlobalWindow: Map[String, String] = Map(
    "q122_cumulative_distinct" ->
      ("running sum over the PER-DAY aggregate: rows = #calendar days " +
        "(~30 at fixture, 365/year at any corpus size) — input is " +
        "calendar-bounded, not data-bounded"),
    "q267_ucb_mixture" ->
      ("UCB exposure totals and the regret cumsum run over PER-DAY " +
        "aggregates: rows = #calendar days (q122 argument) — " +
        "calendar-bounded, not data-bounded"),
    "q280_bh_fdr" ->
      ("BH rank/threshold windows run over the HYPOTHESIS table: " +
        "rows = |types|×|days| (calendar-bounded, q122 argument)"),
    "q206_mann_whitney" ->
      ("midrank sweep over the pooled VALUE DISTRIBUTION: rows = " +
        "|distinct l_quantity| (= 50 at any corpus size — a domain " +
        "constant, not a corpus statistic)"),
    "q223_auc" ->
      ("cumulative-negatives sweep over the SCORE DISTRIBUTION: rows " +
        "= |distinct scores| ≤ |discounts|×|quantities| = 550 (180 " +
        "observed) — a domain constant, not a corpus statistic"))

  /** The labelled-quadratic register (round-6 verdict #3): the "every
    * deliberate all-pairs form is paired with a flatter twin" invariant,
    * previously prose discipline, machine-checked. Every catalog query
    * whose executed plan contains a BroadcastNestedLoopJoin that the
    * lint cannot prove bounded (build side fed by a scalar aggregate or
    * a limit) must appear here, either as
    *   `twin=<catalog query name>: <why this quadratic is the ground
    *    truth and who its scale form is>`  — a deliberate all-pairs
    *    ground truth, REQUIRED to name its executed flatter twin (the
    *    twin name is validated against the catalog), or
    *   `bounded: <why the build side is O(1)-ish by construction>` —
    *    a broadcast attach whose row count is a model constant
    *    (labels, centroids, quantiles…), not a corpus statistic.
    * A new unpaired quadratic therefore fails CI by construction.
    */
  private val labelledQuadratics: Map[String, String] = Map(
    // ---- deliberate all-pairs ground truths, each naming its executed
    // flatter twin (the SCALING.md crossover families) ----
    "q30_cosine_topk" ->
      ("twin=q83_ann_join: brute-force cosine top-k is the exact " +
        "baseline; the IVF cell join is the measured 100 TB form"),
    "q46_embedding_dups" ->
      ("twin=q144_lsh_semantic_dedup: the family's one LIVE exact pair " +
        "derivation, kept as the measured crossover baseline; sign-LSH " +
        "buckets are the scale form"),
    "q141_knn_label_agreement" ->
      ("twin=q143_ann_label_agreement: exact kNN agreement is the " +
        "oracle-checkable ground truth; IVF-probed candidates are the " +
        "parity-pinned scale form"),
    "q166_hard_negatives" ->
      ("twin=q202_ivf_hard_negatives: exact triplet mining ground " +
        "truth; IVF-probed candidates are the parity-pinned scale form"),
    "q248_ndcg" ->
      ("twin=q83_ann_join: exact brute-force ranking is the judged " +
        "ground-truth retriever; the IVF cell join is the candidate " +
        "source at scale — the metric arithmetic downstream is bounded"),
    "q249_retrieval_metrics" ->
      ("twin=q83_ann_join: same exact-ranker candidate stage as q248; " +
        "everything after the top-10 table is |queries|-bounded"),
    "q250_rbo" ->
      ("twin=q83_ann_join: two exact rankings (full + prefix) as the " +
        "compared systems; RBO itself is a top-10 x top-10 equi-join"),
    "q200_matryoshka_agreement" ->
      ("twin=q203_ivf_matryoshka_agreement: exact full-vs-prefix " +
        "agreement ground truth; IVF-probed candidates are the " +
        "parity-pinned scale form"),
    // ---- bounded-by-construction broadcast sides: the build side's
    // row count is a model/domain constant, not a corpus statistic ----
    "q253_krippendorff" ->
      ("bounded: coincidence-marginal self-join runs on the per-" +
        "category totals table (rows = |categories| = 3, a rater-" +
        "design constant)"),
    "q255_naive_bayes" ->
      ("bounded: the fitted model attach (rows = |labels|, a class-" +
        "design constant); scoring is one corpus stream against it"),
    "q271_ql_dirichlet" ->
      ("bounded: collection-model attach (rows = |query terms| = 3, " +
        "a query constant); scoring is one stream of the per-doc " +
        "length table against it"),
    "q275_stickiness" ->
      ("bounded: the sliding-distinct range joins broadcast the DAY " +
        "SPINE (rows = #calendar days, the q122 argument); per " +
        "user-day fan-out is capped at the 28-day window"),
    "q34_activity_rank" ->
      ("bounded: rank map self-join runs on the per-user-count " +
        "DISTRIBUTION (rows <= max events per user), never the user table"),
    "q87_retention" ->
      "bounded: 4-row literal day-offset frame broadcast onto cohorts",
    "q125_chi2_drift" ->
      "bounded: per-language totals attach (rows = |langs|)",
    "q139_source_overlap" ->
      ("bounded: bit-test joins broadcast the SOURCE dimension " +
        "(rows = |sources|, required <= 63) and its |sources|^2/2 " +
        "pair spine onto the mask histogram — sources are domains, " +
        "a catalog constant, never corpus rows"),
    "q246_shapley_attribution" ->
      ("bounded: coalition arithmetic joins run on the 16-row mask " +
        "spine x 4-row channel table (the powerset universe is a " +
        "domain constant); the corpus never enters a non-equi join"),
    "q189_neyman_alloc" ->
      ("bounded: fractional-premium rank self-join over the per-" +
        "event-type table (rows = |event types|)"),
    "q177_centroid_confusion" ->
      "bounded: label-centroid table attach (rows = |labels|)",
    "q281_source_ablation" ->
      ("bounded: the ablation grid broadcasts the SOURCE LIST (rows = " +
        "|sources|, a corpus-design constant) onto the already-reduced " +
        "hash-group table; plus two 1-row scalar attaches"),
    "q83_ann_join" ->
      ("bounded: IVF centroid probe (rows = nCells, capped 65536 by " +
        "Ivf.cellsFor); the candidate join itself is equi on cell"),
    "q143_ann_label_agreement" ->
      ("bounded: IVF centroid probe (nCells cap 65536); candidate " +
        "join equi on cell"),
    "q202_ivf_hard_negatives" ->
      ("bounded: IVF centroid probe (nCells cap 65536); candidate " +
        "join equi on cell"),
    "q203_ivf_matryoshka_agreement" ->
      ("bounded: IVF centroid probe (nCells cap 65536); candidate " +
        "join equi on cell"),
    "q287_log_rank" ->
      ("bounded: 2-row literal arm spine broadcast onto the " +
        "day-bounded distinct-lifetime table (the q87 literal-frame " +
        "shape); the per-user pass is the one equi-grouped shuffle"))

  /** Is this BNLJ's broadcast side provably tiny — fed by a scalar
    * (groupless) aggregate or a limit? Those are the 1-row/≤k-row
    * scalar attaches that are legal without registration. */
  private def boundedBuildSide(b: BroadcastNestedLoopJoinExec): Boolean = {
    val build = b.buildSide match {
      case org.apache.spark.sql.catalyst.optimizer.BuildLeft => b.left
      case _ => b.right
    }
    nodes(build).exists { case (p, _) =>
      isScalarAgg(p) || (unwrap(p) match {
        case _: GlobalLimitExec | _: CollectLimitExec |
            _: TakeOrderedAndProjectExec => true
        case _ => false
      })
    }
  }

  test("no catalog plan contains a scale-killer shape (sweep at sf0.001)") {
    val d = SparkTestSession.Sf0001
    val violations = scala.collection.mutable.ArrayBuffer.empty[String]
    val quadratics = scala.collection.mutable.Set.empty[String]
    Catalog.all.foreach { q =>
      val df = q.run(spark, d)
      // execute through the noop sink so AQE finalizes every stage —
      // the lint reads the plan that actually ran, not the draft
      df.write.format("noop").mode("overwrite").save()
      val all = nodes(df.queryExecution.executedPlan)
      all.foreach {
        case (_: CartesianProductExec, _) =>
          violations += s"${q.name}: CartesianProduct"
        case (b: BroadcastNestedLoopJoinExec, _) if !boundedBuildSide(b) =>
          quadratics += q.name
          if (!labelledQuadratics.contains(q.name))
            violations += s"${q.name}: unregistered BroadcastNestedLoopJoin " +
              "(label it in labelledQuadratics with its twin, or prove the " +
              "build side bounded)"
        case (s: ShuffleExchangeExec, parent)
            if s.outputPartitioning == SinglePartition =>
          val bounded = isScalarAgg(s.child) ||
            parent.map(unwrap).exists(_.isInstanceOf[GlobalLimitExec]) ||
            boundedGlobalWindow.contains(q.name)
          if (!bounded)
            violations += s"${q.name}: unbounded SinglePartition shuffle " +
              s"(parent ${parent.map(_.nodeName).getOrElse("-")})"
        case (w: WindowExec, _) if w.partitionSpec.isEmpty &&
            !boundedGlobalWindow.contains(q.name) =>
          violations += s"${q.name}: global (unpartitioned) window"
        case (f: FilterExec, _) if inScanStage(f) &&
            f.condition.exists(_.isInstanceOf[CodegenFallback]) =>
          violations += s"${q.name}: CodegenFallback predicate in scan " +
            s"stage (${f.condition.sql.take(120)})"
        case _ => ()
      }
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
    }
    // register validation: twins must be real catalog queries, and the
    // register must be EXACT — a stale entry (query no longer planning
    // a BNLJ) is as much drift as a missing one
    val names = Catalog.all.map(_.name).toSet
    labelledQuadratics.foreach { case (k, v) =>
      assert(names.contains(k), s"labelledQuadratics has unknown query $k")
      if (v.startsWith("twin=")) {
        val twin = v.drop("twin=".length).takeWhile(_ != ':').trim
        assert(names.contains(twin),
          s"$k names nonexistent twin '$twin'")
        assert(twin != k, s"$k cannot be its own twin")
      } else assert(v.startsWith("bounded:"),
        s"$k entry must start with 'twin=<name>:' or 'bounded:'")
    }
    val stale = labelledQuadratics.keySet -- quadratics
    assert(stale.isEmpty,
      s"labelledQuadratics entries no longer planning a BNLJ: $stale")
    assert(violations.isEmpty,
      s"scale-killer plan shapes found:\n  ${violations.mkString("\n  ")}")
  }
}
