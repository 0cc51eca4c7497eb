package graft.queries

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{Exchange, ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.CartesianProductExec
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
        "calendar-bounded, not data-bounded"))

  test("no catalog plan contains a scale-killer shape (sweep at sf0.001)") {
    val d = SparkTestSession.Sf0001
    val violations = scala.collection.mutable.ArrayBuffer.empty[String]
    Catalog.all.foreach { q =>
      val df = q.run(spark, d)
      // execute through the noop sink so AQE finalizes every stage —
      // the lint reads the plan that actually ran, not the draft
      df.write.format("noop").mode("overwrite").save()
      val all = nodes(df.queryExecution.executedPlan)
      all.foreach {
        case (_: CartesianProductExec, _) =>
          violations += s"${q.name}: CartesianProduct"
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
    assert(violations.isEmpty,
      s"scale-killer plan shapes found:\n  ${violations.mkString("\n  ")}")
  }
}
