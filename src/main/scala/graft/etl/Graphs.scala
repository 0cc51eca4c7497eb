package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared degree-ordered triangle machinery for the co-purchase graph
  * family (q186 enumeration, q188 coefficients, q191 incremental
  * maintenance). Input edge frames are undirected unique pairs with
  * columns (u, v), u < v by id.
  *
  * Orientation is Schank–Wagner: every edge points from its
  * lower-(degree, id) endpoint to the higher, so each triangle is
  * enumerated exactly once at its lowest-degree corner and per-node
  * wedge fan-out is O(out-deg²) with out-degrees bounded ~√m — the
  * defense against the hub-node wedge explosion an id-ordered
  * enumeration hits at scale.
  */
object Graphs {

  /** (x, y, ry): edges oriented low→high under the (deg, id) total
    * order, `ry` the head's rank struct (for wedge-leg ordering). */
  def orientByDegree(e0: DataFrame): DataFrame = {
    val deg = e0.select(col("u").as("node"))
      .union(e0.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val er = e0
      .join(deg.toDF("u", "du"), Seq("u"))
      .join(deg.toDF("v", "dv"), Seq("v"))
    val ru = struct(col("du").as("d"), col("u").as("i"))
    val rv = struct(col("dv").as("d"), col("v").as("i"))
    er.select(
      when(ru < rv, col("u")).otherwise(col("v")).as("x"),
      when(ru < rv, col("v")).otherwise(col("u")).as("y"),
      when(ru < rv, rv).otherwise(ru).as("ry"))
  }

  /** Triangle triples, id-sorted (part_a < part_b < part_c) so the
    * output is orientation-independent — identical to a plain
    * id-ordered enumeration's row set. */
  def triangles(e0: DataFrame): DataFrame = {
    // the oriented edge list feeds three join sides: checkpoint once
    val oriented = orientByDegree(e0).localCheckpoint(false)
    val wedges = oriented.toDF("x", "y1", "r1")
      .join(oriented.toDF("x", "y2", "r2"), Seq("x"))
      .where(col("r1") < col("r2"))
    val closed = wedges.join(
      oriented.select(col("x").as("y1"), col("y").as("y2")),
      Seq("y1", "y2"))
    closed.select(array_sort(array(col("x"), col("y1"), col("y2"))).as("t"))
      .select(col("t")(0).as("part_a"), col("t")(1).as("part_b"),
        col("t")(2).as("part_c"))
  }

  /** Triangles of the merged graph that contain at least one `delta`
    * edge — the incremental-maintenance kernel: since co-occurrence
    * counts only grow, support-pruned edges never disappear, so
    *   triangles(merged) = triangles(old) ∪ deltaTriangles
    * and only the delta is enumerated. Every join STARTS from the
    * delta edge set (the wave's footprint): wedges with a delta leg
    * close against the full edge list, and old-old wedges are built
    * only per delta CLOSURE edge — never the full old wedge space,
    * which is the whole point of not recomputing the batch.
    *
    * Branches are disjoint by construction (leg1 delta | leg1 old ∧
    * leg2 delta | both legs old ∧ closure delta), and the oriented
    * decomposition is unique per triangle, so no dedup pass is
    * needed.
    */
  def deltaTriangles(merged: DataFrame, delta: DataFrame): DataFrame = {
    val flagged = orientByDegree(merged)
      .withColumn("lu", least(col("x"), col("y")))
      .withColumn("gv", greatest(col("x"), col("y")))
      .join(delta.toDF("lu", "gv").withColumn("f", lit(true)),
        Seq("lu", "gv"), "left")
      .select(col("x"), col("y"), col("ry"),
        coalesce(col("f"), lit(false)).as("f"))
      .localCheckpoint(false)
    val oAll = flagged.select(col("x"), col("y"), col("ry"))
    val oD = flagged.where(col("f")).select(col("x"), col("y"), col("ry"))
    val oOld = flagged.where(!col("f")).select(col("x"), col("y"), col("ry"))
    val w1 = oD.toDF("x", "y1", "r1")
      .join(oAll.toDF("x", "y2", "r2"), Seq("x"))
      .where(col("r1") < col("r2"))
    val w2 = oOld.toDF("x", "y1", "r1")
      .join(oD.toDF("x", "y2", "r2"), Seq("x"))
      .where(col("r1") < col("r2"))
    val c12 = w1.union(w2).join(
      oAll.select(col("x").as("y1"), col("y").as("y2")), Seq("y1", "y2"))
    val c3 = oD.select(col("x").as("y1"), col("y").as("y2"))
      .join(oOld.select(col("x"), col("y").as("y1"), col("ry").as("r1")),
        Seq("y1"))
      .join(oOld.select(col("x"), col("y").as("y2"), col("ry").as("r2")),
        Seq("x", "y2"))
      .where(col("r1") < col("r2"))
    c12.select(col("x"), col("y1"), col("y2"))
      .union(c3.select(col("x"), col("y1"), col("y2")))
      .select(array_sort(array(col("x"), col("y1"), col("y2"))).as("t"))
      .select(col("t")(0).as("part_a"), col("t")(1).as("part_b"),
        col("t")(2).as("part_c"))
  }
}
