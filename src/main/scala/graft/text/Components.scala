package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed connected components over a near-dup pair list — the
  * step that turns pairwise dedup output ([[Dedup.jaccardPairs]],
  * [[Dedup.minHashLshPairs]], [[Dedup.simHashPairs]]) into dedup
  * GROUPS: every document labeled with the minimum doc_id reachable
  * through dup edges, so one keeper per component survives.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14). Both
  * steps are a single groupBy over the edge list — no driver-side
  * graph, no vertex broadcast — and the edge set contracts toward a
  * star forest in O(log n) rounds (vs O(diameter) for naive label
  * propagation, which on a 100 TB corpus with chain-shaped dup
  * clusters is the difference between 8 rounds and 10 000).
  *
  * Each round materializes the (small) edge frontier with
  * localCheckpoint: the iteration would otherwise stack a
  * groupBy-per-round lineage that Catalyst re-plans from scratch each
  * time (the same checkpoint-per-stage pattern the reference applies
  * between pipeline stages, 流行音乐趋势预测.md:329 caching interim
  * RDDs). Bench/Verify unpersist between queries.
  */
object Components {

  /** Large-star: for every node u, attach its strictly-larger
    * neighbors to m = min(N(u) ∪ u). Keeps every component connected
    * while halving long chains' height.
    */
  private def largeStar(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
    sym.groupBy(col("src"))
      .agg(least(min(col("dst")), col("src")).as("m"),
        collect_set(col("dst")).as("nbrs"))
      .select(col("src"), col("m"), explode(col("nbrs")).as("v"))
      .filter(col("v") > col("src"))
      .select(col("v").as("src"), col("m").as("dst"))
      .filter(col("src") =!= col("dst"))
    // no trailing distinct: the next step's collect_set dedups (with
    // map-side partial aggregation), so the extra shuffle here bought
    // nothing — one round = symmetrize+groupBy, orient+groupBy, distinct
  }

  /** Small-star: orient every edge high→low, then attach each node's
    * smaller-or-equal neighbors (and itself) to the minimum among
    * them. */
  private def smallStar(edges: DataFrame): DataFrame = {
    val oriented = edges.select(
      greatest(col("src"), col("dst")).as("src"),
      least(col("src"), col("dst")).as("dst"))
    oriented.groupBy(col("src"))
      .agg(least(min(col("dst")), col("src")).as("m"),
        collect_set(col("dst")).as("nbrs"))
      .select(col("src"), col("m"),
        explode(concat(col("nbrs"), array(col("src")))).as("v"))
      .filter(col("v") =!= col("m"))
      .select(col("v").as("src"), col("m").as("dst"))
      .distinct()
  }

  /** Canonical fingerprint of an edge set for the convergence check:
    * (row count, xor of row hashes) — order-independent, collision
    * probability ~2⁻⁶⁴ per round. One tiny aggregate per round; the
    * driver never sees an edge. */
  private def fingerprint(edges: DataFrame): (Long, Long) = {
    val r = edges
      .agg(count(lit(1)), coalesce(
        // xor-fold via sum of hashes mod 2^64 is NOT order-independent
        // under overflow of distinct multisets; use bit_xor aggregate
        expr("bit_xor(xxhash64(src, dst))"), lit(0L)))
      .head
    (r.getLong(0), r.getLong(1))
  }

  /** Edge-count cutoff for the driver union-find short-circuit in
    * [[connectedComponents]]: 2²⁰ edges × two 8-byte ids ≈ 16 MB on
    * the driver — the PQ-codebook / GlobalRank-offsets bounded-collect
    * class, and the same measured-dispatch idiom as `cellsFor` /
    * `lshPlanesFor` / `maxBucket`. Below it, the star fixpoint's cost
    * is pure per-round JOB overhead (each round = 2 shuffles + a
    * checkpoint + a fingerprint action; measured ~0.5 s/round at
    * fixture scale against <10 ms of actual union-find work), so the
    * collect is strictly cheaper; above it, the distributed fixpoint
    * runs unchanged — at 100 TB the pair list blows past the cutoff
    * in the first ingest wave and this branch never triggers. The
    * count is free: the convergence fingerprint already computes it. */
  private val DriverUnionFindCutoff = 1L << 20

  /** Driver union-find over an ALREADY-BOUNDED edge list (callers
    * guarantee ≤ [[DriverUnionFindCutoff]] rows): component = min node
    * id, the exact contract of the star fixpoint — ComponentsSpec pins
    * path equality on random graphs. Integral node ids only (every
    * producer keys on doc_id/vec_id longs); non-integral ids take the
    * distributed path regardless of size. */
  private def driverUnionFind(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    val parent = new java.util.HashMap[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.get(r) != r) r = parent.get(r)
      var c = x
      while (c != r) { val n = parent.get(c); parent.put(c, r); c = n }
      r
    }
    edges.select(col("src").cast("long"), col("dst").cast("long"))
      .collect().foreach { row =>
        val (a, b) = (row.getLong(0), row.getLong(1))
        parent.putIfAbsent(a, a); parent.putIfAbsent(b, b)
        val (ra, rb) = (find(a), find(b))
        // min id stays root, so the root IS the component id
        if (ra < rb) parent.put(rb, ra)
        else if (rb < ra) parent.put(ra, rb)
      }
    val out = new Array[(Long, Long)](parent.size())
    var i = 0
    val it = parent.keySet().iterator()
    while (it.hasNext) { val n = it.next(); out(i) = (n, find(n)); i += 1 }
    import spark.implicits._
    val dt = edges.schema("src").dataType
    out.toSeq.toDF("node", "component")
      .select(col("node").cast(dt).as("node"),
        col("component").cast(dt).as("component"))
  }

  private def isIntegral(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case _: org.apache.spark.sql.types.LongType |
           _: org.apache.spark.sql.types.IntegerType |
           _: org.apache.spark.sql.types.ShortType => true
      case _ => false
    }

  /** (node, component) for every node incident to an edge; component =
    * min node id of the connected component. `edges` is an undirected
    * pair list in any orientation with columns (src, dst). Self-loop
    * edges (src == dst) are ignored — a node whose ONLY edge is a
    * self-loop is not emitted. Filtering them up front is what keeps
    * the two dispatch paths on one contract: the star rounds contract
    * a self-loop away and drop the node, while a union-find would
    * emit (a, a) for it — without the filter the paths disagreed on
    * exactly that input class (no current producer emits self-loops,
    * but the function accepts any pair list; ComponentsSpec pins it).
    */
  def connectedComponents(edges: DataFrame, maxRounds: Int = 25,
                          driverCutoff: Long = DriverUnionFindCutoff)
      : DataFrame = {
    var cur = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct().localCheckpoint(false)
    var fp = fingerprint(cur)
    // driverCutoff is a test seam (ComponentsSpec pins both paths equal
    // on the same graphs); production callers take the default
    if (fp._1 <= driverCutoff && isIntegral(edges.schema("src").dataType))
      return driverUnionFind(cur)
    var rounds = 0
    var converged = cur.isEmpty
    // Frontier partitioning adapts to the frontier's MEASURED size
    // (already known from the fingerprint count — no extra action):
    // the edge set contracts geometrically, so late rounds on the
    // global shuffle-partition count are pure task overhead, and
    // localCheckpoint pins whatever layout the round produced. ~50k
    // edges per partition keeps early rounds parallel and late rounds
    // single-task; coalesce (not repartition) merges map-side.
    def frontierPartitions(edgeCount: Long): Int =
      math.max(1L, math.min(edgeCount / 50000L,
        cur.sparkSession.sparkContext.defaultParallelism.toLong)).toInt
    while (!converged && rounds < maxRounds) {
      val next = smallStar(largeStar(cur))
        .coalesce(frontierPartitions(fp._1)).localCheckpoint(false)
      val nfp = fingerprint(next)
      converged = nfp == fp
      // release the superseded frontier NOW — safe ONLY because the
      // fingerprint action above just materialized next's LAZY
      // checkpoint, severing its lineage dependency on cur; unpersist
      // before an action on next would drop blocks its un-materialized
      // lineage still needs (checkpointed lineage can't recompute).
      // Without the release, every round's copy stays pinned in the
      // block manager until end-of-query cleanup.
      org.apache.spark.sql.GraftShims.unpersistCheckpoint(cur)
      cur = next
      fp = nfp
      rounds += 1
    }
    require(converged, s"connectedComponents did not converge in $maxRounds rounds")
    // At the fixpoint the edges form a star forest high→low: every
    // non-root node has exactly one edge to its component root.
    val members = cur.select(col("src").as("node"), col("dst").as("component"))
    val roots = cur.select(col("dst").as("node")).distinct()
      .select(col("node"), col("node").as("component"))
    members.union(roots).distinct()
  }

  /** Component id for EVERY document (singletons keep their own id):
    * near-dup pairs at `threshold` → star-forest components →
    * right-join back onto the corpus. The output is the dedup-group
    * assignment a keeper-selection pass consumes. Uses the exact
    * Jaccard pair source (the oracle-checkable ground truth); at
    * 100 TB feed [[componentsOver]] the banded pair list
    * ([[Dedup.minHashLshPairs]] / [[Dedup.simHashPairs]]) instead —
    * the downstream plan is identical.
    */
  def dedupComponents(docs: DataFrame, threshold: Double,
                      shingleTable: Option[DataFrame] = None): DataFrame =
    componentsOver(docs,
      Dedup.jaccardPairs(docs, threshold, shingleTable = shingleTable)
        .select(col("doc_a").as("src"), col("doc_b").as("dst")))

  /** [[dedupComponents]] with a caller-supplied (src, dst) pair frame —
    * the pluggable-pair-source form, so the scale-path generators drop
    * in without re-implementing the corpus join-back. */
  def componentsOver(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val cc = connectedComponents(pairs)
    docs.select(col("doc_id"))
      .join(cc.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("component"))
  }

  /** Incremental component maintenance under corpus growth — the
    * operational mode at 100 TB, where recomputing yesterday's
    * transitive closure for today's admission wave is the one cost the
    * layout chain exists to avoid. `assignments` is yesterday's
    * (node, component) table (component = min node id, the invariant
    * every producer here upholds); `newEdges` is the wave's pair list
    * and may touch old nodes, new nodes, or both.
    *
    * The star-forest fixpoint runs over the CONTRACTED graph: every
    * old endpoint is first replaced by its component id, so the
    * iteration's input is ∝ |wave edges| + |touched components| — the
    * existing corpus is never rescanned. Contraction preserves the
    * min-id invariant exactly (old component ids ARE their clusters'
    * minima, so the contracted minimum equals the global minimum), so
    * the result is byte-identical to a full batch recompute — which is
    * what IncrementalComponentsSpec and the q164 oracle pin.
    *
    * Output covers every node in `assignments` plus every node
    * incident to `newEdges`; brand-new singletons (in the wave's
    * corpus but in no edge) are the caller's corpus join-back, same as
    * [[componentsOver]].
    */
  def incrementalComponents(assignments: DataFrame,
                            newEdges: DataFrame): DataFrame = {
    val asg = assignments.select(col("node"), col("component"))
    val bySrc = asg.select(col("node").as("src"), col("component").as("csrc"))
    val byDst = asg.select(col("node").as("dst"), col("component").as("cdst"))
    val contracted = newEdges.select(col("src"), col("dst"))
      .join(bySrc, Seq("src"), "left_outer")
      .join(byDst, Seq("dst"), "left_outer")
      .select(coalesce(col("csrc"), col("src")).as("src"),
        coalesce(col("cdst"), col("dst")).as("dst"))
      .filter(col("src") =!= col("dst"))
    val cc = connectedComponents(contracted)
    // expand: old nodes re-map through their (possibly merged) old
    // component; untouched components pass through unchanged
    val remap = cc.select(col("node").as("component"),
      col("component").as("merged"))
    val updatedOld = asg.join(remap, Seq("component"), "left_outer")
      .select(col("node"),
        coalesce(col("merged"), col("component")).as("component"))
    // wave nodes unseen by yesterday's table map directly (or stay
    // their own component when the contraction removed their only
    // edge as a self-loop into an existing component... which cannot
    // happen: a new node is never a component id, so its edges
    // survive contraction unless it only links to itself)
    val newNodes = newEdges.select(col("src").as("node"))
      .union(newEdges.select(col("dst").as("node"))).distinct()
      .join(asg.select(col("node")), Seq("node"), "left_anti")
    val newAssigned = newNodes.join(cc, Seq("node"), "left_outer")
      .select(col("node"), coalesce(col("component"), col("node")).as("component"))
    updatedOld.union(newAssigned)
  }
}
