package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (Array[Float]) —
  * SURVEY.md §7.6 north star (the reference's KNN recommender,
  * 豆瓣图书推荐.md:8-21, is the user×item analogue).
  *
  * Two paths: exact brute-force top-k (the oracle-checkable baseline,
  * O(|Q|·|N|)) and a random-hyperplane LSH bucketed variant (the
  * 100 TB path: candidates only meet inside a bucket, so cost is
  * O(Σ bucket²) instead of O(n²)).
  */
object Similarity {

  /** Array[Float] → Array[Double] so all arithmetic is double-precision
    * (bit-stable against the DuckDB oracle's DOUBLE[] cast). A native
    * cast, not a lambda — stays in codegen. */
  def toDouble(vec: Column): Column = vec.cast("array<double>")

  /** Native codegen'd vector ops (graft.functions.VectorOps): the
    * aggregate/zip_with lambda forms are interpreted and re-walk the
    * array per lambda — same pathology as Dedup.shingleRows. Sequential
    * summation order is unchanged, so oracle parity holds. */
  def dot(a: Column, b: Column): Column = graft.functions.VectorOps.dot_product(a, b)

  def norm2(a: Column): Column = graft.functions.VectorOps.l2_norm(a)

  /** Cosine similarity, NULL when either vector is all-zero: a bare
    * divide would throw DIVIDE_BY_ZERO under Spark 4's default ANSI
    * mode, killing the whole query for one degenerate vector; NULL
    * drops it from `>= threshold` filters and ranks last in top-k,
    * which is the behavior a similarity pass wants (the native
    * [[graft.functions.VectorOps.cosine_sim]] reaches the same end by
    * producing NaN from raw JVM arithmetic). */
  def cosine(a: Column, b: Column): Column = {
    val n = norm2(a) * norm2(b)
    when(n =!= lit(0.0), dot(a, b) / n)
  }

  /** Exact top-k cosine neighbors for each query vector (queries =
    * rows passing `isQuery`). Per-query rank ties broken by neighbor id.
    * The join is a broadcast of the (small) query side against the full
    * corpus — at scale the corpus streams once, no shuffle until the
    * per-query top-k aggregation.
    */
  def cosineTopK(emb: DataFrame, isQuery: Column, k: Int): DataFrame = {
    val e0 = emb.select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val q = e0.filter(isQuery).select(col("vec_id").as("q_id"), col("v").as("qv"))
    // spread the STREAMED side only: all O(|Q|·|N|) dot products happen
    // on the corpus stream of this broadcast join, and the fixture
    // embeddings scan is one row group → 1 partition, so the whole
    // quadratic leg would otherwise run on one core (the query side
    // stays on the raw scan — it is collected for broadcast anyway)
    val e = graft.model.Tables.spread(e0, col("vec_id"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    broadcast(q).join(e, col("q_id") =!= col("vec_id"))
      .withColumn("cos", cosine(col("qv"), col("v")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("vec_id"), round(col("cos"), 4).as("cos"), col("rk"))
  }

  /** Sign-random-projection bucket id for one hash table: `planes`
    * bits, bit p set iff dot(v, plane_{table,p}) > 0. Vectors in the
    * same bucket are cosine-close with high probability.
    *
    * One native expression ([[graft.functions.SignProjectionBucket]])
    * holding the whole plane matrix as a codegen constant — the earlier
    * literal-array form generated dim×planes expression nodes per bucket
    * column, which blows past the JVM 64 KB method limit at real
    * embedding dims (768+) and falls back to interpreted eval.
    */
  def lshBucket(vec: Column, dim: Int, planes: Int, table: Int): Column =
    graft.functions.SignProjectionBucket.sign_projection_bucket(vec, dim, planes, table)

  /** Round-1 literal-tree bucket form — parity reference for
    * [[lshBucket]] (SimilaritySpec pins bucket-id equality). */
  private[graft] def lshBucketLiteral(vec: Column, dim: Int, planes: Int, table: Int): Column =
    (0 until planes).map { p =>
      val plane = array((0 until dim).map(j =>
        lit(graft.functions.SignProjectionBucket.planeComponent(table * planes + p, j))): _*)
      when(dot(vec, plane) > 0, lit(1L << p)).otherwise(0L)
    }.reduce(_.bitwiseOR(_))

  /** Brute-force top-k over int8-quantized vectors
    * ([[graft.functions.Int8RoundTrip]]): the corpus side scans the
    * 4×-smaller dequantized representation — the memory/IO layout an
    * ANN index actually stores at 100 TB — while queries stay full
    * precision. Same plan shape as [[cosineTopK]]; SimilaritySpec
    * measures recall against the exact form (quantization shifts
    * cosines ~1e-3, so only near-ties can reorder).
    */
  def quantizedCosineTopK(emb: DataFrame, isQuery: Column, k: Int): DataFrame = {
    import graft.functions.VectorOps.int8_round_trip
    val e = emb.select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val q = e.filter(isQuery).select(col("vec_id").as("q_id"), col("v").as("qv"))
    // same stream-side spread rationale as [[cosineTopK]]
    val corpus = graft.model.Tables.spread(
      e.select(col("vec_id"), int8_round_trip(col("v")).as("v")), col("vec_id"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    broadcast(q).join(corpus, col("q_id") =!= col("vec_id"))
      .withColumn("cos", cosine(col("qv"), col("v")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("vec_id"), round(col("cos"), 4).as("cos"), col("rk"))
  }

  /** Multi-table LSH approximate top-k: `tables` independent
    * sign-random-projection hash tables of `planes` bits each; a
    * corpus vector is a candidate if it shares a bucket with the query
    * in ANY table (the standard OR-amplification — a single table's
    * recall decays as pᵖˡᵃⁿᵉˢ). Candidates are deduped, then exact
    * cosine + top-k inside the candidate set. Recall/cost dial:
    * more tables → recall, more planes → fewer candidates per bucket;
    * at scale pick planes ≈ log2(n / wanted_bucket_size).
    */
  def lshCosineTopK(emb: DataFrame, isQuery: Column, k: Int, dim: Int,
                    planes: Int = 4, tables: Int = 8): DataFrame = {
    val e = emb.select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val buckets = e.select(col("vec_id"), col("v"),
      explode(array((0 until tables).map(t =>
        struct(lit(t).as("t"), lshBucket(col("v"), dim, planes, t).as("b"))): _*))
        .as("tb"))
      .select(col("vec_id"), col("v"), col("tb.t"), col("tb.b"))
    val q = buckets.filter(isQuery)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("t"), col("b"))
    val cand = q.join(buckets, Seq("t", "b"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("qv"), col("vec_id"), col("v"))
      .dropDuplicates("q_id", "vec_id")
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    cand
      .withColumn("cos", cosine(col("qv"), col("v")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("vec_id"), round(col("cos"), 4).as("cos"), col("rk"))
  }
}
