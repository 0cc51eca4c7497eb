package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps.dot_product

/** Product quantization (PQ) approximate nearest neighbor — the
  * compressed-domain scale path next to brute force
  * ([[Similarity.cosineTopK]]), LSH ([[Similarity.lshCosineTopK]]) and
  * IVF ([[Ivf.ivfCosineTopK]]), completing the ANN family per
  * SURVEY.md §7.6.
  *
  * Build: the embedding space is split into `m` coordinate subspaces;
  * each subspace gets its own KMeans codebook of `k` centroids (fit
  * once — at 100 TB, on a sample). A corpus vector is stored as `m`
  * small codes (one byte each for k ≤ 256) — a 4·dim-byte float vector
  * becomes m bytes, a 32× compression at dim=64/m=8 and 384× at
  * dim=768/m=8, which is what lets a 100 TB corpus's index fit in
  * cluster memory. Query: asymmetric distance computation (ADC) — the
  * query stays full precision, a per-query lookup table of
  * query-subvector→centroid distances is broadcast, and each corpus
  * vector's approximate distance is m table lookups instead of dim
  * multiplies.
  *
  * Everything is declarative DataFrame ops: codebooks are a broadcast
  * m×k-row table, encode is a broadcast join + `min_by` aggregate, and
  * ADC scoring is a broadcast join + sum aggregate — no UDFs, no
  * driver-side loops over data (the only collect is the m×k centroid
  * matrix, bounded by construction).
  */
object Pq {

  /** ‖a−b‖² expanded to native dot products (no lambda subtraction —
    * stays codegen'd): a·a − 2a·b + b·b. */
  private def dist2(a: Column, b: Column): Column =
    dot_product(a, a) - lit(2.0) * dot_product(a, b) + dot_product(b, b)

  /** Train the m codebooks with Lloyd's iteration over a BOUNDED,
    * deterministic corpus sample collected to the driver. Codebooks are
    * index METADATA -- m*k centroids, ~1 KB -- exactly like the LSH
    * plane matrix ([[graft.functions.SignProjectionBucket]]); they need
    * thousands of points per centroid, not the corpus, so the sample is
    * capped (hash-ordered `limit`, rerun-identical) and training cost
    * is O(cap * k * m * iters) driver arithmetic, independent of corpus
    * size. The two distributed alternatives both lose: one ml.KMeans
    * per subspace schedules m independent init+iter job chains
    * (measured ~7 s at sf0.01 even run concurrently), and a batched
    * all-subspace Lloyd pays 4-5 shuffle stages per iteration
    * (measured ~10 s) -- per-job scheduling overhead dwarfs the
    * microseconds of arithmetic at any sample size worth training on.
    *
    * No RNG anywhere: the sample is the `sampleCap` hash-smallest
    * vectors, seeds are its first k subvectors, assignment ties break
    * to the lowest code, empty codes keep their previous centroid, and
    * driver arithmetic is sequential -- so codebooks are bit-identical
    * across reruns AND cluster layouts (a distributed groupBy-avg
    * would not be: float summation order varies with partitioning).
    * Returns the codebook table `(sub, code, cent)`.
    */
  def trainCodebooks(emb: DataFrame, m: Int, k: Int, seed: Long = 42L,
                     maxIter: Int = 8, sampleCap: Int = 4096): DataFrame = {
    val spark = emb.sparkSession
    val sample: Array[Array[Double]] = emb
      .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
      .withColumn("h", xxhash64(col("vec_id") + lit(seed)))
      .orderBy(col("h"), col("vec_id")).limit(sampleCap)
      .select(col("v")).collect().map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "empty corpus")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subDim = dim / m
    val rows = (0 until m).flatMap { s =>
      val pts = sample.map(v => java.util.Arrays.copyOfRange(v, s * subDim, (s + 1) * subDim))
      var cent = pts.take(k).map(_.clone)
      for (_ <- 1 to maxIter) {
        val sums = Array.fill(cent.length, subDim)(0.0)
        val counts = new Array[Long](cent.length)
        pts.foreach { p =>
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < cent.length) {
            var d = 0.0; var j = 0
            while (j < subDim) { val t = p(j) - cent(c)(j); d += t * t; j += 1 }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          counts(best) += 1
          var j = 0
          while (j < subDim) { sums(best)(j) += p(j); j += 1 }
        }
        cent = cent.zipWithIndex.map { case (old, c) =>
          if (counts(c) == 0) old
          else sums(c).map(_ / counts(c))
        }
      }
      cent.zipWithIndex.map { case (c, code) => (s, code, c) }
    }
    import spark.implicits._
    rows.toDF("sub", "code", "cent")
  }

  /** Encode the corpus: per vector and subspace, the nearest centroid's
    * code (`min_by` over the broadcast codebook join; distance ties
    * break to the lowest code, so the encoding is deterministic).
    * Returns `(vec_id, codes)` with `codes[sub]` ordered by subspace —
    * the m-byte compressed representation an index stores.
    */
  def encode(emb: DataFrame, codebooks: DataFrame, m: Int): DataFrame = {
    val subs = emb
      .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"),
        explode(sequence(lit(0), lit(m - 1))).as("sub"))
      .join(broadcast(codebooks), "sub")
      .select(col("vec_id"), col("sub"), col("code"),
        dist2(slice(col("v"), col("sub") * size(col("cent")) + 1,
          size(col("cent"))), col("cent")).as("d2"))
    subs
      .groupBy(col("vec_id"), col("sub"))
      .agg(min_by(col("code"), struct(col("d2"), col("code"))).as("code"))
      .groupBy(col("vec_id"))
      .agg(transform(array_sort(collect_list(struct(col("sub"), col("code")))),
        x => x.getField("code")).as("codes"))
  }

  /** ADC approximate top-k: queries keep full precision; per query a
    * (sub, code) → distance² lookup table is derived from the codebook
    * (|Q|·m·k rows — broadcast-sized for any reasonable query batch),
    * and a corpus vector's approximate ‖q−x‖² is the sum of its m
    * looked-up entries. The scoring join is broadcast (map-side); the
    * per-(query, vector) sum is a partial-aggregating shuffle of
    * |Q|·n short rows — the same shape as the brute-force scan but
    * over codes instead of floats.
    */
  def adcTopK(emb: DataFrame, isQuery: Column, k: Int, m: Int,
              kCodes: Int = 16, seed: Long = 42L,
              maxIter: Int = 8): DataFrame = {
    val codebooks = trainCodebooks(emb, m, kCodes, seed, maxIter)
    val codes = encode(emb, codebooks, m)
    val queries = emb.filter(isQuery)
      .select(col("vec_id").as("q_id"), Similarity.toDouble(col("embedding")).as("qv"))
    val lut = queries
      .select(col("q_id"), col("qv"),
        explode(sequence(lit(0), lit(m - 1))).as("sub"))
      .join(broadcast(codebooks), "sub")
      .select(col("q_id"), col("sub"), col("code"),
        dist2(slice(col("qv"), col("sub") * size(col("cent")) + 1,
          size(col("cent"))), col("cent")).as("d2"))
    val corpusCodes = codes.select(col("vec_id"),
      posexplode(col("codes")).as(Seq("sub", "code")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("adc"), col("vec_id"))
    corpusCodes
      .join(broadcast(lut), Seq("sub", "code"))
      .where(col("q_id") =!= col("vec_id"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(sum(col("d2")).as("adc"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("q_id"), col("vec_id"), round(col("adc"), 4).as("adc"), col("rk"))
  }

  /** ADC shortlist + exact re-rank — the production PQ read path
    * (FAISS-style IVFADC+refine): the compressed scan cuts the
    * candidate set from n to `shortlist` per query, then only the
    * shortlist's full-precision vectors are fetched and re-ranked
    * exactly. At 100 TB the full vectors live in a separate
    * (vec_id-bucketed) table, so the refine join touches
    * |Q|·shortlist rows of it, not the corpus. Recall is set by the
    * shortlist ratio; quantization error only costs recall when a
    * true neighbor falls outside the shortlist entirely.
    */
  def adcRerankTopK(emb: DataFrame, isQuery: Column, k: Int, m: Int,
                    shortlist: Int = 50, kCodes: Int = 16,
                    seed: Long = 42L, maxIter: Int = 8): DataFrame = {
    val short = adcTopK(emb, isQuery, shortlist, m, kCodes, seed, maxIter)
      .select(col("q_id"), col("vec_id"))
    val e = emb.select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
    val q = e.filter(isQuery).select(col("vec_id").as("q_id"), col("v").as("qv"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("d2"), col("vec_id"))
    short
      .join(broadcast(q), "q_id")
      .join(e, "vec_id")
      .withColumn("d2", dist2(col("qv"), col("v")))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("q_id"), col("vec_id"), round(col("d2"), 4).as("d2"), col("rk"))
  }

  /** Exact squared-L2 top-k — the brute-force ground truth PqSpec
    * measures ADC recall against (same broadcast-query × streamed-corpus
    * shape as [[Similarity.cosineTopK]]). */
  def l2TopK(emb: DataFrame, isQuery: Column, k: Int): DataFrame = {
    val e = emb.select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
    val q = e.filter(isQuery).select(col("vec_id").as("q_id"), col("v").as("qv"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("d2"), col("vec_id"))
    broadcast(q).join(e, col("q_id") =!= col("vec_id"))
      .withColumn("d2", dist2(col("qv"), col("v")))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("q_id"), col("vec_id"), round(col("d2"), 4).as("d2"), col("rk"))
  }

  /** Decode: reconstruct each vector from its codes (centroid concat in
    * subspace order) — used by PqSpec to pin ADC distance == exact
    * distance to the reconstruction (the identity that makes ADC an
    * unbiased index: the only error source is quantization). */
  def decode(codes: DataFrame, codebooks: DataFrame): DataFrame =
    codes
      .select(col("vec_id"), posexplode(col("codes")).as(Seq("sub", "code")))
      .join(broadcast(codebooks), Seq("sub", "code"))
      .groupBy(col("vec_id"))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("sub"), col("cent")))),
        x => x.getField("cent"))).as("recon"))
}
