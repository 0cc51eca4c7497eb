package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.model.Tables
import graft.text.Ivf

/** Write-once IVF index layout — [[Ivf]]'s own doc says "the index is
  * just a cell_id column, so it lives in the table layout"; this
  * module EXECUTES that claim (the [[ComponentLayout]] treatment for
  * the ANN family). q83's self-join and q143's label agreement share
  * one quantizer over the same corpus, and each used to re-fit KMeans
  * per query (~1.5 s of every bench pass each at sf0.1) for the same
  * assignment.
  *
  * Two parquets per (sfDir, spec): the cell-indexed corpus
  * (vec_id, v, cell) — at 100 TB this is the corpus table itself,
  * partitioned/bucketed by cell — and the nCells-row centroid table.
  * The directory embeds (nCells, seed, maxIter, version), the
  * [[BucketedTables]] fingerprint discipline.
  */
object IvfLayout {

  /** Bump when the quantizer build changes semantically.
    * v2: same cell assignments as v1 (identical KMeans fit), the
    * corpus rows additionally carry the base table's `label` column —
    * at 100 TB the cell-indexed corpus IS the corpus table itself
    * (cell is just a column on it), so every physical column rides
    * along for free; v1 forced q143/q202 to re-scan embeddings and
    * join the label back per query (one scan + one broadcast join +
    * one localCheckpoint each, every run). */
  private val LayoutVersion = 2

  /** Corpus-count memo for the [[Ivf.cellsFor]] geometry dispatch:
    * the count is parquet-footer METADATA of a static fixture table
    * (the resolved value is baked into the layout directory name),
    * but `DataFrame.count()` still runs a Spark job per call — one
    * fixed-cost job inside EVERY consumer query (q83/q143/q202/q203).
    * Memoized per (session, sfDir) exactly like Spark's own
    * FileIndex caching; never caches query results. */
  private val countMemo =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  private def root(sfDir: String, nCells: Int, seed: Long, maxIter: Int): String =
    s"${SourceLayout.root("graft_ivf", sfDir)}/c${nCells}_s${seed}_i${maxIter}_v$LayoutVersion"

  /** (indexed corpus, centroids) for the embeddings table at `sfDir` —
    * fit + written once per spec, read from the layout afterwards.
    * `nCells = 0` (the default) dispatches the geometry on the corpus
    * count via [[Ivf.cellsFor]] — the measured-crossover rule; the
    * resolved count is part of the layout directory, so a corpus grown
    * past a geometry breakpoint re-fits rather than silently reusing
    * stale cells. The count itself is parquet-footer metadata, not a
    * scan. */
  def index(s: SparkSession, sfDir: String, nCells: Int = 0,
            seed: Long = 42L, maxIter: Int = 8): (DataFrame, DataFrame) = {
    val cells =
      if (nCells > 0) nCells
      else Ivf.cellsFor(countMemo.computeIfAbsent(sfDir,
        d => Tables.embeddings(s, d).count()))
    val base = root(sfDir, cells, seed, maxIter)
    val corpusDir = s"$base/corpus"
    val centDir = s"$base/centroids"
    SourceLayout.writeOnce(centDir) {
      val emb = Tables.embeddings(s, sfDir)
      val (indexed, centroids) = Ivf.buildIndex(emb, cells, seed, maxIter)
      // corpus first: the centroid _SUCCESS is the layout's completion
      // marker, so a half-written pair is never re-registered
      indexed.join(emb.select(col("vec_id"), col("label")), Seq("vec_id"))
        .write.mode("overwrite").parquet(corpusDir)
      // one file: the centroid table is nCells rows; a file per row
      // just multiplies listing/footer overhead on every read
      centroids.coalesce(1).write.mode("overwrite").parquet(centDir)
    }
    (s.read.parquet(corpusDir)
        .select(col("vec_id"), col("v"), col("cell"), col("label")),
      s.read.parquet(centDir))
  }
}
