package graft.text

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING — the missing half of the
  * token-counting surface ([[TextAnalysis.bpeishTokenCount]] estimates
  * a budget with a fixed pre-tokenizer; this learns the merge table
  * itself). The split of labor is the standard one at any scale,
  * 100 TB included:
  *
  *  - WORD COUNTING is distributed (one shuffle on the word) — the only
  *    pass that touches the corpus;
  *  - the MERGE LOOP runs on the driver over the word→frequency table,
  *    which is bounded by the (capped) vocabulary, not the corpus — the
  *    classic Sennrich et al. algorithm is defined over exactly this
  *    table, so there is nothing distributed left to do;
  *  - ENCODING broadcasts the learned merge ranks and maps partitions —
  *    embarrassingly parallel, no state.
  *
  * Deterministic throughout: ties in pair frequency break
  * lexicographically, the vocab cap takes the most frequent words with
  * a lexicographic tie-break, and the driver loop is sequential.
  */
object Bpe {

  type Merge = (String, String)

  /** End-of-word marker (Sennrich convention): lets a merge distinguish
    * "est" inside a word from "est" ending one. */
  val Eow = "</w>"

  /** Distributed word counts, capped to the `vocabCap` most frequent
    * words (count desc, word asc) — the ONLY corpus-wide pass. */
  def wordCounts(docs: DataFrame, vocabCap: Int = 10000): Array[(String, Long)] =
    graft.model.Tables.spread(docs, col("doc_id"))
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w"))
      .limit(vocabCap)
      .collect().map(r => (r.getString(0), r.getLong(1)))

  /** Classic BPE merge learning over a word-frequency table (driver
    * arithmetic; the table is vocab-bounded by construction). */
  def learnMerges(vocab: Array[(String, Long)], nMerges: Int): Seq[Merge] = {
    var words: Array[(Vector[String], Long)] = vocab.map { case (w, n) =>
      (w.map(_.toString).toVector :+ Eow, n)
    }
    val merges = Vector.newBuilder[Merge]
    var done = 0
    while (done < nMerges) {
      val counts = scala.collection.mutable.Map.empty[Merge, Long]
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + n
          i += 1
        }
      }
      if (counts.isEmpty) done = nMerges
      else {
        val best = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }._1
        merges += best
        words = words.map { case (syms, n) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
              out += syms(i) + syms(i + 1); i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.result(), n)
        }
        done += 1
      }
    }
    merges.result()
  }

  /** Apply learned merges to one word (greedy by merge rank — the
    * standard encode). */
  def encodeWord(word: String, rank: Map[Merge, Int]): Vector[String] = {
    var syms = word.map(_.toString).toVector :+ Eow
    var continue = true
    while (continue && syms.length > 1) {
      var bestIdx = -1
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0) continue = false
      else syms = (syms.take(bestIdx) :+ (syms(bestIdx) + syms(bestIdx + 1))) ++
        syms.drop(bestIdx + 2)
    }
    syms
  }

  /** Per-doc BPE token counts under a learned merge table: the merge
    * ranks ride to executors inside the mapPartitions closure (a
    * broadcast-sized Map — same shape as the LSH plane matrix), the
    * corpus streams once. Returns (doc_id, n_ws, n_bpe). */
  def tokenCounts(docs: DataFrame, merges: Seq[Merge]): DataFrame = {
    val rank = merges.zipWithIndex.toMap
    val spark = docs.sparkSession
    import spark.implicits._
    val ds: Dataset[(Long, String)] = docs
      .select(col("doc_id").cast("long"), lower(trim(col("text"))))
      .as[(Long, String)]
    ds.mapPartitions { it =>
      it.map { case (id, text) =>
        val ws = text.split("\\s+").filter(_.nonEmpty)
        val bpe = ws.iterator.map(w => encodeWord(w, rank).length).sum
        (id, ws.length.toLong, bpe.toLong)
      }
    }.toDF("doc_id", "n_ws", "n_bpe")
  }
}
