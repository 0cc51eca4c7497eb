package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.functions.RollingMinHash
import graft.functions.RollingMinHash.rolling_min_hash
import graft.model.Tables

class TextSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog today"),
    (2L, "THE  quick   Brown fox jumps over the lazy dog today"), // = 1 normalized
    (3L, "the quick brown fox jumps over the lazy cat today"),    // near-dup of 1
    (4L, "completely different content about spark query engines here now"))
    .toDF("doc_id", "text")

  test("exactDupGroups groups case/whitespace-normalized duplicates") {
    val groups = Dedup.exactDupGroups(docs).collect()
    assert(groups.length === 3)
    val dup = groups.find(_.getLong(2) == 2L).get
    assert(dup.getLong(1) === 1L) // keeper = min doc_id
  }

  test("jaccardPairs finds planted near-dups and not unrelated docs") {
    val pairs = Dedup.jaccardPairs(docs, 0.4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L))) // identical after lowering
    assert(pairs.contains((1L, 3L))) // one-token change
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("containmentPairs catches the engulfed doc that Jaccard misses") {
    import spark.implicits._
    // doc 10 is wholly quoted inside doc 11 (every 3-gram of 10 appears
    // in 11), doc 12 is unrelated
    val quoted = Seq(
      (10L, "alpha beta gamma delta epsilon"),
      (11L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (12L, "one two three four five six"))
      .toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(quoted, 0.6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(cont.toSeq === Seq((10L, 11L, 1.0)),
      s"expected exactly the engulfed direction, got ${cont.toSeq}")
    // the same pair sits BELOW a 0.6 Jaccard: containment is the only
    // detector that fires (3 shared grams / 8 union = 0.375)
    val jac = Dedup.jaccardPairs(quoted, 0.6).collect()
    assert(jac.isEmpty, "Jaccard at 0.6 should miss the engulfed pair")
    // symmetric duplicates emit both directions
    val twin = Seq((20L, "a b c d"), (21L, "a b c d")).toDF("doc_id", "text")
    val both = Dedup.containmentPairs(twin, 0.6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(both === Set((20L, 21L, 1.0), (21L, 20L, 1.0)))
  }

  test("minHashLshPairs ⊆ exact pairs with full recall on fixture docs") {
    val fixture = Tables.documents(spark, SparkTestSession.Sf0001)
    val exact = Dedup.jaccardPairs(fixture, 0.4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minHashLshPairs(fixture, 0.4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), "LSH must not produce false positives after verification")
    assert(exact.nonEmpty, "fixture should contain near-dups")
    val recall = lsh.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall too low")
  }

  test("minHashLshPairs maxBucket: planted hot bucket thinned, pairs ⊆ uncapped, clique stays one component") {
    // the SCALING.md cliff-1 regime: a copied-everywhere page — 40
    // identical docs land in the SAME (band, hash) bucket in every
    // band, and the uncapped candidate join pays C(40,2) per band
    val clique = (100L until 140L).map(id =>
      (id, "repeated boilerplate page content scraped from everywhere again and again"))
    val rest = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy cat today"),
      (3L, "completely different content about spark query engines here now"))
    val corpus = (clique ++ rest).toDF("doc_id", "text")
    val uncapped = Dedup.minHashLshPairs(corpus, 0.4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Dedup.minHashLshPairs(corpus, 0.4, maxBucket = Some(8))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // soundness: capping only removes candidates, never invents them,
    // and the exact-Jaccard verification still gates every pair
    assert(capped.subsetOf(uncapped), "capped pairs must be a subset")
    assert(uncapped.count(p => p._1 >= 100L && p._2 >= 100L) === 40 * 39 / 2)
    assert(capped.count(p => p._1 >= 100L && p._2 >= 100L) < 40 * 39 / 2,
      "the cap must actually thin the hot bucket")
    // the recall that matters downstream is COMPONENT-level, and the
    // bucket-anchor mechanism makes it exact: every member of an
    // overfull bucket pairs with the bucket representative, so ALL 40
    // docs appear and form ONE dedup group — by construction, not by
    // multi-band luck
    val comp = Components.connectedComponents(
        capped.toSeq.toDF("src", "dst")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val present = (100L until 140L).filter(comp.contains)
    assert(present.size === 40, s"cap isolated ${40 - present.size} docs")
    val cliqueLabels = present.map(comp(_)).toSet
    assert(cliqueLabels.size === 1, s"clique split into $cliqueLabels")
    // the normal near-dup pair is untouched (its bucket is under cap)
    assert(capped.contains((1L, 2L)))
  }

  test("minHashLshPairs maxBucket: MIXED overfull bucket — dropped cross pairs fall back to multi-band recall (floor pinned)") {
    // The SCALING.md cliff-1 honest recall limit, now planted instead
    // of prose-only: an overfull bucket that is NOT one duplicate
    // class. A 30-doc identical clique makes every one of its band
    // buckets overfull at cap 8, and 12 "satellite" docs share a
    // 13-token prefix with it — J = 11/25 = 0.44 against the clique
    // AND against each other, so every cross pair is a TRUE pair at
    // threshold 0.4, but the satellites are not members of the
    // exact-dup class. Whenever a band's minhash rows land in the
    // shared prefix, a satellite rides the clique's overfull bucket:
    // there it usually misses the thinning coin, and its cross pairs
    // to OTHER satellites are not anchor pairs (anchors only attach
    // members to the representative) — such a pair survives only via
    // the multi-band OR (another band where the two meet in a small
    // bucket) exactly as documented.
    val common = (0 until 13).map(i => s"c$i").mkString(" ")
    val clique = (200L until 230L).map(id =>
      (id, common + " k0 k1 k2 k3 k4 k5 k6"))
    val sats = (300L until 312L).map(id =>
      (id, common + (0 until 7).map(j => s" s${id}x$j").mkString))
    val corpus = (clique ++ sats).toDF("doc_id", "text")
    val exact = Dedup.jaccardPairs(corpus, 0.4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.size === 30 * 29 / 2 + 30 * 12 + 12 * 11 / 2,
      "fixture must make every clique, cross, and sat-sat pair true")
    val capped = Dedup.minHashLshPairs(corpus, 0.4, maxBucket = Some(8))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // soundness is unconditional: verification gates every emitted pair
    assert(capped.subsetOf(exact), "capping must never invent pairs")
    // the adversarial regime must actually engage: with every clique
    // bucket overfull, the clique's own C(30,2) pair list is thinned
    val cliquePairs = capped.count(p => p._1 < 300L && p._2 < 300L)
    assert(cliquePairs < 30 * 29 / 2, "cap did not engage on the clique")
    // pair-level floor: a cross pair dropped from an overfull bucket
    // survives only if BOTH members win the thinning coin in some
    // shared band (P ≈ (cap/size)² per band, OR'd over the ~s²·32
    // shared bands) or one of them IS the representative. MEASURED on
    // this fixture: 0.603 — the quantified honest recall limit the
    // SCALING.md cliff-1 prose states qualitatively. Pinned at ≥ 0.5
    // (deterministic hash family, so the number is stable; the slack
    // covers future k/bands retuning). Graceful, not exact — and the
    // component-level guarantee below is what downstream dedup
    // actually consumes.
    val crossTrue = exact.filter(p => p._2 >= 300L)
    val crossKept = crossTrue.count(capped.contains)
    val recall = crossKept.toDouble / crossTrue.size
    assert(recall >= 0.5, s"multi-band fallback recall $recall below floor")
    assert(recall < 1.0,
      "fixture no longer drops any cross pair — not adversarial, rebuild it")
    // component-level: anchors keep every doc attached — one dedup
    // group spanning clique + satellites, same as the exact pair graph
    val comp = Components.connectedComponents(
        capped.toSeq.toDF("src", "dst")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.keySet === (200L until 230L).toSet ++ (300L until 312L).toSet,
      "cap isolated a doc from the mixed component")
    assert(comp.values.toSet.size === 1, "mixed component split")
  }

  test("simHash (single-aggregate) matches the wide 64-sum reference form") {
    val fixture = Tables.documents(spark, SparkTestSession.Sf0001)
    val fast = Dedup.simHash(fixture).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wide = Dedup.simHashWide(fixture).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast === wide)
  }

  test("simHashPairs finds normalized-identical docs at hamming 0") {
    val pairs = Dedup.simHashPairs(docs, 3).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs.get((1L, 2L)).contains(0))
    assert(!pairs.keySet.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("jaccardPairsPrefix (PPJoin prefix filter) equals the plain exact join") {
    val fixture = Tables.documents(spark, SparkTestSession.Sf0001)
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val plain = asMap(Dedup.jaccardPairs(fixture, 0.4))
    val prefixed = asMap(Dedup.jaccardPairsPrefix(fixture, 0.4))
    assert(plain.nonEmpty, "fixture should contain near-dups")
    assert(prefixed === plain, "prefix filter must lose nothing (exact method)")
  }

  test("ShingleLayout read-back equals the direct shingleRows derivation") {
    val d = SparkTestSession.Sf0001
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val direct = rows(Dedup.shingleRows(Tables.documents(spark, d), 3)
      .select("doc_id", "sh", "n_sh"))
    val layout = rows(graft.sources.ShingleLayout.shingles(spark, d)
      .select("doc_id", "sh", "n_sh"))
    assert(layout === direct,
      "the write-once shingle layout must be value-identical to the in-query derivation")
  }

  test("PairsLayout read-back equals the direct jaccardPairs derivation") {
    val d = SparkTestSession.Sf0001
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val direct = rows(Dedup.jaccardPairs(Tables.documents(spark, d), 0.4)
      .select("doc_a", "doc_b", "jaccard"))
    val layout = rows(graft.sources.PairsLayout.jaccardPairs(spark, d, 0.4)
      .select("doc_a", "doc_b", "jaccard"))
    assert(layout === direct,
      "the write-once pair layout must be value-identical to the in-query derivation")
  }

  test("winnowFingerprints matches an independent driver-side winnowing") {
    // independent re-implementation of the gram hash (PolyHash: base-31
    // polynomial over UTF-8 bytes with 64-bit wrap-around)
    def xx(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((h, b) => h * 31L + b)
    def winnowRef(text: String, k: Int, w: Int): Set[(Int, Long)] = {
      val toks = text.trim.toLowerCase.split("\\s+").toSeq
      val grams = (0 to toks.length - k)
        .map(i => (i, xx(toks.slice(i, i + k).mkString(" "))))
      if (grams.isEmpty) Set.empty
      else {
        val starts = if (grams.length < w) Seq(0) else 0 to (grams.length - w)
        starts.map { st =>
          grams.slice(st, st + w).minBy { case (p, h) => (h, -p) }
        }.toSet
      }
    }
    val fixture = Tables.documents(spark, SparkTestSession.Sf0001)
    val got = Dedup.winnowFingerprints(fixture, 3, 4).collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => (r.getInt(1), r.getLong(2))).toSet).toMap
    val texts = fixture.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(texts.nonEmpty)
    texts.foreach { case (id, text) =>
      val expect = winnowRef(text, 3, 4)
      assert(got.getOrElse(id, Set.empty) === expect, s"doc $id fingerprints differ")
    }
  }

  test("rolling_min_hash matches an independent reimplementation") {
    def reference(s: String, k: Int): Long = {
      val b = s.getBytes("UTF-8")
      if (b.length < k) b.foldLeft(0L)((h, x) => h * 31 + x)
      else (0 to b.length - k).map { i =>
        b.slice(i, i + k).foldLeft(0L)((h, x) => h * 31 + x)
      }.min
    }
    val texts = Seq("hello world this is a document", "short", "",
      "the quick brown fox jumps over the lazy dog")
    val got = texts.toDF("t")
      .select(rolling_min_hash(col("t"), 16)).as[Long].collect()
    assert(got.toSeq === texts.map(reference(_, 16)))
  }

  test("rolling_min_hash collides for docs sharing long runs, not for different docs") {
    val out = Seq(
      (1L, "PREFIX added but the shared middle section stays exactly the same here"),
      (2L, "but the shared middle section stays exactly the same here"),
      (3L, "an entirely unrelated piece of text with nothing in common at all"))
      .toDF("id", "t").select(col("id"), rolling_min_hash(col("t"), 16).as("f"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) === out(2L)) // min window survives the prefix edit
    assert(out(1L) !== out(3L))
  }

  test("embedding-cosine LSH dedup: no false positives, measured recall") {
    val emb = Tables.embeddings(spark, SparkTestSession.Sf0001)
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Dedup.embeddingDupPairs(emb, 0.4))
    val lsh = pairs(Dedup.embeddingDupPairsLsh(emb, 0.4, dim = 64))
    assert(exact.nonEmpty)
    assert(lsh.subsetOf(exact), "cosine filter must kill bucket false positives")
    val recall = lsh.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall too low")
  }

  test("langId + quality metrics are deterministic and bounded") {
    // orderBy before limit: a bare limit() is only deterministic while
    // the scan stays single-partition — pin WHICH 50 docs this means
    val fixture = Tables.documents(spark, SparkTestSession.Sf0001)
      .orderBy(col("doc_id")).limit(50)
    val rows = fixture.select(
      TextAnalysis.langId(col("text")).as("lang"),
      TextAnalysis.qualityScore(col("text")).as("q"),
      TextAnalysis.stopwordRatio(col("text")).as("sr")).collect()
    assert(rows.forall(r => Set("en", "es", "de").contains(r.getString(0))))
    assert(rows.forall { r =>
      val q = r.getDouble(1); q >= 0.0 && q <= 1.0
    })
  }

  // ExactSubstr hand corpus (n=3): doc1/doc2 share a 5-token run;
  // doc3's dup grams sit at positions 0 and 2 (1 is NOT dup) so their
  // intervals overlap — the cumulative-max sweep must merge them into
  // ONE span (consecutive-position islands would emit two overlapping
  // ones); doc4 has two gapped spans; doc5 none; doc6 repeats a gram
  // WITHIN one doc (the ≥2-occurrences-anywhere semantics).
  private def substrDocs = Seq(
    (1L, "a b c d e f g h i j"),
    (2L, "x y a b c d e q r s"),
    (3L, "aa bb cc dd ee"),
    (4L, "aa bb cc zz cc dd ee"),
    (5L, "k l m n o"),
    (6L, "r1 r2 r3 q1 r1 r2 r3"))
    .toDF("doc_id", "text")

  test("duplicatedSpans: interval union over corpus-duplicated grams") {
    val spans = Dedup.duplicatedSpans(substrDocs, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(spans === Set(
      (1L, 0L, 5L), (2L, 2L, 5L), // cross-doc shared run
      (3L, 0L, 5L),               // overlapping intervals merged (pos 0 + 2)
      (4L, 0L, 3L), (4L, 4L, 3L), // gap > 1 past running end splits
      (6L, 0L, 3L), (6L, 4L, 3L)) // within-doc repetition counts
    )
  }

  test("SpansLayout read-back equals the direct duplicatedSpans derivation") {
    val d = SparkTestSession.Sf0001
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val direct = rows(Dedup.duplicatedSpans(Tables.documents(spark, d), 8))
    val layout = rows(graft.sources.SpansLayout.duplicatedSpans(spark, d, 8))
    assert(layout === direct,
      "the write-once span layout must be value-identical to the in-query derivation")
  }

  test("yesterdayGrams layout equals the direct corpus-side gram index") {
    val d = SparkTestSession.Sf0001
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(_.getString(0)).toSet
    val direct = rows(Dedup.positionalShingles(
        Tables.documents(spark, d)
          .filter(org.apache.spark.sql.functions.col("doc_id") % 17 =!= 0), 8)
      .select(org.apache.spark.sql.functions.col("sh")).distinct())
    val layout = rows(graft.sources.SpansLayout.yesterdayGrams(spark, d, 8))
    assert(layout === direct,
      "the write-once gram index must be value-identical to the in-query derivation")
  }

  test("hashed-key duplicatedSpans equals the text-key form (fixture + hand corpus)") {
    def spans(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(spans(Dedup.duplicatedSpans(substrDocs, 3, hashedKey = true)) ===
      spans(Dedup.duplicatedSpans(substrDocs, 3)))
    val fixture = Tables.documents(spark, SparkTestSession.Sf0001)
    assert(spans(Dedup.duplicatedSpans(fixture, 8, hashedKey = true)) ===
      spans(Dedup.duplicatedSpans(fixture, 8)))
  }

  test("duplicatedSpansAgainst flags only corpus-duplicating spans, not within-wave") {
    import spark.implicits._
    val existing = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val incoming = Seq(
      (101L, "x x a b c z z"),  // only 'a b c' exists in the corpus
      (102L, "q r s t u"),      // nothing shared
      (103L, "x x a b c z z"))  // identical to 101 — within-wave dup must NOT count
      .toDF("doc_id", "text")
    val spans = Dedup.duplicatedSpansAgainst(existing, incoming, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(spans === Set((101L, 2L, 3L), (103L, 2L, 3L)))
  }

  // independent textbook DP — pins Spark's levenshtein against a
  // second implementation, not just against DuckDB's
  private def refLevenshtein(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = dp(0); dp(0) = j
      for (i <- 1 to a.length) {
        val cur = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(a.length)
  }

  test("q204 edit verification: substitution dup passes, rotation fails, cap yields -1") {
    val base = "the quick brown fox jumps over the lazy dog"
    val subbed = "the quick brown fox jumps over the lazy cat"
    val rotated = "over the lazy dog the quick brown fox jumps"
    // long near-dup pair whose edit distance exceeds the 100 cap:
    // 100 shared 4-char tokens with 30 extra tokens spliced mid-doc
    val longTokens = (1 to 100).map(i => f"w$i%03d")
    val longBase = longTokens.mkString(" ")
    val longIns = (longTokens.take(50) ++ (1 to 30).map(i => f"x$i%03d") ++
      longTokens.drop(50)).mkString(" ")
    val docs = Seq(
      (1L, base), (2L, subbed), (3L, rotated),
      (10L, longBase), (11L, longIns))
      .toDF("doc_id", "text")
    val out = graft.queries.TextQueries.editVerifyDedup(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getInt(3), r.getDouble(4), r.getInt(5)))).toMap

    // dog→cat: 3 substitutions, ratio 3/43 — a verified dup; the
    // reported distance must equal the independent DP
    assert(refLevenshtein(base, subbed) === 3)
    assert(out((1L, 2L)) === ((3, BigDecimal(3.0 / 43)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble, 1)))

    // the rotation shares 5/9 shingles (candidate!) but is NOT a
    // character-level dup — the operator's reason to exist; its
    // distance must still equal the DP (well under the cap)
    val dRot = refLevenshtein(base, rotated)
    assert(dRot > 8, s"rotation should cost real edits, got $dRot")
    val (gotRot, ratioRot, dupRot) = out((1L, 3L))
    assert(gotRot === dRot && dupRot === 0,
      s"rotation pair: got=$gotRot ref=$dRot dup=$dupRot")
    assert(ratioRot > 0.2)

    // the spliced long pair is a shingle candidate whose true distance
    // exceeds the cap: capped scan must report -1, never the distance
    assert(refLevenshtein(longBase, longIns) > 100)
    assert(out((10L, 11L)) === ((-1, -1.0, 0)))

    // rotation vs subbed is also a candidate pair; no pair may vanish
    assert(out.contains((2L, 3L)))
    assert(out.size === 4, s"unexpected candidate set: ${out.keySet}")
  }

  test("exactSubstrCut removes exactly the spanned tokens, keeps all docs") {
    val cut = Dedup.exactSubstrCut(substrDocs, 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(cut(1L) === ((5L, "f g h i j")))
    assert(cut(2L) === ((5L, "x y q r s")))
    assert(cut(3L) === ((0L, ""))) // fully duplicated doc survives, empty
    assert(cut(4L) === ((1L, "zz")))
    assert(cut(5L) === ((5L, "k l m n o"))) // untouched
    assert(cut(6L) === ((1L, "q1")))
  }

  test("RAKE: hand degree/frequency scores, stopword splits, 4-word chunking") {
    // doc 1: two identical runs → freq 2 / deg 6 per word → wscore 3,
    //   phrase score 9; doc 2: singleton runs → wscore 1; doc 3: a
    //   6-word run chunks 4+2 — the 4-chunk's words carry deg 4 each
    //   → phrase score 16 beats the 2-chunk's 4
    val in = Seq(
      (1L, "spark shuffle join in spark shuffle join"),
      (2L, "scan the scan"),
      (3L, "w1 w2 w3 w4 w5 w6"))
      .toDF("doc_id", "text")
    val got = graft.queries.TextQueries.rake(in).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(got(1L) === (("spark shuffle join", 9.0)))
    assert(got(2L) === (("scan", 1.0)))
    assert(got(3L) === (("w1 w2 w3 w4", 16.0)))
  }
}
