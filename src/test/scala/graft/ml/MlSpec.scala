package graft.ml

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.ml.regression.LinearRegression
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.etl.Pivot
import graft.model.Tables

class MlSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("normalizeExact divides by variance, not stddev (F11 quirk)") {
    // values 0,2,4: mean=2, var_samp=4 → normalized = (x-2)/4
    val out = Seq(0.0, 2.0, 4.0).toDF("x")
    val got = FeaturePipe.normalizeExact(out, Seq("x"))
      .orderBy("x").select("x_norm").as[Double].collect()
    assert(got.toSeq === Seq(-0.5, 0.0, 0.5))
  }

  test("FeaturePipe fits assemble→standardize→PCA and keeps k dims") {
    val df = Tables.lineitem(spark, SparkTestSession.Sf0001)
      .select(col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        col("l_tax"))
    val model = FeaturePipe.fit(df, df.columns.toSeq, k = 2)
    val vec = model.transform(df).select("features").head.getAs[Vector](0)
    assert(vec.size === 2)
  }

  test("GBT learns a smooth synthetic relation (train MSE bound)") {
    val train = (1 to 400).map { i =>
      val x1 = i % 20; val x2 = (i * 7) % 13
      (x1.toDouble, x2.toDouble, 3.0 * x1 - 2.0 * x2 + 5.0)
    }.toDF("x1", "x2", "label")
    val feat = new VectorAssembler().setInputCols(Array("x1", "x2"))
      .setOutputCol("features").transform(train)
    val model = Regressors.gbt(maxIter = 20).fit(feat)
    val mse = Regressors.mse(model.transform(feat))
    // label range ≈ [-19, 62]; depth-5/20-iter GBT lands ≈2 — the bound
    // guards "actually learned", not perfection
    assert(mse < 5.0, s"train MSE $mse too high for a learnable relation")
    val mseF = Regressors.mseFrame(model.transform(feat)).head
    assert(math.abs(mseF.getDouble(0) - mse) < 1e-9)
  }

  test("gbtWithCategoricals (VectorIndexer stage) beats continuous splits on enum features") {
    // 8 categories whose means are SCRAMBLED relative to the raw code
    // order: threshold splits on the raw code can only cut contiguous
    // ranges, subset splits isolate the true grouping. Shallow trees
    // (depth 2) keep the continuous form from brute-forcing its way out.
    val means = Array(50.0, -20.0, 35.0, 5.0, -45.0, 60.0, -10.0, 20.0)
    val train = (0 until 400).map { i =>
      val c = i % 8
      (c.toDouble, (i % 5).toDouble, means(c))
    }.toDF("cat", "x2", "label")
    val feat = new VectorAssembler().setInputCols(Array("cat", "x2"))
      .setOutputCol("features").transform(train).cache()
    val indexed = Regressors.gbtWithCategoricals(
      maxCategories = 8, maxIter = 3, maxDepth = 2).fit(feat)
    val plain = Regressors.gbt(maxIter = 3).setMaxDepth(2).fit(feat)
    val mseIndexed = Regressors.mse(indexed.transform(feat))
    val msePlain = Regressors.mse(plain.transform(feat))
    assert(mseIndexed < msePlain,
      s"categorical-aware GBT ($mseIndexed) should beat continuous ($msePlain)")
  }

  test("kmeansBestOfSeeds cost is never above the single-seed cost") {
    val daily = Pivot.dailyUserCounters(
      Tables.events(spark, SparkTestSession.Sf0001))
    val feat = new VectorAssembler()
      .setInputCols(Array("clicks", "views", "purchases", "signups", "errors"))
      .setOutputCol("features").transform(daily).cache()
    val single = Clustering.kmeans(k = 4).setMaxIter(10).fit(feat)
      .summary.trainingCost
    val best = Clustering.kmeansBestOfSeeds(feat, k = 4, runs = 5, maxIter = 10)
      .summary.trainingCost
    assert(best <= single + 1e-9, s"best-of-seeds $best worse than single $single")
  }

  test("approx_percentile sketch tracks the exact percentile (q52 twin bound)") {
    val li = Tables.lineitem(spark, SparkTestSession.Sf0001)
    val rows = li.groupBy(col("l_returnflag"))
      .agg(expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("approx"),
        expr("percentile(l_extendedprice, 0.5)").as("exact"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, e) = (r.getDouble(1), r.getDouble(2))
      assert(math.abs(a - e) / math.max(e, 1.0) < 0.02,
        s"approx $a vs exact $e drifts > 2%")
    }
  }

  test("clusterEnsemble partitions the input exactly (M7 property)") {
    val daily = Pivot.dailyUserCounters(
      Tables.events(spark, SparkTestSession.Sf0001))
      .withColumn("label", col("n_events").cast("double"))
    val feat = new VectorAssembler()
      .setInputCols(Array("clicks", "views", "purchases", "signups", "errors"))
      .setOutputCol("features").transform(daily).cache()
    val (models, preds) = Clustering.clusterEnsemble(feat, gbtIters = 5)
    assert(models.nonEmpty)
    assert(preds.count() === feat.count(), "per-cluster predictions must partition the input")
    assert(preds.columns.contains("prediction"))
  }

  test("ALS + topN + hitRate replicate the book pipeline shape (M8-M10)") {
    val ratings = Tables.events(spark, SparkTestSession.Sf0001)
      .select(col("user_id").cast("int").as("user"),
        (get_json_object(col("props"), "$.k").cast("int") % 50).as("item"),
        (col("value") / 20.0).cast("float").as("rating"))
      .filter(col("item").isNotNull)
    val Array(train, test) = ratings.randomSplit(Array(0.6, 0.4), 11L)
    val model = Recommend.als().setMaxIter(5).fit(train)
    val preds = model.transform(test)
    val mse = Regressors.mseFrame(preds, "rating").head.getDouble(0)
    assert(!mse.isNaN && mse >= 0)
    val recs = Recommend.topN(model, 10)
    assert(recs.columns.toSeq === Seq("user", "item", "score"))
    val hr = Recommend.hitRate(recs, test.select("user", "item"))
    assert(hr.columns.toSeq === Seq("user", "n_held", "n_hits"))
    assert(hr.agg(min(col("n_hits"))).head.getLong(0) >= 0)
  }

  test("knnRecommend scores by neighbor similarity and excludes read items") {
    val ratings = Seq(
      (1, 10, 5.0), (1, 11, 4.0),
      (2, 10, 5.0), (2, 11, 4.0), (2, 12, 5.0), // 2 ≈ 1, has extra item 12
      (3, 20, 5.0))                             // disjoint user
      .toDF("user", "item", "rating")
    val recs = Recommend.knnRecommend(ratings, k = 2, topNItems = 3)
      .filter(col("user") === 1).collect()
    assert(recs.map(_.getInt(1)).contains(12), "item 12 comes from the similar user")
    assert(!recs.map(_.getInt(1)).exists(Set(10, 11)), "read items excluded")
  }

  test("coreSlice keeps only the most active users/items") {
    val ratings = Seq(
      (1, 10, 1.0), (1, 11, 1.0), (1, 12, 1.0),
      (2, 10, 1.0), (2, 11, 1.0),
      (3, 10, 1.0))
      .toDF("user", "item", "rating")
    val core = Recommend.coreSlice(ratings, maxUsers = 2, maxItems = 2)
    val users = core.select("user").distinct().as[Int].collect().toSet
    val items = core.select("item").distinct().as[Int].collect().toSet
    assert(users === Set(1, 2))
    assert(items === Set(10, 11))
  }

  test("autoregressive forecast replays a hand-computable trace (M12)") {
    // teach LR the exact relation y_next = (y + y_prev) / 2
    val train = (1 to 50).map { i =>
      val y = i.toDouble; val yPrev = (i % 7).toDouble
      (y, yPrev, (y + yPrev) / 2)
    }.toDF("y", "y_prev", "label")
    val feat = new VectorAssembler().setInputCols(Array("y", "y_prev"))
      .setOutputCol("features").transform(train)
    val lr = new LinearRegression().setLabelCol("label").fit(feat)
    val head = Seq(("a", java.sql.Date.valueOf("2024-01-10"), 4.0, 2.0))
      .toDF("key", "ds", "y", "y_prev")
    val fc = Forecast.autoregressive(lr, head, steps = 3, checkpointEvery = 2)
      .orderBy("ds").collect()
    assert(fc.length === 3)
    assert(fc.map(_.getDate(1).toString).toSeq ===
      Seq("2024-01-11", "2024-01-12", "2024-01-13"))
    val ys = fc.map(_.getDouble(2))
    assert(math.abs(ys(0) - 3.0) < 1e-6)   // (4+2)/2
    assert(math.abs(ys(1) - 3.5) < 1e-6)   // (3+4)/2
    assert(math.abs(ys(2) - 3.25) < 1e-6)  // (3.5+3)/2
  }

  test("flagship E2E runs and its AR model is not the identity (no target leak)") {
    val r = graft.ml.FlagshipPipeline.run(spark, SparkTestSession.Sf0001,
      forecastSteps = 2, gbtIters = 3)
    assert(r.trainMse >= 0.0)
    val fc = r.forecast.collect()
    assert(fc.nonEmpty)
    // leak regression: a model trained with its own label as feature y
    // learns the identity, so EVERY user's step-1 forecast would repeat
    // the last observed y exactly; the correctly-aligned model must
    // disagree with the last observation for at least some users
    val firstStep = fc.groupBy(_.getLong(0)).map { case (k, rows) =>
      k -> rows.minBy(_.getDate(1).getTime).getDouble(2)
    }
    val daily = Pivot.dailyUserCounters(
      graft.etl.Ingest.dedup(Tables.events(spark, SparkTestSession.Sf0001)))
    val lastY = daily.withColumn("rk",
        org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("user_id")).orderBy(col("ds").desc)))
      .filter(col("rk") === 1)
      .select(col("user_id"), col("n_events").cast("double"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(firstStep.exists { case (k, p) => math.abs(p - lastY(k)) > 1e-9 },
      "every step-1 forecast equals the last observation — identity model")
  }

  test("horizonEnsemble averages two horizons per (key, ds) (M13)") {
    val p1 = Seq(("a", java.sql.Date.valueOf("2024-01-01"), 10.0)).toDF("key", "ds", "y")
    val p2 = Seq(("a", java.sql.Date.valueOf("2024-01-01"), 20.0)).toDF("key", "ds", "y")
    val got = Forecast.horizonEnsemble(p1, p2).head.getDouble(2)
    assert(got === 15.0)
  }

  test("tunedLinear CV picks the unregularized model on clean linear data") {
    // y is exactly linear in x — any regularization only hurts, so the
    // grid's best avg-MSE must come from regParam=0 and the refit model
    // must recover the relation
    val train = (1 to 200).map { i =>
      val x = (i % 23).toDouble
      (x, 4.0 * x + 1.0)
    }.toDF("x", "label")
    val feat = new VectorAssembler().setInputCols(Array("x"))
      .setOutputCol("features").transform(train).cache()
    val cv = Regressors.tunedLinear(regParams = Seq(0.0, 10.0), folds = 2)
    val model = cv.fit(feat)
    val best = model.bestModel
      .asInstanceOf[org.apache.spark.ml.regression.LinearRegressionModel]
    assert(best.getRegParam === 0.0,
      s"CV must pick the unregularized fit, got ${best.getRegParam}")
    assert(Regressors.mse(model.transform(feat)) < 1e-6)
    // avg metrics align with the pick: regParam=0 strictly better
    val metrics = model.avgMetrics
    assert(metrics(0) < metrics(1), metrics.toSeq.toString)
  }

  test("isotonic calibration: exact PAV pooling on a hand case (M14)") {
    import spark.implicits._
    // scores 1..4, labels 0,1,0,1: PAV pools the (2:1, 3:0) violation
    // into 0.5 — fitted values 0, .5, .5, 1 (deterministic, no RNG)
    val df = Seq((1.0, 0.0), (2.0, 1.0), (3.0, 0.0), (4.0, 1.0))
      .toDF("s", "y")
    val m = Calibrate.fitIsotonic(df)
    val cal = Calibrate.apply(m, df).orderBy($"s")
      .select($"s_cal").collect().map(_.getDouble(0)).toSeq
    assert(cal === Seq(0.0, 0.5, 0.5, 1.0))
  }

  test("isotonic calibration closes q217's reliability gap on a miscalibrated score") {
    import spark.implicits._
    // planted overconfidence: raw score 0.9 where the true rate is
    // 0.6, raw 0.1 where the truth is 0.4 — ECE(raw) = 0.3; the
    // isotonic fit maps each score bucket to its empirical rate, so
    // ECE(calibrated) collapses to ~0. Monotonicity must hold.
    // 50 hi-score rows with 30 ones (rate .6); 50 lo with 20 (rate .4)
    val planted = ((0 until 50).map(i => (0.9, if (i < 30) 1.0 else 0.0))
      ++ (0 until 50).map(i => (0.1, if (i < 20) 1.0 else 0.0)))
      .toDF("s", "y")
    val m = Calibrate.fitIsotonic(planted)
    val cal = Calibrate.apply(m, planted)
    val got = cal.groupBy($"s").agg(avg($"s_cal").as("c"))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(math.abs(got(0.9) - 0.6) < 1e-9, s"hi ${got(0.9)}")
    assert(math.abs(got(0.1) - 0.4) < 1e-9, s"lo ${got(0.1)}")
    // and the calibrated ECE through q217's own measurement collapses
    // (raw ECE on this frame is 0.3; the 4dp-rounded gap of the
    // float-dust rates stays at 0.0)
    val ece = graft.queries.EvalQueries.calibration(
      cal.select($"s_cal".as("s"), $"y".cast("int").as("y")))
      .select($"ece").head.getDouble(0)
    assert(ece === 0.0)
  }
}
