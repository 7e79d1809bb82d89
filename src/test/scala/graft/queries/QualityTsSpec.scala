package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestBase, Tables}

/** Planted-fixture and structural laws for the data-quality family
  * (q194–q197, q205–q206) and the time-series / graph additions
  * (q198–q203, q207): known orphans/dup-keys/FD-violations must be
  * counted exactly, analytically-solvable series must hit their
  * closed-form values, and a planted far-away embedding must take the
  * corpus-maximum LOF.
  */
class QualityTsSpec extends AnyFunSuite with SparkTestBase {

  /** Midnight-UTC timestamp for an integer epoch-day column. */
  private def usTs(day: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    timestamp_micros(day * 86400000000L)

  test("fkEdge counts planted orphans and ignores null FKs") {
    import spark.implicits._
    val child = Seq(Some(1L), Some(2L), Some(99L), None).toDF("ck")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = Quality.fkEdge("t", child, "ck", parent, "pk").collect().head
    assert(r.getAs[Long]("n_checked") == 3L) // null FK is not checked
    assert(r.getAs[Long]("n_orphans") == 1L) // only 99
    assert(r.getAs[Double]("orphan_frac") == 1.0 / 3.0)
  }

  test("fkEdge is duplicate-parent-safe: dirty parent keys don't multiply children") {
    import spark.implicits._
    val child = Seq(1L, 1L, 2L).toDF("ck")
    val parent = Seq(1L, 1L, 1L).toDF("pk") // dirty "primary" key
    val r = Quality.fkEdge("t", child, "ck", parent, "pk").collect().head
    assert(r.getAs[Long]("n_checked") == 3L)
    assert(r.getAs[Long]("n_orphans") == 1L)
  }

  test("keyRule and fdRule report planted violations exactly") {
    import spark.implicits._
    val df = Seq((1L, "a"), (1L, "b"), (2L, "c"), (3L, "c"), (3L, "c"))
      .toDF("k", "v")
    val key = Quality.keyRule("key", df, Seq("k")).collect().head
    assert(key.getAs[Long]("n_groups") == 3L)
    assert(key.getAs[Long]("n_violating") == 2L) // k=1 (2 rows), k=3 (2 rows)
    assert(key.getAs[Long]("worst") == 2L)
    val fd = Quality.fdRule("fd", df, "k", "v").collect().head
    assert(fd.getAs[Long]("n_groups") == 3L)
    assert(fd.getAs[Long]("n_violating") == 1L) // only k=1 maps to {a,b}
    assert(fd.getAs[Long]("worst") == 2L)
  }

  test("q197: Benford fractions sum to 1 and chi2 terms are non-negative") {
    val out = SparkEntry.queries("q197_benford")(spark, sfDir).collect()
    assert(out.nonEmpty)
    val fracSum = out.map(_.getAs[Double]("frac")).sum
    assert(math.abs(fracSum - 1.0) < 1e-12)
    out.foreach { r =>
      assert(r.getAs[Double]("chi2_part") >= 0.0)
      val d = r.getAs[Int]("digit")
      assert(d >= 1 && d <= 9)
      val p = Quality.benfordP.toMap.apply(d).toDouble
      assert(r.getAs[Double]("expected_frac") == p)
    }
  }

  test("acfDaily: an exactly-linear daily series correlates to 1 at every lag") {
    import spark.implicits._
    // day i carries i+1 events -> x_t = t+1, and any lagged pair set of a
    // linear series is itself exactly linear -> Pearson r = 1 (up to the
    // two sqrt roundings).
    val rows = for { day <- 0 until 20; k <- 0 to day } yield (day.toLong, k.toLong)
    val ev = rows.toDF("day", "k")
      .select(usTs(col("day")).as("ts"), lit("a").as("event_type"))
    val out = Events.acfDaily(ev).collect()
    assert(out.length == 7)
    out.foreach { r =>
      assert(r.getAs[Long]("n_pairs") == 20L - r.getAs[Int]("lag_k"))
      assert(math.abs(r.getAs[Double]("acf") - 1.0) < 1e-12)
    }
  }

  test("ewmaDaily: a constant series smooths to c*(1 - 2^-16) exactly") {
    import spark.implicits._
    val rows = for { day <- 0 until 20; k <- 0 until 5 } yield (day.toLong, k.toLong)
    val ev = rows.toDF("day", "k")
      .select(usTs(col("day")).as("ts"), lit("a").as("event_type"))
    val out = Events.ewmaDaily(ev).collect()
    assert(out.length == 5) // days 16..20 have full history
    val want = 5.0 * (1.0 - 1.0 / 65536.0)
    out.foreach(r => assert(r.getAs[Double]("ewma") == want))
  }

  test("seasonalAnomalyDaily flags only the planted weekday spike") {
    import spark.implicits._
    // 42 days of 10 events; day 35 spikes to 150 -> its weekday profile is
    // [10,10,10,10,10,150]: z = 700/sqrt(98000) = 2.24 > 2. Every other
    // weekday profile is constant (variance 0) -> never flagged.
    val rows = for {
      day <- 0 until 42
      k <- 0 until (if (day == 35) 150 else 10)
    } yield (day.toLong, k.toLong)
    val ev = rows.toDF("day", "k")
      .select(usTs(col("day")).as("ts"), lit("a").as("event_type"))
    val out = Events.seasonalAnomalyDaily(ev).collect()
    assert(out.length == 42)
    val flagged = out.filter(_.getAs[Boolean]("is_anomaly"))
    assert(flagged.map(_.getAs[Long]("d_idx")).toSeq == Seq(35L))
    assert(flagged.head.getAs[Double]("z") > 2.0)
    // constant-weekday rows carry NULL z, never a spurious flag
    assert(out.count(r => r.isNullAt(r.fieldIndex("z"))) == 36)
  }

  test("eventBigrams counts planted transitions with per-user ordering") {
    import spark.implicits._
    val ev = Seq(
      (1L, 1L, 0L, "a"), (2L, 1L, 1L, "b"), (3L, 1L, 2L, "a"), (4L, 1L, 3L, "b"),
      (5L, 2L, 0L, "a"), (6L, 2L, 1L, "b"))
      .toDF("event_id", "user_id", "off", "event_type")
      .select(col("event_id"), col("user_id"),
        timestamp_micros(col("off") * 1000000L).as("ts"), col("event_type"))
    val out = Events.eventBigrams(ev).collect()
      .map(r => (r.getAs[String]("prev_type"), r.getAs[String]("next_type")) ->
        (r.getAs[Long]("n_occ"), r.getAs[Long]("n_users"),
          r.getAs[Double]("support"))).toMap
    assert(out(("a", "b")) == ((3L, 2L, 0.75)))
    assert(out(("b", "a")) == ((1L, 1L, 0.25)))
    assert(out.size == 2)
  }

  test("lofOverGraph: a planted far-away vector takes the corpus-maximum LOF") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    // 2.5 per dim: far outside the corpus (coords are within ±0.5) while
    // the int64 headroom contract still holds — worst edge d² ≈ 5.7e16,
    // so deg·Σreach² ≤ 12·12·5.7e16 ≈ 8.2e18 < 2⁶³
    val planted = emb.limit(1)
      .select(lit(999999L).as("vec_id"),
        expr("transform(embedding, x -> CAST(2.5 AS FLOAT))").as("embedding"),
        col("label"))
    val out = Similarity.lofOverGraph(emb.unionByName(planted)).collect()
    val top = out.maxBy(_.getAs[Double]("lof"))
    assert(top.getAs[Long]("node") == 999999L)
    assert(top.getAs[Double]("lof") > 2.0)
    out.foreach(r => assert(r.getAs[Double]("lof") > 0.0))
  }

  test("linkPredictRA proposes only non-edges at distance 2, with positive scores") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val pred = Similarity.linkPredictRA(emb).cache()
    assert(pred.filter(col("u") >= col("v")).count() == 0)
    assert(pred.filter(col("n_common") < 1 || col("score_fp") <= 0).count() == 0)
    // no predicted pair may already be a graph edge (in either direction)
    val g = Similarity.knnGraph(emb)
    val und = g.select(col("node").as("u"), col("nbr").as("v"))
      .union(g.select(col("nbr").as("u"), col("node").as("v")))
      .distinct()
    assert(pred.join(und, Seq("u", "v"), "left_semi").count() == 0)
  }

  test("q205: every stratum's folds are balanced to within one document") {
    val out = SparkEntry.queries("q205_stratified_kfold")(spark, sfDir)
    val skew = out.groupBy("lang", "source")
      .agg((max("n") - min("n")).as("skew"))
      .filter(col("skew") > 1)
    assert(skew.count() == 0)
    // fold shares partition each stratum exactly
    val bad = out.groupBy("lang", "source")
      .agg(sum("n").as("s"), first("stratum_n").as("t"))
      .filter(col("s") =!= col("t"))
    assert(bad.count() == 0)
  }

  test("q206: Cramer's V lies in [0,1]; chi2 non-negative") {
    val r = SparkEntry.queries("q206_cramers_v")(spark, sfDir).collect().head
    assert(r.getAs[Double]("chi2") >= 0.0)
    val v = r.getAs[Double]("cramers_v")
    assert(v >= 0.0 && v <= 1.0)
  }

  test("q207: dispersion moments are internally consistent") {
    val nDocs = Tables.load(spark, sfDir, "documents").count()
    val out = SparkEntry.queries("q207_token_dispersion")(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("df") <= nDocs)
      assert(r.getAs[Long]("total") >= r.getAs[Long]("df"))
      assert(r.getAs[Double]("vmr") > 0.0)
    }
  }

  test("q208: peeling never raises a degree and only returns graph nodes") {
    val out = SparkEntry.queries("q208_kcore")(spark, sfDir).cache()
    assert(out.filter(col("deg_final") > col("deg_initial")).count() == 0)
    assert(out.filter(col("deg_final") < 1).count() == 0)
  }

  test("q209: Gini lies in [0,1) and covers every ordering customer") {
    val out = SparkEntry.queries("q209_gini")(spark, sfDir).cache()
    assert(out.filter(col("gini") < 0.0 || col("gini") >= 1.0).count() == 0)
    val nOrdering = Tables.load(spark, sfDir, "orders")
      .select("o_custkey").distinct().count()
    assert(out.agg(sum("n_customers")).collect().head.getLong(0) == nOrdering)
  }

  test("q210: MASE is exactly the ratio of the two MAEs") {
    val out = SparkEntry.queries("q210_forecast_baseline")(spark, sfDir).collect()
    out.filter(r => !r.isNullAt(r.fieldIndex("mase"))).foreach { r =>
      val want = r.getAs[Double]("mae_seasonal") / r.getAs[Double]("mae_naive")
      assert(math.abs(r.getAs[Double]("mase") - want) < 1e-12)
    }
  }

  test("q211: the violation flag is exactly l_div < 3") {
    val out = SparkEntry.queries("q211_ldiversity")(spark, sfDir).cache()
    assert(out.filter(col("violates_l3") =!= (col("l_div") < 3)).count() == 0)
    assert(out.filter(col("l_div") > col("n_events")).count() == 0)
  }

  test("q212: growing the layout moves keys ONLY into the new shard") {
    val out = SparkEntry.queries("q212_rendezvous_shards")(spark, sfDir).cache()
    // the rendezvous minimal-movement property: a key changes shard iff
    // the NEW shard wins its argmax — no old-to-old reshuffling ever
    assert(out.filter(col("moved") && col("shard_after") =!= 10).count() == 0)
    val fracSum = out.agg(sum("frac")).collect().head.getDouble(0)
    assert(math.abs(fracSum - 1.0) < 1e-9)
  }

  test("q213: the OLS fit explains no more than all the variance") {
    val r = SparkEntry.queries("q213_multivar_ols")(spark, sfDir).collect().head
    assert(r.getAs[Double]("r2") <= 1.0 + 1e-12)
    Seq("b_intercept", "b_clicks", "b_trend").foreach { c =>
      assert(!r.getAs[Double](c).isNaN && !r.getAs[Double](c).isInfinite)
    }
  }

  test("q214: S is bounded by the pair count and the trend label matches z") {
    val out = SparkEntry.queries("q214_mann_kendall")(spark, sfDir).collect()
    out.foreach { r =>
      val n = r.getAs[Long]("n_days")
      assert(math.abs(r.getAs[Long]("s_stat")) <= n * (n - 1) / 2)
      val z = r.getAs[Double]("z")
      val want = if (z > 1.96) "increasing"
        else if (z < -1.96) "decreasing" else "none"
      assert(r.getAs[String]("trend") == want)
    }
  }

  test("q215: the decomposition reconstructs the series") {
    val out = SparkEntry.queries("q215_seasonal_decompose")(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val x = r.getAs[Long]("x").toDouble
      val rebuilt = r.getAs[Double]("trend") + r.getAs[Double]("seasonal") +
        r.getAs[Double]("remainder")
      assert(math.abs(rebuilt - x) < 1e-9)
    }
  }

  test("q216: every defined cross-correlation is a valid Pearson r over all 15 lags") {
    val real = SparkEntry.queries("q216_ccf")(spark, sfDir).collect()
    real.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("ccf")))
        assert(math.abs(r.getAs[Double]("ccf")) <= 1.0 + 1e-12)
    }
    assert(real.map(_.getAs[Int]("lag_days")).toSeq.sorted == (-7 to 7).toSeq)
  }

  test("q217: Hampel flags the planted spike and nothing else") {
    import spark.implicits._
    // constant 10/day except day 10 spikes to 100: med=10, MAD=0 in every
    // full window away from the spike; windows containing the spike keep
    // med=10, MAD=0 -> only day 10 itself violates |x-med| > 3*MAD
    val rows = for {
      day <- 0 until 21
      k <- 0 until (if (day == 10) 100 else 10)
    } yield (day.toLong, k.toLong)
    val ev = rows.toDF("day", "k")
      .select(usTs(col("day")).as("ts"), lit("a").as("event_type"))
    // drive the registered query's exact shape via its library base
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("d_idx").rowsBetween(-3, 3)
    val got = Events.dailyCounts(ev)
      .withColumn("win", collect_list(col("x")).over(w))
      .filter(size(col("win")) === 7)
      .withColumn("med7", element_at(array_sort(col("win")), 4))
      .withColumn("mad7", element_at(array_sort(
        transform(col("win"), v => abs(v - col("med7")))), 4))
      .withColumn("is_outlier",
        abs(col("x") - col("med7")) > lit(3L) * col("mad7"))
      .collect()
    val flagged = got.filter(_.getAs[Boolean]("is_outlier"))
      .map(_.getAs[Long]("d_idx")).toSeq
    assert(flagged == Seq(10L))
  }

  test("q218: concurrency peaks are consistent and positive") {
    val out = SparkEntry.queries("q218_session_concurrency")(spark, sfDir)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("peak") >= 1L)
      // the peak instant lies inside its day
      val day = r.getAs[Long]("day_idx")
      val us = r.getAs[Long]("first_peak_us")
      assert(us / 86400000000L == day)
    }
  }

  test("q227: minhash estimates are valid fractions tracking exact Jaccard") {
    val out = SparkEntry.queries("q227_minhash_error")(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val e = r.getAs[Double]("mh_est")
      assert(e >= 0.0 && e <= 1.0)
      assert(r.getAs[Double]("abs_err") ==
        math.abs(e - r.getAs[Double]("jaccard")))
    }
    // k=32 slots: the mean error over verified (jaccard >= 0.8) pairs
    // stays well inside the sqrt(j(1-j)/k) ~ 7% envelope
    val meanErr = out.map(_.getAs[Double]("abs_err")).sum / out.length
    assert(meanErr < 0.1, s"mean |est - jaccard| = $meanErr")
  }

  test("q248: 1-bit minhash estimates stay in range and inside the widened envelope") {
    val out = SparkEntry.queries("q248_bbit_minhash")(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val bd = r.getAs[Int]("bits_diff")
      assert(bd >= 0 && bd <= 32)
      val e = r.getAs[Double]("bbit_est")
      assert(e >= 0.0 && e <= 1.0)
    }
    // 1-bit variance is ~4x the full estimator's: std ~ sqrt(4p(1-p)/32)
    // ~ 0.08 at J = 0.9 — the mean error over verified pairs must stay
    // inside a 2.5-sigma-ish envelope (vs q227's 0.1 for full hashes)
    val meanErr = out.map(_.getAs[Double]("abs_err")).sum / out.length
    assert(meanErr < 0.2, s"mean |bbit_est - jaccard| = $meanErr")
  }

  test("q219: daily percentiles are ordered and drawn from the day's values") {
    val out = SparkEntry.queries("q219_daily_percentiles")(spark, sfDir).cache()
    assert(out.filter(col("p50_cents") > col("p90_cents")).count() == 0)
    assert(out.filter(col("p50_cents").isNull || col("p90_cents").isNull)
      .count() == 0)
  }

  test("q230: a key whose last change is a tombstone leaves the snapshot") {
    import spark.implicits._
    val ev = Seq(
      (1L, 1L, 0L, "click", 10.0), (2L, 1L, 1L, "error", 0.0), // deleted
      (3L, 2L, 0L, "click", 5.0), (4L, 2L, 1L, "purchase", 7.0), // upserted
      (5L, 3L, 0L, "error", 0.0), (6L, 3L, 1L, "view", 3.0)) // resurrected
      .toDF("event_id", "user_id", "off", "event_type", "value")
      .select(col("event_id"), col("user_id"),
        timestamp_micros(col("off") * 1000000L).as("ts"),
        col("event_type"), col("value"))
    // drive the registered query's exact shape on the fixture
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("us").desc, col("event_id").desc)
    val got = ev.select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"),
        (col("value").cast(org.apache.spark.sql.types.DecimalType(12, 2)) * 100)
          .cast("long").as("cents"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("event_type") =!= "error")
      .select("user_id", "event_type", "cents").collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[String]("event_type"), r.getAs[Long]("cents"))).toMap
    assert(!got.contains(1L)) // tombstone wins
    assert(got(2L) == (("purchase", 700L)))
    assert(got(3L) == (("view", 300L))) // later upsert resurrects
  }

  test("q231/q232: the calendar spine is gapless and the rollup matches a direct aggregation") {
    val cal = SparkEntry.queries("q231_calendar_dim")(spark, sfDir).cache()
    val n = cal.count()
    val b = cal.agg(min("d_idx"), max("d_idx")).collect().head
    assert(n == b.getLong(1) - b.getLong(0) + 1) // dense spine, no gaps
    assert(cal.filter(col("dow_mon0") < 0 || col("dow_mon0") > 6).count() == 0)
    // independent derivation: group orders by the engine's own month
    // functions, no dimension join — totals must agree exactly
    val direct = Tables.load(spark, sfDir, "orders")
      .groupBy(year(col("o_orderdate")).as("y"),
        quarter(col("o_orderdate")).as("q"),
        month(col("o_orderdate")).as("m"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice")
          .cast(org.apache.spark.sql.types.DecimalType(12, 2)))
          .cast("double").as("revenue"))
    val viaDim = SparkEntry.queries("q232_month_rollup")(spark, sfDir)
      .select("y", "q", "m", "n_orders", "revenue")
    assertSameRows(viaDim, direct.select("y", "q", "m", "n_orders", "revenue"))
  }

  test("q204: complex words imply at least three syllables each") {
    val out = SparkEntry.queries("q204_lexical_complexity")(spark, sfDir)
    assert(out.filter(col("n_syllables") < col("n_complex") * 3).count() == 0)
    assert(out.filter(col("syl_per_word") <= 0.0).count() == 0)
  }
}
