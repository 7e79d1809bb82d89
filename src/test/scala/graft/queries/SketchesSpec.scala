package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestBase, Tables}

class SketchesSpec extends AnyFunSuite with SparkTestBase {

  test("q33 attests every group's HLL count within bounds, exact side correct") {
    val rows = SparkEntry.queries("q33_approx_distinct")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getBoolean(3), s"${r.getString(0)} out of bounds"))
    val exact = Tables.load(spark, sfDir, "events")
      .groupBy("event_type").agg(countDistinct("user_id").as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getLong(1) == exact(r.getString(0))))
    // the raw sketch value (not emitted — engine-specific) really is close
    val approx = Tables.load(spark, sfDir, "events")
      .groupBy("event_type").agg(approx_count_distinct("user_id", 0.01).as("a"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, e) =>
      assert(math.abs(approx(k) - e) <= math.max(1, 0.05 * e), s"$k: ${approx(k)} vs $e")
    }
  }

  test("q34 attests the rank sandwich; approximate quantiles track exact ones") {
    val rows = SparkEntry.queries("q34_approx_quantiles")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2) && r.getBoolean(3) && r.getBoolean(4), r.getString(0))
    }
    // the raw sketch values (not emitted — merge-order-dependent) are close
    // to the exact percentiles in value terms too
    val approx = Tables.load(spark, sfDir, "lineitem")
      .groupBy("l_returnflag")
      .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
        .cast("double").as("a"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = Tables.load(spark, sfDir, "lineitem")
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.5)").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    exact.foreach { case (k, m) =>
      assert(math.abs(approx(k) - m) / m < 0.05, s"$k: ${approx(k)} vs $m")
    }
  }

  test("q77 per-day sketch union is lossless vs a direct sketch of the raw data") {
    val rows = SparkEntry.queries("q77_sketch_merge")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getBoolean(3), s"${r.getString(0)} out of bounds"))
    // the whole point of materialized sketches: merging the per-day
    // sketches gives EXACTLY the estimate a single pass over raw data
    // would (HLL union at the same lgK is lossless), so rollups never
    // need the raw events again
    val ev = Tables.load(spark, sfDir, "events")
    val viaMerge = ev
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = ev.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12))).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaMerge == direct, s"merge $viaMerge vs direct $direct")
  }

  test("q146: CMS never underestimates and overestimates stay bounded") {
    val rows = graft.SparkEntry.queries("q146_cms_heavy_hitters")(spark, sfDir)
      .collect()
    assert(rows.length == 20)
    // the structural CMS guarantee: estimate >= exact, always
    rows.foreach { r =>
      val (exact, cms, over) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(cms >= exact, s"underestimate on ${r.getString(0)}")
      assert(over == cms - exact)
    }
    // practical bound: the min over 4 rows keeps the collision mass far
    // below the single-row expectation (2N/w); on heavy hitters the
    // relative error must be small or the sketch is useless
    val worstRel = rows.map(r => r.getLong(3).toDouble / r.getLong(1)).max
    assert(worstRel <= 1.0, s"relative overestimate $worstRel")
  }

  test("q157: KMV estimates land inside sketch-theory error bounds") {
    // KMV with k=64 has relative standard error ~ 1/sqrt(k-1) = 12.6%
    // on distinct counts; everything is deterministic, so these pins
    // guard the estimator arithmetic (hash domain size M, the (k-1)/h_k
    // form, the union-sketch jaccard), not luck
    val got = graft.SparkEntry.queries("q157_kmv_overlap")(spark, sfDir).cache()
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val hs = docs.select(col("source"), explode(array_distinct(
        graft.functions.ArrayExprs.windowHashes(split(col("text"), " "), 3))).as("h"))
      .distinct()
    val exact = hs.groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val errs = got.collect().flatMap { r =>
      Seq(math.abs(r.getDouble(2) - exact(r.getString(0))) / exact(r.getString(0)),
        math.abs(r.getDouble(3) - exact(r.getString(1))) / exact(r.getString(1)))
    }
    assert(errs.sum / errs.length < 0.25, s"mean rel err ${errs.sum / errs.length}")
    assert(errs.max < 0.8, s"max rel err ${errs.max}")
    // jaccard estimates live in [0,1]; intersection <= min marginal est
    got.collect().foreach { r =>
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
      assert(r.getDouble(6) <= math.min(r.getDouble(2), r.getDouble(3)) * 1.5)
    }
  }

  test("q268: Bloom filter has zero false negatives and a modeled FPR") {
    val r = SparkEntry.queries("q268_bloom_fpr")(spark, sfDir).collect().head
    def l(c: String) = r.getLong(r.fieldIndex(c))
    def d(c: String) = r.getDouble(r.fieldIndex(c))
    // structural: a Bloom filter CANNOT miss a member — the query
    // measures it end-to-end through the distributed bit-table join
    assert(l("n_false_neg") == 0L)
    // probe partition is exhaustive
    assert(l("n_probe_members") + l("n_nonmembers") == l("n_probes"))
    // the filter is in its designed load regime, and the bit table
    // never exceeds the address space
    assert(l("n_bits_set") <= l("m_bits") && d("load_factor") < 0.5)
    assert(l("n_bits_set") <= 3L * l("n_members"))
    // measured FPR tracks the independence model: within 3x plus a
    // +-5-count Poisson slack (the XOR-salt law — the additive-salt
    // form measured 12x the model before the fix)
    val slack = 5.0 / l("n_nonmembers")
    assert(d("fpr_measured") <= 3.0 * d("fpr_independence") + slack,
      s"measured ${d("fpr_measured")} vs model ${d("fpr_independence")}")
  }

  test("q293: the CMS inner product one-sidedly overestimates the join size") {
    val rows = SparkEntry.queries("q293_cms_join_size")(spark, sfDir).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      // CMS counters only ever ADD colliding mass — the estimate can
      // never undershoot (the property that makes it a safe planner
      // bound), and the w=4096 slack stays under ||a||1*||b||1/w * 3
      assert(r.getAs[Long]("overestimate") >= 0L)
      assert(r.getAs[Long]("exact_pairs") > 0L)
      assert(r.getAs[Long]("cms_pairs") >= r.getAs[Long]("exact_pairs"))
    }
  }

  test("q296: exact regime is bit-exact; estimation regime is attested") {
    val rows = SparkEntry.queries("q296_superspreaders")(spark, sfDir)
      .collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_parts")
      val est = r.getAs[Double]("kmv_est")
      if (exact < 64L)
        // below k the sketch IS the distinct hash set — est is exact
        // (up to 31-bit hash collisions, absent at this scale)
        assert(est == exact.toDouble, s"cust ${r.getAs[Long]("custkey")}")
      assert(r.getAs[Boolean]("within_bounds"),
        s"cust ${r.getAs[Long]("custkey")}: est $est vs exact $exact")
    }
  }

  test("q301: per-slice CMS estimates are one-sided over both halves") {
    val rows = SparkEntry.queries("q301_heavy_changers")(spark, sfDir)
      .collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      // each half's sketch can only overestimate its own count — the
      // attestation that makes the sketch DIFF interpretable as a
      // bounded-error change signal
      assert(r.getAs[Long]("overest_a") >= 0L)
      assert(r.getAs[Long]("overest_b") >= 0L)
      assert(r.getAs[Long]("exact_change") ==
        r.getAs[Long]("exact_a") - r.getAs[Long]("exact_b"))
    }
  }

  test("q303: the Bloom join filter never drops a matching row") {
    val r = SparkEntry.queries("q303_bloomjoin_benefit")(spark, sfDir)
      .collect().head
    def l(c: String) = r.getLong(r.fieldIndex(c))
    // zero false negatives: every matching row passes the filter
    assert(l("match_rows") <= l("bloom_pass_rows"))
    // the pass set decomposes exactly into matches + measured FPs
    assert(l("fp_rows") == l("bloom_pass_rows") - l("match_rows"))
    assert(l("bloom_pass_rows") <= l("probe_rows"))
    assert(l("n_bits_set") <= 3L * l("n_build_keys"))
    val frac = r.getAs[Double]("shipped_frac")
    assert(frac > 0.0 && frac <= 1.0)
  }

  test("q304: merged window sketches track exact distincts in both regimes") {
    val rows = SparkEntry.queries("q304_sliding_distinct")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_users")
      val est = r.getAs[Double]("kmv_est")
      if (exact < 64L)
        // exact regime: the merged sketch IS the window's distinct
        // hash set (collisions shift it by at most the collision count)
        assert(math.abs(est - exact.toDouble) <= 1.0,
          s"window ${r.getAs[Long]("window_end_hr")}")
      assert(r.getAs[Boolean]("within_bounds"),
        s"window ${r.getAs[Long]("window_end_hr")}: $est vs $exact")
    }
  }
}
