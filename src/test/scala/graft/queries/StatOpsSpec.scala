package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestBase, Tables}

/** Structural laws for the robust-stats / ER / sampling additions
  * (q173–q178): prefix-filter completeness against brute force,
  * sorted-neighborhood recounted via an independent rank join, the
  * priority-sampling estimator contract, quantile-map minimality, and
  * planted fixtures for Theil–Sen robustness and the diversity indices.
  */
class StatOpsSpec extends AnyFunSuite with SparkTestBase {

  test("q173: containment prefix filter equals the unfiltered brute force") {
    val docs = Tables.load(spark, sfDir, "documents")
    val hu = docs.select(col("doc_id"), explode(array_distinct(
      graft.functions.ArrayExprs.windowHashes(split(col("text"), " "), 3))).as("h"))
    val cnt = hu.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val brute = hu.as("a")
      .join(hu.as("b"), col("a.h") === col("b.h") &&
        col("a.doc_id") =!= col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_sub"), col("b.doc_id").as("doc_sup"))
      .agg(count(lit(1)).as("shared"))
      .join(cnt.select(col("doc_id").as("doc_sub"), col("n").as("n_sub")), "doc_sub")
      .join(cnt.select(col("doc_id").as("doc_sup"), col("n").as("n_sup")), "doc_sup")
      .withColumn("containment", col("shared").cast("double") / col("n_sub"))
      .filter(col("containment") >= 0.9)
      .withColumn("jaccard", col("shared").cast("double") /
        (col("n_sub") + col("n_sup") - col("shared")))
      .select("doc_sub", "doc_sup", "shared", "n_sub", "n_sup",
        "containment", "jaccard")
    assertSameRows(Dedup.containmentJoin(docs, 0.9), brute)
  }

  test("q173: a quoted document is contained but invisible to Jaccard") {
    import spark.implicits._
    val short = (0 until 20).map(i => s"a$i").mkString(" ")
    val long = short + " " + (0 until 40).map(i => s"b$i").mkString(" ")
    val other = (0 until 30).map(i => s"c$i").mkString(" ")
    val docs = Seq((1L, short), (2L, long), (3L, other)).toDF("doc_id", "text")
    val out = Dedup.containmentJoin(docs, 0.9).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("doc_sub") == 1L && r.getAs[Long]("doc_sup") == 2L)
    assert(r.getAs[Double]("containment") == 1.0)
    // the same pair is BELOW every Jaccard threshold the near-dup family
    // uses — this is the directional signal's reason to exist
    assert(r.getAs[Double]("jaccard") < 0.6)
  }

  test("q174: neighborhood pairs match an independent within-block rank join") {
    val out = SparkEntry.queries("q174_sorted_neighborhood")(spark, sfDir).cache()
    // independent derivation: dense rank positions per block via a join,
    // pair rows whose positions differ by 1..4, then the same verify
    import org.apache.spark.sql.expressions.Window
    val p = Tables.load(spark, sfDir, "part")
      .select(col("p_partkey"), col("p_name"),
        element_at(split(col("p_name"), " "), 1).as("blk"))
      .withColumn("pos", row_number().over(
        Window.partitionBy("blk").orderBy("p_name", "p_partkey")))
    val a = p.select(col("blk"), col("pos").as("pos_a"),
      col("p_partkey").as("id_a"), col("p_name").as("name_a"))
    val b = p.select(col("blk"), col("pos").as("pos_b"),
      col("p_partkey").as("id_b"), col("p_name").as("name_b"))
    val brute = a.join(b, Seq("blk"))
      .filter(col("pos_b") > col("pos_a") &&
        col("pos_b") - col("pos_a") <= 4)
      .select(least(col("id_a"), col("id_b")).as("part_a"),
        greatest(col("id_a"), col("id_b")).as("part_b"),
        col("name_a"), col("name_b"),
        (col("pos_b") - col("pos_a")).cast("int").as("gap"),
        levenshtein(col("name_a"), col("name_b")).as("dist"))
      .filter(col("dist") <= 4)
    assertSameRows(out, brute)
    // every row respects the window contract
    assert(out.filter(!col("gap").between(1, 4)).count() == 0)
    assert(out.filter(col("part_a") >= col("part_b")).count() == 0)
  }

  test("q175: sample is the true top-k by priority and the estimator is sane") {
    import spark.implicits._
    // heavy-tailed weights: doc i has weight (i % 97)^2 + 1
    val docs = (1L to 400L).map(i => (i, (i % 97) * (i % 97) + 1L))
      .toDF("doc_id", "n_chars")
    val out = Sampling.prioritySample(docs, 100).cache()
    assert(out.count() == 100)
    // independent top-k: recompute priorities brute force
    val m = 2147483647L
    val brute = docs.select(col("doc_id"),
        (col("n_chars").cast("double") /
          ((expr(s"((doc_id % $m) * 48271 % $m) * 48271 % $m") + 1)
            .cast("double") / lit(m.toDouble))).as("pri"))
      .orderBy(col("pri").desc, col("doc_id")).limit(100)
      .select("doc_id")
    assertSameRows(out.select("doc_id"), brute)
    // every kept priority clears τ, and est = max(w, τ) >= w
    assert(out.filter(col("pri") < col("tau")).count() == 0)
    assert(out.filter(col("est_weight") < col("n_chars").cast("double"))
      .count() == 0)
    // the Duffield–Lund–Thorup estimator: Σ est over the sample is an
    // unbiased estimate of Σ w — on one draw of 100 from 400 it should
    // land well within ±30%
    val total = docs.agg(sum("n_chars")).head().getLong(0).toDouble
    val est = out.agg(sum("est_weight")).head().getDouble(0)
    assert(math.abs(est - total) / total < 0.3, s"est $est vs total $total")
  }

  test("q176: quantile map is monotone and minimal") {
    val out = SparkEntry.queries("q176_quantile_normalize")(spark, sfDir).cache()
    // monotone: within a source, norm_value never decreases with n_chars
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source").orderBy("n_chars")
    assert(out.withColumn("prev", lag("norm_value", 1).over(w))
      .filter(col("prev").isNotNull && col("norm_value") < col("prev"))
      .count() == 0)
    // minimality law, recomputed from the raw table: F_global(norm) >=
    // F_src(v), and no smaller global value qualifies
    val docs = Tables.load(spark, sfDir, "documents")
      .select("source", "n_chars")
    val n = docs.count()
    val gcum = docs.groupBy("n_chars").count().collect()
      .sortBy(_.getAs[Long]("n_chars"))
      .scanLeft((Long.MinValue, 0L)) { case ((_, acc), r) =>
        (r.getAs[Long]("n_chars"), acc + r.getAs[Long]("count")) }.drop(1)
    val nsBySrc = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getAs[Long]("count")).toMap
    val scLookup = docs.groupBy("source", "n_chars").count().collect()
      .groupBy(_.getString(0)).map { case (src, rows) =>
        src -> rows.sortBy(_.getAs[Long]("n_chars"))
          .scanLeft((Long.MinValue, 0L)) { case ((_, acc), r) =>
            (r.getAs[Long]("n_chars"), acc + r.getAs[Long]("count")) }.drop(1).toMap
      }
    out.collect().foreach { r =>
      val (src, v, norm) = (r.getString(0), r.getAs[Long]("n_chars"),
        r.getAs[Long]("norm_value"))
      val sc = scLookup(src)(v)
      val ns = nsBySrc(src)
      val gcAt = gcum.filter(_._1 <= norm).map(_._2).maxOption.getOrElse(0L)
      assert(gcAt * ns >= sc * n, s"$src/$v: norm $norm does not cover")
      val prev = gcum.filter(_._1 < norm).map(_._2).maxOption.getOrElse(0L)
      assert(prev * ns < sc * n, s"$src/$v: norm $norm is not minimal")
    }
  }

  test("q177: Theil–Sen shrugs off an outlier day that wrecks OLS") {
    import spark.implicits._
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z")
    val rows = (0 until 30).map { i =>
      val v = if (i == 15) 10000.0 else 2.0 * i + 3.0
      (java.sql.Timestamp.from(base.plusSeconds(i * 86400L)), "linear", v)
    }
    val ev = rows.toDF("ts", "event_type", "value")
    // 29 of 435 pairwise slopes touch the outlier; the median is still the
    // EXACT planted slope on the 1e-2 grid
    val ts = Events.theilSen(ev).head()
    assert(ts.getAs[Double]("median_slope") == 200.0,
      s"median ${ts.getAs[Double]("median_slope")}")
    assert(ts.getAs[Long]("n_days") == 30 && ts.getAs[Long]("n_pairs") == 435)
    // while least squares is dragged far off
    val ols = Events.trendFit(ev).head().getAs[Double]("slope")
    assert(math.abs(ols - 200.0) > 50.0, s"OLS unexpectedly robust: $ols")
  }

  test("q179: window unrolling equals the textbook CUSUM recursion, and a planted shift flags") {
    import spark.implicits._
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z")
    // level 1.0 for 15 days, then a +1.0 shift
    val rows = (0 until 30).map { i =>
      val v = if (i < 15) 1.0 else 2.0
      (java.sql.Timestamp.from(base.plusSeconds(i * 86400L)), "m", v)
    }
    val out = Events.cusum(rows.toDF("ts", "event_type", "value"))
      .orderBy("day").collect()
    // replay the recursion directly: S_t = max(0, S_{t-1} + d_t)
    var (sp, sn) = (0L, 0L)
    out.foreach { r =>
      val (m, mu0) = (r.getAs[Long]("m"), r.getAs[Long]("mu0"))
      sp = math.max(0L, sp + (m - mu0 - 5000L))
      sn = math.max(0L, sn + (mu0 - m - 5000L))
      assert(r.getAs[Long]("cusum_pos") == sp && r.getAs[Long]("cusum_neg") == sn,
        s"day ${r.getAs[Long]("day")}: unrolled (${r.getAs[Long]("cusum_pos")}, " +
          s"${r.getAs[Long]("cusum_neg")}) vs recursion ($sp, $sn)")
    }
    // nothing flags before the shift; the shift flags within 2 days
    val flaggedDays = out.filter(_.getAs[Boolean]("shift_flag"))
      .map(_.getAs[Long]("day") - out.head.getAs[Long]("day"))
    assert(flaggedDays.forall(_ >= 15), s"pre-shift flag at $flaggedDays")
    assert(flaggedDays.nonEmpty && flaggedDays.min <= 16,
      s"shift not detected promptly: $flaggedDays")
  }

  test("q180: sampled estimates attest against exact counts honestly") {
    val out = SparkEntry.queries("q180_sampled_groupby_ci")(spark, sfDir).cache()
    // exact side recounted independently
    val exact = Tables.load(spark, sfDir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus").count()
    assertSameRows(out.select("l_returnflag", "l_linestatus", "exact_rows"),
      exact)
    // estimator identities: est = 10 * n_sample; covered consistent
    assert(out.filter(col("est_rows") =!=
      col("n_sample").cast("double") * 10.0).count() == 0)
    assert(out.filter(col("covered") =!=
      (abs(col("est_rows") - col("exact_rows").cast("double")) <=
        lit(2.0) * col("se"))).count() == 0)
    // ±2σ covers ~95% per group, so with 6 groups one (deterministic)
    // miss is within expectation — but most groups must cover
    assert(out.filter(!col("covered")).count() <= 1)
  }

  test("q181: histogram estimates reconstruct totals and true counts recount") {
    val out = SparkEntry.queries("q181_histogram_selectivity")(spark, sfDir)
      .cache()
    val li = Tables.load(spark, sfDir, "lineitem")
    // true counts recomputed directly
    out.collect().foreach { r =>
      val n = li.filter(col("l_extendedprice") >= r.getAs[Double]("lo") &&
        col("l_extendedprice") < r.getAs[Double]("hi")).count()
      assert(n == r.getAs[Long]("true_rows"),
        s"range ${r.getInt(0)}: recount $n vs ${r.getAs[Long]("true_rows")}")
    }
    // the two wide ranges partitioning most of the domain should estimate
    // within 25% each on near-uniform prices
    out.filter(col("range_id").isin(1, 2, 4)).collect().foreach { r =>
      assert(math.abs(r.getAs[Double]("rel_err")) < 0.25,
        s"range ${r.getInt(0)} rel_err ${r.getAs[Double]("rel_err")}")
    }
  }

  test("q184: MMR picks replay the greedy recursion exactly") {
    val out = SparkEntry.queries("q184_mmr_rerank")(spark, sfDir).cache()
    // shape: 5 distinct picks per anchor, pick_order 1..5
    val byAnchor = out.collect().groupBy(_.getAs[Long]("q_id"))
    byAnchor.foreach { case (qid, rows) =>
      assert(rows.map(_.getAs[Int]("pick_order")).sorted.toSeq == (1 to 5),
        s"anchor $qid pick orders")
      assert(rows.map(_.getAs[Long]("n_id")).distinct.length == 5)
    }
    // replay the greedy on the collected candidate pool: rebuild rel and
    // pairwise sims from the raw embeddings (exact integer grid)
    val emb = Tables.load(spark, sfDir, "embeddings").collect()
      .map { r =>
        val v = r.getSeq[Float](1).map(x => math.floor(x * 1e7 + 0.5).toLong)
        r.getLong(0) -> v
      }.toMap
    def cos(a: Seq[Long], b: Seq[Long]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d.toDouble / math.sqrt(a.map(x => x * x).sum.toDouble) /
        math.sqrt(b.map(x => x * x).sum.toDouble)
    }
    byAnchor.foreach { case (qid, rows) =>
      val qv = emb(qid)
      val cand = emb.keys.filter(_ != qid).toSeq
        .map(n => n -> cos(qv, emb(n)))
        .sortBy { case (n, c) => (-c, n) }.take(12)
      var selected = Vector.empty[Long]
      (1 to 5).foreach { k =>
        val scored = cand.filterNot { case (n, _) => selected.contains(n) }
          .map { case (n, rel) =>
            val ms = if (selected.isEmpty) 0.0
              else selected.map(s => cos(emb(n), emb(s))).max
            (n, 0.7 * rel - 0.3 * ms)
          }
        val pick = scored.sortBy { case (n, m) => (-m, n) }.head._1
        val got = rows.find(_.getAs[Int]("pick_order") == k).get
          .getAs[Long]("n_id")
        assert(got == pick, s"anchor $qid step $k: engine $got vs replay $pick")
        selected :+= pick
      }
    }
  }

  test("q185: intermediates recount and the advisor picks the smaller estimate") {
    val out = SparkEntry.queries("q185_join_order_advisor")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    val cu = Tables.load(spark, sfDir, "customer")
    val or = Tables.load(spark, sfDir, "orders")
    val li = Tables.load(spark, sfDir, "lineitem")
    val actCO = cu.join(or, col("c_custkey") === col("o_custkey")).count()
    val actOL = or.join(li, col("o_orderkey") === col("l_orderkey")).count()
    assert(out("customer_orders_first").getAs[Long]("actual_intermediate") == actCO)
    assert(out("orders_lineitem_first").getAs[Long]("actual_intermediate") == actOL)
    // exactly one plan is advised, and it has the smaller estimate
    val advised = out.values.filter(_.getAs[Boolean]("advised")).toSeq
    assert(advised.length == 1)
    assert(advised.head.getAs[Long]("est_intermediate") ==
      out.values.map(_.getAs[Long]("est_intermediate")).min)
  }

  test("q186: phrase hits replay a driver-side tokenizer scan exactly") {
    val out = SparkEntry.queries("q186_phrase_search")(spark, sfDir).cache()
    // independent replay: tokenize every document in plain Scala and
    // count trigram occurrences + positions
    val docs = Tables.load(spark, sfDir, "documents").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    def hits(phrase: String): Seq[(Long, Int)] = {
      val p = phrase.split(" ").toSeq
      docs.toSeq.flatMap { case (id, toks) =>
        toks.sliding(3).zipWithIndex.collect {
          case (w, i) if w == p => (id, i)
        }
      }.sortBy(identity)
    }
    val byPhrase = out.collect().groupBy(_.getAs[String]("phrase"))
    assert(byPhrase.size == 3)
    byPhrase.foreach { case (phrase, rows) =>
      val want = hits(phrase)
      val got = rows.map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("pos")))
        .sortBy(identity).toSeq
      assert(got == want, s"'$phrase': $got vs $want")
      assert(rows.head.getAs[Long]("cf") == want.size)
      assert(rows.head.getAs[Long]("df") == want.map(_._1).distinct.size)
    }
    // and the three reported phrases really are the corpus's most common
    // (count ties broken by the engine's 62-bit window hash, recomputed
    // here from the same polynomial bases)
    def h62(p: String): Long = {
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(p)
      graft.functions.ArrayOps.polyHash(u, 131) * 2147483648L +
        graft.functions.ArrayOps.polyHash(u, 137) % 2147483648L
    }
    val allTri = docs.values.flatMap(_.sliding(3).map(_.mkString(" ")))
      .groupBy(identity).view.mapValues(_.size)
    val top3 = allTri.toSeq.sortBy { case (p, c) => (-c, h62(p)) }
      .take(3).map(_._1)
    assert(byPhrase.keySet == top3.toSet)
  }

  test("q187: median/MAD/outliers replay a driver-side exact computation") {
    val out = SparkEntry.queries("q187_grouped_mad")(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    val rows = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_returnflag"),
        expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    rows.groupBy(_._1).foreach { case (flag, vs) =>
      val sorted = vs.map(_._2).sorted
      val n = sorted.length
      val med2 = sorted((n - 1) / 2) + sorted(n / 2)
      val dev2 = sorted.map(v => math.abs(2 * v - med2)).sorted
      val mad4 = dev2((n - 1) / 2) + dev2(n / 2)
      val outl = dev2.count(d => 20000L * d > 44478L * mad4)
      val got = out(flag)
      assert(got.getAs[Long]("n_rows") == n)
      assert(got.getAs[Double]("median_price") == med2.toDouble / 2.0)
      assert(got.getAs[Double]("mad") == mad4.toDouble / 4.0)
      assert(got.getAs[Long]("n_outliers") == outl,
        s"$flag outliers ${got.getAs[Long]("n_outliers")} vs $outl")
    }
  }

  test("q188: batches respect the 6:2 modality layout and id order") {
    val out = SparkEntry.queries("q188_modality_pack")(spark, sfDir).cache()
    val nDocs = Tables.load(spark, sfDir, "documents").count()
    val nVecs = Tables.load(spark, sfDir, "embeddings").count()
    assert(out.count() == nDocs + nVecs)
    // slot ranges are modality-pinned and unique within a batch
    assert(out.filter(col("modality") === "text" &&
      !col("slot").between(0, 5)).count() == 0)
    assert(out.filter(col("modality") === "media" &&
      !col("slot").between(6, 7)).count() == 0)
    assert(out.groupBy("batch_id", "slot").count()
      .filter(col("count") > 1).count() == 0)
    // within each modality, (batch_id, slot) order IS id order — the
    // deterministic-replay property shard consumers rely on
    out.collect().groupBy(_.getAs[String]("modality")).foreach {
      case (_, rows) =>
        val inLayout = rows.sortBy(r =>
          (r.getAs[Long]("batch_id"), r.getAs[Int]("slot")))
          .map(_.getAs[Long]("item_id")).toSeq
        assert(inLayout == inLayout.sorted)
    }
  }

  test("q189: lateness replays an arrival-order scan; a planted straggler counts") {
    // real-data replay: running max over event_id order, computed serially
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    val wUs = 2L * 3600L * 1000000L
    var hwm = Long.MinValue
    val agg = scala.collection.mutable.Map[String, (Long, Long, Long)]()
    ev.foreach { case (_, t, us) =>
      val late = if (hwm != Long.MinValue && us < hwm - wUs) hwm - wUs - us else 0L
      val (n, nl, mx) = agg.getOrElse(t, (0L, 0L, 0L))
      agg(t) = (n + 1, nl + (if (late > 0) 1 else 0), math.max(mx, late))
      hwm = math.max(hwm, us)
    }
    SparkEntry.queries("q189_lateness_report")(spark, sfDir).collect()
      .foreach { r =>
        val (n, nl, mx) = agg(r.getString(0))
        assert(r.getAs[Long]("n_events") == n)
        assert(r.getAs[Long]("n_late") == nl, s"${r.getString(0)} late")
        assert(r.getAs[Long]("max_late_us") == mx)
      }
    // planted fixture: one straggler arriving (by id) after much newer
    // events, 3h older than the high-water mark -> exactly 1h late
    import spark.implicits._
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z")
    def ts(h: Long) = java.sql.Timestamp.from(base.plusSeconds(h * 3600))
    val fx = Seq((1L, ts(0), "m"), (2L, ts(5), "m"), (3L, ts(2), "m"))
      .toDF("event_id", "ts", "event_type")
    val row = Events.latenessReport(fx).head()
    assert(row.getAs[Long]("n_late") == 1)
    assert(row.getAs[Long]("max_late_us") == 3600L * 1000000L)
  }

  test("q190: fair top-k equals the quota-then-cut replay and caps every source") {
    val out = SparkEntry.queries("q190_fair_topk")(spark, sfDir).cache()
    assert(out.count() == 20)
    assert(out.groupBy("source").count().filter(col("count") > 2).count() == 0)
    // replay: per-source quota of 2 by (n_chars desc, doc_id), then a
    // global cut of 20 in the same order
    val docs = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val want = docs.groupBy(_._2).values.flatMap(
        _.sortBy { case (id, _, n) => (-n, id) }.take(2))
      .toSeq.sortBy { case (id, _, n) => (-n, id) }.take(20).map(_._1)
    val got = out.orderBy("rank").collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(got == want)
  }

  test("q191: incremental component maintenance equals the full rebuild") {
    // the law the shared oracle enforces in the gate, asserted in-suite
    // too: star-compressed old components + batch/bridge edges == full
    // closure over everything
    assertSameRows(
      SparkEntry.queries("q191_components_incremental")(spark, sfDir),
      SparkEntry.queries("q52_dedup_components")(spark, sfDir))
  }

  test("q192: pattern matches replay a per-user serial scan") {
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val want = ev.groupBy(_._1).toSeq.flatMap { case (uid, rows) =>
      val ordered = rows.sortBy(r => (r._4, r._2)).toSeq
      ordered.zipWithIndex.flatMap {
        case ((_, vid, "view", vus), i) =>
          val after = ordered.drop(i + 1)
          val np = after.find(_._3 == "purchase")
          val ne = after.find(_._3 == "error")
          np.flatMap { case (_, pid, _, pus) =>
            val errBetween = ne.exists { case (_, eid, _, eus) =>
              eus < pus || (eus == pus && eid < pid) }
            if (pus - vus <= 3600L * 1000000L && !errBetween)
              Some((uid, vid, pid, pus - vus)) else None
          }
        case _ => None
      }
    }.sortBy(_._2)
    val got = SparkEntry.queries("q192_event_pattern")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == want, s"got ${got.size} vs want ${want.size}")
    assert(got.nonEmpty)
  }

  test("q193: grid is complete, observed hours exact, fills bounded by neighbors") {
    val out = SparkEntry.queries("q193_interpolate")(spark, sfDir).cache()
    val hourly = Tables.load(spark, sfDir, "events")
      .select(col("event_type"), expr("unix_micros(ts) div 3600000000").as("h"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("y"))
      .groupBy("event_type", "h")
      .agg((sum("y").cast("double") / count(lit(1))).as("m"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // every metric's grid is contiguous from its min to its max hour
    val byType = out.collect().groupBy(_.getString(0))
    byType.foreach { case (t, rows) =>
      val hs = rows.map(_.getLong(1)).sorted
      assert(hs.head == hs.min && hs.last == hs.max &&
        hs.length == (hs.last - hs.head + 1), s"$t grid has holes")
      // boundary hours are observed by construction
      assert(!rows.minBy(_.getLong(1)).getBoolean(3))
      assert(!rows.maxBy(_.getLong(1)).getBoolean(3))
    }
    out.collect().foreach { r =>
      val key = (r.getString(0), r.getLong(1))
      if (!r.getBoolean(3)) assert(r.getDouble(2) == hourly(key))
      else {
        // a filled value lies between its observed neighbors
        val (t, h) = key
        val prev = hourly.keys.filter(k => k._1 == t && k._2 < h)
          .maxBy(_._2)
        val next = hourly.keys.filter(k => k._1 == t && k._2 > h)
          .minBy(_._2)
        val (lo, hi) = (math.min(hourly(prev), hourly(next)),
          math.max(hourly(prev), hourly(next)))
        assert(r.getDouble(2) >= lo && r.getDouble(2) <= hi,
          s"$key fill ${r.getDouble(2)} outside [$lo, $hi]")
        // and exactly on the line between them
        val expect = hourly(prev) + (hourly(next) - hourly(prev)) *
          ((h - prev._2).toDouble / (next._2 - prev._2).toDouble)
        assert(r.getDouble(2) == expect)
      }
    }
  }

  test("q178: diversity indices hit their closed forms on planted sources") {
    import spark.implicits._
    val uniform = (0 until 50).map(i => s"t$i").mkString(" ")
    val spam = Seq.fill(50)("t0").mkString(" ")
    val docs = Seq((1L, uniform, "uniformS"), (2L, spam, "spamS"))
      .toDF("doc_id", "text", "source")
    val out = Text.tokenDiversity(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val u = out("uniformS")
    assert(u.getAs[Long]("n_tokens") == 50 && u.getAs[Long]("n_types") == 50)
    assert(u.getAs[Double]("ttr") == 1.0)
    assert(u.getAs[Double]("inv_simpson") == 50.0)
    assert(u.getAs[Double]("top_share") == 0.02)
    val sp = out("spamS")
    assert(sp.getAs[Long]("n_types") == 1)
    assert(sp.getAs[Double]("inv_simpson") == 1.0)
    assert(sp.getAs[Double]("top_share") == 1.0)
  }

  test("q267: bootstrap CI brackets the point estimate with sane width") {
    val rows = SparkEntry.queries("q267_bootstrap_ci")(spark, sfDir).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      def d(c: String) = r.getDouble(r.fieldIndex(c))
      // all 64 Poisson replicates are live (P(sum w = 0) = e^-25 per
      // source here — structurally zero)
      assert(r.getLong(r.fieldIndex("n_reps")) == 64L)
      assert(d("boot_lo") <= d("boot_hi"))
      // percentile CI of the mean contains the exact mean on this data
      // (deterministic pin — fixed corpus, fixed hash stream)
      assert(d("boot_lo") <= d("mean_exact") && d("mean_exact") <= d("boot_hi"),
        s"${r.getString(0)}: [${d("boot_lo")}, ${d("boot_hi")}] misses ${d("mean_exact")}")
      // non-degenerate and not absurdly wide for a mean over 25 docs
      assert(d("boot_hi") - d("boot_lo") > 0.0)
      assert(d("boot_hi") - d("boot_lo") < d("mean_exact"))
    }
  }

  test("q270 kappa: fixture laws — perfect, chance-level, and inverted labelers") {
    import spark.implicits._
    // two groups, mixed truth
    val df = Seq(("g1", true), ("g1", true), ("g1", false), ("g1", false),
      ("g1", true), ("g2", false), ("g2", true), ("g2", false))
      .toDF("g", "t")
    def kOf(pred: org.apache.spark.sql.Column): Map[String, Double] =
      Text.kappaAgreement(df, col("t"), pred, "g").collect()
        .map(r => r.getString(0) -> r.getAs[Double]("kappa")).toMap
    // identical labelers: kappa exactly 1
    assert(kOf(col("t")).values.forall(_ == 1.0))
    // constant-true predictor: pb = 1 makes pe and po the SAME division,
    // so kappa is exactly 0; constant-false goes through 1-pa (a
    // different rounding path) and lands within an ulp of 0
    assert(kOf(lit(true)).values.forall(_ == 0.0))
    assert(kOf(lit(false)).values.forall(k => math.abs(k) < 1e-12))
    // inverted labeler: systematically below chance
    assert(kOf(!col("t")).values.forall(_ < 0.0))
    // registry query on real data stays in [-1, 1]
    val reg = SparkEntry.queries("q270_langid_kappa")(spark, sfDir).collect()
    assert(reg.length == 20)
    reg.foreach { r =>
      val k = r.getAs[Double]("kappa")
      assert(k >= -1.0 && k <= 1.0)
    }
  }

  test("q280: the (1.2, 0.75) sweep cell is exactly q88's scorer") {
    import spark.implicits._
    // one synthetic scoring row exercising every input column
    val frame = Seq((3L, 7L, 120L, 500L, 61L)).toDF("tf", "df", "len", "n", "sumlen")
    val both = frame.select(Text.bm25ParamFixed(1.2, 0.75).as("p"),
      Text.bm25Fixed.as("f")).collect().head
    assert(both.getLong(0) == both.getLong(1))
    // sweep output is structurally sane on real data: 6 cells, shared
    // n_eval, hits_at_1 <= hits_at_10 <= n_eval, mean_rank >= 1
    val rows = SparkEntry.queries("q280_bm25_sweep")(spark, sfDir).collect()
    assert(rows.length == 6)
    assert(rows.map(_.getAs[Long]("n_eval")).distinct.length == 1)
    rows.foreach { r =>
      assert(r.getAs[Long]("hits_at_1") <= r.getAs[Long]("hits_at_10"))
      assert(r.getAs[Long]("hits_at_10") <= r.getAs[Long]("n_eval"))
      assert(r.getAs[Double]("mean_rank") >= 1.0)
    }
  }

  test("q294: Spearman separates the monotone pair from the independent ones") {
    val rows = SparkEntry.queries("q294_spearman")(spark, sfDir).collect()
    assert(rows.length == 6)
    val byPair = rows.map(r =>
      r.getAs[String]("pair") -> r.getAs[Double]("rho")).toMap
    // netprice = price * (100 - discount) is near-perfectly rank-
    // concordant with price (discount shifts < 1 rank-decile)
    assert(byPair("price_netprice") > 0.99, byPair("price_netprice"))
    // the generator's base columns are independent: |rho| ~ O(1/sqrt(n))
    for (p <- Seq("quantity_price", "quantity_discount", "price_discount"))
      assert(math.abs(byPair(p)) < 0.15, s"$p: ${byPair(p)}")
    rows.foreach(r => assert(math.abs(r.getAs[Double]("rho")) <= 1.0))
  }

  test("q294: chunked two-phase ranks equal a direct single-window recount") {
    // independent recomputation of one pair's rho through Spark's own
    // corr() over flat-window twice-ranks — same value to double ulp
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val base = Tables.load(spark, sfDir, "lineitem").select(
      col("l_quantity").cast("long").as("v1"),
      (col("l_extendedprice").cast(DecimalType(12, 2)) * 100).cast("long")
        .as("v2"))
    def t2(c: String) = {
      val dist = base.groupBy(col(c)).agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum("cnt").over(Window.orderBy(c)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col(c), (lit(2) * col("cum") - col("cnt") + lit(1))
          .as(s"t_$c"))
      dist
    }
    val ranked = base.join(t2("v1"), Seq("v1")).join(t2("v2"), Seq("v2"))
    val direct = ranked.agg(corr(col("t_v1").cast("double"),
      col("t_v2").cast("double"))).collect().head.getDouble(0)
    val rho = SparkEntry.queries("q294_spearman")(spark, sfDir).collect()
      .find(_.getAs[String]("pair") == "quantity_price").get
      .getAs[Double]("rho")
    assert(math.abs(rho - direct) < 1e-9, s"$rho vs $direct")
  }

  test("q295: winnowing guarantees a shared fingerprint for a >= 11-token run") {
    import spark.implicits._
    def words(pfx: String, n: Int) = (0 until n).map(i => s"$pfx$i")
    val shared = words("s", 40) // 40-token pasted paragraph
    val docA = (words("a", 30) ++ shared ++ words("x", 25)).mkString(" ")
    val docB = (words("b", 50) ++ shared ++ words("y", 15)).mkString(" ")
    val docC = words("c", 60).mkString(" ")
    val docs = Seq((1L, docA), (2L, docB), (3L, docC)).toDF("doc_id", "text")
    val pairs = Dedup.winnowPairs(docs).collect()
    assert(pairs.length == 1)
    assert(pairs.head.getAs[Long]("doc_a") == 1L &&
      pairs.head.getAs[Long]("doc_b") == 2L)
    // windows fully inside the 37 shared k-gram positions select the
    // same minima: ~(37-7)/8 >= 3 guaranteed shared fingerprints
    assert(pairs.head.getAs[Long]("n_shared") >= 3)
    // density: the per-doc sketch is a fraction of the q78 full stream
    val fps = Dedup.winnowFingerprints(docs)
      .groupBy("doc_id").count().collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("count")).toMap
    // expected density 2/(w+1) of ~92 windows; allow wide slack
    assert(fps(1L) <= 50 && fps(1L) >= 10)
  }

  test("q297: stationary distribution conserves mass and converges") {
    val rows = SparkEntry.queries("q297_markov_stationary")(spark, sfDir)
      .collect()
    assert(rows.length >= 2)
    val R = 1000000000L
    val tot = rows.map(_.getAs[Long]("pi_scaled")).sum
    // floor-division losses only: mass never exceeds R and the damped
    // fixed point sits within a bounded slice below it
    assert(tot <= R && tot >= R - 10000L, tot)
    rows.foreach { r =>
      assert(r.getAs[Long]("pi_scaled") > 0L)
      // converged: successive iterations differ by < 1e-5 of the mass
      assert(r.getAs[Long]("delta_scaled") < 10000L)
    }
    val empSum = rows.map(_.getAs[Double]("emp_share")).sum
    assert(math.abs(empSum - 1.0) < 1e-9)
  }

  test("q299: CUPED adjustment is pooled-mean-preserving and reduces variance") {
    val rows = SparkEntry.queries("q299_cuped")(spark, sfDir).collect()
    assert(rows.length == 2)
    val vr = rows.head.getAs[Double]("var_reduction")
    // var_reduction = corr(X,Y)^2 — bounded by construction; both arms
    // report the same pooled statistic
    assert(vr >= 0.0 && vr <= 1.0)
    assert(rows.forall(_.getAs[Double]("var_reduction") == vr))
    val theta = rows.head.getAs[Double]("theta")
    assert(rows.forall(_.getAs[Double]("theta") == theta))
    // CUPED is mean-preserving over the POOLED population: the
    // n-weighted average of adjusted means equals that of raw means
    def wavg(c: String) = rows.map(r =>
      r.getAs[Double](c) * r.getAs[Long]("n_users")).sum /
      rows.map(_.getAs[Long]("n_users")).sum
    assert(math.abs(wavg("mean_adjusted") - wavg("mean_post")) < 1e-9)
  }

  test("q300: U statistics satisfy the exact complementarity identity") {
    val r = SparkEntry.queries("q300_mann_whitney")(spark, sfDir)
      .collect().head
    val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
    // U_A + U_B = n_A * n_B exactly (in doubled-integer carriers) —
    // the rank-sum partition of all A-B comparisons, exact under ties
    assert(r.getAs[Long]("u2_a") + r.getAs[Long]("u2_b") == 2L * na * nb)
    val auc = r.getAs[Double]("auc")
    assert(auc >= 0.0 && auc <= 1.0)
    // AUC is U_A/(n_A n_B) by definition
    assert(math.abs(auc - r.getAs[Long]("u2_a").toDouble / 2 / na / nb)
      < 1e-12)
  }

  test("q298: SQ8 codes cover the int8 range and recall clears the floor") {
    val rows = SparkEntry.queries("q298_sq8_recall")(spark, sfDir).collect()
    assert(rows.length == 8)
    val mean = rows.map(_.getAs[Double]("recall_at_10")).sum / rows.length
    // sf0.001 measured 0.86+ mean recall at sf0.01; pin a generous
    // floor — a code-mapping regression (wrong shift, clipped range)
    // collapses recall to ~0.1, far below this
    assert(mean >= 0.5, s"mean recall $mean")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_hits") >= 0L && r.getAs[Long]("n_hits") <= 10L)
    }
  }

  test("q302: FD strengths satisfy the counting identities; keys are exact FDs") {
    val rows = SparkEntry.queries("q302_fd_profile")(spark, sfDir).collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      val (n, nDet, nPairs, hits) = (r.getAs[Long]("n"),
        r.getAs[Long]("n_det"), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("hits"))
      // every determinant group contributes a majority of >= 1 row and
      // at most all its rows; the (a,b) pair count nests between
      assert(hits >= nDet && hits <= n)
      assert(nPairs >= nDet && nPairs <= n)
      val strength = r.getAs[Double]("strength")
      assert(strength > 0.0 && strength <= 1.0)
      assert(r.getAs[Boolean]("is_exact_fd") == (hits == n))
    }
    // a primary key determines every column — by construction
    val key = rows.find(_.getAs[String]("pair")
      .startsWith("orders: o_orderkey")).get
    assert(key.getAs[Boolean]("is_exact_fd"))
  }

  test("q305: Goodman-Kruskal lambda is bounded and obeys its count identities") {
    val rows = SparkEntry.queries("q305_gk_lambda")(spark, sfDir).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      val srm = r.getAs[Long]("modal_hits_ab")
      val scm = r.getAs[Long]("modal_hits_ba")
      val mct = r.getAs[Long]("base_mode_b")
      val mrt = r.getAs[Long]("base_mode_a")
      // per-group modal guessing can only beat the marginal mode
      assert(srm >= mct && srm <= n, s"${r.getAs[String]("pair")}")
      assert(scm >= mrt && scm <= n)
      val lab = r.getAs[Double]("lambda_b_given_a")
      val lba = r.getAs[Double]("lambda_a_given_b")
      assert(lab >= 0.0 && lab <= 1.0)
      assert(lba >= 0.0 && lba <= 1.0)
      // lambda is exactly the PRE its counts say it is
      assert(lab == (srm - mct).toDouble / (n - mct).toDouble)
      assert(lba == (scm - mrt).toDouble / (n - mrt).toDouble)
    }
    val byPair = rows.map(r =>
      r.getAs[String]("pair") -> r.getAs[Double]("lambda_b_given_a")).toMap
    // the generator ties documents' lang to source; event timing is
    // independent of type — the directional profile must rank them so
    assert(byPair("documents: lang x source") >
      byPair("events: event_type x dow"))
  }

  test("q306: blocking metrics respect their counting identities") {
    val r = SparkEntry.queries("q306_blocking_quality")(spark, sfDir)
      .collect().head
    def l(c: String) = r.getLong(r.fieldIndex(c))
    assert(l("n_hit") <= l("n_truth"))
    assert(l("n_hit") <= l("n_candidates"))
    assert(l("n_candidates") <= l("n_docs") * (l("n_docs") - 1) / 2)
    val pc = r.getAs[Double]("pair_completeness")
    assert(pc >= 0.0 && pc <= 1.0)
    // the winnowing guarantee at work: a 0.7-Jaccard near-dup shares
    // long runs, so the blocker must reach (nearly) every true pair —
    // at this corpus it reaches ALL of them; pin a strong floor
    assert(pc >= 0.9, s"pair completeness $pc")
    assert(r.getAs[Double]("reduction_ratio") >= 0.99)
  }
}
