package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestBase, Tables}

/** Structural and fixture laws for the round-9 continuation operators:
  * multiset Jaccard (completeness vs brute force + the motivating
  * repeated-template fixture), reciprocal matching (mutual-argmax
  * recheck), water-filling (conservation/cap laws), frame-sample plans
  * (bounds), modularity (term-sum identity and range), and hubness
  * (mass accounting).
  */
class DataOpsSpec extends AnyFunSuite with SparkTestBase {

  test("q272: multiset Jaccard equals the unfiltered brute force at theta 0.5") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(spark, sfDir, "documents")
    // brute force: occurrence-indexed keys, full equijoin, no prefix
    // or positional filter — the completeness bound q272 must meet
    val w = docs.select(col("doc_id"), posexplode(
      graft.functions.ArrayExprs.windowHashes(split(col("text"), " "), 3))
      .as(Seq("p", "h")))
    val keys = w.withColumn("occ", row_number().over(
        Window.partitionBy("doc_id", "h").orderBy("p")))
      .select(col("doc_id"),
        col("h").bitwiseXOR(Sampling.lehmer(col("occ"))).as("t"))
    val cnt = keys.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val brute = keys.as("a")
      .join(keys.as("b"), col("a.t") === col("b.t") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("c"))
      .join(cnt.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(cnt.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .withColumn("jaccard",
        col("c").cast("double") / (col("na") + col("nb") - col("c")))
      .filter(col("jaccard") >= 0.5)
      .select("doc_a", "doc_b", "jaccard")
    assertSameRows(Dedup.multisetJaccardJoin(docs, 0.5), brute)
  }

  test("q272: a document that repeats one template is caught only by multiset J") {
    import spark.implicits._
    val para = (0 until 30).map(i => s"w$i").mkString(" ")
    val once = para
    val repeated = (0 until 10).map(_ => para).mkString(" ")
    val docs = Seq((1L, once), (2L, repeated)).toDF("doc_id", "text")
    // set Jaccard saturates: near 1 (the repeats add no new shingles
    // beyond the 2 seam windows), so q65-style dedup sees a near-dup...
    val setJ = Dedup.jaccardJoin(docs, 0.5).collect()
    assert(setJ.length == 1 && setJ.head.getAs[Double]("jaccard") > 0.9)
    // ...while multiset Jaccard sees that 9/10 of the mass is unmatched
    val msJ = Dedup.multisetJaccardJoin(docs, 0.05).collect()
    assert(msJ.length == 1)
    val j = msJ.head.getAs[Double]("jaccard")
    assert(j < 0.15, s"multiset jaccard $j should expose the repetition")
    // and the pair is invisible at any production multiset threshold
    assert(Dedup.multisetJaccardJoin(docs, 0.5).collect().isEmpty)
  }

  test("q275: every reported pair is a mutual best match") {
    val docs = Tables.load(spark, sfDir, "documents")
    val out = SparkEntry.queries("q275_reciprocal_match")(spark, sfDir).collect()
    assert(out.nonEmpty)
    // recompute the cross-half candidate list and each side's argmax
    val half = docs.select(col("doc_id"),
      (expr("CAST(substring(source, 4, 8) AS INT)") % 2).as("half"))
    val pairs = Dedup.jaccardJoin(docs, 0.4)
      .join(half.select(col("doc_id").as("doc_a"), col("half").as("ha")), "doc_a")
      .join(half.select(col("doc_id").as("doc_b"), col("half").as("hb")), "doc_b")
      .filter(col("ha") =!= col("hb"))
      .select(when(col("ha") === 0, col("doc_a")).otherwise(col("doc_b")).as("l"),
        when(col("ha") === 0, col("doc_b")).otherwise(col("doc_a")).as("r"),
        col("jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    def best(grp: Map[Long, Array[(Long, Long, Double)]], of: Long,
        pick: ((Long, Long, Double)) => Long) =
      grp(of).maxBy(t => (t._3, -pick(t)))
    val byL = pairs.groupBy(_._1)
    val byR = pairs.groupBy(_._2)
    out.foreach { row =>
      val (l, r) = (row.getLong(0), row.getLong(1))
      assert(best(byL, l, _._2)._2 == r, s"$l's best is not $r")
      assert(best(byR, r, _._1)._1 == l, s"$r's best is not $l")
    }
  }

  test("q277: water-filling conserves the budget and respects caps") {
    val rows = SparkEntry.queries("q277_waterfill_alloc")(spark, sfDir).collect()
    assert(rows.length == 20)
    def l(r: org.apache.spark.sql.Row, c: String) = r.getLong(r.fieldIndex(c))
    val budget = l(rows.head, "budget")
    val leftover = l(rows.head, "leftover")
    // conservation: placed + leftover == budget, leftover small and >= 0
    assert(rows.map(l(_, "alloc_tokens")).sum + leftover == budget)
    assert(leftover >= 0 && leftover < rows.length * 3,
      s"3 rounds left $leftover unplaced")
    rows.foreach { r =>
      assert(l(r, "alloc_tokens") <= l(r, "avail_tokens"))
      assert(r.getBoolean(r.fieldIndex("filled")) ==
        (l(r, "alloc_tokens") == l(r, "avail_tokens")))
    }
    // the cascade actually ran: somebody capped out, nobody got zero
    assert(rows.exists(r => r.getBoolean(r.fieldIndex("filled"))))
    assert(rows.forall(l(_, "alloc_tokens") > 0))
  }

  test("q274: frame plans stay inside every declared bound") {
    val rows = SparkEntry.queries("q274_frame_sample_plan")(spark, sfDir)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_frames"), max("ts_ms").as("max_ts"),
        max("byte_offset").as("max_off"), max("frame_idx").as("max_idx"))
      .join(Tables.load(spark, sfDir, "documents")
        .select(col("doc_id"), octet_length(col("text")).cast("long").as("nb")), "doc_id")
      .collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_frames")
      assert(n >= 1 && n <= 16)
      assert(r.getAs[Int]("max_idx").toLong == n - 1)
      assert(r.getAs[Long]("max_ts") < r.getAs[Long]("nb") * 3 + 40)
      assert(r.getAs[Long]("max_off") < r.getAs[Long]("nb"))
    }
  }

  test("q283: modularity terms sum to the global Q, which is in range") {
    val rows = SparkEntry.queries("q283_modularity")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val q = rows.head.getAs[Double]("q_global")
    assert(rows.forall(r => r.getAs[Double]("q_global") == q))
    val sum = rows.map(_.getAs[Double]("modularity_term")).sum
    assert(math.abs(sum - q) < 1e-9, s"terms sum $sum != Q $q")
    assert(q > -0.5 && q <= 1.0)
    // LPA on a kNN graph must beat the random baseline clearly
    assert(q > 0.1, s"modularity $q — no community structure found")
    // edge accounting: intra-community edges can't exceed m
    val m = 3598L // undirected edge count is data-derived; bound loosely
    assert(rows.map(_.getAs[Long]("e_in")).sum <= m * 2)
  }

  test("q285: hubness distribution accounts for every node and edge") {
    val rows = SparkEntry.queries("q285_hubness")(spark, sfDir).collect()
    val nodes = rows.map(_.getAs[Long]("n_nodes")).sum
    assert(nodes == 500)
    // in-degree mass equals the directed edge count (12 per node)
    val mass = rows.map(r => r.getAs[Long]("in_deg") * r.getAs[Long]("n_nodes")).sum
    assert(mass == 500L * 12)
    val shares = rows.map(_.getAs[Double]("share")).sum
    assert(math.abs(shares - 1.0) < 1e-9)
  }

  test("q373: constraint verdicts are non-vacuous and follow the rules") {
    val rows = SparkEntry.queries("q373_ifeval_checks")(spark, sfDir).collect()
    val docs = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length == docs.size)
    rows.foreach { r =>
      val text = docs(r.getAs[Long]("doc_id"))
      val toks = text.split(" ", -1)
      assert(r.getAs[Long]("n_tokens") == toks.length)
      assert(r.getAs[Boolean]("c_min_tokens") == (toks.length >= 40))
      assert(r.getAs[Boolean]("c_keyword") == toks.contains("the"))
      assert(r.getAs[Boolean]("c_max_chars") == (text.length <= 300))
      assert(r.getAs[Boolean]("c_no_repeat") ==
        toks.sliding(2).forall(p => p.length < 2 || p(0) != p(1)))
      val n = Seq("c_min_tokens", "c_keyword", "c_max_chars", "c_no_repeat")
        .count(r.getAs[Boolean])
      assert(r.getAs[Long]("n_passed") == n)
      assert(r.getAs[Boolean]("all_passed") == (n == 4))
    }
    // every constraint must discriminate (both verdicts occur)
    Seq("c_min_tokens", "c_keyword", "c_max_chars", "c_no_repeat").foreach {
      c =>
        val s = rows.count(_.getAs[Boolean](c))
        assert(s > 0 && s < rows.length, s"$c is vacuous")
    }
  }

  test("q368: token-F1 scorer bag algebra on planted overlap regimes") {
    import spark.implicits._
    // (id, gold, pred): identical bags (order ignored), disjoint bags,
    // repeat-limited overlap (gold [a,a,b] vs pred [a,b,b] -> 2), and
    // an empty pred side.
    val pairs = Seq(
      (1L, Seq("b", "a"), Seq("a", "b")),
      (2L, Seq("a", "b"), Seq("c", "d")),
      (3L, Seq("a", "a", "b"), Seq("a", "b", "b")),
      (4L, Seq("a"), Seq.empty[String]))
      .toDF("doc_id", "gold", "pred")
    val got = Text.scoreTokenF1(pairs).collect()
      .map(r => r.getLong(0) -> r).toMap
    def t(id: Long) = {
      val r = got(id)
      (r.getAs[Long]("len_gold"), r.getAs[Long]("len_pred"),
        r.getAs[Long]("overlap"), r.getAs[Long]("f1_num"),
        r.getAs[Long]("f1_den"), r.getAs[Boolean]("multiset_em"))
    }
    assert(t(1L) == ((2L, 2L, 2L, 4L, 4L, true)), s"identical bags: ${t(1L)}")
    assert(t(2L) == ((2L, 2L, 0L, 0L, 4L, false)), s"disjoint: ${t(2L)}")
    assert(t(3L) == ((3L, 3L, 2L, 4L, 6L, false)), s"repeat-limited: ${t(3L)}")
    assert(t(4L) == ((1L, 0L, 0L, 0L, 1L, false)), s"empty pred: ${t(4L)}")
    // the corrupted-pair face covers every regime at data scale: both
    // misses (deletions) and spurious tokens (substitutions) must appear
    val face = SparkEntry.queries("q368_token_f1")(spark, sfDir)
    val stats = face.agg(
      sum(when(col("overlap") < col("len_gold"), 1L).otherwise(0L)),
      sum(when(col("overlap") < col("len_pred"), 1L).otherwise(0L)),
      sum(when(col("f1_num") === col("f1_den"), 1L).otherwise(0L)),
      count(lit(1))).collect()(0)
    assert(stats.getLong(0) > 0, "no pair with a recall miss")
    assert(stats.getLong(1) > 0, "no pair with a spurious prediction")
    assert(stats.getLong(3) > 0)
  }
}
