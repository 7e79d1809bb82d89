package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestBase, Tables}

/** Product-quantization family (q150–q152): structural contracts of the
  * trained codebook, exactness of the int64 ADC ranking, and the
  * properties the hash oracle can't see — partition invariance, planted
  * near-duplicate navigation, and that the ADC ranking is informative
  * (selects from the near tail of the true distance distribution) even
  * on the pure-noise corpus where top-10 recall is honestly low.
  */
class PqSpec extends AnyFunSuite with SparkTestBase {

  private lazy val emb = Tables.load(spark, sfDir, "embeddings")

  test("q150: codebook is m x k, 16-dim codewords, populations sum to n") {
    val report = SparkEntry.queries("q150_pq_train")(spark, sfDir).cache()
    val n = emb.count()
    // 4 subspaces, at most 16 codewords each, every one 16-dim
    assert(report.select("sub").distinct().count() == 4)
    val perSub = report.groupBy("sub").agg(
      count(lit(1)).as("codes"), sum("n_assigned").as("assigned"))
    assert(perSub.filter(col("codes") > 16).count() == 0)
    assert(perSub.filter(col("assigned") =!= n).count() == 0)
    assert(report.filter(size(split(col("cv_csv"), ",")) =!= 16).count() == 0)
    // codewords carry real populations (no dead codes survived the join)
    assert(report.filter(col("n_assigned") < 1).count() == 0)
  }

  test("pq codebook and ADC ranking are partition-invariant") {
    val (cb1, subs1) = Similarity.pqCodebook(emb.repartition(7))
    val (cb2, subs2) = Similarity.pqCodebook(emb)
    assertSameRows(cb1.select(col("sub"), col("c_id"),
      array_join(transform(col("cv"), x => x.cast("string")), ",").as("csv")),
      cb2.select(col("sub"), col("c_id"),
        array_join(transform(col("cv"), x => x.cast("string")), ",").as("csv")))
    assertSameRows(Similarity.pqAdcTopK(spark, cb1, subs1),
      Similarity.pqAdcTopK(spark, cb2, subs2))
  }

  test("ADC puts a planted near-duplicate at rank 1") {
    // clone vector 0 under a fresh id: the clone encodes to the SAME m
    // codes as the anchor (encoding is deterministic on the vector), and
    // the anchor's own codes minimize every per-subspace partial
    // distance, so the clone achieves the global ADC minimum — PQ's
    // actual production contract (find the near-duplicate), independent
    // of noise-tail recall
    val clone = emb.filter(col("vec_id") === 0)
      .select(lit(900000L).as("vec_id"), col("embedding"), col("label"))
    val corpus = emb.select("vec_id", "embedding", "label").union(clone)
    val (cb, subs) = Similarity.pqCodebook(corpus)
    val hit = Similarity.pqAdcTopK(spark, cb, subs)
      .filter(col("q_id") === 0 && col("rank") === 1).head()
    assert(hit.getLong(2) == 900000L, s"expected clone at rank 1, got $hit")
  }

  test("ADC top-10 selects from the near tail of the true distance distribution") {
    // recall@10 on isotropic noise is low by theory (see q152's note) —
    // what must still hold for the ranking to be USEFUL is that the
    // ADC-selected candidates are genuinely near: their mean TRUE grid
    // distance sits well below the anchor's mean distance to the corpus
    val e = Similarity.quantize(emb)
    val dotq = graft.functions.ArrayExprs.dotq _
    val (cb, subs) = Similarity.pqCodebook(emb)
    val adc = Similarity.pqAdcTopK(spark, cb, subs).select("q_id", "n_id")
    val anchors = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("qv").as("qa"), col("n2").as("na"))
    val all = anchors.join(e.select(col("vec_id").as("n_id"), col("qv").as("qb"),
        col("n2").as("nb")), col("q_id") =!= col("n_id"))
      .withColumn("d2", col("na") + col("nb") - lit(2L) * dotq(col("qa"), col("qb")))
    val meanAll = all.agg(avg("d2")).head().getDouble(0)
    val meanSel = all.join(adc, Seq("q_id", "n_id"), "left_semi")
      .agg(avg("d2")).head().getDouble(0)
    assert(meanSel < 0.9 * meanAll,
      s"ADC selection not informative: selected mean d2 $meanSel vs corpus $meanAll")
  }

  test("q169: RRF fusion is consistent with its component ranks") {
    val r = SparkEntry.queries("q169_hybrid_rrf")(spark, sfDir).cache()
    // full pages, contiguous ranks
    val pages = r.groupBy("q_id").agg(count(lit(1)).as("n"),
      max("rank").as("mx"))
    assert(pages.filter(col("n") =!= 10 || col("mx") =!= 10).count() == 0)
    // the reported score is exactly the RRF formula over the reported
    // component ranks (nulls contribute zero)
    val bad = r.withColumn("recomputed",
      coalesce(lit(1.0) / (lit(60) + col("lex_rank")), lit(0.0)) +
        coalesce(lit(1.0) / (lit(60) + col("sem_rank")), lit(0.0)))
      .filter(col("recomputed") =!= col("rrf_score"))
    assert(bad.count() == 0)
    // fusion actually mixes: the result set references both components
    assert(r.filter(col("lex_rank").isNotNull).count() > 0)
    assert(r.filter(col("sem_rank").isNotNull).count() > 0)
    // no anchor retrieves itself
    assert(r.filter(col("q_id") === col("doc_id")).count() == 0)
  }

  test("q271: JL band accounting is exhaustive and the estimator centers near 1") {
    val rows = SparkEntry.queries("q271_jl_distortion")(spark, sfDir).collect()
    assert(rows.length == 16)
    rows.foreach { r =>
      def l(c: String) = r.getLong(r.fieldIndex(c))
      // the seven bands + zero-distance pairs partition every pair
      val banded = l("n_lt_50") + l("n_50_75") + l("n_75_90") +
        l("n_90_110") + l("n_110_125") + l("n_125_150") + l("n_ge_150")
      assert(banded + l("n_zero_dist") == l("n_pairs"))
      assert(r.getDouble(r.fieldIndex("frac_within_25")) >= 0.05,
        s"anchor ${l("q_id")} lost all distance signal")
    }
    // pooled: the Rademacher estimator is unbiased, so mass concentrates
    // around ratio 1 — the +-25% band beats what a CONSTANT predictor in
    // any single band could claim if distances carried no signal; at 8
    // dims the relative sd is ~0.5 so the pin is deliberately loose
    def pooled(c: String) = rows.map(r => r.getLong(r.fieldIndex(c))).sum
    val within = pooled("n_75_90") + pooled("n_90_110") + pooled("n_110_125")
    val live = pooled("n_pairs") - pooled("n_zero_dist")
    val frac = within.toDouble / live
    assert(frac > 0.1 && frac < 0.8, s"pooled within-25% fraction $frac")
  }
}
