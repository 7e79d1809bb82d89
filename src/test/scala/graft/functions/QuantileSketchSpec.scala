package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Laws for the LogHist mergeable quantile sketch (q233's engine). */
class QuantileSketchSpec extends AnyFunSuite with SparkTestBase {

  private val probes: Seq[Long] =
    (0L to 40L) ++ // exact regime + first octaves
      (0 to 62).flatMap { b =>
        val p = 1L << b
        Seq(p - 1, p, p + 1)
      }.filter(_ >= 0) ++
      Seq(Long.MaxValue, Long.MaxValue - 1, 999999937L, 1234567890123L)

  test("bucketOf is monotone and lo/hi bracket every value") {
    probes.sorted.sliding(2).foreach {
      case Seq(a, b) =>
        assert(LogHist.bucketOf(a) <= LogHist.bucketOf(b),
          s"monotonicity broken between $a and $b")
      case _ => ()
    }
    probes.foreach { v =>
      val i = LogHist.bucketOf(v)
      assert(LogHist.bucketLo(i) <= v && v <= LogHist.bucketHi(i),
        s"$v outside [${LogHist.bucketLo(i)}, ${LogHist.bucketHi(i)}] of bucket $i")
    }
  }

  test("bucket bounds tile the non-negative axis without gaps or overlaps") {
    val maxIdx = LogHist.bucketOf(Long.MaxValue)
    (0 until maxIdx).foreach { i =>
      assert(LogHist.bucketHi(i) + 1 == LogHist.bucketLo(i + 1),
        s"gap/overlap between bucket $i and ${i + 1}")
      assert(LogHist.bucketOf(LogHist.bucketLo(i)) == i &&
        LogHist.bucketOf(LogHist.bucketHi(i)) == i,
        s"bucket $i bounds do not map back to it")
    }
    assert(LogHist.bucketHi(maxIdx) == Long.MaxValue)
  }

  test("relative error of the upper-bound estimate is strictly below 2^-4") {
    // the q233 attestation in its integer-exact form: for every value,
    // est = bucketHi over-estimates by less than lo/16 <= v/16
    probes.filter(_ >= 1).foreach { v =>
      val hi = LogHist.bucketHi(LogHist.bucketOf(v))
      assert(hi >= v, s"estimate must not under-shoot: $hi < $v")
      // 16*(hi - v) < v, guarded against overflow via BigInt
      assert(BigInt(16) * (BigInt(hi) - BigInt(v)) < BigInt(v).max(1),
        s"error bound broken at $v: hi=$hi")
    }
  }

  test("sketch is merge-order independent and equals a single-pass build") {
    // adversarial multiset: heavy ties, octave boundaries, huge spread
    val vals: Seq[Long] = Seq.fill(50)(31L) ++ Seq.fill(50)(32L) ++
      (1L to 200L) ++ Seq(0L, 1L << 40, (1L << 40) + 7, Long.MaxValue)
    val agg = new LogHistAgg
    def build(xs: Seq[Long]): Map[Int, Long] =
      xs.foldLeft(agg.zero)(agg.reduce)
    val whole = build(vals)
    val (a, b) = vals.splitAt(37)
    assert(agg.merge(build(a), build(b)) == whole)
    assert(agg.merge(build(b), build(a)) == whole)
    assert(build(scala.util.Random.shuffle(vals)) == whole)
    assert(whole.values.sum == vals.size)
  }

  test("distributed sketch equals the local build and stays partial-aggregable") {
    val sp = spark
    import sp.implicits._
    val vals = (1L to 5000L) ++ Seq.fill(100)(999999L)
    val local = vals.foldLeft((new LogHistAgg).zero)((new LogHistAgg).reduce)
    val ds = sp.createDataset(vals).repartition(7)
    val got = ds.groupByKey(_ => "g").agg(new LogHistAgg().toColumn.name("h"))
      .collect().head._2.toMap
    assert(got == local)
    // the plan must carry a partial aggregate before the exchange
    val plan = ds.groupByKey(_ => "g")
      .agg(new LogHistAgg().toColumn.name("h"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"))
  }

  test("weighted sketch equals the unweighted one under unit weights and merges") {
    val vals = (1L to 500L) ++ Seq.fill(40)(77L)
    val u = new LogHistAgg
    val w = new LogHistWeightedAgg
    val unwtd = vals.foldLeft(u.zero)(u.reduce)
    val unit = vals.map((_, 1L)).foldLeft(w.zero)(w.reduce)
    assert(unit == unwtd)
    // weight w == w repetitions
    val weighted = Seq((10L, 3L), (100L, 5L)).foldLeft(w.zero)(w.reduce)
    val repeated = (Seq.fill(3)(10L) ++ Seq.fill(5)(100L)).foldLeft(u.zero)(u.reduce)
    assert(weighted == repeated)
    // merge is counter addition either way
    val (a, b) = vals.map((_, 2L)).splitAt(123)
    assert(w.merge(a.foldLeft(w.zero)(w.reduce), b.foldLeft(w.zero)(w.reduce)) ==
      vals.map((_, 2L)).foldLeft(w.zero)(w.reduce))
  }

  test("q238 weighted attestation and q239 KS bounds hold on the real testdata") {
    val wp = graft.SparkEntry.queries("q238_weighted_percentiles")(spark, sfDir)
      .collect()
    assert(wp.nonEmpty)
    wp.foreach(r => assert(r.getAs[Boolean]("within_bound"), s"bound broken: $r"))
    val ks = graft.SparkEntry.queries("q239_sketch_ks")(spark, sfDir).collect()
    assert(ks.nonEmpty)
    ks.foreach { r =>
      val d = r.getAs[Double]("ks_d")
      assert(d >= 0.0 && d <= 1.0, s"KS statistic out of [0,1]: $r")
      assert(r.getAs[Double]("critical_5pct") > 0.0)
    }
  }

  test("q233 attestation holds on the real testdata") {
    val df = graft.SparkEntry.queries("q233_quantile_sketch")(spark, sfDir)
      .collect()
    assert(df.nonEmpty)
    df.foreach { r =>
      assert(r.getAs[Boolean]("within_bound"),
        s"bound broken: $r")
      assert(r.getAs[Double]("rel_err") >= 0.0 &&
        r.getAs[Double]("rel_err") < 0.0625)
    }
  }
}
