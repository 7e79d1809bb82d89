package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestBase, Tables}

class SketchesSpec extends AnyFunSuite with SparkTestBase {

  test("q33 HLL distinct counts within 5% of exact") {
    val approx = SparkEntry.queries("q33_approx_distinct")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.load(spark, sfDir, "events")
      .groupBy("event_type").agg(countDistinct("user_id").as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, e) =>
      assert(math.abs(approx(k) - e) <= math.max(1, 0.05 * e), s"$k: ${approx(k)} vs $e")
    }
  }

  test("q34 approximate quantiles bracket the exact ones") {
    val got = SparkEntry.queries("q34_approx_quantiles")(spark, sfDir).collect()
    got.foreach { r =>
      val (p50, p95, p99) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(p50 <= p95 && p95 <= p99)
    }
    val exact = Tables.load(spark, sfDir, "lineitem")
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.5)").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    got.foreach { r =>
      val m = exact(r.getString(0))
      assert(math.abs(r.getDouble(1) - m) / m < 0.05)
    }
  }
}
