package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestBase, Tables}

class AsOfJoinSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("matches a hand-built example incl. unmatched rows") {
    val ev = Seq((1L, 10L, 100L), (2L, 10L, 250L), (3L, 20L, 50L), (4L, 30L, 99L))
      .toDF("event_id", "uid", "t")
    val st = Seq((10L, 90L, "a"), (10L, 200L, "b"), (20L, 60L, "c"))
      .toDF("k", "rt", "v")
    val got = AsOf.join(ev, st, "uid", "k", "t", "rt")
      .select("event_id", "v").orderBy("event_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // ev1: t=100 -> (10,90,"a"); ev2: t=250 -> (10,200,"b");
    // ev3: t=50 < 60 -> no match; ev4: key 30 absent -> no match
    assert(got.toSeq == Seq((1L, "a"), (2L, "b"), (3L, null), (4L, null)))
  }

  test("agrees with the composable window encoding on real data") {
    val ev = Tables.load(spark, sfDir, "events").select("event_id", "user_id", "ts")
    val orders = Tables.load(spark, sfDir, "orders")
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max("o_totalprice").as("order_total"))
    val got = AsOf.join(ev, orders, "user_id", "o_custkey", "ts", "o_orderdate")
      .select(col("event_id"), col("o_orderdate"), col("order_total"))

    // composable encoding: range join + arg-max per event
    val w = Window.partitionBy("event_id").orderBy(col("o_orderdate").desc)
    val want = ev.join(orders,
        col("user_id") === col("o_custkey") && col("ts") >= col("o_orderdate"), "left_outer")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("o_orderdate"), col("order_total"))
    assertSameRows(got, want)
  }

  test("plan uses one streaming merge, no per-key windows") {
    val ev = Tables.load(spark, sfDir, "events").select("event_id", "user_id", "ts")
    val orders = Tables.load(spark, sfDir, "orders")
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max("o_totalprice").as("order_total"))
    val plan = AsOf.join(ev, orders, "user_id", "o_custkey", "ts", "o_orderdate")
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"))
    assert(!plan.contains("Window"))
  }

  test("NULL keys and times never match (SQL ASOF semantics)") {
    val ev = Seq(
      (1L, Some(10L), Some(100L)),   // normal match
      (2L, None,      Some(100L)),   // null key -> null-extended
      (3L, Some(10L), None),         // null time -> null-extended
      (4L, Some(10L), Some(300L)))   // scans past null right rows
      .toDF("event_id", "uid", "t")
    val st = Seq(
      (Some(10L), Some(90L),  "a"),
      (None,      Some(95L),  "boom"), // null right key: never a candidate
      (Some(10L), None,       "boom"), // null right time: never a candidate
      (Some(10L), Some(200L), "b"))
      .toDF("k", "rt", "v")
    val got = AsOf.join(ev, st, "uid", "k", "t", "rt")
      .select("event_id", "v").orderBy("event_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((1L, "a"), (2L, null), (3L, null), (4L, "b")))
  }

  test("strict mode detects a non-unique right side") {
    val ev = Seq((1L, 10L, 100L)).toDF("event_id", "uid", "t")
    val dup = Seq((10L, 90L, "a"), (10L, 90L, "b")).toDF("k", "rt", "v")
    val err = intercept[org.apache.spark.SparkException] {
      AsOf.join(ev, dup, "uid", "k", "t", "rt", strict = true).collect()
    }
    assert(err.getMessage.contains("not unique") ||
      Option(err.getCause).exists(_.getMessage.contains("not unique")))
    // non-strict keeps the documented pick-one behavior
    assert(AsOf.join(ev, dup, "uid", "k", "t", "rt").count() == 1)
  }

  test("correct under AQE with coalesced shuffle partitions") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    s2.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1b")
    s2.conf.set("spark.sql.shuffle.partitions", "16")
    val ev = Tables.load(s2, sfDir, "events").select("event_id", "user_id", "ts")
    val orders = Tables.load(s2, sfDir, "orders")
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max("o_totalprice").as("order_total"))
    val got = AsOf.join(ev, orders, "user_id", "o_custkey", "ts", "o_orderdate")
      .select(col("event_id"), col("o_orderdate"), col("order_total"))
    val w = Window.partitionBy("event_id").orderBy(col("o_orderdate").desc)
    val want = ev.join(orders,
        col("user_id") === col("o_custkey") && col("ts") >= col("o_orderdate"), "left_outer")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("o_orderdate"), col("order_total"))
    assertSameRows(got, want)
  }
}
