package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestBase, Tables}

/** Per-operator sanity over the sf0.001 testdata (the DuckDB oracle gate at
  * sf0.01 is the authoritative value check; these pin structural semantics
  * and algebraic properties).
  */
class RelationalSpec extends AnyFunSuite with SparkTestBase {

  def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("every registered query runs and has stable column order") {
    SparkEntry.registry.foreach { qd =>
      val df = qd.build(spark, sfDir)
      assert(df.columns.nonEmpty, s"${qd.name} produced no columns")
      assert(df.count() >= 0, s"${qd.name} failed to execute")
    }
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("registry names are unique and oracle keys match query keys") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("filter partitions rows: sigma(p) + sigma(!p) = id") {
    val li = Tables.load(spark, sfDir, "lineitem")
    val p = col("l_quantity") <= 10.0
    assert(li.filter(p).count() + li.filter(!p).count() == li.count())
  }

  test("distinct is idempotent and minimal") {
    val d1 = q("q13_distinct")
    assert(d1.count() == d1.distinct().count())
    assert(d1.count() == 6) // 3 returnflags x 2 linestatus
  }

  test("join commutes (row counts)") {
    val c = Tables.load(spark, sfDir, "customer")
    val o = Tables.load(spark, sfDir, "orders")
    val l = c.join(o, c("c_custkey") === o("o_custkey")).count()
    val r = o.join(c, o("o_custkey") === c("c_custkey")).count()
    assert(l == r)
  }

  test("semi + anti partition the left table") {
    assert(q("q19_semijoin").count() <= Tables.load(spark, sfDir, "customer").count())
    val c = Tables.load(spark, sfDir, "customer")
    val o = Tables.load(spark, sfDir, "orders")
    val semi = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi").count()
    val anti = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti").count()
    assert(semi + anti == c.count())
  }

  test("argmax quirk returns one row per group, the max tuple") {
    val rows = q("q12_argmax_quirk").collect()
    assert(rows.map(_.getString(0)).distinct.length == rows.length)
    val o = Tables.load(spark, sfDir, "orders")
    val trueMax = o.agg(max("o_totalprice")).first().getDouble(0)
    assert(rows.map(_.getDouble(2)).max == trueMax)
  }

  test("topk equals sort-then-take") {
    val o = Tables.load(spark, sfDir, "orders")
    val want = o.select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .collect().take(100).map(_.toSeq).toSeq
    val got = q("q15_topk").collect().map(_.toSeq).toSeq
    assert(got == want)
  }

  test("rollup total row equals table count") {
    val all = q("q27_rollup").filter(col("flag") === "ALL" && col("status") === "ALL")
      .first().getLong(2)
    assert(all == Tables.load(spark, sfDir, "lineitem").count())
  }
}
