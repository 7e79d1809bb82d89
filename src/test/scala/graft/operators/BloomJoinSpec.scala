package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestBase, Tables}

/** Bloom-filter semi-join reduction: the prefilter must be a strict
  * superset of the joining rows (exact-superset contract), must actually
  * prune, and must leave the final join result bit-identical.
  */
class BloomJoinSpec extends AnyFunSuite with SparkTestBase {

  private def orders = Tables.load(spark, sfDir, "orders")
    .filter(col("o_orderpriority") === "1-URGENT")
  private def lineitem = Tables.load(spark, sfDir, "lineitem")

  test("prefilter keeps every joining row and prunes most others") {
    val pruned = BloomJoin.prefilter(lineitem, col("l_orderkey"),
      orders.select("o_orderkey"), col("o_orderkey"))
    val total = lineitem.count()
    val kept = pruned.count()
    val joining = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"),
      "left_semi").count()
    assert(kept < total, "bloom prefilter should prune non-joining rows")
    assert(kept >= joining, "prefilter must never drop a joining row")
    // ~1% FP rate at default sizing: kept should sit near the true
    // semi-join count, far below the full table
    assert(kept <= joining + math.max(50L, total / 20),
      s"kept=$kept joining=$joining total=$total — filter not selective")
    // superset check row-by-row, not just counts
    val lost = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .exceptAll(pruned.join(orders, col("l_orderkey") === col("o_orderkey"), "left_semi"))
      .count()
    assert(lost == 0, "a joining row was dropped by the bloom filter")
  }

  test("join result is bit-identical with and without the prefilter") {
    def agg(fact: org.apache.spark.sql.DataFrame) =
      fact.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("qty"))
    val pruned = BloomJoin.prefilter(lineitem, col("l_orderkey"),
      orders.select("o_orderkey"), col("o_orderkey"))
    assertSameRows(agg(pruned), agg(lineitem))
  }

  test("the probe compiles into the fact scan stage, not a join") {
    val plan = BloomJoin.prefilter(lineitem, col("l_orderkey"),
      orders.select("o_orderkey"), col("o_orderkey"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan.take(2000))
    // the bloom travels as a scalar subquery, never as a join of the
    // one-row filter relation against the fact side
    assert(plan.contains("Subquery") || plan.contains("subquery"), plan.take(2000))
  }
}
