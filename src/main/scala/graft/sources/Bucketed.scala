package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table support: pre-shuffle fact tables by their join key at
  * write time so every later co-keyed join/aggregation skips its exchange.
  *
  * At 100 TB this is the difference between re-shuffling the fact table on
  * every query and paying the shuffle once at ingest: two tables bucketed
  * by the same key into the same bucket count sort-merge join with zero
  * Exchange nodes (verified in BucketedSpec).
  */
object Bucketed {

  /** Write `df` as a bucketed+sorted catalog table. */
  def write(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Bucket the orders/lineitem pair by their join key. */
  def createOrderTables(spark: SparkSession, sfDir: String, buckets: Int = 8): Unit = {
    write(graft.Tables.load(spark, sfDir, "orders"), "orders_b", "o_orderkey", buckets)
    write(graft.Tables.load(spark, sfDir, "lineitem"), "lineitem_b", "l_orderkey", buckets)
  }

  /** Exchange-free join over the bucketed pair. The merge hint keeps the
    * planner on sort-merge — a broadcast join would ignore bucketing (and
    * at the scale bucketing targets, neither side broadcasts anyway). */
  def joinOrders(spark: SparkSession): DataFrame = {
    val o = spark.table("orders_b").hint("merge")
    val l = spark.table("lineitem_b").hint("merge")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
  }
}
