package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Scale probe: replicate lineitem N times in-plan (union of N shifted
  * copies — no disk writes; testdata is read-only) and time the
  * shuffle-heavy operator shapes. Checks that runtimes scale ~linearly
  * with input size, i.e. nothing in the plan is accidentally quadratic or
  * driver-bound.
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.tools.ScaleProbe <sfDir> [mult]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val mult = if (args.length > 1) args(1).toInt else 16
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def replicate(df: DataFrame, keyCol: String, stride: Long): DataFrame =
      (0 until mult).map(i =>
        df.withColumn(keyCol, col(keyCol) + lit(i * stride))).reduce(_ union _)

    val li = graft.Tables.load(spark, sfDir, "lineitem")
    val orders = graft.Tables.load(spark, sfDir, "orders")
    val maxKey = orders.agg(max("o_orderkey")).first().getLong(0) + 1
    val bigLi = replicate(li, "l_orderkey", maxKey)
    val bigOrders = replicate(orders, "o_orderkey", maxKey)

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"SCALE $name ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }

    println(s"SCALE input ${bigLi.count()} lineitem x ${bigOrders.count()} orders")
    time("pricing_agg") {
      bigLi.groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_extendedprice").cast(DecimalType(12, 2))).as("s"),
          count(lit(1)).as("n")).count()
    }
    time("fact_fact_join") {
      bigLi.join(bigOrders, bigLi("l_orderkey") === bigOrders("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1))).count()
    }
    time("topk") {
      bigLi.select("l_orderkey", "l_extendedprice")
        .orderBy(col("l_extendedprice").desc).limit(100).count()
    }
    time("distinct") {
      bigLi.select("l_orderkey", "l_linenumber", "l_quantity").distinct().count()
    }
    spark.stop()
  }
}
