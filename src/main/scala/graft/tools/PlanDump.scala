package graft.tools

import org.apache.spark.sql.SparkSession

/** Print a registered query's FINAL (post-AQE) physical plan: the query
  * is executed first so adaptive stage reuse, skew splits, and join
  * re-plans are all settled — the static `explain()` plan shows none of
  * them.
  *
  * Usage: runMain graft.tools.PlanDump <queryName> [sfDir]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.collect()
    println(df.queryExecution.executedPlan.toString)
  }
}
