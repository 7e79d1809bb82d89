package graft.tools
import org.apache.spark.sql.SparkSession

/** Ad-hoc plan/schema inspector: runMain graft.tools.Probe <sfDir> <sql...> */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.registerAll(spark, args(0))
    val df = spark.sql(args(1))
    df.printSchema()
    if (args.length > 2 && args(2) == "explain") df.explain("formatted")
    df.show(30, false)
    spark.stop()
  }
}
