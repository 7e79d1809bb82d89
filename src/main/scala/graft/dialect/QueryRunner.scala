package graft.dialect

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import scala.jdk.CollectionConverters._

/** CLI entry point for the reference dialect — the analogue of the
  * reference's `QueryMain <queryfile> <resultfile>` driver
  * (reference src/QueryMain.java:26-41): parse a dialect query file, plan
  * it through Catalyst, execute, and print tab-separated rows with a
  * qualified-name header (reference printSchema/printTuple,
  * QueryMain.java:276-306).
  *
  * Usage: runMain graft.dialect.QueryRunner <tableDir> <queryFile> [limit]
  * Every `<name>.parquet` in tableDir is registered as table `name`.
  */
object QueryRunner {
  def main(args: Array[String]): Unit = {
    val tableDir = args(0)
    val queryFile = args(1)
    val limit = if (args.length > 2) args(2).toInt else 50

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tables = Files.list(Paths.get(tableDir)).iterator().asScala
      .filter(_.toString.endsWith(".parquet"))
      .flatMap { p =>
        val name = p.getFileName.toString.stripSuffix(".parquet")
        // Tables.load knows quirks of the standard tables (e.g. events'
        // nanosecond timestamps); skip files Spark cannot read at all.
        scala.util.Try(name -> graft.Tables.load(spark, tableDir, name)).toOption
      }.toMap

    val sql = Files.readString(Paths.get(queryFile))
    val df = Translator.run(spark, sql, tables)
    println(df.columns.mkString("\t"))
    df.limit(limit).collect().foreach { row =>
      println(row.toSeq.map(v => if (v == null) "-NULL-" else v.toString).mkString("\t"))
    }
    spark.stop()
  }
}
