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
  * Tables are discovered from tableDir in every format the engine reads:
  * `<name>.parquet`, the reference's serialized `<name>.tbl` (schema from
  * `<name>.md` if present, else `<name>.det`), and the reference's
  * `<name>.det` + `<name>.txt` pair via the DataSource-V2 scan — so a
  * directory produced for the reference engine runs unmodified.
  */
object QueryRunner {

  /** Discover and load every table in `dir`, by preference
    * parquet > .tbl > .det/.txt (first format found wins per name). */
  def loadTables(spark: org.apache.spark.sql.SparkSession, dir: String)
      : Map[String, org.apache.spark.sql.DataFrame] = {
    import scala.jdk.CollectionConverters._
    val files = Files.list(Paths.get(dir)).iterator().asScala.map(_.getFileName.toString).toSeq
    def has(n: String) = files.contains(n)
    val names = files.collect {
      case f if f.endsWith(".parquet") => f.stripSuffix(".parquet")
      case f if f.endsWith(".tbl")     => f.stripSuffix(".tbl")
      case f if f.endsWith(".det")     => f.stripSuffix(".det")
    }.distinct
    names.flatMap { name =>
      val df =
        if (has(s"$name.parquet"))
          // Tables.load knows quirks of the standard tables (e.g. events'
          // nanosecond timestamps); skip files Spark cannot read at all.
          scala.util.Try(graft.Tables.load(spark, dir, name)).toOption
        else if (has(s"$name.tbl")) {
          val schemaPath =
            if (has(s"$name.md")) Left(s"$dir/$name.md") else Right(s"$dir/$name.det")
          scala.util.Try(schemaPath match {
            case Left(md) =>
              val st = graft.sources.TblSource.readMdSchema(md)
              val rows = graft.sources.TblSource.readRows(s"$dir/$name.tbl")
                .map(org.apache.spark.sql.Row.fromSeq)
              spark.createDataFrame(spark.sparkContext.parallelize(rows), st)
            case Right(det) =>
              graft.sources.TblSource.readTbl(spark, det, s"$dir/$name.tbl")
          }).toOption
        } else if (has(s"$name.txt"))
          scala.util.Try(spark.read.format("graft.sources.DetDataSource")
            .load(s"$dir/$name")).toOption
        else None
      df.map(name -> _)
    }.toMap
  }
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

    val tables = loadTables(spark, tableDir)

    val sql = Files.readString(Paths.get(queryFile))
    val df = Translator.run(spark, sql, tables)
    println(df.columns.mkString("\t"))
    df.limit(limit).collect().foreach { row =>
      println(row.toSeq.map(v => if (v == null) "-NULL-" else v.toString).mkString("\t"))
    }
    spark.stop()
  }
}
