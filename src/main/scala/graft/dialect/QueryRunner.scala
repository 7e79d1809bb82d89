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
      // A reference data directory may ship `<name>.stat` (numtuples +
      // per-column NDVs, PlanCost.java:219-263). Register the table in the
      // session catalog and inject those stats so Catalyst's CBO costs
      // join orders from them — the reference's optimizer does the same.
      // Registration goes into a PER-DIRECTORY database (`statDb`) and all
      // resolution is database-qualified: a same-named temp view in the
      // session cannot shadow the stats-bearing table, and loading two
      // data directories in one session keeps both sets of registrations.
      // Parquet sources register as EXTERNAL tables over the existing
      // files (no data copy — the reference, likewise, only reads two
      // lines of text); other formats materialize once, as does any
      // table whose load path rewrites the data relative to the raw
      // file (Tables.rewritesOnLoad — events' ns->us timestamps). A
      // malformed .stat degrades to no stats, LOUDLY — silent
      // degradation would un-do the feature's point.
      df.map { d =>
        val withStats =
          if (!has(s"$name.stat")) d
          else scala.util.Try {
            val db = statDb(dir)
            spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db`")
            if (has(s"$name.parquet") && !graft.Tables.rewritesOnLoad(spark, dir, name)) {
              spark.sql(s"DROP TABLE IF EXISTS `$db`.`$name`")
              spark.catalog.createTable(s"`$db`.`$name`", s"$dir/$name.parquet", "parquet")
            } else graft.sources.Stats.saveAsCatalogTable(spark, name, d, Some(db))
            graft.sources.Stats.injectStatFile(spark, name, s"$dir/$name.stat", Some(db))
            spark.table(s"`$db`.`$name`")
          }.recover { case e =>
            System.err.println(s"[QueryRunner] WARNING: $name.stat ignored: $e")
            d
          }.get
        name -> withStats
      }
    }.toMap
  }

  /** Catalog database holding a data directory's stats-bearing tables —
    * one per canonical directory path, so concurrent/sequential loads of
    * different directories never clobber each other's registrations. */
  private[graft] def statDb(dir: String): String = {
    val canon = Paths.get(dir).toAbsolutePath.normalize.toString
    // collision-resistant digest, not String.hashCode: two directories
    // sharing a 31-bit hash would silently share a database and clobber
    // each other's same-named registrations
    val sha = java.security.MessageDigest.getInstance("SHA-256")
      .digest(canon.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    s"graft_stats_${sha.take(6).map(b => f"$b%02x").mkString}"
  }
  /** Two invocation shapes:
    *   - `QueryRunner <tableDir> <queryFile> [limit]` — native shape,
    *     prints to stdout (first arg is a directory);
    *   - `QueryRunner <queryfile> <resultfile> [pagesize] [numbuffer]` —
    *     the reference's exact `QueryMain` shape (QueryMain.java:26-40):
    *     tables are discovered next to the query file, the result is
    *     written to `resultfile` in the reference's format (two-space
    *     header, tab-terminated values, `-NULL-`), and the trailing
    *     pagesize/numbuffer knobs are accepted and ignored — Spark's
    *     unified memory manager replaces the reference's fixed Batch page
    *     size and buffer pool, so the knobs have no analogue here.
    */
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, args) finally spark.stop()
  }

  /** Argument handling + execution, session-independent (spec-testable). */
  def run(spark: SparkSession, args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: QueryRunner <tableDir> <queryFile> [limit] | <queryfile> <resultfile> [pagesize] [numbuffer]")
    // shape detection must not guess on a typo: a first argument that
    // exists as a directory is the native shape, one that exists as a
    // file is the reference QueryMain shape, anything else is an error
    // (NOT a fall-through to ref-shape with the parent dir as tables)
    val p0 = Paths.get(args(0))
    require(Files.exists(p0), s"${args(0)} does not exist (expected a table directory or a query file)")
    val refShape = !Files.isDirectory(p0)
    val (tableDir, queryFile) =
      if (refShape) (p0.toAbsolutePath.getParent.toString, args(0))
      else (args(0), args(1))
    // native shape keeps its bounded default (50 rows); the reference
    // shape writes the complete result like QueryMain does
    val limit = if (refShape) Int.MaxValue
      else if (args.length > 2) args(2).toInt else 50

    val tables = loadTables(spark, tableDir)

    val sql = Files.readString(Paths.get(queryFile))
    val df = Translator.run(spark, sql, tables)
    if (refShape) {
      val out = new java.io.PrintWriter(args(1))
      try { writeReferenceFormat(out, df) } finally {
        out.close()
        // PrintWriter swallows IO errors; a truncated result file with
        // exit code 0 would read as a wrong answer downstream
        require(!out.checkError(), s"I/O error writing ${args(1)}")
      }
    } else {
      println(df.columns.mkString("\t"))
      df.limit(limit).collect().foreach { row =>
        println(row.toSeq.map(v => if (v == null) "-NULL-" else v.toString).mkString("\t"))
      }
    }
  }

  /** The reference's result-file format (QueryMain.java printSchema /
    * printTuple, :276-306): header of column names each followed by two
    * spaces, then one row per tuple with each value followed by a tab and
    * nulls rendered `-NULL-`. Rows stream through `toLocalIterator` (one
    * partition on the driver at a time), so driver memory bounds the
    * largest PARTITION, not the whole result — the reference shape writes
    * complete results with no limit. toLocalIterator runs one job per
    * partition; that assumes the plan is deterministic across those jobs
    * (true for every dialect query — pure reads over static files). */
  def writeReferenceFormat(out: java.io.PrintWriter, df: org.apache.spark.sql.DataFrame): Unit = {
    out.println(df.columns.map(_ + "  ").mkString)
    df.toLocalIterator().asScala.foreach { row =>
      out.println(row.toSeq.map(v => (if (v == null) "-NULL-" else v.toString) + "\t").mkString)
    }
  }
}
