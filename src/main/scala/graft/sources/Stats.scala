package graft.sources

import org.apache.spark.sql.SparkSession

/** Cost-based-optimizer statistics bootstrapping — the Spark equivalent of
  * the reference's `.stat` files (row count + per-column distinct counts,
  * reference src/qp/optimizer/PlanCost.java:219-263).
  *
  * Registers the testdata as catalog tables, computes row counts and
  * per-column NDV/min/max via `ANALYZE TABLE ... FOR ALL COLUMNS`, and
  * flips the CBO + join-reorder flags, so Catalyst costs join orders from
  * the same V(A) statistics the reference's PlanCost used (instead of
  * relying purely on AQE's runtime sizes).
  */
object Stats {

  def analyze(spark: SparkSession, sfDir: String,
      tables: Seq[String] = Seq("region", "nation", "customer", "supplier",
        "part", "orders", "lineitem")): Unit = {
    tables.foreach { t =>
      saveAsCatalogTable(spark, s"${t}_s", graft.Tables.load(spark, sfDir, t))
      spark.sql(s"ANALYZE TABLE ${t}_s COMPUTE STATISTICS FOR ALL COLUMNS")
    }
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
  }

  /** Overwrite-register `df` as catalog table `name` (optionally inside
    * `database`, created if absent). The in-memory catalog resets per JVM
    * but the warehouse directory persists — saveAsTable refuses an
    * orphaned location, so clear it first. */
  def saveAsCatalogTable(spark: SparkSession, name: String,
      df: org.apache.spark.sql.DataFrame,
      database: Option[String] = None): Unit = {
    database.foreach(db => spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db`"))
    val db = database.getOrElse(spark.catalog.currentDatabase)
    val qualified = database.map(d => s"`$d`.`$name`").getOrElse(s"`$name`")
    spark.sql(s"DROP TABLE IF EXISTS $qualified")
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
      (if (db == "default") "" else s"$db.db/") + name.toLowerCase)
    if (loc.exists()) {
      import scala.reflect.io.Directory
      new Directory(loc).deleteRecursively()
    }
    df.write.mode("overwrite").format("parquet").saveAsTable(qualified)
  }

  /** Catalog statistics for an analyzed table (rowCount, per-column NDV). */
  def describe(spark: SparkSession, table: String): Map[String, String] =
    spark.sql(s"DESCRIBE TABLE EXTENDED $table")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  /** Parse a reference `<table>.stat` file. Format (reference
    * src/qp/optimizer/PlanCost.java:219-263): line 1 is the tuple count,
    * line 2 is one distinct-value count per schema column, in column order,
    * whitespace-separated. Returns (numtuples, per-column NDVs). */
  def readStat(path: String): (Long, Seq[Long]) = {
    val lines = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(path))
    require(lines.size >= 2, s"stat file $path needs 2 lines, got ${lines.size}")
    val head = lines.get(0).trim.split("\\s+")
    require(head.length == 1, s"stat file $path line 1 must be a single tuple count")
    (head(0).toLong, lines.get(1).trim.split("\\s+").toSeq.map(_.toLong))
  }

  /** Inject `.stat`-derived statistics into the session catalog for `table`
    * (which must already be a catalog table, optionally inside `database`)
    * and enable CBO, so Catalyst costs plans from the same
    * externally-supplied V(A) numbers the reference's PlanCost read — no
    * scan needed. sizeInBytes is estimated as numtuples x the schema's
    * default row width, mirroring the reference's
    * pages = numtuples / (pagesize / tuplesize) arithmetic; the product is
    * BigInt because the tuple count is EXTERNAL input and a Long overflow
    * would flip a huge table into a broadcastable one. Resolution is
    * database-qualified when `database` is given, so a same-named TEMP VIEW
    * cannot shadow the stats-bearing table. */
  def injectStatFile(spark: SparkSession, table: String, statPath: String,
      database: Option[String] = None): Unit = {
    val (numTuples, ndvs) = readStat(statPath)
    val qualified = database.map(d => s"`$d`.`$table`").getOrElse(s"`$table`")
    val schema = spark.table(qualified).schema
    require(ndvs.size == schema.size,
      s"stat file $statPath has ${ndvs.size} NDVs for ${schema.size} columns")
    val rowWidth = schema.fields.map(_.dataType.defaultSize).sum.max(1)
    org.apache.spark.sql.graft.CatalogBridge.setTableStats(
      spark, table, numTuples, BigInt(numTuples) * rowWidth,
      schema.fieldNames.zip(ndvs).toMap, database)
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
  }
}
