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
      spark.sql(s"DROP TABLE IF EXISTS ${t}_s")
      // The in-memory catalog resets per JVM but the warehouse directory
      // persists — saveAsTable refuses an orphaned location, so clear it.
      val db = spark.catalog.currentDatabase
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
        (if (db == "default") "" else s"$db.db/") + s"${t}_s")
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
      graft.Tables.load(spark, sfDir, t)
        .write.mode("overwrite").format("parquet").saveAsTable(s"${t}_s")
      spark.sql(s"ANALYZE TABLE ${t}_s COMPUTE STATISTICS FOR ALL COLUMNS")
    }
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
  }

  /** Catalog statistics for an analyzed table (rowCount, per-column NDV). */
  def describe(spark: SparkSession, table: String): Map[String, String] =
    spark.sql(s"DESCRIBE TABLE EXTENDED $table")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
}
