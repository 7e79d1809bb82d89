package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.catalog.{CatalogColumnStat, CatalogStatistics}

/** Bridge to the `private[sql]` session catalog for injecting table-level
  * statistics that were computed OUTSIDE Spark — the engine's analogue of
  * the reference reading `<table>.stat` files into its cost model
  * (reference src/qp/optimizer/PlanCost.java:219-263). `ANALYZE TABLE`
  * recomputes stats by scanning; this shim instead trusts the numbers a
  * reference data directory already ships, exactly as the reference does.
  */
object CatalogBridge {

  /** Set rowCount / sizeInBytes / per-column NDV on a catalog table.
    * sizeInBytes is BigInt end-to-end: tuple counts come from EXTERNAL
    * `.stat` files, and a Long product would overflow negative above
    * ~1e17 rows x row width — which the CBO would read as a tiny,
    * broadcastable table. */
  def setTableStats(spark: org.apache.spark.sql.SparkSession, table: String,
      rowCount: Long, sizeInBytes: BigInt, ndv: Map[String, Long],
      database: Option[String] = None): Unit = {
    val colStats = ndv.map { case (c, n) =>
      c -> CatalogColumnStat(distinctCount = Some(BigInt(n)))
    }
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.catalog.alterTableStats(
        TableIdentifier(table, database),
        Some(CatalogStatistics(sizeInBytes, Some(BigInt(rowCount)), colStats)))
  }
}
