package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}

/** Parquet table loaders for the driver's testdata layout
  * (`<sfDir>/<table>.parquet`, see TESTDATA.md).
  *
  * The reference engine loads a serialized `Schema` from a `<table>.md`
  * catalog file at plan time (reference: src/qp/optimizer/RandomInitialPlan.java:79-92);
  * parquet is self-describing so the "catalog" is just the file footer.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** True when [[load]] REWRITES the data relative to a raw parquet scan
    * (so a catalog table registered over the raw file would silently read
    * different values). Owned here, next to the quirk list, so the two
    * can never drift: any new quirk case in [[load]] must flip this too. */
  def rewritesOnLoad(name: String): Boolean = name == "events"

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = name match {
    case "events" =>
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
      // rejects outright. Read the physical int64 nanos and truncate to
      // microseconds — the same ns→µs truncation DuckDB applies on
      // CAST(ts AS TIMESTAMP), so oracle comparisons stay exact.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/events.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case _ =>
      spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Register every table as a temp view so `spark.sql` / the dialect
    * frontend can resolve unqualified table names. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
