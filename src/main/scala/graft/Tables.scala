package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register every table as a temp view so `spark.sql` / the dialect
    * frontend can resolve unqualified table names. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
