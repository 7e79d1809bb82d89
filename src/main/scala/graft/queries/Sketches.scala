package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Sketch-based approximate aggregation — the operators that replace exact
  * shuffles at 100 TB, where exact COUNT(DISTINCT) over billions of keys is
  * a full re-shuffle but an HLL++ sketch is a few KB per group and merges
  * associatively in the partial-aggregate step.
  *
  * Sketch internals are Spark-specific (deterministic for fixed input, but
  * not bit-matchable against DuckDB's implementations) -> rows-only checks;
  * SketchesSpec bounds their error against the exact answers.
  */
object Sketches {
  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  val defs: Seq[QueryDef] = Seq(

    // ---- HyperLogLog++ distinct counting ---------------------------------
    QueryDef("q33_approx_distinct", (s, d) =>
      t(s, d, "events")
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id"), 0.01).as("approx_users"),
          count(lit(1)).as("n"))
        .orderBy("event_type"),
      None),

    // ---- Approximate quantiles (GK sketch) -------------------------------
    QueryDef("q34_approx_quantiles", (s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(percentile_approx(col("l_extendedprice"),
          array(lit(0.5), lit(0.95), lit(0.99)), lit(10000)).as("price_q"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"),
          col("price_q")(0).as("p50"), col("price_q")(1).as("p95"),
          col("price_q")(2).as("p99"), col("n"))
        .orderBy("l_returnflag"),
      None),
  )
}
