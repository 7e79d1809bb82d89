package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import org.apache.spark.sql.expressions.Window

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

    // ---- EXACT median: the order-statistics companion to q34 -------------
    // Distributed exact median without a global sort: rank within each
    // group (one shuffle on the group key), pick the middle row(s) by
    // integer arithmetic — rn = (n+1) div 2 and (n+2) div 2 coincide for
    // odd n — and average them. All-integer selection + one final double
    // division keeps both engines bit-identical, unlike interpolated
    // percentile implementations whose arithmetic differs across engines.
    QueryDef("q64_exact_median", (s, d) => {
      val w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
      t(s, d, "documents")
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("lang")))
        .filter(col("rn") === expr("(n+1) div 2") || col("rn") === expr("(n+2) div 2"))
        .groupBy("lang")
        .agg(max("n").as("n_docs"),
          (sum("n_chars").cast("double") / count(lit(1))).as("median_chars"))
        .orderBy("lang")
    },
      Some("""WITH r AS (
             |  SELECT lang, n_chars,
             |    row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
             |    count(*) OVER (PARTITION BY lang) AS n
             |  FROM documents)
             |SELECT lang, CAST(max(n) AS BIGINT) AS n_docs,
             |  CAST(sum(n_chars) AS DOUBLE) / count(*) AS median_chars
             |FROM r WHERE rn = (n+1)//2 OR rn = (n+2)//2
             |GROUP BY lang ORDER BY lang""".stripMargin)),
  )
}
