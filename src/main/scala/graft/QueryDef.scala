package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query in the engine's inventory.
  *
  * @param name    stable key, used by the driver's correctness gate
  * @param build   (session, sfDir) => result DataFrame. Results must be
  *                deterministic: every query ends in a total ordering so the
  *                DuckDB-oracle hash compare is order-insensitive by
  *                construction.
  * @param oracle  equivalent ANSI SQL for DuckDB over the same parquet tables
  *                (None for ops not expressible in portable SQL — the driver
  *                then records a weaker rows-only check).
  * @param headline flagship-query marker: Bench runs EVERY registered
  *                query (so round-over-round totals stay comparable) and
  *                additionally reports the headline subset as
  *                `headline_total`.
  */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)
