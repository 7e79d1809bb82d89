package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All queries live in `graft.queries.*` as [[QueryDef]] registries; this
  * object just assembles the maps the driver consumes.
  */
object SparkEntry {

  /** Every implemented query, keyed by stable name. */
  val registry: Seq[QueryDef] =
    graft.queries.Relational.defs ++
      graft.queries.Events.defs ++
      graft.queries.Text.defs ++
      graft.queries.Dedup.defs ++
      graft.queries.Similarity.defs ++
      graft.queries.Multimodal.defs ++
      graft.queries.Sketches.defs ++
      graft.queries.Sampling.defs ++
      graft.queries.Curation.defs ++
      graft.queries.Layout.defs ++
      graft.queries.Quality.defs ++
      graft.queries.Preference.defs ++
      graft.queries.Conversation.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    registry.find(_.name == "q07_starjoin_region").get
      .build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Flagship queries: Bench runs every registered query but reports this
    * subset as a separate `headline_total`. */
  def headline: Seq[String] = registry.filter(_.headline).map(_.name)
}
