package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** End-to-end corpus curation — the pass an LLM training-data pipeline
  * runs before tokenization, composed from the engine's own operators as
  * ONE declarative plan (this is the point: gates, dedup, and split
  * assignment fuse into a single Catalyst-optimized DAG instead of N
  * materialized passes over 100 TB):
  *
  *   1. quality gates    — length + stopword evidence (q41's gate),
  *                         within-doc repetition (q66's gate), map-side;
  *   2. near-dup dedup   — MinHash-LSH verified pairs, drop the larger id
  *                         (q51's greedy keep policy);
  *   3. split assignment — rerun-invariant Lehmer-hash bucketing (q56).
  *
  * Only the dedup step shuffles at all: every gate is a native map-side
  * expression riding the scan, and the split is pure arithmetic on the id.
  */
object Curation {
  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  /** The full curation gate over a `text` column — length + stopword
    * evidence, duplicate-2-gram fraction, top-token ratio. THE single
    * definition: the batch pipeline (q68) and the streaming twin
    * ([[graft.streaming.Streams.curatedIngest]]) must never drift. */
  def gatesOk: org.apache.spark.sql.Column = {
    val toks = split(col("text"), " ")
    val nTok = size(toks)
    val nStop = size(filter(toks, x => x === "the" || x === "a"))
    val d2 = size(graft.functions.ArrayExprs.shingles(toks, 2))
    val dup2 = (nTok - 1 - d2).cast("double") / (nTok - 1)
    val ratio = graft.functions.ArrayExprs.topTokenCount(toks).cast("double") / nTok
    nTok >= 20 && nStop > 0 && dup2 <= 0.05 && ratio <= 0.12
  }

  val defs: Seq[QueryDef] = Seq(

    QueryDef("q68_curation_pipeline", (s, d) => {
      val docs = t(s, d, "documents")
      val base = docs.select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).as("n_tokens"), gatesOk.as("gates_ok"))
      val drop = Dedup.nearDupPairsOf(docs)
        .select(col("doc_b").as("doc_id")).distinct()
      val bucket = Sampling.lehmer(col("doc_id")) % 1000
      base.filter(col("gates_ok"))
        .join(drop, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("lang"), col("n_tokens"),
          when(bucket < 800, "train").when(bucket < 900, "val")
            .otherwise("test").as("split"))
        .orderBy("doc_id")
    },
      Some(s"""WITH s AS (${Dedup.sqlShingles}),
             |drops AS (
             |  SELECT DISTINCT b.doc_id
             |  FROM s a JOIN s b ON a.doc_id < b.doc_id
             |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             |      / len(list_distinct(list_cat(a.sh, b.sh))) >= 0.8),
             |m AS (
             |  SELECT doc_id, lang,
             |    len(string_split(text, ' ')) AS n,
             |    len(list_filter(string_split(text, ' '), x -> x = 'the' OR x = 'a')) AS nstop,
             |    len(list_distinct(list_transform(range(1, len(string_split(text, ' '))),
             |      i -> array_to_string(string_split(text, ' ')[i:i+1], ' ')))) AS d2
             |  FROM documents),
             |mx AS (
             |  SELECT doc_id, max(c) AS mx FROM (
             |    SELECT doc_id, tok, count(*) AS c
             |    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
             |    GROUP BY doc_id, tok) GROUP BY doc_id)
             |SELECT m.doc_id, lang, n AS n_tokens,
             |  CASE WHEN ${Sampling.sqlLehmerOf("m.doc_id")} % 1000 < 800 THEN 'train'
             |       WHEN ${Sampling.sqlLehmerOf("m.doc_id")} % 1000 < 900 THEN 'val'
             |       ELSE 'test' END AS split
             |FROM m JOIN mx ON m.doc_id = mx.doc_id
             |WHERE n >= 20 AND nstop > 0
             |  AND CAST(n - 1 - d2 AS DOUBLE) / (n - 1) <= 0.05
             |  AND CAST(mx AS DOUBLE) / n <= 0.12
             |  AND m.doc_id NOT IN (SELECT doc_id FROM drops)
             |ORDER BY m.doc_id""".stripMargin)),
  )
}
