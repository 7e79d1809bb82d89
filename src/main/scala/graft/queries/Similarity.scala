package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * Cosine arithmetic is made engine-exact by quantizing each component to
  * an integer grid (floor(x*1e7 + 0.5) — pure IEEE binary ops, no
  * decimal-string rounding), computing dot products / norms in exact
  * 64-bit integers, and dividing once in double at the end. Identical
  * inputs therefore produce bit-identical cosines in Spark and DuckDB.
  *
  * Scale design: brute-force top-k broadcasts the (small) query set and
  * computes map-side — one narrow shuffle of k rows per query for the
  * final ranking. The IVF variant is the 100 TB path: partition the
  * corpus by nearest centroid (one shuffle), probe only nprobe cells per
  * query.
  */
object Similarity {
  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  /** Quantized vector: ARRAY<BIGINT> on a 1e-7 grid. */
  private def quant(c: Column): Column =
    transform(c.cast("array<double>"), x => floor(x * lit(1e7) + lit(0.5)).cast("long"))

  /** Exact integer dot product — native codegen'd expression; the
    * zip_with/aggregate lambda equivalent evaluates interpreted and was
    * 20x slower on the pairwise join. */
  private def dot(a: Column, b: Column): Column =
    graft.functions.ArrayExprs.dotq(a, b)

  /** embeddings with quantized vector + exact squared norm. */
  private def quantized(s: SparkSession, d: String): DataFrame =
    t(s, d, "embeddings")
      .select(col("vec_id"), quant(col("embedding")).as("qv"))
      .withColumn("n2", dot(col("qv"), col("qv")))

  private def cosine(qa: Column, na: Column, qb: Column, nb: Column): Column =
    dot(qa, qb).cast("double") / sqrt(na.cast("double")) / sqrt(nb.cast("double"))

  // DuckDB mirror of quant/dot/cosine (64 dims, index-based).
  private val sqlQuant =
    "list_transform(CAST(embedding AS DOUBLE[]), x -> CAST(floor(x * 10000000 + 0.5) AS BIGINT))"
  private def sqlDot(a: String, b: String) =
    s"CAST(list_sum(list_transform(range(1, 65), i -> $a[i] * $b[i])) AS BIGINT)"

  val defs: Seq[QueryDef] = Seq(

    // ---- Near-duplicate pairs by cosine threshold ------------------------
    QueryDef("q47_embed_near_pairs", (s, d) => {
      val e = quantized(s, d)
      val a = e.select(col("vec_id").as("vec_a"), col("qv").as("qa"), col("n2").as("na"))
      val b = e.select(col("vec_id").as("vec_b"), col("qv").as("qb"), col("n2").as("nb"))
      a.join(b, col("vec_a") < col("vec_b"))
        .withColumn("cos_sim", cosine(col("qa"), col("na"), col("qb"), col("nb")))
        .filter(col("cos_sim") >= 0.45)
        .select("vec_a", "vec_b", "cos_sim")
        .orderBy("vec_a", "vec_b")
    },
      Some(s"""WITH q AS (
             |  SELECT vec_id, $sqlQuant AS qv FROM embeddings),
             |n AS (
             |  SELECT vec_id, qv, ${sqlDot("qv", "qv")} AS n2 FROM q)
             |SELECT vec_a, vec_b, cos_sim FROM (
             |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             |    CAST(${sqlDot("a.qv", "b.qv")} AS DOUBLE)
             |      / sqrt(CAST(a.n2 AS DOUBLE)) / sqrt(CAST(b.n2 AS DOUBLE)) AS cos_sim
             |  FROM n a JOIN n b ON a.vec_id < b.vec_id)
             |WHERE cos_sim >= 0.45 ORDER BY vec_a, vec_b""".stripMargin)),

    // ---- Brute-force cosine top-k (the exact ANN baseline) ---------------
    QueryDef("q48_knn_brute", (s, d) => {
      val e = quantized(s, d)
      val queries = e.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("q_id"), col("qv").as("qa"), col("n2").as("na"))
      val corpus = e.select(col("vec_id").as("n_id"), col("qv").as("qb"), col("n2").as("nb"))
      val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("n_id"))
      broadcast(queries).join(corpus, col("q_id") =!= col("n_id"))
        .withColumn("cos_sim", cosine(col("qa"), col("na"), col("qb"), col("nb")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .select("q_id", "rank", "n_id", "cos_sim")
        .orderBy("q_id", "rank")
    },
      Some(s"""WITH q AS (
             |  SELECT vec_id, $sqlQuant AS qv FROM embeddings),
             |n AS (
             |  SELECT vec_id, qv, ${sqlDot("qv", "qv")} AS n2 FROM q),
             |scored AS (
             |  SELECT a.vec_id AS q_id, b.vec_id AS n_id,
             |    CAST(${sqlDot("a.qv", "b.qv")} AS DOUBLE)
             |      / sqrt(CAST(a.n2 AS DOUBLE)) / sqrt(CAST(b.n2 AS DOUBLE)) AS cos_sim
             |  FROM n a JOIN n b ON a.vec_id != b.vec_id
             |  WHERE a.vec_id % 100 = 0),
             |ranked AS (
             |  SELECT q_id, n_id, cos_sim,
             |    row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, n_id) AS rank
             |  FROM scored)
             |SELECT q_id, CAST(rank AS INTEGER) AS rank, n_id, cos_sim
             |FROM ranked WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin),
      headline = true),

    // ---- Brute-force top-k via a bounded typed aggregator ----------------
    // Same result as q48 but ranked by graft.functions.TopKAgg instead of a
    // window: each map task pre-reduces its partition to k candidates per
    // query before the shuffle (partial aggregation), so the exchange
    // carries O(queries x tasks x k) rows — the scale path when the scored
    // join output is too large to sort per group. Oracle: identical SQL to
    // a window ranking.
    QueryDef("q50_knn_topk_agg", (s, d) => {
      val spark = s
      import spark.implicits._
      val e = quantized(s, d)
      val queries = e.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("q_id"), col("qv").as("qa"), col("n2").as("na"))
      val corpus = e.select(col("vec_id").as("n_id"), col("qv").as("qb"), col("n2").as("nb"))
      val scored = broadcast(queries).join(corpus, col("q_id") =!= col("n_id"))
        .select(col("q_id"),
          cosine(col("qa"), col("na"), col("qb"), col("nb")).as("cos_sim"), col("n_id"))
        .as[(Long, Double, Long)]
      val topk = new graft.functions.TopKAgg(10).toColumn
      scored
        .groupByKey(_._1)
        .mapValues(r => (r._2, r._3))
        .agg(topk.name("top"))
        .toDF("q_id", "top")
        .select(col("q_id"), posexplode(col("top")).as(Seq("r0", "t")))
        .select(col("q_id"), (col("r0") + 1).cast("int").as("rank"),
          col("t._2").as("n_id"), col("t._1").as("cos_sim"))
        .orderBy("q_id", "rank")
    },
      Some(s"""WITH q AS (
             |  SELECT vec_id, $sqlQuant AS qv FROM embeddings),
             |n AS (
             |  SELECT vec_id, qv, ${sqlDot("qv", "qv")} AS n2 FROM q),
             |scored AS (
             |  SELECT a.vec_id AS q_id, b.vec_id AS n_id,
             |    CAST(${sqlDot("a.qv", "b.qv")} AS DOUBLE)
             |      / sqrt(CAST(a.n2 AS DOUBLE)) / sqrt(CAST(b.n2 AS DOUBLE)) AS cos_sim
             |  FROM n a JOIN n b ON a.vec_id != b.vec_id
             |  WHERE a.vec_id % 100 = 0),
             |ranked AS (
             |  SELECT q_id, n_id, cos_sim,
             |    row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, n_id) AS rank
             |  FROM scored)
             |SELECT q_id, CAST(rank AS INTEGER) AS rank, n_id, cos_sim
             |FROM ranked WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin)),

    // ---- IVF (inverted-file) approximate top-k: the 100 TB scale path ----
    // "Training" is deterministic: every 64th vector is a centroid; vectors
    // are assigned to their nearest centroid (coarse quantization); queries
    // probe the nprobe=8 nearest cells only. Approximate by construction ->
    // no SQL oracle (rows-only check); SimilaritySpec measures recall
    // against q48's exact result.
    QueryDef("q49_knn_ivf", (s, d) => {
      val e = quantized(s, d)
      val cents = e.filter(col("vec_id") % 64 === 0)
        .select(col("vec_id").as("c_id"), col("qv").as("cv"), col("n2").as("cn"))
      // assign every vector to its nearest centroid: argmax via max_by over
      // a (cos, -id) struct — partially aggregable, so the shuffle carries
      // one row per vector, not one per (vector, centroid)
      val assigned = e.crossJoin(broadcast(cents))
        .withColumn("c_cos", cosine(col("qv"), col("n2"), col("cv"), col("cn")))
        .groupBy("vec_id")
        .agg(max_by(col("c_id"), struct(col("c_cos"), (-col("c_id")).as("t"))).as("cell"))
        .join(e, "vec_id")
        .select(col("vec_id").as("n_id"), col("qv").as("qb"), col("n2").as("nb"), col("cell"))
      // queries probe their nprobe nearest cells
      val nprobe = 8
      val wProbe = Window.partitionBy("q_id").orderBy(col("c_cos").desc, col("c_id"))
      val probes = e.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("q_id"), col("qv").as("qa"), col("n2").as("na"))
        .crossJoin(broadcast(cents))
        .withColumn("c_cos", cosine(col("qa"), col("na"), col("cv"), col("cn")))
        .withColumn("crn", row_number().over(wProbe))
        .filter(col("crn") <= nprobe)
        .select(col("q_id"), col("qa"), col("na"), col("c_id").as("cell"))
      val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("n_id"))
      probes.join(assigned, "cell")
        .filter(col("q_id") =!= col("n_id"))
        .withColumn("cos_sim", cosine(col("qa"), col("na"), col("qb"), col("nb")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .select("q_id", "rank", "n_id", "cos_sim")
        .orderBy("q_id", "rank")
    },
      None),
  )
}
