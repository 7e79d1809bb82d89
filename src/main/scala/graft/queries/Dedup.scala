package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Deduplication operators for an LLM training-data pipeline: exact,
  * MinHash+LSH near-dup, and SimHash near-dup.
  *
  * Scale design (the point of these shapes at 100 TB):
  *   - exact dedup = one hash-shuffle on a 128-bit content hash;
  *   - MinHash LSH = per-doc signature (map-only, codegen'd array exprs),
  *     band explosion, shuffle on (band, hash) buckets, candidate pairs
  *     verified by exact Jaccard — never an O(n^2) cross join;
  *   - SimHash = 64-bit signature, 4x16-bit block index (any pair within
  *     Hamming distance 3 shares at least one intact block by pigeonhole),
  *     bucket join + popcount(xor) verify.
  */
object Dedup {
  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  /** 3-token shingles (distinct), the near-dup unit: word order matters,
    * unlike token sets, so boilerplate-heavy corpora don't saturate.
    * Native expression — the transform/concat_ws lambda pipeline evaluates
    * interpreted and dominated the query. */
  private def shingleCol: Column =
    graft.functions.ArrayExprs.shingles(split(col("text"), " "), 3)

  private val NumHashes = 32
  private val NumBands = 8 // 4 rows/band: s-curve threshold ~ (1/8)^(1/4) = 0.59

  /** doc_id + distinct shingle set. */
  private def docShingles(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents").select(col("doc_id"), shingleCol.as("sh"))

  /** MinHash signature via the native [[graft.functions.MinHashSig]]
    * expression: one pass over the shingles, k seeded mixes per shingle —
    * the "k independent permutations" construction without materializing
    * permutations, and without k interpreted array traversals. */
  private def signature: Column =
    graft.functions.ArrayExprs.minhashSig(col("sh"), NumHashes)

  /** LSH candidate pairs: docs sharing at least one (band, band-hash). */
  private def lshCandidates(withSig: DataFrame): DataFrame = {
    val bands = array((0 until NumBands).map(b =>
      xxhash64((lit(b) +: (1 to 4).map(r => element_at(col("sig"), b * 4 + r))): _*)): _*)
    val exploded = withSig.select(col("doc_id"), posexplode(bands).as(Seq("band", "bh")))
    val x = exploded.select(col("doc_id").as("doc_a"), col("band"), col("bh"))
    val y = exploded.select(col("doc_id").as("doc_b"), col("band").as("band2"), col("bh").as("bh2"))
    x.join(y, col("band") === col("band2") && col("bh") === col("bh2") &&
        col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- Exact dedup: group on a 128-bit content hash --------------------
    QueryDef("q44_dedup_exact", (s, d) =>
      t(s, d, "documents")
        .groupBy(md5(col("text")).as("content_hash"))
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy("keep_id"),
      Some("""SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
             |  count(*) AS n_copies
             |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin)),

    // ---- MinHash + LSH near-dup pipeline, verified by exact Jaccard ------
    // Oracle = brute-force O(n^2) exact Jaccard in DuckDB: at threshold 0.8
    // the 32-hash/8-band s-curve has a miss probability < 1e-8 for the
    // planted ~0.98-Jaccard pairs, so LSH+verify equals brute force.
    QueryDef("q45_minhash_lsh", (s, d) => {
      val docs = docShingles(s, d)
      val cand = lshCandidates(docs.select(col("doc_id"), signature.as("sig")))
      val a = docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
      val b = docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
      cand.join(a, "doc_a").join(b, "doc_b")
        .withColumn("jaccard",
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            size(array_union(col("sh_a"), col("sh_b"))))
        .filter(col("jaccard") >= 0.8)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    },
      Some("""WITH s AS (
             |  SELECT doc_id,
             |    list_distinct(list_transform(range(1, len(string_split(text, ' ')) - 1),
             |      i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS sh
             |  FROM documents)
             |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             |    / len(list_distinct(list_cat(a.sh, b.sh))) AS jaccard
             |FROM s a JOIN s b ON a.doc_id < b.doc_id
             |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             |    / len(list_distinct(list_cat(a.sh, b.sh))) >= 0.8
             |ORDER BY doc_a, doc_b""".stripMargin),
      headline = true),

    // ---- Materialize the deduplicated corpus -----------------------------
    // Greedy LSH dedup: drop every doc that appears as the larger id of a
    // near-dup pair (keeps the smallest id per duplicate relation — the
    // standard one-pass policy; full transitive closure needs iterative
    // connected components). Anti-join against the verified pair set.
    QueryDef("q51_dedup_keep", (s, d) => {
      val docs = docShingles(s, d)
      val cand = lshCandidates(docs.select(col("doc_id"), signature.as("sig")))
      val a = docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
      val b = docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
      val drop = cand.join(a, "doc_a").join(b, "doc_b")
        .filter(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))) >= 0.8)
        .select(col("doc_b").as("doc_id")).distinct()
      t(s, d, "documents")
        .join(drop, Seq("doc_id"), "left_anti")
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    },
      Some("""WITH s AS (
             |  SELECT doc_id,
             |    list_distinct(list_transform(range(1, len(string_split(text, ' ')) - 1),
             |      i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS sh
             |  FROM documents),
             |drops AS (
             |  SELECT DISTINCT b.doc_id
             |  FROM s a JOIN s b ON a.doc_id < b.doc_id
             |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             |      / len(list_distinct(list_cat(a.sh, b.sh))) >= 0.8)
             |SELECT doc_id, lang, n_chars FROM documents
             |WHERE doc_id NOT IN (SELECT doc_id FROM drops)
             |ORDER BY doc_id""".stripMargin)),

    // ---- Transitive dedup clusters: connected components -----------------
    // Near-dup is not transitive; proper canonical selection needs the
    // component, not the pair. Min-label propagation over the verified
    // pair edges: each round every node takes the min label among itself
    // and its neighbors, with localCheckpoint() per round to truncate
    // lineage (iterative DataFrame jobs otherwise re-execute the whole
    // history each round). Converges in O(component diameter) rounds.
    // Oracle: DuckDB recursive-CTE reachability closure.
    QueryDef("q52_dedup_components", (s, d) => {
      val docs = docShingles(s, d)
      val cand = lshCandidates(docs.select(col("doc_id"), signature.as("sig")))
      val a = docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
      val b = docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
      val pairs = cand.join(a, "doc_a").join(b, "doc_b")
        .filter(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))) >= 0.8)
        .select("doc_a", "doc_b")
      val edges = pairs.union(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
        .localCheckpoint()
      var labels = edges.select(col("doc_a").as("node")).distinct()
        .withColumn("lbl", col("node"))
      var changed = 1L
      while (changed > 0) {
        val viaNeighbor = edges.join(labels, edges("doc_b") === labels("node"))
          .select(col("doc_a").as("node"), col("lbl"))
        val next = labels.select("node", "lbl").union(viaNeighbor)
          .groupBy("node").agg(min("lbl").as("lbl"))
          .localCheckpoint()
        changed = next.join(labels.withColumnRenamed("lbl", "old"), "node")
          .filter(col("lbl") =!= col("old")).count()
        labels = next
      }
      labels.select(col("node").as("doc_id"), col("lbl").as("cluster_id"))
        .orderBy("doc_id")
    },
      Some("""WITH RECURSIVE s AS (
             |  SELECT doc_id,
             |    list_distinct(list_transform(range(1, len(string_split(text, ' ')) - 1),
             |      i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS sh
             |  FROM documents),
             |pairs AS (
             |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
             |  FROM s a JOIN s b ON a.doc_id < b.doc_id
             |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             |      / len(list_distinct(list_cat(a.sh, b.sh))) >= 0.8),
             |edges AS (
             |  SELECT doc_a, doc_b FROM pairs
             |  UNION SELECT doc_b, doc_a FROM pairs),
             |reach(a, b) AS (
             |  SELECT doc_a, doc_b FROM edges
             |  UNION
             |  SELECT r.a, e.doc_b FROM reach r JOIN edges e ON r.b = e.doc_a)
             |SELECT a AS doc_id,
             |  least(a, min(b)) AS cluster_id
             |FROM reach GROUP BY a ORDER BY doc_id""".stripMargin)),

    // ---- SimHash near-dup: 64-bit signature + 4-block index --------------
    // xxhash64 is Spark-specific -> no portable oracle (rows-only check);
    // DedupSpec pins the signature math against a reference implementation.
    QueryDef("q46_simhash", (s, d) => {
      // v[j] = sum over tokens of (bit j of xxh64(token) ? +1 : -1);
      // simhash bit j = (v[j] > 0) — one native pass per row
      // (graft.functions.SimHash64).
      val sigs = t(s, d, "documents")
        .select(col("doc_id"),
          graft.functions.ArrayExprs.simhash64(split(col("text"), " ")).as("sim"))
      val blocks = array((0 until 4).map(i =>
        shiftright(col("sim"), i * 16).bitwiseAND(lit(0xFFFFL))): _*)
      val exploded = sigs.select(col("doc_id"), col("sim"), posexplode(blocks).as(Seq("blk", "bv")))
      val x = exploded.select(col("doc_id").as("doc_a"), col("sim").as("sim_a"), col("blk"), col("bv"))
      val y = exploded.select(col("doc_id").as("doc_b"), col("sim").as("sim_b"),
        col("blk").as("blk2"), col("bv").as("bv2"))
      x.join(y, col("blk") === col("blk2") && col("bv") === col("bv2") &&
          col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
        .distinct()
        .filter(col("hamming") <= 3)
        .orderBy("doc_a", "doc_b")
    },
      None),
  )
}
