package graft.queries

import graft.Materialize._
import graft.Report._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Text-analysis operators for an LLM training-data pipeline, over the
  * `documents` table: token counting, quality scoring, language-ID
  * heuristics, and document fingerprinting.
  *
  * Everything is built from codegen'd `org.apache.spark.sql.functions`
  * (split / higher-order array functions / xxhash64) — no UDFs, so
  * whole-stage codegen survives and the operators scale linearly with
  * input splits at 100 TB.
  */
object Text {
  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  private val toks: Column = split(col("text"), " ")

  /** Shared DuckDB CTE scaffold replaying the greedy longest-match
    * subword scan (see q90): per-word recursive (offset, tokens) states
    * with a longest-match CASE ladder over the fixed merge vocabulary,
    * aggregated to per-document counts + the segmented stream. Used by
    * both q90 (tokenization stats) and q92 (subword-budget packing) so
    * the two oracles cannot drift. */
  private val sqlSubwordCtes: String = {
    val v = graft.functions.SubwordVocab.sqlList
    s"""t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       |wd AS (SELECT doc_id, CAST(unnest(range(len(tk))) AS BIGINT) AS wi,
       |         unnest(tk) AS w FROM t),
       |step(doc_id, wi, w, off, toks) AS (
       |  SELECT doc_id, wi, w, 0, CAST([] AS VARCHAR[]) FROM wd
       |  UNION ALL
       |  SELECT doc_id, wi, w, off + length(tok), list_append(toks, tok) FROM (
       |    SELECT doc_id, wi, w, off, toks,
       |      CASE
       |        WHEN list_contains($v, substr(w, off+1, 4)) THEN substr(w, off+1, 4)
       |        WHEN list_contains($v, substr(w, off+1, 3)) THEN substr(w, off+1, 3)
       |        WHEN list_contains($v, substr(w, off+1, 2)) THEN substr(w, off+1, 2)
       |        ELSE substr(w, off+1, 1) END AS tok
       |    FROM step WHERE off < length(w))),
       |fin AS (SELECT doc_id, wi, toks FROM step
       |        WHERE off >= length(w) AND len(toks) > 0),
       |agg AS (
       |  SELECT doc_id,
       |    CAST(sum(len(toks)) AS BIGINT) AS n_subwords,
       |    string_agg(array_to_string(toks, ' '), ' ' ORDER BY wi) AS subword_text
       |  FROM fin GROUP BY doc_id)""".stripMargin
  }

  /** Bigram collocation extraction by lift over a (text) DataFrame — see
    * q95 below. Exposed for library use and the scale probe. */
  def collocations(documents: DataFrame, minCount: Int, topK: Int): DataFrame = {
    val tk = documents.select(toks.as("tk"))
    val uni = tk.select(explode(col("tk")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
    val tot = uni.agg(sum("c").as("n"))
    val big = tk
      .select(explode(arrays_zip(
        slice(col("tk"), lit(1), size(col("tk")) - 1),
        slice(col("tk"), lit(2), size(col("tk")) - 1))).as("bg"))
      .select(col("bg.0").as("w1"), col("bg.1").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
    big
      .join(uni.select(col("tok").as("w1"), col("c").as("c_a")), "w1")
      .join(uni.select(col("tok").as("w2"), col("c").as("c_b")), "w2")
      .crossJoin(broadcast(tot))
      .withColumn("lift",
        (col("c_ab").cast("double") * col("n")) /
          (col("c_a").cast("double") * col("c_b")))
      .select("w1", "w2", "c_ab", "lift")
      .orderBy(col("lift").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  /** TextRank keyword centrality — see q99 below. Exposed for library
    * use and the scale probe. */
  def textrank(documents: DataFrame, iters: Int = 8, topK: Int = 100): DataFrame = {
    val S = 10000000000L
    val tk = documents.select(toks.as("tk"))
    val bgd = tk.select(explode(arrays_zip(
        slice(col("tk"), lit(1), size(col("tk")) - 1),
        slice(col("tk"), lit(2), size(col("tk")) - 1))).as("bg"))
      .select(col("bg.0").as("u"), col("bg.1").as("v"))
      .filter(col("u") =!= col("v"))
    val edges0 = bgd.union(bgd.select(col("v").as("u"), col("u").as("v")))
      .groupBy("u", "v").agg(count(lit(1)).as("w"))
      .materialize
    val deg = edges0.groupBy("u").agg(sum("w").as("wu")).materialize
    // r15 (guide §2.4): the out-degree is loop-invariant, so it rides
    // the materialized edge list once instead of a per-iteration
    // deg join — 8 fewer joins (and their broadcast builds) across the
    // unrolled iterations; per-edge arithmetic unchanged.
    val edges = edges0.join(deg, "u")
      .select(col("u"), col("v"), col("w"), col("wu"))
      .materialize
    // r16: the iteration count is FIXED (no convergence test), so the
    // eight updates chain LAZILY into ONE action — the q297 markov
    // pattern. Per-iteration materialization bought nothing but eight
    // scheduling barriers + localCheckpoint round-trips: each rank
    // vector is consumed exactly once (by the next iteration), so the
    // lazy chain executes every stage exactly once inside one AQE plan
    // (guide §1.2 step 1 / §2.6 — the scheduler, not the data, was the
    // cost). Arithmetic per iteration is unchanged (same int64 update),
    // so ranks are bit-identical.
    var pr = deg.select(col("u").as("node"), lit(S).as("pr"))
    for (_ <- 1 to iters) {
      val acc = edges
        .join(pr.withColumnRenamed("node", "u"), "u")
        .select(col("v").as("node"),
          expr("(pr div wu) * w + ((pr % wu) * w) div wu").as("c"))
        .groupBy("node").agg(sum("c").as("acc"))
      pr = deg.select(col("u").as("node"))
        .join(acc, Seq("node"), "left")
        .select(col("node"),
          (lit(15L * S / 100L) + expr("(85 * coalesce(acc, 0L)) div 100")).as("pr"))
    }
    pr.select(col("node").as("token"), col("pr"))
      .orderBy(col("pr").desc, col("token"))
      .limit(topK)
  }

  /** Corpus-LM familiarity scoring over a (doc_id, text) DataFrame — see
    * q79 below. Exposed for library use and the scale probe. */
  def lmFamiliarity(documents: DataFrame): DataFrame = {
    // 62-bit hashed trigram keys (q78's narrow-key rule, applied to the
    // second-heaviest text query): the count shuffle and the join back
    // key on 8 bytes instead of ~20-byte trigram strings; the oracle
    // recomputes the identical hash, so counts — and the collision tail
    // — are shared bit-for-bit
    val bg = documents.filter(size(toks) >= 3)
      .select(col("doc_id"), explode(
        graft.functions.ArrayExprs.windowHashes(toks, 3)).as("g"))
    val cf = bg.groupBy("g").agg(count(lit(1)).as("c"))
    bg.join(cf.hint("shuffle_hash"), "g")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_trigrams"), sum("c").as("fam_sum"),
        sum(when(col("c") === 1, 1).otherwise(0)).as("n_novel"))
      .select(col("doc_id"), col("n_trigrams"), col("fam_sum"),
        (col("fam_sum").cast("double") / col("n_trigrams")).as("avg_familiarity"),
        col("n_novel"),
        (col("n_novel").cast("double") / col("n_trigrams")).as("novel_frac"),
        (col("fam_sum") >= col("n_trigrams") * 2).as("lm_ok"))
  }

  /** Fixed-point BM25 term score — THE single definition shared by q88
    * and the q169 hybrid-retrieval fusion (Spark face here, DuckDB face
    * in [[sqlBm25Fixed]]), so the idf surrogate, the k1/b constants and
    * the 1e9 fixed-point rule cannot drift between consumers. Expects
    * columns (tf, len, df, n, sumlen) in scope; emits int64 so the
    * per-document sum is exact and partition-order-free. */
  /** q88's BM25 body over whatever document population the caller hands
    * in — q88 runs it on the corpus, q319 on a predicate slice (with
    * collection statistics scoped to the slice, the pre-filter
    * semantics; see q319's rationale). */
  private def bm25TopK(docs: DataFrame): DataFrame = {
    val terms = Seq("data", "stream", "table")
    val e = docs
      .filter(arrays_overlap(toks, array(terms.map(lit): _*)))
      .select(col("doc_id"), size(toks).as("len"), explode(toks).as("term"))
      .filter(col("term").isin(terms: _*))
    val stats = docs.agg(count(lit(1)).as("n"), sum(size(toks)).as("sumlen"))
    val tf = e.groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"), min("len").as("len"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(dfreq, "term").crossJoin(broadcast(stats))
      .withColumn("fixed", bm25Fixed)
      .groupBy("doc_id")
      .agg(sum("fixed").as("score_fixed"), count(lit(1)).as("n_query_terms"))
      .orderBy(col("score_fixed").desc, col("doc_id"))
      .limit(50)
  }

  /** Oracle for [[bm25TopK]]; `where` scopes the document population
    * (empty for q88, a WHERE clause for q319). */
  private def sqlBm25TopK(where: String): String =
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS tk
       |           FROM documents $where),
       |st AS (SELECT count(*) AS n, CAST(sum(len(tk)) AS BIGINT) AS sumlen FROM d),
       |e AS (SELECT doc_id, len(tk) AS len, unnest(tk) AS term FROM d),
       |tf AS (
       |  SELECT doc_id, term, count(*) AS tf, min(len) AS len
       |  FROM e WHERE term IN ('data', 'stream', 'table')
       |  GROUP BY doc_id, term),
       |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       |sc AS (
       |  SELECT doc_id, $sqlBm25Fixed AS fixed
       |  FROM tf JOIN dfq USING (term) CROSS JOIN st)
       |SELECT doc_id, CAST(sum(fixed) AS BIGINT) AS score_fixed,
       |  CAST(count(*) AS BIGINT) AS n_query_terms
       |FROM sc GROUP BY doc_id
       |ORDER BY score_fixed DESC, doc_id LIMIT 50""".stripMargin

  private[queries] def bm25Fixed: Column = {
    val idf = (lit(2) * (col("n") - col("df")) + 1).cast("double") /
      (lit(2) * col("df") + 1).cast("double")
    val norm = col("len").cast("double") * col("n") / col("sumlen")
    val tscore = idf * (col("tf").cast("double") * lit(2.2)) /
      (col("tf").cast("double") + lit(1.2) * (lit(0.25) + lit(0.75) * norm))
    floor(tscore * lit(1e9)).cast("long")
  }

  /** [[bm25Fixed]] with free (k1, b) — q280's sweep cells. The constants
    * k1+1 and 1-b are computed ONCE in Scala and surface in both engines
    * through shortest-round-trip rendering, so each cell's fixed-point
    * score is bit-identical. bm25ParamFixed(1.2, 0.75) == bm25Fixed. */
  private[queries] def bm25ParamFixed(k1: Double, b: Double): Column = {
    val idf = (lit(2) * (col("n") - col("df")) + 1).cast("double") /
      (lit(2) * col("df") + 1).cast("double")
    val norm = col("len").cast("double") * col("n") / col("sumlen")
    val tscore = idf * (col("tf").cast("double") * lit(k1 + 1)) /
      (col("tf").cast("double") + lit(k1) * (lit(1 - b) + lit(b) * norm))
    floor(tscore * lit(1e9)).cast("long")
  }

  private[queries] def sqlBm25Param(k1: Double, b: Double): String =
    s"""CAST(floor(
       |      (CAST(2 * (n - df) + 1 AS DOUBLE) / CAST(2 * df + 1 AS DOUBLE))
       |      * (CAST(tf AS DOUBLE) * ${k1 + 1})
       |      / (CAST(tf AS DOUBLE) + $k1 * (${1 - b} + $b *
       |          (CAST(len AS DOUBLE) * n / sumlen)))
       |      * 1000000000.0) AS BIGINT)""".stripMargin

  /** q280's (k1, b) sweep grid. */
  private[queries] val bm25Grid: Seq[(Double, Double)] =
    Seq((0.9, 0.4), (0.9, 0.75), (1.2, 0.4), (1.2, 0.75), (1.5, 0.4), (1.5, 0.75))

  /** DuckDB mirror of [[bm25Fixed]] — identical arithmetic, identical
    * operation order. */
  private[queries] def sqlBm25Fixed: String =
    """CAST(floor(
      |      (CAST(2 * (n - df) + 1 AS DOUBLE) / CAST(2 * df + 1 AS DOUBLE))
      |      * (CAST(tf AS DOUBLE) * 2.2)
      |      / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
      |          (CAST(len AS DOUBLE) * n / sumlen)))
      |      * 1000000000.0) AS BIGINT)""".stripMargin

  /** Per-source lexical diversity — the q178 body, exposed for fixture
    * specs: type-token ratio, inverse Simpson ("effective vocabulary"),
    * and top-token concentration off one (source, token) count shuffle. */
  def tokenDiversity(documents: DataFrame): DataFrame = {
    val counts = documents
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("c"))
    counts.groupBy("source")
      .agg(sum("c").as("n_tokens"), count(lit(1)).as("n_types"),
        sum(col("c") * col("c")).as("sumsq"), max("c").as("max_c"))
      .select(col("source"), col("n_tokens"), col("n_types"),
        (col("n_types").cast("double") / col("n_tokens")).as("ttr"),
        (col("n_tokens").cast("double") * col("n_tokens").cast("double") /
          col("sumsq").cast("double")).as("inv_simpson"),
        (col("max_c").cast("double") / col("n_tokens")).as("top_share"))
  }

  /** Span-corruption mask plan (q335's body), exposed for library use
    * and the scale probe: deterministic non-overlapping (start, len)
    * mask spans at ~15% token coverage, map-only. */
  def spanCorruptionPlan(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .filter(col("n") >= 20)
      .withColumn("n_spans", expr("n div 20"))
      .select(col("doc_id"), col("n"), col("n_spans"),
        explode(sequence(lit(0L), col("n_spans") - 1)).as("span_idx"))
      // seed = lehmer(doc_id) * 31 + span_idx: the inner Lehmer step
      // decorrelates neighboring documents — a raw doc_id * 31 seed
      // collides doc d's span 31 with doc d+1's span 0 once a document
      // holds >= 620 tokens, correlating mask offsets between adjacent
      // docs (r13 advice). Seed stays far below 2^63 (lehmer < 2^31).
      .withColumn("h", Sampling.lehmer(
        Sampling.lehmer(col("doc_id")) * 31 + col("span_idx")))
      .withColumn("seg_start", expr("(span_idx * n) div n_spans"))
      .withColumn("seg_len",
        expr("((span_idx + 1) * n) div n_spans") - col("seg_start"))
      .withColumn("span_len", lit(2L) + pmod(col("h"), lit(3L)))
      .withColumn("start_tok", col("seg_start") +
        pmod(expr("h div 3"), col("seg_len") - col("span_len") + 1))
      .select(col("doc_id"), col("span_idx"), col("start_tok"),
        col("span_len"), col("n").as("n_tokens"), col("n_spans"))

  /** Exact token-level P/R/F1 scorer over (gold, pred) token-array
    * pairs — the SQuAD-style reference-based eval metric, emitted as
    * EXACT INTEGER sufficient statistics (len_gold, len_pred, multiset
    * overlap, f1_num = 2*overlap, f1_den = len_gold + len_pred) so no
    * float division enters the gate; f1 = f1_num / f1_den is the
    * consumer's one division. `multiset_em` is bag equality (order
    * ignored) — the exact-match tier for free-form answers where token
    * order carries no credit.
    *
    * Scale shape: each side explodes to (pair, token) rows tagged with
    * its side's count vector, then ONE (doc_id, tok) hash shuffle
    * computes both bag counts and overlap = sum(min) — per-pair token
    * bags are never materialized as wide rows, so a 100k-token answer
    * costs 100k narrow rows, not one row of 100k entries. No join at
    * all: the union carries both sides through the same aggregate. */
  def scoreTokenF1(pairs: DataFrame): DataFrame = {
    val g = pairs.select(col("doc_id"), explode(col("gold")).as("tok"),
      lit(1L).as("g"), lit(0L).as("pr"))
    val p = pairs.select(col("doc_id"), explode(col("pred")).as("tok"),
      lit(0L).as("g"), lit(1L).as("pr"))
    g.unionByName(p)
      .groupBy("doc_id", "tok")
      .agg(sum("g").as("cg"), sum("pr").as("cp"))
      .groupBy("doc_id")
      .agg(sum("cg").as("len_gold"), sum("cp").as("len_pred"),
        sum(least(col("cg"), col("cp"))).as("overlap"))
      .select(col("doc_id"), col("len_gold"), col("len_pred"),
        col("overlap"), (col("overlap") * 2).as("f1_num"),
        (col("len_gold") + col("len_pred")).as("f1_den"),
        (col("overlap") === col("len_gold") &&
          col("len_gold") === col("len_pred")).as("multiset_em"))
  }

  /** q368's deterministic (gold, pred) pair builder: pred = gold with
    * a Lehmer-keyed 10% token deletion + 10% out-of-vocabulary
    * substitution (position seed = lehmer(lehmer(doc_id))*31 + p, the
    * q335 decorrelation rule). Both engines construct the identical
    * pair, so the oracle certifies the SCORER, not the corruption —
    * the corruption only guarantees every F1 regime (miss, spurious,
    * repeat-limited overlap) appears in the gated output. Map-only
    * higher-order array ops; no shuffle before the scorer's own. */
  def tokenF1Pairs(docs: DataFrame): DataFrame = {
    val tk = split(col("text"), " ")
    val tagged = transform(tk, (tok, i) => struct(tok.as("t"),
      Sampling.lehmer(Sampling.lehmer(col("doc_id")) * 31 +
        i.cast("long")).as("h")))
    val pred = transform(
      filter(tagged, s => pmod(s("h"), lit(10L)) =!= 0L),
      s => when(pmod(s("h"), lit(10L)) === 1L,
        concat(lit("x"), pmod(s("h"), lit(97L)).cast("string")))
        .otherwise(s("t")))
    docs.select(col("doc_id"), tk.as("gold"), pred.as("pred"))
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- Span-corruption plan (T5/UL2 denoising preprocessing) -----------
    // The layout pass a span-corruption trainer runs over the corpus:
    // per document, ~15% of tokens masked in spans of mean length 3
    // (len in {2,3,4}), emitted as the (start, len) mask plan the
    // tokenizer consumes. Spans cannot overlap BY CONSTRUCTION: the
    // token stream partitions into n_spans equal segments (n_spans =
    // n div 20, so segments hold 20-39 tokens) and each span lands
    // inside its own segment at a Lehmer-keyed offset — rerun-invariant
    // (q56's membership rule applied to positions), no rejection
    // sampling, no cross-span coordination. Documents under 20 tokens
    // take no mask (no segment fits a span).
    //
    // Scale shape: map-only — one scan, a bounded per-doc generate
    // (n div 20 rows), pure integer arithmetic both engines replay
    // exactly (div/mod only; the one hash is the shared Lehmer step).
    QueryDef("q335_span_corruption", (s, d) =>
      spanCorruptionPlan(t(s, d, "documents")).orderBy("doc_id", "span_idx"),
      Some(s"""WITH b AS MATERIALIZED (
             |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) // 20 AS n_spans
             |  FROM documents
             |  WHERE len(string_split(text, ' ')) >= 20),
             |sp AS (
             |  SELECT doc_id, n, n_spans,
             |    CAST(unnest(range(n_spans)) AS BIGINT) AS span_idx
             |  FROM b),
             |w AS (
             |  SELECT doc_id, n, n_spans, span_idx,
             |    ${Sampling.sqlLehmerOf(s"((${Sampling.sqlLehmerOf("doc_id")}) * 31 + span_idx)")} AS h,
             |    (span_idx * n) // n_spans AS seg_start,
             |    ((span_idx + 1) * n) // n_spans
             |      - (span_idx * n) // n_spans AS seg_len
             |  FROM sp)
             |SELECT doc_id, span_idx,
             |  seg_start + (h // 3) % (seg_len - (2 + h % 3) + 1) AS start_tok,
             |  2 + h % 3 AS span_len,
             |  n AS n_tokens, n_spans
             |FROM w ORDER BY doc_id, span_idx""".stripMargin)),

    // ---- Reference-based eval scoring (exact token F1) --------------------
    // The SQuAD/TriviaQA-style scorer an eval harness runs over every
    // (model answer, gold answer) pair: token-level precision/recall/F1
    // from the multiset token overlap, plus bag exact-match. Emitted as
    // exact integer sufficient statistics (the f1_num/f1_den rational) —
    // the exact-arithmetic charter. Pairs here are deterministic
    // corruptions of the documents table (see tokenF1Pairs); the gated
    // artifact is the SCORER's bag algebra at every overlap regime.
    QueryDef("q368_token_f1", (s, d) =>
      scoreTokenF1(tokenF1Pairs(t(s, d, "documents"))).orderBy("doc_id"),
      Some(s"""WITH tkn AS MATERIALIZED (
             |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
             |pos AS MATERIALIZED (
             |  SELECT doc_id, CAST(unnest(range(len(t))) AS BIGINT) AS p,
             |    unnest(t) AS tok
             |  FROM tkn),
             |hs AS MATERIALIZED (
             |  SELECT doc_id, p, tok,
             |    ${Sampling.sqlLehmerOf(
                   s"((${Sampling.sqlLehmerOf("doc_id")}) * 31 + p)")} AS h
             |  FROM pos),
             |pred AS (
             |  SELECT doc_id,
             |    CASE WHEN h % 10 = 1 THEN 'x' || CAST(h % 97 AS VARCHAR)
             |         ELSE tok END AS tok
             |  FROM hs WHERE h % 10 <> 0),
             |gbag AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS cg
             |         FROM pos GROUP BY 1, 2),
             |pbag AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS cp
             |         FROM pred GROUP BY 1, 2),
             |j AS (
             |  SELECT coalesce(g.doc_id, p.doc_id) AS doc_id,
             |    coalesce(cg, 0) AS cg, coalesce(cp, 0) AS cp
             |  FROM gbag g FULL OUTER JOIN pbag p
             |    ON g.doc_id = p.doc_id AND g.tok = p.tok)
             |SELECT doc_id,
             |  CAST(sum(cg) AS BIGINT) AS len_gold,
             |  CAST(sum(cp) AS BIGINT) AS len_pred,
             |  CAST(sum(least(cg, cp)) AS BIGINT) AS overlap,
             |  CAST(2 * sum(least(cg, cp)) AS BIGINT) AS f1_num,
             |  CAST(sum(cg) + sum(cp) AS BIGINT) AS f1_den,
             |  (sum(least(cg, cp)) = sum(cg) AND sum(cg) = sum(cp))
             |    AS multiset_em
             |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ---- Token / character statistics ------------------------------------
    QueryDef("q40_text_stats", (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"),
          length(col("text")).as("len_chars"),
          size(toks).as("n_tokens"),
          // exact rational: (chars - spaces) / tokens, computed identically
          // in DuckDB, so the double result is bit-equal
          ((length(col("text")) - size(toks) + 1).cast("double") / size(toks))
            .as("avg_token_len"),
          // BPE-ish subword proxy: alpha runs + digit runs + single
          // punctuation, the usual pre-tokenizer shape
          size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))
            .as("bpe_tokens"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, lang, n_chars,
             |  CAST(length(text) AS INTEGER) AS len_chars,
             |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
             |  CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE)
             |    / len(string_split(text, ' ')) AS avg_token_len,
             |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]'))
             |    AS INTEGER) AS bpe_tokens
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- Quality scoring: stopword ratio + length gates ------------------
    QueryDef("q41_text_quality", (s, d) => {
      val nTok = size(toks)
      val nStop = size(filter(toks, x => x === "the" || x === "a"))
      t(s, d, "documents")
        .select(col("doc_id"),
          nTok.as("n_tokens"),
          nStop.as("n_stopwords"),
          (nStop.cast("double") / nTok).as("stop_ratio"),
          (nTok >= 20 && nStop > 0).as("quality_ok"))
        .orderBy("doc_id")
    },
      Some("""SELECT doc_id,
             |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
             |  CAST(len(list_filter(string_split(text, ' '),
             |    x -> x = 'the' OR x = 'a')) AS INTEGER) AS n_stopwords,
             |  CAST(len(list_filter(string_split(text, ' '), x -> x = 'the' OR x = 'a')) AS DOUBLE)
             |    / len(string_split(text, ' ')) AS stop_ratio,
             |  len(string_split(text, ' ')) >= 20
             |    AND len(list_filter(string_split(text, ' '), x -> x = 'the' OR x = 'a')) > 0 AS quality_ok
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- Language-ID heuristic (stopword-profile scoring) ----------------
    // A real pipeline scores per-language n-gram/stopword profiles; the
    // synthetic corpus shares one vocabulary, so the heuristic reduces to
    // an English-stopword-density score. The plumbing (pure column
    // expressions, no shuffle) is the part that matters at scale.
    QueryDef("q42_langid", (s, d) => {
      val nTok = size(toks)
      val nEn = size(filter(toks, x => x === "the" || x === "a" || x === "data"))
      t(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          (nEn.cast("double") / nTok).as("en_score"),
          when(nEn.cast("double") / nTok >= 0.05, "en").otherwise("und").as("pred_lang"))
        .orderBy("doc_id")
    },
      Some("""SELECT doc_id, lang,
             |  CAST(len(list_filter(string_split(text, ' '),
             |        x -> x = 'the' OR x = 'a' OR x = 'data')) AS DOUBLE)
             |    / len(string_split(text, ' ')) AS en_score,
             |  CASE WHEN CAST(len(list_filter(string_split(text, ' '),
             |        x -> x = 'the' OR x = 'a' OR x = 'data')) AS DOUBLE)
             |    / len(string_split(text, ' ')) >= 0.05
             |    THEN 'en' ELSE 'und' END AS pred_lang
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- Corpus token frequencies (explode / lateral) --------------------
    // The canonical corpus statistic: generator (explode) into a grouped
    // count — term frequency + document frequency per token.
    QueryDef("q53_token_freq", (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), explode(toks).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
        .orderBy("token"),
      Some("""SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df
             |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
             |      FROM documents)
             |GROUP BY token ORDER BY token""".stripMargin)),

    // ---- Text cleaning: normalize -> strip punctuation -> collapse -------
    // The standard pre-tokenization scrub, as pure codegen'd string
    // expressions (lower/regexp_replace chains — map-only, no shuffle).
    // Patterns are chosen to mean the same thing in Java regex and RE2;
    // DuckDB's regexp_replace needs the 'g' flag to match Spark's
    // replace-all default.
    QueryDef("q58_text_clean", (s, d) => {
      val clean = trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " "))
      t(s, d, "documents")
        .select(col("doc_id"), clean.as("clean_text"),
          size(split(clean, " ")).as("n_clean_tokens"))
        .orderBy("doc_id")
    },
      Some("""SELECT doc_id,
             |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
             |       ' +', ' ', 'g')) AS clean_text,
             |  CAST(len(string_split(trim(regexp_replace(regexp_replace(lower(text),
             |       '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' '))
             |    AS INTEGER) AS n_clean_tokens
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- Document fingerprint: order-sensitive rolling hash --------------
    // fp = fold(tokens, acc -> (acc * 31 + polyHash(token)) mod 1e9+7) — a
    // polynomial rolling hash over per-token polynomial codepoint hashes,
    // mod large primes so the arithmetic never overflows (Spark 4 is ANSI
    // by default: wrapping int64 ops throw). The token hash is the
    // portable graft.functions.ArrayOps.polyHash, so the identical fold is
    // expressed in DuckDB SQL (nested list_reduce) -> full hash-match
    // oracle. Native codegen'd expression, one pass per row.
    QueryDef("q43_fingerprint", (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          graft.functions.ArrayExprs.polyFingerprint(toks).as("fingerprint"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  list_reduce(list_prepend(CAST(0 AS BIGINT),
             |    list_transform(string_split(text, ' '), w ->
             |      list_reduce(list_prepend(CAST(0 AS BIGINT),
             |        list_transform(range(1, length(w)+1), i -> CAST(unicode(w[i]) AS BIGINT))),
             |        (a,c) -> (a*131 + c) % 4294967291))),
             |    (acc,h) -> (acc*31 + h) % 1000000007) AS fingerprint
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- Within-document repetition (Gopher-style quality gates) ---------
    // The C4/Gopher family of repetition filters: fraction of duplicate
    // 2-grams / 3-grams and the top-token frequency ratio — ALL map-side,
    // zero shuffles (the root orderBy is oracle determinism). The
    // duplicate fraction needs NO non-distinct n-gram enumeration: a doc
    // with n tokens has n-k+1 k-gram windows, so dup_frac = (windows -
    // distinct) / windows, with distinct counts from the native shingles()
    // expression; the top-token count is the native TopTokenCount
    // (per-row hash count — the explode -> (doc, token) count -> per-doc
    // max formulation remains the right shape if single documents can
    // exceed executor memory).
    QueryDef("q66_repetition", (s, d) => {
      val base = t(s, d, "documents")
        .select(col("doc_id"), size(toks).as("n"),
          size(graft.functions.ArrayExprs.shingles(toks, 2)).as("d2"),
          size(graft.functions.ArrayExprs.shingles(toks, 3)).as("d3"),
          graft.functions.ArrayExprs.topTokenCount(toks).as("mx"))
        .filter(col("n") >= 3)
      val dup2 = (col("n") - 1 - col("d2")).cast("double") / (col("n") - 1)
      val ratio = col("mx").cast("double") / col("n")
      base
        .select(col("doc_id"), col("n").as("n_tokens"),
          dup2.as("dup2_frac"),
          ((col("n") - 2 - col("d3")).cast("double") / (col("n") - 2)).as("dup3_frac"),
          ratio.as("top_tok_ratio"),
          (dup2 <= 0.05 && ratio <= 0.12).as("repetition_ok"))
        .orderBy("doc_id")
    },
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
             |m AS (
             |  SELECT doc_id, len(tk) AS n,
             |    len(list_distinct(list_transform(range(1, len(tk)),
             |      i -> array_to_string(tk[i:i+1], ' ')))) AS d2,
             |    len(list_distinct(list_transform(range(1, len(tk) - 1),
             |      i -> array_to_string(tk[i:i+2], ' ')))) AS d3
             |  FROM t WHERE len(tk) >= 3),
             |mx AS (
             |  SELECT doc_id, max(c) AS mx FROM (
             |    SELECT doc_id, tok, count(*) AS c
             |    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
             |    GROUP BY doc_id, tok) GROUP BY doc_id)
             |SELECT m.doc_id, CAST(n AS INTEGER) AS n_tokens,
             |  CAST(n - 1 - d2 AS DOUBLE) / (n - 1) AS dup2_frac,
             |  CAST(n - 2 - d3 AS DOUBLE) / (n - 2) AS dup3_frac,
             |  CAST(mx AS DOUBLE) / n AS top_tok_ratio,
             |  CAST(n - 1 - d2 AS DOUBLE) / (n - 1) <= 0.05
             |    AND CAST(mx AS DOUBLE) / n <= 0.12 AS repetition_ok
             |FROM m JOIN mx ON m.doc_id = mx.doc_id
             |ORDER BY m.doc_id""".stripMargin)),

    // ---- TF-IDF top terms per document -----------------------------------
    // Corpus-weighted term salience: tf x idf with the RATIONAL idf N/df
    // (the constant N factor is rank-invariant, so the score is
    // tf/df — logarithmic idf would rank identically here but ln() is not
    // bit-portable across engines, and the oracle hash-compares doubles).
    // Shape at scale: explode -> (doc, term) count (shuffle 1) -> df from
    // the tf set (shuffle 2, term-keyed) -> join back on term -> per-doc
    // top-3 window (millions of tiny doc_id partitions — no skew).
    QueryDef("q67_tfidf_topk", (s, d) => {
      val e = t(s, d, "documents").select(col("doc_id"), explode(toks).as("term"))
      val tf = e.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("score").desc, col("term"))
      tf.join(df, "term")
        .withColumn("score", col("tf").cast("double") / col("df"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select("doc_id", "rk", "term", "tf", "df", "score")
        .orderBy("doc_id", "rk")
    },
      Some("""WITH e AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
             |tf AS (SELECT doc_id, term, count(*) AS tf FROM e GROUP BY doc_id, term),
             |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
             |sc AS (
             |  SELECT doc_id, tf.term AS term, tf, df,
             |    CAST(tf AS DOUBLE) / df AS score,
             |    CAST(row_number() OVER (PARTITION BY doc_id
             |      ORDER BY CAST(tf AS DOUBLE) / df DESC, tf.term) AS INTEGER) AS rk
             |  FROM tf JOIN df USING (term))
             |SELECT doc_id, rk, term, tf, df, score FROM sc WHERE rk <= 3
             |ORDER BY doc_id, rk""".stripMargin)),

    // ---- Context-window chunking -----------------------------------------
    // Split every document into tumbling 16-token chunks — the standard
    // pre-tokenization windowing for a fixed-context trainer. Distributed
    // shape: posexplode -> chunk_id = pos div W -> one hash shuffle on
    // (doc, chunk) with an ordered string_agg; chunks re-assemble from
    // token order, never from driver state, so a document larger than a
    // task's memory still chunks correctly (its tokens spread over the
    // shuffle). The tiny per-chunk array sort (<= W elements) restores
    // intra-chunk order after the shuffle.
    QueryDef("q69_chunking", (s, d) => {
      val W = 16
      t(s, d, "documents")
        .select(col("doc_id"), posexplode(toks).as(Seq("pos", "tok")))
        .groupBy(col("doc_id"), (col("pos") / W).cast("int").as("chunk_id"))
        .agg(
          array_join(transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
            x => x.getField("tok")), " ").as("chunk_text"),
          count(lit(1)).as("n_tokens"))
        .orderBy("doc_id", "chunk_id")
    },
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
             |e AS (SELECT doc_id, unnest(tk) AS tok,
             |        CAST(unnest(range(len(tk))) AS INTEGER) AS pos FROM t)
             |SELECT doc_id, pos // 16 AS chunk_id,
             |  string_agg(tok, ' ' ORDER BY pos) AS chunk_text,
             |  count(*) AS n_tokens
             |FROM e GROUP BY doc_id, pos // 16
             |ORDER BY doc_id, chunk_id""".stripMargin)),

    // ---- Overlapping (strided) chunking: the RAG/retrieval windowing -----
    // q69's tumbling chunks suit a fixed-context trainer; retrieval
    // pipelines instead cut OVERLAPPING windows (16 tokens, stride 8) so
    // no answer span is split across chunk boundaries. Starts are
    // 0, 8, 16, ... while start < n (floor((n-1)/8)+1 chunks); the last
    // window clips at the document end. Map-only: chunk enumeration is
    // pure arithmetic on the token array (posexplode of a transformed
    // sequence — no token-level shuffle at all), ordering aside.
    QueryDef("q89_overlap_chunks", (s, d) => {
      val (w, stride) = (16, 8)
      t(s, d, "documents")
        .select(col("doc_id"), toks.as("tk"), size(toks).as("n"))
        .select(col("doc_id"), col("tk"), col("n"), posexplode(transform(
          sequence(lit(0), expr(s"(n - 1) div $stride")),
          i => (i * stride).cast("int"))).as(Seq("chunk_id", "start")))
        .select(col("doc_id"), col("chunk_id"), col("start"),
          array_join(slice(col("tk"), col("start") + 1, lit(w)), " ").as("chunk_text"),
          least(lit(w), col("n") - col("start")).as("n_tokens"))
        .orderBy("doc_id", "chunk_id")
    },
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk,
             |                  len(string_split(text, ' ')) AS n FROM documents),
             |c AS (SELECT doc_id, tk, n,
             |        CAST(unnest(range((n - 1) // 8 + 1)) AS INTEGER) AS chunk_id
             |      FROM t)
             |SELECT doc_id, chunk_id, CAST(chunk_id * 8 AS INTEGER) AS start,
             |  array_to_string(tk[chunk_id * 8 + 1 : chunk_id * 8 + 16], ' ') AS chunk_text,
             |  CAST(least(16, n - chunk_id * 8) AS INTEGER) AS n_tokens
             |FROM c ORDER BY doc_id, chunk_id""".stripMargin)),

    // ---- Blocklist scrub: wordlist hit counting + redaction --------------
    // The C4/Dolma-style badword gate: count whole-word blocklist hits per
    // document, flag documents whose hit RATIO crosses a threshold (an
    // absolute count would just measure document length), and emit the
    // redacted text. Word-boundary regex — codegen'd regexp_count /
    // regexp_replace, map-only, no shuffle except the output ordering;
    // a production blocklist (hundreds of terms) compiles into the same
    // single alternation pattern, still one scan. The ratio division is
    // int/int in IEEE double on both engines — bit-exact.
    QueryDef("q75_blocklist", (s, d) => {
      val pat = "\\b(customer|vector|stream)\\b"
      t(s, d, "documents")
        .select(col("doc_id"),
          regexp_count(col("text"), lit(pat)).cast("long").as("n_hits"),
          size(toks).cast("long").as("n_tokens"),
          regexp_replace(col("text"), pat, "[*]").as("clean_text"))
        .withColumn("bad_ratio",
          col("n_hits").cast("double") / col("n_tokens"))
        .withColumn("flagged", col("bad_ratio") > 0.05)
        .select("doc_id", "n_hits", "n_tokens", "bad_ratio", "flagged", "clean_text")
        .orderBy("doc_id")
    },
      Some("""SELECT doc_id,
             |  len(regexp_extract_all(text, '\b(customer|vector|stream)\b')) AS n_hits,
             |  len(string_split(text, ' ')) AS n_tokens,
             |  CAST(len(regexp_extract_all(text, '\b(customer|vector|stream)\b')) AS DOUBLE)
             |    / len(string_split(text, ' ')) AS bad_ratio,
             |  CAST(len(regexp_extract_all(text, '\b(customer|vector|stream)\b')) AS DOUBLE)
             |    / len(string_split(text, ' ')) > 0.05 AS flagged,
             |  regexp_replace(text, '\b(customer|vector|stream)\b', '[*]', 'g') AS clean_text
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- BM25 retrieval scoring (fixed query, corpus ranking) ------------
    // The retrieval-side ranking op a RAG pipeline runs over the corpus:
    // Okapi BM25 with k1 = 1.2, b = 0.75 against a fixed query term set.
    // Two portability choices, both in the q67 tradition: (1) idf uses the
    // RATIONAL surrogate (2(N-df)+1)/(2df+1) — ln() is not bit-portable
    // across engines (monotone per term, so per-term ordering is
    // preserved); (2) per-term scores are converted to FIXED-POINT int64
    // (floor(score * 1e9)) BEFORE the per-document sum — double addition
    // is order-dependent under parallel aggregation, integer addition is
    // not, so the total is engine- and partition-order-exact. Constants
    // are double literals (2.2, not 1.2+1: computed constants round
    // differently than parsed literals).
    //
    // Scale shape: documents containing NO query term are dropped BEFORE
    // the Generate by an arrays_overlap predicate on the token array —
    // map-side in the scan stage (the per-term isin predicate sits on the
    // explode's output column and cannot move below the Generate, so
    // without the pre-filter the full token stream of every document
    // materializes). tf is one grouped count, df one more over the tf
    // set, the corpus stats a one-row broadcast — per-query cost is
    // proportional to the matching documents' posting lists, not the
    // corpus.
    QueryDef("q88_bm25", (s, d) => bm25TopK(t(s, d, "documents")),
      Some(sqlBm25TopK(""))),

    // ---- Filtered BM25: retrieval under a metadata predicate -------------
    // q317/q318's pre-filter principle applied to TEXT retrieval — the
    // second retrieval shape production runs constantly ("top-k WHERE
    // lang = 'de'"). The predicate prunes the document set BEFORE the
    // posting build, which changes more than the candidate list:
    // COLLECTION STATISTICS are scoped to the eligible corpus — N,
    // avgdl, and df are the filtered collection's, so idf reflects how
    // discriminative a term is WITHIN the slice being searched. That is
    // the semantics post-filtering cannot recover (it ranks by global
    // idf, then discards — a term common globally but rare in German
    // docs is under-weighted, and the top-k under-fills exactly like
    // q317's narrow arm). Scale shape is q88's on the eligible slice:
    // the lang predicate is a pushed parquet filter, the
    // arrays_overlap pre-filter still guards the Generate.
    QueryDef("q319_bm25_filtered", (s, d) =>
      bm25TopK(t(s, d, "documents").filter(col("lang") === "de")),
      Some(sqlBm25TopK("WHERE lang = 'de'"))),

    // ---- Subword tokenization: greedy longest-match merge table ----------
    // The real token-counting pass an LLM pipeline budgets by (packing,
    // quotas, context capacity): greedy longest-match inference over a
    // fixed merge vocabulary (graft.functions.SubwordVocab — single
    // [a-z0-9] chars + 2-4 char merges), the WordPiece/BPE inference
    // algorithm with single-codepoint fallback. Per document: word count,
    // subword count, fertility (subwords per word — THE tokenizer quality
    // metric), 128-token context capacity, and the full segmented stream
    // (so the oracle hash pins every token, not just counts).
    //
    // Scale shape: map-only — one native codegen'd expression per row,
    // zero shuffles besides the output ordering; at 100 TB this is a pure
    // scan -> project pass. The oracle replays the greedy scan as a
    // recursive CTE over (word, offset) states with a longest-match CASE
    // ladder — the emitted streams agree token-for-token (candidate
    // windows that clip at word end or touch non-ASCII never match the
    // vocabulary in either engine, so the unit-vs-codepoint difference
    // is unobservable; see SubwordTokens).
    QueryDef("q90_subword_tokens", (s, d) => {
      val st = graft.functions.ArrayExprs.subwordTokens(toks)
      t(s, d, "documents")
        .select(col("doc_id"), size(toks).as("n_words"), st.as("st"))
        .select(col("doc_id"), col("n_words"),
          size(col("st")).cast("long").as("n_subwords"),
          (size(col("st")).cast("double") / col("n_words")).as("fertility"),
          expr("CAST((size(st) + 127) div 128 AS BIGINT)").as("n_contexts_128"),
          array_join(col("st"), " ").as("subword_text"))
        .orderBy("doc_id")
    },
      Some(s"""WITH RECURSIVE $sqlSubwordCtes
             |SELECT t.doc_id, CAST(len(t.tk) AS INTEGER) AS n_words,
             |  coalesce(a.n_subwords, 0) AS n_subwords,
             |  CAST(coalesce(a.n_subwords, 0) AS DOUBLE) / len(t.tk) AS fertility,
             |  (coalesce(a.n_subwords, 0) + 127) // 128 AS n_contexts_128,
             |  coalesce(a.subword_text, '') AS subword_text
             |FROM t LEFT JOIN agg a ON t.doc_id = a.doc_id
             |ORDER BY t.doc_id""".stripMargin)),

    // ---- Subword-budget sequence packing ----------------------------------
    // q70 packs by WHITESPACE token counts; a real trainer's packer fills
    // contexts by SUBWORD counts — this is q70's greedy fill re-based on
    // the q90 tokenizer: lay documents end-to-end in doc_id order, cut
    // every 256 subwords, a document rides with the sequence it starts
    // in. seq_id = floor(subwords_before_doc / 256).
    //
    // Scale shape: the subword count is the map-only native expression
    // (never materializing the token stream); the GLOBAL running sum is
    // the q57/q70 two-phase prefix pattern — phase 1 sums within
    // data-derived doc_id range-buckets, phase 2 adds the tiny broadcast
    // per-bucket offsets. No corpus-wide single-task window anywhere.
    QueryDef("q92_subword_packing", (s, d) => {
      val cap = 256
      val base = t(s, d, "documents")
        .select(col("doc_id"),
          size(graft.functions.ArrayExprs.subwordTokens(toks)).cast("long").as("n_sub"))
      val mx = base.agg(max("doc_id").as("mx"), count(lit(1)).as("cnt"))
      val sub = base.crossJoin(broadcast(mx))
        .withColumn("nb", Sampling.prefixBuckets(col("cnt")))
        .withColumn("sub", expr("doc_id div (mx div nb + 1)"))
        .drop("mx", "cnt", "nb")
      val wLocal = Window.partitionBy("sub").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val offsets = Sampling.chunkOffsets(
        sub.groupBy("sub").agg(sum("n_sub").as("tot")), "sub", "tot")
      sub
        .withColumn("local_cum", sum("n_sub").over(wLocal))
        .join(broadcast(offsets), "sub")
        .withColumn("cum_subwords", col("local_cum") + col("off"))
        .withColumn("seq_id", expr(s"(cum_subwords - n_sub) div $cap"))
        .select(col("doc_id"), col("n_sub").as("n_subwords"),
          col("seq_id"), col("cum_subwords"))
        .orderBy("doc_id")
    },
      Some(s"""WITH RECURSIVE $sqlSubwordCtes,
             |c AS (
             |  SELECT t.doc_id, coalesce(a.n_subwords, 0) AS n_sub,
             |    sum(coalesce(a.n_subwords, 0)) OVER (ORDER BY t.doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             |  FROM t LEFT JOIN agg a ON t.doc_id = a.doc_id)
             |SELECT doc_id, n_sub AS n_subwords,
             |  CAST((cum - n_sub) // 256 AS BIGINT) AS seq_id,
             |  CAST(cum AS BIGINT) AS cum_subwords
             |FROM c ORDER BY doc_id""".stripMargin)),

    // ---- Corpus-LM familiarity: n-gram frequency quality filter ----------
    // The CCNet/KenLM perplexity gate's exact-arithmetic stand-in: score
    // every document by how familiar its trigram instances are to the
    // corpus itself (sum of corpus-wide trigram counts over the doc's
    // positional trigrams) plus the fraction of trigrams unique to the
    // document. A wiki-like reference corpus would replace `cf` in
    // production; log-probabilities would break bit-parity across engines,
    // so the score stays integer until ONE final division per column.
    //
    // Scale shape: trigram instances stream out of a Generate (map-only),
    // one count shuffle keyed by trigram, one shuffled-hash join back
    // (hinted: the Generate side's size estimate is pre-explode and would
    // broadcast the corpus-sized stream; cf exits its groupBy partitioned
    // by trigram, so its exchange is reused), one per-doc aggregation.
    // Same cost envelope as q67's tf-idf — two shuffles per corpus pass.
    QueryDef("q79_lm_familiarity", (s, d) =>
      lmFamiliarity(t(s, d, "documents")).orderBy("doc_id"),
      Some(s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
             |bg AS MATERIALIZED (
             |  SELECT doc_id, unnest(list_transform(
             |    list_transform(range(1, len(tk) - 1),
             |      i -> array_to_string(tk[i:i+2], ' ')),
             |    win -> ${graft.queries.Dedup.sqlStringHash62("win")})) AS g
             |  FROM t WHERE len(tk) >= 3),
             |cf AS MATERIALIZED (SELECT g, count(*) AS c FROM bg GROUP BY g)
             |SELECT doc_id,
             |  CAST(count(*) AS BIGINT) AS n_trigrams,
             |  CAST(sum(c) AS BIGINT) AS fam_sum,
             |  CAST(sum(c) AS DOUBLE) / count(*) AS avg_familiarity,
             |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
             |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS novel_frac,
             |  CAST(sum(c) AS BIGINT) >= CAST(count(*) AS BIGINT) * 2 AS lm_ok
             |FROM bg JOIN cf USING (g)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ---- Collocation extraction: bigram lift ranking ---------------------
    // Corpus-level multiword-expression detection — the statistical
    // companion to q90's tokenizer (the same signal BPE vocabulary
    // induction maximizes): rank adjacent token pairs by lift =
    // P(ab) / (P(a)P(b)) = c_ab * N / (c_a * c_b). Classic PMI is
    // log(lift); log is rank-invariant and ln() is not bit-portable
    // across engines (q67's precedent), so the score stays one double
    // expression over exact int64 counts. A count floor prunes the
    // one-off tail before any join.
    //
    // Scale shape: the same two token-keyed count shuffles as tf-idf;
    // the lift joins run over POST-aggregation vocabulary tables (real
    // row estimates — broadcast when the vocab is small, vocabulary-keyed
    // equi-joins at web scale), the token total is a one-row broadcast,
    // and top-50 is a distributed TakeOrderedAndProject, never a global
    // single-task window.
    QueryDef("q95_collocations", (s, d) =>
      collocations(t(s, d, "documents"), minCount = 5, topK = 50),
      Some("""WITH t AS (SELECT string_split(text, ' ') AS tk FROM documents),
             |uni AS (
             |  SELECT tok, count(*) AS c
             |  FROM (SELECT unnest(tk) AS tok FROM t) GROUP BY tok),
             |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uni),
             |big AS (
             |  SELECT g[1] AS w1, g[2] AS w2, count(*) AS c_ab FROM (
             |    SELECT unnest(list_transform(range(1, len(tk)),
             |      i -> [tk[i], tk[i + 1]])) AS g
             |    FROM t)
             |  GROUP BY 1, 2
             |  HAVING count(*) >= 5)
             |SELECT w1, w2, c_ab,
             |  (CAST(c_ab AS DOUBLE) * n) / (CAST(a.c AS DOUBLE) * b.c) AS lift
             |FROM big
             |JOIN uni a ON big.w1 = a.tok
             |JOIN uni b ON big.w2 = b.tok
             |CROSS JOIN tot
             |ORDER BY lift DESC, w1, w2 LIMIT 50""".stripMargin)),

    // ---- TextRank keyword centrality: PageRank on the co-occurrence graph
    // TextRank (Mihalcea & Tarau 2004): rank tokens by weighted PageRank
    // over the token-adjacency graph — the graph-centrality upgrade of
    // q95's pairwise lift, and the keyword-extraction primitive. The
    // iteration runs in FIXED-POINT int64 (scale S = 1e10) so both
    // engines compute bit-identical ranks: per-edge contribution
    // floor(pr_u * w_uv / W_u) uses the exact two-term decomposition
    // (pr div W)*w + ((pr mod W)*w) div W — never forming pr*w, which
    // would overflow; damping 0.85 as integer (85*acc) div 100. Exact in
    // int64 while vocab * S * 85 < 2^63 (vocab < ~1e7) and
    // W_u * w_uv < 2^63 (total adjacency < ~3e9 per token) — renormalize
    // S for corpora beyond that.
    // Scale shape: the corpus is touched ONCE (bigram counts, one
    // map-combined shuffle); all 8 iterations run over the VOCAB-sized
    // edge list — at 100 TB the iteration input is vocabulary-bounded,
    // orders of magnitude smaller than the corpus, with localCheckpoint
    // truncating lineage per round (q52's pattern). The oracle unrolls
    // the 8 iterations as chained CTEs.
    QueryDef("q99_textrank", (s, d) => textrank(t(s, d, "documents")), {
      val iters = (1 to 8).map { k =>
        s"""pr$k AS (
           |  SELECT d.u AS node,
           |    1500000000 + (85 * coalesce(s.acc, 0)) // 100 AS pr
           |  FROM deg d LEFT JOIN (
           |    SELECT e.v AS node,
           |      CAST(sum((p.pr // g.wu) * e.w + ((p.pr % g.wu) * e.w) // g.wu)
           |        AS BIGINT) AS acc
           |    FROM edges e JOIN pr${k - 1} p ON e.u = p.node
           |                 JOIN deg g ON g.u = e.u
           |    GROUP BY e.v) s ON d.u = s.node)""".stripMargin
      }.mkString(",\n")
      Some(s"""WITH t AS (SELECT string_split(text, ' ') AS tk FROM documents),
             |bgd AS (
             |  SELECT g[1] AS u, g[2] AS v FROM (
             |    SELECT unnest(list_transform(range(1, len(tk)),
             |      i -> [tk[i], tk[i + 1]])) AS g
             |    FROM t)
             |  WHERE g[1] <> g[2]),
             |edges AS (
             |  SELECT u, v, CAST(count(*) AS BIGINT) AS w FROM (
             |    SELECT u, v FROM bgd UNION ALL SELECT v AS u, u AS v FROM bgd)
             |  GROUP BY u, v),
             |deg AS (SELECT u, CAST(sum(w) AS BIGINT) AS wu FROM edges GROUP BY u),
             |pr0 AS (SELECT u AS node, CAST(10000000000 AS BIGINT) AS pr FROM deg),
             |$iters
             |SELECT node AS token, pr FROM pr8
             |ORDER BY pr DESC, token LIMIT 100""".stripMargin)
    }),

    // ---- Language-ID confusion matrix: declared vs predicted -------------
    // The quality-audit rollup over q42's n-gram language detector:
    // counts per (declared lang, predicted lang) cell plus the
    // within-declared-lang fraction — the matrix that tells a curation
    // operator whether the declared metadata can be trusted and where the
    // detector needs work. Map pass + a tiny groupBy; the per-lang
    // fraction runs a window over the MATRIX (≤ langs x 2 rows), never
    // the corpus.
    QueryDef("q101_lang_confusion", (s, d) => {
      val nTok = size(toks)
      val nEn = size(filter(toks, x => x === "the" || x === "a" || x === "data"))
      val cells = t(s, d, "documents")
        .select(col("lang"),
          when(nEn.cast("double") / nTok >= 0.05, "en").otherwise("und").as("pred_lang"))
        .groupBy("lang", "pred_lang").agg(count(lit(1)).as("n"))
      cells
        .withColumn("lang_total",
          sum("n").over(Window.partitionBy("lang")))
        .select(col("lang"), col("pred_lang"), col("n"),
          (col("n").cast("double") / col("lang_total")).as("frac_of_lang"))
        .reportSorted("lang", "pred_lang")
    },
      Some("""WITH p AS (
             |  SELECT lang,
             |    CASE WHEN CAST(len(list_filter(string_split(text, ' '),
             |          x -> x = 'the' OR x = 'a' OR x = 'data')) AS DOUBLE)
             |      / len(string_split(text, ' ')) >= 0.05
             |      THEN 'en' ELSE 'und' END AS pred_lang
             |  FROM documents),
             |cells AS (
             |  SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n
             |  FROM p GROUP BY lang, pred_lang)
             |SELECT lang, pred_lang, n,
             |  CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY lang) AS frac_of_lang
             |FROM cells ORDER BY lang, pred_lang""".stripMargin)),

    // ---- Vocabulary coverage curve: corpus mass vs vocab size ------------
    // The tokenizer-design question: what fraction of corpus tokens does
    // a top-V vocabulary cover, as V grows? One map-combined shuffle for
    // the term frequencies; the global (tf DESC, token ASC) rank and
    // running mass then run as a NESTED two-phase prefix sum — a real
    // corpus's vocabulary grows ~Heaps'-law unbounded, so the frame is
    // CORPUS-DERIVED and an unpartitioned window over it would push
    // 10^8-10^9 (token, tf) rows through one task at 100 TB (the r13
    // verdict's last plan flag). Decomposition:
    //   * LEVEL phase: group the vocabulary by tf VALUE. Distinct tf
    //     values d obey d(d+1)/2 <= N (corpus token count), so the level
    //     table is O(sqrt N) — ~4.5M rows at 10^13 tokens. chunkOffsets
    //     over it (chunk = -tf, so ascending chunk = descending tf)
    //     yields each level's EXCLUSIVE token-rank and token-mass
    //     offsets in the global order.
    //   * WITHIN-LEVEL phase: ties break token-ASC. Tokens sharing a tf
    //     range-chunk by p = first-3-bytes-as-int (zero-rpadded, order-
    //     preserving for the byte order both engines compare this ASCII
    //     token domain by; hard p-domain bound 2^24 caps the chunk count
    //     per level). row_number runs per (tf, p) partition and
    //     chunkOffsets(partCols = tf) adds cross-prefix offsets. Within
    //     a level every token carries the SAME tf, so the running mass
    //     needs no second sum: it is (in-level rank) * tf.
    // rank = lv_rk_off + off + local rank; cum = lv_cm_off + (off +
    // local rank) * tf — bit-identical int64 reassociation of the flat
    // window, so the oracle keeps its flat OVER form and the hash is
    // unchanged. The grand total is one agg broadcast back (the old
    // empty-partition window), and the vocab x |V-grid| expansion
    // filters rank <= max(grid) before exploding.
    QueryDef("q104_vocab_coverage", (s, d) => {
      val vGrid = Seq(1, 2, 4, 8, 16, 32, 64, 128)
      val tf = t(s, d, "documents")
        .select(explode(toks).as("token"))
        .groupBy("token").agg(count(lit(1)).as("tf"))
      val lv = tf.groupBy("tf").agg(count(lit(1)).as("ntok"))
        .withColumn("mass", col("tf") * col("ntok"))
        .withColumn("chunk", -col("tf"))
      val rkOff = Sampling.chunkOffsets(
        lv.select("chunk", "ntok"), "chunk", "ntok")
        .withColumnRenamed("off", "lv_rk_off")
      val cmOff = Sampling.chunkOffsets(
        lv.select("chunk", "mass"), "chunk", "mass")
        .withColumnRenamed("off", "lv_cm_off")
      val lvOffs = lv.select(col("tf"), col("chunk"))
        .join(rkOff, "chunk").join(cmOff, "chunk")
        .select("tf", "lv_rk_off", "lv_cm_off")
      val total = tf.agg(sum("tf").as("total"))
      val withP = tf.withColumn("p",
        expr("CAST(conv(hex(rpad(CAST(token AS BINARY), 3, X'00')), 16, 10) AS BIGINT)"))
      val inOffs = Sampling.chunkOffsets(
        withP.groupBy("tf", "p").agg(count(lit(1)).as("nt")),
        "p", "nt", partCols = Seq("tf"))
        .join(lvOffs, "tf")
      val wIn = Window.partitionBy("tf", "p").orderBy("token")
      val ranked = withP
        .withColumn("lrk", row_number().over(wIn).cast("long"))
        .join(inOffs, Seq("tf", "p"))
        .withColumn("rank", col("lv_rk_off") + col("off") + col("lrk"))
        .withColumn("cum",
          col("lv_cm_off") + (col("off") + col("lrk")) * col("tf"))
      ranked
        .filter(col("rank") <= vGrid.max)
        .crossJoin(broadcast(total))
        .select(col("rank"), col("cum"), col("total"),
          explode(array(vGrid.map(lit): _*)).as("v"))
        .filter(col("rank") <= col("v"))
        .groupBy("v")
        .agg(max("rank").as("n_vocab"), max("cum").as("covered"), max("total").as("total"))
        .select(col("v"), col("n_vocab"), col("covered"), col("total"),
          (col("covered").cast("double") / col("total")).as("coverage"))
        .reportSorted("v")
    },
      Some("""WITH tf AS (
             |  SELECT token, CAST(count(*) AS BIGINT) AS tf
             |  FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
             |  GROUP BY token),
             |rk AS (
             |  SELECT token, tf,
             |    CAST(row_number() OVER (ORDER BY tf DESC, token) AS BIGINT) AS rank,
             |    CAST(sum(tf) OVER (ORDER BY tf DESC, token
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
             |    CAST(sum(tf) OVER () AS BIGINT) AS total
             |  FROM tf)
             |SELECT v, max(rank) AS n_vocab, max(cum) AS covered,
             |  max(total) AS total,
             |  CAST(max(cum) AS DOUBLE) / max(total) AS coverage
             |FROM rk CROSS JOIN (SELECT unnest([1,2,4,8,16,32,64,128]) AS v)
             |WHERE rank <= v
             |GROUP BY v ORDER BY v""".stripMargin)),

    // ---- PII scan + redaction --------------------------------------------
    // The compliance gate: find and redact email-shaped spans before a
    // corpus ships. The fixture text carries no PII, so the query PLANTS
    // it deterministically (docs with id % 20 == 0 get a synthetic
    // contact line — both engines construct the identical input, q106's
    // versioning trick), which keeps the operator's hit path exercised
    // and hash-verified instead of trivially zero. The pattern uses only
    // syntax Java regex and RE2 interpret identically (character
    // classes, +, bounded repetition — no backrefs, no lookaround).
    // Map-only: detection and redaction ride the scan.
    QueryDef("q114_pii_scrub", (s, d) => {
      val pii = "[a-z0-9._]+@[a-z0-9.]+\\.[a-z][a-z]+"
      val withPii = when(col("doc_id") % 20 === 0,
        concat(col("text"), lit(" contact me at user"), col("doc_id"),
          lit("@example.com please"))).otherwise(col("text"))
      t(s, d, "documents")
        .select(col("doc_id"), withPii.as("t"))
        .select(col("doc_id"),
          size(regexp_extract_all(col("t"), lit(pii), lit(0))).as("n_pii"),
          regexp_replace(col("t"), pii, "[EMAIL]").as("redacted"))
        .select(col("doc_id"), col("n_pii"),
          (col("n_pii") > 0).as("has_pii"),
          md5(col("redacted")).as("redacted_hash"),
          length(col("redacted")).as("redacted_len"))
        .orderBy("doc_id")
    },
      Some("""WITH v AS (
             |  SELECT doc_id,
             |    CASE WHEN doc_id % 20 = 0
             |      THEN text || ' contact me at user' || doc_id || '@example.com please'
             |      ELSE text END AS t
             |  FROM documents)
             |SELECT doc_id,
             |  CAST(len(regexp_extract_all(t, '[a-z0-9._]+@[a-z0-9.]+\.[a-z][a-z]+'))
             |    AS INTEGER) AS n_pii,
             |  len(regexp_extract_all(t, '[a-z0-9._]+@[a-z0-9.]+\.[a-z][a-z]+')) > 0
             |    AS has_pii,
             |  md5(regexp_replace(t, '[a-z0-9._]+@[a-z0-9.]+\.[a-z][a-z]+',
             |    '[EMAIL]', 'g')) AS redacted_hash,
             |  CAST(length(regexp_replace(t, '[a-z0-9._]+@[a-z0-9.]+\.[a-z][a-z]+',
             |    '[EMAIL]', 'g')) AS INTEGER) AS redacted_len
             |FROM v ORDER BY doc_id""".stripMargin)),

    // ---- Heaps-law vocabulary growth curve -------------------------------
    // How fast does new content appear as the corpus is ingested in id
    // order? Distinct shingles seen by each doc-count checkpoint (powers
    // of two) — the curve whose flattening says "this source is mined
    // out" (and whose exponent is Heaps' law). One shuffle attributes
    // each distinct shingle to its FIRST document (min doc_id — the
    // min-combine shape, map-side partial); checkpoints then count
    // first-occurrences at or below each cut over the distinct-shingle
    // table. The doc rank is the corpus-ordered ingest RANK (exact ids
    // may be sparse), computed TWO-PHASE like every global rank here
    // (q57/q70/q81/q92): doc_id-range chunks rank locally in parallel
    // windows, hierarchical chunkOffsets add the preceding-chunk counts
    // — bit-identical to the flat row_number() over the whole corpus,
    // with no single task ever holding the full table (the r8 verdict's
    // q115 scale flag).
    QueryDef("q115_vocab_growth", (s, d) => {
      val docs = t(s, d, "documents")
      val chunked = docs.withColumn("chunk", expr("doc_id div 64"))
      val offs = Sampling.chunkOffsets(
        chunked.groupBy("chunk").agg(count(lit(1)).as("tot")), "chunk", "tot")
      val wLoc = Window.partitionBy("chunk").orderBy("doc_id")
      val ranked = chunked
        .withColumn("loc", row_number().over(wLoc).cast("long"))
        .join(offs, "chunk")
        .withColumn("rk", col("loc") + col("off"))
      val firstSeen = ranked
        .select(col("rk"), explode(array_distinct(
          graft.functions.ArrayExprs.windowHashes(toks, 3))).as("sh"))
        .groupBy("sh").agg(min("rk").as("first_rk"))
      val cks = Seq(16, 32, 64, 128, 256, 512).map(_.toLong)
      firstSeen
        .select(col("first_rk"), explode(array(cks.map(lit): _*)).as("checkpoint"))
        .filter(col("first_rk") <= col("checkpoint"))
        .groupBy("checkpoint")
        .agg(count(lit(1)).as("distinct_shingles"))
        .reportSorted("checkpoint")
    },
      Some("""WITH rk AS (
             |  SELECT text,
             |    CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) AS rk
             |  FROM documents),
             |fs AS (
             |  SELECT sh, min(rk) AS first_rk FROM (
             |    SELECT rk,
             |      unnest(list_distinct(list_transform(
             |        list_transform(range(1, len(string_split(text, ' ')) - 1),
             |          i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')),
             |        win ->
             |          list_reduce(list_prepend(CAST(0 AS BIGINT),
             |            list_transform(range(1, length(win)+1),
             |              ci -> CAST(unicode(win[ci]) AS BIGINT))),
             |            (a,c) -> (a*131 + c) % 4294967291) * 2147483648
             |        + list_reduce(list_prepend(CAST(0 AS BIGINT),
             |            list_transform(range(1, length(win)+1),
             |              ci -> CAST(unicode(win[ci]) AS BIGINT))),
             |            (a,c) -> (a*137 + c) % 4294967291) % 2147483648))) AS sh
             |    FROM rk)
             |  GROUP BY sh)
             |SELECT CAST(checkpoint AS BIGINT) AS checkpoint,
             |  CAST(count(*) AS BIGINT) AS distinct_shingles
             |FROM fs CROSS JOIN (SELECT unnest([16,32,64,128,256,512]) AS checkpoint)
             |WHERE first_rk <= checkpoint
             |GROUP BY checkpoint ORDER BY checkpoint""".stripMargin)),

    // ---- Code-switching detection (per-half language divergence) ---------
    // Mixed-language documents poison monolingual training slices but
    // pass whole-document language ID (the dominant language wins), so
    // curation pipelines also test language CONSISTENCY: score each
    // half of the token stream independently with q42's stopword-ratio
    // heuristic and flag documents whose halves diverge — a cheap,
    // deterministic stand-in for per-span langid (the real model rides
    // the same per-span plumbing). Map-only: the halves are slice
    // arithmetic on the token array, both scores ride the scan; the
    // divergence is a subtraction of two exact int/int IEEE ratios, so
    // the flag is bit-identical on both engines.
    QueryDef("q125_code_switch", (s, d) => {
      val n = size(toks)
      def score(h: org.apache.spark.sql.Column) =
        size(filter(h, x => x === "the" || x === "a" || x === "data"))
          .cast("double") / size(h)
      t(s, d, "documents")
        .select(col("doc_id"), col("lang"), toks.as("tk"), n.as("n"))
        .filter(col("n") >= 2)
        .select(col("doc_id"), col("lang"),
          score(slice(col("tk"), lit(1), expr("n div 2"))).as("s_head"),
          score(slice(col("tk"), expr("n div 2 + 1"), expr("n - n div 2")))
            .as("s_tail"))
        .withColumn("divergence", abs(col("s_head") - col("s_tail")))
        .withColumn("mixed", col("divergence") >= 0.05)
        .orderBy("doc_id")
    },
      Some("""WITH t AS (
             |  SELECT doc_id, lang, string_split(text, ' ') AS tk,
             |    len(string_split(text, ' ')) AS n
             |  FROM documents),
             |h AS (
             |  SELECT doc_id, lang,
             |    CAST(len(list_filter(tk[1 : n // 2],
             |      x -> x = 'the' OR x = 'a' OR x = 'data')) AS DOUBLE)
             |      / (n // 2) AS s_head,
             |    CAST(len(list_filter(tk[n // 2 + 1 : n],
             |      x -> x = 'the' OR x = 'a' OR x = 'data')) AS DOUBLE)
             |      / (n - n // 2) AS s_tail
             |  FROM t WHERE n >= 2)
             |SELECT doc_id, lang, s_head, s_tail,
             |  abs(s_head - s_tail) AS divergence,
             |  abs(s_head - s_tail) >= 0.05 AS mixed
             |FROM h ORDER BY doc_id""".stripMargin)),

    // ---- Language-ID calibration (reliability diagram) -------------------
    // Is the q42 language scorer trustworthy enough to gate on? The
    // classifier-eval answer is a reliability diagram: bucket the score
    // into deciles and compare each bucket's mean score against the
    // OBSERVED fraction of truly-English documents — a calibrated
    // scorer's curve hugs the diagonal, and the gap column is the
    // actionable number (which score range over/under-claims). Bucket =
    // floor(score * 10) clamped to 9; exact int arithmetic on the
    // int/int score grid (score = k/n with k,n ints, so score*10's
    // floor is exact in IEEE); one map-combined rollup to <= 10 rows.
    QueryDef("q131_langid_calibration", (s, d) => {
      val nTok = size(toks)
      val nEn = size(filter(toks, x => x === "the" || x === "a" || x === "data"))
      t(s, d, "documents")
        .select((nEn.cast("double") / nTok).as("en_score"),
          (col("lang") === "en").as("is_en"))
        .withColumn("bucket",
          least(floor(col("en_score") * 10).cast("int"), lit(9)))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("is_en"), 1L).otherwise(0L)).as("n_en"))
        .withColumn("observed_en", col("n_en").cast("double") / col("n_docs"))
        .select("bucket", "n_docs", "n_en", "observed_en")
        .reportSorted("bucket")
    },
      Some("""WITH sc AS (
             |  SELECT
             |    CAST(len(list_filter(string_split(text, ' '),
             |          x -> x = 'the' OR x = 'a' OR x = 'data')) AS DOUBLE)
             |      / len(string_split(text, ' ')) AS en_score,
             |    lang = 'en' AS is_en
             |  FROM documents)
             |SELECT CAST(least(floor(en_score * 10), 9) AS INTEGER) AS bucket,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(CASE WHEN is_en THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
             |  CAST(sum(CASE WHEN is_en THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
             |    AS observed_en
             |FROM sc GROUP BY 1 ORDER BY bucket""".stripMargin)),

    // ---- BPE vocabulary TRAINING (merge-table induction) -----------------
    // q90 runs subword INFERENCE under a fixed vocabulary; this trains
    // the vocabulary itself — byte-pair encoding (Sennrich et al. 2016):
    // repeatedly merge the corpus's most frequent adjacent symbol pair.
    // Distributed shape: BPE statistics live on the WORD-TYPE table
    // (distinct word + its corpus count — one corpus pass, then the
    // loop never touches the corpus again; the type table is
    // vocabulary-bounded, exactly how reference BPE trainers batch).
    // Each of the 6 unrolled steps is: adjacent-pair counts weighted by
    // type count (explode of zipped slices -> map-combined sum), a
    // distributed argmax with (count DESC, pair) tie-break
    // (TakeOrderedAndProject — the driver never sees a pair), and the
    // merge applied as a codegen'd left-to-right aggregate() fold over
    // each symbol array (state = space-joined prefix whose LAST symbol
    // is the pending merge candidate; a symbol just created by this
    // step's merge can never re-merge because it no longer string-equals
    // the left element — the single-pass greedy rule). localCheckpoint
    // keeps the 6-step lineage flat (q113's trick). The oracle unrolls
    // the identical three CTEs per step; the merge fold is the same
    // CASE expression under DuckDB's list_reduce, whose no-init first
    // element equals the fold's acc='' seed branch.
    QueryDef("q118_bpe_train", (s, d) => bpeTrain(t(s, d, "documents"), 6), {
      val out = (1 to 6).map { i =>
        s"""SELECT CAST($i AS INTEGER) AS step, l AS lhs, r AS rhs,
           |  l || r AS merged, pc AS pair_count FROM b$i""".stripMargin
      }.mkString("\nUNION ALL\n")
      Some(s"""WITH ${sqlBpeCtes(6)}
             |$out
             |ORDER BY step""".stripMargin)
    }),

    // ---- Trained-tokenizer application (the q118 -> corpus loop) ---------
    // q91 closed the IVF lifecycle (build -> extend -> query); this
    // closes the tokenizer's: segment the corpus under the merge table
    // q118 just trained, reporting per-document subword counts and
    // fertility. The segmented TYPE table is vocabulary-bounded, so the
    // application pass is a single broadcast equi-join on the word — the
    // corpus is touched once after training. Oracle reuses q118's exact
    // unrolled CTE chain (the word column rides the whole chain) and
    // joins it back to the token stream.
    QueryDef("q128_bpe_apply", (s, d) => bpeApply(t(s, d, "documents"), 6),
      Some(s"""WITH ${sqlBpeCtes(6)},
             |seg AS (SELECT w, CAST(len(syms) AS BIGINT) AS n_sub FROM s6),
             |e AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
             |      FROM documents)
             |SELECT doc_id,
             |  CAST(count(*) AS BIGINT) AS n_words,
             |  CAST(sum(n_sub) AS BIGINT) AS n_subwords,
             |  CAST(sum(n_sub) AS DOUBLE) / count(*) AS fertility
             |FROM e JOIN seg USING (w)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ---- Tokenizer fertility by language ---------------------------------
    // The multilingual-equity report for the q118-trained tokenizer:
    // fertility (subwords per word) and compression (chars per subword)
    // PER LANGUAGE. A tokenizer trained on a skewed mix charges
    // under-represented languages more subwords per word — this is the
    // table that prices that, and the reason teams retrain with
    // temperature-balanced mixes (q76/q122). Same trained segmentation
    // as q128 (bpeStates is shared, so engine and oracle cannot drift);
    // the rollup key is just lang instead of doc_id — one broadcast join
    // on the bounded word-TYPE table plus a 5-row aggregate.
    QueryDef("q136_tokenizer_fertility", (s, d) => {
      val docs = t(s, d, "documents")
      val seg = bpeStates(docs, 6, retainMerges = false)._2
        .select(col("w"), size(col("syms")).cast("long").as("n_sub"))
      docs.select(col("lang"), explode(toks).as("w"))
        .join(broadcast(seg), "w")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_words"),
          sum("n_sub").as("n_subwords"),
          sum(length(col("w")).cast("long")).as("n_chars"))
        .withColumn("fertility",
          col("n_subwords").cast("double") / col("n_words"))
        .withColumn("chars_per_subword",
          col("n_chars").cast("double") / col("n_subwords"))
        .select("lang", "n_words", "n_subwords", "n_chars", "fertility",
          "chars_per_subword")
        .reportSorted("lang")
    },
      Some(s"""WITH ${sqlBpeCtes(6)},
             |seg AS (SELECT w, CAST(len(syms) AS BIGINT) AS n_sub FROM s6),
             |e AS (SELECT lang, unnest(string_split(text, ' ')) AS w
             |      FROM documents)
             |SELECT lang,
             |  CAST(count(*) AS BIGINT) AS n_words,
             |  CAST(sum(n_sub) AS BIGINT) AS n_subwords,
             |  CAST(sum(length(w)) AS BIGINT) AS n_chars,
             |  CAST(sum(n_sub) AS DOUBLE) / count(*) AS fertility,
             |  CAST(sum(length(w)) AS DOUBLE) / sum(n_sub) AS chars_per_subword
             |FROM e JOIN seg USING (w)
             |GROUP BY lang ORDER BY lang""".stripMargin)),

    // ---- Inverted-index build (posting lists, delta-encoded) -------------
    // The IR-side index structure: per token, document frequency,
    // collection frequency, and the HEAD of the sorted posting list
    // (first 20 doc ids) delta-encoded — the varint-friendly form a real
    // index shard serializes. The head is ranked by the exact int64
    // bottom-k aggregator, NOT collect_list-then-sort: a stop word's
    // posting list is the size of the corpus, so per-group state must be
    // bounded (O(k) buffer, map-side partials) for the build to survive
    // 100 TB. df/cf stay full-corpus counts (O(1) state). Two keyed
    // aggregations + a token-keyed join of two token-sized tables.
    QueryDef("q155_inverted_index", (s, d) => {
      val spark = s
      import spark.implicits._
      val posting = t(s, d, "documents")
        .select(col("doc_id"), explode(toks).as("token"))
        .groupBy("token", "doc_id").agg(count(lit(1)).as("tf"))
      val stats = posting.groupBy("token")
        .agg(count(lit(1)).as("df"), sum("tf").as("cf"))
      val bottomk = new graft.functions.BottomKLongAgg(20).toColumn
      val heads = posting.select(col("token"), col("doc_id")).as[(String, Long)]
        .groupByKey(_._1)
        .mapValues(r => (r._2, r._2))
        .agg(bottomk.name("top"))
        .toDF("token", "top")
        .select(col("token"), transform(col("top"), p => p.getField("_1")).as("p"))
      stats.join(heads, "token")
        .withColumn("deltas", zip_with(col("p"),
          concat(array(lit(0L)), slice(col("p"), lit(1), size(col("p")) - 1)),
          (a, b) => a - b))
        .select(col("token"), col("df"), col("cf"),
          array_join(transform(col("deltas"), x => x.cast("string")), ",")
            .as("postings_delta_csv"))
        .orderBy("token")
    },
      Some("""WITH pl AS MATERIALIZED (
             |  SELECT token, doc_id, CAST(count(*) AS BIGINT) AS tf
             |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
             |        FROM documents)
             |  GROUP BY token, doc_id),
             |agg AS (
             |  SELECT token, CAST(count(*) AS BIGINT) AS df,
             |    CAST(sum(tf) AS BIGINT) AS cf,
             |    (list(doc_id ORDER BY doc_id))[1:20] AS p
             |  FROM pl GROUP BY token)
             |SELECT token, df, cf,
             |  array_to_string(list_transform(range(1, len(p) + 1),
             |    i -> CAST(p[i] - (CASE WHEN i = 1 THEN 0 ELSE p[i - 1] END)
             |      AS VARCHAR)), ',') AS postings_delta_csv
             |FROM agg ORDER BY token""".stripMargin)),

    // ---- Per-source lexical diversity profile ----------------------------
    // The data-mixing diagnostic behind "is this source template spam":
    // type-token ratio, top-token concentration, and the INVERSE SIMPSON
    // index N²/Σc_i² — the "effective vocabulary size" (how many equally
    // common tokens would produce the same repeat-collision rate). A
    // rational diversity measure chosen over Shannon entropy
    // deliberately: entropy needs ln(), which is not IEEE-reproducible
    // across engines (the q67 idf rule), while Simpson is two exact
    // int64 sums and a couple of correctly-rounded double ops.
    //
    // Scale shape: one (source, token)-keyed count shuffle with map-side
    // combine, then a per-source rollup over the vocabulary-bounded
    // count table — no corpus sort, no per-doc state. Σc² fits int64 to
    // ~3e9 occurrences of a single token per source; past that the sums
    // promote to DECIMAL(38) (exact and order-free, unlike double sums).
    QueryDef("q178_token_diversity", (s, d) =>
      tokenDiversity(t(s, d, "documents")).reportSorted("source"),
      Some("""WITH counts AS MATERIALIZED (
             |  SELECT source, tok, CAST(count(*) AS BIGINT) AS c
             |  FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
             |        FROM documents)
             |  GROUP BY source, tok),
             |roll AS (
             |  SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
             |    CAST(count(*) AS BIGINT) AS n_types,
             |    CAST(sum(c * c) AS BIGINT) AS sumsq,
             |    CAST(max(c) AS BIGINT) AS max_c
             |  FROM counts GROUP BY source)
             |SELECT source, n_tokens, n_types,
             |  CAST(n_types AS DOUBLE) / n_tokens AS ttr,
             |  CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE)
             |    / CAST(sumsq AS DOUBLE) AS inv_simpson,
             |  CAST(max_c AS DOUBLE) / n_tokens AS top_share
             |FROM roll ORDER BY source""".stripMargin)),

    // ---- Positional phrase search ----------------------------------------
    // The query side of the q155 inverted index: find every occurrence
    // (doc, token position) of an exact multi-word phrase. Phrases here
    // are the corpus's own 3 most frequent trigrams (data-derived, so
    // the query is self-contained and non-empty at every SF); the match
    // primitive — a phrase IS an n-token window — is the same positional
    // window stream q78's substring dedup runs on, so phrase search
    // costs one posexplode pass + a 3-row broadcast join, no positional
    // posting intersection needed at any corpus size. Output carries
    // corpus frequency and document frequency per phrase plus every
    // (doc_id, pos) hit.
    QueryDef("q186_phrase_search", (s, d) => {
      // Positional NON-deduped windows (ArrayExprs.shingles dedupes per
      // doc, which would drop repeat occurrences and renumber positions),
      // on the 62-bit WINDOW HASH (q78's narrow-key rule): counting runs
      // over 8-byte keys via the codegen'd windowHashes expression — a
      // per-window string concat + string-keyed shuffle measured 5x
      // slower on this, the corpus-heaviest pass of the query. Phrase
      // TEXT is reconstructed only for the top-3 matches (a bounded
      // row set) by re-slicing the matching documents' token arrays;
      // the oracle recomputes the identical hash, so parity includes
      // any collision.
      val tk = split(col("text"), " ")
      val tri = t(s, d, "documents")
        .select(col("doc_id"), posexplode(
          graft.functions.ArrayExprs.windowHashes(tk, 3)).as(Seq("pos", "h")))
      val top = tri.groupBy("h")
        .agg(count(lit(1)).as("cf"), countDistinct("doc_id").as("df"))
        .orderBy(col("cf").desc, col("h")).limit(3)
        // rank over the limit(3) pool — partitioned on a constant so the
        // (bounded) frame never trips the no-partition WindowExec warning
        .withColumn("phrase_rank",
          row_number().over(
            Window.partitionBy(Sampling.onePart(col("cf"))).orderBy(col("cf").desc, col("h"))))
      tri.join(broadcast(top), "h")
        .join(t(s, d, "documents").select(col("doc_id"), tk.as("tk")), "doc_id")
        .select(col("phrase_rank"),
          array_join(slice(col("tk"), col("pos") + 1, lit(3)), " ").as("phrase"),
          col("cf"), col("df"), col("doc_id"), col("pos"))
        .orderBy("phrase_rank", "doc_id", "pos")
    },
      Some(s"""WITH s AS MATERIALIZED (
             |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
             |hw AS MATERIALIZED (
             |  SELECT doc_id,
             |    list_transform(range(1, len(tk) - 1),
             |      i -> ${Dedup.sqlStringHash62("array_to_string(tk[i:i+2], ' ')")})
             |      AS hs
             |  FROM s),
             |p AS MATERIALIZED (
             |  SELECT doc_id, unnest(hs) AS h,
             |    CAST(unnest(range(len(hs))) AS INTEGER) AS pos
             |  FROM hw),
             |top AS MATERIALIZED (
             |  SELECT h, cf, df,
             |    CAST(row_number() OVER (ORDER BY cf DESC, h) AS INTEGER)
             |      AS phrase_rank
             |  FROM (SELECT h, CAST(count(*) AS BIGINT) AS cf,
             |          CAST(count(DISTINCT doc_id) AS BIGINT) AS df
             |        FROM p GROUP BY h
             |        ORDER BY cf DESC, h LIMIT 3))
             |SELECT phrase_rank,
             |  array_to_string(s.tk[pos+1:pos+3], ' ') AS phrase,
             |  cf, df, p.doc_id, pos
             |FROM p JOIN top ON p.h = top.h
             |JOIN s ON p.doc_id = s.doc_id
             |ORDER BY phrase_rank, p.doc_id, pos""".stripMargin)),

    // ---- Lexical-complexity profile (syllable proxy) ---------------------
    // The readability-filter ingredients (Flesch/Gunning-Fog family)
    // that survive a sentence-less corpus: per-document syllable proxy
    // (vowel groups — the standard cheap estimator), mean syllables per
    // word, and the fraction of "complex" (≥3-syllable) words. Pure
    // map-side per-row expressions — ONE regexp pass for the global
    // count plus a higher-order filter over the token array, no
    // shuffle at all until the final presentation sort; at 100 TB this
    // is the same embarrassingly-parallel shape as q40/q41 and composes
    // into the q116 ensemble score as one more signal. All ratios are
    // single IEEE divides over exact ints.
    QueryDef("q204_lexical_complexity", (s, d) => {
      val nSyl = size(regexp_extract_all(col("text"), lit("[aeiou]+"), lit(0)))
      val nComplex = size(filter(toks,
        w => size(regexp_extract_all(w, lit("[aeiou]+"), lit(0))) >= 3))
      t(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          size(toks).as("n_tokens"),
          nSyl.cast("long").as("n_syllables"),
          nComplex.cast("long").as("n_complex"),
          (nSyl.cast("double") / size(toks).cast("double")).as("syl_per_word"),
          (nComplex.cast("double") / size(toks).cast("double")).as("complex_frac"))
        .orderBy("doc_id")
    },
      Some("""SELECT doc_id, lang,
             |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
             |  CAST(len(regexp_extract_all(text, '[aeiou]+')) AS BIGINT)
             |    AS n_syllables,
             |  CAST(len(list_filter(string_split(text, ' '),
             |    w -> len(regexp_extract_all(w, '[aeiou]+')) >= 3)) AS BIGINT)
             |    AS n_complex,
             |  CAST(len(regexp_extract_all(text, '[aeiou]+')) AS DOUBLE)
             |    / CAST(len(string_split(text, ' ')) AS DOUBLE) AS syl_per_word,
             |  CAST(len(list_filter(string_split(text, ' '),
             |    w -> len(regexp_extract_all(w, '[aeiou]+')) >= 3)) AS DOUBLE)
             |    / CAST(len(string_split(text, ' ')) AS DOUBLE) AS complex_frac
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- Corpus dispersion: variance-to-mean ratio per token type --------
    // Burstiness profiling (Church & Gale's VMR): a token whose
    // occurrences CLUMP into few documents (VMR >> 1) is topical or
    // boilerplate; a token spread evenly (VMR ≈ 1, Poisson) is
    // function-like. The signal behind stopword induction and
    // boilerplate screens that raw frequency (q53) can't give. Shape:
    // per-(token, doc) counts (the q53 aggregation), folded to exact
    // int64 moments per TYPE — output is bounded by vocabulary, not
    // corpus — with the all-docs zeros handled algebraically
    // (VMR = (N·Σx² − (Σx)²)/(N·Σx) over nonzero counts only), so the
    // zero-inflated docs cost nothing. One corpus scan, two keyed aggs.
    QueryDef("q207_token_dispersion", (s, d) => {
      val docs = t(s, d, "documents")
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      docs.select(col("doc_id"), explode(toks).as("tok"))
        .groupBy("tok", "doc_id").agg(count(lit(1)).as("c"))
        .groupBy("tok")
        .agg(count(lit(1)).as("df"), sum(col("c")).as("total"),
          sum(col("c") * col("c")).as("sumsq"))
        .crossJoin(broadcast(nDocs))
        .select(col("tok"), col("df"), col("total"),
          (col("total").cast("double") / col("n_docs").cast("double"))
            .as("mean_per_doc"),
          ((col("n_docs") * col("sumsq") - col("total") * col("total"))
            .cast("double") / (col("n_docs") * col("total")).cast("double"))
            .as("vmr"))
        .orderBy("tok")
    },
      Some("""WITH c AS MATERIALIZED (
             |  SELECT tok, doc_id, CAST(count(*) AS BIGINT) AS c
             |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             |        FROM documents)
             |  GROUP BY tok, doc_id),
             |m AS (
             |  SELECT tok, CAST(count(*) AS BIGINT) AS df,
             |    CAST(sum(c) AS BIGINT) AS total,
             |    CAST(sum(c * c) AS BIGINT) AS sumsq
             |  FROM c GROUP BY tok),
             |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
             |SELECT tok, df, total,
             |  CAST(total AS DOUBLE) / CAST(n_docs AS DOUBLE) AS mean_per_doc,
             |  CAST(n_docs * sumsq - total * total AS DOUBLE)
             |    / CAST(n_docs * total AS DOUBLE) AS vmr
             |FROM m CROSS JOIN nd ORDER BY tok""".stripMargin)),

    // ---- Chance-corrected labeler agreement (Cohen's kappa) --------------
    // The missing scalar behind q101's confusion matrix and q131's
    // calibration: raw agreement between the q42 heuristic and the
    // stored label is inflated by class prevalence (a majority-class
    // predictor "agrees" often by luck). Cohen's kappa corrects with
    // the marginal-product expected agreement — the standard QA gate
    // before a cheap labeler is trusted to route training data. Binary
    // task here (en vs not), per source so drift localizes to a feed.
    // One pass: four conditional int64 sums per source (map-side
    // combinable), then a handful of double ops per group — nothing
    // scales with corpus size after the scan. pe = 1 (degenerate
    // single-class marginals on BOTH sides) is reported as kappa = 1
    // when agreement is also perfect, the standard convention.
    QueryDef("q270_langid_kappa", (s, d) => {
      val nTok = size(toks)
      val nEn = size(filter(toks, x => x === "the" || x === "a" || x === "data"))
      kappaAgreement(t(s, d, "documents"),
        col("lang") === "en", nEn.cast("double") / nTok >= 0.05, "source")
        .reportSorted("source")
    },
      Some("""WITH g AS MATERIALIZED (
             |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |    CAST(sum(CASE WHEN te AND pe THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n11,
             |    CAST(sum(CASE WHEN NOT te AND NOT pe THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n00,
             |    CAST(sum(CASE WHEN te AND NOT pe THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n10,
             |    CAST(sum(CASE WHEN NOT te AND pe THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n01
             |  FROM (
             |    SELECT source, lang = 'en' AS te,
             |      CAST(len(list_filter(string_split(text, ' '),
             |            x -> x = 'the' OR x = 'a' OR x = 'data')) AS DOUBLE)
             |        / len(string_split(text, ' ')) >= 0.05 AS pe
             |    FROM documents)
             |  GROUP BY source),
             |r AS (
             |  SELECT source, n_docs, n11, n00, n10, n01,
             |    CAST(n11 + n00 AS DOUBLE) / CAST(n_docs AS DOUBLE) AS po,
             |    (CAST(n11 + n10 AS DOUBLE) / CAST(n_docs AS DOUBLE))
             |      * (CAST(n11 + n01 AS DOUBLE) / CAST(n_docs AS DOUBLE))
             |    + (1e0 - CAST(n11 + n10 AS DOUBLE) / CAST(n_docs AS DOUBLE))
             |      * (1e0 - CAST(n11 + n01 AS DOUBLE) / CAST(n_docs AS DOUBLE))
             |      AS pex
             |  FROM g)
             |SELECT source, n_docs, n11, n00, n10, n01,
             |  po AS p_observed, pex AS p_expected,
             |  CASE WHEN pex = 1e0 THEN 1e0
             |       ELSE (po - pex) / (1e0 - pex) END AS kappa
             |FROM r ORDER BY source""".stripMargin)),

    // ---- KV prefix-cache savings estimator --------------------------------
    // The serving/training-loader question behind prefix caching: if
    // sequences sharing a common k-token prefix are routed to the same
    // replica, how many prefill tokens never recompute? For k in
    // {8, 16, 32} (one scan — the q280 sweep-in-one-pass rule, cells as
    // an exploded 3-struct array): group documents by the 62-bit hash
    // of their k-prefix (first window of the established window-hash,
    // so the oracle replays it exactly); a group of size g saves
    // (g-1)*k prefill tokens. Short documents are ineligible for that
    // k and counted out. Everything is a grouped count over 8-byte
    // keys; the one-row corpus-token total is q76's broadcast class.
    QueryDef("q288_prefix_cache_savings", (s, d) => {
      val ks = Seq(8, 16, 32)
      val docs = t(s, d, "documents")
      val cells = docs
        .select(array(ks.map(k => struct(lit(k).as("k"),
          when(size(toks) >= k, element_at(
            graft.functions.ArrayExprs.windowHashes(slice(toks, 1, k), k), 1))
            .otherwise(lit(null).cast("long")).as("h"))): _*).as("per"))
        .select(explode(col("per")).as("c"))
        .select(col("c.k").as("k"), col("c.h").as("h"))
        .filter(col("h").isNotNull)
      val perK = cells.groupBy("k", "h").agg(count(lit(1)).as("ng"))
        .groupBy("k")
        .agg(count(lit(1)).as("n_groups"), sum("ng").as("n_eligible"),
          sum(when(col("ng") > 1, col("ng")).otherwise(0L)).as("n_shared_docs"),
          sum((col("ng") - 1) * col("k")).as("tokens_saved"))
      val tot = docs.agg(sum(size(toks)).as("total_tokens"))
      perK.crossJoin(broadcast(tot))
        .select(col("k"), col("n_eligible"), col("n_groups"),
          col("n_shared_docs"), col("tokens_saved"),
          (col("tokens_saved").cast("double") /
            col("total_tokens").cast("double")).as("save_frac"))
        .reportSorted("k")
    },
      Some(s"""WITH tkt AS MATERIALIZED (
             |  SELECT string_split(text, ' ') AS tk FROM documents),
             |cells AS MATERIALIZED (
             |  SELECT k,
             |    ${Dedup.sqlStringHash62("array_to_string(tk[1:k], ' ')")} AS h
             |  FROM tkt, (SELECT unnest([8, 16, 32]) AS k)
             |  WHERE len(tk) >= k),
             |grp AS MATERIALIZED (
             |  SELECT k, h, CAST(count(*) AS BIGINT) AS ng
             |  FROM cells GROUP BY 1, 2),
             |pk AS (
             |  SELECT k, CAST(count(*) AS BIGINT) AS n_groups,
             |    CAST(sum(ng) AS BIGINT) AS n_eligible,
             |    CAST(sum(CASE WHEN ng > 1 THEN ng ELSE 0 END) AS BIGINT)
             |      AS n_shared_docs,
             |    CAST(sum((ng - 1) * k) AS BIGINT) AS tokens_saved
             |  FROM grp GROUP BY k),
             |tot AS (SELECT CAST(sum(len(tk)) AS BIGINT) AS total_tokens
             |        FROM tkt)
             |SELECT CAST(k AS INTEGER) AS k, n_eligible, n_groups,
             |  n_shared_docs, tokens_saved,
             |  CAST(tokens_saved AS DOUBLE) / CAST(total_tokens AS DOUBLE)
             |    AS save_frac
             |FROM pk CROSS JOIN tot
             |ORDER BY k""".stripMargin)),

    // ---- BM25 parameter sweep scored against known near-dup targets ------
    // The retrieval-tuning loop as ONE query: six (k1, b) cells scored
    // in a single posting-list pass (each cell is just another
    // conditional sum column in the same aggregation — the q229 "sweep
    // without rescanning" rule applied to ranking), evaluated by where
    // each anchor's VERIFIED near-dup partner (q45's pair set — free
    // relevance labels, the standard trick when no judgments exist)
    // lands in the cell's ranking. The partner's rank is computed
    // WITHOUT any ranking window: rank = 1 + count(candidates scoring
    // strictly better, ties to smaller id) — one keyed aggregation, so
    // nothing sorts a corpus-sized candidate list even at 100 TB.
    // Bounded: <= 32 eval cases (q48's anchor contract). Scores are
    // q88's fixed-point int64, so cross-cell comparisons are exact.
    QueryDef("q280_bm25_sweep", (s, d) => {
      val docs = t(s, d, "documents")
      val cases = graft.queries.Dedup.nearDupPairsOf(docs)
        .select(col("doc_a").as("q_id"), col("doc_b").as("target"))
        .orderBy("q_id", "target").limit(32)
        .materialize // broadcast into the case and partner joins
      val aTerms = docs
        .join(broadcast(cases.select("q_id").distinct()),
          col("doc_id") === col("q_id"))
        .select(col("q_id"), explode(array_distinct(toks)).as("term"))
      val e = docs
        .select(col("doc_id"), size(toks).as("len"), explode(toks).as("term"))
        .join(broadcast(aTerms.select("term").distinct()), Seq("term"), "left_semi")
      val stats = docs.agg(count(lit(1)).as("n"), sum(size(toks)).as("sumlen"))
      val tf = e.groupBy("doc_id", "term")
        .agg(count(lit(1)).as("tf"), min("len").as("len"))
      val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val cellSums = bm25Grid.zipWithIndex.map { case ((k1, b), i) =>
        sum(bm25ParamFixed(k1, b)).as(s"s$i")
      }
      val scored = broadcast(aTerms).join(tf, "term").join(dfreq, "term")
        .crossJoin(broadcast(stats))
        .filter(col("doc_id") =!= col("q_id"))
        .groupBy("q_id", "doc_id")
        .agg(cellSums.head, cellSums.tail: _*)
        .join(broadcast(cases), "q_id")
      val pScores = scored.filter(col("doc_id") === col("target"))
        .select(col("q_id") +: col("target") +:
          bm25Grid.indices.map(i => col(s"s$i").as(s"p$i")): _*)
      val rankCols = bm25Grid.indices.map { i =>
        (lit(1L) + sum(when(col(s"s$i") > col(s"p$i") ||
          (col(s"s$i") === col(s"p$i") && col("doc_id") < col("target")),
          1L).otherwise(0L))).as(s"r$i")
      }
      val ranks = scored
        .join(broadcast(pScores), Seq("q_id", "target"))
        .groupBy("q_id", "target")
        .agg(rankCols.head, rankCols.tail: _*)
      val finCols = bm25Grid.indices.flatMap { i =>
        Seq(sum(col(s"r$i")).as(s"sr$i"),
          sum(when(col(s"r$i") === 1, 1L).otherwise(0L)).as(s"h1_$i"),
          sum(when(col(s"r$i") <= 10, 1L).otherwise(0L)).as(s"h10_$i"))
      } :+ count(lit(1)).as("n_eval")
      val fin = ranks.agg(finCols.head, finCols.tail: _*).materialize
      // r16: the six sweep-cell rows are one Project + explode over the
      // 1-row materialized eval frame instead of a 6-branch union (six
      // scans of the same blocks + a range-sampled terminal sort);
      // values identical, sweep grid is bounded by construction.
      fin.select(explode(array(bm25Grid.zipWithIndex.map { case ((k1, b), i) =>
          struct(lit(k1).as("k1"), lit(b).as("b"),
            col("n_eval").as("n_eval"),
            (col(s"sr$i").cast("double") / col("n_eval").cast("double"))
              .as("mean_rank"),
            col(s"h1_$i").as("hits_at_1"), col(s"h10_$i").as("hits_at_10")) }: _*)).as("x"))
        .select(col("x.k1").as("k1"), col("x.b").as("b"),
          col("x.n_eval").as("n_eval"), col("x.mean_rank").as("mean_rank"),
          col("x.hits_at_1").as("hits_at_1"), col("x.hits_at_10").as("hits_at_10"))
        .reportSorted("k1", "b")
    },
      Some {
        val cellScores = Text.bm25Grid.zipWithIndex.map { case ((k1, b), i) =>
          s"CAST(sum(${sqlBm25Param(k1, b)}) AS BIGINT) AS s$i"
        }.mkString(",\n    ")
        val pCols = bm25Grid.indices.map(i => s"s.s$i AS p$i").mkString(", ")
        val rCols = bm25Grid.indices.map { i =>
          s"""CAST(1 + sum(CASE WHEN s.s$i > p.p$i
             |      OR (s.s$i = p.p$i AND s.doc_id < p.target)
             |      THEN 1 ELSE 0 END) AS BIGINT) AS r$i""".stripMargin
        }.mkString(",\n    ")
        val fCols = bm25Grid.indices.flatMap { i =>
          Seq(s"CAST(sum(r$i) AS BIGINT) AS sr$i",
            s"CAST(sum(CASE WHEN r$i = 1 THEN 1 ELSE 0 END) AS BIGINT) AS h1_$i",
            s"CAST(sum(CASE WHEN r$i <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS h10_$i")
        }.mkString(",\n    ")
        val cells = Text.bm25Grid.zipWithIndex.map { case ((k1, b), i) =>
          s"""SELECT CAST($k1 AS DOUBLE) AS k1, CAST($b AS DOUBLE) AS b,
             |  n_eval,
             |  CAST(sr$i AS DOUBLE) / CAST(n_eval AS DOUBLE) AS mean_rank,
             |  h1_$i AS hits_at_1, h10_$i AS hits_at_10 FROM fin""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"""WITH ${graft.queries.Dedup.sqlPairCtes()},
           |cases AS MATERIALIZED (
           |  SELECT doc_a AS q_id, doc_b AS target FROM pairs
           |  ORDER BY doc_a, doc_b LIMIT 32),
           |dd AS MATERIALIZED (
           |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
           |at AS MATERIALIZED (
           |  SELECT c.q_id, unnest(list_distinct(tk)) AS term
           |  FROM dd JOIN (SELECT DISTINCT q_id FROM cases) c
           |    ON dd.doc_id = c.q_id),
           |ee AS MATERIALIZED (
           |  SELECT doc_id, len(tk) AS len, unnest(tk) AS term FROM dd),
           |tfq AS MATERIALIZED (
           |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf,
           |    CAST(min(len) AS BIGINT) AS len
           |  FROM ee GROUP BY 1, 2),
           |dfq AS MATERIALIZED (
           |  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tfq
           |  GROUP BY 1),
           |stats AS (
           |  SELECT CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(len(tk)) AS BIGINT) AS sumlen FROM dd),
           |scored AS MATERIALIZED (
           |  SELECT a.q_id, t.doc_id,
           |    $cellScores
           |  FROM at a JOIN tfq t USING (term) JOIN dfq USING (term)
           |  CROSS JOIN stats
           |  WHERE t.doc_id != a.q_id
           |  GROUP BY 1, 2),
           |ps AS MATERIALIZED (
           |  SELECT s.q_id, c.target, $pCols
           |  FROM scored s JOIN cases c
           |    ON s.q_id = c.q_id AND s.doc_id = c.target),
           |rk AS MATERIALIZED (
           |  SELECT s.q_id, p.target,
           |    $rCols
           |  FROM scored s JOIN ps p ON s.q_id = p.q_id
           |  GROUP BY 1, 2),
           |fin AS MATERIALIZED (
           |  SELECT CAST(count(*) AS BIGINT) AS n_eval,
           |    $fCols
           |  FROM rk)
           |SELECT * FROM (
           |$cells)
           |ORDER BY k1, b""".stripMargin
      }),
  )

  /** Shared DuckDB CTE chain replaying the q118 BPE training loop with
    * the word column carried end-to-end: w0 (type counts) -> s0 (char
    * symbols) -> [p_i pair counts, b_i best pair, s_i merged] x steps.
    * q118 reads the b_i tables; q128 reads the final s_steps. */
  private def sqlBpeCtes(steps: Int): String = {
    val chain = (1 to steps).map { i =>
      val prev = s"s${i - 1}"
      s"""p$i AS (
         |  SELECT l, r, CAST(sum(cnt) AS BIGINT) AS pc FROM (
         |    SELECT cnt,
         |      unnest(list_transform(range(1, len(syms)), x -> syms[x])) AS l,
         |      unnest(list_transform(range(1, len(syms)), x -> syms[x+1])) AS r
         |    FROM $prev)
         |  GROUP BY l, r),
         |b$i AS (SELECT l, r, pc FROM p$i ORDER BY pc DESC, l, r LIMIT 1),
         |s$i AS (
         |  SELECT w, cnt, string_split(list_reduce(syms, (acc, x) ->
         |    CASE WHEN (acc = l OR ends_with(acc, ' ' || l)) AND x = r
         |         THEN left(acc, length(acc) - length(l)) || l || r
         |         ELSE acc || ' ' || x END), ' ') AS syms
         |  FROM $prev CROSS JOIN b$i)""".stripMargin
    }.mkString(",\n")
    s"""w0 AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM (
       |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  GROUP BY w),
       |s0 AS (
       |  SELECT w, cnt, list_transform(range(1, length(w) + 1),
       |    x -> w[x]) AS syms FROM w0),
       |$chain""".stripMargin
  }

  /** The BPE training loop shared by q118 (merge table) and q128
    * (trained segmentation): returns (merge table, final word-type
    * table (w, cnt, syms)). The word column rides the whole chain so
    * the trained segmentation stays joinable back to the corpus. */
  private def bpeStates(documents: DataFrame, steps: Int,
      retainMerges: Boolean = true): (Option[DataFrame], DataFrame) = {
    var wt = documents
      .select(explode(toks).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(col("w"), col("cnt"),
        expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
          .as("syms"))
      .materialize
    var merges: Option[DataFrame] = None
    for (i <- 1 to steps) {
      val best0 = wt
        .select(col("cnt"), explode(arrays_zip(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1))).as("p"))
        .groupBy(col("p.0").as("l"), col("p.1").as("r"))
        .agg(sum("cnt").as("pc"))
        .orderBy(col("pc").desc, col("l"), col("r")).limit(1)
        .withColumn("step", lit(i))
      // r16: `best` is materialized ONLY when the caller keeps the merge
      // table (q118) — it is then retained as a row of the result. The
      // apply-side callers (q128/q136) consume each step's best exactly
      // once, as the broadcast build inside the next word-type
      // materialize, so a separate scheduled action per step bought
      // nothing: lazy, the 1-row TakeOrdered subtree rides that action.
      val best = if (retainMerges)
        best0.materialize // retained: a row of the returned merge table
      else best0
      if (retainMerges)
        merges = Some(merges.map(_.union(best)).getOrElse(best))
      val prev = wt
      wt = wt.crossJoin(broadcast(best.select("l", "r")))
        .select(col("w"), col("cnt"), expr(
          """split(aggregate(syms, '', (acc, x) ->
            |  CASE WHEN acc = '' THEN x
            |       WHEN (acc = l OR endswith(acc, concat(' ', l))) AND x = r
            |       THEN concat(substring(acc, 1, length(acc) - length(l)), l, r)
            |       ELSE concat(acc, ' ', x) END), ' ')""".stripMargin).as("syms"))
        .materialize
      // the superseded word-type table releases; a retained step `best`
      // stays persisted — it is a row of the returned merge table
      prev.release()
    }
    (merges, wt)
  }

  /** BPE merge-table training — q118's body, exposed for library use and
    * the scale probe. Returns the `steps`-row merge table
    * (step, lhs, rhs, merged, pair_count) in training order. */
  def bpeTrain(documents: DataFrame, steps: Int): DataFrame =
    bpeStates(documents, steps)._1.get
      .select(col("step"), col("l").as("lhs"), col("r").as("rhs"),
        concat(col("l"), col("r")).as("merged"), col("pc").as("pair_count"))
      .orderBy("step")

  /** Cohen's kappa between two BOOLEAN labelers per group — q270's body,
    * exposed for fixture laws. po = raw agreement, pe = marginal-product
    * chance agreement, kappa = (po - pe) / (1 - pe); the degenerate
    * pe = 1 case (both labelers single-class) reports 1. */
  def kappaAgreement(df: DataFrame, truth: Column, pred: Column,
      grp: String): DataFrame = {
    val g = df
      .select(col(grp), truth.as("te"), pred.as("pe"))
      .groupBy(grp)
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("te") && col("pe"), 1L).otherwise(0L)).as("n11"),
        sum(when(!col("te") && !col("pe"), 1L).otherwise(0L)).as("n00"),
        sum(when(col("te") && !col("pe"), 1L).otherwise(0L)).as("n10"),
        sum(when(!col("te") && col("pe"), 1L).otherwise(0L)).as("n01"))
    val nD = col("n_docs").cast("double")
    val po = (col("n11") + col("n00")).cast("double") / nD
    val pa = (col("n11") + col("n10")).cast("double") / nD
    val pb = (col("n11") + col("n01")).cast("double") / nD
    val pexp = pa * pb + (lit(1.0) - pa) * (lit(1.0) - pb)
    g.select(col(grp), col("n_docs"), col("n11"), col("n00"),
      col("n10"), col("n01"), po.as("p_observed"), pexp.as("p_expected"),
      when(pexp === 1.0, lit(1.0))
        .otherwise((po - pexp) / (lit(1.0) - pexp)).as("kappa"))
  }

  /** Trained-tokenizer application — q128's body: per-document subword
    * counts under the q118-trained merge table (the train -> apply
    * lifecycle). The segmented TYPE table is vocabulary-bounded, so the
    * corpus pass is one broadcast equi-join on the word. */
  def bpeApply(documents: DataFrame, steps: Int): DataFrame = {
    val seg = bpeStates(documents, steps, retainMerges = false)._2
      .select(col("w"), size(col("syms")).cast("long").as("n_sub"))
    documents
      .select(col("doc_id"), explode(toks).as("w"))
      .join(broadcast(seg), "w")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("n_sub").as("n_subwords"))
      .withColumn("fertility",
        col("n_subwords").cast("double") / col("n_words"))
      .select("doc_id", "n_words", "n_subwords", "fertility")
      .orderBy("doc_id")
  }
}
