package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
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

  val defs: Seq[QueryDef] = Seq(

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
             |  length(text) AS len_chars,
             |  len(string_split(text, ' ')) AS n_tokens,
             |  CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE)
             |    / len(string_split(text, ' ')) AS avg_token_len,
             |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS bpe_tokens
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
             |  len(string_split(text, ' ')) AS n_tokens,
             |  len(list_filter(string_split(text, ' '), x -> x = 'the' OR x = 'a')) AS n_stopwords,
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
             |  len(string_split(trim(regexp_replace(regexp_replace(lower(text),
             |       '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS n_clean_tokens
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
  )
}
