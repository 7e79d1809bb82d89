package graft.queries

import graft.Materialize._
import graft.Report._
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Physical-layout operators: the lake-management side of a 100 TB
  * engine. Nothing here touches query semantics — these are the
  * operators a pipeline runs to decide HOW the data should sit on disk:
  * multi-dimensional clustering (z-order) so point/range scans prune
  * files on more than one key, and small-file compaction planning so the
  * file count stays bounded as ingest fragments accumulate.
  *
  * Both are deliberately shaped as pure dataflow (no global sort, no
  * driver loop): the z-order "write" is an equi-width range partition on
  * the interleaved key — exactly the partition function a real z-order
  * writer shuffles by — and the per-file min/max stats it reports are
  * the parquet footer bounds a scan would prune on. The compaction
  * planner runs entirely on the file MANIFEST (one row per file), which
  * stays small even when the data is 100 TB — windows over it are
  * rollup-table windows, never corpus windows.
  */
object Layout {
  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  /** Length-bucketed batching plan (dynamic-padding layout): equi-depth
    * token-length buckets (exact quantile boundaries from the length
    * DISTRIBUTION — one row per distinct length, the q96 rule, so the
    * cumulative window is bounded by the length domain, never the
    * corpus) with per-bucket document/token mass and the padding waste
    * a fixed-shape batcher would pay inside each bucket (docs * max_len
    * - tokens). The table a training loader consults to trade bucket
    * count against padding. */
  def lengthBuckets(docs: org.apache.spark.sql.DataFrame,
      nBuckets: Int = 4): org.apache.spark.sql.DataFrame = {
    val dist = docs
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .groupBy("n").agg(count(lit(1)).as("c"))
    val cum = Window.partitionBy(Sampling.onePart(col("n"))).orderBy("n")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(Sampling.onePart(col("n")))
    dist
      .withColumn("cf", sum("c").over(cum))
      .withColumn("total", sum("c").over(all))
      .withColumn("bucket",
        least(lit(nBuckets - 1L), expr(s"(cf - c) * $nBuckets div total")))
      .groupBy("bucket")
      .agg(sum("c").as("docs"), min("n").as("lo"), max("n").as("hi"),
        sum(col("c") * col("n")).as("tokens"))
      .withColumn("padding_waste", col("docs") * col("hi") - col("tokens"))
  }

  /** Needle-insertion plan for long-context eval data: for every
    * document long enough to host one, the exact token position a
    * needle lands at for each retrieval depth in {10, 50, 90}% —
    * `depth * (n - 1) div 100`, pure integer arithmetic. Map-only (the
    * q335 span-plan class): no shuffle, no state, rides the scan. */
  def needlePlan(docs: org.apache.spark.sql.DataFrame,
      minTokens: Long = 32L): org.apache.spark.sql.DataFrame =
    docs
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .filter(col("n") >= minTokens)
      .withColumn("depth", explode(array(lit(10), lit(50), lit(90))))
      .withColumn("needle_pos", expr("depth * (n - 1) div 100"))
      .select("doc_id", "n", "depth", "needle_pos")

  /** Length-distribution upsampling for long-context training: per
    * power-of-two length bucket (bucket = |bin(n)| - 1, an integer
    * bit-length — floor(log2) without float log), the integer repeat
    * factor that levels each bucket's token mass up toward the largest
    * bucket, capped at `cap` epochs (the data-constrained repeat bound).
    * One distribution aggregation plus a single-row broadcast of the
    * max — the plan a length-extension run uses to oversample the long
    * tail. */
  def lengthUpsample(docs: org.apache.spark.sql.DataFrame,
      cap: Long = 8L): org.apache.spark.sql.DataFrame = {
    val g = docs
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .withColumn("bucket", (length(bin(col("n"))) - 1).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("docs"), sum("n").as("tokens"))
    g.crossJoin(broadcast(g.agg(max("tokens").as("mt"))))
      .withColumn("repeat_factor",
        least(lit(cap), expr("(mt + tokens - 1) div tokens")))
      .withColumn("effective_tokens", col("tokens") * col("repeat_factor"))
      .select("bucket", "docs", "tokens", "repeat_factor", "effective_tokens")
  }

  /** Bit-interleave two 16-bit values (x in even bits, y in odd bits) —
    * the Morton / z-order curve key. Constants are precomputed in Scala
    * so both engines evaluate identical 32-term integer arithmetic; only
    * the bit-extract spelling differs (Spark SQL `shiftright`, DuckDB
    * `>>`). */
  private def zTerms(px: String, sy: String, sparkSide: Boolean): String =
    (0 until 16).map { i =>
      val (ex, ey) = (1L << (2 * i), 1L << (2 * i + 1))
      if (sparkSide)
        s"(shiftright($px, $i) & 1L) * ${ex}L + (shiftright($sy, $i) & 1L) * ${ey}L"
      else
        s"(($px >> $i) & 1) * $ex + (($sy >> $i) & 1) * $ey"
    }.mkString(" + ")

  /** Z-order vs linear layout pruning report — the q153 body, exposed
    * for the scale probe (one broadcast, one map pass, 64-row rollups —
    * must scale linearly with the fact table). */
  def zorderReport(lineitem: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val li = lineitem.select("l_partkey", "l_suppkey")
    val mx = li.agg(max("l_partkey").as("maxpk"), max("l_suppkey").as("maxsk"))
    val rows = li.crossJoin(broadcast(mx))
      .withColumn("px", expr("l_partkey * 65536L div (maxpk + 1)"))
      .withColumn("sy", expr("l_suppkey * 65536L div (maxsk + 1)"))
      .withColumn("z", expr(zTerms("px", "sy", sparkSide = true)))
      .withColumn("zfile", expr(s"z div ${1L << 26}L"))
      .withColumn("linfile", expr("px div 1024L"))
    def spans(fileCol: String, layout: String) =
      rows.groupBy(col(fileCol).as("file"))
        .agg(min("l_partkey").as("pmn"), max("l_partkey").as("pmx"),
          min("l_suppkey").as("smn"), max("l_suppkey").as("smx"))
        .agg(count(lit(1)).as("n_files"),
          sum(expr("pmx - pmn + 1L")).as("pspan"),
          sum(expr("smx - smn + 1L")).as("sspan"))
        .crossJoin(broadcast(mx))
        .select(lit(layout).as("layout"), col("n_files"),
          (col("pspan").cast("double") / (col("n_files") * (col("maxpk") + 1)))
            .as("avg_part_span"),
          (col("sspan").cast("double") / (col("n_files") * (col("maxsk") + 1)))
            .as("avg_supp_span"))
    spans("zfile", "zorder").union(spans("linfile", "linear"))
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- Z-order clustering effectiveness report -------------------------
    // The layout decision for a fact table probed on TWO keys: linear
    // order (sorted by l_partkey) gives perfect partkey pruning and NO
    // suppkey pruning (every file spans the whole suppkey domain);
    // z-order interleaves the bits of both keys so each of the 64 files
    // covers a bounded rectangle of the (partkey, suppkey) grid. The
    // report computes, per layout and per key, the mean normalized
    // min/max span of the 64 files — exactly the expected fraction of
    // files a point query on that key must scan given footer-stats
    // pruning. A pipeline reads this before committing a 100 TB rewrite.
    //
    // Scale shape: one max() broadcast (two grid bounds), one map pass
    // to compute the 32-term interleave, and a 64-row rollup per layout.
    // File assignment is equi-width on the z value — the range-partition
    // function a real z-order writer shuffles by — so NO global sort
    // appears anywhere. Exact integers until one final double divide.
    QueryDef("q153_zorder_layout", (s, d) =>
      zorderReport(t(s, d, "lineitem")).reportSorted("layout"),
      Some(s"""WITH mx AS (
             |  SELECT max(l_partkey) AS maxpk, max(l_suppkey) AS maxsk
             |  FROM lineitem),
             |r AS MATERIALIZED (
             |  SELECT l_partkey, l_suppkey, px, sy,
             |    ${zTerms("px", "sy", sparkSide = false)} AS z
             |  FROM (
             |    SELECT l_partkey, l_suppkey,
             |      l_partkey * 65536 // (maxpk + 1) AS px,
             |      l_suppkey * 65536 // (maxsk + 1) AS sy
             |    FROM lineitem, mx)),
             |f AS MATERIALIZED (
             |  SELECT 'zorder' AS layout, z // ${1L << 26} AS file,
             |    l_partkey, l_suppkey FROM r
             |  UNION ALL
             |  SELECT 'linear' AS layout, px // 1024 AS file,
             |    l_partkey, l_suppkey FROM r),
             |g AS (
             |  SELECT layout, file,
             |    min(l_partkey) AS pmn, max(l_partkey) AS pmx,
             |    min(l_suppkey) AS smn, max(l_suppkey) AS smx
             |  FROM f GROUP BY layout, file)
             |SELECT layout, CAST(count(*) AS BIGINT) AS n_files,
             |  CAST(CAST(sum(pmx - pmn + 1) AS BIGINT) AS DOUBLE)
             |    / (CAST(count(*) AS BIGINT) * (maxpk + 1)) AS avg_part_span,
             |  CAST(CAST(sum(smx - smn + 1) AS BIGINT) AS DOUBLE)
             |    / (CAST(count(*) AS BIGINT) * (maxsk + 1)) AS avg_supp_span
             |FROM g, mx GROUP BY layout, maxpk, maxsk ORDER BY layout""".stripMargin)),

    // ---- Small-file compaction plan (Next-Fit shelf packing) -------------
    // Ingest leaves one fragment per (source, lang) micro-batch; the
    // planner assigns fragments to output bins of ~target size by
    // cumulative-size bucketing in manifest order: bin = floor(bytes
    // written before this file / target). That is Next-Fit packing as a
    // PREFIX SUM — no sequential driver loop, no sort by size — and it
    // preserves manifest order, so each bin stays a contiguous
    // (source, lang) range and the compacted files keep their partition
    // locality. A file larger than the target gets a bin of its own
    // (shelf packing never splits a file). The window runs over the
    // manifest (one row per FILE — ~hundreds of rows when the corpus is
    // 100 TB), never over the corpus.
    QueryDef("q154_compaction_plan", (s, d) => {
      val files = t(s, d, "documents").groupBy("source", "lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("file_bytes"))
      val w = Window.partitionBy(Sampling.onePart(length(col("source")))).orderBy("source", "lang")
        .rowsBetween(Window.unboundedPreceding, -1)
      files
        .withColumn("cum_before", coalesce(sum("file_bytes").over(w), lit(0L)))
        .withColumn("bin", expr("cum_before div 32768L"))
        .select("source", "lang", "n_docs", "file_bytes", "bin")
        .reportSorted("source", "lang")
    },
      Some("""WITH files AS (
             |  SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
             |    CAST(sum(n_chars) AS BIGINT) AS file_bytes
             |  FROM documents GROUP BY source, lang),
             |planned AS (
             |  SELECT source, lang, n_docs, file_bytes,
             |    COALESCE(SUM(file_bytes) OVER (ORDER BY source, lang
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             |      0) AS cum_before
             |  FROM files)
             |SELECT source, lang, n_docs, file_bytes,
             |  CAST(cum_before // 32768 AS BIGINT) AS bin
             |FROM planned ORDER BY source, lang""".stripMargin)),

    // ---- Join-key skew diagnosis report ----------------------------------
    // The decision input for salting / AQE skew-join handling: per
    // candidate shuffle key, the key-count distribution (exact p50/p99/
    // max selected by RANK over the key-count table — a distribution
    // table of n_keys rows, never the corpus), the imbalance factor
    // max/avg (the straggler multiplier a plain hash-partition would
    // suffer), and the top-3 heavy keys. An imbalance near 1 says hash
    // partitioning is fine; 10x says salt or let AQE split — this report
    // is how that call gets made BEFORE burning a 100 TB shuffle.
    // Exact integers until the single imbalance divide.
    QueryDef("q168_skew_report", (s, d) => {
      def statsFor(df: org.apache.spark.sql.DataFrame, keyCol: String,
          name: String) = {
        val cnt = df.groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("c"))
        // Percentiles come from the counts-of-counts DISTRIBUTION (one
        // row per distinct count value — bounded by max key multiplicity,
        // not by key count), never from ranking every distinct key in one
        // task: for the very keys a skew report exists for, the key table
        // is corpus-scaled (the r8 verdict's q168 scale flag). The rank-r
        // element of the (c, key)-ordered key table is exactly the c
        // whose cumulative frequency first reaches r (the q64/q219
        // crossing trick), so results are unchanged.
        val dist = cnt.groupBy("c").agg(count(lit(1)).as("freq"))
          .withColumn("cum", sum("freq").over(Window.partitionBy(Sampling.onePart(col("c"))).orderBy("c")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val base = cnt.agg(count(lit(1)).as("n_keys"), sum("c").as("n_rows"),
          max("c").as("max_c"))
        def pick(rank: String, out: String) = dist.crossJoin(broadcast(base))
          .filter(col("cum") >= expr(rank) &&
            col("cum") - col("freq") < expr(rank))
          .select(col("c").as(out))
        val p50 = pick("(n_keys + 1) div 2", "p50_c")
        val p99 = pick("(n_keys * 99 + 99) div 100", "p99_c")
        val top = cnt
          .orderBy(col("c").desc, col("key")).limit(3)
          .agg(array_join(transform(
            array_sort(collect_list(struct((-col("c")).as("nc"), col("key")))),
            x => concat(x.getField("key").cast("string"), lit(":"),
              (-x.getField("nc")).cast("string"))), ",").as("top_keys"))
        base.crossJoin(broadcast(p50)).crossJoin(broadcast(p99))
          .crossJoin(broadcast(top))
          .select(lit(name).as("join_key"), col("n_keys"), col("n_rows"),
            col("p50_c"), col("p99_c"), col("max_c"),
            (col("max_c").cast("double") * col("n_keys") / col("n_rows"))
              .as("imbalance"),
            col("top_keys"))
      }
      statsFor(t(s, d, "lineitem"), "l_partkey", "lineitem.l_partkey")
        .union(statsFor(t(s, d, "lineitem"), "l_suppkey", "lineitem.l_suppkey"))
        .union(statsFor(t(s, d, "orders"), "o_custkey", "orders.o_custkey"))
        .orderBy("join_key")
    },
      Some {
        def c(table: String, key: String, name: String) =
          s"""SELECT '$name' AS join_key, n_keys, n_rows, p50_c, p99_c, max_c,
             |  CAST(max_c AS DOUBLE) * n_keys / n_rows AS imbalance,
             |  top_keys
             |FROM
             |  (SELECT CAST(count(*) AS BIGINT) AS n_keys,
             |     CAST(sum(c) AS BIGINT) AS n_rows,
             |     CAST(max(c) AS BIGINT) AS max_c
             |   FROM (SELECT $key, count(*) AS c FROM $table GROUP BY $key)),
             |  (SELECT CAST(c AS BIGINT) AS p50_c FROM (
             |     SELECT c, row_number() OVER (ORDER BY c, $key) AS rn,
             |       count(*) OVER () AS nk
             |     FROM (SELECT $key, count(*) AS c FROM $table GROUP BY $key))
             |   WHERE rn = (nk + 1) // 2),
             |  (SELECT CAST(c AS BIGINT) AS p99_c FROM (
             |     SELECT c, row_number() OVER (ORDER BY c, $key) AS rn,
             |       count(*) OVER () AS nk
             |     FROM (SELECT $key, count(*) AS c FROM $table GROUP BY $key))
             |   WHERE rn = (nk * 99 + 99) // 100),
             |  (SELECT string_agg(CAST($key AS VARCHAR) || ':' || CAST(c AS VARCHAR),
             |     ',' ORDER BY c DESC, $key) AS top_keys
             |   FROM (SELECT $key, CAST(count(*) AS BIGINT) AS c FROM $table
             |         GROUP BY $key ORDER BY c DESC, $key LIMIT 3))""".stripMargin
        s"""SELECT * FROM (
           |${c("lineitem", "l_partkey", "lineitem.l_partkey")}
           |UNION ALL
           |${c("lineitem", "l_suppkey", "lineitem.l_suppkey")}
           |UNION ALL
           |${c("orders", "o_custkey", "orders.o_custkey")})
           |ORDER BY join_key""".stripMargin
      }),

    // ---- Skew salting plan: the ACTION on q168's diagnosis ---------------
    // q168 says WHETHER a key is skewed; this emits the executable plan:
    // every key whose row count exceeds the per-task target T gets a
    // salt factor ceil(c/T) — its rows spread over that many synthetic
    // sub-keys, and the build side replicates by the same factor. The
    // output is the broadcast side of a salted join (bounded by n/T keys
    // BY CONSTRUCTION — a key only appears here by having > T rows), and
    // the before/after straggler ceiling rides along: after_max is the
    // largest surviving chunk across ALL keys, the number that says what
    // the salted shuffle's slowest task actually processes. Exact
    // integer arithmetic end to end; one count aggregation total.
    QueryDef("q249_salting_plan", (s, d) => {
      val T = 16L
      val cnt = t(s, d, "orders")
        .groupBy(col("o_custkey").as("key")).agg(count(lit(1)).as("c"))
        .withColumn("salt_factor",
          when(col("c") > T, expr(s"(c + $T - 1) div $T")).otherwise(lit(1L)))
        .withColumn("chunk_rows",
          expr("(c + salt_factor - 1) div salt_factor"))
      val summary = cnt.agg(max("c").as("before_max"),
        max("chunk_rows").as("after_max"))
      cnt.filter(col("salt_factor") > 1)
        .crossJoin(broadcast(summary))
        .select(col("key"), col("c"), col("salt_factor"), col("chunk_rows"),
          col("before_max"), col("after_max"),
          (col("before_max").cast("double") / col("after_max").cast("double"))
            .as("straggler_reduction"))
        .orderBy(col("c").desc, col("key"))
    },
      Some("""WITH cnt AS MATERIALIZED (
             |  SELECT o_custkey AS key, CAST(count(*) AS BIGINT) AS c
             |  FROM orders GROUP BY 1),
             |pl AS MATERIALIZED (
             |  SELECT key, c,
             |    CASE WHEN c > 16 THEN (c + 15) // 16 ELSE 1 END AS salt_factor
             |  FROM cnt),
             |ch AS MATERIALIZED (
             |  SELECT key, c, salt_factor,
             |    (c + salt_factor - 1) // salt_factor AS chunk_rows
             |  FROM pl),
             |sm AS (
             |  SELECT CAST(max(c) AS BIGINT) AS before_max,
             |    CAST(max(chunk_rows) AS BIGINT) AS after_max
             |  FROM ch)
             |SELECT key, c, CAST(salt_factor AS BIGINT) AS salt_factor,
             |  CAST(chunk_rows AS BIGINT) AS chunk_rows, before_max, after_max,
             |  CAST(before_max AS DOUBLE) / CAST(after_max AS DOUBLE)
             |    AS straggler_reduction
             |FROM ch CROSS JOIN sm
             |WHERE salt_factor > 1
             |ORDER BY c DESC, key""".stripMargin)),

    // ---- Output-partitioning scheme advisor ------------------------------
    // Choosing a sink's PARTITION BY is a one-way door: too coarse and
    // readers scan everything, too fine and the table shatters into
    // millions of small files (the q154 compactor's whole caseload).
    // This prices three candidate schemes for the events sink from one
    // counts pass each: partition count, row-count envelope (p50 via
    // the q168 counts-of-counts crossing — the window runs over the
    // multiplicity distribution, never the partition table), skew
    // factor max/avg, and the small-partition fraction (< 4096 rows —
    // partitions that will emit undersized files). The report reads
    // directly: scheme B's p50 under the floor says don't partition
    // that fine.
    QueryDef("q261_partition_advisor", (s, d) => {
      val ev = t(s, d, "events")
        .select(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"),
          (col("user_id") % 16).as("ub"))
      def schemeStats(keys: Seq[String], name: String) = {
        val cnt = ev.groupBy(keys.map(col): _*).agg(count(lit(1)).as("c"))
        val dist = cnt.groupBy("c").agg(count(lit(1)).as("freq"))
          .withColumn("cum", sum("freq").over(Window.partitionBy(Sampling.onePart(col("c"))).orderBy("c")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val base = cnt.agg(count(lit(1)).as("n_parts"), sum("c").as("n_rows"),
          max("c").as("max_rows"),
          sum(when(col("c") < 4096L, 1L).otherwise(0L)).as("small_parts"))
        val p50 = dist.crossJoin(broadcast(base))
          .filter(col("cum") >= expr("(n_parts + 1) div 2") &&
            col("cum") - col("freq") < expr("(n_parts + 1) div 2"))
          .select(col("c").as("p50_rows"))
        base.crossJoin(broadcast(p50))
          .select(lit(name).as("scheme"), col("n_parts"), col("n_rows"),
            (col("n_rows").cast("double") / col("n_parts").cast("double"))
              .as("avg_rows"),
            col("p50_rows"), col("max_rows"),
            (col("max_rows").cast("double") * col("n_parts").cast("double") /
              col("n_rows").cast("double")).as("skew"),
            (col("small_parts").cast("double") / col("n_parts").cast("double"))
              .as("small_frac"))
      }
      schemeStats(Seq("event_type"), "A:type")
        .unionByName(schemeStats(Seq("event_type", "day"), "B:type,day"))
        .unionByName(schemeStats(Seq("event_type", "day", "ub"),
          "C:type,day,bucket16"))
        .orderBy("scheme")
    },
      Some {
        def c(keys: String, name: String) =
          s"""SELECT '$name' AS scheme, n_parts, n_rows,
             |  CAST(n_rows AS DOUBLE) / CAST(n_parts AS DOUBLE) AS avg_rows,
             |  p50_rows, max_rows,
             |  CAST(max_rows AS DOUBLE) * CAST(n_parts AS DOUBLE)
             |    / CAST(n_rows AS DOUBLE) AS skew,
             |  CAST(small_parts AS DOUBLE) / CAST(n_parts AS DOUBLE)
             |    AS small_frac
             |FROM
             |  (SELECT CAST(count(*) AS BIGINT) AS n_parts,
             |     CAST(sum(c) AS BIGINT) AS n_rows,
             |     CAST(max(c) AS BIGINT) AS max_rows,
             |     CAST(sum(CASE WHEN c < 4096 THEN 1 ELSE 0 END) AS BIGINT)
             |       AS small_parts
             |   FROM (SELECT count(*) AS c FROM ev GROUP BY $keys)),
             |  (SELECT CAST(c AS BIGINT) AS p50_rows FROM (
             |     SELECT c, CAST(sum(freq) OVER (ORDER BY c) AS BIGINT)
             |         AS cum,
             |       freq,
             |       CAST(sum(freq) OVER () AS BIGINT) AS np
             |     FROM (SELECT c, count(*) AS freq FROM
             |       (SELECT count(*) AS c FROM ev GROUP BY $keys)
             |       GROUP BY c))
             |   WHERE cum >= (np + 1) // 2
             |     AND cum - freq < (np + 1) // 2)""".stripMargin
        s"""WITH ev AS MATERIALIZED (
           |  SELECT event_type,
           |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
           |    user_id % 16 AS ub
           |  FROM events)
           |SELECT * FROM (
           |${c("event_type", "A:type")}
           |UNION ALL
           |${c("event_type, day", "B:type,day")}
           |UNION ALL
           |${c("event_type, day, ub", "C:type,day,bucket16")})
           |ORDER BY scheme""".stripMargin
      }),

    // ---- Sort-key clustering factor (ingest-order sortedness) ------------
    // q182 shows zone maps only prune on ingest-CORRELATED columns; this
    // measures that correlation per candidate column before anyone pays
    // for a q153 re-sort: over adjacent document pairs in ingest
    // (doc_id) order, the fraction whose candidate value is
    // non-decreasing, and the run count (1 + descents — the number of
    // contiguous sorted segments a range reader effectively sees).
    // sortedness ~ 1: the column is born clustered, zone maps work as
    // is; ~ 0.5: random, re-cluster first. EXACT adjacency at scale:
    // in-chunk pairs from chunk-partitioned lag windows, and the n/64
    // chunk-BOUNDARY pairs recovered by joining each chunk's max-id row
    // to the next chunk's min-id row — no corpus-wide window anywhere.
    QueryDef("q262_clustering_factor", (s, d) => {
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("n_chars").cast("long").as("v_chars"),
          Sampling.lehmer(col("doc_id")).as("v_hash"))
        .withColumn("chunk", expr("doc_id div 64"))
        .materialize // three candidate passes share it
      def factorOf(vCol: String, name: String) = {
        val w = Window.partitionBy("chunk").orderBy("doc_id")
        val inChunk = docs
          .withColumn("pv", lag(vCol, 1).over(w))
          .filter(col("pv").isNotNull)
          .agg(count(lit(1)).as("np"),
            sum(when(col(vCol) >= col("pv"), 1L).otherwise(0L)).as("nd"))
        // boundary pairs between CONSECUTIVE EXISTING chunks (gap-proof:
        // a lag over the n/64-row chunk-edge table, latenessReport's
        // sublinear class), pairing each chunk's first row with the
        // previous chunk's last row — exactly the pairs the in-chunk
        // windows cannot see
        val edges = docs.groupBy("chunk")
          .agg(min(struct(col("doc_id").as("id"), col(vCol).as("vv"))).as("f"),
            max(struct(col("doc_id").as("id"), col(vCol).as("vv"))).as("l"))
          .select(col("chunk"), col("f.vv").as("v"), col("l.vv").as("lv"))
        val boundary = edges
          .withColumn("pv", lag("lv", 1).over(Window.partitionBy(Sampling.onePart(col("chunk"))).orderBy("chunk")))
          .filter(col("pv").isNotNull)
          .agg(count(lit(1)).as("np"),
            sum(when(col("v") >= col("pv"), 1L).otherwise(0L)).as("nd"))
        inChunk.unionByName(boundary)
          .agg(sum("np").as("n_pairs"), sum("nd").as("n_nondecreasing"))
          .select(lit(name).as("candidate"), col("n_pairs"),
            col("n_nondecreasing"),
            (col("n_nondecreasing").cast("double") /
              col("n_pairs").cast("double")).as("sortedness"),
            (lit(1L) + col("n_pairs") - col("n_nondecreasing")).as("n_runs"))
      }
      factorOf("doc_id", "doc_id")
        .unionByName(factorOf("v_chars", "n_chars"))
        .unionByName(factorOf("v_hash", "lehmer_hash"))
        .orderBy("candidate")
    },
      Some {
        def c(v: String, name: String) =
          s"""SELECT '$name' AS candidate,
             |  CAST(count(*) AS BIGINT) AS n_pairs,
             |  CAST(sum(CASE WHEN v >= pv THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_nondecreasing,
             |  CAST(sum(CASE WHEN v >= pv THEN 1 ELSE 0 END) AS DOUBLE)
             |    / CAST(count(*) AS DOUBLE) AS sortedness,
             |  1 + CAST(count(*) AS BIGINT)
             |    - CAST(sum(CASE WHEN v >= pv THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_runs
             |FROM (
             |  SELECT $v AS v,
             |    lag($v) OVER (ORDER BY doc_id) AS pv
             |  FROM docs) WHERE pv IS NOT NULL""".stripMargin
        s"""WITH docs AS MATERIALIZED (
           |  SELECT doc_id, CAST(n_chars AS BIGINT) AS v_chars,
           |    ${Sampling.sqlLehmerOf("doc_id")} AS v_hash
           |  FROM documents)
           |SELECT * FROM (
           |${c("doc_id", "doc_id")}
           |UNION ALL
           |${c("v_chars", "n_chars")}
           |UNION ALL
           |${c("v_hash", "lehmer_hash")})
           |ORDER BY candidate""".stripMargin
      }),

    // ---- Zone-map pruning attestation ------------------------------------
    // The payoff side of q153's layout story: per-"file" min/max zone
    // maps (parquet footer stats; files = ingest-order row ranges,
    // l_orderkey div 256) decide which files a range scan can SKIP, and
    // the report attests both the SOUNDNESS law (zero matching rows in
    // any skipped file — the law a reader's correctness rests on) and
    // the EFFECTIVENESS gap: a predicate on the ingest-correlated key
    // prunes nearly everything, the same-width predicate on an
    // uncorrelated column prunes nothing — the measurement that says
    // "re-cluster (q153) before trusting zone maps on that column".
    //
    // Scale shape: one corpus scan builds the manifest (grouped min/max,
    // map-side combine) and one conditional aggregation per corpus scan
    // answers the true-match side; every window/rollup after that runs
    // on the file MANIFEST, bounded by the file count.
    QueryDef("q182_zonemap_pruning", (s, d) => {
      val li = t(s, d, "lineitem")
        .withColumn("file", expr("l_orderkey div 256"))
      val manifest = li.groupBy("file")
        .agg(min("l_orderkey").as("omn"), max("l_orderkey").as("omx"),
          min("l_partkey").as("pmn"), max("l_partkey").as("pmx"),
          count(lit(1)).as("n_rows"))
      def predCase(id: Int, cmn: String, cmx: String, rowCol: String,
          lo: Long, hi: Long) = {
        val scan = manifest
          .agg(count(lit(1)).as("n_files"),
            sum(when(col(cmx) >= lo && col(cmn) < hi, 1L).otherwise(0L))
              .as("n_scanned"),
            sum(when(col(cmx) >= lo && col(cmn) < hi, col("n_rows"))
              .otherwise(0L)).as("rows_scanned"))
        val truth = li
          .agg(sum(when(col(rowCol) >= lo && col(rowCol) < hi, 1L)
              .otherwise(0L)).as("rows_matched"),
            countDistinct(when(col(rowCol) >= lo && col(rowCol) < hi,
              col("file"))).as("n_matching_files"))
        // rows_missed: matching rows inside files the zone map skipped —
        // the soundness attestation (must be 0; min/max bounds are sound)
        val missed = li.join(broadcast(manifest
              .filter(!(col(cmx) >= lo && col(cmn) < hi))
              .select(col("file"))), Seq("file"), "left_semi")
          .agg(sum(when(col(rowCol) >= lo && col(rowCol) < hi, 1L)
            .otherwise(0L)).as("rows_missed"))
        scan.withColumn("pred_id", lit(id))
          .join(truth.withColumn("pred_id", lit(id)), "pred_id")
          .join(missed.withColumn("pred_id", lit(id)), "pred_id")
          .select(col("pred_id"), col("n_files"), col("n_scanned"),
            (col("n_files") - col("n_scanned")).as("n_skipped"),
            col("n_matching_files"),
            (col("n_scanned") - col("n_matching_files")).as("false_pos_files"),
            col("rows_matched"), coalesce(col("rows_missed"), lit(0L))
              .as("rows_missed"),
            (lit(1.0) - col("n_scanned").cast("double") / col("n_files"))
              .as("prune_ratio"))
      }
      predCase(1, "omn", "omx", "l_orderkey", 10000L, 12000L)
        .union(predCase(2, "pmn", "pmx", "l_partkey", 100L, 140L))
        .orderBy("pred_id")
    },
      Some {
        def c(id: Int, cmn: String, cmx: String, rowCol: String,
            lo: Long, hi: Long) =
          s"""SELECT $id AS pred_id, n_files, n_scanned,
             |  n_files - n_scanned AS n_skipped, n_matching_files,
             |  n_scanned - n_matching_files AS false_pos_files,
             |  rows_matched, COALESCE(rows_missed, 0) AS rows_missed,
             |  1.0 - CAST(n_scanned AS DOUBLE) / n_files AS prune_ratio
             |FROM
             |  (SELECT CAST(count(*) AS BIGINT) AS n_files,
             |     CAST(sum(CASE WHEN $cmx >= $lo AND $cmn < $hi
             |       THEN 1 ELSE 0 END) AS BIGINT) AS n_scanned
             |   FROM mf),
             |  (SELECT CAST(sum(CASE WHEN $rowCol >= $lo AND $rowCol < $hi
             |       THEN 1 ELSE 0 END) AS BIGINT) AS rows_matched,
             |     CAST(count(DISTINCT CASE WHEN $rowCol >= $lo
             |       AND $rowCol < $hi THEN file END) AS BIGINT)
             |       AS n_matching_files
             |   FROM fl),
             |  (SELECT CAST(sum(CASE WHEN $rowCol >= $lo AND $rowCol < $hi
             |       THEN 1 ELSE 0 END) AS BIGINT) AS rows_missed
             |   FROM fl WHERE file IN (
             |     SELECT file FROM mf
             |     WHERE NOT ($cmx >= $lo AND $cmn < $hi)))""".stripMargin
        s"""WITH fl AS MATERIALIZED (
           |  SELECT l_orderkey // 256 AS file, l_orderkey, l_partkey
           |  FROM lineitem),
           |mf AS MATERIALIZED (
           |  SELECT file, min(l_orderkey) AS omn, max(l_orderkey) AS omx,
           |    min(l_partkey) AS pmn, max(l_partkey) AS pmx,
           |    CAST(count(*) AS BIGINT) AS n_rows
           |  FROM fl GROUP BY file)
           |SELECT * FROM (
           |${c(1, "omn", "omx", "l_orderkey", 10000L, 12000L)}
           |UNION ALL
           |${c(2, "pmn", "pmx", "l_partkey", 100L, 140L)})
           |ORDER BY pred_id""".stripMargin
      }),

    // ---- Columnar encoding advisor ---------------------------------------
    // The storage-layout question after q153/q154 decide file boundaries:
    // which ENCODING should each column get inside a file. Per (file,
    // column): run count in write order (RLE's cost driver), NDV
    // (dictionary's), and the maximum absolute delta between consecutive
    // values (delta-bitpacking's) — then the standard advisory rule
    // (mostly-constant → RLE, small deltas → DELTA, small NDV → DICT,
    // else PLAIN). Every statistic is windows/rollups PARTITIONED BY
    // FILE in write order — bounded rows per partition by the file-size
    // contract, no global sort, all exact integers.
    QueryDef("q183_encoding_advisor", (s, d) => {
      val li = t(s, d, "lineitem")
        .withColumn("file", expr("l_orderkey div 1024"))
      // (l_orderkey, l_linenumber) is NOT unique in the testdata, so the
      // value itself is the final tiebreak — rows that still tie carry
      // equal v, leaving the value SEQUENCE (all these stats see)
      // well-defined on both engines.
      val wf = Window.partitionBy("file")
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("v"))
      def colCase(cname: String) = {
        val v = col(cname).cast("long")
        li.select(col("file"), col("l_orderkey"), col("l_linenumber"),
            v.as("v"))
          .withColumn("pv", lag("v", 1).over(wf))
          .groupBy("file")
          .agg(lit(cname).as("column_name"),
            count(lit(1)).as("n_rows"),
            (sum(when(col("pv").isNull || col("v") =!= col("pv"), 1L)
              .otherwise(0L))).as("n_runs"),
            countDistinct("v").as("ndv"),
            max(when(col("pv").isNotNull, abs(col("v") - col("pv")))
              .otherwise(0L)).as("max_abs_delta"))
      }
      Seq("l_orderkey", "l_partkey", "l_quantity").map(colCase)
        .reduce(_ union _)
        .withColumn("advice",
          when(col("n_runs") * 4 <= col("n_rows"), "rle")
            .when(col("max_abs_delta") <= 65535L, "delta")
            .when(col("ndv") * 16 <= col("n_rows"), "dict")
            .otherwise("plain"))
        .select("file", "column_name", "n_rows", "n_runs", "ndv",
          "max_abs_delta", "advice")
        .orderBy("column_name", "file")
    },
      Some {
        def c(cname: String) =
          s"""SELECT file, '$cname' AS column_name,
             |  CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(CASE WHEN pv IS NULL OR v != pv THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_runs,
             |  CAST(count(DISTINCT v) AS BIGINT) AS ndv,
             |  CAST(max(CASE WHEN pv IS NOT NULL THEN abs(v - pv)
             |    ELSE 0 END) AS BIGINT) AS max_abs_delta
             |FROM (
             |  SELECT l_orderkey // 1024 AS file, CAST($cname AS BIGINT) AS v,
             |    lag(CAST($cname AS BIGINT), 1) OVER (
             |      PARTITION BY l_orderkey // 1024
             |      ORDER BY l_orderkey, l_linenumber, CAST($cname AS BIGINT))
             |      AS pv
             |  FROM lineitem)
             |GROUP BY file""".stripMargin
        s"""SELECT file, column_name, n_rows, n_runs, ndv, max_abs_delta,
           |  CASE WHEN n_runs * 4 <= n_rows THEN 'rle'
           |       WHEN max_abs_delta <= 65535 THEN 'delta'
           |       WHEN ndv * 16 <= n_rows THEN 'dict'
           |       ELSE 'plain' END AS advice
           |FROM (
           |${c("l_orderkey")}
           |UNION ALL
           |${c("l_partkey")}
           |UNION ALL
           |${c("l_quantity")})
           |ORDER BY column_name, file""".stripMargin
      }),

    // ---- Rendezvous (highest-random-weight) shard rebalance plan ---------
    // The placement layer's elasticity contract: under rendezvous
    // hashing every key goes to argmax_s h(key, s), so growing a
    // 10-shard layout to 11 moves ONLY the keys whose new shard wins
    // the argmax — an expected 1/11 of the corpus, against (n−1)/n for
    // mod-n hashing. This op emits the migration matrix (before-shard ×
    // after-shard counts) that a 100 TB rebalance would execute, and
    // the diagonal attests minimal movement. Shape: each key scores
    // |shards| candidates (a bounded explode — 11 rows per key, the
    // same bounded write-amplification contract as q45's bands), one
    // window argmax per layout, one grouped count; the scorer is the
    // Lehmer-style integer hash both engines compute exactly.
    QueryDef("q212_rendezvous_shards", (s, d) => {
      def shardOf(n: Int, as: String) =
        Tables.load(s, d, "documents").select("doc_id")
          .withColumn("s0", explode(sequence(lit(0), lit(n - 1))))
          // key XOR lehmer(shard), then two Lehmer rounds: any ADDITIVE
          // combine leaves the per-key candidate scores an arithmetic
          // progression mod M with a key-independent step, which biases
          // the argmax toward fixed positions (measured: 2.4% movement
          // instead of 1/11). The xor breaks the progression per key;
          // measured movement is 8% ≈ 1/11 and every moved key lands in
          // the NEW shard — the rendezvous minimal-movement property.
          .withColumn("h", expr(
            "((((doc_id % 2147483647) ^" +
              " (((cast(s0 as bigint) + 1) * 48271 % 2147483647)" +
              " * 48271 % 2147483647)) % 2147483647) * 48271 % 2147483647)" +
              " * 48271 % 2147483647"))
          .withColumn("rn", row_number().over(
            Window.partitionBy("doc_id").orderBy(col("h").desc, col("s0"))))
          .filter(col("rn") === 1)
          .select(col("doc_id"), col("s0").as(as))
      val tot = Tables.load(s, d, "documents")
        .agg(count(lit(1)).as("n_total"))
      shardOf(10, "shard_before").join(shardOf(11, "shard_after"), "doc_id")
        .groupBy("shard_before", "shard_after")
        .agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(tot))
        .select(col("shard_before"), col("shard_after"), col("n"),
          (col("shard_before") =!= col("shard_after")).as("moved"),
          (col("n").cast("double") / col("n_total").cast("double")).as("frac"))
        .reportSorted("shard_before", "shard_after")
    },
      Some {
        def sqlShard(n: Int, as: String) =
          s"""SELECT doc_id, s0 AS $as FROM (
             |  SELECT doc_id, s0,
             |    row_number() OVER (PARTITION BY doc_id
             |      ORDER BY (((xor(doc_id % 2147483647,
             |          ((s0 + 1) * 48271 % 2147483647) * 48271 % 2147483647))
             |        % 2147483647) * 48271 % 2147483647) * 48271 % 2147483647
             |        DESC, s0) AS rn
             |  FROM (SELECT doc_id, unnest(range(0, $n)) AS s0
             |        FROM documents))
             |WHERE rn = 1""".stripMargin
        s"""WITH b AS MATERIALIZED (${sqlShard(10, "shard_before")}),
           |a AS MATERIALIZED (${sqlShard(11, "shard_after")}),
           |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM documents),
           |g AS (
           |  SELECT shard_before, shard_after, CAST(count(*) AS BIGINT) AS n
           |  FROM b JOIN a ON b.doc_id = a.doc_id
           |  GROUP BY 1, 2)
           |SELECT CAST(shard_before AS INTEGER) AS shard_before,
           |  CAST(shard_after AS INTEGER) AS shard_after, n,
           |  shard_before != shard_after AS moved,
           |  CAST(n AS DOUBLE) / CAST(n_total AS DOUBLE) AS frac
           |FROM g CROSS JOIN tot
           |ORDER BY shard_before, shard_after""".stripMargin
      }),

    // ---- Length-bucketed batching plan -------------------------------------
    // Equi-depth token-length buckets with per-bucket padding waste —
    // the dynamic-padding layout table. Distribution-bounded windows
    // (the q96 class), then a 4-row rollup.
    QueryDef("q356_length_buckets", (s, d) =>
      lengthBuckets(t(s, d, "documents")).reportSorted("bucket"),
      Some("""WITH d AS (
             |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n
             |  FROM documents),
             |dist AS (SELECT n, CAST(count(*) AS BIGINT) AS c FROM d GROUP BY n),
             |cum AS (
             |  SELECT n, c, sum(c) OVER (ORDER BY n) AS cf,
             |    sum(c) OVER () AS total
             |  FROM dist),
             |b AS (
             |  SELECT n, c,
             |    CAST(least(3, (cf - c) * 4 // total) AS BIGINT) AS bucket
             |  FROM cum)
             |SELECT bucket, CAST(sum(c) AS BIGINT) AS docs,
             |  min(n) AS lo, max(n) AS hi,
             |  CAST(sum(c * n) AS BIGINT) AS tokens,
             |  CAST(sum(c) * max(n) - sum(c * n) AS BIGINT) AS padding_waste
             |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin)),

    // ---- Needle-insertion plan (long-context eval prep) --------------------
    // Exact needle positions per (document, retrieval depth) — map-only
    // integer arithmetic, the q335 class.
    QueryDef("q357_needle_plan", (s, d) =>
      needlePlan(t(s, d, "documents")).orderBy("doc_id", "depth"),
      Some("""WITH d AS (
             |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n
             |  FROM documents)
             |SELECT doc_id, n, depth, depth * (n - 1) // 100 AS needle_pos
             |FROM d CROSS JOIN (SELECT unnest([10, 50, 90]) AS depth)
             |WHERE n >= 32 ORDER BY doc_id, depth""".stripMargin)),

    // ---- Length-distribution upsampling ------------------------------------
    // Integer repeat factors that level power-of-two length buckets up
    // toward the longest bucket's token mass (capped) — the
    // long-context oversampling plan. Bit-length buckets, no float log.
    QueryDef("q358_length_upsample", (s, d) =>
      lengthUpsample(t(s, d, "documents")).reportSorted("bucket"),
      Some("""WITH d AS (
             |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n
             |  FROM documents),
             |g AS (
             |  SELECT CAST(length(bin(n)) - 1 AS BIGINT) AS bucket,
             |    CAST(count(*) AS BIGINT) AS docs,
             |    CAST(sum(n) AS BIGINT) AS tokens
             |  FROM d GROUP BY 1),
             |m AS (SELECT max(tokens) AS mt FROM g)
             |SELECT bucket, docs, tokens,
             |  least(8, (mt + tokens - 1) // tokens) AS repeat_factor,
             |  tokens * least(8, (mt + tokens - 1) // tokens)
             |    AS effective_tokens
             |FROM g, m ORDER BY bucket""".stripMargin)),
  )
}
