package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** The unpartitioned-window law (round-9, the BNLJ-allowlist pattern
  * applied to windows): a `Window.orderBy(...)` without `partitionBy` —
  * or an explicit empty `Window.partitionBy()` — moves EVERY row of its
  * input into one task. That is the q115/q168 scale-killer class the
  * round-8 verdict flagged, and it is only acceptable when the window's
  * input is bounded BY CONSTRUCTION: a limit-k pool, a fixed bucket/
  * threshold grid, a strata/centroid catalog, or a value DISTRIBUTION
  * table (one row per distinct value — q96's "window over the
  * distribution, never the corpus" rule).
  *
  * This spec scans the main source tree for both construction forms and
  * anchors each site to its enclosing QueryDef/def. Any NEW site fails
  * the suite until it is added here with a boundedness argument; any
  * REMOVED site fails too, so the list cannot go stale.
  *
  * Not matched textually (multiline/parameterized, audited in prose):
  * `Sampling.chunkOffsets`'s phase-2 super-window
  * (`Window.partitionBy(...)` with pc possibly empty → onePart) runs
  * over per-super totals — n/(1e5*1024) rows by the prefixBuckets
  * contract, negligible beyond 10^12-row corpora (see its Scaladoc) —
  * and q84_len_histogram's `all` grand-total window (onePart over the
  * <= 5-row bucket histogram, multiline builder form).
  */
class WindowLawSpec extends AnyFunSuite {

  // anchor -> boundedness argument (the WHY is load-bearing: a reviewer
  // must be able to re-derive the bound from the source)
  private val allowed: Seq[(String, String)] = Seq(
    "Curation.scala:q84_len_histogram" ->
      "window over the fixed 64-char-wide length-bucket grid, not docs",
    "Curation.scala:q96_equidepth_buckets" ->
      "cumulative window over the n_chars DISTRIBUTION (counts-of-values)",
    "Curation.scala:q176_quantile_normalize" ->
      "rank window over the source value distribution (q96's rule)",
    "Curation.scala:q176_quantile_normalize" ->
      "rank window over the reference value distribution (q96's rule)",
    "Curation.scala:q190_fair_topk" ->
      "round-robin rank over the per-group limit-k winner pool (<= k*|groups| rows)",
    "Dedup.scala:q229_jaccard_histogram" ->
      "cumulative window over the fixed 20-bucket similarity grid",
    "Events.scala:latenessReport" ->
      ("running max over 65536-event chunk totals: n/65536 rows, the " +
        "documented sublinear envelope of the two-phase prefix pattern " +
        "(at 10^12 events this table is ~15M rows in ONE window task — " +
        "raise the chunk width or nest chunkOffsets before that scale)"),
    "Events.scala:q167_negative_samples" ->
      "dense rank over the distinct-item CATALOG (items, not interactions)",
    "Layout.scala:q154_compaction_plan" ->
      ("Next-Fit prefix sum over the file MANIFEST (one row per " +
        "(source,lang) fragment — hundreds of rows at 100 TB)"),
    "Layout.scala:factorOf" ->
      ("q262 boundary pairs: lag over the n/64-row chunk-edge table " +
        "(latenessReport's sublinear class — re-chunk before 10^14 rows)"),
    "Layout.scala:schemeStats" ->
      ("q261 partition-advisor p50: window over the counts-of-counts " +
        "distribution (one row per distinct partition size, q168's rule)"),
    "Layout.scala:statsFor" ->
      ("q168 percentile crossing over the counts-of-counts distribution " +
        "(one row per distinct multiplicity, the q64/q219 trick)"),
    "Layout.scala:lengthBuckets" ->
      ("q356 cumulative window over the token-length DISTRIBUTION " +
        "(one row per distinct length — q96's rule)"),
    "Layout.scala:lengthBuckets" ->
      "q356 grand total over the same bounded length distribution",
    "Quality.scala:ksOf" ->
      ("q290 cumulative KS window over the token-length DISTRIBUTION " +
        "(one row per distinct length — q96's rule)"),
    "Sampling.scala:prioritySample" ->
      "rank over the limit(k+1) priority pool",
    "Sampling.scala:prioritySample" ->
      "tau = min over the same limit(k+1) pool",
    "Sampling.scala:q105_eval_allocation" ->
      "largest-remainder totals over the per-lang STRATA table",
    "Sampling.scala:q105_eval_allocation" ->
      "largest-remainder rank over the same strata table",
    "Sampling.scala:q120_shard_manifest" ->
      "offset window over the doc-length DISTRIBUTION (counts-of-lengths)",
    "Similarity.scala:q103_cluster_quality" ->
      "share-of-total window over the k-row centroid table",
    "Text.scala:q186_phrase_search" ->
      ("phrase rank over the limit(3) top-phrase pool — partitioned on a " +
        "constant (still one task, bounded by the limit; the constant " +
        "partition keeps the plan out of the no-partition warning class)")
  )
  // r14: q104_vocab_coverage left this list — its vocabulary frame is
  // corpus-derived (Heaps'-law unbounded), so its rank/cumsum now runs
  // as the nested two-phase prefix sum (tf-level chunkOffsets + per-
  // (tf, prefix) partitioned windows); see its Scaladoc for the bound.

  test("every unpartitioned window site is allowlisted with a boundedness argument") {
    // Since r14 every bounded single-task window partitions on
    // Sampling.onePart(<numeric col>) — a deterministic always-zero key
    // that survives EliminateWindowPartitions (a lit() constant does
    // not), so the plans are warning-free. The onePart form is matched
    // HERE too: a constant partition is an unpartitioned window in
    // disguise (one task) and needs the same boundedness argument.
    val sitePat =
      ("Window\\.orderBy\\(|Window\\.partitionBy\\(\\)|" +
        "Window\\.partitionBy\\((Sampling\\.)?onePart\\(").r
    val anchorPat =
      "QueryDef\\(\"(q\\d+[0-9a-z_]*)\"|def ([A-Za-z0-9_]+)".r
    val root = new java.io.File("src/main/scala/graft")
    def scalaFiles(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(scalaFiles)
      else if (f.getName.endsWith(".scala")) Seq(f) else Nil
    val found = scalaFiles(root).sortBy(_.getName).flatMap { f =>
      val lines = {
        val src = scala.io.Source.fromFile(f, "UTF-8")
        try src.getLines().toVector finally src.close()
      }
      lines.zipWithIndex.collect {
        case (ln, i) if sitePat.findFirstIn(ln).isDefined =>
          val anchor = (i to 0 by -1).iterator
            .flatMap(j => anchorPat.findFirstMatchIn(lines(j)))
            .map(m => Option(m.group(1)).getOrElse(m.group(2)))
            .nextOption().getOrElse("<top>")
          s"${f.getName}:$anchor"
      }
    }
    val want = allowed.map(_._1).sorted
    assert(found.sorted == want,
      s"""unpartitioned-window sites changed.
         |  new sites (add with a boundedness argument or re-shape the plan):
         |    ${(found.diff(want)).mkString("\n    ")}
         |  stale allowlist entries (remove):
         |    ${(want.diff(found)).mkString("\n    ")}""".stripMargin)
  }
}
