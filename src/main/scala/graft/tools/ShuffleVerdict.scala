package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** The MECHANICAL byte-surface regression gate (r13 verdict ask #4).
  *
  * Wall-clock bands proved twice un-enforceable on this shared host (the
  * r12/r13 90%-agreement misses were pure host weather on byte-identical
  * plans), so the gate the close actually relies on — the bytes surface —
  * is made executable here: feed it two [[ShuffleAudit]] outputs from
  * FRESH JVMs and it passes iff
  *
  *   1. both runs cover the same query set with zero FAILED rows,
  *   2. no query's physical-strategy fingerprint (PLANSIG join-class
  *      counts) shows a MIGRATION between runs — some class gaining an
  *      operator while another loses one: an AQE strategy choice that
  *      differs across JVMs at test scale is a plan that cannot be
  *      trusted at 100 TB. Same-sign count drift is AQE empty-relation
  *      elimination racing stage completion (a no-op join excised from
  *      one run's final plan, bytes identical) — reported as SHAPE
  *      JITTER, not failed,
  *   3. every query's shuffle-write delta is <= 5% (deltas under 256 KiB
  *      are ignored — compression jitter on tiny shuffles), and
  *   4. spill is ZERO in both runs.
  *
  * Writes a verdict file (PASS/FAIL + every violation) and exits 1 on
  * FAIL so the close checklist cannot record a green gate over a flipped
  * plan. Usage:
  *
  *   runMain graft.tools.ShuffleVerdict <auditA> <auditB> <verdictOut>
  */
object ShuffleVerdict {

  final case class Row(swrite: Long, spill: Long, sig: String)

  private[tools] def parse(path: String): (Map[String, Row], Seq[String]) =
    parseLines(scala.io.Source.fromFile(path, "UTF-8").getLines().toVector)

  private[tools] def parseLines(lines: Vector[String]): (Map[String, Row], Seq[String]) = {
    val failed = lines.collect { case l if l.startsWith("SHUFFLE") && l.contains(" FAILED ") =>
      l.split("\\s+")(1) }
    val sw = lines.collect { case l if l.startsWith("SHUFFLE ") && !l.contains(" FAILED ") =>
      val parts = l.split("\\s+")
      val kv = parts.drop(2).filter(_.contains("=")).map { p =>
        val Array(k, v) = p.split("=", 2); k -> v }.toMap
      parts(1) -> (kv.getOrElse("rawswrite", "0").toLong,
        kv.getOrElse("rawspill", "0").toLong)
    }.toMap
    val sig = lines.collect { case l if l.startsWith("PLANSIG ") =>
      val parts = l.split("\\s+"); parts(1) -> parts.drop(2).mkString(" ") }.toMap
    (sw.map { case (n, (w, s)) => n -> Row(w, s, sig.getOrElse(n, "?")) }, failed)
  }

  def main(args: Array[String]): Unit = {
    val Array(fileA, fileB, out) = args.take(3)
    val body = compare(parse(fileA), parse(fileB))
    Files.write(Paths.get(out), body.getBytes(StandardCharsets.UTF_8))
    print(body)
    if (!body.startsWith("BYTE-SURFACE VERDICT PASS")) sys.exit(1)
  }

  /** Pure comparison of two parsed audits -> the verdict body (first
    * line "BYTE-SURFACE VERDICT PASS|FAIL"). */
  private[tools] def compare(runA: (Map[String, Row], Seq[String]),
      runB: (Map[String, Row], Seq[String])): String = {
    val (a, failA) = runA
    val (b, failB) = runB
    val problems = Seq.newBuilder[String]
    val jitter = Seq.newBuilder[String]
    if (failA.nonEmpty) problems += s"run A FAILED queries: ${failA.mkString(", ")}"
    if (failB.nonEmpty) problems += s"run B FAILED queries: ${failB.mkString(", ")}"
    val onlyA = a.keySet.diff(b.keySet); val onlyB = b.keySet.diff(a.keySet)
    if (onlyA.nonEmpty) problems += s"only in run A: ${onlyA.toSeq.sorted.mkString(", ")}"
    if (onlyB.nonEmpty) problems += s"only in run B: ${onlyB.toSeq.sorted.mkString(", ")}"
    val shared = a.keySet.intersect(b.keySet).toSeq.sorted
    var maxDeltaPct = 0.0
    var maxDeltaName = "-"
    shared.foreach { n =>
      val (ra, rb) = (a(n), b(n))
      // A strategy FLIP is a MIGRATION: some class gains an operator
      // while another loses one — the same work planned under a
      // different join strategy, the thing that prices differently at
      // 100 TB. A same-sign count drift (one class simply gains or
      // loses operators, others unchanged) is AQE empty-relation
      // elimination racing stage completion: the eliminated join's
      // input is provably empty, both runs move identical bytes, and
      // whether the no-op join is excised from the final plan is pure
      // scheduler timing — recorded as jitter, not failed.
      if (ra.sig != rb.sig) {
        def counts(s: String): Map[String, Long] =
          s.split("\\s+").filter(_.contains("=")).map { kv =>
            val Array(k, v) = kv.split("=", 2); k -> v.toLong }.toMap
        val (ca, cb) = (counts(ra.sig), counts(rb.sig))
        val deltas = (ca.keySet ++ cb.keySet).toSeq
          .map(k => cb.getOrElse(k, 0L) - ca.getOrElse(k, 0L))
        if (deltas.exists(_ > 0) && deltas.exists(_ < 0))
          problems += s"STRATEGY FLIP $n: A[${ra.sig}] B[${rb.sig}]"
        else
          jitter += s"SHAPE JITTER $n (empty-relation elimination): " +
            s"A[${ra.sig}] B[${rb.sig}]"
      }
      if (ra.spill > 0 || rb.spill > 0)
        problems += s"SPILL $n: A=${ra.spill}B B=${rb.spill}B"
      val delta = math.abs(ra.swrite - rb.swrite)
      if (delta > 256L * 1024) {
        val pct = 100.0 * delta / math.max(1L, math.max(ra.swrite, rb.swrite))
        if (pct > maxDeltaPct) { maxDeltaPct = pct; maxDeltaName = n }
        if (pct > 5.0)
          problems += f"SWRITE DELTA $n: A=${ra.swrite}B B=${rb.swrite}B ($pct%.1f%% > 5%%)"
      }
    }
    val ps = problems.result()
    val js = jitter.result()
    val verdict = if (ps.isEmpty) "PASS" else "FAIL"
    val summary =
      s"queries=${shared.size} strategy-flips=${ps.count(_.startsWith("STRATEGY"))} " +
        f"max-swrite-delta=$maxDeltaPct%.2f%% ($maxDeltaName) " +
        s"spill-violations=${ps.count(_.startsWith("SPILL"))} " +
        s"shape-jitter=${js.size}"
    (Seq(s"BYTE-SURFACE VERDICT $verdict", summary) ++ ps ++ js)
      .mkString("", "\n", "\n")
  }
}
