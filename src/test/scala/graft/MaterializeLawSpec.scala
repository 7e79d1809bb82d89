package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

/** The materialization-seam law (round-10): `localCheckpoint()` stores
  * blocks unreplicated on executors, so a direct call is a
  * fault-tolerance bug on a real cluster — one lost executor after the
  * checkpoint fails the job unrecoverably (lineage was truncated). Every
  * multiply-consumed frame must instead go through
  * `Materialize.materialize`, whose strategy (local / reliable /
  * replicated) is a session config. This spec greps the main tree: any
  * direct `.localCheckpoint(` outside `Materialize.scala` fails the
  * suite (the WindowLawSpec pattern).
  */
class MaterializeLawSpec extends AnyFunSuite with SparkTestBase {

  test("no direct localCheckpoint call sites outside Materialize.scala") {
    val root = new java.io.File("src/main/scala/graft")
    def scalaFiles(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(scalaFiles)
      else if (f.getName.endsWith(".scala")) Seq(f) else Nil
    val offenders = scalaFiles(root)
      .filterNot(_.getName == "Materialize.scala")
      .flatMap { f =>
        val src = scala.io.Source.fromFile(f, "UTF-8")
        val lines = try src.getLines().toVector finally src.close()
        lines.zipWithIndex.collect {
          case (ln, i) if ln.contains(".localCheckpoint(") =>
            s"${f.getName}:${i + 1}"
        }
      }
    assert(offenders.isEmpty,
      s"direct localCheckpoint sites (route through Materialize.materialize): " +
        offenders.mkString(", "))
  }

  test("every loop that materializes also releases (or marks retained)") {
    // The loop-release law (round-12; the r11 verdict's ask #3): a
    // `for`/`while` body that `.materialize`s accumulates one persisted
    // frame per iteration in `replicated` mode unless superseded
    // iterations `.release()` — the exact class that OOM'd the first
    // replicated gate attempt. A materialize a loop body INTENTIONALLY
    // keeps (e.g. a per-hop frame the post-loop result reads) must say
    // so on the call line: `.materialize // retained: <why>`.
    val root = new java.io.File("src/main/scala/graft")
    def scalaFiles(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(scalaFiles)
      else if (f.getName.endsWith(".scala")) Seq(f) else Nil
    val loopStart = """\b(for|while)\s*\(""".r
    val offenders = scalaFiles(root).flatMap { f =>
      val src = scala.io.Source.fromFile(f, "UTF-8")
      val lines = try src.getLines().toVector finally src.close()
      val out = Seq.newBuilder[String]
      var i = 0
      while (i < lines.length) {
        val ln = lines(i)
        if (loopStart.findFirstIn(ln).isDefined && ln.contains("{")) {
          // brace-count to the loop body's end (good enough for this
          // tree: no braces inside string literals at loop heads)
          var depth = 0
          var j = i
          val region = Vector.newBuilder[(Int, String)]
          var open = true
          while (j < lines.length && open) {
            depth += lines(j).count(_ == '{') - lines(j).count(_ == '}')
            region += ((j + 1, lines(j)))
            j += 1
            if (depth <= 0) open = false
          }
          val body = region.result()
          // Count OCCURRENCES, not just presence (ADVICE r12): a body
          // that materializes two frames per iteration but releases only
          // one must still fail — each unmarked materialize needs its own
          // paired release.
          def occurrences(l: String, pat: String): Int =
            l.sliding(pat.length).count(_ == pat)
          val unmarked = body.filter { case (_, l) =>
            l.contains(".materialize") && !l.contains("retained") }
          val nMat = unmarked.map { case (_, l) =>
            occurrences(l, ".materialize") }.sum
          val nRel = body.map { case (_, l) =>
            occurrences(l, ".release()") }.sum
          if (nMat > nRel)
            out += s"${f.getName}:${unmarked.head._1} " +
              s"($nMat unmarked materialize vs $nRel release)"
          i = j
        } else i += 1
      }
      out.result()
    }
    assert(offenders.isEmpty,
      "loops that materialize without releasing (pair superseded " +
        "iterations with .release(), or mark the line " +
        "`.materialize // retained: <why>`): " + offenders.mkString(", "))
  }

  test("all three materialize modes produce the same rows") {
    import Materialize._
    val base = spark.range(0, 1000).select(
      col("id"), (col("id") % 7).as("k"))
    def run(mode: String): Seq[(Long, Long)] = {
      spark.conf.set("graft.materialize.mode", mode)
      try {
        val m = base.groupBy("k").agg(sum("id").as("s")).materialize
        // two consumers, like the real call sites
        val n = m.count()
        assert(n == 7)
        m.orderBy("k").collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
      } finally spark.conf.unset("graft.materialize.mode")
    }
    val local = run("local")
    assert(run("replicated") == local)
    assert(run("reliable") == local)
  }
}
