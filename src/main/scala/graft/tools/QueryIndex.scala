package graft.tools

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.SparkEntry

/** Generates `QUERIES.md` — the one-page map of the whole registry:
  * name -> definition file:line -> family -> oracle/headline flags ->
  * covering specs -> one-line purpose (first sentence of the comment
  * block above the `QueryDef`). Regenerated at round close; the
  * registry itself is the source of truth (a registry entry with no
  * located definition, or a stale index, is a build error here).
  *
  * Run: `sbt "runMain graft.tools.QueryIndex"`.
  */
object QueryIndex {

  private def scalaFiles(f: File): Seq[File] =
    if (f.isDirectory) f.listFiles().toSeq.flatMap(scalaFiles)
    else if (f.getName.endsWith(".scala")) Seq(f) else Nil

  private def readLines(f: File): Vector[String] = {
    val src = scala.io.Source.fromFile(f, "UTF-8")
    try src.getLines().toVector finally src.close()
  }

  /** First sentence of the contiguous `//` block directly above line i. */
  private def purposeAbove(lines: Vector[String], i: Int): String = {
    val block = (i - 1 to 0 by -1).iterator
      .map(lines)
      .takeWhile(_.trim.startsWith("//"))
      .map(_.trim.stripPrefix("//").trim)
      .toVector.reverse
    if (block.isEmpty) return ""
    // drop the `---- banner ----` dashes some headers carry
    val joined = block.mkString(" ")
      .replaceAll("-{3,}", " ").replaceAll("\\s+", " ").trim
    val cut = joined.indexOf(". ")
    val s = if (cut >= 0) joined.take(cut + 1) else joined
    if (s.length <= 140) s else s.take(137) + "..."
  }

  def main(args: Array[String]): Unit = {
    val defs = scalaFiles(new File("src/main/scala/graft")).flatMap { f =>
      val lines = readLines(f)
      val pat = "QueryDef\\(\\s*\"(q[0-9a-z_]+)\"".r
      lines.zipWithIndex.flatMap { case (ln, i) =>
        pat.findFirstMatchIn(ln).map(m =>
          m.group(1) -> (f, i, purposeAbove(lines, i)))
      }
    }.toMap

    // spec coverage: every test file that names the query
    val testFiles = scalaFiles(new File("src/test/scala/graft"))
      .map(f => f -> readLines(f).mkString("\n"))

    val qnum = "q(\\d+)".r
    val rows = SparkEntry.registry.sortBy(q =>
      qnum.findFirstMatchIn(q.name).map(_.group(1).toInt).getOrElse(0)
    ).map { q =>
      val (file, line, purpose) = defs.get(q.name)
        .map { case (f, i, p) =>
          (s"src/main/scala/graft/${relUnder(f)}", i + 1, p)
        }
        .getOrElse(sys.error(s"registry entry ${q.name} has no located QueryDef"))
      val specs = testFiles.collect {
        case (f, body) if body.contains("\"" + q.name + "\"") => f.getName
      }
      val flags = Seq(
        if (q.oracle.isDefined) Some("oracle") else None,
        if (q.headline) Some("headline") else None).flatten.mkString(" ")
      s"| ${q.name} | `$file:$line` | ${familyOf(file)} | $flags | " +
        s"${specs.mkString(", ")} | ${purpose.replace("|", "\\|")} |"
    }

    val header =
      s"""# Query index (generated — do not edit)
         |
         |`sbt "runMain graft.tools.QueryIndex"` regenerates this file from
         |`SparkEntry.registry` + a source scan. ${rows.size} registered
         |queries. "oracle" = exact DuckDB-oracle hash check in the driver
         |gate; "headline" = counted in Bench's `headline_total`. Specs =
         |test files that name the query (laws, scale probes, allowlists).
         |
         |""".stripMargin
    // rows are appended OUTSIDE stripMargin: they start with '|'
    val md = header +
      "| query | definition | family | flags | specs | purpose |\n" +
      "|---|---|---|---|---|---|\n" +
      rows.mkString("\n") + "\n"
    Files.write(Paths.get("QUERIES.md"), md.getBytes(StandardCharsets.UTF_8))
    println(s"QUERIES.md: ${rows.size} rows")
  }

  private def relUnder(f: File): String = {
    val p = f.getPath
    p.substring(p.indexOf("graft/") + "graft/".length)
  }

  private def familyOf(path: String): String = {
    val base = path.substring(path.lastIndexOf('/') + 1).stripSuffix(".scala")
    base.toLowerCase
  }
}
