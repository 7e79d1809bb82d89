package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Generates `API.md` — the operator catalog of graft's LIBRARY surface
  * (r13 verdict ask #6): every public function of every `graft.api`
  * namespace, with its signature, source anchor, and the contract
  * paragraph from its Scaladoc (inputs, bounds, determinism, scale
  * shape — the house doc style).
  *
  * Validation (the §2.9 pattern): the generator cross-checks the
  * source-parsed method list against the COMPILED object via reflection
  * (a parsed def that reflection cannot find, or vice versa, aborts),
  * and FAILS if any public function has no Scaladoc contract — an
  * undocumented operator cannot ship in the catalog, so it cannot ship
  * at all.
  *
  * Usage: runMain graft.tools.ApiCatalog
  */
object ApiCatalog {

  private case class Entry(obj: String, name: String, sig: String,
      file: String, line: Int, doc: String)

  /** api namespace -> (implementation object, source file, object name) */
  private val namespaces: Seq[(String, Any, String, String)] = Seq(
    ("Relational", graft.queries.Relational, "src/main/scala/graft/queries/Relational.scala", "Relational"),
    ("Dedup", graft.queries.Dedup, "src/main/scala/graft/queries/Dedup.scala", "Dedup"),
    ("Similarity", graft.queries.Similarity, "src/main/scala/graft/queries/Similarity.scala", "Similarity"),
    ("Text", graft.queries.Text, "src/main/scala/graft/queries/Text.scala", "Text"),
    ("Sampling", graft.queries.Sampling, "src/main/scala/graft/queries/Sampling.scala", "Sampling"),
    ("Curation", graft.queries.Curation, "src/main/scala/graft/queries/Curation.scala", "Curation"),
    ("Events", graft.queries.Events, "src/main/scala/graft/queries/Events.scala", "Events"),
    ("Multimodal", graft.queries.Multimodal, "src/main/scala/graft/queries/Multimodal.scala", "Multimodal"),
    ("Layout", graft.queries.Layout, "src/main/scala/graft/queries/Layout.scala", "Layout"),
    ("Quality", graft.queries.Quality, "src/main/scala/graft/queries/Quality.scala", "Quality"),
    ("Preference", graft.queries.Preference, "src/main/scala/graft/queries/Preference.scala", "Preference"),
    ("Conversation", graft.queries.Conversation, "src/main/scala/graft/queries/Conversation.scala", "Conversation"),
    ("Sketches", graft.queries.Sketches, "src/main/scala/graft/queries/Sketches.scala", "Sketches"),
    ("Streams", graft.streaming.Streams, "src/main/scala/graft/streaming/Streams.scala", "Streams"),
    ("Functions", graft.functions.ArrayExprs, "src/main/scala/graft/functions/ArrayExprs.scala", "ArrayExprs"))

  /** Public defs at the top level of the NAMED object's body: (name,
    * joined signature, 1-based def line, scaladoc paragraph or "").
    * Scoped by brace counting from `object <name>` so a file holding
    * several top-level objects (ArrayExprs + ArrayOps + expression case
    * classes) contributes only the API object's surface; `private...`
    * modifiers are excluded at any visibility scope. */
  private def parse(file: String, objName: String): Seq[Entry] = {
    val lines = {
      val src = scala.io.Source.fromFile(file, "UTF-8")
      try src.getLines().toVector finally src.close()
    }
    val start = lines.indexWhere(_.matches(s"^object $objName\\b.*"))
    require(start >= 0, s"object $objName not found in $file")
    // object body ends at the first line that is exactly "}" at column 0
    val endRel = lines.drop(start).indexWhere(_ == "}")
    val end = if (endRel < 0) lines.length else start + endRel
    val defPat = "^  def ([A-Za-z0-9_]+)".r
    (start until end).flatMap { i =>
      val ln = lines(i)
      defPat.findFirstMatchIn(ln).map { m =>
        val name = m.group(1)
        // signature: join continuation lines until the '=' that ends the
        // header (paren depth 0)
        val sb = new StringBuilder
        var depth = 0; var j = i; var done = false
        while (!done && j < lines.length && j < i + 8) {
          val l = lines(j)
          var k = 0; var cut = -1
          while (k < l.length && cut < 0) {
            l(k) match {
              case '(' | '[' => depth += 1
              case ')' | ']' => depth -= 1
              case '=' if depth == 0 && j + i >= 0 &&
                  (k + 1 >= l.length || l(k + 1) != '=') && (k == 0 || l(k - 1) != '!') &&
                  (k == 0 || l(k - 1) != '<') && (k == 0 || l(k - 1) != '>') => cut = k
              case _ =>
            }
            k += 1
          }
          if (cut >= 0) { sb.append(l.take(cut).trim).append(' '); done = true }
          else { sb.append(l.trim).append(' '); j += 1 }
        }
        // scaladoc: the /** block immediately above (tolerate blank lines)
        var d = i - 1
        while (d >= 0 && lines(d).trim.isEmpty) d -= 1
        val doc =
          if (d >= 0 && (lines(d).trim.endsWith("*/") || lines(d).trim.startsWith("*"))) {
            var s = d
            while (s >= 0 && !lines(s).trim.startsWith("/**")) s -= 1
            if (s < 0) ""
            else (s to d).map(x => lines(x).trim
                .stripPrefix("/**").stripSuffix("*/").stripPrefix("*").trim)
              .filter(_.nonEmpty).mkString(" ")
          } else ""
        Entry("?", name, sb.toString.trim, file, i + 1, doc)
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val md = render()
    Files.write(Paths.get("API.md"), md.getBytes(StandardCharsets.UTF_8))
    println(s"API.md: ${namespaces.size} namespaces rendered")
  }

  /** The full catalog text; throws on any validation failure. Pure file
    * parsing + reflection (no Spark), so the freshness law in
    * ApiCatalogSpec can re-render and diff against the checked-in file. */
  def render(): String = {
    val errors = Seq.newBuilder[String]
    val sections = namespaces.map { case (ns, obj, file, objName) =>
      val parsed = parse(file, objName).map(_.copy(obj = ns))
      // reflection cross-check: every parsed def must be a public method
      // of the compiled object (catches parser drift / stale files)
      val reflected = obj.getClass.getMethods.map(_.getName).toSet
      parsed.foreach { e =>
        if (!reflected.contains(e.name))
          errors += s"$ns.${e.name}: parsed from $file:${e.line} but not a public method"
        if (e.doc.isEmpty)
          errors += s"$ns.${e.name} ($file:${e.line}): public operator without a Scaladoc contract"
      }
      val body =
        if (parsed.isEmpty)
          "_Registry query faces only (no standalone library functions) — " +
            "see `QUERIES.md` for this namespace's operators._\n"
        else parsed.map { e =>
          s"### `$ns.${e.name}`\n\n" +
            s"`${e.sig}` — `${e.file}:${e.line}`\n\n${e.doc}\n"
        }.mkString("\n")
      s"## $ns\n\n$body"
    }
    val errs = errors.result()
    if (errs.nonEmpty)
      throw new IllegalStateException(
        "API catalog validation FAILED:\n  " + errs.mkString("\n  "))
    val total = namespaces.map { case (_, _, f, o) => parse(f, o).size }.sum
    val md =
      s"""# graft library API
         |
         |GENERATED by `graft.tools.ApiCatalog` — do not edit. $total public
         |operators across ${namespaces.size} namespaces; `import graft.api._`
         |binds every namespace below. Each entry's contract paragraph is the
         |function's own Scaladoc (inputs, bounds, determinism guarantees,
         |scale shape); generation FAILS if any public operator lacks one.
         |Registry-backed operators also carry a DuckDB oracle (QUERIES.md).
         |
         |""".stripMargin + sections.mkString("\n\n")
    md
  }
}
