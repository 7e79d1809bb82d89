package graft.dialect

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** The last untested CLI shape, closed end-to-end: drive
  * `graft.dialect.QueryRunner` main() in a FRESH JVM exactly as the
  * reference is driven — `QueryMain query.in query.out [pagesize]
  * [numbuffer]` (reference QueryMain.java:26-40) over a data directory
  * of serialized `.tbl` + `.md` files — and byte-diff the result file
  * against the committed golden. A forked JVM (not an in-process call)
  * because main() owns its SparkSession lifecycle (builds one, stops
  * it); running it in-process would stop the suite's shared session.
  */
class QueryRunnerCliSpec extends AnyFunSuite {

  private def res(n: String) = s"src/test/resources/tbl/$n"

  test("QueryMain-shape CLI over a .tbl/.md directory matches the golden bytes") {
    val dir = Files.createTempDirectory("qr-cli")
    Files.copy(Paths.get(res("md_table.tbl")), dir.resolve("CUSTOMER.tbl"))
    Files.copy(Paths.get(res("md_table.md")), dir.resolve("CUSTOMER.md"))
    val queryIn = dir.resolve("query.in")
    Files.writeString(queryIn,
      "SELECT CUSTOMER.cid, CUSTOMER.score\n" +
        "FROM CUSTOMER\n" +
        "WHERE CUSTOMER.gender=\"1\"\n" +
        "ORDERBY CUSTOMER.cid\n")
    val outFile = dir.resolve("query.out")

    // replay this JVM's flags (the --add-opens set Spark needs on JDK 17
    // arrives pre-paired from sbt's javaOptions) on a fresh java process
    val javaBin = Paths.get(sys.props("java.home"), "bin", "java").toString
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toSeq
    val cmd = Seq(javaBin) ++ jvmArgs ++ Seq(
      "-cp", sys.props("java.class.path"),
      "graft.dialect.QueryRunner",
      // the reference's exact four-arg invocation; pagesize/numbuffer
      // are accepted-and-ignored knobs (Spark's memory manager replaces
      // the reference's fixed buffer pool)
      queryIn.toString, outFile.toString, "4096", "50")
    val pb = new ProcessBuilder(cmd.asJava)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val log = new String(p.getInputStream.readAllBytes(), "UTF-8")
    val exit = p.waitFor()
    assert(exit == 0, s"CLI exit=$exit; tail:\n${log.takeRight(4000)}")

    val got = Files.readAllBytes(outFile)
    val want = Files.readAllBytes(Paths.get(res("query_cli.golden")))
    assert(java.util.Arrays.equals(got, want),
      s"result-file bytes differ from golden; got:\n${new String(got, "UTF-8")}")
  }
}
