package graft.sources

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The reference ships per-table statistics in `<table>.stat` text files
  * (line 1 = tuple count, line 2 = per-column distinct counts; its
  * optimizer reads them in PlanCost.getStatistics,
  * src/qp/optimizer/PlanCost.java:219-263). These specs pin the parser,
  * the catalog injection (CBO must see the EXTERNAL numbers, not a scan's),
  * the QueryRunner table-discovery path, and the reference `QueryMain`
  * CLI invocation shape.
  */
class StatsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("readStat parses the reference two-line format") {
    val dir = tmp("stat-parse")
    Files.write(Paths.get(s"$dir/t.stat"), "12345\n100 42 7\n".getBytes)
    assert(Stats.readStat(s"$dir/t.stat") == ((12345L, Seq(100L, 42L, 7L))))
    // whitespace-tolerant like the reference's StringTokenizer
    Files.write(Paths.get(s"$dir/u.stat"), "  9 \n 3   2 \n".getBytes)
    assert(Stats.readStat(s"$dir/u.stat") == ((9L, Seq(3L, 2L))))
  }

  test("injectStatFile feeds the catalog the .stat numbers, not a scan's") {
    val dir = tmp("stat-inject")
    val df = Seq((1, "a"), (2, "b"), (3, "a")).toDF("id", "grp")
    Stats.saveAsCatalogTable(spark, "stat_inject_t", df)
    // claim numbers wildly different from the 3 physical rows: the point
    // of .stat support is trusting external stats without scanning
    Files.write(Paths.get(s"$dir/stat_inject_t.stat"), "1000000\n999999 5\n".getBytes)
    try {
      Stats.injectStatFile(spark, "stat_inject_t", s"$dir/stat_inject_t.stat")
      val stats = spark.table("stat_inject_t").queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(1000000)))
      val ndv = spark.sql("DESC EXTENDED stat_inject_t grp")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(ndv("distinct_count") == "5")
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", "false")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
      spark.sql("DROP TABLE IF EXISTS stat_inject_t")
    }
  }

  test("injectStatFile rejects a column-count mismatch") {
    val dir = tmp("stat-bad")
    val df = Seq((1, "a")).toDF("id", "grp")
    Stats.saveAsCatalogTable(spark, "stat_bad_t", df)
    Files.write(Paths.get(s"$dir/stat_bad_t.stat"), "10\n1 2 3\n".getBytes)
    try intercept[IllegalArgumentException] {
      Stats.injectStatFile(spark, "stat_bad_t", s"$dir/stat_bad_t.stat")
    } finally spark.sql("DROP TABLE IF EXISTS stat_bad_t")
  }

  test("QueryRunner.loadTables discovers .stat files beside tables") {
    val dir = tmp("stat-discover")
    Seq((1, 10), (2, 20)).toDF("k", "v")
      .write.parquet(s"$dir/emp.parquet")
    Files.write(Paths.get(s"$dir/emp.stat"), "777\n700 70\n".getBytes)
    try {
      val tables = graft.dialect.QueryRunner.loadTables(spark, dir)
      val stats = tables("emp").queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(777)),
        s"CBO should see the .stat row count, got $stats")
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", "false")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
      // loadTables registers into the per-directory stats database, not
      // default — drop that database or the table leaks across tests
      spark.sql(s"DROP DATABASE IF EXISTS `${graft.dialect.QueryRunner.statDb(dir)}` CASCADE")
    }
  }

  test(".stat numbers drive the physical join choice, not just metadata") {
    // same physical data, two different .stat claims: tiny => the CBO
    // (and the planner's size estimate derived from it) must broadcast;
    // huge => it must not. This is the end-to-end point of .stat support.
    val dir = tmp("stat-cbo")
    val dim = Seq.tabulate(50)(i => (i.toLong, s"g${i % 5}")).toDF("k", "grp")
    val fact = Seq.tabulate(500)(i => (i.toLong % 50, i.toLong)).toDF("k", "v")
    Stats.saveAsCatalogTable(spark, "stat_cbo_dim", dim)
    Stats.saveAsCatalogTable(spark, "stat_cbo_fact", fact)
    def planWith(dimRows: Long, dimNdv: Long): String = {
      Files.write(Paths.get(s"$dir/dim.stat"), s"$dimRows\n$dimNdv 5\n".getBytes)
      Stats.injectStatFile(spark, "stat_cbo_dim", s"$dir/dim.stat")
      Files.write(Paths.get(s"$dir/fact.stat"), "100000000\n50 100000000\n".getBytes)
      Stats.injectStatFile(spark, "stat_cbo_fact", s"$dir/fact.stat")
      spark.table("stat_cbo_fact").join(spark.table("stat_cbo_dim"), "k")
        .groupBy("grp").count()
        .queryExecution.executedPlan.toString
    }
    try {
      assert(planWith(50L, 50L).contains("BroadcastHashJoin"),
        "tiny .stat side should broadcast")
      assert(!planWith(500000000L, 50000000L).contains("BroadcastHashJoin"),
        "huge .stat side must not broadcast")
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", "false")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
      spark.sql("DROP TABLE IF EXISTS stat_cbo_dim")
      spark.sql("DROP TABLE IF EXISTS stat_cbo_fact")
    }
  }

  test(".stat beside a non-parquet reference table materializes + injects") {
    // det/txt tables have no parquet files to register externally, so the
    // .stat path materializes them once into the warehouse — stats must
    // still reach the optimizer
    val dir = tmp("stat-det")
    val det = "/root/reference/testcases/CART.det"
    val gen = DetSource.generate(spark, det, 40)
    val lines = gen.collect().map(_.toSeq.map(String.valueOf).mkString("", "\t", "\t"))
    Files.write(Paths.get(s"$dir/CART.txt"), lines.mkString("\n").getBytes("UTF-8"))
    Files.copy(Paths.get(det), Paths.get(s"$dir/CART.det"))
    val ndvs = gen.columns.map(_ => "7").mkString(" ")
    Files.write(Paths.get(s"$dir/CART.stat"), s"424242\n$ndvs\n".getBytes)
    try {
      val tables = graft.dialect.QueryRunner.loadTables(spark, dir)
      val stats = tables("CART").queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(424242)),
        s"CBO should see the .stat row count for a det/txt table, got $stats")
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", "false")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
      spark.sql(s"DROP DATABASE IF EXISTS `${graft.dialect.QueryRunner.statDb(dir)}` CASCADE")
    }
  }

  test("reference QueryMain invocation shape writes the reference format") {
    // tables live next to the query file, exactly like a reference data dir
    val dir = tmp("refcli")
    val det = "/root/reference/testcases/CUSTOMER.det"
    val gen = DetSource.generate(spark, det, 50)
    val lines = gen.collect().map(_.toSeq.map(String.valueOf).mkString("", "\t", "\t"))
    Files.write(Paths.get(s"$dir/CUSTOMER.txt"), lines.mkString("\n").getBytes("UTF-8"))
    Files.copy(Paths.get(det), Paths.get(s"$dir/CUSTOMER.det"))
    Files.copy(Paths.get("/root/reference/testcases/query2.sql"),
      Paths.get(s"$dir/query2.sql"))

    val result = s"$dir/out.txt"
    // QueryMain <queryfilename> <resultfile> <pagesize> <numbuffer>
    graft.dialect.QueryRunner.run(spark, Array(s"$dir/query2.sql", result, "1000", "10"))

    val out = Files.readAllLines(Paths.get(result))
    val want = gen.filter($"gender" === 1).count()
    assert(out.size.toLong == 1 + want, s"header + $want rows, got ${out.size}")
    // reference printSchema: each column name followed by two spaces
    assert(out.get(0) == Seq("CUSTOMER.cid", "CUSTOMER.gender", "CUSTOMER.firstname")
      .map(_ + "  ").mkString)
    // reference printTuple: each value followed by a tab
    assert(out.get(1).count(_ == '\t') == 3)
  }
}
