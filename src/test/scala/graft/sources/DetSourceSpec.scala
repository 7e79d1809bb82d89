package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.dialect.Translator

class DetSourceSpec extends AnyFunSuite with SparkTestBase {

  test("parses the reference .det catalog format") {
    val s = DetSource.parseDet("/root/reference/testcases/CUSTOMER.det")
    assert(s.tupleBytes == 100)
    assert(s.structType == StructType(Seq(
      StructField("cid", IntegerType, nullable = false),
      StructField("gender", IntegerType, nullable = false),
      StructField("firstname", StringType, nullable = false),
      StructField("lastname", StringType, nullable = false),
      StructField("address", StringType, nullable = false))))
    assert(s.columns.head.key == "PK" && s.columns.head.range == 200)
  }

  test("reads reference-format tab-separated txt (with trailing tabs)") {
    val dir = Files.createTempDirectory("det")
    Files.writeString(dir.resolve("CUSTOMER.txt"),
      "7\t1\tabc\tdef\taddr1\t\n12\t0\txyz\tqrs\taddr2\t\n")
    val df = DetSource.readTxt(spark,
      "/root/reference/testcases/CUSTOMER.det", dir.resolve("CUSTOMER.txt").toString)
    val rows = df.orderBy("cid").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(7, 12))
    assert(rows.head.getString(2) == "abc")
  }

  test("deterministic generator: PK is a permutation, values reproducible") {
    val a = DetSource.generate(spark, "/root/reference/testcases/CUSTOMER.det", 150)
    val b = DetSource.generate(spark, "/root/reference/testcases/CUSTOMER.det", 150)
    assert(a.collect().map(_.toSeq).toSeq == b.collect().map(_.toSeq).toSeq)
    val pks = a.select("cid").collect().map(_.getInt(0))
    assert(pks.distinct.length == 150)
    val genders = a.select("gender").distinct().collect().map(_.getInt(0)).toSet
    assert(genders.subsetOf(Set(0, 1)))
  }

  test("DataSource V2 connector reads det tables with column pruning") {
    val dir = Files.createTempDirectory("detv2")
    Files.copy(java.nio.file.Paths.get("/root/reference/testcases/CUSTOMER.det"),
      dir.resolve("CUSTOMER.det"))
    Files.writeString(dir.resolve("CUSTOMER.txt"),
      "7\t1\tabc\tdef\taddr1\t\n12\t0\txyz\tqrs\taddr2\t\n")
    val df = spark.read.format("graft.sources.DetDataSource")
      .load(dir.resolve("CUSTOMER").toString)
    assert(df.schema.fieldNames.toSeq ==
      Seq("cid", "gender", "firstname", "lastname", "address"))
    val rows = df.select("firstname", "cid").orderBy("cid").collect()
    assert(rows.map(r => (r.getString(0), r.getInt(1))).toSeq ==
      Seq(("abc", 7), ("xyz", 12)))
    // pruning reaches the scan: only 2 of 5 columns in ReadSchema
    val plan = df.select("firstname", "cid").queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<firstname:string,cid:int>")
      || plan.contains("firstname#"), plan)
  }

  test("dialect queries run over generated reference-format tables") {
    val customer = DetSource.generate(spark, "/root/reference/testcases/CUSTOMER.det", 200)
    val got = Translator.run(spark,
      """SELECT CUSTOMER.cid,CUSTOMER.gender,CUSTOMER.firstname
        |FROM CUSTOMER
        |WHERE CUSTOMER.gender="1"""".stripMargin,
      Map("CUSTOMER" -> customer))
    val want = customer.filter(col("gender") === 1).count()
    assert(got.count() == want && want > 0)
  }
}
