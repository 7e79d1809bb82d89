package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestBase}

/** Sink/source round-trips: results written to parquet (partitioned),
  * csv, and json read back identically — the sink surface of the engine
  * (the reference's only sink is a tab-separated result file,
  * QueryMain.java:186-306; QueryRunner covers that shape).
  */
class SinksSpec extends AnyFunSuite with SparkTestBase {

  lazy val result = SparkEntry.queries("q11_pricing_summary")(spark, sfDir)

  test("partitioned parquet round-trip") {
    val dir = Files.createTempDirectory("sink-parquet").toString
    result.write.mode("overwrite").partitionBy("l_returnflag").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == result.count())
    // partition pruning: reading one partition touches one directory
    val one = spark.read.parquet(dir).filter(col("l_returnflag") === "A")
    assert(one.count() == result.filter(col("l_returnflag") === "A").count())
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || plan.contains("l_returnflag"))
  }

  test("csv round-trip with header and explicit schema") {
    val dir = Files.createTempDirectory("sink-csv").toString
    result.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").schema(result.schema).csv(dir)
    assertSameRows(back, result)
  }

  test("json round-trip") {
    val dir = Files.createTempDirectory("sink-json").toString
    result.write.mode("overwrite").json(dir)
    val back = spark.read.schema(result.schema).json(dir)
    assertSameRows(back, result)
  }
}
