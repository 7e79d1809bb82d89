package graft

import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Schema-drift canary (VERDICT r7 item 2): the driver regenerates
  * /root/testdata between rounds and has already shipped `events.ts`
  * under two different physical schemas. Most specs build fixtures
  * synthetically, so a loader broken by testdata drift only failed
  * incidentally, 23 tests deep. This spec loads EVERY table in
  * `Tables.all` from the real testdata and touches every column, so the
  * next silent regeneration fails loudly, here, with the table name in
  * the failure message.
  */
class TablesSpec extends AnyFunSuite with SparkTestBase {

  for (name <- Tables.all) {
    test(s"canary: '$name' loads from real testdata and every column is readable") {
      val df = Tables.load(spark, sfDir, name)
      assert(df.schema.fields.nonEmpty, s"$name: empty schema")
      // Touch every column through an actual row materialization — a
      // schema that parses but whose values can't decode must fail here.
      val row = df.limit(1).collect()
      assert(row.nonEmpty, s"$name: table is empty at $sfDir")
      assert(row.head.size == df.schema.size)
    }
  }

  for (name <- Tables.all) {
    test(s"footer row count equals load().count() for '$name'") {
      // q294 (and any future branch-pick) takes the corpus size from the
      // parquet footers instead of a count() job; this law pins that the
      // metadata count matches the scan count for every table — i.e.
      // Tables.load never drops or fabricates rows.
      assert(Tables.rowCountFromFooters(spark, sfDir, name) ==
        Tables.load(spark, sfDir, name).count(), s"footer/scan count drift: $name")
    }
  }

  test("events.ts loads as session-TZ timestamp regardless of physical schema") {
    val df = Tables.load(spark, sfDir, "events")
    val dt = df.schema("ts").dataType
    assert(dt == TimestampType, s"events.ts loaded as $dt, want TimestampType")
    assert(dt != TimestampNTZType)
    // and values are sane epoch-range timestamps, not mis-scaled ns/µs
    val ts = df.selectExpr("min(unix_timestamp(ts))", "max(unix_timestamp(ts))").head()
    val (lo, hi) = (ts.getLong(0), ts.getLong(1))
    assert(lo > 946684800L && hi < 4102444800L, // 2000-01-01 .. 2100-01-01
      s"events.ts epoch range [$lo, $hi] implausible — unit mis-scale?")
  }

  test("registerAll isolates a broken loader: unrelated tables still resolve") {
    // Point registerAll at a directory where events.parquet is corrupt but
    // other tables are real: queries over those tables must still work.
    val dir = java.nio.file.Files.createTempDirectory("graft_broken").toString
    for (t <- Seq("customer", "nation")) {
      val src = java.nio.file.Paths.get(s"$sfDir/$t.parquet")
      java.nio.file.Files.copy(src, java.nio.file.Paths.get(s"$dir/$t.parquet"))
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/events.parquet"), "not parquet at all")
    Tables.registerAll(spark, dir)
    try {
      // q39's failure mode: a pure customer/nation query must survive.
      assert(spark.sql("SELECT count(*) FROM customer JOIN nation ON c_nationkey = n_nationkey").head().getLong(0) > 0)
      // The broken table fails fast on reference, not silently.
      intercept[Exception](spark.sql("SELECT * FROM events LIMIT 1").collect())
    } finally {
      // Re-register the real testdata so later suites in the same session
      // see correct views.
      Tables.registerAll(spark, sfDir)
    }
  }
}
