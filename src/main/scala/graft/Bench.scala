package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: times every registered query at the scale factor in
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Queries run in sorted name order, twice each; the reported time is the
  * per-query minimum. The first pass also acts as the JVM/codegen warmup —
  * without it the first queries absorb multi-second one-time costs and the
  * numbers are not comparable across rounds.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names = SparkEntry.queries.keys.toSeq.sorted
    def timeOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir).count()
      catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }
    val r1 = names.map(n => n -> timeOnce(n)).toMap
    val r2 = names.map(n => n -> timeOnce(n)).toMap
    val best = names.map(n => n -> math.min(r1(n), r2(n))).toMap

    val qs = names.map(n => "\"" + n + "\":" + best(n)).mkString("{", ",", "}")
    val total = best.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
