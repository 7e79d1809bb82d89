package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r16 A/B probe: terminal global-sort mechanics for BOUNDED report
  * frames. Compares, on representative report shapes,
  *
  *   A: .orderBy(keys)                 — Exchange(rangepartitioning):
  *      a sampling job over the child + the child executed a second
  *      time by the shuffle write, then the sorted read;
  *   B: .repartition(1).sortWithinPartitions(keys)
  *      — Exchange(SinglePartition), no sampling pass, child executes
  *      once; the one-task final sort is bounded by the report size.
  *
  * Rows and order are identical when the sort key is total (every
  * gated query's is — the row-by-row oracle compare would fail
  * otherwise). Jobs and wall are printed per variant.
  *
  * Usage: runMain graft.tools.SortProbe <sfDir>
  */
object SortProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    def events = graft.Tables.load(spark, sfDir, "events")
    def hourly = events
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("users"))
    def run(tag: String, df: => DataFrame): Unit = {
      // warmup
      df.write.format("noop").mode("overwrite").save()
      val reps = (1 to 3).map { _ =>
        jobs.set(0)
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        ((System.nanoTime() - t0) / 1e9, jobs.get)
      }
      val best = reps.map(_._1).min
      println(f"SORTPROBE $tag best=$best%.3f jobs=${reps.head._2}")
    }
    run("A_orderBy", hourly.orderBy("hour", "event_type"))
    run("B_repart1", hourly.repartition(1)
      .sortWithinPartitions("hour", "event_type"))
    run("A_orderBy2", hourly.orderBy("hour", "event_type"))
    run("B_repart1b", hourly.repartition(1)
      .sortWithinPartitions("hour", "event_type"))
    // row/order equality certificate
    val a = hourly.orderBy("hour", "event_type").collect()
    val b = hourly.repartition(1).sortWithinPartitions("hour", "event_type").collect()
    println(s"SORTPROBE equal=${a.sameElements(b)} rows=${a.length}")
    spark.stop()
  }
}
