package graft.tools

import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._

import graft.Materialize._

/** r16 probe: does `Dataset.observe` deliver metrics when the action is
  * the materialize seam? If yes, iterative loops whose convergence test
  * is a GLOBAL row-level aggregate can fuse that count into the round's
  * materialize job instead of paying a separate aggregation job per
  * round. (Answer: yes — variant B below runs 2 jobs where A runs 4.
  * The connected-components star-forest test does NOT qualify: it is a
  * per-node grouped aggregation, which observe cannot express.)
  *
  * Usage: runMain graft.tools.ObserveProbe <sfDir>
  */
object ObserveProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    val ev = graft.Tables.load(spark, sfDir, "events")
      .groupBy("event_type").agg(count(lit(1)).as("n"))

    // A: materialize then separate count job
    jobs.set(0)
    val a = ev.materialize
    val na = a.filter(col("n") > 10).count()
    println(s"OBSPROBE A_separate jobs=${jobs.get} n=$na")

    // B: observe riding the materialize action
    jobs.set(0)
    val obs = Observation("conv")
    val b = ev.observe(obs, sum(when(col("n") > 10, 1L).otherwise(0L)).as("c"))
      .materialize
    val nb = obs.get("c")
    println(s"OBSPROBE B_observe jobs=${jobs.get} n=$nb rows=${b.count()}")
    spark.stop()
  }
}
