package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Materialize._
import graft.queries.Dedup

/** Dev probe: per-component shuffle attribution of the two-tier
  * winnow-blocked join (q229's shape) — where do the bytes go? Runs each
  * stage of jaccardJoinWinnowBlocked separately at the given SF and
  * prints the byte deltas, so the r12 swrite work targets the real
  * elephant instead of a guessed one.
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.tools.RareTierProbe <sfDir>
  */
object RareTierProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sread = new AtomicLong; val swrite = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null && sc.stageInfo.failureReason.isEmpty) {
          sread.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          swrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    })
    def phase(name: String)(body: => Long): Unit = {
      sread.set(0); swrite.set(0)
      val t0 = System.nanoTime()
      val n = body
      org.apache.spark.graft.ListenerBridge
        .waitUntilEmpty(spark.sparkContext, 60000L)
      println(f"PHASE $name%-28s rows=$n%10d swrite=${swrite.get / 1e6}%8.1f MB sread=${sread.get / 1e6}%8.1f MB wall=${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    val documents = spark.read.parquet(s"$sfDir/documents.parquet")
    val theta = 0.5
    val docs = documents.select(col("doc_id"), array_distinct(
        graft.functions.ArrayExprs.windowHashes(split(col("text"), " "), 3)).as("sh"))
      .filter(size(col("sh")) > 0)
    var docsM: org.apache.spark.sql.DataFrame = null
    phase("docs.materialize") { docsM = docs.materialize; docsM.count() }
    var toksM: org.apache.spark.sql.DataFrame = null
    phase("toks.materialize") {
      toksM = docsM.select(col("doc_id"), explode(col("sh")).as("tok")).materialize
      toksM.count()
    }
    phase("rare: dup df-count") {
      toksM.groupBy("tok").agg(count(lit(1)).as("nd"))
        .filter(col("nd") >= 2 && col("nd") <= 25).count()
    }
    phase("rare tier complete") { Dedup.rareKeyCandidates(toksM).count() }
    phase("winnowCandidates") { Dedup.winnowCandidates(documents).count() }
    var cand: org.apache.spark.sql.DataFrame = null
    phase("two-tier union distinct") {
      cand = Dedup.winnowCandidates(documents)
        .union(Dedup.rareKeyCandidates(toksM)).distinct().materialize
      cand.count()
    }
    phase("blockedVerify") {
      Dedup.blockedVerify(cand,
        docsM.select(col("doc_id"), col("sh").as("ks")), theta).count()
    }
    spark.stop()
  }
}
