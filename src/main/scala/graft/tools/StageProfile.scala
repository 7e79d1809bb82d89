package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-query SCHEDULING-SHAPE profile — the companion to ShuffleAudit's
  * byte surface. At the local bench SF most of the 375-query wall total
  * is not data movement (zero spill, tens of MB shuffled) but PLAN
  * EXECUTION OVERHEAD: Spark jobs launched per query (every eager
  * materialize / broadcast build / AQE stage is one), stages scheduled,
  * and tasks dispatched. A query that moves 1 MB in 40 stages is
  * overhead-bound locally AND latency-bound (stage barriers) at 100 TB;
  * this tool makes that shape measurable so optimization targets the
  * right queries — guide §1 "measure first", applied to the scheduler.
  *
  * Prints one line per query:
  *
  *   PROFILE <name> wall=<s> jobs=N stages=N tasks=N exch=N bexch=N aqe=N
  *
  * exch/bexch = shuffle/broadcast exchange NODES in the final (post-AQE)
  * executed plans of every execution the query triggers (tree walk,
  * reuse-deduped — the ShuffleAudit counting discipline); aqe = number
  * of separate query executions (actions) the build triggered.
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.tools.StageProfile <sfDir> [namePrefix...]
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val prefixes = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "10000") // see Bench.scala
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.maxPlanStringLength", "1048576")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new AtomicLong; val stages = new AtomicLong
    val tasks = new AtomicLong
    // verbose stage breakdown (set GRAFT_PROFILE_STAGES=1): one line per
    // completed stage with its input/shuffle bytes — pinpoints WHICH stage
    // re-reads a table when a query's input bytes exceed the file size
    val verbose = sys.env.get("GRAFT_PROFILE_STAGES").contains("1")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (sc.stageInfo.failureReason.isEmpty) {
          stages.incrementAndGet()
          tasks.addAndGet(sc.stageInfo.numTasks.toLong)
          if (verbose) {
            val m = sc.stageInfo.taskMetrics
            println(f"STAGE id=${sc.stageInfo.stageId} tasks=${sc.stageInfo.numTasks} " +
              f"in=${m.inputMetrics.bytesRead / 1048576.0}%.1fMiB " +
              f"sread=${m.shuffleReadMetrics.totalBytesRead / 1048576.0}%.1fMiB " +
              f"swrite=${m.shuffleWriteMetrics.bytesWritten / 1048576.0}%.1fMiB " +
              s"name=${sc.stageInfo.name.takeWhile(_ != '\n').take(80)}")
          }
        }
    })

    val exch = new AtomicLong; val bexch = new AtomicLong
    val execs = new AtomicLong
    def countOps(root: org.apache.spark.sql.execution.SparkPlan): Unit = {
      val seen = java.util.Collections.newSetFromMap(
        new java.util.IdentityHashMap[org.apache.spark.sql.execution.SparkPlan, java.lang.Boolean]())
      def go(p: org.apache.spark.sql.execution.SparkPlan): Unit =
        if (seen.add(p)) p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            go(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            go(q.plan)
          case _: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => ()
          case n =>
            n.getClass.getSimpleName match {
              case "ShuffleExchangeExec" => exch.incrementAndGet()
              case "BroadcastExchangeExec" => bexch.incrementAndGet()
              case _ => ()
            }
            n.children.foreach(go)
        }
      go(root)
    }
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit = {
        execs.incrementAndGet(); countOps(qe.executedPlan)
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    })

    graft.SparkEntry.registry
      .filter(q => prefixes.isEmpty || prefixes.exists(q.name.startsWith))
      .foreach { q =>
        // warmup rep amortizes codegen/JIT; second rep is the report
        try {
          q.build(spark, sfDir).write.format("noop").mode("overwrite").save()
          spark.catalog.clearCache()
          Seq(jobs, stages, tasks, exch, bexch, execs).foreach(_.set(0L))
          val t0 = System.nanoTime()
          q.build(spark, sfDir).write.format("noop").mode("overwrite").save()
          val sec = (System.nanoTime() - t0) / 1e9
          try org.apache.spark.graft.ListenerBridge
            .waitUntilEmpty(spark.sparkContext, 60000L)
          catch { case scala.util.control.NonFatal(_) => () }
          println(f"PROFILE ${q.name} wall=$sec%.3f jobs=${jobs.get} " +
            s"stages=${stages.get} tasks=${tasks.get} exch=${exch.get} " +
            s"bexch=${bexch.get} aqe=${execs.get}")
        } catch {
          case e: Throwable => println(s"PROFILE ${q.name} FAILED ${e.getMessage}")
        } finally spark.catalog.clearCache()
      }
    spark.stop()
  }
}
