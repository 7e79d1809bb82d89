package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: sweep graph-ANN parameters and print mean recall@10 vs the
  * exact ranking at a given SF — the measurement behind the (degree,
  * probes, hops, ef) defaults and the q139 spec floor. Not part of any
  * gate; run with `sbt "Test/runMain graft.queries.GraphParamProbe"`. */
object GraphParamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    val brute = graft.SparkEntry.queries("q48_knn_brute")(spark, sfDir)
      .select(col("q_id"), col("n_id")).cache()
    for {
      degree <- Seq(6, 8, 12)
      probes <- Seq(2, 3)
      ef <- Seq(10, 16, 24)
    } {
      val g = Similarity.graphSearch(emb, col("vec_id") < 50,
          degree = degree, probes = probes, ef = ef)
        .select(col("q_id"), col("n_id"))
      val hits = g.join(brute, Seq("q_id", "n_id"), "left_semi").count()
      val nq = brute.select("q_id").distinct().count()
      println(f"degree=$degree probes=$probes ef=$ef  recall=${hits.toDouble / (10 * nq)}%.3f")
    }
    spark.stop()
  }
}
