package graft.tools
import graft.Materialize._
import org.apache.spark.sql.SparkSession
object CCProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val t0 = System.nanoTime()
    val pairs = graft.queries.Dedup.nearDupPairsOf(
      graft.Tables.load(spark, d, "documents")).select("doc_a", "doc_b")
      .materialize
    println(f"CC pairs ${(System.nanoTime()-t0)/1e9}%.2f s (${pairs.count()} pairs)")
    (1 to 2).foreach { r =>
      val t1 = System.nanoTime()
      val (labels, rounds) = graft.queries.Dedup.connectedComponents(pairs)
      val n = labels.count()
      println(f"CC run$r ${(System.nanoTime()-t1)/1e9}%.2f s rounds=$rounds labels=$n")
    }
    spark.stop()
  }
}
