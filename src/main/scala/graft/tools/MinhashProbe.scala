package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.load(spark, args(0), "documents")
    val tk = split(col("text"), " ")
    val sh = array_distinct(transform(sequence(lit(0), size(tk) - 3),
      i => concat_ws(" ", element_at(tk, i + 1), element_at(tk, i + 2), element_at(tk, i + 3))))
    val sig = graft.functions.ArrayExprs.minhashSig(col("sh"), 32)
    val sigs = docs.select(col("doc_id"), sh.as("sh")).select(col("doc_id"), sig.as("sig"))
    sigs.select(countDistinct(col("sig")).as("distinct_sigs"), count(lit(1)).as("n")).show()
    sigs.select(col("sig")(0).as("m0")).groupBy("m0").count().orderBy(desc("count")).show(5, false)
    spark.stop()
  }
}
