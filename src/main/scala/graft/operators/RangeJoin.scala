package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed (banded) range join: `left.point BETWEEN right.lo AND right.hi`.
  *
  * Catalyst plans a plain interval predicate as a broadcast-nested-loop
  * join — O(|L| x |R|) comparisons, which dies when neither side
  * broadcasts. The standard scale technique: quantize the value domain
  * into fixed-width buckets, explode each right interval to the buckets it
  * overlaps (ceil((hi-lo)/W)+1 rows, small for narrow intervals), bucket
  * the left points, equi-join on the bucket id (hash shuffle, AQE-able),
  * and re-apply the exact interval predicate as a residual filter.
  */
object RangeJoin {

  /** @param width bucket width; choose >= typical interval width so each
    *              interval explodes to ~2 buckets. */
  def bucketed(left: DataFrame, right: DataFrame,
      point: Column, lo: Column, hi: Column, width: Double): DataFrame = {
    val lb = left.withColumn("_bucket", floor(point / width))
    val rb = right.withColumn("_bucket",
      explode(sequence(floor(lo / width), floor(hi / width))))
    lb.join(rb, Seq("_bucket"))
      .filter(point >= lo && point <= hi)
      .drop("_bucket")
  }
}
