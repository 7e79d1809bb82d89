package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable quantile sketch over non-negative int64 values: a
  * log-scale fixed-boundary histogram (the HDR-histogram / Prometheus
  * native-histogram design, which is the deterministic cousin of KLL —
  * chosen over KLL/GK/t-digest because those are merge-ORDER-dependent,
  * and Spark's partial aggregation merges in nondeterministic order;
  * a fixed bucket universe makes the sketch a commutative monoid, so
  * the result is a pure function of the input multiset and can be
  * hash-compared against a DuckDB oracle).
  *
  * Buckets: values below 2^(s+1) are exact singletons; above, each
  * octave [2^L, 2^(L+1)) splits into 2^s linear sub-buckets, indexed by
  * the top s+1 bits. With s = 4 that is at most (63-s)*2^s + 2^(s+1) =
  * 976 buckets for the full int64 range — a few KB per group no matter
  * the cardinality, merged by counter addition in the map-side partial.
  *
  * Guarantee: the rank-r estimate (upper bound of the bucket whose
  * cumulative count first reaches r) over-estimates the true rank-r
  * value by strictly less than a factor 2^-s: est >= exact and
  * 2^s * (est - exact) < exact, provable in pure int64 arithmetic
  * (QuantileSketchSpec pins it; q233 attests it in-query per group).
  *
  * All bucket math is integer-only (no log/exp — not bit-portable) and
  * mirrored in DuckDB SQL via length(bin(v)) for the bit length.
  */
object LogHist {
  val SubBits = 4
  val SubBuckets: Int = 1 << SubBits // 16

  /** Bucket index of a non-negative value; monotone non-decreasing. */
  def bucketOf(v: Long): Int = {
    require(v >= 0, s"LogHist is defined for non-negative values, got $v")
    if (v < 2L * SubBuckets) v.toInt
    else {
      val bits = 64 - java.lang.Long.numberOfLeadingZeros(v)
      (((bits - SubBits - 1) << SubBits) + (v >> (bits - 1 - SubBits))).toInt
    }
  }

  /** Inclusive upper bound of bucket `idx` — the rank estimate. */
  def bucketHi(idx: Int): Long =
    if (idx < SubBuckets) idx.toLong
    else {
      val t = (idx >> SubBits) - 1
      val m = (idx & (SubBuckets - 1)) + SubBuckets
      ((m + 1).toLong << t) - 1
    }

  /** Inclusive lower bound of bucket `idx`. */
  def bucketLo(idx: Int): Long =
    if (idx < SubBuckets) idx.toLong
    else {
      val t = (idx >> SubBits) - 1
      val m = (idx & (SubBuckets - 1)) + SubBuckets
      m.toLong << t
    }

  /** DuckDB mirror of [[bucketOf]] over a BIGINT expression (bit length
    * via length(bin(v)) — unpadded in both engines). */
  def sqlBucketOf(c: String): String =
    s"CASE WHEN $c < ${2 * SubBuckets} THEN $c ELSE " +
      s"((length(bin($c)) - ${SubBits + 1}) * $SubBuckets) + " +
      s"($c >> (length(bin($c)) - ${SubBits + 1})) END"

  /** DuckDB mirror of [[bucketHi]] over a bucket-index expression. The
    * base is cast BIGINT before the shift — an INTEGER-typed index
    * would otherwise overflow DuckDB's 32-bit left shift at idx >= 512. */
  def sqlBucketHi(c: String): String =
    s"CASE WHEN $c < $SubBuckets THEN CAST($c AS BIGINT) ELSE " +
      s"(CAST(($c % $SubBuckets) + ${SubBuckets + 1} AS BIGINT) << " +
      s"(($c // $SubBuckets) - 1)) - 1 END"

  /** Spark-SQL mirror of [[bucketHi]] over a bucket-index column. */
  def sparkBucketHi(c: String): String =
    s"CASE WHEN $c < $SubBuckets THEN CAST($c AS BIGINT) ELSE " +
      s"shiftleft(CAST($c % $SubBuckets AS BIGINT) + ${SubBuckets + 1}, " +
      s"$c div $SubBuckets - 1) - 1 END"
}

/** The sketch as a partial-aggregable typed Aggregator (the
  * TopKAgg/BottomKLongAgg pattern): buffer = sparse bucket->count map
  * (<= 976 entries), reduce = one counter bump, merge = counter-map
  * addition — a commutative monoid, so map-side partials reduce each
  * task's rows to one few-KB sketch before the exchange and the merged
  * result is independent of partitioning and merge order. */
final class LogHistAgg extends Aggregator[Long, Map[Int, Long], Seq[(Int, Long)]] {
  override def zero: Map[Int, Long] = Map.empty
  override def reduce(b: Map[Int, Long], v: Long): Map[Int, Long] = {
    val i = LogHist.bucketOf(v)
    b.updated(i, b.getOrElse(i, 0L) + 1L)
  }
  override def merge(a: Map[Int, Long], b: Map[Int, Long]): Map[Int, Long] =
    b.foldLeft(a) { case (acc, (i, c)) => acc.updated(i, acc.getOrElse(i, 0L) + c) }
  override def finish(b: Map[Int, Long]): Seq[(Int, Long)] = b.toSeq.sortBy(_._1)
  override def bufferEncoder: Encoder[Map[Int, Long]] =
    ExpressionEncoder[Map[Int, Long]]()
  override def outputEncoder: Encoder[Seq[(Int, Long)]] =
    ExpressionEncoder[Seq[(Int, Long)]]()
}

/** Weighted variant: each (value, weight) row adds `weight` to the
  * value's bucket, so the crossing rank runs over cumulative WEIGHT —
  * weighted percentiles ("which value does the median unit of weight
  * live at") from the same fixed bucket universe and merge algebra.
  * Weights must be non-negative; int64 weight sums are the caller's
  * overflow contract (token counts against doc lengths stay far below
  * 2^63 at any real corpus size). */
final class LogHistWeightedAgg
    extends Aggregator[(Long, Long), Map[Int, Long], Seq[(Int, Long)]] {
  override def zero: Map[Int, Long] = Map.empty
  override def reduce(b: Map[Int, Long], vw: (Long, Long)): Map[Int, Long] = {
    require(vw._2 >= 0, s"negative weight ${vw._2}")
    val i = LogHist.bucketOf(vw._1)
    b.updated(i, b.getOrElse(i, 0L) + vw._2)
  }
  override def merge(a: Map[Int, Long], b: Map[Int, Long]): Map[Int, Long] =
    b.foldLeft(a) { case (acc, (i, c)) => acc.updated(i, acc.getOrElse(i, 0L) + c) }
  override def finish(b: Map[Int, Long]): Seq[(Int, Long)] = b.toSeq.sortBy(_._1)
  override def bufferEncoder: Encoder[Map[Int, Long]] =
    ExpressionEncoder[Map[Int, Long]]()
  override def outputEncoder: Encoder[Seq[(Int, Long)]] =
    ExpressionEncoder[Seq[(Int, Long)]]()
}
