package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregator: keeps the k best (score, id) pairs per group,
  * ordered by (score desc, id asc).
  *
  * This is the scale path for top-k ranking: a window `row_number` sorts
  * every candidate row per group (full sort of the scored join output);
  * this aggregator is a partial-aggregable O(k) buffer — each map task
  * pre-reduces its partition to k rows before the shuffle, so the exchange
  * carries k rows per (group, task) instead of every candidate.
  */
final class TopKAgg(k: Int)
    extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {

  private def insert(buf: List[(Double, Long)], x: (Double, Long)): List[(Double, Long)] = {
    // descending score, ascending id; list stays sorted and <= k long
    val (better, rest) = buf.span(b => b._1 > x._1 || (b._1 == x._1 && b._2 < x._2))
    val merged = better ::: (x :: rest)
    if (merged.length > k) merged.take(k) else merged
  }

  override def zero: List[(Double, Long)] = Nil
  override def reduce(buf: List[(Double, Long)], x: (Double, Long)): List[(Double, Long)] =
    if (buf.length == k && x._1 < buf.last._1) buf else insert(buf, x)
  override def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] =
    b.foldLeft(a)(insert)
  override def finish(buf: List[(Double, Long)]): Seq[(Double, Long)] = buf
  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    ExpressionEncoder[List[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}

/** Bounded bottom-k aggregator over EXACT int64 scores: keeps the k
  * smallest (score, id) pairs per group, ordered by (score asc, id asc).
  *
  * The Double-scored [[TopKAgg]] cannot rank exact squared grid
  * distances — 64-dim int64 d2 values reach ~2.6e16, past Double's 2^53
  * exact-integer range, so a Double round-trip can swap neighbors whose
  * distances differ in the low bits. This variant buffers the native
  * int64 score, so the ranking (and the hash-compare against an integer
  * oracle) stays exact. Same scale shape: partial-aggregable O(k) buffer,
  * the exchange carries k rows per (group, task) instead of every
  * candidate.
  *
  * SET semantics: an exact duplicate (score, id) pair is inserted once.
  * Every ranking consumer feeds unique pairs anyway (ids are unique per
  * group), and it makes the buffer a true KMV sketch — the k smallest
  * DISTINCT hashes — so the streaming twin can run it over a raw stream
  * without a cross-batch distinct (Streams.kmvSketches).
  */
final class BottomKLongAgg(k: Int)
    extends Aggregator[(Long, Long), List[(Long, Long)], Seq[(Long, Long)]] {

  private def insert(buf: List[(Long, Long)], x: (Long, Long)): List[(Long, Long)] = {
    // ascending score, ascending id; list stays sorted, distinct, <= k long
    val (better, rest) = buf.span(b => b._1 < x._1 || (b._1 == x._1 && b._2 < x._2))
    if (rest.headOption.contains(x)) return buf
    val merged = better ::: (x :: rest)
    if (merged.length > k) merged.take(k) else merged
  }

  override def zero: List[(Long, Long)] = Nil
  override def reduce(buf: List[(Long, Long)], x: (Long, Long)): List[(Long, Long)] =
    if (buf.length == k && x._1 > buf.last._1) buf else insert(buf, x)
  override def merge(a: List[(Long, Long)], b: List[(Long, Long)]): List[(Long, Long)] =
    b.foldLeft(a)(insert)
  override def finish(buf: List[(Long, Long)]): Seq[(Long, Long)] = buf
  override def bufferEncoder: Encoder[List[(Long, Long)]] =
    ExpressionEncoder[List[(Long, Long)]]()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
}
