package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.DatasetBridge
import org.apache.spark.sql.types.{IntegerType, LongType, TimestampNTZType, TimestampType}

/** As-of (temporal lookup) join: for every left row, the single right row
  * with the same key and the greatest right-time <= left-time, or nulls.
  *
  * Spark has no built-in operator for this; the composable encodings (a
  * window over a union, or a range join + arg-max) either shuffle the
  * union of both inputs twice or explode intermediate matches. This is the
  * full custom-operator path — LogicalPlan node + Strategy + SparkPlan
  * (SURVEY §7, extension path (c)):
  *
  *   - EnsureRequirements co-partitions both sides on the key
  *     (`ClusteredDistribution`) and sorts them (key, time) — the same
  *     machinery sort-merge join uses, so AQE still re-plans shuffles;
  *   - the exec is a single streaming merge per partition: O(|L|+|R|),
  *     state = one buffered right row; at 100 TB this is one shuffle of
  *     each side and no per-key windows.
  *
  * Keys must be integral columns, times timestamp-or-long columns. NULL
  * keys or times never match (SQL ASOF semantics): a left row with a null
  * key/time emits null-extended output, a right row with a null key/time
  * is never a candidate. The right side should be unique per (key, time)
  * for deterministic output (pre-aggregate otherwise); `strict = true`
  * makes the exec detect violations and fail loudly instead of silently
  * picking a sort-order-dependent row.
  */
final case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: String, rightKey: String,
    leftTime: String, rightTime: String,
    strict: Boolean = false) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  // Declare the key/time columns as referenced — ColumnPruning would
  // otherwise strip them from the children (it only sees expressions, and
  // this node stores column names).
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      left.output.filter(a => a.name == leftKey || a.name == leftTime) ++
        right.output.filter(a => a.name == rightKey || a.name == rightTime))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, strict) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, strict) :: Nil
    case _ => Nil
  }
}

final case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: String, rightKey: String,
    leftTime: String, rightTime: String,
    strict: Boolean = false) extends BinaryExecNode {

  private def attrOf(side: SparkPlan, name: String): Attribute =
    side.output.find(_.name == name).getOrElse(
      sys.error(s"as-of join: column $name not in ${side.output.map(_.name)}"))

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] = Seq(
    ClusteredDistribution(Seq(attrOf(left, leftKey))),
    ClusteredDistribution(Seq(attrOf(right, rightKey))))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(attrOf(left, leftKey), org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(attrOf(left, leftTime), org.apache.spark.sql.catalyst.expressions.Ascending)),
    Seq(SortOrder(attrOf(right, rightKey), org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(attrOf(right, rightTime), org.apache.spark.sql.catalyst.expressions.Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  private def colIdx(side: SparkPlan, name: String): Int =
    side.output.indexWhere(_.exprId == attrOf(side, name).exprId)

  private def longGetter(side: SparkPlan, name: String): (InternalRow => Long) = {
    val attr = attrOf(side, name)
    val idx = colIdx(side, name)
    attr.dataType match {
      case LongType | TimestampType | TimestampNTZType => row => row.getLong(idx)
      case IntegerType              => row => row.getInt(idx).toLong
      case other => sys.error(s"as-of join: unsupported column type $other for $name")
    }
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val lKey = longGetter(left, leftKey)
    val lTime = longGetter(left, leftTime)
    val rKey = longGetter(right, rightKey)
    val rTime = longGetter(right, rightTime)
    val lkIdx = colIdx(left, leftKey)
    val ltIdx = colIdx(left, leftTime)
    val rkIdx = colIdx(right, rightKey)
    val rtIdx = colIdx(right, rightTime)
    val nRight = right.output.size
    val outAttrs = output
    val failOnDup = strict

    left.execute().zipPartitions(right.execute()) { (lit, rit) =>
      val r = rit.buffered
      val nullRight = new GenericInternalRow(nRight)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(outAttrs.map(_.dataType).toArray)
      var cand: InternalRow = null
      var candKey = 0L
      var candTime = 0L
      lit.map { lrow =>
        if (lrow.isNullAt(lkIdx) || lrow.isNullAt(ltIdx)) {
          // null key/time never matches: emit null-extended, don't advance
          proj(joined(lrow, nullRight))
        } else {
          val lk = lKey(lrow)
          val lt = lTime(lrow)
          var scanning = true
          while (scanning && r.hasNext) {
            if (r.head.isNullAt(rkIdx) || r.head.isNullAt(rtIdx)) {
              r.next() // null right key/time is never a candidate
            } else {
              val hk = rKey(r.head)
              if (hk < lk || (hk == lk && rTime(r.head) <= lt)) {
                val row = r.next()
                if (rKey(row) == lk) {
                  val rt = rTime(row)
                  if (failOnDup && cand != null && candKey == lk && candTime == rt)
                    sys.error(s"as-of join: right side not unique per (key, time): " +
                      s"key=$lk time=$rt — pre-aggregate the right side")
                  cand = row.copy(); candKey = lk; candTime = rt
                }
              } else scanning = false
            }
          }
          val matched = cand != null && candKey == lk
          proj(joined(lrow, if (matched) cand else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Public API. */
object AsOf {
  def join(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      strict: Boolean = false): DataFrame = {
    val spark: SparkSession = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    DatasetBridge.ofRows(spark, AsOfJoinPlan(
      left.queryExecution.logical, right.queryExecution.logical,
      leftKey, rightKey, leftTime, rightTime, strict))
  }
}
