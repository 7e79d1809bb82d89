package graft

import org.apache.spark.sql.{Column, Dataset}

/** Terminal ordering for BOUNDED report frames (r16, guide §2.4 "remove
  * shuffles outright").
  *
  * Almost every query ends in a total ordering so the oracle's
  * row-by-row compare is deterministic. `orderBy` plans that ordering as
  * an `Exchange rangepartitioning`, which costs THREE things the result
  * does not need when the frame is a bounded report (a grouped/topped
  * summary whose row count is domain-bounded — event types, sources,
  * sweep cells, hour buckets — not corpus-sized): a separate SAMPLING
  * job over the exchange child to pick range bounds, a SECOND execution
  * of that child by the shuffle write itself (the sampling pass and the
  * write pass each run the final aggregation), and a 32-way sorted
  * shuffle whose partitions then carry a handful of rows each.
  *
  * For such frames `repartition(1).sortWithinPartitions(keys)` computes
  * the identical rows in the identical order — the sort keys of every
  * gated query are total (the row-by-row oracle compare would fail
  * otherwise), and a single-partition sort by a total key is one
  * deterministic order — with ONE single-partition exchange, no sampling
  * pass, and the child executed once. The upstream plan keeps its full
  * parallelism (the repartition is a shuffle boundary); only the final
  * sort of the already-aggregated report runs single-task, which is the
  * right plan at ANY scale for output that fits in one task by
  * construction. Corpus-sized outputs (per-document listings and the
  * like) must NOT use this — they keep `orderBy`, whose range shuffle is
  * the honest distributed sort.
  *
  * CONTRACT: the caller asserts the frame is a bounded report — row
  * count independent of corpus size (value-domain/group-domain bounded,
  * or explicitly capped). The r16 vetting used the sf0.001 -> sf0.01
  * output-row ratio (flat = bounded) plus a per-family domain argument.
  */
object Report {
  implicit final class ReportSortOps[T](private val ds: Dataset[T]) extends AnyVal {

    /** `orderBy(key, keys*)` for a bounded report: identical rows and
      * order, one single-partition exchange, no sampling job. */
    def reportSorted(key: String, keys: String*): Dataset[T] =
      ds.repartition(1).sortWithinPartitions(key, keys: _*)

    /** `orderBy(keys*)` for a bounded report (Column form). */
    def reportSorted(keys: Column*): Dataset[T] =
      ds.repartition(1).sortWithinPartitions(keys: _*)
  }
}
