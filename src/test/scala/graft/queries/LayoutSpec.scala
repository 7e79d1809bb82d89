package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestBase}

/** Layout family (q153/q154) + the index/ER additions (q155/q156):
  * the laws the hash oracle can't see — that z-order actually BUYS
  * multi-key pruning, that the compaction plan respects packing
  * invariants, that delta-encoded postings decode to the true sorted
  * head, and that blocked fuzzy ER finds a planted typo.
  */
class LayoutSpec extends AnyFunSuite with SparkTestBase {

  test("q153: z-order prunes the second key, linear cannot") {
    val r = SparkEntry.queries("q153_zorder_layout")(spark, sfDir).collect()
      .map(x => x.getString(0) -> (x.getDouble(2), x.getDouble(3))).toMap
    val (linPart, linSupp) = r("linear")
    val (zPart, zSupp) = r("zorder")
    // linear: near-perfect partkey locality, zero suppkey pruning
    assert(linPart < 0.1 && linSupp > 0.99)
    // z-order: BOTH keys prune — bounded rectangles, not stripes
    assert(zSupp < 0.5 * linSupp, s"zorder supp span $zSupp vs linear $linSupp")
    assert(zPart < 0.5, s"zorder part span $zPart not bounded")
  }

  test("q154: bins are contiguous in manifest order and respect the target") {
    val plan = SparkEntry.queries("q154_compaction_plan")(spark, sfDir)
      .orderBy("source", "lang").collect()
    val bins = plan.map(_.getLong(4))
    // monotone non-decreasing: Next-Fit never reopens a shelf
    assert(bins.zip(bins.tail).forall { case (a, b) => a <= b })
    // a bin holding >1 file STARTED under the target (files can straddle,
    // but a second file only lands in a bin whose prefix was < target)
    val byBin = plan.groupBy(_.getLong(4))
    byBin.foreach { case (_, files) =>
      if (files.length > 1) {
        val sizes = files.map(_.getLong(3))
        // all but the last file fit within one target width of the start
        assert(sizes.init.sum < 32768L,
          s"bin packs ${sizes.mkString(",")} beyond one target width")
      }
    }
  }

  test("q155: delta-encoded heads decode to the true 20 smallest postings") {
    val got = SparkEntry.queries("q155_inverted_index")(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getString(3)).toMap
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val truth = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy("token").agg(collect_set(col("doc_id")).as("ids"))
      .collect().map(r => r.getString(0) ->
        r.getSeq[Long](1).sorted.take(20)).toMap
    assert(got.keySet == truth.keySet)
    got.foreach { case (tok, csv) =>
      val decoded = csv.split(",").map(_.toLong)
        .scanLeft(0L)(_ + _).drop(1).toSeq // undo delta encoding
      assert(decoded == truth(tok), s"postings for '$tok' decode wrong")
      assert(decoded == decoded.sorted, s"postings for '$tok' not ascending")
    }
  }

  test("q156: blocked ER finds a planted one-edit typo and nothing cross-block") {
    import spark.implicits._
    val part = graft.Tables.load(spark, sfDir, "part")
    // plant a typo'd clone of part 0 under a fresh key: same brand/size/
    // noun (same block), name one substitution away
    val row0 = part.filter(col("p_partkey") === 0).head()
    val name0 = row0.getString(part.columns.indexOf("p_name"))
    val typo = name0.updated(0, if (name0(0) == 'x') 'y' else 'x')
    val extra = part.filter(col("p_partkey") === 0)
      .withColumn("p_partkey", lit(900000L))
      .withColumn("p_name", lit(typo))
    val p = part.unionByName(extra)
    val pairs = p.select(col("p_partkey").as("part_a"), col("p_name").as("name_a"),
        element_at(split(col("p_name"), " "), 2).as("noun"), col("p_brand"), col("p_size"))
      .join(p.select(col("p_partkey").as("part_b"), col("p_name").as("name_b"),
        element_at(split(col("p_name"), " "), 2).as("noun"), col("p_brand"), col("p_size")),
        Seq("noun", "p_brand", "p_size"))
      .filter(col("part_a") < col("part_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= 3)
    assert(pairs.filter(col("part_a") === 0 && col("part_b") === 900000L).count() == 1)
    // block soundness: every reported pair shares the full blocking key
    val bad = pairs.join(p.select(col("p_partkey").as("part_a"),
        col("p_brand").as("ba"), col("p_size").as("sa")), "part_a")
      .join(p.select(col("p_partkey").as("part_b"),
        col("p_brand").as("bb"), col("p_size").as("sb")), "part_b")
      .filter(col("ba") =!= col("bb") || col("sa") =!= col("sb"))
    assert(bad.count() == 0)
  }

  test("q168: skew report quantiles are ordered and the top key is the max") {
    val r = SparkEntry.queries("q168_skew_report")(spark, sfDir).collect()
    assert(r.length == 3)
    r.foreach { row =>
      val (nKeys, nRows) = (row.getLong(1), row.getLong(2))
      val (p50, p99, mx) = (row.getLong(3), row.getLong(4), row.getLong(5))
      assert(p50 <= p99 && p99 <= mx, s"quantiles out of order in $row")
      // imbalance = max/avg >= 1 by definition
      assert(row.getDouble(6) >= 1.0)
      assert(row.getDouble(6) == mx.toDouble * nKeys / nRows)
      // the first reported heavy key carries exactly max_c rows
      val firstCnt = row.getString(7).split(",")(0).split(":")(1).toLong
      assert(firstCnt == mx)
    }
  }

  test("q182: zone maps are sound everywhere and prune only the clustered key") {
    val r = SparkEntry.queries("q182_zonemap_pruning")(spark, sfDir).collect()
      .map(x => x.getInt(0) -> x).toMap
    // soundness: NO matching row ever sits in a skipped file, either pred
    r.values.foreach { row =>
      assert(row.getAs[Long]("rows_missed") == 0L,
        s"pred ${row.getInt(0)} missed ${row.getAs[Long]("rows_missed")} rows")
      // file accounting closes
      assert(row.getAs[Long]("n_scanned") + row.getAs[Long]("n_skipped") ==
        row.getAs[Long]("n_files"))
      assert(row.getAs[Long]("false_pos_files") >= 0L)
    }
    // effectiveness gap: the ingest-correlated key prunes most files, the
    // uncorrelated key prunes (almost) none
    assert(r(1).getAs[Double]("prune_ratio") > 0.5,
      s"clustered pred prune ${r(1).getAs[Double]("prune_ratio")}")
    assert(r(2).getAs[Double]("prune_ratio") < 0.2,
      s"uncorrelated pred prune ${r(2).getAs[Double]("prune_ratio")}")
  }

  test("q183: encoding stats recount and the advisor picks the obvious choices") {
    val out = SparkEntry.queries("q183_encoding_advisor")(spark, sfDir).cache()
    // structural bounds: runs and ndv never exceed rows; deltas nonneg
    assert(out.filter(col("n_runs") > col("n_rows") ||
      col("ndv") > col("n_rows") || col("max_abs_delta") < 0).count() == 0)
    // l_orderkey is the clustering key: sorted within file, so deltas are
    // bounded by the (sparse) key gaps — delta-codable, never 'plain'
    val ok = out.filter(col("column_name") === "l_orderkey")
    assert(ok.filter(col("max_abs_delta") > 100).count() == 0)
    assert(ok.filter(col("advice") === "plain").count() == 0)
    // l_quantity has 50 distinct values per file: dict or rle territory,
    // and its ndv law holds exactly
    val q = out.filter(col("column_name") === "l_quantity")
    assert(q.filter(col("ndv") > 50).count() == 0)
    // the advisor's rule is a function of the reported stats (recheck)
    out.collect().foreach { row =>
      val (runs, rows, delta, ndv) = (row.getAs[Long]("n_runs"),
        row.getAs[Long]("n_rows"), row.getAs[Long]("max_abs_delta"),
        row.getAs[Long]("ndv"))
      val want = if (runs * 4 <= rows) "rle"
        else if (delta <= 65535L) "delta"
        else if (ndv * 16 <= rows) "dict" else "plain"
      assert(row.getAs[String]("advice") == want)
    }
  }

  test("q356: planted quartiles — distinct lengths split one per bucket, " +
    "zero intra-bucket padding") {
    import spark.implicits._
    val docs = Seq((1L, "a"), (2L, "a b"), (3L, "a b c"), (4L, "a b c d"))
      .toDF("doc_id", "text")
    val got = Layout.lengthBuckets(docs).orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == Seq(
      (0L, 1L, 1L, 1L, 1L, 0L), (1L, 1L, 2L, 2L, 2L, 0L),
      (2L, 1L, 3L, 3L, 3L, 0L), (3L, 1L, 4L, 4L, 4L, 0L)))
  }

  test("q356 on testdata: buckets partition the corpus into ascending " +
    "non-overlapping ranges; waste is the padding identity") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val b = Layout.lengthBuckets(docs).orderBy("bucket").collect()
    assert(b.map(_.getLong(1)).sum == docs.count())
    b.sliding(2).foreach { case Array(x, y) =>
      assert(x.getLong(3) < y.getLong(2)) // hi(bucket) < lo(bucket+1)
    case _ => ()
    }
    b.foreach { r =>
      assert(r.getLong(5) == r.getLong(1) * r.getLong(3) - r.getLong(4))
      assert(r.getLong(5) >= 0)
    }
  }

  test("q357: needle positions are in-range and monotone in depth; " +
    "three rows per eligible document") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val p = SparkEntry.queries("q357_needle_plan")(spark, sfDir)
    val eligible = docs
      .filter(size(split(col("text"), " ")) >= 32).count()
    assert(p.count() == 3 * eligible && eligible > 0)
    p.collect().foreach { r =>
      val (n, pos) = (r.getLong(1), r.getLong(3))
      assert(pos >= 0 && pos <= n - 1)
    }
    val bad = p.groupBy("doc_id")
      .agg(min(when(col("depth") === 90, col("needle_pos"))).as("p90"),
        min(when(col("depth") === 10, col("needle_pos"))).as("p10"))
      .filter(col("p90") < col("p10")).count()
    assert(bad == 0)
  }

  test("q358: repeat factors are capped, the heaviest bucket stays at 1, " +
    "effective mass is the product identity") {
    val got = SparkEntry.queries("q358_length_upsample")(spark, sfDir).collect()
    assert(got.nonEmpty)
    val maxTokens = got.map(_.getLong(2)).max
    got.foreach { r =>
      val (tokens, rep, eff) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(rep >= 1 && rep <= 8)
      assert(eff == tokens * rep)
      if (tokens == maxTokens) assert(rep == 1L)
      // leveling never overshoots except by the ceil remainder or cap
      assert(rep == 8L || (rep - 1) * tokens < maxTokens)
    }
  }
}
