package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The law behind q275's winnow-blocked plan: on this corpus the
  * winnowing-fingerprint blocker reaches EVERY exact-Jaccard pair at
  * theta >= 0.4, so jaccardJoinWinnowBlocked (blocker + exact verify)
  * equals jaccardJoin (prefix-filtered, provably complete) row for row.
  * q306 drives the same pair-completeness statistic (= 1.0 at theta
  * 0.7) through the driver's oracle gate every round; tools.WinnowProbe
  * measured completeness 1.0 at theta 0.4 on sf0.001/sf0.01/sf0.1.
  * This spec pins the strongest local form — full plan equality
  * including the jaccard values — plus the documented theta floor.
  */
class WinnowBlockSpec extends AnyFunSuite with SparkTestBase {

  test("winnow-blocked join equals the prefix-filtered exact join at theta 0.4") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val want = Dedup.jaccardJoin(docs, 0.4)
    val got = Dedup.jaccardJoinWinnowBlocked(docs, 0.4)
    assert(want.count() > 0, "fixture must plant theta>=0.4 pairs")
    assertSameRows(got, want)
  }

  test("winnow-blocked multiset join equals the PPJoin multiset join at theta 0.5") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val want = Dedup.multisetJaccardJoin(docs, 0.5)
    val got = Dedup.multisetJaccardJoinWinnowBlocked(docs, 0.5)
    assert(want.count() > 0, "fixture must plant theta>=0.5 multiset pairs")
    assertSameRows(got, want)
  }

  test("winnow-blocked containment join equals the prefix-filtered join at tau 0.9") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val want = Dedup.containmentJoin(docs, 0.9)
    val got = Dedup.containmentJoinWinnowBlocked(docs, 0.9)
    assert(want.count() > 0, "fixture must plant tau>=0.9 containments")
    assertSameRows(got, want)
  }

  test("the theta floors are enforced: below them callers must use the PPJoin paths") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val e = intercept[IllegalArgumentException] {
      Dedup.jaccardJoinWinnowBlocked(docs, 0.3)
    }
    assert(e.getMessage.contains("theta"))
    val e2 = intercept[IllegalArgumentException] {
      Dedup.multisetJaccardJoinWinnowBlocked(docs, 0.4)
    }
    assert(e2.getMessage.contains("theta"))
    val e3 = intercept[IllegalArgumentException] {
      Dedup.containmentJoinWinnowBlocked(docs, 0.8)
    }
    assert(e3.getMessage.contains("tau"))
  }
}
