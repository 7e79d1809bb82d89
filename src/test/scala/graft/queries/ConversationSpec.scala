package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestBase, Tables}

/** Laws for the conversation-assembly family (q350–q352): a planted
  * two-conversation fixture with a hand trace, plus the accounting
  * identities that tie the gate, the examples, and the templates to
  * the same turn projection on real testdata.
  */
class ConversationSpec extends AnyFunSuite with SparkTestBase {

  private def ts(hours: Double) =
    new Timestamp(1700000000000L + (hours * 3600 * 1000).toLong)

  /** One user: turns at 0h/1h/2h form conversation 1 (gaps < 8h), a
    * turn at 20h opens conversation 2. Conv 1's roles run a>a>b (one
    * alternation break); token lengths 100+200+50. */
  private lazy val planted: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, 1L, ts(0.0), "a", 0.0, """{"k": 100}"""),
      (1L, 2L, ts(1.0), "a", 0.0, """{"k": 200}"""),
      (1L, 3L, ts(2.0), "b", 0.0, """{"k": 50}"""),
      (1L, 4L, ts(20.0), "a", 0.0, """{"k": 10}"""))
      .toDF("user_id", "event_id", "ts", "event_type", "value", "props")
  }

  test("planted chat gate: gap splits conversations; breaks, lengths and " +
    "the keep verdict match the hand trace") {
    val got = Conversation.chatGate(planted).orderBy("conv_id")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getBoolean(7))).toSeq
    assert(got == Seq(
      // conv 1: 3 turns over 2h, 2 roles, 350 tokens, 1 break (a>a);
      // keep fails on breaks*4 <= n_turns (4 > 3)
      (1L, 3L, 7200L * 1000000L, 2L, 350L, 1L, false),
      // conv 2: single turn — keep fails on n_turns >= 2
      (2L, 1L, 0L, 1L, 10L, 0L, false)))
  }

  test("planted sft examples: trailing context fits the 256-token budget") {
    val got = Conversation.sftExamples(planted).orderBy("event_id")
      .select("event_id", "prior_tokens", "n_ctx_turns", "ctx_tokens")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == Seq(
      (1L, 0L, 0L, 0L),     // opening turn: no context
      (2L, 100L, 1L, 100L), // turn 1 (100 tok) fits
      // prior = 300; turn 1 would need 300 trailing tokens > 256, so
      // only turn 2 (200 tok) survives truncation
      (3L, 300L, 1L, 200L),
      (4L, 0L, 0L, 0L)))    // new conversation: context resets
  }

  test("planted templates: the duplicate rollup needs >= 2 conversations") {
    // the two planted conversations have different paths — empty report
    assert(Conversation.convTemplates(planted).count() == 0)
    // duplicating the single-turn conversation across two users dedups
    import spark.implicits._
    val dup = planted.unionByName(Seq(
      (2L, 5L, ts(0.0), "a", 0.0, """{"k": 10}"""))
      .toDF("user_id", "event_id", "ts", "event_type", "value", "props"))
    val got = Conversation.convTemplates(dup).collect()
    assert(got.length == 1)
    assert((got.head.getString(0), got.head.getLong(1),
      got.head.getLong(2)) == ("a", 2L, 2L))
  }

  test("accounting identities on testdata: gate, examples and templates " +
    "agree on the same turn projection") {
    val ev = Tables.load(spark, sfDir, "events")
    val gate = Conversation.chatGate(ev)
    val ex = Conversation.sftExamples(ev)
    // one example per turn
    assert(ex.count() == gate.agg(sum("n_turns")).head().getLong(0))
    // the last example's prior_tokens + its target length = total_len
    val lastPrior = ex.groupBy("user_id", "conv_id")
      .agg(max("prior_tokens").as("mp"), count(lit(1)).as("n"))
    val joined = gate.join(lastPrior, Seq("user_id", "conv_id"))
    assert(joined.filter(col("n") =!= col("n_turns")).count() == 0)
    assert(joined.filter(col("mp") > col("total_len")).count() == 0)
    // context never exceeds the budget or the available history
    assert(ex.filter(col("ctx_tokens") > 256L ||
      col("ctx_tokens") > col("prior_tokens") ||
      col("n_ctx_turns") < 0).count() == 0)
    // duplicated templates cover at most every conversation
    val tmplMass = Conversation.convTemplates(ev)
      .agg(coalesce(sum("n_convs"), lit(0L))).head().getLong(0)
    assert(tmplMass <= gate.count() && tmplMass >= 2)
  }

  test("planted scrub: per-turn spans are found, boundary-split spans " +
    "are not (the per-message contract); all three verdicts reachable") {
    import spark.implicits._
    // Users 1..6 share an identical clean 2-turn conversation — their
    // (role, content) cells name 6 >= 5 distinct users, so every turn
    // clears the k-anonymity floor: verdict 'keep'. Event ids avoid
    // % 20 == 0, so no PII is planted on them.
    val common = (1L to 6L).flatMap { u =>
      Seq((u, u * 100 + 1, ts(0.0), "a", 0.0, """{"m": "hi"}"""),
        (u, u * 100 + 2, ts(0.1), "b", 0.0, """{"m": "yo"}"""))
    }
    // User 7: same shape but one UNIQUE turn payload — its cell names
    // one user, below the floor: verdict 'redact' with zero PII spans.
    val rare = Seq(
      (7L, 701L, ts(0.0), "a", 0.0, """{"m": "hi"}"""),
      (7L, 702L, ts(0.1), "b", 0.0, """{"m": "my one-off secret"}"""))
    // User 8: a 2-turn thread where one turn carries a planted contact
    // line (event_id % 20 == 0) — 1 of 2 turns has PII, 4 > 2: 'drop'.
    val pii = Seq(
      (8L, 800L, ts(0.0), "a", 0.0, """{"m": "hi"}"""),
      (8L, 801L, ts(0.1), "b", 0.0, """{"m": "yo"}"""))
    // User 9: an email SPLIT ACROSS the turn boundary — neither turn
    // alone matches the span rule, so the scrub must count ZERO spans:
    // a turn is one message and spans never cross messages.
    val split = Seq(
      (9L, 901L, ts(0.0), "a", 0.0, "reach me at alice@exam"),
      (9L, 902L, ts(0.1), "b", 0.0, "ple.com any time"))
    val got = Conversation.convScrub(
      (common ++ rare ++ pii ++ split)
        .toDF("user_id", "event_id", "ts", "event_type", "value", "props"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getString(6))).toMap
    (1L to 6L).foreach { u =>
      assert(got(u) == (2L, 0L, 0L, 0L, "keep"), s"user $u: ${got(u)}") }
    assert(got(7L) == (2L, 0L, 0L, 1L, "redact"), got(7L))
    val (n8, p8, s8, _, v8) = got(8L)
    assert(n8 == 2L && p8 == 1L && s8 == 1L && v8 == "drop", got(8L))
    // the boundary-split span: zero detected spans; the verdict is
    // 'redact' only because the unique fragments are below the k floor
    val (_, p9, s9, r9, v9) = got(9L)
    assert(p9 == 0L && s9 == 0L, s"cross-turn span must not count: ${got(9L)}")
    assert(r9 == 2L && v9 == "redact", got(9L))
  }

  test("scrub accounting on testdata: spans bound turns, verdict " +
    "precedence is total, planted rate matches the % 20 rule") {
    val ev = Tables.load(spark, sfDir, "events")
    val got = Conversation.convScrub(ev).collect()
    assert(got.nonEmpty)
    var (nDrop, nRedact) = (0L, 0L)
    got.foreach { r =>
      val (n, np, spans, rare, v) = (r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getString(6))
      assert(np <= n && np <= spans && rare <= n)
      val want = if (np * 4 > n) "drop"
        else if (np > 0 || rare > 0) "redact" else "keep"
      assert(v == want)
      if (v == "drop") nDrop += 1
      if (v == "redact") nRedact += 1
    }
    assert(nDrop > 0 && nRedact > 0, s"drop=$nDrop redact=$nRedact")
    // every planted span is found: total spans == events with
    // event_id % 20 == 0 and a non-null ts (the turn universe)
    val plantedSpans = ev.filter(col("ts").isNotNull &&
      col("event_id") % 20 === 0).count()
    assert(got.map(_.getLong(4)).sum == plantedSpans)
  }

  test("planted loop detect: runs, the longest-run role, and both flags " +
      "match the hand trace") {
    import spark.implicits._
    // one episode: a a a b error error error error b  ->  runs
    // [a:3][b:1][error:4][b:1]; a second episode with no loop: a b a
    val ev = Seq(
      (9L, 1L, ts(0.0), "a"), (9L, 2L, ts(0.1), "a"), (9L, 3L, ts(0.2), "a"),
      (9L, 4L, ts(0.3), "b"), (9L, 5L, ts(0.4), "error"),
      (9L, 6L, ts(0.5), "error"), (9L, 7L, ts(0.6), "error"),
      (9L, 8L, ts(0.7), "error"), (9L, 9L, ts(0.8), "b"),
      (9L, 10L, ts(20.0), "a"), (9L, 11L, ts(20.1), "b"),
      (9L, 12L, ts(20.2), "a"))
      .map { case (u, e, t, ty) => (u, e, t, ty, 0.0, "{}") }
      .toDF("user_id", "event_id", "ts", "event_type", "value", "props")
    val got = Conversation.loopDetect(ev).orderBy("conv_id").collect()
      .map(r => (r.getAs[Long]("conv_id"), r.getAs[Long]("n_turns"),
        r.getAs[Long]("n_runs"), r.getAs[Long]("max_run"),
        r.getAs[String]("max_run_type"), r.getAs[Long]("n_error_loops"),
        r.getAs[Boolean]("has_loop")))
    assert(got.toSeq == Seq(
      (1L, 9L, 4L, 4L, "error", 1L, true),
      (2L, 3L, 3L, 1L, "a", 0L, false)))
    // testdata carries real loops (the q374 fixture signal check)
    val real = q374OnTestdata
    assert(real.exists(_.getAs[Boolean]("has_loop")))
    assert(real.exists(_.getAs[Long]("n_error_loops") > 0))
    assert(real.forall(r => r.getAs[Long]("n_runs") <= r.getAs[Long]("n_turns")))
  }

  private lazy val q374OnTestdata =
    Conversation.loopDetect(Tables.load(spark, sfDir, "events")).collect()

  test("planted loss mask: spans are contiguous and flags follow the role") {
    val got = Conversation.lossMask(planted, trainableRole = "b")
      .orderBy("conv_id", "event_id").collect()
      .map(r => (r.getAs[Long]("conv_id"), r.getAs[Long]("event_id"),
        r.getAs[Long]("start_tok"), r.getAs[Long]("end_tok"),
        r.getAs[Boolean]("trainable")))
    assert(got.toSeq == Seq(
      (1L, 1L, 0L, 100L, false),
      (1L, 2L, 100L, 300L, false),
      (1L, 3L, 300L, 350L, true),
      (2L, 4L, 0L, 10L, false)))
  }

  test("loss mask on testdata: per-conversation spans are gap-free and " +
      "total to the gate's token sum") {
    val ev = Tables.load(spark, sfDir, "events")
    val rows = Conversation.lossMask(ev).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("conv_id"),
        r.getAs[Long]("event_id"), r.getAs[Long]("start_tok"),
        r.getAs[Long]("end_tok")))
      .groupBy(t => (t._1, t._2))
    rows.foreach { case (_, turns) =>
      val s = turns.sortBy(t => t._4)
      assert(s.head._4 == 0L)
      s.sliding(2).foreach {
        case Array(a, b) => assert(a._5 == b._4, s"gap after ${a._3}")
        case _ =>
      }
    }
    // end of the last span == the q350 gate's total_len (0 when null)
    val gate = Conversation.chatGate(ev).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("conv_id")) ->
        Option(r.getAs[Any]("total_len")).map(_.asInstanceOf[Long])
          .getOrElse(0L)).toMap
    rows.foreach { case (k, turns) =>
      assert(turns.map(_._5).max == gate(k), s"conv $k total mismatch")
    }
  }
}
