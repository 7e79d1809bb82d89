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
}
