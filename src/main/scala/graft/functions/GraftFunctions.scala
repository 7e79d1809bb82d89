package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration for the native expressions, so `spark.sql` users can
  * call them directly:
  *
  * {{{
  *   SELECT graft_minhash_sig(graft_shingles(split(text, ' '), 3), 32) ...
  * }}}
  *
  * Two paths: [[GraftFunctions.register]] for an existing session, or
  * `.withExtensions(new GraftExtensions)` /
  * `spark.sql.extensions=graft.functions.GraftExtensions` at session build.
  */
object GraftFunctions {

  private def intArg(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => sys.error(s"$what must be an integer literal, got $other")
  }

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> (es => ArrayLongDot(es(0), es(1))),
    "graft_minhash_sig" -> (es => MinHashSig(es(0), intArg(es(1), "k"))),
    "graft_simhash64" -> (es => SimHash64(es(0))),
    "graft_shingles" -> (es => Shingles(es(0), intArg(es(1), "n"))),
    "graft_fingerprint" -> (es => PolyFingerprint(es(0))),
    "graft_hyperplane_bands" -> (es =>
      HyperplaneBands(es(0), intArg(es(1), "bands"), intArg(es(2), "bits"))),
    "graft_top_token_count" -> (es => TopTokenCount(es(0))),
    "graft_window_hashes" -> (es => WindowHashes(es(0), intArg(es(1), "w"))),
    "graft_subword_tokens" -> (es => SubwordTokens(es(0), SubwordVocab.Default)))

  /** Register on a live session (temp functions). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}

/** Injector for `SparkSession.builder().withExtensions(...)` or the
  * `spark.sql.extensions` conf. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        (es: Seq[Expression]) => builder(es)))
    }
}
