package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{Bigrams, DotF64, Fnv32a, PolyFingerprint, SqDistF64, SqDistI64}

/** Spark extension entry point: makes graft's custom expressions
  * available to plain SQL users —
  * `--conf spark.sql.extensions=graft.GraftExtensions` then
  * `SELECT fnv32a(word) FROM ...`.
  *
  * This is the (c)-tier integration path from the build contract
  * (custom Catalyst surface registered via SparkSessionExtensions);
  * graft needs no custom planner rules — every operator is expressible
  * in the declarative API — so only functions are injected.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptors.foreach(ext.injectFunction)
}

object GraftExtensions {
  /** Function descriptor with an analysis-time arity error, not a raw
    * NoSuchElementException on `SELECT fnv32a()` (extra args were
    * silently dropped before). */
  private def fn(name: String, arity: Int, build: Seq[Expression] => Expression) =
    (new FunctionIdentifier(name),
      new ExpressionInfo(
        build(Seq.fill(arity)(org.apache.spark.sql.catalyst.expressions.Literal(null))).getClass.getName,
        name),
      (children: Seq[Expression]) =>
        if (children.length == arity) build(children)
        else throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> s"`$name`",
            "expectedNum" -> arity.toString,
            "actualNum" -> children.length.toString,
            "docroot" -> "https://spark.apache.org/docs/latest")))

  private val descriptors = Seq(
    fn("fnv32a", 1, c => Fnv32a(c.head)),
    fn("bigrams", 1, c => Bigrams(c.head)),
    fn("dot_f64", 2, c => DotF64(c(0), c(1))),
    fn("sqdist_f64", 2, c => SqDistF64(c(0), c(1))),
    fn("sqdist_i64", 2, c => SqDistI64(c(0), c(1))),
    fn("poly_fingerprint", 1, c => PolyFingerprint(c.head)))

  /** Register on an already-built session (tests, notebooks). */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { d =>
      spark.sessionState.functionRegistry.registerFunction(d._1, d._2, d._3)
    }
}
