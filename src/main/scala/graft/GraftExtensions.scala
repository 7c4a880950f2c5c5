package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{Bigrams, DotF64, Fnv32a, SqDistF64}

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
  /** Analysis-time arity error, not a raw NoSuchElementException on
    * `SELECT fnv32a()` (extra args were silently dropped before). */
  private def unary(name: String, build: Expression => Expression) =
    (new FunctionIdentifier(name),
      new ExpressionInfo(build(org.apache.spark.sql.catalyst.expressions.Literal(null)).getClass.getName, name),
      (children: Seq[Expression]) =>
        if (children.length == 1) build(children.head)
        else throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> s"`$name`",
            "expectedNum" -> "1",
            "actualNum" -> children.length.toString,
            "docroot" -> "https://spark.apache.org/docs/latest")))

  private def binary(name: String, build: (Expression, Expression) => Expression) = {
    val nul = org.apache.spark.sql.catalyst.expressions.Literal(null)
    (new FunctionIdentifier(name),
      new ExpressionInfo(build(nul, nul).getClass.getName, name),
      (children: Seq[Expression]) =>
        if (children.length == 2) build(children(0), children(1))
        else throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> s"`$name`",
            "expectedNum" -> "2",
            "actualNum" -> children.length.toString,
            "docroot" -> "https://spark.apache.org/docs/latest")))
  }

  private val descriptors = Seq(
    unary("fnv32a", Fnv32a(_)),
    unary("bigrams", Bigrams(_)),
    binary("dot_f64", DotF64(_, _)),
    binary("sqdist_f64", SqDistF64(_, _)))

  /** Register on an already-built session (tests, notebooks). */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { d =>
      spark.sessionState.functionRegistry.registerFunction(d._1, d._2, d._3)
    }
}
