package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.Fnv32a

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
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.fnv32aDescriptor)
  }
}

object GraftExtensions {
  private val fnv32aDescriptor =
    (new FunctionIdentifier("fnv32a"),
      new ExpressionInfo(classOf[Fnv32a].getName, "fnv32a"),
      (children: Seq[Expression]) =>
        // analysis-time arity error, not a raw NoSuchElementException on
        // `SELECT fnv32a()` (extra args were silently dropped before)
        if (children.length == 1) Fnv32a(children.head)
        else throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> "`fnv32a`",
            "expectedNum" -> "1",
            "actualNum" -> children.length.toString,
            "docroot" -> "https://spark.apache.org/docs/latest")))

  /** Register on an already-built session (tests, notebooks). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      fnv32aDescriptor._1, fnv32aDescriptor._2, fnv32aDescriptor._3)
}
