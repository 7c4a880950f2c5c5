package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Token-bigram generator — one input row → many output rows — as a
  * native Catalyst [[Generator]] (SURVEY §2 U3's stretch tier): the
  * planner places it in `GenerateExec` exactly like the built-in
  * `explode`, so the expansion runs inside the scan stage with no typed
  * encoder round-trip (the honest cost of the `flatMap` form it
  * mirrors, `MapReduceOps.bigramCounts`). Registered in SQL as
  * `bigrams(text)` via [[graft.GraftExtensions]] for
  * `LATERAL VIEW bigrams(text)` use.
  *
  * Reference grounding: a mapper may emit many KV pairs per record
  * (`/root/reference/mp/worker.go:14`); tokenization matches
  * `TextOps.tokens` (lowercase, whitespace-run split, drop empties).
  */
case class Bigrams(child: Expression)
  extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType =
    new StructType().add("bigram", StringType, nullable = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bigrams requires a string argument, got ${child.dataType}")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      // Locale.ROOT: the default-locale overload is a correctness trap
      // (tr_TR lowercases I → ı, silently changing tokens)
      val toks = v.asInstanceOf[UTF8String].toString
        .toLowerCase(java.util.Locale.ROOT)
        .split(graft.operators.TextOps.WsRun).filter(_.nonEmpty)
      if (toks.length < 2) Iterator.empty
      else (0 until toks.length - 1).iterator.map(i =>
        InternalRow(UTF8String.fromString(toks(i) + " " + toks(i + 1))))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Bigrams =
    copy(child = newChild)
}

object Bigrams {
  /** Column form (use in `select` like `explode`). */
  def bigrams(c: Column): Column =
    ColumnShim.column(Bigrams(ColumnShim.expression(c)))
}
