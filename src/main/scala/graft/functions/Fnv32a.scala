package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** FNV-1a 32-bit hash of a string, as an unsigned value in a Long —
  * bit-parity with the reference's partitioner
  * (`/root/reference/test.go:77-81`: `h ^= c; h *= 16777619` over bytes,
  * offset basis 2166136261).
  *
  * A native Catalyst `Expression` with `doGenCode` (SURVEY §2 U1 stretch):
  * the hash loop is spliced into whole-stage codegen — no UDF call
  * boundary, no boxing, null handling inherited from UnaryExpression.
  */
case class Fnv32a(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"fnv32a requires a string argument, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    Fnv32a.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 2166136261L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = (($h ^ ($bytes[$i] & 0xFFL)) * 16777619L) & 0xFFFFFFFFL;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Fnv32a =
    copy(child = newChild)
}

object Fnv32a {
  def hash(bytes: Array[Byte]): Long = {
    var h = 2166136261L
    var i = 0
    while (i < bytes.length) {
      h = ((h ^ (bytes(i) & 0xFFL)) * 16777619L) & 0xFFFFFFFFL
      i += 1
    }
    h
  }

  /** Column form. */
  def fnv32a(c: Column): Column = ColumnShim.column(Fnv32a(ColumnShim.expression(c)))
}
