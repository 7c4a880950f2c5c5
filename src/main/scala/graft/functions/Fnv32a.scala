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

  /** 32-bit avalanche finalizer (Mueller's published
    * `x = ((x >> 16) ^ x) * 0x45d9f3b` double round): FNV-1a's LOW bits
    * are nearly linear in the input (bit 0 is a parity chain), which
    * biases any trailing-zero/bucket statistic built on them — this mix
    * spreads every input bit to every output bit. Multiplier 0x45d9f3b
    * < 2^27 keeps each product < 2^59, so the same arithmetic runs
    * overflow-free on BIGINT in DuckDB (see the q_approx_distinct_det
    * oracle, which replays it verbatim). */
  def mix32(c: Column): Column = {
    import org.apache.spark.sql.functions.{shiftright, lit}
    val m1 = lit(0x45d9f3bL)
    val s1 = shiftright(c, 16).bitwiseXOR(c).multiply(m1) % lit(4294967296L)
    val s2 = shiftright(s1, 16).bitwiseXOR(s1).multiply(m1) % lit(4294967296L)
    shiftright(s2, 16).bitwiseXOR(s2)
  }

  /** Scalar form of the Column [[mix32]] — identical arithmetic on the
    * JVM (inputs are non-negative 32-bit values, so the `% 2^32` there
    * and the mask here agree), for driver-side constants such as
    * term → bucket routing in the postings index. */
  def mix32(h: Long): Long = {
    val m = 0x45d9f3bL
    val s1 = (((h >> 16) ^ h) * m) & 0xFFFFFFFFL
    val s2 = (((s1 >> 16) ^ s1) * m) & 0xFFFFFFFFL
    (s2 >> 16) ^ s2
  }
}
