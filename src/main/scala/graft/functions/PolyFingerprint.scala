package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial document fingerprints in ONE compiled pass:
  * `full_fp` = fold of `(h·31 + c) mod p` over all character codes,
  * `win_fp`  = MINIMUM of that hash over every 8-char window (a
  * winnowing-style robust fingerprint), via a rolling hash — the
  * outgoing char's contribution is subtracted with the precomputed
  * 31⁷ mod p, then shift + add the incoming char.
  *
  * Bit parity with the per-window fold (and the DuckDB oracle's
  * `list_reduce` mirror) holds because every step is linear mod p and
  * both forms reduce into [0, p). Characters are CODEPOINTS — the
  * semantics of `ascii(substring(t, i, 1))` on both engines — not
  * bytes, so non-ASCII text hashes identically too.
  *
  * Why an Expression and not a higher-order-function pipeline: HOFs
  * (`transform`/`aggregate`/`slice`) are interpreted per element —
  * the round-6 `slice`+`aggregate` form cost ~4-5 s at sf0.1, and a
  * rolling-hash HOF rewrite was no better (per-element struct
  * allocation). This loop is whole-stage-codegen'd Java: O(n) scalar
  * ops per document, no per-element allocation (SURVEY §2 B22;
  * pattern: Fnv32a.scala).
  */
case class PolyFingerprint(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("full_fp", LongType, nullable = false),
    StructField("win_fp", LongType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"poly_fingerprint requires a string argument, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    PolyFingerprint.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      // the hot loop lives in compiled Scala; codegen splices a direct
      // static call (no boxing: UTF8String in, InternalRow out)
      s"${ev.value} = graft.functions.PolyFingerprint$$.MODULE$$.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): PolyFingerprint =
    copy(child = newChild)
}

object PolyFingerprint {
  private val P = 1000000007L
  private val P7 = 512613922L // 31^7 mod P
  private val W = 8           // window width in characters

  def compute(s: UTF8String): InternalRow = {
    val str = s.toString
    var full = 0L
    var win = 0L            // rolling hash of the last ≤ W chars
    var winMin = Long.MaxValue
    var cnt = 0
    val buf = new Array[Long](W) // circular buffer of outgoing codes
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      val c = cp.toLong
      full = (full * 31 + c) % P
      if (cnt < W) win = (win * 31 + c) % P
      else {
        win = (((win - buf(cnt % W) * P7) % P) * 31 + c) % P
        if (win < 0) win += P
      }
      buf(cnt % W) = c
      cnt += 1
      if (cnt >= W && win < winMin) winMin = win
    }
    val winFp = if (cnt >= W) winMin else full
    new GenericInternalRow(Array[Any](full, winFp))
  }

  /** Column form: struct(full_fp, win_fp). */
  def fp(c: Column): Column =
    ColumnShim.column(PolyFingerprint(ColumnShim.expression(c)))
}
