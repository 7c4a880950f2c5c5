package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint selection (Schleimer, Wilkerson, Aiken:
  * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
  * 2003 — the MOSS algorithm) in ONE compiled pass.
  *
  * Every K-char gram gets the [[PolyFingerprint]]-convention polynomial hash
  * (rolling, O(1) per position); over each window of W consecutive
  * gram hashes the MINIMUM is selected, ties to the RIGHTMOST
  * occurrence (the paper's rule); overlapping windows picking the same
  * gram record it once. The guarantee that makes this the standard
  * exact-substring dedup primitive: any substring shared by two
  * documents of length ≥ W + K − 1 (= 35 chars here) shares at least
  * one selected fingerprint, while only ~2/(W+1) of positions are kept
  * — a fixed-density sketch of the document's substring content.
  *
  * Output: array of `pos · 2³⁰ + hash` BIGINTs (pos = 1-based
  * CODEPOINT index of the gram start; hash < p = 1000000007 < 2³⁰, so
  * the encoding is collision-free and order-preserving) — a flat long
  * array keeps the expression allocation-free and lets the DuckDB
  * oracle mirror the exact value with integer arithmetic.
  *
  * The window minimum uses a monotonic deque (ascending hash front to
  * back; equal hashes evict the older index on push, which IS the
  * rightmost-tie rule), so the whole selection is O(n) per document.
  * Same rationale as [[PolyFingerprint]] for being an Expression: the
  * HOF form re-hashes every gram per window (O(n·K·W) interpreted
  * steps, per-element allocation); this is whole-stage-codegen'd into
  * a static call (SURVEY §2 B22; pattern: PolyFingerprint.scala).
  */
case class WinnowFp(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"winnow_fp requires a string argument, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    WinnowFp.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowFp$$.MODULE$$.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFp =
    copy(child = newChild)
}

object WinnowFp {
  private val P = 1000000007L
  private val PK1 = 783945459L // 31^(K-1) mod P, the rolling subtract factor
  /** Gram width in characters. Deliberately LONGER than
    * PolyFingerprint's 8: an 8-char gram is one common English word +
    * a space, so on natural-language corpora nearly every document
    * pair shares one (measured: ~90% of all pairs on the fixture) and
    * "exact-substring duplicate" degenerates to "both contain 'and
    * the '". 20 chars is a phrase — sharing one is evidence of copied
    * text, which is the semantics this operator exists for. */
  val K = 20
  /** Winnow window in grams — detection floor is K + W − 1 = 35 chars
    * (the same order as the 50-token floor large-scale substring-dedup
    * pipelines use, scaled to character grams). */
  val W = 16
  /** Position-encoding radix: hash < P < 2³⁰ makes pos·Enc + hash exact. */
  val Enc = 1073741824L // 2^30

  def compute(s: UTF8String): ArrayData = {
    val str = s.toString
    // ---- pass 1: rolling K-gram hashes over CODEPOINTS (the
    // ascii(substr(t,i,1)) semantics both engines share)
    val n = str.codePointCount(0, str.length)
    val g = n - K + 1
    if (g <= 0)
      return ArrayData.toArrayData(Array.empty[Long])
    val hs = new Array[Long](g)
    val buf = new Array[Long](K) // circular buffer of outgoing codes
    var h = 0L
    var cnt = 0
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      val c = cp.toLong
      if (cnt < K) h = (h * 31 + c) % P
      else {
        h = (((h - buf(cnt % K) * PK1) % P) * 31 + c) % P
        if (h < 0) h += P
      }
      buf(cnt % K) = c
      cnt += 1
      if (cnt >= K) hs(cnt - K) = h
    }
    // ---- pass 2: sliding-window minimum, rightmost tie, via a
    // monotonic deque of gram indices (ascending hash front→back;
    // `>=` eviction keeps the NEWEST equal hash = rightmost-tie rule)
    val out = new Array[Long](g)
    var outN = 0
    var lastSel = -1
    if (g < w0) {
      // fewer grams than a window: ONE window over all grams
      var best = 0
      var j = 1
      while (j < g) { if (hs(j) <= hs(best)) best = j; j += 1 }
      out(0) = (best + 1).toLong * Enc + hs(best)
      outN = 1
    } else {
      val dq = new Array[Int](g)
      var head = 0; var tail = 0 // [head, tail) holds candidate indices
      var j = 0
      while (j < g) {
        while (tail > head && hs(dq(tail - 1)) >= hs(j)) tail -= 1
        dq(tail) = j; tail += 1
        if (dq(head) <= j - w0) head += 1
        if (j >= w0 - 1) {
          val sel = dq(head)
          if (sel != lastSel) {
            out(outN) = (sel + 1).toLong * Enc + hs(sel)
            outN += 1
            lastSel = sel
          }
        }
        j += 1
      }
    }
    ArrayData.toArrayData(java.util.Arrays.copyOf(out, outN))
  }

  private val w0 = W

  /** Column form: array of pos·2³⁰ + gram-hash selections. */
  def of(c: Column): Column =
    ColumnShim.column(WinnowFp(ColumnShim.expression(c)))
}
