package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** All of one document's Gopher repetition masses in ONE compiled pass
  * (Rae et al. 2021 §A1.1, Table A1): duplicate line/paragraph
  * counts and char masses, the word-char mass, the argmax-by-count
  * top-{topNs}-gram char masses (ties to the longer gram — the
  * lexicographic (count, chars) max), and the ≥2-occurrence
  * dup-{dupNs}-gram char masses.
  *
  * This is the serving form of `TextOps.repetitionGopher`; the keyed
  * (doc, kind, n, gram) aggregation (`repetitionGopherKeyed`) is kept
  * as the spec baseline and the fallback for corpora whose single
  * documents outgrow executor memory. The kernel exists because the
  * gram grain is ~9 rows per token: exploding, shuffling, and
  * re-aggregating what is a per-document computation made
  * q_repetition_gopher the engine's most expensive text row (7.6 s at
  * sf0.1), while this per-row loop — the same shape as the published
  * per-doc-in-RAM recipe, and the same assumption qualityGopher's
  * per-row array aggregates already make — needs no shuffle at all.
  *
  * Exactness: gram identity is the exact token-id sequence (tokens
  * dictionary-encoded per doc, windows compared by content — no
  * hashing anywhere), chars(gram) = Σ token lengths in the window
  * (≡ length(space-join) − (n−1)), all outputs are exact BIGINTs; the
  * double divisions stay in the SQL layer, operand-order-mirrored by
  * the DuckDB oracle. */
case class GopherRepetitionStats(first: Expression, second: Expression,
    third: Expression, topNs: Array[Int], dupNs: Array[Int])
    extends TernaryExpression {

  override def prettyName: String = "gopher_repetition_stats"
  override def dataType: DataType = GopherRepetitionStats.schema(topNs, dupNs)
  override def nullable: Boolean =
    first.nullable || second.nullable || third.nullable

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(first, second, third).forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires three array<string> arguments " +
        s"(tokens, lines, paragraphs)")
  }

  override protected def nullSafeEval(ts: Any, lns: Any, prs: Any): Any =
    GopherRepetitionStats.compute(ts.asInstanceOf[ArrayData],
      lns.asInstanceOf[ArrayData], prs.asInstanceOf[ArrayData], topNs, dupNs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // whole-stage codegen emits ONE static call into the kernel — the
    // loop bodies live in Scala, the row pipeline stays compiled
    val top = ctx.addReferenceObj("gopherTopNs", topNs, "int[]")
    val dup = ctx.addReferenceObj("gopherDupNs", dupNs, "int[]")
    nullSafeCodeGen(ctx, ev, (ts, lns, prs) =>
      s"${ev.value} = graft.functions.GopherRepetitionStats.compute(" +
        s"$ts, $lns, $prs, $top, $dup);")
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): GopherRepetitionStats = copy(first = f, second = s, third = t)
}

object GopherRepetitionStats {

  /** Output layout: line stats, paragraph stats, word-char mass, then
    * one top mass per [[topNs]] and one dup mass per [[dupNs]] — all
    * BIGINT. */
  def schema(topNs: Array[Int], dupNs: Array[Int]): StructType = StructType(
    (Seq("l_n", "l_nd", "l_mass", "l_dup", "p_n", "p_nd", "p_mass", "p_dup",
      "m") ++ topNs.map(n => s"top${n}_mass") ++ dupNs.map(n => s"dup${n}_mass"))
      .map(StructField(_, LongType, nullable = false)))

  /** Column form. */
  def of(tokens: Column, lines: Column, paras: Column,
      topNs: Seq[Int], dupNs: Seq[Int]): Column =
    ColumnShim.column(GopherRepetitionStats(ColumnShim.expression(tokens),
      ColumnShim.expression(lines), ColumnShim.expression(paras),
      topNs.toArray, dupNs.toArray))

  /** Exact-identity gram key: the token-id window, content-compared. */
  private final class GramKey(val ids: Array[Int], val start: Int,
      val n: Int, val hash: Int) {
    override def hashCode: Int = hash
    override def equals(o: Any): Boolean = o match {
      case g: GramKey =>
        if (g.n != n) false
        else {
          var i = 0
          while (i < n && ids(start + i) == g.ids(g.start + i)) i += 1
          i == n
        }
      case _ => false
    }
  }

  /** (count, chars) cell of one distinct unit/gram. */
  private final class Cell(var c: Long, val chars: Long)

  // duplicate-unit stats of one string array: (n, nd, mass, dup)
  private def unitStats(a: ArrayData, out: Array[Long], off: Int): Unit = {
    val n = a.numElements()
    val m = new java.util.HashMap[UTF8String, Cell]()
    var i = 0
    while (i < n) {
      val u = a.getUTF8String(i)
      val cell = m.get(u)
      if (cell == null) m.put(u, new Cell(1L, u.numChars().toLong))
      else cell.c += 1L
      i += 1
    }
    var mass = 0L; var dup = 0L
    val it = m.values().iterator()
    while (it.hasNext) {
      val cell = it.next()
      mass += cell.chars * cell.c
      dup += cell.chars * (cell.c - 1L)
    }
    out(off) = n.toLong
    out(off + 1) = m.size().toLong
    out(off + 2) = mass
    out(off + 3) = dup
  }

  def compute(ts: ArrayData, lns: ArrayData, prs: ArrayData,
      topNs: Array[Int], dupNs: Array[Int]): InternalRow = {
    val nOut = 9 + topNs.length + dupNs.length
    val out = new Array[Long](nOut)
    unitStats(lns, out, 0)
    unitStats(prs, out, 4)

    // dictionary-encode tokens; prefix char sums give chars(window) in
    // O(1): chars = Σ token lengths (≡ length(join) − (n−1))
    val t = ts.numElements()
    val ids = new Array[Int](t)
    val pref = new Array[Long](t + 1)
    val dict = new java.util.HashMap[UTF8String, Integer]()
    var i = 0
    while (i < t) {
      val tok = ts.getUTF8String(i)
      var id = dict.get(tok)
      if (id == null) { id = Integer.valueOf(dict.size()); dict.put(tok, id) }
      ids(i) = id.intValue()
      pref(i + 1) = pref(i) + tok.numChars().toLong
      i += 1
    }
    out(8) = pref(t) // word-char mass

    // per n: exact gram counts keyed by the id window
    def gramCells(n: Int): java.util.HashMap[GramKey, Cell] = {
      val m = new java.util.HashMap[GramKey, Cell]()
      var s = 0
      val last = t - n
      while (s <= last) {
        var h = 1
        var j = 0
        while (j < n) { h = h * 31 + ids(s + j); j += 1 }
        val k = new GramKey(ids, s, n, h)
        val cell = m.get(k)
        if (cell == null) m.put(k, new Cell(1L, pref(s + n) - pref(s)))
        else cell.c += 1L
        s += 1
      }
      m
    }

    var o = 9
    var x = 0
    while (x < topNs.length) {
      // argmax by (count, chars): the most frequent gram's char mass,
      // ties to the longer gram — deterministic, and on a full
      // (count, chars) tie the masses coincide
      var bc = 0L; var bl = 0L
      val it = gramCells(topNs(x)).values().iterator()
      while (it.hasNext) {
        val cell = it.next()
        if (cell.c > bc || (cell.c == bc && cell.chars > bl)) {
          bc = cell.c; bl = cell.chars
        }
      }
      out(o) = bc * bl
      o += 1; x = x + 1
    }
    x = 0
    while (x < dupNs.length) {
      var dup = 0L
      val it = gramCells(dupNs(x)).values().iterator()
      while (it.hasNext) {
        val cell = it.next()
        if (cell.c >= 2L) dup += cell.c * cell.chars
      }
      out(o) = dup
      o += 1; x = x + 1
    }
    // box into the row (a primitive long[] is not an Array[Any])
    val boxed = new Array[Any](nOut)
    var z = 0
    while (z < nOut) { boxed(z) = out(z); z += 1 }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(boxed)
  }
}
