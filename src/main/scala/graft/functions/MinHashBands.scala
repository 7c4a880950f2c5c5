package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** All LSH band hashes of one document's shingle set in ONE compiled
  * loop: m_i = min over shingles x of ((x pmod P)·a_i + b_i) mod P for
  * i < nPerm, then band b hashes its `rows` consecutive mins with
  * Spark's murmur3 long fold (seed 42 — [[
  * org.apache.spark.unsafe.hash.Murmur3_x86_32.hashLong]], exactly
  * what `functions.hash(m0..m3)` computes), yielding array<int> of
  * nPerm/rows band hashes.
  *
  * This replaces the 128-column `min()` aggregate + banding projection
  * ([[graft.operators.Dedup.sigBandsFromShingles]], kept as the
  * reference form): same math, same values, but the per-DOC grain
  * means no 128-wide aggregation buffer, no 128-expression plan — the
  * signature stage collapses from ~160 Catalyst expressions to ONE,
  * which is what the per-micro-batch replanning of q_stream_neardup
  * actually pays for (VERDICT r12 #3; the LshSignatures precedent:
  * fixed-size generated loops instead of width-proportional plans).
  *
  * Bit parity with the aggregate form: pmod/·/mod evaluate in the same
  * long arithmetic (sx < P ≈ 2·10⁹ and a_i < P keep sx·a_i + b_i below
  * 2⁶³ — no wrap, same as the column form), min over a set is
  * order-independent, and the band fold IS Spark's murmur3 long chain.
  * An EMPTY shingle array yields NULL (the aggregate form never sees
  * an empty group — callers filter docs with < 3 tokens). */
case class MinHashBandHashes(child: Expression, permA: Array[Long],
    permB: Array[Long], p: Long, rows: Int)
    extends UnaryExpression {
  private val nPerm = permA.length
  private val nBands = nPerm / rows
  require(permB.length == nPerm && nBands * rows == nPerm)

  override def prettyName: String = "minhash_band_hashes"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<bigint> argument, got $t")
    }

  override protected def nullSafeEval(a: Any): Any = {
    val sh = a.asInstanceOf[ArrayData]
    val n = sh.numElements()
    if (n == 0) null
    else {
      val mins = Array.fill(nPerm)(Long.MaxValue)
      var s = 0
      while (s < n) {
        val x = sh.getLong(s)
        val sx = ((x % p) + p) % p
        var i = 0
        while (i < nPerm) {
          val h = (sx * permA(i) + permB(i)) % p
          if (h < mins(i)) mins(i) = h
          i += 1
        }
        s += 1
      }
      val out = new Array[Int](nBands)
      var b = 0
      while (b < nBands) {
        var h = 42
        var r = 0
        while (r < rows) {
          h = org.apache.spark.unsafe.hash.Murmur3_x86_32
            .hashLong(mins(b * rows + r), h)
          r += 1
        }
        out(b) = h
        b += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pa = ctx.addReferenceObj("minhashA", permA, "long[]")
    val pb = ctx.addReferenceObj("minhashB", permB, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val s = ctx.freshName("s")
      val i = ctx.freshName("i"); val b = ctx.freshName("b")
      val r = ctx.freshName("r"); val x = ctx.freshName("x")
      val sx = ctx.freshName("sx"); val h = ctx.freshName("h")
      val mins = ctx.freshName("mins"); val out = ctx.freshName("out")
      val bh = ctx.freshName("bh")
      s"""
         |int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $mins = new long[$nPerm];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $s = 0; $s < $n; $s++) {
         |    long $x = $a.getLong($s);
         |    long $sx = (($x % ${p}L) + ${p}L) % ${p}L;
         |    for (int $i = 0; $i < $nPerm; $i++) {
         |      long $h = ($sx * $pa[$i] + $pb[$i]) % ${p}L;
         |      if ($h < $mins[$i]) $mins[$i] = $h;
         |    }
         |  }
         |  int[] $out = new int[$nBands];
         |  for (int $b = 0; $b < $nBands; $b++) {
         |    int $bh = 42;
         |    for (int $r = 0; $r < $rows; $r++) {
         |      $bh = org.apache.spark.unsafe.hash.Murmur3_x86_32
         |        .hashLong($mins[$b * $rows + $r], $bh);
         |    }
         |    $out[$b] = $bh;
         |  }
         |  ${ev.value} =
         |    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): MinHashBandHashes =
    copy(child = c)
}

object MinHashBandHashes {
  /** Column form: band hashes of an array<bigint> shingle column. */
  def of(e: Column, permA: Array[Long], permB: Array[Long],
         p: Long, rows: Int): Column =
    ColumnShim.column(
      MinHashBandHashes(ColumnShim.expression(e), permA, permB, p, rows))
}
