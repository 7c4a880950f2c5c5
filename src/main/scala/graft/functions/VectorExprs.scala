package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Codegen'd vector kernels for the similarity/dedup/clustering hot
  * loops. The declarative forms (`aggregate(zip_with(...))`) are
  * evaluated INTERPRETED per row — on an n² pair join that lambda
  * interpreter is the entire profile. These expressions splice a tight
  * primitive loop into whole-stage codegen instead.
  *
  * Float parity: both kernels accumulate LEFT-TO-RIGHT from 0.0 —
  * exactly the fold order of the `aggregate(zip_with(..))` forms they
  * replace and of the DuckDB oracle's `list_reduce(list_prepend(0.0,
  * ...))` — so results are bit-identical and oracle hash checks are
  * unaffected.
  *
  * Element nulls are NOT supported: these are primitive kernels
  * (NULL input arrays → NULL result via the null-safe wrapper, but a
  * NULL *element* is undefined, as for any primitive vector math).
  * Callers materialize dense vectors (the engine's embedding columns
  * are non-null floats). Mismatched LENGTHS return NULL — the same
  * ragged-vector behavior as the zip_with forms (which pad with NULL
  * and propagate), so a malformed embedding yields NULL, never a
  * silently-truncated prefix product. */
abstract class VectorFold extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"${prettyName} requires two array<double> arguments, got ($l, $r)")
    }

  /** Java source for one accumulation term given element vars `x`/`y`. */
  protected def termJava(x: String, y: String): String
  protected def termEval(x: Double, y: Double): Double

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val u = a.asInstanceOf[ArrayData]
    val v = b.asInstanceOf[ArrayData]
    val n = u.numElements()
    if (n != v.numElements()) null
    else {
      var s = 0.0
      var i = 0
      while (i < n) {
        s += termEval(u.getDouble(i), v.getDouble(i))
        i += 1
      }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $x = $a.getDouble($i);
         |    double $y = $b.getDouble($i);
         |    $s += ${termJava(x, y)};
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })
}

/** Left-fold dot product Σ aᵢ·bᵢ of two array<double>. */
case class DotF64(left: Expression, right: Expression) extends VectorFold {
  override def prettyName: String = "dot_f64"
  override protected def termJava(x: String, y: String): String = s"$x * $y"
  override protected def termEval(x: Double, y: Double): Double = x * y
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotF64 =
    copy(left = l, right = r)
}

/** Left-fold squared L2 distance Σ (aᵢ−bᵢ)² of two array<double>. */
case class SqDistF64(left: Expression, right: Expression) extends VectorFold {
  override def prettyName: String = "sqdist_f64"
  override protected def termJava(x: String, y: String): String =
    s"($x - $y) * ($x - $y)"
  override protected def termEval(x: Double, y: Double): Double = (x - y) * (x - y)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SqDistF64 =
    copy(left = l, right = r)
}

/** EXACT integer squared L2 distance Σ (aᵢ−bᵢ)² of two array<bigint> —
  * the fixed-point kernel behind the oracle-exact q_kmeans: integer
  * adds are reassociation-proof, so the DuckDB oracle's unordered sums
  * match bit-for-bit with no fold-order contract at all. Overflow-safe
  * while Σ(aᵢ−bᵢ)² < 2⁶³ (micro-unit embeddings: terms ≈ 4e12, 64 dims
  * ≈ 3e14 — five orders of headroom). Same null/ragged semantics as
  * the double kernels. */
case class SqDistI64(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "sqdist_i64"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> arguments, got ($l, $r)")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val u = a.asInstanceOf[ArrayData]
    val v = b.asInstanceOf[ArrayData]
    val n = u.numElements()
    if (n != v.numElements()) null
    else {
      var s = 0L
      var i = 0
      while (i < n) {
        val d = u.getLong(i) - v.getLong(i)
        s += d * d
        i += 1
      }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $d = $a.getLong($i) - $b.getLong($i);
         |    $s += $d * $d;
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SqDistI64 =
    copy(left = l, right = r)
}

object VectorExprs {
  /** Column form: dot product. */
  def dot(a: Column, b: Column): Column =
    ColumnShim.column(DotF64(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Column form: squared L2 distance. */
  def sqDist(a: Column, b: Column): Column =
    ColumnShim.column(SqDistF64(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Column form: exact integer squared L2 distance. */
  def sqDistLong(a: Column, b: Column): Column =
    ColumnShim.column(SqDistI64(ColumnShim.expression(a), ColumnShim.expression(b)))
}
