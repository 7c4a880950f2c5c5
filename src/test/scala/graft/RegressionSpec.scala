package graft

import org.apache.spark.sql.functions._
import graft.operators.Regression

class RegressionSpec extends SparkSuiteBase {

  test("exactly-linear data recovers the planted coefficients EXACTLY (integer Cramer)") {
    import spark.implicits._
    // y = 3 + 2·x1 − x2 with no noise: the least-squares solution is
    // the planted integer vector, so the micro-unit coefficients must
    // be exact multiples of F — no tolerance anywhere
    val rnd = new scala.util.Random(7)
    val rows = (0 until 300).map { i =>
      val x1 = 10L + rnd.nextInt(500)
      val x2 = 1L + rnd.nextInt(80)
      (i.toLong, x1, x2, 3L + 2L * x1 - x2)
    }
    val betas = Regression.fitFixed(rows.toDF("doc_id", "x1", "x2", "y"))
    assert(betas.toSeq === Seq(3L * Regression.F, 2L * Regression.F, -Regression.F))
  }

  test("collinear features are rejected, not silently mis-solved") {
    import spark.implicits._
    val rows = (0 until 50).map(i => (i.toLong, i.toLong + 1, 2L * (i + 1), 5L))
    val e = intercept[IllegalArgumentException] {
      Regression.fitFixed(rows.toDF("doc_id", "x1", "x2", "y"))
    }
    assert(e.getMessage.contains("collinear"))
  }

  test("fixture fit matches a double-precision normal-equation solve; predictions reconcile") {
    val betas = Regression.fitFixed(spark, sf)
    // independent reference: the same sums in Double, Gaussian solve
    val f = graft.sources.Tables(spark, sf, "documents").select(
      col("n_chars").cast("double").as("x1"),
      (length(col("text")) - length(replace(col("text"), lit("e"), lit(""))))
        .cast("double").as("x2"),
      size(filter(split(col("text"), " "), w => length(w) > 0))
        .cast("double").as("y")).collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    val n = f.length.toDouble
    def s(g: ((Double, Double, Double)) => Double) = f.map(g).sum
    val a = Array(
      Array(n, s(_._1), s(_._2)),
      Array(s(_._1), s(t => t._1 * t._1), s(t => t._1 * t._2)),
      Array(s(_._2), s(t => t._1 * t._2), s(t => t._2 * t._2)))
    val b = Array(s(_._3), s(t => t._1 * t._3), s(t => t._2 * t._3))
    // 3×3 Gaussian elimination with partial pivoting
    for (p <- 0 until 3) {
      val piv = (p until 3).maxBy(i => math.abs(a(i)(p)))
      val (ta, tb) = (a(p), b(p)); a(p) = a(piv); b(p) = b(piv); a(piv) = ta; b(piv) = tb
      for (i <- p + 1 until 3) {
        val m = a(i)(p) / a(p)(p)
        for (j <- p until 3) a(i)(j) -= m * a(p)(j)
        b(i) -= m * b(p)
      }
    }
    val x = Array.fill(3)(0.0)
    for (i <- 2 to 0 by -1)
      x(i) = (b(i) - (i + 1 until 3).map(j => a(i)(j) * x(j)).sum) / a(i)(i)
    betas.zip(x).zipWithIndex.foreach { case ((got, want), j) =>
      assert(math.abs(got.toDouble / Regression.F - want) < 1e-4,
        s"beta $j: fixed-point ${got.toDouble / Regression.F} vs double $want")
    }
    info(s"fixture betas (F-scaled): ${betas.mkString(", ")}")
    // predictions: yhat_fp exact from the betas; residuals sum ≈ 0
    // (exact least squares has Σresid = 0; fixed-point rounding of the
    // three betas perturbs each row by ≤ (1 + x1 + x2)/2 micro-units)
    val pred = Regression.linregPredict(spark, sf).collect()
    assert(pred.length === f.length)
    val maxRowErr = f.map(t => (1 + t._1 + t._2) / 2).max
    val sumResid = pred.map(_.getLong(3)).sum
    assert(math.abs(sumResid.toDouble) <= maxRowErr * f.length,
      s"residuals do not balance: $sumResid")
    pred.foreach { r =>
      assert(r.getLong(3) === r.getLong(1) * Regression.F - r.getLong(2))
    }
  }

  test("appended fit ≡ one-shot fit bit-for-bit (sufficient statistics add exactly)") {
    val oneShot = graft.operators.Regression.linreg(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val appended = graft.operators.Regression.linregAppended(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(appended === oneShot)
    // the staged state really is a 1-row sums parquet (9 columns)
    val (root, cut) = graft.operators.Regression.stagedSumsState(spark, sf)
    val state = spark.read.parquet(s"$root/state")
    assert(state.count() === 1L && state.columns.length === 9)
    assert(cut > 0L)
  }

  test("streamed fold ≡ batch fit bit-for-bit (chunking invisible to associative statistics)") {
    val batchFit = graft.operators.Regression.linreg(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val streamed = graft.streaming.Streams.streamLinreg(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(streamed === batchFit)
  }

  test("q_linreg is deterministic and memoized across calls") {
    val a = graft.operators.Regression.linreg(spark, sf).collect().map(_.getLong(1)).toSeq
    val b = graft.operators.Regression.linreg(spark, sf).collect().map(_.getLong(1)).toSeq
    assert(a === b)
    assert(a.length === 3)
  }
}
