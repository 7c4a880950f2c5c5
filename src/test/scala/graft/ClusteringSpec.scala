package graft

import graft.operators.Clustering

class ClusteringSpec extends SparkSuiteBase {

  test("kmeans: inertia non-increasing with more Lloyd iterations") {
    def inertia(iters: Int): Double =
      Clustering.kmeansAssign(spark, sf, iters).collect().map(_.getDouble(2)).sum
    val i1 = inertia(1)
    val i4 = inertia(4)
    val i8 = inertia(8)
    assert(i4 <= i1 + 1e-6, s"i1=$i1 i4=$i4")
    assert(i8 <= i4 + 1e-6, s"i4=$i4 i8=$i8")
  }

  test("kmeans: deterministic across runs") {
    val a = Clustering.kmeansSummary(spark, sf).collect().map(_.toSeq)
    val b = Clustering.kmeansSummary(spark, sf).collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("kmeans: every vector assigned, k clusters at most") {
    val rows = Clustering.kmeansAssign(spark, sf).collect()
    val n = graft.sources.Tables(spark, sf, "embeddings").count()
    assert(rows.length === n)
    assert(rows.map(_.getInt(1)).distinct.length <= Clustering.K)
  }

  test("nearest-centroid confusion: totals reconcile, diagonal dominates, deterministic") {
    val rows = Clustering.nearestCentroid(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val n = graft.sources.Tables(spark, sf, "embeddings").count()
    assert(rows.values.sum === n, "every vector classified exactly once")
    // prototypes must beat chance on their own training data: the
    // diagonal outweighs any single off-diagonal cell per true label
    val labels = rows.keys.map(_._1).toSeq.distinct
    labels.foreach { l =>
      val diag = rows.getOrElse((l, l), 0L)
      val offMax = rows.collect { case ((t, p), c) if t == l && p != l => c }
        .foldLeft(0L)(math.max)
      assert(diag > offMax, s"label $l: diag=$diag offMax=$offMax")
    }
    val again = Clustering.nearestCentroid(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(again === rows)
  }

  test("q_pca_power recovers a planted principal direction (fixed-point power iteration)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // anisotropic corpus: points = t·d + small noise, d a fixed unit-ish
    // direction — the top principal component must align with d
    val rnd = new scala.util.Random(3)
    val dim = 64
    val dRaw = Array.fill(dim)(rnd.nextGaussian())
    val dn = math.sqrt(dRaw.map(x => x * x).sum)
    val d = dRaw.map(_ / dn)
    val rows = (0 until 400).map { i =>
      val t = 3.0 * rnd.nextGaussian()
      (i.toLong, d.map(_ * t).zip(Array.fill(dim)(0.05 * rnd.nextGaussian())).map(p => p._1 + p._2))
    }
    val v = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        transform(col("embedding"),
          x => round(x * lit(Clustering.FpScale)).cast("long")).as("e"))
    val c = Clustering.pcaPowerFixed(v, Clustering.PcaIters).map(_.toDouble)
    val cn = math.sqrt(c.map(x => x * x).sum)
    val cos = math.abs(c.zip(d).map(p => p._1 * p._2).sum / cn)
    info(f"planted-direction alignment |cos| = $cos%.4f")
    assert(cos > 0.95, f"power iteration must align with the planted direction, got $cos%.4f")
    // max-norm convention: the returned vector is scaled to max |c| = FpScale
    assert(c.map(math.abs).max <= Clustering.FpScale * 1.001)
    assert(c.map(math.abs).max >= Clustering.FpScale * 0.5)
  }

  test("q_pca_power on the fixture: 64 deterministic rows, memoized model") {
    val out = Clustering.pcaPower(spark, sf).collect()
    assert(out.length === 64)
    assert(out.map(_.getLong(0)).toSeq === (0L until 64L))
    val again = Clustering.pcaPower(spark, sf).collect()
    assert(out.map(_.getLong(1)).toSeq === again.map(_.getLong(1)).toSeq)
  }
}
