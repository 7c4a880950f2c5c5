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
}
