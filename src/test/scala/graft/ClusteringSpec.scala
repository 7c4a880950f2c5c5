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
}
