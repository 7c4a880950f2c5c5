package graft

import graft.operators.Similarity

class SimilaritySpec extends SparkSuiteBase {

  test("codegen vector kernels are BIT-identical to the lambda fold forms") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 200).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian()), Array.fill(64)(rnd.nextGaussian()))
    }
    val df = rows.toDF("id", "a", "b")
      .select(col("id"),
        graft.functions.VectorExprs.dot(col("a"), col("b")).as("dot_k"),
        expr("aggregate(zip_with(a, b, (x, y) -> x * y), cast(0.0 as double), (acc, p) -> acc + p)").as("dot_l"),
        graft.functions.VectorExprs.sqDist(col("a"), col("b")).as("d2_k"),
        expr("aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), cast(0.0 as double), (acc, p) -> acc + p)").as("d2_l"))
    df.collect().foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(2)), s"dot bits differ at id ${r.getLong(0)}")
      assert(java.lang.Double.doubleToLongBits(r.getDouble(3)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(4)), s"sqdist bits differ at id ${r.getLong(0)}")
    }
    // ragged vectors are NULL (as the zip_with forms), never a silent
    // truncated-prefix product
    val ragged = Seq((Array(1.0, 2.0), Array(1.0, 2.0, 3.0)))
      .toDF("a", "b")
      .select(graft.functions.VectorExprs.dot(col("a"), col("b")).as("d"))
      .collect()(0)
    assert(ragged.isNullAt(0), "length mismatch must be NULL")
  }

  test("brute-force top-k ranks by cosine with deterministic tie-break") {
    val rows = Similarity.bruteForceTopK(spark, sf).collect()
    val byQ = rows.groupBy(_.getLong(0))
    byQ.foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getLong(3))
      // ranks 1..k, sims non-increasing, no self
      assert(sorted.map(_.getLong(3)).toSeq === (1L to sorted.length))
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getDouble(2) >= b.getDouble(2) - 1e-15)
        case _ =>
      }
      assert(!rs.exists(_.getLong(1) == q))
    }
    assert(byQ.size === 10)
  }

  test("IVF top-k: probes nProbe lists, decent recall vs brute force") {
    val brute = Similarity.bruteForceTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(spark, sf).collect()
    ivf.foreach(r => assert(r.getLong(0) != r.getLong(1)))
    val recall = ivf.map(r => (r.getLong(0), r.getLong(1)))
      .count(brute.contains).toDouble / brute.size
    info(f"IVF recall vs brute force: $recall%.2f")
    assert(recall > 0.2, f"IVF recall $recall%.2f unexpectedly low")
  }

  test("LSH top-k candidates are a subset ranked identically to brute force") {
    val brute = Similarity.bruteForceTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshTopK(spark, sf).collect()
    // every LSH hit is a real vector pair with correct (qid != vec_id)
    lsh.foreach(r => assert(r.getLong(0) != r.getLong(1)))
    // recall is data-dependent; require the mechanism to produce hits
    assert(lsh.nonEmpty, "LSH produced no candidates at all")
    val recall = lsh.map(r => (r.getLong(0), r.getLong(1)))
      .count(brute.contains).toDouble / brute.size
    info(f"LSH recall vs brute force: $recall%.2f")
  }
}
