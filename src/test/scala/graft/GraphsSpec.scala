package graft

import graft.operators.Graphs

/** Integer PageRank: exact parity with a driver-side reference loop on
  * a crafted graph, plus mass-conservation and determinism on the
  * fixture graph. */
class GraphsSpec extends SparkSuiteBase {

  test("pageRank matches an exact integer reference implementation") {
    import spark.implicits._
    // 1→3, 2→3, 3→1, 3→2: node 3 is the hub
    val edges = Seq((1L, 3L), (2L, 3L), (3L, 1L), (3L, 2L))
    val got = Graphs.pageRank(edges.toDF("src", "dst"), 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    // driver-side reference: same integer arithmetic, plain Scala
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var r = deg.keys.map(_ -> Graphs.Scale).toMap
    for (_ <- 1 to 5) {
      val contrib = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (s, _) => r(s) / deg(s) }.sum
      }
      r = contrib.map { case (n, s) =>
        n -> (Graphs.Scale * 15L / 100L + (85L * s) / 100L)
      }
    }
    assert(got === r)
    assert(got(3L) > got(1L) && got(3L) > got(2L), "hub must outrank leaves")
    assert(got(1L) === got(2L), "symmetric leaves rank equally")
  }

  test("triangles: crafted graph with known counts") {
    import spark.implicits._
    // K4 on {1,2,3,4} (4 triangles) + pendant 1-5 + disjoint edge 6-7
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (1L, 5L), (6L, 7L))
    val r = Graphs.triangles(edges.toDF("u", "v")).collect()(0)
    assert(r.getAs[Long]("n_nodes") === 7L)
    assert(r.getAs[Long]("n_edges") === 8L)
    // deg = (4,3,3,3,1,1,1) → Σ C(d,2) = 6 + 3·3 = 15
    assert(r.getAs[Long]("n_wedges") === 15L)
    assert(r.getAs[Long]("n_triangles") === 4L)
    assert(r.getAs[Double]("clustering") === 3.0 * 4L / 15L)
  }

  test("triangles: degree-ordered count ≡ brute force on a pseudo-random graph") {
    import spark.implicits._
    // deterministic G(30, p): skewed enough that id-order ≠ degree-order
    val rnd = new scala.util.Random(7)
    val n = 30
    val edges = (for {
      u <- 1 until n; v <- (u + 1) to n if rnd.nextDouble() < 0.25
    } yield (u.toLong, v.toLong)).toVector
    val es = edges.toSet
    val brute = (for {
      a <- 1 to n; b <- (a + 1) to n; c <- (b + 1) to n
      if es((a.toLong, b.toLong)) && es((b.toLong, c.toLong)) && es((a.toLong, c.toLong))
    } yield 1).size.toLong
    val r = Graphs.triangles(edges.toDF("u", "v")).collect()(0)
    assert(r.getAs[Long]("n_triangles") === brute)
    assert(r.getAs[Long]("n_edges") === edges.size.toLong)
  }

  test("degreeDist: handshake identity and triangle-wedge consistency on the fixture") {
    val dist = Graphs.degreeDist(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tri = Graphs.triangles(spark, sf).collect()(0)
    // Σ d·n(d) = 2|E| (handshake lemma)
    assert(dist.map { case (d, n) => d * n }.sum === 2L * tri.getAs[Long]("n_edges"))
    // Σ n(d) = |V|, Σ C(d,2)·n(d) = wedge count — same deg table as triangles
    assert(dist.values.sum === tri.getAs[Long]("n_nodes"))
    assert(dist.map { case (d, n) => d * (d - 1) / 2 * n }.sum ===
      tri.getAs[Long]("n_wedges"))
  }

  test("pageRank on the fixture graph: total mass conserved within floor losses") {
    val rows = Graphs.pageRank(spark, sf).collect().map(_.getLong(1))
    val n = rows.length.toLong
    val total = rows.sum
    // each of the 5 iterations floors away < 1 unit per edge-contribution
    // and < 1 per damping division; mass can only shrink, never grow
    assert(total <= n * Graphs.Scale)
    assert(total > n * Graphs.Scale - n * 5L * 100L,
      s"total $total vs ${n * Graphs.Scale}")
    // deterministic: a second run is bit-identical
    val again = Graphs.pageRank(spark, sf).collect().map(_.getLong(1))
    assert(rows.sorted.sameElements(again.sorted))
  }
}
