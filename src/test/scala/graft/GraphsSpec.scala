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
