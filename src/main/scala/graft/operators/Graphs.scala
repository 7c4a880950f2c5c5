package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Iterative graph analytics beyond `Dedup.dupComponents`: PageRank
  * (Page, Brin, Motwani & Winograd 1999) over the part↔supplier
  * co-purchase graph — node importance in the "which entities anchor
  * this catalog" sense, the same iterative-refinement family as the
  * reference's unfinished K-Means sketch
  * (`/root/reference/kmeans.go:14-25`: split → local step → keyed
  * merge → repeat).
  *
  * Everything is INTEGER arithmetic: ranks are scaled to 10¹²
  * micro-units, contributions are floor divisions (`r div deg`), the
  * damping factor is `·85 div 100`. Integer sums are exact and
  * reassociation-proof, so the result is BIT-identical across engines,
  * partition counts, and AQE replans — which makes a 5-iteration run
  * DuckDB-oracle-checkable (the oracle unrolls the loop as chained
  * CTEs), where float PageRank would diverge in the last ulps on every
  * engine pair. The deliberate cost: each division floors away < 1
  * micro-unit of rank mass — at 10¹² scaling that bias is ~10⁻¹² per
  * hop, far below any ranking-relevant signal.
  *
  * Shape at scale: the edge list shuffles once per iteration, keyed on
  * the join side (src), then aggregates per dst — both partial/final;
  * per-round lineage is cut with localCheckpoint (the dupComponents
  * pattern). Driver state is nothing at all: a FIXED iteration count,
  * the production norm for PageRank at scale (convergence-delta
  * variants fold a metric into the same aggregate — see
  * `dupComponents`' Observation). Long overflow bound: 85·Σ
  * contributions ≤ 85·n·10¹² must stay < 2⁶³ → safe to n ≈ 10⁵ nodes
  * at this scaling; larger graphs lower Scale proportionally (the
  * ranking is scale-invariant).
  */
object Graphs {

  /** Rank unit: 1.0 of probability mass = 10¹² micro-units. */
  val Scale = 1000000000000L

  /** q_pagerank: 5 damped iterations over the bipartite
    * part↔supplier graph from lineitem (nodes: part·2, supplier·2+1 —
    * disjoint id spaces; edges both directions, so every node has in-
    * and out-degree and no dangling-mass handling is needed). */
  def pageRank(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val fwd = li.select((col("l_partkey") * 2).as("src"),
      (col("l_suppkey") * 2 + 1).as("dst"))
    val edges = fwd.unionAll(fwd.select(col("dst").as("src"),
      col("src").as("dst"))).distinct()
    pageRank(edges, 5)
  }

  /** df form: expects (src: Long, dst: Long) edges; every node must
    * have at least one out-edge (add reverse edges or self-loops
    * upstream for graphs with sinks — unhandled dangling nodes would
    * silently leak rank mass). */
  def pageRank(edges: DataFrame, iters: Int): DataFrame = {
    val e = edges.localCheckpoint()
    val deg = e.groupBy("src").agg(count(lit(1)).as("d")).localCheckpoint()
    var ranks = deg.select(col("src").as("node"), lit(Scale).as("r"))
    for (_ <- 1 to iters) {
      ranks = e.join(deg, "src")
        .join(ranks, col("src") === col("node"))
        .select(col("dst"), expr("r div d").as("c"))
        .groupBy("dst")
        .agg(sum("c").as("s"))
        .select(col("dst").as("node"),
          (lit(Scale * 15L / 100L) + expr("(85 * s) div 100")).as("r"))
        .localCheckpoint()
    }
    ranks
  }
}
