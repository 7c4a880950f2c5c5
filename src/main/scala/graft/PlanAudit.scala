package graft

/** One-off plan audit (scratch, not part of the driver contract):
  * prints the physical-plan skeleton of every registered query. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.01"
    val spark = Engine.session("8")
    // streaming / iterative-fit queries: no single static plan (and
    // building them EXECUTES the stream / the Lloyd driver loop)
    val skip = Set("q_stream_tumbling", "q_stream_sliding", "q_stream_session",
      "q_stream_dedup", "q_stream_join", "q_stream_upsert", "q_stream_enrich",
      "q_stream_outer", "q_stream_topevent", "q_stream_spend",
      "q_stream_typecounts", "q_stream_recent", "q_stream_usersession",
      "q_stream_ohlc", "q_stream_wordcount", "q_stream_neardup",
      "q_stream_linreg", "q_stream_anomaly",
      // the HCC component loop runs driver rounds at build time
      "q_dbscan",
      // the stitched curation chain runs its dedup component loop (and
      // frees its staged frames) at build time — no single static plan
      "q_pipeline_web",
      // driver-collect at build time (per-language ledger / quantizer fit)
      "q_mix_temperature", "q_kmeans", "q_simsearch_ivf", "q_pagerank",
      "q_dedup_semantic", "q_knn_join_blocked",
      // the power-iteration fits run at build time AND the output is a
      // 64-row LocalTableScan — nothing to audit (q_pca_project stays:
      // the memoized fit stages once, then its plan is the static
      // codegen projection scan, the q_simsearch_pq_indexed argument)
      "q_pca_power", "q_pca_deflate", "q_pca_topk",
      // normal-equation fits at build time, 3-row LocalTableScan output
      // (q_linreg_predict stays: the static codegen prediction scan)
      "q_linreg", "q_linreg_append",
      // codebook fits run at plan-build time (q_simsearch_pq_indexed is
      // NOT skipped: it stages once, then its plan is the static
      // codes-table scan the persisted-PQ design exists for)
      "q_simsearch_pq", "q_simsearch_ivfpq")
    // optional args: audit only the named queries (local iteration)
    val only = args.toSet
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (!skip(name) && (only.isEmpty || only(name))) {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        val lines = plan.linesIterator.filter(l =>
          l.contains("Scan parquet") || l.contains("PushedFilters") ||
          l.contains("Join") || l.contains("Exchange") ||
          l.contains("HashAggregate") || l.contains("WholeStageCodegen") ||
          l.contains("TakeOrdered") || l.contains("Window") ||
          l.contains("Sort") || l.contains("Generate")).toSeq
        println(s"=== $name")
        lines.take(14).foreach { l =>
          println("  " + l.trim.take(160))
          // partition pruning evidence sits deep in FileScan lines and
          // would be lost to the 160-char cap — surface it explicitly
          val pf = l.indexOf("PartitionFilters: [")
          if (pf >= 0) {
            val frag = l.substring(pf, math.min(l.length, pf + 140))
            if (!frag.startsWith("PartitionFilters: []")) {
              // mark truncation honestly instead of fabricating a ']'
              if (frag.contains(']'))
                println("      ^- " + frag.takeWhile(_ != ']') + "]")
              else
                println("      ^- " + frag + "… (truncated)")
            }
          }
        }
      }
    }
    spark.stop()
  }
}
