package graft

/** One-off plan audit (scratch, not part of the driver contract):
  * prints the physical-plan skeleton of every registered query. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.01"
    val spark = Engine.session("8")
    val skip = Set("q_stream_tumbling", "q_stream_sliding", "q_stream_session",
      "q_stream_dedup", "q_kmeans") // streaming/iterative: no single static plan
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (!skip(name)) {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        val lines = plan.linesIterator.filter(l =>
          l.contains("Scan parquet") || l.contains("PushedFilters") ||
          l.contains("Join") || l.contains("Exchange") ||
          l.contains("HashAggregate") || l.contains("WholeStageCodegen") ||
          l.contains("TakeOrdered") || l.contains("Window") ||
          l.contains("Sort") || l.contains("Generate")).toSeq
        println(s"=== $name")
        lines.take(14).foreach(l => println("  " + l.trim.take(160)))
      }
    }
    spark.stop()
  }
}
