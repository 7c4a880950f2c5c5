package graft

/** Dump `.explain("formatted")` of named queries to files (scratch tool
  * for the optimization rounds' plans/<round>/ evidence; not part of the
  * driver contract). Usage:
  *   PlanDump <sfDir> <outDir> <suffix> q_a q_b ...
  * writes <outDir>/<query>_<suffix>.txt for each named query. Queries
  * whose construction executes a stream / driver fit still produce their
  * final (served) plan — the same frame the bench's noop write forces.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix) = args.take(3)
    val names = args.drop(3)
    val spark = Engine.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), txt)
      println(s"wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
