package graft

/** Scratch timing probe (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val what = if (args.length > 1) args(1) else "kmeans"
    println(s"availableProcessors: ${Runtime.getRuntime.availableProcessors}")
    val t00 = System.nanoTime()
    val spark = Engine.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    println(f"session: ${(System.nanoTime() - t00) / 1e9}%.1f s")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(s"q_$what")(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      println(f"run$i: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
