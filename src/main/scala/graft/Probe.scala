package graft

/** Scratch timing probe (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    println(s"availableProcessors: ${Runtime.getRuntime.availableProcessors}")
    val t00 = System.nanoTime()
    val spark = Engine.session("8")
    println(f"session: ${(System.nanoTime() - t00) / 1e9}%.1f s")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries("q_wordcount")(spark, "/root/testdata/sf0.001").count()
      println(f"run$i: ${(System.nanoTime() - t0) / 1e9}%.1f s ($n rows)")
    }
    spark.stop()
  }
}
