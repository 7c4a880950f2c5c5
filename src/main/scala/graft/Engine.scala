package graft

import org.apache.spark.sql.SparkSession

/** Central session tuning for the engine. Applied by Verify/Bench/tests so
  * every entry point runs with the same scale-oriented defaults.
  *
  * Design notes (100 TB mindset, tested on local[N]):
  *  - AQE on: runtime partition coalescing + skew-join splitting replace
  *    hand-tuned shuffle partition counts at scale.
  *  - `spark.sql.icu.caseMappings.enabled=false`: Spark 4's ICU-backed
  *    lower/upper builds a 1.1M-codepoint title-case table on first use
  *    (CollationAwareUTF8String static init) and evaluates case ops through
  *    ICU per row. The JVM/UTF8String ASCII-optimized path is ~10× faster
  *    in the hot loop and matches the DuckDB oracle's `lower` on this
  *    corpus; flip it back on only for locale-sensitive corpora.
  */
object Engine {
  def configure(b: SparkSession.Builder, cpus: String): SparkSession.Builder =
    b.config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      // events.parquet stores ts as TIMESTAMP(NANOS) which the vectorized
      // reader rejects; read as epoch-nanos long, converted in Tables.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  /** Standard local session for mains and tests. Scratch space (shuffle
    * spills, temp streaming checkpoints) goes to tmpfs when available:
    * micro-batch state-store commits fsync per partition per batch, and
    * on this box's virtio disk that is the dominant — and wildly
    * variable — cost of every streaming query. On a real cluster the
    * equivalent is fast local SSD / RocksDB state store. */
  def session(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")): SparkSession = {
    val shm = new java.io.File("/dev/shm/graft-tmp")
    val builder = SparkSession.builder().master(s"local[$cpus]")
    if (shm.isDirectory || shm.mkdirs()) {
      System.setProperty("java.io.tmpdir", shm.getAbsolutePath)
      builder.config("spark.local.dir", shm.getAbsolutePath)
    }
    val spark = configure(builder, cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
