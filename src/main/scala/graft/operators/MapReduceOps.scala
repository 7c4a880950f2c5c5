package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.functions.{Bigrams, Fnv32a, NetQtyAggregator}
import graft.sources.Tables

/** The user-pluggable Map/Reduce surface (SURVEY §2 U1–U3) — the
  * engine-level answer to the reference's "users plug in Map and Reduce"
  * contract (`/root/reference/README.md:10`, `mp/worker.go:14-17`).
  *
  *  - U1: scalar extension — a native codegen Catalyst expression
  *    (`Fnv32a`), bit-parity with the reference's partitioner hash.
  *  - U2: typed aggregation — `Aggregator` with map-side partials
  *    (`NetQtyAggregator`), the `ReduceInterface` equivalent.
  *  - U3: one-row→many-rows — typed `flatMap`, the `MapperInterface`
  *    equivalent (`mp/worker.go:14`: a mapper may emit many pairs per
  *    record). Typed flatMap leaves whole-stage codegen, which is the
  *    honest cost of arbitrary user logic; everything downstream
  *    (groupBy/count) is planner-optimized again.
  */
object MapReduceOps {

  /** U1 q_udf_fnv: FNV-1a 32-bit hash + R=8 bucket per distinct corpus
    * word — the reference partitioner (`test.go:77-81`) reproduced
    * bit-for-bit as a whole-stage-codegen expression. */
  def fnvBuckets(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(explode(TextOps.tokens(col("text"))).as("word"))
      .where(length(col("word")) > 0)
      .distinct()
      .select(col("word"), Fnv32a.fnv32a(col("word")).as("h"))
      .withColumn("bucket", col("h") % 8)

  /** U2 q_udaf_typed: discount-adjusted quantity per return flag through
    * the typed Aggregator (partial/final split = the reference's
    * in-mapper combine + reducer merge). */
  def typedAgg(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        round(NetQtyAggregator.netQty(col("l_quantity"), col("l_discount")), 2)
          .as("net_qty"),
        count(lit(1)).as("cnt"))

  /** U3 q_udtf_explode: per-document token bigrams via typed flatMap
    * (one record → many KV pairs), then a declarative count. */
  def bigramCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val ts = text.toLowerCase
          .split(TextOps.WsRun).filter(_.nonEmpty)
        ts.sliding(2).filter(_.length == 2).map(a => (id, a(0) + " " + a(1)))
      }
      .toDF("doc_id", "bigram")
      .groupBy("bigram")
      .agg(count(lit(1)).as("cnt"))
  }

  /** U3 stretch (q_udtf_native): the same expansion as a native Catalyst
    * [[Generator]] — planner-placed `GenerateExec` in the scan stage, no
    * typed encoder round-trip. Same oracle as `bigramCounts`. */
  def bigramCountsNative(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(Bigrams.bigrams(col("text")).as("bigram"))
      .groupBy("bigram")
      .agg(count(lit(1)).as("cnt"))
}
