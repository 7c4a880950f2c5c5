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
        val ts = text.toLowerCase(java.util.Locale.ROOT)
          .split(TextOps.WsRun).filter(_.nonEmpty)
        ts.sliding(2).filter(_.length == 2).map(a => (id, a(0) + " " + a(1)))
      }
      .toDF("doc_id", "bigram")
      .groupBy("bigram")
      .agg(count(lit(1)).as("cnt"))
  }

  /** The reference's whole programming contract as ONE generic entry
    * point (`/root/reference/README.md:10` "users plug in Map and
    * Reduce"; `mp/worker.go:14-17`): `mapFn` is `MapperInterface` (one
    * record → many KV pairs), `reduceFn` is `ReduceInterface` (pairwise
    * associative+commutative merge per key), `r` is the reference's R —
    * and really is the reduce-task count: ONE shuffle hash-partitions
    * by key into exactly `r` partitions (`r ≤ 0` → session default) and
    * each reduce task merges its keys in a local hash map, exactly the
    * reference's reducer shape (`test.go:51,58-65`). The map side
    * pre-merges per partition first (the in-mapper combine of
    * `test.go:15`), so the shuffle carries one pair per (partition,
    * key). Per-task state is one (K, V) per distinct key in the task —
    * the reference's unbounded-reducer-map semantics; for
    * spill-managed aggregation use `groupByKey`/`Aggregator` instead.
    * K needs value-based equals/hashCode consistent with its encoded
    * form (primitives, String, case classes thereof — NOT JVM arrays,
    * whose equality is by reference). */
  def mapReduce[K, V](records: org.apache.spark.sql.Dataset[String], r: Int,
                      mapFn: String => IterableOnce[(K, V)],
                      reduceFn: (V, V) => V)(
      implicit ke: org.apache.spark.sql.Encoder[(K, V)]): org.apache.spark.sql.Dataset[(K, V)] = {
    def mergePartition(it: Iterator[(K, V)]): Iterator[(K, V)] = {
      val m = scala.collection.mutable.HashMap.empty[K, V]
      it.foreach { case (k, v) =>
        m.update(k, m.get(k) match { case Some(a) => reduceFn(a, v); case None => v })
      }
      m.iterator
    }
    val combined = records.mapPartitions(it => mergePartition(it.flatMap(mapFn)))(ke)
    val shuffled =
      if (r > 0) combined.repartition(r, col("_1"))
      else combined.repartition(col("_1"))
    shuffled.mapPartitions(mergePartition)(ke)
  }

  /** U3 stretch (q_udtf_native): the same expansion as a native Catalyst
    * [[Generator]] — planner-placed `GenerateExec` in the scan stage, no
    * typed encoder round-trip. Same oracle as `bigramCounts`. */
  def bigramCountsNative(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(Bigrams.bigrams(col("text")).as("bigram"))
      .groupBy("bigram")
      .agg(count(lit(1)).as("cnt"))

  /** q_cogroup: the two-input reduce — `Dataset.cogroup` hands BOTH
    * sides' rows for one key to a single user function, the typed
    * generalization of the reference's reducer to heterogeneous
    * tagged inputs (the classic MapReduce reduce-side-join formulation,
    * done natively instead of by tagging). Here: orders ⊞ lineitem per
    * orderkey → one reconciliation row — order count, line count,
    * total line quantity — INCLUDING keys present on only one side
    * (the rows an inner join silently drops and an outer join
    * null-pads; cogroup makes the asymmetry explicit user logic).
    *
    * Shape at scale: one hash shuffle per side on the key — same
    * exchanges as a shuffle join — but the per-key merge materializes
    * no join product (m·n pair rows never exist, only the two input
    * iterators). The honest cost: typed iterators deserialize to JVM
    * objects, outside whole-stage codegen — so this surface is for
    * logic a declarative join/agg genuinely can't express (multi-pass
    * per-key state machines, asymmetric validation); for plain
    * aggregate-then-join semantics the declarative form wins (see
    * `Joins.outerJoin`). Sums are Long — iterator order inside a group
    * is partition-arrival order (nondeterministic), and integer
    * addition doesn't care; a Double sum here would be a determinism
    * bug. */
  def cogroupReconcile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orders = Tables(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
      .as[(Long, Long)].groupByKey(_._1)
    val lines = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity").cast(LongType))
      .as[(Long, Long)].groupByKey(_._1)
    orders.cogroup(lines) { (key, os, ls) =>
      var nOrders = 0L
      os.foreach(_ => nOrders += 1L)
      var nLines = 0L
      var sumQty = 0L
      ls.foreach { case (_, q) => nLines += 1L; sumQty += q }
      Iterator((key, nOrders, nLines, sumQty,
        if (nOrders > 0L && nLines > 0L) "both"
        else if (nOrders > 0L) "order_only" else "lines_only"))
    }.toDF("o_orderkey", "n_orders", "n_lines", "sum_qty", "side")
  }
}
