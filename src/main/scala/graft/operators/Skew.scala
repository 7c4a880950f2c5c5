package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Skew mitigation for shuffle joins (100 TB design point).
  *
  * When one join key holds a disproportionate share of the fact side
  * (hot customers, null-ish defaults), a plain shuffle join lands the
  * whole hot key in one reducer. Two remedies, in preference order:
  *
  *  1. AQE skew-join splitting (`spark.sql.adaptive.skewJoin.*`, on by
  *     default in Engine) — runtime re-planning, zero code.
  *  2. Explicit salting (this utility) for engines/paths AQE cannot
  *     rewrite (e.g. aggregations over a hot key, or deterministic
  *     pre-partitioned pipelines): the fact side gets a salt in
  *     [0, salts), the dim side is replicated `salts` ways, and the join
  *     key becomes (key, salt) — the hot key now spreads across `salts`
  *     reducers. Row multiplication is confined to the SMALL side.
  */
object Skew {

  /** Inner equi-join with fact-side salting: semantically identical to
    * `fact.join(dim, key)`, physically spread over `salts` sub-keys.
    * The salt is derived from the fact row's own key + a fast hash of
    * the partition-local row id, deterministic per task attempt. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(salts)))
    val saltedDim = dim
      .withColumn("__salt", explode(expr(s"sequence(0, ${salts - 1})")))
      .withColumn("__salt", col("__salt").cast("bigint"))
    saltedFact.join(saltedDim, Seq(key, "__salt"), "inner").drop("__salt")
  }

  /** Two-phase aggregation for a skewed group key: partial-aggregate on
    * (key, salt) first — hot keys combine in parallel — then finish on
    * key. `aggs` must be algebraic (sum/count/min/max); this is the
    * manual form of what HashAggregate's partial/final split does per
    * partition, pushed one level further for extreme key skew. */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String, salts: Int): DataFrame =
    df.withColumn("__salt",
        pmod(xxhash64(col(key), monotonically_increasing_id()), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(valueCol).as("__s"), count(lit(1)).as("__c"))
      .groupBy(col(key))
      .agg(sum("__s").as(s"sum_$valueCol"), sum("__c").as("cnt"))

  /** q_skew_agg: per-supplier quantity totals via the salted two-phase
    * aggregation — oracle-checked against the plain GROUP BY (they are
    * semantically identical; `l_quantity` is integer-valued so the
    * salted re-associated double sum is exact). */
  def skewedAgg(spark: SparkSession, dir: String): DataFrame =
    saltedSumCount(Tables(spark, dir, "lineitem"), "l_suppkey", "l_quantity", 8)
      .select(col("l_suppkey"), round(col("sum_l_quantity"), 2).as("sum_qty"),
        col("cnt"))

  /** q_skew_join: per-nation quantity rollup with the fact⋈dim join
    * routed through `saltedJoin` — oracle-checked against the plain
    * join (the salt is a physical-distribution detail; every fact row
    * still meets exactly its one dim row, so the result set is
    * identical and the integer-valued double sum is order-exact). */
  def skewedJoin(spark: SparkSession, dir: String): DataFrame = {
    val fact = Tables(spark, dir, "lineitem")
      .select(col("l_suppkey").as("s_suppkey"), col("l_quantity"))
    val dim = Tables(spark, dir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey").cast("long").as("s_nationkey"))
    saltedJoin(fact, dim, "s_suppkey", 8)
      .groupBy("s_nationkey")
      .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("cnt"))
  }
}
