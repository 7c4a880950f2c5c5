package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Incremental aggregate maintenance (q_incr_agg): a persisted
  * partial-aggregate state merged with an append batch — the
  * materialized-view-maintenance shape that completes graft's
  * incremental family (q_dedup_append maintains the dup graph,
  * q_simsearch_ivf_append the ANN index, this the rollup itself).
  *
  * Reference grounding: the reference's whole pipeline is one batch
  * word-count (`/root/reference/test.go:13-81`) — rerun from scratch
  * per corpus version. The incremental form is the same partial/final
  * aggregation split the reference's combiner implements per task
  * (`mp/worker.go`), persisted ACROSS runs: commutative partials
  * (sum/count over exact integer cents) are stored per group, an
  * appended batch contributes only ITS partials, and the merge is a
  * groups-sized re-aggregation.
  *
  * 100 TB story: the refreshed rollup costs |delta| scan + |groups|
  * state rows — never a base-fact re-scan. The state artifact is the
  * aggregate itself (months × statuses: thousands of rows at any
  * corpus size), so the merge job is trivially small; the delta scan
  * carries a pushed `o_orderdate >= cut` predicate so parquet
  * row-group stats skip the historical files entirely (the spec
  * asserts both properties on the executed plan).
  *
  * Exactness: partials are BIGINT cent sums and counts (the proven
  * `round(x*100) AS BIGINT` convention) — associative and
  * commutative, so state ∪ delta re-aggregated is bit-identical to
  * the full recompute the DuckDB oracle runs.
  */
object Incremental {

  /** The append window: orders dated within this many days of the
    * corpus max arrive "late" — the state genuinely never sees them
    * (the stagedBandIndex / stagedAppendedIndex arrival convention,
    * expressed in event time as a warehouse rollup would). */
  val DeltaDays = 90

  private val stateCache =
    new scala.collection.concurrent.TrieMap[(String, String), (String, java.sql.Timestamp)]()

  def clearAggStateCache(): Unit = stateCache.clear()

  /** Monthly (month, o_orderstatus) partials over `df`: exact cent
    * sums + counts. ONE definition feeds state staging, the delta
    * batch, and the merge, so the partial shape cannot drift. */
  private def partials(df: DataFrame): DataFrame =
    df.groupBy(
        to_date(date_trunc("month", col("o_orderdate"))).as("month"),
        col("o_orderstatus"))
      .agg(
        sum(round(col("o_totalprice") * 100).cast("long")).as("total_cents"),
        count(lit(1)).as("cnt"))

  /** Staged partial-aggregate state for the base slice (orders older
    * than max(o_orderdate) − [[DeltaDays]]), memoized per (dir, data
    * fingerprint); returns (root, cut). Staging cost is one base scan,
    * paid once per corpus version and amortized over every refresh —
    * exactly the index-staging contract of the other incremental
    * operators. */
  private[graft] def stagedAggState(spark: SparkSession, dir: String): (String, java.sql.Timestamp) =
    stateCache.getOrElseUpdate((dir, graft.Fs.tableFingerprint(dir, "orders")), {
      val orders = Tables(spark, dir, "orders")
      val maxD = orders.agg(max("o_orderdate")).head().getTimestamp(0) // 1 driver row
      val cut = java.sql.Timestamp.valueOf(
        maxD.toLocalDateTime.minusDays(DeltaDays.toLong))
      val root = graft.Engine.workDir("graft-aggstate-").getAbsolutePath
      partials(orders.where(col("o_orderdate") < lit(cut)))
        .write.mode("overwrite").parquet(s"$root/state")
      (root, cut)
    })

  /** State ∪ delta partials, re-aggregated — ONE body serves the read
    * path ([[incrAgg]]) and the state-update path ([[advanceState]]),
    * so the two can never drift. */
  private def merged(spark: SparkSession, statePath: String,
                     delta: DataFrame): DataFrame =
    foldBatch(spark.read.parquet(statePath), delta)

  private def deltaRows(spark: SparkSession, dir: String,
                        cut: java.sql.Timestamp): DataFrame =
    Tables(spark, dir, "orders").where(col("o_orderdate") >= lit(cut))

  /** q_incr_agg: the maintained rollup — persisted state ∪ the append
    * batch's partials, re-aggregated. Equal to the full group-by
    * bit-for-bit (BIGINT partials), which is what the oracle checks;
    * the PLAN is what the operator is about: the only orders scan
    * carries the pushed delta predicate. */
  def incrAgg(spark: SparkSession, dir: String): DataFrame = {
    val (root, cut) = stagedAggState(spark, dir)
    merged(spark, s"$root/state", deltaRows(spark, dir, cut))
  }

  /** One state-fold generation over arbitrary frames: current state
    * (at final grain) ∪ the batch's partials, re-aggregated. Exposed
    * for the multi-generation spec: partials are associative AND the
    * fold is, so state·D1 then ·D2 ≡ state·(D1∪D2) ≡ full recompute —
    * the property that makes arbitrary refresh cadences safe. */
  private[graft] def foldBatch(state: DataFrame, batch: DataFrame): DataFrame =
    state.unionByName(partials(batch))
      .groupBy("month", "o_orderstatus")
      .agg(sum("total_cents").as("total_cents"), sum("cnt").as("cnt"))

  /** The state-UPDATE half of the maintenance cycle: fold the append
    * batch into the persisted state and publish the advanced state
    * (stage-and-swap into a sibling path — readers of the old state
    * are never torn). Same merged body as the read path, so the
    * advance also never re-scans base facts; after it, the rollup is
    * servable from the state artifact alone. Returns the advanced
    * state's path. */
  private[graft] def advanceState(spark: SparkSession, dir: String): String = {
    val (root, cut) = stagedAggState(spark, dir)
    val next = s"$root/state_advanced"
    merged(spark, s"$root/state", deltaRows(spark, dir, cut))
      .write.mode("overwrite").parquet(next)
    next
  }
}
