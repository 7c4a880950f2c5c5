package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.sources.Tables

/** Window-function surface (SURVEY §2 B11–B12).
  *
  * Reference grounding: pure capability closure — the reference's
  * Map/Reduce model expresses "per-key ordered scan" as a reducer that
  * sorts its partition in memory (`/root/reference/mp/worker.go:17`);
  * Spark's `Window` is the declarative form with managed spilling.
  *
  * Scale notes: both queries shuffle once on the partition key and sort
  * within partitions (ExternalSorter spills, no OOM at wide customers).
  * Rank-filter (rn ≤ 3) is applied immediately after the window so only
  * top rows survive to the output projection.
  */
object Windows {

  /** B11 q_window_rank: top-3 orders per customer by price, fully
    * tie-broken by orderkey so ranks are deterministic. */
  def rankTopN(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    Tables(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w).cast(LongType))
      .where(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("price"), col("rn"))
  }

  /** B11b q_window_dist: distribution window family — quartile bucket,
    * percent_rank and cume_dist of each order's price within its
    * customer. Rank ties broken by orderkey for ntile determinism;
    * percent_rank/cume_dist are rational (k-1)/(n-1), k/n divisions of
    * identical ints in both engines → bit-identical doubles. */
  def distWindows(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("quartile", ntile(4).over(w).cast(LongType))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .select(col("o_custkey"), col("o_orderkey"), col("quartile"),
        col("pct_rank"), col("cume"))
  }

  /** B12c q_window_value: value-picking window family — first/last/nth
    * order per customer over the full partition frame plus `lead`.
    * Fully tie-broken ordering (date, then key) so every picked value is
    * deterministic; last_value/nth_value need the explicit unbounded
    * frame (the default frame stops at CURRENT ROW). */
  def valueWindows(spark: SparkSession, dir: String): DataFrame = {
    val ord = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val full = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
      .withColumn("first_ok", first("o_orderkey").over(full))
      .withColumn("last_ok", last("o_orderkey").over(full))
      .withColumn("second_ok", nth_value(col("o_orderkey"), 2).over(full))
      .withColumn("next_ok", lead("o_orderkey", 1).over(ord))
      .select(col("o_custkey"), col("o_orderkey"), col("first_ok"),
        col("last_ok"), col("second_ok"), col("next_ok"))
  }

  /** B12b q_window_range: RANGE-frame window — trailing-30-day revenue
    * per customer. The frame is value-based (all orders whose date falls
    * in [current − 30 d, current]), so date ties are peers and the sum
    * is deterministic without a tie-break; Spark's numeric
    * `rangeBetween(-30, 0)` over epoch-days ≡ the oracle's
    * `RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW`. */
  def rangeFrame(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("od"))
      .rangeBetween(-30, 0)
    Tables(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"))
      .withColumn("od", datediff(col("o_orderdate"), lit("1970-01-01")))
      .withColumn("rev30d", round(sum("o_totalprice").over(w), 2))
      .select(col("o_custkey"), col("o_orderkey"), col("rev30d"))
  }

  /** q_sessionize: BATCH sessionization — the gap-and-islands
    * composition (lag → break flag → running-sum session index →
    * per-session rollup), the offline twin of `Streams.session`'s
    * `session_window`. A new session starts when the gap to the previous
    * event STRICTLY exceeds `gapMicros` (an event at exactly prev + gap
    * extends the session — matching Spark's streaming session-window
    * merge rule, pinned by StreamingSpec). Events order by (ts,
    * event_id): a total order, so the session index is deterministic in
    * both engines. Both windows partition by user_id — per-user event
    * counts are bounded (human-scale activity), so no skew hazard; a
    * pathological key would use the two-pass bucketed prefix-sum shape
    * proven by `Pipeline.packTokens`. */
  def sessionize(spark: SparkSession, dir: String): DataFrame =
    sessionize(Tables(spark, dir, "events"), 5L * 60 * 1000000)

  /** df form: expects (user_id, ts: Timestamp, event_id, value). */
  def sessionize(events: DataFrame, gapMicros: Long): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("brk",
        when(lag(col("ts"), 1).over(w).isNull ||
          unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))
            > gapMicros, 1L).otherwise(0L))
      .withColumn("sid", sum("brk").over(run))
      .groupBy("user_id", "sid")
      // session start as epoch micros (integer cross-engine parity —
      // no timezone/format dependence in the comparison)
      .agg(unix_micros(min(col("ts"))).as("start_us"),
        count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_v"))
      .select("user_id", "sid", "start_us", "n_events", "sum_v")
  }

  /** q_fill_forward: last-observation-carried-forward per entity — the
    * as-of feature-propagation primitive of a training pipeline (every
    * event decorated with the user's most recent purchase amount, NULL
    * until their first purchase). `last_value(..., ignoreNulls)` over
    * the per-user unbounded-preceding frame: user-keyed shuffle, per-
    * user sort, O(1) state per row — the same scale shape as every
    * window here (a global time-spine ffill would be a SinglePartition
    * sort; per-entity is the form that parallelizes). Carried values
    * are raw column data (no arithmetic) → exact parity. */
  def fillForward(spark: SparkSession, dir: String): DataFrame =
    fillForward(Tables(spark, dir, "events"))

  /** df form: expects (user_id, event_id, ts: Timestamp, event_type,
    * value). */
  def fillForward(events: DataFrame): DataFrame = {
    // ordering by the epoch-micros projection ≡ ordering by ts (micros
    // is what Spark holds); keeps the window after the narrow projection
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col("user_id"), col("event_id"),
        unix_micros(date_trunc("microsecond", col("ts"))).as("ts_us"),
        col("event_type"), col("value"))
      .withColumn("last_purchase",
        last(when(col("event_type") === "purchase", col("value")),
          ignoreNulls = true).over(w))
      .select("user_id", "event_id", "ts_us", "last_purchase")
  }

  /** B12 q_window_running: running revenue per customer in order-date
    * order (unbounded-preceding frame) + `lag` of the previous price. */
  def runningTotal(spark: SparkSession, dir: String): DataFrame = {
    val ord = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val frame = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"))
      .withColumn("run_rev", round(sum("o_totalprice").over(frame), 2))
      .withColumn("prev_price", round(lag("o_totalprice", 1).over(ord), 2))
      .select(col("o_custkey"), col("o_orderkey"), col("run_rev"),
        col("prev_price"))
  }
}
