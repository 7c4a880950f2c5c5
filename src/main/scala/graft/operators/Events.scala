package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Event-log analytics over the `events` table: conversion funnels and
  * cohort retention — the product-analytics counterpart of `Windows.
  * sessionize` (SURVEY §2 capability closure; the reference's model
  * covers these as chained Map/Reduce passes keyed on the user,
  * `/root/reference/mp/worker.go:14-17`).
  *
  * Both operators are chains of aggregations and joins KEYED ON
  * user_id — every shuffle is user-keyed, per-user state is O(1)
  * (first/min timestamps), and no step sorts anything globally, so the
  * shape survives a 100 TB event log with billions of users. Timestamps
  * are truncated to microseconds on both engines (the events fixture is
  * nanosecond-precision parquet; Spark reads microseconds) so threshold
  * comparisons agree exactly.
  */
object Events {

  /** Ordered conversion funnel view → click → purchase: a user counts
    * for step k only with an event of step k's type AT OR AFTER their
    * earliest qualifying step-(k−1) event (the standard ordered-funnel
    * semantics: min-timestamp chaining, one row per user per step).
    * Each stage is `groupBy(user).min(ts)` then an equi-join back to
    * the (already user-keyed) event scan — partial/final agg, no
    * windows, no self-join explosion. Output: one row per step with
    * the surviving-user count (monotone non-increasing by design). */
  def funnel(spark: SparkSession, dir: String): DataFrame =
    funnel(Tables(spark, dir, "events"), Seq("view", "click", "purchase"))

  /** df form: expects (user_id: Long, event_type: String,
    * ts: Timestamp). */
  def funnel(events: DataFrame, steps: Seq[String]): DataFrame = {
    val e = events.select(col("user_id"), col("event_type"),
      date_trunc("microsecond", col("ts")).as("ts"))
    val stageUsers = steps.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (step, _)) =>
        val candidates = e.where(col("event_type") === step)
        val gated = prev match {
          case None => candidates
          case Some(p) =>
            candidates.join(p.select(col("user_id"), col("t_prev")), "user_id")
              .where(col("ts") >= col("t_prev"))
        }
        Some(gated.groupBy("user_id").agg(min(col("ts")).as("t_prev")))
    }.flatten
    steps.zip(stageUsers).zipWithIndex.map { case ((step, users), i) =>
      users.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1L).as("step_idx"), lit(step).as("step"), col("n_users"))
    }.reduce(_ unionAll _)
  }

  /** Cohort retention matrix: users grouped by their FIRST-event week,
    * tracked by activity in each subsequent week — the
    * churn/stickiness table behind every retention curve. Weeks are
    * user-relative day-offset weeks (`(day − cohort_day) div 7`), not
    * calendar weeks: integer day arithmetic is engine-exact and the
    * "week 0 = your own first week" convention is the one retention
    * curves actually want. Two user-keyed shuffles (first-touch agg,
    * join back) + one cohort-keyed agg; `n_users` is exact distinct —
    * at extreme cohort widths the scale path is the same query with
    * `approx_count_distinct`. */
  def cohort(spark: SparkSession, dir: String): DataFrame =
    cohort(Tables(spark, dir, "events"))

  /** df form: expects (user_id: Long, ts: Timestamp). */
  def cohort(events: DataFrame): DataFrame = {
    val e = events.select(col("user_id"),
      datediff(to_date(col("ts")), lit("1970-01-01")).cast("long").as("day"))
    val first = e.groupBy("user_id").agg(min("day").as("cohort_day"))
    e.join(first, "user_id")
      .groupBy(
        expr("cohort_day div 7").as("cohort_wk"),
        expr("(day - cohort_day) div 7").as("age_wk"))
      .agg(
        countDistinct("user_id").as("n_users"),
        count(lit(1)).as("n_events"))
  }

  /** q_sequence: first-order event-type transition counts (the Markov
    * / clickstream-mining primitive): each user's event stream in
    * (ts, event_id) order yields adjacent (prev → next) type pairs,
    * counted globally with the distinct users exhibiting each
    * transition. Where q_funnel asks "how many users completed the
    * ordered path", this asks "what paths exist" — the exploratory
    * twin.
    *
    * One user-keyed shuffle for the lag window (per-user partitions —
    * event logs shard naturally by user, never a global sort), then a
    * wordcount-shaped agg over ≤ |types|² keys. The (ts, event_id)
    * tie-break makes same-instant events deterministic. */
  def transitions(spark: SparkSession, dir: String): DataFrame =
    transitions(Tables(spark, dir, "events"))

  /** df form: expects (user_id: Long, event_id: Long,
    * event_type: String, ts: Timestamp). */
  def transitions(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("event_id"),
        date_trunc("microsecond", col("ts")).as("ts"), col("event_type"))
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .where(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("cnt"),
        countDistinct("user_id").as("n_users"))
  }

  /** q_ohlc: time-series resampling to 5-minute OHLC bars per event
    * type — the downsampling primitive of metric/market pipelines
    * (billions of ticks → bounded bar table). Open/close are
    * `min_by`/`max_by` over the total (ts, event_id) order — ONE
    * partial/final aggregate: a bar with 10⁹ ticks shuffles one
    * candidate per input partition, never a per-bar sort (the window
    * formulation would). High/low/count are order-free; only the
    * volume sum needs the rounding convention. Bar id = exact integer
    * floor of epoch-micros to 5 minutes (cross-engine integer parity,
    * the sessionize pattern). */
  def ohlcBars(spark: SparkSession, dir: String): DataFrame =
    ohlcBars(Tables(spark, dir, "events"))

  /** df form: expects (ts: Timestamp, event_id: Long, event_type:
    * String, value: Double). */
  def ohlcBars(events: DataFrame): DataFrame =
    events
      // floor alignment via x - pmod(x, n): Spark's DIV truncates toward
      // zero but DuckDB's // floors, so pre-epoch (negative-micros) bars
      // would diverge; pmod is always non-negative, making this a true
      // floor multiple on both engines for all event times
      .withColumn("bar_start",
        expr("unix_micros(ts) - pmod(unix_micros(ts), 300000000)"))
      .groupBy(col("bar_start"), col("event_type"))
      .agg(
        min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"),
        count(lit(1)).as("n_ticks"),
        // integer-cents accumulation: BIGINT sums are reassociation-proof,
        // so parity cannot flake when a bar's double sum straddles a
        // half-cent rounding boundary (same convention as kmeans/mad)
        (sum(round(col("value") * 100).cast("long")) / 100.0).as("volume"))

  /** Anomalies need this many PRIOR observations before any flag can
    * fire (the classic small-sample guard — prospective z-scores on a
    * handful of points are noise). */
  val AnomMinPrior = 30

  /** |z| threshold, squared (3σ → 9). */
  val AnomZSq = 9

  /** q_anomaly: prospective 3σ outlier detection per event type — each
    * event is judged against the running mean/variance of STRICTLY
    * EARLIER events of its type (the online monitoring semantics: a
    * detector deployed at time t knows only the past; judging against
    * full-corpus statistics would leak the future into every verdict,
    * and a level shift would flag the entire pre-shift history instead
    * of the first shifted points).
    *
    * All-integer decision: values are exact cents (the engine's money
    * convention), prior state is (n, S = Σx, S2 = Σx²) — associative
    * BIGINT sums — and the flag is
    *   n ≥ [[AnomMinPrior]]  AND  (n·x − S)² > [[AnomZSq]]·(n·S2 − S²)
    * (the z² > 9 test cleared of its two divisions). The squares are
    * evaluated in DECIMAL(38,0) (HUGEINT on the oracle side): exact
    * integers on both engines, so the boolean is bit-stable. BIGINT
    * would overflow at (n·x)² once n·x > 3·10⁹ (≈ 10⁵ events/type at
    * these cent magnitudes) — the 128-bit path is exact to n·x < 10¹⁹,
    * past any realistic per-type volume.
    *
    * Shape at scale: one shuffle to (event_type) — the prefix scan is
    * a per-type window in (ts, event_id) order. Types parallelize;
    * within a type the scan is inherently sequential (each verdict
    * depends on every prior event). A 10⁹-row single type would make
    * its partition the straggler: that case is exactly
    * [[graft.streaming.Streams.streamAnomaly]] — the same fold carried
    * as O(1) state per type across micro-batches, never re-sorted. */
  def anomalies(spark: SparkSession, dir: String): DataFrame =
    anomalies(Tables(spark, dir, "events"))

  /** df form: expects (event_id, ts, event_type, value); NULL values
    * carry no cents and are excluded. */
  def anomalies(events: DataFrame): DataFrame = {
    val e = events.where(col("value").isNotNull)
      .select(col("event_id"), col("ts"), col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    e.withColumn("n_prior", count(col("cents")).over(w))
      .withColumn("s", coalesce(sum(col("cents")).over(w), lit(0L)))
      .withColumn("s2",
        coalesce(sum(col("cents") * col("cents")).over(w), lit(0L)))
      .select(col("event_id"), col("event_type"), col("cents"), col("n_prior"),
        anomalyFlag(col("n_prior"), col("cents"), col("s"), col("s2"))
          .as("is_anomaly"))
  }

  /** The shared flag predicate over exact-integer prior state —
    * DECIMAL(38,0) squares (see [[anomalies]]); used by both the batch
    * window form and the streaming per-batch fold so the two can never
    * drift. */
  private[graft] def anomalyFlag(n: org.apache.spark.sql.Column,
                                 x: org.apache.spark.sql.Column,
                                 s: org.apache.spark.sql.Column,
                                 s2: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val d = "decimal(38,0)"
    val dev = (n.cast(d) * x.cast(d)) - s.cast(d)
    val varN2 = (n.cast(d) * s2.cast(d)) - (s.cast(d) * s.cast(d))
    (n >= AnomMinPrior.toLong) && (dev * dev > lit(AnomZSq).cast(d) * varN2)
  }
}
