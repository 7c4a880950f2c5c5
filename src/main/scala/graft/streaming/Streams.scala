package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Structured Streaming surface (SURVEY §2 B23–B25): tumbling, sliding
  * and session windows, watermarks, and stateful dedup over the `events`
  * table.
  *
  * The reference is batch-only; this is capability closure. Its
  * grounding: the master re-queues tasks on worker failure
  * (`/root/reference/mp/master.go:316,358`) giving at-least-once
  * delivery — exactly what `dropDuplicatesWithinWatermark` repairs.
  *
  * Harness: each query runs a REAL streaming query — `MemoryStream`
  * source fed in deterministic event-time order in `NumChunks`
  * micro-batches (plus a far-future sentinel that advances the watermark
  * so append mode flushes every real window), memory sink, then the sink
  * table is returned as a batch DataFrame. Because input arrives in
  * event-time order, nothing real is ever late, so the streaming result
  * equals the batch aggregation — which is what the DuckDB oracle
  * checks. Late/out-of-order behavior (actual drops) is covered by
  * ScalaTest with crafted sequences, where a batch oracle cannot reach.
  *
  * Scale notes: state per key is bounded by the watermark horizon;
  * micro-batch shuffles use the session's partitioning; nothing here
  * collects payloads to the driver except this local test harness's
  * source feed (a production job swaps MemoryStream for Kafka/files —
  * the query definitions are unchanged).
  */
object Streams {

  case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                event_type: String, value: Double)

  /** Feed batches per query: 2 real chunks + the sentinel ⇒ 3+ micro
    * batches — enough to exercise cross-batch state and watermark
    * advancement while keeping the per-micro-batch fixed cost (~1.5 s
    * state-commit + job overhead at local[32]) off the bench's critical
    * path; late/out-of-order semantics are ScalaTest territory. */
  val NumChunks = 2
  private val Sentinel = "__sentinel"

  /** Load events as typed rows sorted by event time. */
  private def loadSorted(spark: SparkSession, dir: String): Array[Ev] = {
    import spark.implicits._
    Tables(spark, dir, "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .as[Ev].collect().sortBy(e => (e.ts.getTime, e.event_id))
  }

  /** Run `build` as a streaming query over the chunked feed; returns the
    * materialized sink rows (sentinel rows filtered by the caller's
    * projection where relevant). */
  private def run(spark: SparkSession, chunks: Seq[Seq[Ev]],
                  build: Dataset[Ev] => DataFrame): DataFrame = {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[Ev]
    val sinkName = "graft_sink_" + java.util.UUID.randomUUID().toString.replace("-", "")
    // State partition count is frozen at query start from
    // spark.sql.shuffle.partitions. Micro-batches here are small, and
    // every batch (including empty watermark-advance batches) pays
    // per-partition task + state-commit overhead across 3 stateful
    // stages — 8 partitions cuts that ~4× at local scale. A production
    // job sizes this to state volume, not to the batch.
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val q =
      try build(source.toDS())
        .writeStream.format("memory").queryName(sinkName).outputMode("append")
        .start()
      finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    try {
      chunks.foreach { c => source.addData(c); q.processAllAvailable() }
    } finally q.stop()
    val out = spark.table(sinkName)
    val rows = out.collect()
    val df = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](java.util.Arrays.asList(rows: _*)),
      out.schema)
    spark.catalog.dropTempView(sinkName)
    df
  }

  private def chunked(evs: Array[Ev]): Seq[Seq[Ev]] = {
    val n = math.max(1, math.ceil(evs.length.toDouble / NumChunks).toInt)
    // Far enough ahead that watermark (= sentinel − max delay, 10 min)
    // passes every real window's END, including the last session's
    // last-event + 5 min gap. An empty table still feeds the sentinel so
    // every query yields an empty result WITH its schema (not a crash).
    val lastMs = if (evs.isEmpty) 0L else evs.last.ts.getTime
    val sentinel = Ev(-1L,
      new java.sql.Timestamp(lastMs + 30 * 60 * 1000L), -1L, Sentinel, 0.0)
    evs.grouped(n).map(_.toSeq).toSeq :+ Seq(sentinel)
  }

  /** B23 q_stream_tumbling: per-minute tumbling count + value sum per
    * event type, 2-minute watermark, append mode. */
  def tumbling(spark: SparkSession, dir: String): DataFrame = {
    val evs = loadSorted(spark, dir)
    run(spark, chunked(evs), ds =>
      ds.withWatermark("ts", "2 minutes")
        .groupBy(window(col("ts"), "1 minute"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sval"))
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("wstart"),
          col("event_type"), col("cnt"), col("sval")))
      .where(col("event_type") =!= Sentinel)
  }

  /** B24a q_stream_sliding: 2-minute windows sliding by 1 minute. */
  def sliding(spark: SparkSession, dir: String): DataFrame = {
    val evs = loadSorted(spark, dir)
    run(spark, chunked(evs), ds =>
      ds.withWatermark("ts", "2 minutes")
        .groupBy(window(col("ts"), "2 minutes", "1 minute"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("wstart"),
          col("event_type"), col("cnt")))
      .where(col("event_type") =!= Sentinel)
  }

  /** B24b q_stream_session: 5-minute-gap session windows per user
    * (session end = last event + gap, end-exclusive merge). */
  def session(spark: SparkSession, dir: String): DataFrame = {
    val evs = loadSorted(spark, dir)
    run(spark, chunked(evs), ds =>
      ds.withWatermark("ts", "10 minutes")
        .groupBy(session_window(col("ts"), "5 minutes"), col("user_id"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("user_id"),
          date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("s_start"),
          date_format(col("session_window.end"), "yyyy-MM-dd HH:mm:ss").as("s_end"),
          col("cnt")))
      .where(col("user_id") =!= -1L)
  }

  /** Stream-stream interval join (q_stream_join): each purchase joined
    * to the same user's clicks in the preceding 10 minutes. Both sides
    * carry watermarks and the join condition bounds event-time distance,
    * so join state is evicted as the watermark advances — the canonical
    * bounded-state stream-stream join. Inner append-mode emissions equal
    * the batch interval join, which is what the oracle checks. */
  def streamJoin(spark: SparkSession, dir: String): DataFrame = {
    val evs = loadSorted(spark, dir)
    run(spark, chunked(evs), ds => {
      val clicks = ds.where(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("c_uid"),
          col("ts").as("c_ts"))
        .withWatermark("c_ts", "2 minutes")
      val purchases = ds.where(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id").as("p_uid"),
          col("ts").as("p_ts"))
        .withWatermark("p_ts", "2 minutes")
      purchases.join(clicks,
        col("p_uid") === col("c_uid") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 10 MINUTES") &&
          col("c_ts") <= col("p_ts"))
        .select(col("purchase_id"), col("click_id"), col("p_uid").as("user_id"))
    })
  }

  /** Custom keyed state beyond the built-ins (B25's
    * `flatMapGroupsWithState` path): a per-user running event counter
    * with an event-time timeout — the shape for arbitrary user state
    * machines (sessionization with custom logic, CDC upserts, feature
    * accumulation). Emits one (user_id, running count, batch count) row
    * per user per micro-batch. Used by StreamingSpec; not a driver query
    * (incremental emissions have no batch-SQL equivalent). */
  def userCounter(spark: SparkSession, events: Dataset[Ev]): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, (Long, Long, Int)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, rows: Iterator[Ev], state: GroupState[Long]) =>
          val batch = rows.size
          val total = state.getOption.getOrElse(0L) + batch
          state.update(total)
          state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 60 * 60 * 1000L)
          Iterator((uid, total, batch))
      }
      .toDF("user_id", "total_events", "batch_events")
  }

  /** B25 q_stream_dedup: stateful dedup on event_id within the
    * watermark. The feed appends a final chunk that re-sends the tail of
    * the stream (duplicates within the watermark horizon) — all are
    * suppressed, so the output equals the original distinct stream. */
  def dedup(spark: SparkSession, dir: String): DataFrame = {
    val evs = loadSorted(spark, dir)
    val base = chunked(evs)
    // re-send the last 100 real events (still within the 10-min
    // watermark at sentinel time? no — within watermark at re-send time:
    // insert dupes BEFORE the sentinel chunk)
    val dupes = evs.takeRight(100).toSeq
    val chunks = base.init :+ dupes :+ base.last
    run(spark, chunks, ds =>
      ds.withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark("event_id")
        .select(col("event_id"), col("event_type")))
      .where(col("event_type") =!= Sentinel)
      .select(col("event_id"))
  }
}
