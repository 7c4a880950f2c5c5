package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** KMV (k-minimum-values) distinct-value synopses over the event log —
  * Beyer, Haas, Reinwald, Sismanis & Gemulla, "On synopses for
  * distinct-value estimation under multiset operations" (SIGMOD 2007);
  * the k-th-minimum estimator goes back to Bar-Yossef et al.
  * (RANDOM 2002). The sketch the HLL family (q_approx_distinct) can't
  * be: CLOSED UNDER SET OPERATIONS — two KMV sketches union into a
  * KMV sketch of the union, and intersection cardinality falls out of
  * the same k values — and fully DETERMINISTIC here (the hash is the
  * engine's md5-based 60-bit fold, no seeds, no randomness), so DuckDB
  * replays every estimate bit-for-bit: a hash-exact oracle over an
  * approximation algorithm.
  *
  * Shape at scale: the fold is [[graft.functions.MinKDistinctLongs]] —
  * ≤ K longs per (map partition, type) through the exchange, never the
  * value domain (the window/DISTINCT formulation would shuffle the
  * cardinality being estimated); the set-operation pass works on the
  * |types| × K sketch rows alone — corpus-free, pure array codegen.
  *
  * Exactness bands: est = (K−1)·2⁶⁰ div h_K is exact integer math in
  * DECIMAL(38,0) (HUGEINT in the oracle); a sketch smaller than K IS
  * the exact distinct count (fewer than K values ever hashed). The
  * estimate's statistical error is ~1/√(K−2) ≈ 13% at K = 64 —
  * spec-checked against exact counts on the fixture.
  */
object Sketches {

  /** Sketch capacity. 64 → ~13% relative error; a production sketch
    * sizes this up (state is K longs regardless of corpus size). */
  val KmvK = 64

  /** (K−1)·2⁶⁰ — the k-th-minimum estimator's numerator, exceeding
    * Long range, as the decimal literal both engines share. */
  val KmvNum = "72634054790231359488"

  /** The engine's 60-bit md5 hash fold of the user id (the
    * [[Dedup]] TokHashSql convention, applied to the id's decimal
    * string so both engines hash identical bytes). */
  private val UserHashSql =
    "cast(conv(substring(md5(cast(user_id as string)), 1, 15), 16, 10) as bigint)"

  /** Per-type KMV sketches: (event_type, sketch: Array[Long] ascending,
    * ≤ K unique smallest hashes). */
  private[graft] def kmvSketches(events: DataFrame): DataFrame = {
    val mk = udaf(new graft.functions.MinKDistinctLongs(KmvK),
      org.apache.spark.sql.Encoders.scalaLong)
    events
      .select(col("event_type"), expr(UserHashSql).as("h"))
      .groupBy("event_type")
      .agg(mk(col("h")).as("sketch"))
  }

  /** q_kmv_distinct: distinct users per event type, estimated from the
    * K smallest hash values alone. A sketch with fewer than K entries
    * is the exact count (every hashed value is present); otherwise
    * est = (K−1)·2⁶⁰ div h_K — one exact integer division. */
  def kmvDistinct(spark: SparkSession, dir: String): DataFrame =
    kmvDistinct(Tables(spark, dir, "events"))

  /** df form: expects (event_type: String, user_id: Long). */
  def kmvDistinct(events: DataFrame): DataFrame =
    kmvProject(kmvSketches(events))

  /** The estimate projection over (event_type, sketch) rows — shared
    * by the batch form and [[graft.streaming.Streams.streamKmv]]'s
    * final-state read, so the estimator cannot drift between them. */
  private[graft] def kmvProject(sk: DataFrame): DataFrame =
    sk.select(col("event_type"),
        size(col("sketch")).cast("long").as("n_sketch"),
        element_at(col("sketch"), size(col("sketch"))).as("kth_hash"))
      .withColumn("est_distinct",
        when(col("n_sketch") < KmvK.toLong, col("n_sketch"))
          .otherwise(expr(
            s"cast(cast('$KmvNum' as decimal(38,0)) div kth_hash as bigint)")))

  /** Sketch-merge fold over (event_type, sketch) rows from ANY mix of
    * partial sketches: explode back to values and re-run the same
    * bounded aggregator — min-k is associative and idempotent, so any
    * grouping of the input stream (micro-batches, overlapping replays)
    * lands on the identical sketch. */
  private[graft] def mergeSketches(sk: DataFrame): DataFrame = {
    val mk = udaf(new graft.functions.MinKDistinctLongs(KmvK),
      org.apache.spark.sql.Encoders.scalaLong)
    sk.select(col("event_type"), explode(col("sketch")).as("h"))
      .groupBy("event_type")
      .agg(mk(col("h")).as("sketch"))
  }

  /** q_kmv_ops: the closure property in action — per PAIR of event
    * types, the union and intersection of their user populations
    * estimated from the two K-long sketches alone (Beyer et al. §4):
    * the K smallest of (A ∪ B)'s hashes are computable from the two
    * sketches (array merge — corpus never re-read), the union estimate
    * is the same k-th-minimum form, and intersection rides the
    * Jaccard-style ratio est_inter = (matches · est_union) div k_eff,
    * matches = |union sketch ∩ A sketch ∩ B sketch|. All array codegen
    * over |types|² ÷ 2 rows. */
  def kmvOps(spark: SparkSession, dir: String): DataFrame =
    kmvOps(Tables(spark, dir, "events"))

  /** df form: expects (event_type: String, user_id: Long). */
  def kmvOps(events: DataFrame): DataFrame = {
    val sk = kmvSketches(events)
    val pairs = sk.as("a").join(sk.as("b"),
        col("a.event_type") < col("b.event_type"))
      .select(col("a.event_type").as("ta"), col("b.event_type").as("tb"),
        col("a.sketch").as("sa"), col("b.sketch").as("sb"))
    pairs
      // K smallest of the union's hash set, from the sketches alone
      .withColumn("u",
        expr(s"slice(array_sort(array_union(sa, sb)), 1, $KmvK)"))
      .withColumn("k_eff", size(col("u")).cast("long"))
      .withColumn("matches",
        expr("cast(size(filter(u, h -> array_contains(sa, h) " +
          "and array_contains(sb, h))) as bigint)"))
      .withColumn("est_union",
        when(col("k_eff") < KmvK.toLong, col("k_eff"))
          .otherwise(expr(s"cast(cast('$KmvNum' as decimal(38,0)) " +
            s"div element_at(u, $KmvK) as bigint)")))
      .withColumn("est_inter",
        when(col("k_eff") === 0L, 0L)
          .otherwise(expr("(matches * est_union) div k_eff")))
      .select(col("ta"), col("tb"), col("k_eff"), col("matches"),
        col("est_union"), col("est_inter"))
  }
}
