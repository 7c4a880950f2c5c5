package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Model-evaluation statistics over the engine's own tables — the
  * "did the classifier/ranker work" half every training pipeline needs
  * beside its data-prep half (AUC here, the kNN classifier in
  * [[Similarity.knnClassify]], chi² feature selection in
  * [[TextOps.chi2Terms]]).
  *
  * Everything here is EXACT integer rank statistics folded by
  * partial/final aggregation, with at most one double division at the
  * end — the same cross-engine-parity discipline as the linreg/BM25
  * families: no libm calls, no order-dependent float sums, so the
  * DuckDB oracle hash-matches bit-for-bit.
  */
object Evaluation {

  /** Range-bucket count for the two-pass prefix sum (a parallelism
    * knob, not data-dependent). */
  val AucBuckets = 32

  /** q_auc: exact tie-aware ROC-AUC of `value` as a one-vs-rest
    * classifier score for each event type — the Mann–Whitney U
    * statistic (Hanley & McNeil 1982): AUC = P(score⁺ > score⁻) +
    * ½·P(tie), computed from MIDRANKS so ties are handled exactly,
    * not approximately.
    *
    * All-integer decomposition (doubled to stay in BIGINT):
    * 2·S⁺ = Σ_v c⁺(v)·(2·minrank(v) + c(v) − 1) over distinct scores v
    * (c = score multiplicity, c⁺ = positives at that score), then
    * AUC = (2·S⁺ − n⁺(n⁺+1)) / (2·n⁺·n⁻) — one division of exact
    * BIGINTs. Scores are discretized to exact cents (round(value·100),
    * the engine's money convention) so "distinct score" means the same
    * thing in both engines.
    *
    * Shape at scale: one shuffle to (cents, type) partial/final counts
    * — rank work collapses from row count to SCORE-DOMAIN size before
    * anything is ordered. The prefix sum over distinct scores is the
    * classic two-pass range-partitioned scan ([[Pipeline.packTokens]]'s
    * pattern): per-bucket totals → ≤ [[AucBuckets]]-row driver ledger
    * of exclusive offsets → per-bucket local window. No SinglePartition
    * sort at any corpus size; the final fold is |types| rows.
    *
    * Exactness bounds: 2·S⁺ ≤ 2N² (BIGINT-exact to N ≈ 2·10⁹ rows) and
    * the divisor 2·n⁺·n⁻ ≤ N²/2 is double-exact while N²/2 < 2⁵³
    * (N ≈ 1.3·10⁸); past that the quotient can drift in the last ulp —
    * the statistic is still valid, only bit-parity weakens. */
  def aucByType(spark: SparkSession, dir: String): DataFrame =
    aucByType(Tables(spark, dir, "events"))

  /** df form: expects (event_type: String, value: Double); NULL values
    * are excluded (they carry no rank). */
  def aucByType(events: DataFrame): DataFrame = {
    val e = events.where(col("value").isNotNull)
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
    val pv = e.groupBy("cents", "event_type").agg(count(lit(1)).as("c_vt"))
    val cv = pv.groupBy("cents").agg(sum("c_vt").as("c_v"))
    val (ranked, nTotal) = withMinRank(cv)
    if (nTotal == 0L) return emptyAuc(events.sparkSession)
    pv.join(ranked, "cents")
      .groupBy("event_type")
      .agg(
        sum(col("c_vt") * (lit(2L) * col("minrank") + col("c_v") - 1))
          .as("twoS"),
        sum("c_vt").as("n_pos"))
      .where(col("n_pos") > 0 && col("n_pos") < nTotal)
      .select(col("event_type"), col("n_pos"),
        (lit(nTotal) - col("n_pos")).as("n_neg"),
        ((col("twoS") - col("n_pos") * (col("n_pos") + 1)).cast("double") /
          (lit(2L) * col("n_pos") * (lit(nTotal) - col("n_pos")))
            .cast("double")).as("auc"))
  }

  /** Attach `minrank` (1-based rank of the smallest row at each score)
    * to a (cents, c_v) score-multiplicity table, and return the total
    * row mass — two-pass: per-bucket c_v totals to a driver ledger
    * (exclusive prefix offsets), then a per-bucket local running sum.
    * The window partitions on the range bucket, never SinglePartition. */
  private def withMinRank(cv: DataFrame): (DataFrame, Long) = {
    val mm = cv.agg(min("cents"), max("cents")).head()
    if (mm.isNullAt(0)) return (cv.withColumn("minrank", lit(1L)), 0L)
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    val span = math.max(1L, (hi - lo) / AucBuckets + 1)
    val withBkt = cv.withColumn("bkt", expr(s"(cents - ${lo}L) div ${span}L"))
    val counts = withBkt.groupBy("bkt").agg(sum("c_v").as("t")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (b, t) => val r = (b, acc); acc += t; r }.toSeq
    val offDf = cv.sparkSession.createDataFrame(offsets).toDF("bkt", "off")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("bkt").orderBy("cents")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val ranked = withBkt.join(broadcast(offDf), "bkt")
      .withColumn("minrank",
        lit(1L) + col("off") + sum("c_v").over(w) - col("c_v"))
      .select(col("cents"), col("c_v"), col("minrank"))
    (ranked, acc)
  }

  private def emptyAuc(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
      StructType(Seq(
        StructField("event_type", StringType), StructField("n_pos", LongType),
        StructField("n_neg", LongType), StructField("auc", DoubleType))))
  }
}
