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

  /** Cutoff for the ranking-quality metrics. */
  val NdcgK = 10

  /** 1/log₂(i+1) discount at ranks 1..10, in micro-units, as pinned
    * BIGINT literals shared verbatim with the DuckDB oracle — the
    * only way a log-scaled metric can be bit-exact across engines
    * (neither engine's libm is called; the gain sums are integer). */
  val NdcgW: Seq[Long] = Seq(1000000L, 630930L, 500000L, 430677L,
    386853L, 356207L, 333333L, 315465L, 301030L, 289065L)

  /** Exclusive prefix sums of [[NdcgW]]: `NdcgCum(j)` = ideal DCG of j
    * relevant results, so `NdcgCum(min(R, k))` is the IDCG of a query
    * with R relevant corpus vectors. Index 0 = 0 covers R = 0. */
  val NdcgCum: Seq[Long] = NdcgW.scanLeft(0L)(_ + _)

  /** q_ndcg: NDCG@10 of the embedding space against the labels — the
    * standard ranking-quality audit (Järvelin & Kekäläinen, TOIS 2002)
    * run leave-one-out over the corpus: every vector queries the exact
    * cosine top-10 ([[Similarity.knnJoin]], whose oracle already pins
    * the tie-broken ranking), a neighbor is relevant iff it carries
    * the query's label, and NDCG@10 = DCG/IDCG with the binary-gain
    * log discount. Where [[Similarity.knnClassify]] asks "does the
    * top-k VOTE right?", this grades the whole ranked list —
    * position-weighted, the retrieval-eval view of the same space.
    *
    * Exactness: discounts are the pinned micro-unit literals [[NdcgW]]
    * (no libm), DCG is a BIGINT sum of ≤ k of them, IDCG is the
    * prefix-sum lookup `NdcgCum(min(R,k))` with R = |label class| − 1
    * (leave-one-out), and the reported ndcg_micro = (10⁶·DCG) div IDCG
    * — one exact integer division, 0 for singleton labels (R = 0).
    *
    * Shape at scale: everything past the kNN join is bounded by the
    * n·k edge list — one broadcast label join, one (qid) partial/final
    * sum, a |labels|-row broadcast for R. The join is the scale knob
    * exactly as in knnClassify: swap in [[Similarity.knnJoinBlocked]]
    * at 100 TB, the metric body is identical. */
  def ndcgAtK(spark: SparkSession, dir: String): DataFrame =
    ndcgBody(Tables(spark, dir, "embeddings").select("vec_id", "label"),
      Similarity.knnServe(spark, dir, k = NdcgK))

  /** df form over the exact join: expects (vec_id, embedding, label). */
  def ndcgAtK(emb: DataFrame, k: Int = NdcgK): DataFrame =
    ndcgBody(emb.select("vec_id", "label"), Similarity.knnJoin(emb, k), k)

  private def ndcgBody(lab: DataFrame, knnDf: DataFrame,
      k: Int = NdcgK): DataFrame = {
    // The pinned discount table covers depths up to NdcgW.length; deeper
    // k would silently NULL-drop gains past the table, so reject it.
    require(k >= 1 && k <= NdcgW.length,
      s"ndcg depth k=$k outside the pinned discount table (1..${NdcgW.length})")
    val wLit = typedlit(NdcgW)
    val cumLit = typedlit(NdcgCum)
    // R per label: corpus class size minus the query itself
    val rel = lab.groupBy("label")
      .agg((count(lit(1)) - 1L).as("r_rel"))
    val gains = knnDf
      .join(lab.select(col("vec_id").as("nid"), col("label").as("nlabel")),
        col("vec_id") === col("nid"))
      .select(col("qid"), col("rn"), col("nlabel"))
    val dcg = lab.select(col("vec_id").as("qid"), col("label"))
      .join(gains, "qid")
      .groupBy("qid", "label")
      .agg(sum(when(col("nlabel") === col("label"),
        element_at(wLit, col("rn").cast("int"))).otherwise(0L)).as("dcg_u"))
    dcg.join(broadcast(rel), "label")
      .select(col("qid").as("vec_id"), col("label"), col("dcg_u"),
        element_at(cumLit,
          (least(col("r_rel"), lit(k.toLong)) + 1L).cast("int"))
          .as("idcg_u"))
      .withColumn("ndcg_micro",
        when(col("idcg_u") === 0L, 0L)
          .otherwise(expr("(1000000 * dcg_u) div idcg_u")))
  }

  /** q_confusion: per-class precision/recall/F1 of the leave-one-out
    * kNN classifier ([[Similarity.knnClassify]]) — the confusion-matrix
    * summary every classifier eval starts with, kept EXACT: tp/fp/fn
    * are BIGINT cell sums of the |classes|² confusion matrix, and each
    * ratio is one integer micro-unit division ((10⁶·tp) div (tp+fp),
    * (10⁶·tp) div (tp+fn), (2·10⁶·tp) div (2tp+fp+fn)) — no float in
    * any decision, never-predicted classes report 0 precision by the
    * CASE guard rather than a division error.
    *
    * Shape at scale: past the classifier, everything aggregates the
    * n-row (label, predicted) stream to |classes|² cells partial/final,
    * then |classes|-row joins — driver-free and broadcast-sized. */
  def confusion(spark: SparkSession, dir: String): DataFrame =
    confusionBody(Similarity.knnClassify(spark, dir))

  /** df form: expects (label, predicted) prediction rows. */
  def confusionBody(pred: DataFrame): DataFrame = {
    val cells = pred.groupBy("label", "predicted").agg(count(lit(1)).as("c"))
    val act = cells.groupBy("label").agg(sum("c").as("support"))
    val prd = cells.groupBy(col("predicted").as("label"))
      .agg(sum("c").as("n_pred"))
    val tp = cells.where(col("label") === col("predicted"))
      .select(col("label"), col("c").as("tp"))
    act.join(prd, Seq("label"), "full_outer")
      .join(tp, Seq("label"), "left")
      .select(col("label"),
        coalesce(col("tp"), lit(0L)).as("tp"),
        coalesce(col("support"), lit(0L)).as("support"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"))
      .withColumn("fp", col("n_pred") - col("tp"))
      .withColumn("fn", col("support") - col("tp"))
      .select(col("label"), col("tp"), col("fp"), col("fn"), col("support"),
        when(col("n_pred") === 0L, 0L)
          .otherwise(expr("(1000000 * tp) div (tp + fp)")).as("precision_micro"),
        when(col("support") === 0L, 0L)
          .otherwise(expr("(1000000 * tp) div (tp + fn)")).as("recall_micro"),
        when(col("tp") + col("fp") + col("fn") === 0L, 0L)
          .otherwise(expr("(2000000 * tp) div (2 * tp + fp + fn)")).as("f1_micro"))
  }

  /** Resample count for the Poisson bootstrap. */
  val BootR = 32

  /** Cumulative Poisson(1) probabilities in micro-units, pinned as the
    * shared literals (e⁻¹·Σ1/k!): a row's multiplicity in resample r is
    * the count of thresholds ≤ its 6-digit hash draw — the
    * inverse-CDF lookup, capped at 9 (residual mass 10⁻⁶). */
  val BootCum: Seq[Long] = Seq(367879L, 735759L, 919699L, 981012L,
    996340L, 999406L, 999917L, 999990L, 999999L)

  /** q_bootstrap: Poisson bootstrap of the mean event value — THE
    * resampling method that works at data-parallel scale (Chamandy,
    * Muralidharan, Najmi & Naidu, "Estimating uncertainty for massive
    * data streams", Google 2012; the classical bootstrap's
    * sample-n-with-replacement needs global coordination, the Poisson
    * approximation gives every row an independent multiplicity ~
    * Poisson(1) per resample — one streaming pass, map-side partials).
    *
    * Made DETERMINISTIC: the multiplicity draw is the engine's
    * FNV-1a + avalanche hash of "event_id:r" reduced to a 6-digit
    * draw (the SAME seedless draw family as the split/sample/CMS/HLL
    * operators — round 11 retired the md5 form: MessageDigest was
    * ~10× the integer chain and the sole reason this query led the
    * matrix), inverse-CDF'd through the pinned [[BootCum]] literals —
    * a pure function of the row and resample index, so the DuckDB
    * oracle replays all [[BootR]] resamples bit-for-bit (hash-exact
    * replay of a randomized algorithm, the KMV discipline applied to
    * resampling).
    *
    * Exactness: per resample, n_eff = Σm and sum_cents = Σ m·cents are
    * BIGINT; the reported mean is micro-cents by integer division.
    * Shape at scale: one events pass, the 32 (r, m) pairs explode
    * AFTER the scan into a partial/final (r) aggregation — the shuffle
    * carries 32 rows per map partition, never the resampled data
    * (nothing is ever copied [[BootR]] times). */
  def bootstrapMeans(spark: SparkSession, dir: String): DataFrame =
    bootstrapMeans(Tables(spark, dir, "events"))

  /** df form: expects (event_id: Long, value: Double); NULL values
    * carry no mass. */
  def bootstrapMeans(events: DataFrame): DataFrame = {
    // Explode to (row, resample) grain FIRST, so the draw and the
    // multiplicity are plain codegen'd projections — no higher-order
    // lambdas anywhere (r10's nested-HOF form re-evaluated the
    // interpreted draw once per threshold, a 76 s matrix row). The
    // explode feeds straight into the 32-key partial aggregate —
    // nothing n·32-sized materializes.
    val mCol = BootCum.map(c => when(lit(c) <= col("d"), 1L).otherwise(0L))
      .reduce(_ + _)
    events.where(col("value").isNotNull)
      .select(col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .select(col("event_id"), col("cents"),
        explode(expr(s"sequence(0, ${BootR - 1})")).as("r"))
      .withColumn("d", pmod(
        graft.functions.Fnv32a.mix32(graft.functions.Fnv32a.fnv32a(
          concat(col("event_id").cast("string"), lit(":"),
            col("r").cast("string")))),
        lit(1000000L)))
      .withColumn("m", mCol)
      .groupBy(col("r").cast("long").as("resample"))
      .agg(sum(col("m")).as("n_eff"),
        sum(col("m") * col("cents")).as("sum_cents"))
      .withColumn("mean_microcents",
        when(col("n_eff") === 0L, 0L)
          .otherwise(expr("(1000000 * sum_cents) div n_eff")))
  }

  /** q_ab_test: Welch's two-sample t statistic on event value for
    * every pair of event types — the experiment-analysis primitive
    * (Welch, Biometrika 1947; unequal variances, unequal n). Moments
    * are exact BIGINT cent sums folded partial/final; the statistic is
    * then a HANDFUL of double ops in ONE pinned order (means, sample
    * variances, the pooled standard error, one division) — divisions
    * and sqrt are IEEE correctly-rounded, so both engines produce the
    * identical double and the oracle hash-matches (the q_auc
    * discipline extended through a sqrt).
    *
    * Output per (ta < tb): counts, means (cents, exact-integer-derived
    * doubles), and t — sign convention mean(ta) − mean(tb). Pairs need
    * n ≥ 2 on both sides (sample variance exists). Shape at scale: one
    * events pass to |types| moment rows, then a |types|²/2 broadcast
    * self-join — driver-free. */
  def abTest(spark: SparkSession, dir: String): DataFrame =
    abTest(Tables(spark, dir, "events"))

  /** df form: expects (event_type: String, value: Double). */
  def abTest(events: DataFrame): DataFrame = {
    val m = events.where(col("value").isNotNull)
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("cents").as("s"),
        sum(col("cents") * col("cents")).as("s2"))
      .where(col("n") >= 2L)
    val a = m.select(col("event_type").as("ta"), col("n").as("na"),
      col("s").as("sa"), col("s2").as("s2a"))
    val b = m.select(col("event_type").as("tb"), col("n").as("nb"),
      col("s").as("sb"), col("s2").as("s2b"))
    a.join(b, col("ta") < col("tb"))
      // pinned double chain — identical text in the oracle
      .withColumn("mean_a", expr("cast(sa as double) / cast(na as double)"))
      .withColumn("mean_b", expr("cast(sb as double) / cast(nb as double)"))
      .withColumn("var_a", expr(
        "(cast(s2a as double) - cast(sa as double) * cast(sa as double) / cast(na as double)) / cast(na - 1 as double)"))
      .withColumn("var_b", expr(
        "(cast(s2b as double) - cast(sb as double) * cast(sb as double) / cast(nb as double)) / cast(nb - 1 as double)"))
      .withColumn("t_stat", expr(
        "(mean_a - mean_b) / sqrt(var_a / cast(na as double) + var_b / cast(nb as double))"))
      .select(col("ta"), col("tb"), col("na"), col("nb"),
        col("mean_a"), col("mean_b"), col("t_stat"))
  }

  private def emptyAuc(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
      StructType(Seq(
        StructField("event_type", StringType), StructField("n_pos", LongType),
        StructField("n_neg", LongType), StructField("auc", DoubleType))))
  }
}
