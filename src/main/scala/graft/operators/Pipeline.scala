package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** End-to-end training-data curation (the north-star composition):
  *
  *   documents → near-dup removal (MinHash-LSH pairs @ J ≥ 0.8, keep the
  *   lower doc_id of each pair) → quality gate (composite score ≥ 0.5)
  *   → per-language accounting of kept/dropped docs and kept token mass.
  *
  * Every stage is one of the engine's individually-oracle-checked
  * operators (`Dedup.minhashLsh`, `TextOps.qualityScore`,
  * `TextOps.tokenCounts`), so the composition has an exact DuckDB mirror
  * too — the whole pipeline is hash-checked end-to-end, which is the
  * property a 100 TB curation run actually needs (a silent semantic
  * drift in any stage shows up as a gate failure here).
  *
  * Scale notes: the three stages share one `documents` scan each but no
  * driver round-trips; the dup-id set and the quality gate are joins
  * (anti + inner) on doc_id — at 100 TB the dup set is small relative to
  * the corpus and broadcasts.
  */
object Pipeline {

  val QualityThreshold = 0.5

  /** q_mix_temperature: temperature-balanced multilingual mixture
    * sampling — the rebalancing every multilingual training mix needs
    * (mT5/UniMax family): high-resource languages are downsampled,
    * low-resource ones kept, by giving language `l` a share ∝ t_l^α
    * (α = 0.5 here, i.e. √tokens) of a global token budget
    * (`MixBudgetFrac` of the corpus), then realizing each language's
    * rate with the deterministic FNV doc sampler.
    *
    * Exactness: per-language token totals are exact BIGINTs; the only
    * float work is |langs| square roots, one fold-ordered (lang-asc)
    * sum, and one multiply+divide+floor per language — every step
    * correctly rounded and order-pinned, so the DuckDB oracle matches
    * bit-for-bit. Rates are integer ppm; the keep decision is
    * `fnv(doc_id) mod 1e6 < rate_ppm` — reproducible, engine-portable,
    * and stable under repartitioning like all the FNV samplers.
    *
    * Scale: the per-language ledger (|langs| rows) is the ONLY driver
    * state; the corpus is touched by exactly two scans (totals, then
    * the filtered pass) with pure codegen predicates. `rate_ppm`'s
    * `B_l·10⁶` intermediate overflows signed 64-bit past ~9·10¹²
    * tokens per language — at that scale, lift it to DECIMAL. */
  val MixBudgetFrac = 0.5

  def mixTemperature(spark: SparkSession, dir: String): DataFrame =
    mixTemperature(Tables(spark, dir, "documents"))

  /** df form: expects (doc_id: Long, lang: String, text: String). */
  def mixTemperature(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.LongType
    val toks = docs.select(col("doc_id"), col("lang"),
      expr(s"size(${TextOps.TokensSql})").cast(LongType).as("n_tok"))
    val byLang = toks.groupBy("lang").agg(sum("n_tok").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    val budget = math.floor(MixBudgetFrac * byLang.map(_._2).sum.toDouble)
    var s = 0.0 // lang-asc fold, mirrored by the oracle's list_reduce
    byLang.foreach { case (_, t) => s += math.sqrt(t.toDouble) }
    val rates = byLang.map { case (l, t) =>
      val bl = math.floor(budget * math.sqrt(t.toDouble) / s).toLong
      (l, t, if (t == 0L) 0L else math.min(1000000L, bl * 1000000L / t))
    }
    // the rate ledger joins in as a BROADCAST table (a per-row CASE
    // chain over hundreds of languages would blow codegen's method
    // limit and cost O(rows·langs))
    import docs.sparkSession.implicits._
    val rateDf = broadcast(
      rates.toSeq.toDF("lang", "tokens_before", "rate_ppm"))
    toks.join(rateDf, "lang")
      .where(graft.functions.Fnv32a.fnv32a(col("doc_id").cast("string"))
        % 1000000L < col("rate_ppm"))
      .groupBy("lang")
      .agg(max("tokens_before").as("tokens_before"),
        max("rate_ppm").as("rate_ppm"),
        count(lit(1)).as("docs_kept"), sum("n_tok").as("tokens_kept"))
  }

  /** q_sample_hash: deterministic hash-based sampling — keep the docs
    * whose FNV-1a(doc_id) lands in 1 of `mod` buckets. The
    * training-pipeline sampling primitive: reproducible across engines
    * and runs (unlike seeded RNG sampling, whose sequence is
    * engine-private), stable under repartitioning, idempotent, and
    * refinable (the `mod = 20` sample nests inside the `mod = 10` one,
    * so a pipeline can grow its sample without resampling seen docs).
    * Pure per-row codegen'd predicate → pushes nothing to the driver at
    * any scale. */
  def hashSample(spark: SparkSession, dir: String, mod: Int = 20): DataFrame =
    // driver-query projection; the df form below keeps EVERY column so
    // the sampled docs are directly usable downstream
    hashSample(Tables(spark, dir, "documents"), mod)
      .select(col("doc_id"), col("lang"), col("h"))

  /** df form: expects a `doc_id: Long` column; all input columns are
    * preserved (plus the bucket hash `h`). */
  def hashSample(documents: DataFrame, mod: Int): DataFrame =
    documents
      .withColumn("h", graft.functions.Fnv32a.fnv32a(col("doc_id").cast("string")))
      .where(col("h") % mod === 0L)

  /** q_sample_stratified: per-stratum hash sampling — each language
    * keeps 1/mod of its docs by the same FNV bucket rule (different
    * rates per stratum, still deterministic/reproducible/refinable).
    * The per-row modulus is a tiny CASE expression; languages outside
    * the plan are dropped. */
  val StratifiedRates: Seq[(String, Int)] =
    Seq("en" -> 10, "de" -> 5, "fr" -> 2, "es" -> 2)

  def stratifiedHashSample(spark: SparkSession, dir: String): DataFrame =
    stratifiedHashSample(Tables(spark, dir, "documents"), StratifiedRates)
      .select(col("doc_id"), col("lang"), col("h"))

  /** df form: expects (doc_id: Long, lang: String); keeps all columns
    * and adds/overwrites the bucket hash `h` (like `hashSample`). The
    * per-row modulus is evaluated inline — no scratch column to clobber
    * caller data. */
  def stratifiedHashSample(documents: DataFrame,
                           rates: Seq[(String, Int)]): DataFrame = {
    val mod = rates.foldRight(lit(null: String).cast("long")) {
      case ((lang, m), els) => when(col("lang") === lang, lit(m.toLong)).otherwise(els)
    }
    documents
      .withColumn("h", graft.functions.Fnv32a.fnv32a(col("doc_id").cast("string")))
      .where(mod.isNotNull && col("h") % mod === 0L)
  }

  /** Deterministic train/validation split on disjoint hash buckets:
    * docs whose bucket is 0 (1/valMod of the corpus) go to validation,
    * everything else to train — reproducible across runs/engines,
    * stable under repartitioning, leak-free by construction (the two
    * sides partition the corpus). */
  def trainValSplit(documents: DataFrame, valMod: Int = 10): (DataFrame, DataFrame) = {
    // inline predicate — no scratch column, so an existing `h` (e.g.
    // from hashSample) passes through untouched
    val bucket =
      graft.functions.Fnv32a.fnv32a(col("doc_id").cast("string")) % valMod
    (documents.where(bucket =!= 0L), documents.where(bucket === 0L))
  }

  /** q_split: the declared single-scan form of the train/validation
    * split — every doc tagged 'train' or 'val' by the same disjoint
    * hash-bucket rule `trainValSplit` filters on (bucket 0 of valMod →
    * val). One scan emitting both sides beats materializing the two
    * filtered DataFrames separately (2 scans) when the split feeds a
    * single downstream writer; the two forms are spec-checked to
    * partition the corpus identically. Deterministic, engine-portable,
    * stable under repartitioning — re-running the pipeline never
    * migrates a doc across the split (the leak-safety property seeded
    * RNG splits do not have). */
  def splitTag(spark: SparkSession, dir: String, valMod: Int = 10): DataFrame =
    splitTag(Tables(spark, dir, "documents"), valMod)
      .select(col("doc_id"), col("lang"), col("split"))

  /** df form: expects a `doc_id: Long` column; keeps all columns and
    * adds `split`. */
  def splitTag(documents: DataFrame, valMod: Int): DataFrame =
    documents.withColumn("split",
      when(graft.functions.Fnv32a.fnv32a(col("doc_id").cast("string"))
        % valMod === 0L, "val").otherwise("train"))

  /** q_split_leakage: the train/val split made NEAR-DUP-LEAK-SAFE —
    * `splitTag` hashes per DOC, so two near-duplicate documents can
    * land on opposite sides and the validation loss silently measures
    * memorization (the contamination failure the dedup literature
    * warns about — Lee et al. 2022 "Deduplicating Training Data Makes
    * Language Models Better" measures exactly this leak). Fix: hash
    * per near-dup CLUSTER — the split key is the document's connected-
    * component label from the trusted `Dedup.dupComponents` closure
    * (min doc_id of its J ≥ 0.8 cluster), its own id for singletons —
    * so every cluster lands WHOLE on one side by construction.
    *
    * Composition of two oracle-checked pieces (the CC labels and the
    * FNV bucket rule), so the whole split has an exact DuckDB mirror.
    * Shape at scale: the label table is |dup docs| rows (orders of
    * magnitude under the corpus — it broadcasts), one left join + a
    * codegen hash predicate; same determinism/repartition-stability
    * properties as every FNV sampler. */
  def splitByCluster(spark: SparkSession, dir: String,
      valMod: Int = 10): DataFrame =
    splitByCluster(
      Tables(spark, dir, "documents").select(col("doc_id"), col("lang")),
      Dedup.dupComponents(spark, dir), valMod)

  /** df form: docs (doc_id, lang, …), comp (doc_id, comp) cluster
    * labels covering at least the non-singleton docs. */
  def splitByCluster(docs: DataFrame, comp: DataFrame,
      valMod: Int): DataFrame =
    docs.join(comp, Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("comp"), col("doc_id")))
      .withColumn("split",
        when(graft.functions.Fnv32a.fnv32a(col("cluster").cast("string"))
          % valMod === 0L, "val").otherwise("train"))
      .select(col("doc_id"), col("lang"), col("cluster"), col("split"))

  /** q_sample_group: fixed-size deterministic sample per stratum — the
    * k docs per language with the SMALLEST FNV hash (rate-based
    * sampling, q_sample_stratified, cannot promise "exactly k
    * examples per class"; this is the eval-set / few-shot-pool
    * primitive that does). Hash-order selection keeps every
    * determinism property of the other samplers: reproducible across
    * engines and runs, stable under repartitioning, and CONSISTENT
    * as the corpus grows (a doc leaves the sample only when a
    * smaller-hash doc arrives — bounded turnover, unlike re-seeded
    * reservoir sampling which reshuffles wholesale).
    *
    * Two-phase top-k, the same shape as `Similarity.bruteForceTopK`:
    * a local window per (lang, input partition) keeps k candidates
    * per partition, then the global window ranks only ≤ k·P
    * candidate rows — the dominant language never funnels its full
    * row set into one sorted task. Correctness of the decomposition
    * is exact: any global top-k row is a top-k row of its own
    * partition. Spec-checked ≡ the single-window form. */
  def groupSample(spark: SparkSession, dir: String, k: Int = 5): DataFrame =
    groupSample(Tables(spark, dir, "documents"), k)

  /** df form: expects (doc_id: Long, lang: String). */
  def groupSample(documents: DataFrame, k: Int): DataFrame = {
    val hashed = documents
      .select(col("doc_id"), col("lang"),
        graft.functions.Fnv32a.fnv32a(col("doc_id").cast("string")).as("h"))
      .withColumn("pid", spark_partition_id())
    val wLocal = org.apache.spark.sql.expressions.Window
      .partitionBy("lang", "pid").orderBy(col("h"), col("doc_id"))
    val cand = hashed
      .withColumn("lr", row_number().over(wLocal))
      .where(col("lr") <= k)
    val wGlobal = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("h"), col("doc_id"))
    cand
      .withColumn("rk", row_number().over(wGlobal).cast("long"))
      .where(col("rk") <= k)
      .select(col("doc_id"), col("lang"), col("h"), col("rk"))
  }

  /** Single-window reference form of `groupSample` (one partition per
    * language; the spec baseline). */
  def groupSampleWindow(documents: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("h"), col("doc_id"))
    documents
      .select(col("doc_id"), col("lang"),
        graft.functions.Fnv32a.fnv32a(col("doc_id").cast("string")).as("h"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= k)
  }

  /** q_sample_weighted: weighted sampling without replacement — k
    * orders drawn with probability proportional to o_totalprice, via
    * the one-pass exponential-key method (Efraimidis & Spirakis,
    * "Weighted random sampling with a reservoir", IPL 2006): each row
    * gets key `ln(u)/w` for a uniform u ∈ (0,1), and the k LARGEST
    * keys are exactly a weighted sample without replacement. The
    * uniform is the engine's deterministic FNV hash mapped to
    * (0, 1) — `(fnv32a(id) + 0.5) / 2³²` — so the sample is
    * reproducible across runs, engines, and partitionings (the same
    * derandomization as every sampler in this file; a seeded salt
    * concatenated into the hash input gives fresh draws).
    *
    * Shape at scale: ONE corpus scan; the global top-k plans as
    * TakeOrderedAndProject — per-partition top-k heaps, then k·P rows
    * to a single final merge — no full shuffle, no global sort of the
    * data. The selection keys are well-separated with probability 1 −
    * O(n²·ulp), so the libm `ln` in the ORDERING (never in the
    * output) cannot flip the selected set; outputs are ids + weights,
    * both exact. */
  def weightedSample(spark: SparkSession, dir: String, k: Int = 100): DataFrame =
    weightedSample(
      graft.sources.Tables(spark, dir, "orders")
        .select(col("o_orderkey").as("id"), col("o_totalprice").as("w")), k)

  /** df form: expects (id: Long, w: Double) with strictly positive
    * weights (zero/negative weights have no sampling interpretation —
    * filter upstream). */
  def weightedSample(rows: DataFrame, k: Int): DataFrame =
    rows
      .withColumn("u",
        (graft.functions.Fnv32a.fnv32a(col("id").cast("string")).cast("double")
          + lit(0.5)) / lit(4294967296.0))
      .withColumn("key", log(col("u")) / col("w"))
      .orderBy(desc("key"), asc("id"))
      .limit(k)
      .select(col("id"), round(col("w"), 2).as("weight"))

  /** q_chunk: overlapping context-window chunking — each document cut
    * into fixed-size token windows with a fixed overlap (stride =
    * size − overlap), the standard pretraining/RAG preparation step
    * (`packTokens` packs whole documents into shards; this SPLITS one
    * document into attention-window-sized pieces whose overlap
    * preserves cross-boundary context). Start offsets are `1, 1+st,
    * 1+2st, …` while ≤ n_tok, so every token lands in ≥ 1 chunk, the
    * last chunk may run short, and a zero-token document yields no
    * chunks. Pure per-row array expressions — explode over the start
    * sequence, slice, hash — embarrassingly parallel, no shuffle at
    * any scale. Chunks are emitted as (id, index, length, md5) — the
    * md5 pins EXACT chunk content against the oracle without shipping
    * chunk text through the hash gate. */
  def chunk(spark: SparkSession, dir: String,
            size: Int = 50, overlap: Int = 10): DataFrame =
    chunk(Tables(spark, dir, "documents"), size, overlap)

  /** df form: expects (doc_id: Long, text: String); requires
    * 0 ≤ overlap < size. */
  def chunk(documents: DataFrame, size: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < size, "need 0 <= overlap < size")
    val stride = size - overlap
    documents
      .withColumn("ts", expr(graft.operators.TextOps.TokensSql))
      .withColumn("n", size_(col("ts")))
      .where(col("n") > 0)
      .select(col("doc_id"), col("ts"), col("n"),
        explode(expr(s"sequence(1, n, $stride)")).as("s"))
      .select(
        col("doc_id"),
        // chunk index derived from the start offset — identical on both
        // engines without relying on unnest ordinality
        ((col("s") - 1) / stride).cast("long").as("chunk_idx"),
        least(lit(size), col("n") - col("s") + 1).cast("long").as("chunk_len"),
        md5(encode(concat_ws(" ",
          expr(s"slice(ts, s, $size)")), "UTF-8")).as("chunk_md5"))
  }

  // size() collides with the Scala collection method inside this object
  private def size_(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.size(c)

  /** q_pack_tokens (declared form): greedy token-budget shard packing
    * per language — each doc lands in the shard its running token offset
    * falls into (running sum over the deterministic doc_id order). The
    * sharding op of a training-data pipeline ("split this corpus into
    * ~budget-token files").
    *
    * The prefix sum is the classic TWO-PASS range-partitioned scan, so
    * no language ever funnels into a single task (the single-window form
    * `packTokensWindow` makes the dominant language one sorted
    * partition — a wall at 100 TB; kept as the spec baseline):
    *  1. rows are bucketed into `buckets` contiguous doc_id ranges
    *     (arithmetic on (min,max), deterministic — no sampling); a
    *     partial aggregation computes per-(lang, bucket) token totals,
    *     and the tiny #langs·buckets ledger comes to the driver where
    *     the exclusive per-bucket offsets are computed;
    *  2. one windowed pass per (lang, bucket) — max partition size is a
    *     bucket, tuned by one knob — adds the broadcast offset to the
    *     local running sum.
    * Bucket ranges are contiguous in doc_id, so local order ∘ offsets
    * ≡ the global per-language prefix sum exactly (integer sums — no
    * reassociation error). */
  def packTokens(spark: SparkSession, dir: String, budget: Long = 2000L): DataFrame =
    packTokens(Tables(spark, dir, "documents"), budget)

  /** df form: expects (doc_id: Long, text: String, lang: String). */
  def packTokens(documents: DataFrame, budget: Long): DataFrame =
    packTokens(documents, budget, 32)

  def packTokens(documents: DataFrame, budget: Long, buckets: Int): DataFrame = {
    val counted = documents.select(col("doc_id"), col("lang"),
      regexp_count(lower(col("text")), lit(TextOps.WordpiecePat))
        .cast("long").as("wp_tokens"))
    val mm = counted.agg(min("doc_id"), max("doc_id")).head()
    if (mm.isNullAt(0)) return packTokensWindow(documents, budget)
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    val span = math.max(1L, (hi - lo) / buckets + 1)
    // integer `div`, not `/` (Column `/` is double division — lossy past
    // 2^53 and the wrong join-key type)
    val withBkt = counted.withColumn("bkt", expr(s"(doc_id - ${lo}L) div ${span}L"))
    // pass 1: per-(lang, bucket) totals — partial/final agg, then a
    // #langs·buckets ledger to the driver (constant-ish at any corpus
    // scale; buckets is the parallelism knob, not data-dependent)
    // ledger rows may carry lang = null (window partitioning is
    // null-safe, so the window baseline keeps such docs — this form
    // must too): group per language with nulls-first ordering, one
    // running sum per group (O(E log E), not a per-entry rescan)
    val totals = withBkt.groupBy("lang", "bkt")
      .agg(sum("wp_tokens").as("t"))
      .collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2)))
    val offsets = totals.groupBy(_._1).valuesIterator.flatMap { group =>
      var acc = 0L
      group.sortBy(_._2).map { case (lang, bkt, t) =>
        val row = (lang.orNull, bkt, acc); acc += t; row
      }
    }.toSeq
    val offDf = documents.sparkSession
      .createDataFrame(offsets).toDF("lang", "bkt", "off")
    // pass 2: windowed local prefix sum within each (lang, bucket) range
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang", "bkt").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    withBkt
      // null-safe on lang (a plain equi-join would drop null-lang docs)
      .join(broadcast(offDf.withColumnRenamed("lang", "o_lang")
          .withColumnRenamed("bkt", "o_bkt")),
        col("lang") <=> col("o_lang") && col("bkt") === col("o_bkt"))
      .withColumn("cum", sum("wp_tokens").over(w) + col("off"))
      .select(col("doc_id"), col("lang"),
        floor((col("cum") - col("wp_tokens")) / budget).as("shard"))
  }

  /** Single-window reference form of `packTokens` (one partition per
    * language — fine below ~10⁷ docs/language, the spec baseline the
    * two-pass form must equal exactly). */
  def packTokensWindow(documents: DataFrame, budget: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    documents
      .select(col("doc_id"), col("lang"),
        regexp_count(lower(col("text")), lit(TextOps.WordpiecePat))
          .cast("long").as("wp_tokens"))
      .withColumn("cum", sum("wp_tokens").over(w))
      .select(col("doc_id"), col("lang"),
        floor((col("cum") - col("wp_tokens")) / budget).as("shard"))
  }

  /** q_row_ids: GLOBAL contiguous 1-based row numbering in key order —
    * the "assign every training example a stable ordinal" primitive
    * (shard manifests, resumable iteration, example-id joins). The
    * naive form — `row_number() OVER (ORDER BY key)` with no partition —
    * funnels the entire table through ONE sorted task; this is the same
    * two-pass range-partitioned decomposition as `packTokens`:
    * per-key-range bucket counts → tiny driver ledger of exclusive
    * offsets → broadcast back → per-bucket local row_number + offset.
    * Bucket ranges are contiguous in the (unique) key, so local rank ∘
    * offset ≡ the global rank exactly. Spec-checked ≡ the single-window
    * form; oracle is DuckDB's global row_number. */
  def globalRowIds(spark: SparkSession, dir: String): DataFrame =
    globalRowIds(Tables(spark, dir, "documents").select("doc_id"), "doc_id", 32)

  /** df form: `key` must be unique (ties would make ranks ambiguous —
    * doc ids here; compose a struct key upstream otherwise). */
  def globalRowIds(df: DataFrame, key: String, buckets: Int): DataFrame = {
    val mm = df.agg(min(col(key)), max(col(key))).head()
    if (mm.isNullAt(0))
      return df.withColumn("rid", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(key)).cast("long"))
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    val span = math.max(1L, (hi - lo) / buckets + 1)
    val withBkt = df.withColumn("bkt", expr(s"($key - ${lo}L) div ${span}L"))
    // pass 1: per-bucket cardinalities (partial/final count), ≤ `buckets`
    // rows to the driver; exclusive prefix offsets computed there
    val counts = withBkt.groupBy("bkt").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (b, n) => val r = (b, acc); acc += n; r }.toSeq
    val offDf = df.sparkSession.createDataFrame(offsets).toDF("bkt", "off")
    // pass 2: local dense rank within each contiguous bucket + offset
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("bkt").orderBy(key)
    withBkt.join(broadcast(offDf), "bkt")
      .withColumn("rid", row_number().over(w).cast("long") + col("off"))
      .drop("bkt", "off")
  }

  /** q_shuffle: deterministic GLOBAL permutation of the corpus — the
    * "shuffle the training data" step every epoch pipeline needs, as a
    * reproducible function of the data rather than an RNG: order by
    * (h, doc_id) with h = fnv32a(fnv32a(doc_id) as decimal string).
    * The DOUBLE hash matters: one FNV-1a pass over sequential decimal
    * ids is linear in the last byte (h(i+1) − h(i) is a small multiple
    * of the 16777619 prime — measured ~7% of consecutive ids stayed
    * rank-adjacent), while re-hashing the first hash's decimal digits
    * diffuses those structured differences across the whole string.
    * Appending doc_id to the sort key keeps the permutation total even
    * under 32-bit collisions (h < 2³², doc_id < 2³¹ ⇒ h·2³¹ + doc_id
    * is collision-free in one BIGINT). The global rank rides
    * [[globalRowIds]]' two-pass range-partitioned decomposition — no
    * SinglePartition sort at any corpus size. */
  def shuffle(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"),
        graft.functions.Fnv32a.fnv32a(
          graft.functions.Fnv32a.fnv32a(col("doc_id").cast("string"))
            .cast("string")).as("h"))
      .withColumn("skey", col("h") * lit(2147483648L) + col("doc_id"))
      .transform(globalRowIds(_, "skey", 32))
      .select(col("doc_id"), col("h"), col("rid").as("shuffle_pos"))

  /** q_decontaminate: benchmark decontamination — remove from the
    * training corpus every document that shares ANY `n`-token shingle
    * with a held-out benchmark set (here: docs whose id ≡ 0 mod
    * `benchMod` stand in for the eval set). The standard contamination
    * guard before LLM training (n-gram overlap against eval sets, as in
    * GPT-3's 13-gram dedup — Brown et al. 2020, App. C); n is a knob,
    * 4 here because the synthetic corpus' tiny vocabulary makes long
    * shingles vanishingly rare.
    *
    * Shape at scale: the benchmark shingle set is ALWAYS small (eval
    * sets are thousands of docs, not billions) → broadcast to every
    * executor; the corpus side is one scan + explode, probed map-side
    * with NO shuffle of corpus shingles; only the matched doc_ids
    * (small) shuffle for the distinct + anti-join. Shingles stay as
    * strings for exact cross-engine parity — they never leave the
    * map side, so there is nothing to win by hashing them. */
  def decontaminate(spark: SparkSession, dir: String): DataFrame =
    decontaminate(Tables(spark, dir, "documents"), 97, 4)

  /** df form: expects (doc_id: Long, text: String, lang: String);
    * returns the CLEAN training docs (benchmark docs excluded). */
  def decontaminate(documents: DataFrame, benchMod: Int, n: Int): DataFrame =
    documents.where(col("doc_id") % benchMod =!= 0L)
      .join(contaminatedIds(documents, benchMod, n), Seq("doc_id"), "left_anti")
      .select("doc_id", "lang")

  /** Training docs sharing an n-token shingle with any benchmark doc
    * (doc_id % benchMod == 0) — the contamination candidate set shared
    * by [[decontaminate]] and [[curateWeb]]. Input: (doc_id, text). */
  private def contaminatedIds(documents: DataFrame, benchMod: Int,
      n: Int): DataFrame =
    contaminatedFromShingles(contamShingles(documents, n), benchMod)

  /** Distinct n-token string shingles (doc_id, s) — the decontamination
    * index grain, shared by the inline chain and the staged append
    * artifact so the two paths cannot drift. */
  private[graft] def contamShingles(documents: DataFrame, n: Int): DataFrame =
    documents
      .withColumn("ts", expr(TextOps.TokensSql))
      .where(size(col("ts")) >= n)
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(1, size(ts) - ${n - 1}),
           |  i -> array_join(slice(ts, i, $n), ' '))""".stripMargin)).as("s"))
      .distinct()

  /** Contaminated ids from an ALREADY-BUILT shingle table (the
    * [[contamShingles]] grain): docs sharing a shingle with any
    * benchmark doc (doc_id % benchMod == 0), benchmark docs excluded. */
  private def contaminatedFromShingles(sh: DataFrame, benchMod: Int): DataFrame = {
    val benchShingles = sh.where(col("doc_id") % benchMod === 0L).select("s").distinct()
    sh.where(col("doc_id") % benchMod =!= 0L)
      .join(broadcast(benchShingles), "s")
      .select("doc_id").distinct()
  }

  /** q_pipeline_curate: per-language curation ledger. The catalog form
    * reads the MEMOIZED component labels — the pipeline computes
    * components once per corpus version and every consumer (dedup
    * audit, keep-best, this ledger) shares them. */
  def curate(spark: SparkSession, dir: String): DataFrame =
    curate(Tables(spark, dir, "documents"),
      Dedup.dupComponents(spark, dir))

  /** df form: expects (doc_id: Long, text: String, lang: String);
    * computes its own components. */
  def curate(documents: DataFrame): DataFrame =
    curate(documents, Dedup.dupComponents(Dedup.minhashLsh(documents)))

  /** df form with externally-computed component labels (doc_id, comp). */
  def curate(documents: DataFrame, comps: DataFrame): DataFrame = {
    val docs = documents.select("doc_id", "lang")
    // transitive dedup: drop every non-canonical member of each near-dup
    // COMPONENT (keep the min id). Pairwise keep-the-lower would
    // under-deduplicate chains (A≈B≈C with A̸≈C keeps both A and C
    // unless B's bridge closes them into one component).
    val dupIds = comps
      .where(col("doc_id") =!= col("comp"))
      .select(col("doc_id")).distinct()
    val quality = TextOps.qualityScore(documents).select("doc_id", "score")
    val tokens = TextOps.tokenCounts(documents).select("doc_id", "wp_tokens")

    val staged = docs
      .join(dupIds.withColumn("is_dup", lit(1L)), Seq("doc_id"), "left")
      .join(quality, "doc_id")
      .join(tokens, "doc_id")
      .withColumn("state",
        when(col("is_dup") === 1L, "dup")
          .when(col("score") < QualityThreshold, "lowq")
          .otherwise("kept"))
    staged.groupBy("lang")
      .agg(
        sum(when(col("state") === "kept", 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("state") === "dup", 1L).otherwise(0L)).as("n_dup"),
        sum(when(col("state") === "lowq", 1L).otherwise(0L)).as("n_lowq"),
        sum(when(col("state") === "kept", col("wp_tokens")).otherwise(0L))
          .as("kept_tokens"))
  }

  /** Benchmark split modulus of the [[curateWeb]] decontamination stage
    * (the q_decontaminate convention: doc_id % mod == 0 plays the held-
    * out benchmark suite). */
  val WebBenchMod = 97

  /** Contamination shingle width of [[curateWeb]] (q_decontaminate's). */
  val WebShingleN = 4

  /** q_pipeline_web: the CANONICAL public web-curation chain stitched
    * end-to-end from this catalog's individually-oracle-checked stages,
    * in the published recipe order (C4 — Raffel et al. 2020 §2.2; then
    * Gopher — Rae et al. 2021 §A1.1; then near-dup removal; then
    * benchmark decontamination; then the per-language token ledger
    * every training mix is planned from):
    *
    *   documents → C4 line clean (dropped pages exit; survivors
    *   continue as their REWRITTEN clean_text) → Gopher document rules
    *   over the cleaned text → MinHash-LSH near-dup components, keep
    *   the min id of each component (the q_pipeline_curate transitive
    *   argument) → decontaminate the canonical survivors (benchmark =
    *   doc_id % [[WebBenchMod]] == 0 among them; shared
    *   [[WebShingleN]]-shingle ⇒ contaminated) → ledger.
    *
    * Every doc lands in EXACTLY one state by stage precedence
    * (c4_dropped > gopher_dropped > dup > bench > contaminated > kept),
    * so the per-language counts partition n_docs — the conservation
    * identity a 100 TB curation run audits first. All counts and the
    * kept-token mass are exact BIGINTs; the DuckDB oracle chains the
    * SAME per-stage SQL the individual oracles use (shared CTE
    * builders in SparkEntry — no drift) and hash-matches end-to-end.
    *
    * Scale shape: three document scans (C4+base, Gopher over cleaned,
    * shingling), the banded LSH join, and doc_id-keyed ledger joins —
    * every stage is the respective operator's documented 100 TB shape;
    * nothing new is materialized beyond the cleaned survivor frame
    * (lineage-cut, consumed by three stages). */
  def curateWeb(spark: SparkSession, dir: String): DataFrame =
    // enriched corpus (fixture ∪ web slice, sources/WebCorpus.scala):
    // every ledger state fires on non-empty frames — on the raw
    // fixture C4 drops 100% of pages and stages 2–5 ran over empty
    // survivor frames (VERDICT r14 #1)
    curateWeb(graft.sources.WebCorpus.enriched(
      Tables(spark, dir, "documents")))

  /** df form: expects (doc_id: Long, text: String, lang: String). */
  def curateWeb(documents: DataFrame): DataFrame = {
    // stage 1: C4 line-level clean — page drops exit here; survivors
    // are REWRITTEN to their kept lines
    val base = graft.Engine.cut(
      documents.select("doc_id", "lang")
        .join(TextOps.c4Clean(documents)
          .select(col("doc_id"), col("dropped"), col("clean_text")), "doc_id"))
    val cleaned = base.where(!col("dropped"))
      .select(col("doc_id"), col("clean_text").as("text"))
    // stage 2: Gopher document rules over the CLEANED text (rule flags
    // recomputed on what later stages actually consume — filtering on
    // pre-clean signals would keep boilerplate whose clean_text is hollow).
    // cut: two consumers (survivors filter + states ledger) — without it
    // the expensive regex/token scan runs twice per serve
    val gKeep = graft.Engine.cut(
      TextOps.qualityGopher(cleaned).select(col("doc_id"), col("keep")))
    val survivors = graft.Engine.cut(
      cleaned.join(gKeep.where(col("keep")).select("doc_id"), "doc_id"))
    // stage 3: near-dup components over the survivors' cleaned text;
    // transitive keep-min-id (pairwise keep-the-lower under-dedups
    // chains — the q_pipeline_curate argument)
    val dupIds = graft.Engine.cut(
      Dedup.dupComponents(Dedup.minhashLsh(survivors))
        .where(col("doc_id") =!= col("comp"))
        .select("doc_id"))
    val canon = graft.Engine.cut(
      survivors.join(dupIds, Seq("doc_id"), "left_anti"))
    // stage 4: decontamination among the canonical survivors
    val contaminated = contaminatedIds(canon, WebBenchMod, WebShingleN)
    // stage 5: per-language ledger over ALL input docs, one state each
    val toks = TextOps.tokenCounts(canon).select("doc_id", "wp_tokens")
    val states = base
      .join(gKeep, Seq("doc_id"), "left")
      .join(dupIds.withColumn("is_dup", lit(1L)), Seq("doc_id"), "left")
      .join(contaminated.withColumn("is_cont", lit(1L)), Seq("doc_id"), "left")
      .join(toks, Seq("doc_id"), "left")
      .withColumn("state",
        when(col("dropped"), lit("c4_dropped"))
          .when(!col("keep"), lit("gopher_dropped"))
          .when(col("is_dup") === 1L, lit("dup"))
          .when(col("doc_id") % WebBenchMod === 0L, lit("bench"))
          .when(col("is_cont") === 1L, lit("contaminated"))
          .otherwise(lit("kept")))
    val ledger = graft.Engine.cut(states.groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("state") === "c4_dropped", 1L).otherwise(0L)).as("n_c4_dropped"),
        sum(when(col("state") === "gopher_dropped", 1L).otherwise(0L)).as("n_gopher_dropped"),
        sum(when(col("state") === "dup", 1L).otherwise(0L)).as("n_dup"),
        sum(when(col("state") === "bench", 1L).otherwise(0L)).as("n_bench"),
        sum(when(col("state") === "contaminated", 1L).otherwise(0L)).as("n_contaminated"),
        sum(when(col("state") === "kept", 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("state") === "kept", col("wp_tokens")).otherwise(0L))
          .as("kept_tokens")))
    // the ledger (|langs| rows) is materialized — the doc-grain staged
    // frames are dead; free them NOW (the r13 dead-frame discipline:
    // repeated serves must not accumulate text-sized block copies)
    graft.Engine.free(canon)
    graft.Engine.free(dupIds)
    graft.Engine.free(survivors)
    graft.Engine.free(gKeep)
    graft.Engine.free(base)
    ledger
  }

  // ---- q_pipeline_web_append: the WEEKLY-INCREMENT mode of the
  // canonical chain (VERDICT r14 #5). A continuous-crawl corpus never
  // re-curates 100 TB because one week of pages arrived; it pays TEXT
  // work only for the increment and id/index-grain algebra for the
  // rest:
  //  - staged once per corpus version (stagedWebState): the base
  //    docs' doc-grain stage flags (c4 dropped / gopher keep /
  //    wp_tokens — text-free), the base survivors' band index, 3-token
  //    shingle index, verified pair list (the dedupAppend artifacts),
  //    and their 4-token decontamination shingles;
  //  - per increment: C4 + Gopher over |delta| docs only; delta
  //    signatures probed AGAINST the persisted band index (batch side
  //    broadcast — one map-side index scan, no index shuffle; the
  //    crossCandidates gate) plus the batch-local LSH; exact-verify
  //    candidate-bound via the persisted shingle index; components
  //    over base pairs ∪ new pairs (dup-graph grain).
  // The ledger is then recomputed as pure ID-GRAIN set algebra over
  // persisted + delta flags — it must be, for exactness: an increment
  // can change BASE docs' states (a delta page bridging two base
  // components demotes a previously-kept base doc to dup; a new canon
  // bench page can contaminate old canon docs), so per-language counts
  // cannot be patched additively. Output ≡ the one-shot chain on
  // base ∪ delta (spec-asserted; the oracle is webOracle verbatim —
  // the q_dedup_append convention).

  private val webStateCache =
    new scala.collection.concurrent.TrieMap[(String, String), (String, (Long, Long))]()

  def clearWebStateCache(): Unit = webStateCache.clear()

  /** The increment predicate: the latest crawl = the last
    * [[graft.sources.WebCorpus.DeltaSliceStart]]-onward web pages plus
    * the last ~10% of fixture docs (a real increment mixes good pages
    * and salad). */
  private def deltaPred(fixtureCut: Long): org.apache.spark.sql.Column = {
    val so = graft.sources.WebCorpus.SliceOff
    (col("doc_id") >= so + graft.sources.WebCorpus.DeltaSliceStart) ||
      (col("doc_id") < so && col("doc_id") >= fixtureCut)
  }

  /** Build (or reuse) the staged base web-curation state; returns
    * (root, fixtureCut, deltaDocs). */
  private[graft] def stagedWebState(spark: SparkSession,
      dir: String): (String, Long, Long) = {
    val (root, (fixtureCut, deltaDocs)) =
      Staging.stage(webStateCache, dir, "documents", "graft-webstate-") { root =>
        val corpus = graft.sources.WebCorpus.enriched(
          Tables(spark, dir, "documents"))
        val nFix = corpus
          .where(col("doc_id") < graft.sources.WebCorpus.SliceOff).count()
        val fixCut = nFix - math.max(1L, nFix / 10L)
        val base = corpus.where(!deltaPred(fixCut))
        val nDelta = corpus.where(deltaPred(fixCut)).count()

        // stage flags over the base text, computed ONCE and persisted
        // text-free (the doc-grain state the ledger algebra replays)
        val bClean = graft.Engine.cut(
          TextOps.c4Clean(base).select("doc_id", "dropped", "clean_text"))
        val cleaned = graft.Engine.cut(bClean.where(!col("dropped"))
          .select(col("doc_id"), col("clean_text").as("text")))
        val gK = graft.Engine.cut(
          TextOps.qualityGopher(cleaned).select(col("doc_id"), col("keep")))
        val surv = graft.Engine.cut(
          cleaned.join(gK.where(col("keep")).select("doc_id"), "doc_id"))
        // the five artifact writes below are mutually independent once
        // bClean/gK/surv are materialized (all three are lineage-cut
        // above) — submit them from a dedicated drained pool
        // ([[Staging.JobPool]]) so one job's task tail back-fills
        // cores the next job would leave idle (guide §2.6
        // overlap-independent-jobs; they used to run strictly
        // sequentially)
        val pool = new Staging.JobPool(5)
        try {
          pool.submit {
            base.select("doc_id", "lang")
              .join(bClean.select("doc_id", "dropped"), "doc_id")
              .join(gK, Seq("doc_id"), "left")
              .join(TextOps.tokenCounts(surv).select("doc_id", "wp_tokens"),
                Seq("doc_id"), "left")
              .write.mode("overwrite").parquet(s"$root/state")
          }
          // the dedupAppend artifacts over the base SURVIVORS (the
          // population the chain's near-dup stage actually sees), plus
          // the 4-shingle decontamination index; range layout on doc_id
          // for tight min/max pruning of candidate slices
          pool.submit {
            Dedup.sigBands(surv).write.mode("overwrite").parquet(s"$root/bands")
          }
          pool.submit {
            Dedup.shingles(surv).repartitionByRange(col("doc_id"))
              .sortWithinPartitions("doc_id")
              .write.mode("overwrite").parquet(s"$root/sh3")
          }
          pool.submit {
            Dedup.minhashLsh(surv).write.mode("overwrite").parquet(s"$root/pairs")
          }
          pool.submit {
            contamShingles(surv, WebShingleN).repartitionByRange(col("doc_id"))
              .sortWithinPartitions("doc_id")
              .write.mode("overwrite").parquet(s"$root/sh4")
          }
          pool.await()
        } finally pool.drainQuiet()
        graft.Engine.free(surv)
        graft.Engine.free(gK)
        graft.Engine.free(cleaned)
        graft.Engine.free(bClean)
        (fixCut, nDelta)
      }
    (root, fixtureCut, deltaDocs)
  }

  /** q_pipeline_web_append: the increment-maintained canonical chain
    * (see block comment above). Ledger ≡ [[curateWeb]] on base ∪ delta
    * bit-for-bit. */
  def curateWebAppend(spark: SparkSession, dir: String): DataFrame = {
    val (root, fixtureCut, deltaDocs) = stagedWebState(spark, dir)
    val corpus = graft.sources.WebCorpus.enriched(
      Tables(spark, dir, "documents"))
    val delta = corpus.where(deltaPred(fixtureCut))

    // |delta|-billed text work: C4 + Gopher over the increment only
    val dClean = graft.Engine.cut(
      TextOps.c4Clean(delta).select("doc_id", "dropped", "clean_text"))
    val dCleaned = dClean.where(!col("dropped"))
      .select(col("doc_id"), col("clean_text").as("text"))
    val dG = graft.Engine.cut(
      TextOps.qualityGopher(dCleaned).select(col("doc_id"), col("keep")))
    val dSurv = graft.Engine.cut(
      dCleaned.join(dG.where(col("keep")).select("doc_id"), "doc_id"))

    // near-dup: delta bands probe the persisted index (map-side) +
    // batch-local LSH; exact verify candidate-bound via the persisted
    // shingle index ∪ the delta's fresh shingles
    val dBands = Dedup.sigBands(dSurv)
    val cands = Dedup.crossCandidates(spark.read.parquet(s"$root/bands"),
        dBands, deltaDocs * Dedup.Bands)
      .unionAll(Dedup.lshCandidates(dBands)) // disjoint pair spaces
    val newPairs = Dedup.verifyCandidatesIndexed(
      spark.read.parquet(s"$root/sh3").unionByName(Dedup.shingles(dSurv)),
      cands, 0.8, materializePruned = true)
    val comps = Dedup.dupComponents(
      spark.read.parquet(s"$root/pairs").unionAll(newPairs))
    val dupIds = graft.Engine.cut(
      comps.where(col("doc_id") =!= col("comp")).select("doc_id"))

    // id-grain ledger algebra over persisted base flags ∪ delta flags
    val dState = delta.select("doc_id", "lang")
      .join(dClean.select("doc_id", "dropped"), "doc_id")
      .join(dG, Seq("doc_id"), "left")
      .join(TextOps.tokenCounts(dSurv).select("doc_id", "wp_tokens"),
        Seq("doc_id"), "left")
    val allState = spark.read.parquet(s"$root/state").unionByName(dState)

    val survIds = allState.where(!col("dropped") && col("keep")).select("doc_id")
    val canonIds = survIds.join(dupIds, Seq("doc_id"), "left_anti")
    // decontamination over the CURRENT canon set: persisted base
    // 4-shingles ∪ delta 4-shingles, canon-filtered — base docs are
    // re-probed against the updated benchmark shingle set without any
    // base text re-scan
    val sh4 = spark.read.parquet(s"$root/sh4")
      .unionByName(contamShingles(dSurv, WebShingleN))
    val contaminated = contaminatedFromShingles(
      sh4.join(canonIds, Seq("doc_id"), "left_semi"), WebBenchMod)

    val states = allState
      .join(dupIds.withColumn("is_dup", lit(1L)), Seq("doc_id"), "left")
      .join(contaminated.withColumn("is_cont", lit(1L)), Seq("doc_id"), "left")
      .withColumn("state",
        when(col("dropped"), lit("c4_dropped"))
          .when(!col("keep"), lit("gopher_dropped"))
          .when(col("is_dup") === 1L, lit("dup"))
          .when(col("doc_id") % WebBenchMod === 0L, lit("bench"))
          .when(col("is_cont") === 1L, lit("contaminated"))
          .otherwise(lit("kept")))
    val ledger = graft.Engine.cut(states.groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("state") === "c4_dropped", 1L).otherwise(0L)).as("n_c4_dropped"),
        sum(when(col("state") === "gopher_dropped", 1L).otherwise(0L)).as("n_gopher_dropped"),
        sum(when(col("state") === "dup", 1L).otherwise(0L)).as("n_dup"),
        sum(when(col("state") === "bench", 1L).otherwise(0L)).as("n_bench"),
        sum(when(col("state") === "contaminated", 1L).otherwise(0L)).as("n_contaminated"),
        sum(when(col("state") === "kept", 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("state") === "kept", col("wp_tokens")).otherwise(0L))
          .as("kept_tokens")))
    graft.Engine.free(dupIds)
    graft.Engine.free(dSurv)
    graft.Engine.free(dG)
    graft.Engine.free(dClean)
    ledger
  }
}
