package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 has one entry in
  * `queries`; the DuckDB-oracle SQL (when expressible) lives in
  * `oracleSql` under the same key with identical output column names.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * B3 q_wordcount — the reference's proven workload end-to-end. */
  def entry(spark: SparkSession): DataFrame =
    TextOps.wordCount(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_wordcount"       -> ((s, d) => TextOps.wordCount(s, d)),
    "q_scan_project"    -> ((s, d) => Relational.scanProject(s, d)),
    "q_filter"          -> ((s, d) => Relational.filterQuery(s, d)),
    "q_group_sum"       -> ((s, d) => Relational.groupSum(s, d)),
    "q_distinct"        -> ((s, d) => Relational.distinctCount(s, d)),
    "q_rollup"          -> ((s, d) => Relational.rollupSales(s, d)),
    "q_cube"            -> ((s, d) => Relational.cubeSales(s, d)),
    "q_pivot"           -> ((s, d) => Relational.pivotStatus(s, d)),
    "q_sort_limit"      -> ((s, d) => Relational.sortLimit(s, d)),
    "q_quantiles"       -> ((s, d) => Relational.quantiles(s, d)),
    "q_quantiles_approx" -> ((s, d) => Relational.quantilesApprox(s, d)),
    "q_setops"          -> ((s, d) => Relational.setOps(s, d)),
    "q_scalar_string"   -> ((s, d) => Scalars.stringOps(s, d)),
    "q_scalar_datemath" -> ((s, d) => Scalars.dateMath(s, d)),
    "q_scalar_array"    -> ((s, d) => Scalars.arrayOps(s, d)),
    "q_scalar_json"     -> ((s, d) => Scalars.jsonOps(s, d)),
    "q_scalar_null"     -> ((s, d) => Scalars.nullOps(s, d)),
    "q_agg_strings"     -> ((s, d) => Scalars.stringAgg(s, d)),
    "q_join_inner"      -> ((s, d) => Joins.innerJoin(s, d)),
    "q_join_broadcast"  -> ((s, d) => Joins.broadcastJoin(s, d)),
    "q_join_semi_anti"  -> ((s, d) => Joins.semiAntiJoin(s, d)),
    "q_join_outer"      -> ((s, d) => Joins.outerJoin(s, d)),
    "q_join_theta"      -> ((s, d) => Joins.thetaJoin(s, d)),
    "q_join_asof"       -> ((s, d) => Joins.asofJoin(s, d)),
    "q_join_range"      -> ((s, d) => Joins.rangeJoin(s, d)),
    "q_join_bucketed"   -> ((s, d) => Joins.bucketedJoin(s, d)),
    "q_approx_distinct" -> ((s, d) => Relational.approxDistinct(s, d)),
    "q_approx_distinct_det" -> ((s, d) => Relational.approxDistinctDet(s, d)),
    "q_quantiles_sample" -> ((s, d) => Relational.quantilesSample(s, d)),
    "q_window_rank"     -> ((s, d) => Windows.rankTopN(s, d)),
    "q_window_dist"     -> ((s, d) => Windows.distWindows(s, d)),
    "q_window_running"  -> ((s, d) => Windows.runningTotal(s, d)),
    "q_text_stats"      -> ((s, d) => TextOps.textStats(s, d)),
    "q_lang_id"         -> ((s, d) => TextOps.langId(s, d)),
    "q_lang_mix"        -> ((s, d) => TextOps.langMix(s, d)),
    "q_quality_score"   -> ((s, d) => TextOps.qualityScore(s, d)),
    "q_quality_gopher"  -> ((s, d) => TextOps.qualityGopher(s, d)),
    "q_c4_clean"        -> ((s, d) => TextOps.c4Clean(s, d)),
    "q_token_count"     -> ((s, d) => TextOps.tokenCounts(s, d)),
    "q_fingerprint"     -> ((s, d) => TextOps.fingerprint(s, d)),
    "q_winnow"          -> ((s, d) => TextOps.winnow(s, d)),
    "q_winnow_dups"     -> ((s, d) => TextOps.winnowDups(s, d)),
    "q_winnow_dups_indexed" -> ((s, d) => TextOps.winnowDupsIndexed(s, d)),
    "q_winnow_dups_append"  -> ((s, d) => TextOps.winnowDupsAppended(s, d)),
    "q_winnow_spans"    -> ((s, d) => TextOps.winnowSpans(s, d)),
    "q_winnow_stats"    -> ((s, d) => TextOps.winnowStats(s, d)),
    "q_winnow_stats_indexed" -> ((s, d) => TextOps.winnowStatsIndexed(s, d)),
    "q_winnow_cut"      -> ((s, d) => TextOps.winnowCut(s, d)),
    "q_dedup_exact"     -> ((s, d) => Dedup.exactGroups(s, d)),
    "q_dedup_ngram"     -> ((s, d) => Dedup.ngramJaccard(s, d)),
    "q_dedup_minhash"   -> ((s, d) => Dedup.minhashLsh(s, d)),
    "q_dedup_simhash"   -> ((s, d) => Dedup.simhash(s, d)),
    "q_dedup_cc"        -> ((s, d) => Dedup.dupComponents(s, d)),
    "q_dedup_append"    -> ((s, d) => Dedup.dedupAppend(s, d)),
    "q_dedup_keep_best" -> ((s, d) => Dedup.keepBest(s, d)),
    "q_dedup_embed"     -> ((s, d) => Dedup.embedNearDupGrid(s, d)),
    "q_simsearch"       -> ((s, d) => Similarity.bruteForceTopK(s, d)),
    "q_simsearch_lsh"   -> ((s, d) => Similarity.lshTopK(s, d)),
    "q_simsearch_lsh_indexed" -> ((s, d) => Similarity.lshTopKIndexed(s, d)),
    "q_simsearch_lsh_append"  -> ((s, d) => Similarity.lshTopKAppended(s, d)),
    "q_simsearch_mmr"   -> ((s, d) => Similarity.mmrTopK(s, d)),
    "q_simsearch_filtered" -> ((s, d) => Similarity.filteredTopK(s, d)),
    "q_simsearch_ivf_filtered" -> ((s, d) => Similarity.ivfFilteredTopK(s, d)),
    "q_simsearch_ivf_indexed" -> ((s, d) => Similarity.ivfTopKIndexed(s, d)),
    "q_simsearch_ivf_append" -> ((s, d) => Similarity.ivfTopKAppended(s, d)),
    "q_simsearch_ivf"   -> ((s, d) => Similarity.ivfTopK(s, d)),
    "q_simsearch_pq"    -> ((s, d) => Similarity.pqTopK(s, d)),
    "q_simsearch_ivfpq" -> ((s, d) => Similarity.ivfpqTopK(s, d)),
    "q_simsearch_ivfpq_indexed" -> ((s, d) => Similarity.ivfpqTopKIndexed(s, d)),
    "q_simsearch_ivfpq_append" -> ((s, d) => Similarity.ivfpqTopKAppended(s, d)),
    "q_simsearch_pq_indexed" -> ((s, d) => Similarity.pqTopKIndexed(s, d)),
    "q_simsearch_sq"    -> ((s, d) => Similarity.sqTopK(s, d)),
    "q_simsearch_bq"    -> ((s, d) => Similarity.bqTopK(s, d)),
    "q_simsearch_bq_indexed" -> ((s, d) => Similarity.bqTopKIndexed(s, d)),
    "q_simsearch_bq_append"  -> ((s, d) => Similarity.bqTopKAppended(s, d)),
    "q_knn_join"        -> ((s, d) => Similarity.knnJoin(s, d)),
    "q_knn_join_blocked" -> ((s, d) => Similarity.knnJoinBlocked(s, d)),
    "q_knn_graph"       -> ((s, d) => Similarity.knnGraph(s, d)),
    "q_link_predict"    -> ((s, d) => Similarity.linkPredict(s, d)),
    "q_knn_classify"    -> ((s, d) => Similarity.knnClassify(s, d)),
    "q_auc"             -> ((s, d) => Evaluation.aucByType(s, d)),
    "q_ndcg"            -> ((s, d) => Evaluation.ndcgAtK(s, d)),
    "q_confusion"       -> ((s, d) => Evaluation.confusion(s, d)),
    "q_ssjoin"          -> ((s, d) => Dedup.ssjoin(s, d)),
    "q_dbscan"          -> ((s, d) => Clustering.dbscan(s, d)),
    "q_anomaly"         -> ((s, d) => Events.anomalies(s, d)),
    "q_stream_anomaly"  -> ((s, d) => streaming.Streams.streamAnomaly(s, d)),
    "q_kmv_distinct"    -> ((s, d) => Sketches.kmvDistinct(s, d)),
    "q_kmv_ops"         -> ((s, d) => Sketches.kmvOps(s, d)),
    "q_stream_kmv"      -> ((s, d) => streaming.Streams.streamKmv(s, d)),
    "q_hybrid_rrf"      -> ((s, d) => TextOps.hybridRrf(s, d)),
    "q_bootstrap"       -> ((s, d) => Evaluation.bootstrapMeans(s, d)),
    "q_ab_test"         -> ((s, d) => Evaluation.abTest(s, d)),
    "q_chi2"            -> ((s, d) => TextOps.chi2Terms(s, d)),
    "q_incr_agg"        -> ((s, d) => Incremental.incrAgg(s, d)),
    "q_incr_wordcount"  -> ((s, d) => Incremental.incrWordCount(s, d)),
    "q_incr_distinct"   -> ((s, d) => Incremental.incrDistinct(s, d)),
    "q_incr_join"       -> ((s, d) => Incremental.incrJoin(s, d)),
    "q_inverted_index"  -> ((s, d) => TextOps.invertedIndex(s, d)),
    "q_cms_topk"        -> ((s, d) => TextOps.cmsTopTokens(s, d)),
    "q_incr_inverted"   -> ((s, d) => Incremental.incrInverted(s, d)),
    "q_index_lookup"    -> ((s, d) => TextOps.indexLookup(s, d)),
    "q_index_search"    -> ((s, d) => TextOps.indexSearch(s, d)),
    "q_bm25"            -> ((s, d) => TextOps.bm25(s, d)),
    "q_bm25_append"     -> ((s, d) => TextOps.bm25Appended(s, d)),
    "q_index_append"    -> ((s, d) => TextOps.indexLookupAppended(s, d)),
    "q_incr_topk"       -> ((s, d) => Incremental.incrTopk(s, d)),
    "q_stream_wordcount" -> ((s, d) => graft.streaming.Streams.streamWordCount(s, d)),
    "q_stream_neardup"  -> ((s, d) => graft.streaming.Streams.streamNearDup(s, d)),
    "q_zorder_optimize" -> ((s, d) => graft.sources.Sinks.zorderOptimizeRead(s, d)),
    "q_group_topk"      -> ((s, d) => Relational.groupTopK(s, d)),
    "q_kmeans"          -> ((s, d) => Clustering.kmeansSummary(s, d)),
    "q_pca_power"       -> ((s, d) => Clustering.pcaPower(s, d)),
    "q_pca_project"     -> ((s, d) => Clustering.pcaProject(s, d)),
    "q_pca_deflate"     -> ((s, d) => Clustering.pcaDeflate(s, d)),
    "q_pca_topk"        -> ((s, d) => Clustering.pcaTopK(s, d)),
    "q_jl_project"      -> ((s, d) => Clustering.jlProject(s, d)),
    "q_linreg"          -> ((s, d) => Regression.linreg(s, d)),
    "q_linreg_predict"  -> ((s, d) => Regression.linregPredict(s, d)),
    "q_linreg_append"   -> ((s, d) => Regression.linregAppended(s, d)),
    "q_stream_linreg"   -> ((s, d) => streaming.Streams.streamLinreg(s, d)),
    "q_udf_fnv"         -> ((s, d) => MapReduceOps.fnvBuckets(s, d)),
    "q_udaf_typed"      -> ((s, d) => MapReduceOps.typedAgg(s, d)),
    "q_udtf_explode"    -> ((s, d) => MapReduceOps.bigramCounts(s, d)),
    "q_udtf_native"     -> ((s, d) => MapReduceOps.bigramCountsNative(s, d)),
    "q_multimodal"      -> ((s, d) => Multimodal.mediaMeta(s, d)),
    "q_multimodal_frames" -> ((s, d) => Multimodal.frameLedger(s, d)),
    "q_multimodal_decode" -> ((s, d) => Multimodal.imageDecode(s, d)),
    "q_multimodal_resize" -> ((s, d) => Multimodal.imageResize(s, d)),
    "q_multimodal_audio" -> ((s, d) => Multimodal.audioDecode(s, d)),
    "q_multimodal_video" -> ((s, d) => Multimodal.videoFrames(s, d)),
    "q_stream_tumbling" -> ((s, d) => graft.streaming.Streams.tumbling(s, d)),
    "q_stream_sliding"  -> ((s, d) => graft.streaming.Streams.sliding(s, d)),
    "q_stream_session"  -> ((s, d) => graft.streaming.Streams.session(s, d)),
    "q_stream_dedup"    -> ((s, d) => graft.streaming.Streams.dedup(s, d)),
    "q_stream_join"     -> ((s, d) => graft.streaming.Streams.streamJoin(s, d)),
    "q_pipeline_curate" -> ((s, d) => Pipeline.curate(s, d)),
    "q_pipeline_web"    -> ((s, d) => Pipeline.curateWeb(s, d)),
    "q_pipeline_web_append" -> ((s, d) => Pipeline.curateWebAppend(s, d)),
    "q_skew_agg"        -> ((s, d) => Skew.skewedAgg(s, d)),
    "q_skew_join"       -> ((s, d) => Skew.skewedJoin(s, d)),
    "q_partition_prune" -> ((s, d) => graft.sources.Sinks.partitionPruned(s, d)),
    "q_grouping_sets"   -> ((s, d) => Relational.groupingSetsSales(s, d)),
    "q_window_range"    -> ((s, d) => Windows.rangeFrame(s, d)),
    "q_window_value"    -> ((s, d) => Windows.valueWindows(s, d)),
    "q_sample_hash"     -> ((s, d) => Pipeline.hashSample(s, d)),
    "q_mix_temperature" -> ((s, d) => Pipeline.mixTemperature(s, d)),
    "q_passage_dedup"   -> ((s, d) => Dedup.passageDedup(s, d)),
    "q_boilerplate"     -> ((s, d) => Dedup.boilerplateStrip(s, d)),
    "q_sample_stratified" -> ((s, d) => Pipeline.stratifiedHashSample(s, d)),
    "q_pack_tokens"     -> ((s, d) => Pipeline.packTokens(s, d)),
    "q_sql_revenue"     -> ((s, d) => Relational.sqlRevenue(s, d)),
    "q_subquery"        -> ((s, d) => Relational.correlatedSubquery(s, d)),
    "q_recursive"       -> ((s, d) => Relational.recursiveSpine(s, d)),
    "q_source_text"     -> ((s, d) => graft.sources.FileFormats.textWordCount(s, d)),
    "q_source_csv"      -> ((s, d) => graft.sources.FileFormats.csvGroupSum(s, d)),
    "q_source_json"     -> ((s, d) => graft.sources.FileFormats.jsonGroupSum(s, d)),
    "q_repetition"      -> ((s, d) => TextOps.repetition(s, d)),
    "q_repetition_gopher" -> ((s, d) => TextOps.repetitionGopher(s, d)),
    "q_tfidf"           -> ((s, d) => TextOps.tfidfTopTerms(s, d)),
    "q_decontaminate"   -> ((s, d) => Pipeline.decontaminate(s, d)),
    "q_cdc_compact"     -> ((s, d) => Relational.cdcCompact(s, d)),
    "q_sessionize"      -> ((s, d) => Windows.sessionize(s, d)),
    "q_redact"          -> ((s, d) => Scalars.redact(s, d)),
    "q_stream_upsert"   -> ((s, d) => graft.streaming.Streams.upsert(s, d)),
    "q_stream_spend"    -> ((s, d) => graft.streaming.Streams.spendFinal(s, d)),
    "q_stream_ohlc"     -> ((s, d) => graft.streaming.Streams.streamOhlc(s, d)),
    "q_stream_typecounts" -> ((s, d) => graft.streaming.Streams.typeCountsFinal(s, d)),
    "q_stream_recent"   -> ((s, d) => graft.streaming.Streams.recentFinal(s, d)),
    "q_stream_usersession" -> ((s, d) => graft.streaming.Streams.userSessions(s, d)),
    "q_zorder"          -> ((s, d) => graft.sources.Sinks.zorderRead(s, d)),
    "q_join_fuzzy"      -> ((s, d) => Joins.fuzzyJoin(s, d)),
    "q_histogram"       -> ((s, d) => Relational.histogram(s, d)),
    "q_histogram2d"     -> ((s, d) => Relational.histogram2d(s, d)),
    "q_profile"         -> ((s, d) => Relational.profile(s, d)),
    "q_stats_moments"   -> ((s, d) => Relational.momentStats(s, d)),
    "q_dpp"             -> ((s, d) => graft.sources.Sinks.dppJoin(s, d)),
    "q_schema_evolution" -> ((s, d) => graft.sources.FileFormats.schemaEvolution(s, d)),
    "q_row_ids"         -> ((s, d) => Pipeline.globalRowIds(s, d)),
    "q_shuffle"         -> ((s, d) => Pipeline.shuffle(s, d)),
    "q_funnel"          -> ((s, d) => Events.funnel(s, d)),
    "q_ohlc"            -> ((s, d) => Events.ohlcBars(s, d)),
    "q_expectations"    -> ((s, d) => Relational.expectations(s, d)),
    "q_cohort"          -> ((s, d) => Events.cohort(s, d)),
    "q_lm_score"        -> ((s, d) => TextOps.lmScore(s, d)),
    "q_outliers"        -> ((s, d) => Relational.outliers(s, d)),
    "q_mad"             -> ((s, d) => Relational.madOutliers(s, d)),
    "q_group_quantiles" -> ((s, d) => Relational.groupQuantiles(s, d)),
    "q_winsorize"       -> ((s, d) => Relational.winsorize(s, d)),
    "q_pagerank"        -> ((s, d) => Graphs.pageRank(s, d)),
    "q_bfs"             -> ((s, d) => Graphs.bfsDistances(s, d)),
    "q_sssp"            -> ((s, d) => Graphs.ssspDistances(s, d)),
    "q_ppr"             -> ((s, d) => Graphs.personalizedPageRank(s, d)),
    "q_label_prop"      -> ((s, d) => Graphs.labelProp(s, d)),
    "q_hits"            -> ((s, d) => Graphs.hits(s, d)),
    "q_basket_pairs"    -> ((s, d) => Graphs.basketPairs(s, d)),
    "q_stream_enrich"   -> ((s, d) => graft.streaming.Streams.enrich(s, d)),
    "q_scd2"            -> ((s, d) => Relational.scd2(s, d)),
    "q_topk_sketch"     -> ((s, d) => TextOps.approxTopTokens(s, d)),
    "q_fill_forward"    -> ((s, d) => Windows.fillForward(s, d)),
    "q_entity_resolve"  -> ((s, d) => Joins.entityResolve(s, d)),
    "q_unpivot"         -> ((s, d) => Relational.unpivotMeasures(s, d)),
    "q_kanon"           -> ((s, d) => Relational.kanonymize(s, d)),
    "q_split"           -> ((s, d) => Pipeline.splitTag(s, d)),
    "q_split_leakage"   -> ((s, d) => Pipeline.splitByCluster(s, d)),
    "q_compact"         -> ((s, d) => graft.sources.Sinks.compactRead(s, d)),
    "q_sequence"        -> ((s, d) => Events.transitions(s, d)),
    "q_join_bloom"      -> ((s, d) => Joins.bloomJoin(s, d)),
    "q_stream_outer"    -> ((s, d) => graft.streaming.Streams.streamJoinOuter(s, d)),
    "q_feature_hash"    -> ((s, d) => TextOps.featureHash(s, d)),
    "q_sample_group"    -> ((s, d) => Pipeline.groupSample(s, d)),
    "q_source_orc"      -> ((s, d) => graft.sources.FileFormats.orcGroupSum(s, d)),
    "q_quarantine"      -> ((s, d) => graft.sources.FileFormats.quarantine(s, d)),
    "q_partition_overwrite" -> ((s, d) => graft.sources.Sinks.partitionOverwriteRead(s, d)),
    "q_triangle"        -> ((s, d) => Graphs.triangles(s, d)),
    "q_triangle_approx" -> ((s, d) => Graphs.trianglesApprox(s, d)),
    "q_random_walk"     -> ((s, d) => Graphs.randomWalk(s, d)),
    "q_walk_pairs"      -> ((s, d) => Graphs.walkPairs(s, d)),
    "q_node2vec"        -> ((s, d) => Graphs.node2vec(s, d)),
    "q_kcore"           -> ((s, d) => Graphs.kcore(s, d)),
    "q_pmi"             -> ((s, d) => TextOps.collocations(s, d)),
    "q_ngram_df"        -> ((s, d) => TextOps.ngramDocFreq(s, d)),
    "q_sample_weighted" -> ((s, d) => Pipeline.weightedSample(s, d)),
    "q_join_interval"   -> ((s, d) => Joins.intervalJoin(s, d)),
    "q_bpe"             -> ((s, d) => TextOps.bpeLearn(s, d)),
    "q_bpe_encode"      -> ((s, d) => TextOps.bpeEncodeDeclared(s, d)),
    "q_skyline"         -> ((s, d) => Relational.skyline(s, d)),
    "q_dedup_contain"   -> ((s, d) => Dedup.containmentPairs(s, d)),
    "q_dedup_semantic"  -> ((s, d) => Dedup.semanticDedupFixed(s, d)),
    "q_source_binary"   -> ((s, d) => graft.sources.FileFormats.binaryChecksums(s, d)),
    "q_cogroup"         -> ((s, d) => MapReduceOps.cogroupReconcile(s, d)),
    "q_source_xml"      -> ((s, d) => graft.sources.FileFormats.xmlGroupSum(s, d)),
    "q_histogram_eq"    -> ((s, d) => Relational.equiDepth(s, d)),
    "q_corr_matrix"     -> ((s, d) => Relational.corrMatrix(s, d)),
    "q_degree_dist"     -> ((s, d) => Graphs.degreeDist(s, d)),
    "q_stream_topevent" -> ((s, d) => graft.streaming.Streams.topEvent(s, d)),
    "q_snapshot_diff"   -> ((s, d) => Relational.snapshotDiff(s, d)),
    "q_merge"           -> ((s, d) => Relational.mergeUpsert(s, d)),
    "q_embed_centroid"  -> ((s, d) => Clustering.labelCentroids(s, d)),
    "q_nearest_centroid" -> ((s, d) => Clustering.nearestCentroid(s, d)),
    "q_gini"            -> ((s, d) => Relational.giniByGroup(s, d)),
    "q_chunk"           -> ((s, d) => Pipeline.chunk(s, d)),
    "q_dedup_stats"     -> ((s, d) => Dedup.dedupStats(s, d)),
    "q_dedup_cross"     -> ((s, d) => Dedup.dedupCross(s, d))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver rows-only check. */
  def oracleSql: Map[String, String] = Map(
    "q_wordcount" -> wordcountOracle,
    "q_scan_project" ->
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem",
    "q_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem WHERE l_quantity > 30 AND l_returnflag = 'R'""".stripMargin,
    "q_group_sum" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(sum(l_extendedprice), 2) AS sum_price,
        |       round(avg(l_discount), 4) AS avg_disc,
        |       count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q_distinct" ->
      """SELECT o_orderstatus,
        |       count(DISTINCT o_custkey) AS uniq_custs,
        |       count(*) AS cnt
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "q_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
        |       coalesce(l_linestatus, 'ALL') AS status,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       count(*) AS cnt
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    "q_quantiles" ->
      """SELECT l_returnflag,
        |       round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        |       round(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
        |       count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    // deterministic HLL: FNV bucket/rank registers + the integer-rational
    // raw estimator, replayed exactly (operators/Relational.approxDistinctDet)
    "q_approx_distinct_det" -> hllOracle,
    // incremental registers max-merge to the full-corpus registers
    // (max is associative + idempotent), so the maintained sketch
    // shares the one-shot sketch's oracle verbatim; the state/delta
    // split is spec-asserted on the plan (IncrementalSpec)
    "q_incr_distinct" -> hllOracle,
    // maintained join view == the full aggregated join (BIGINT cent
    // partials are associative across the three delta terms)
    "q_incr_join" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
        |                     AS BIGINT)) AS BIGINT) AS revenue_cents,
        |       count(*) AS n_lines
        |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |GROUP BY 1""".stripMargin,
    // inverted index: bounded ascending-id postings — the TopKByScore
    // buffer at score = −doc_id ≡ sorted-ascending first-cap slice
    "q_inverted_index" -> invertedOracle,
    // the maintained index folds disjoint-slice partials (sum df/tf,
    // capped-list merge law), landing on the one-shot index exactly —
    // shared oracle; the state/delta plan split is spec-asserted
    "q_incr_inverted" -> invertedOracle,
    // conjunctive lookup served from the postings artifact ≡ a direct
    // tokenized filter over the corpus (which is what DuckDB runs —
    // the index is an access path, not a semantics change)
    "q_index_lookup" -> lookupOracle,
    // the appended artifact holds exactly the full-corpus posting row
    // set (disjoint doc slices → disjoint exact rows) — shared oracle
    "q_index_append" -> lookupOracle,
    // ranked OR-retrieval: linear tf·N/df weights (the q_tfidf
    // convention — no libm log), sum over ≤2 per-doc rows is
    // order-independent, top-k under the (score, doc_id) total order
    "q_index_search" -> {
      val (t1, t2) = graft.operators.TextOps.LookupTerms
      val k = graft.operators.TextOps.SearchK
      s"""WITH t AS (
         |  SELECT doc_id,
         |         unnest(list_filter(string_split_regex(lower(text), '$Ws'), x -> x != '')) AS word
         |  FROM documents
         |), d AS (
         |  SELECT word, doc_id, CAST(count(*) AS BIGINT) AS tf FROM t
         |  WHERE word IN ('$t1', '$t2') GROUP BY 1, 2
         |), wts AS (
         |  SELECT doc_id,
         |         CAST(tf AS DOUBLE) * (SELECT count(*) FROM documents)
         |           / count(*) OVER (PARTITION BY word) AS weight
         |  FROM d
         |)
         |SELECT doc_id, sum(weight) AS score, CAST(count(*) AS BIGINT) AS terms_hit
         |FROM wts GROUP BY doc_id
         |ORDER BY score DESC, doc_id LIMIT $k""".stripMargin
    },
    // BM25 replayed exactly: same tokenization, df/dl/N/T from the
    // corpus, the single integer division per (doc, term) — `//` ≡
    // Spark's div on the non-negative operands
    "q_bm25" -> oracleSqlBm25,
    // lexical ∪ semantic lists fused by integer RRF — the BM25 chain
    // and the single-query cosine chain composed, one truth
    "q_hybrid_rrf" -> oracleSqlHybridRrf,
    // appended artifacts hold exactly the one-shot row sets (per-doc
    // pure posting/dl rows over disjoint slices) -> q_bm25's oracle
    "q_bm25_append" -> oracleSqlBm25,
    // Count-Min sketch: the whole build (FNV+avalanche row-seeded
    // hashes, width mask, counter sums) and the min-over-rows point
    // queries replayed integer-exact
    "q_cms_topk" -> {
      val d = graft.operators.TextOps.CmsDepth
      val w = graft.operators.TextOps.CmsWidth
      s"""WITH wc AS (
         |  SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM (
         |    SELECT unnest(list_filter(string_split_regex(lower(text), '$Ws'), x -> x != '')) AS word
         |    FROM documents) GROUP BY word
         |), cells0 AS (
         |  SELECT word, cnt, j,
         |    list_reduce(list_prepend(CAST(2166136261 AS BIGINT),
         |      ${utf8BytesSql("CAST(j AS VARCHAR) || ':' || word")}),
         |      (h, c) -> (xor(h, c) * 16777619) % 4294967296) AS h
         |  FROM wc, (SELECT unnest(range($d)) AS j)
         |), c1 AS (
         |  SELECT word, cnt, j, (xor(h >> 16, h) * 73244475) % 4294967296 AS h FROM cells0
         |), c2 AS (
         |  SELECT word, cnt, j, (xor(h >> 16, h) * 73244475) % 4294967296 AS h FROM c1
         |), cells AS (
         |  SELECT word, cnt, j, xor(h >> 16, h) % $w AS cell FROM c2
         |)
         |SELECT word, cnt, CAST(min(c) AS BIGINT) AS cms_est FROM (
         |  SELECT word, cnt, sum(cnt) OVER (PARTITION BY j, cell) AS c FROM cells)
         |GROUP BY word, cnt
         |ORDER BY cms_est DESC, word LIMIT 20""".stripMargin
    },
    // deterministic-sample quantiles: same FNV keep-predicate, same
    // type-1 rank selection (operators/Relational.quantilesSample)
    "q_quantiles_sample" ->
      s"""WITH s0 AS (
         |  SELECT l_returnflag, l_extendedprice, l_orderkey, l_linenumber,
         |    list_reduce(list_prepend(CAST(2166136261 AS BIGINT),
         |      ${utf8BytesSql("CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)")}),
         |      (h, c) -> (xor(h, c) * 16777619) % 4294967296) AS h
         |  FROM lineitem
         |), s1 AS (
         |  SELECT * REPLACE ((xor(h >> 16, h) * 73244475) % 4294967296 AS h) FROM s0
         |), s2 AS (
         |  SELECT * REPLACE ((xor(h >> 16, h) * 73244475) % 4294967296 AS h) FROM s1
         |), s AS (
         |  SELECT * REPLACE (xor(h >> 16, h) AS h) FROM s2
         |), k AS (
         |  SELECT l_returnflag, l_extendedprice,
         |         row_number() OVER (PARTITION BY l_returnflag
         |           ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
         |         count(*) OVER (PARTITION BY l_returnflag) AS n
         |  FROM s WHERE h % 10 = 0
         |)
         |SELECT l_returnflag,
         |       max(CASE WHEN rn = (n + 1) // 2 THEN l_extendedprice END) AS p50_s,
         |       max(CASE WHEN rn = (19 * n + 19) // 20 THEN l_extendedprice END) AS p95_s,
         |       CAST(max(n) AS BIGINT) AS n_sample
         |FROM k GROUP BY l_returnflag""".stripMargin,
    "q_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |       coalesce(o_orderpriority, 'ALL') AS prio,
        |       round(sum(o_totalprice), 2) AS sum_price,
        |       count(*) AS cnt
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin,
    "q_pivot" ->
      """SELECT o_orderpriority,
        |       count(*) FILTER (o_orderstatus = 'F') AS n_f,
        |       count(*) FILTER (o_orderstatus = 'O') AS n_o,
        |       count(*) FILTER (o_orderstatus = 'P') AS n_p
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q_sort_limit" ->
      """SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price
        |FROM lineitem
        |ORDER BY price DESC, l_orderkey, l_linenumber LIMIT 10""".stripMargin,
    "q_setops" ->
      """WITH a AS (SELECT DISTINCT o_custkey AS custkey FROM orders),
        |     b AS (SELECT c_custkey AS custkey FROM customer
        |           WHERE c_mktsegment = 'BUILDING')
        |SELECT 'union' AS op, count(*) AS cnt
        |  FROM (SELECT custkey FROM a UNION SELECT custkey FROM b)
        |UNION ALL
        |SELECT 'intersect' AS op, count(*) AS cnt
        |  FROM (SELECT custkey FROM a INTERSECT SELECT custkey FROM b)
        |UNION ALL
        |SELECT 'except' AS op, count(*) AS cnt
        |  FROM (SELECT custkey FROM a EXCEPT SELECT custkey FROM b)""".stripMargin,
    "q_scalar_string" ->
      """SELECT doc_id,
        |       substring(lower(text), 1, 20) AS head,
        |       length(text) AS len,
        |       concat_ws('|', lang, source) AS tag,
        |       regexp_extract(text, '([a-z]+)', 1) AS first_word,
        |       reverse(source) AS rsource
        |FROM documents""".stripMargin,
    "q_scalar_datemath" ->
      """SELECT o_orderkey,
        |       year(o_orderdate) AS yr,
        |       month(o_orderdate) AS mo,
        |       day(o_orderdate) AS dom,
        |       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        |       date_diff('day', DATE '2024-01-01', CAST(o_orderdate AS DATE)) AS days_since,
        |       round(o_totalprice, 2) AS price_r,
        |       CAST(floor(abs(o_totalprice - 1000.0)) AS BIGINT) AS absdiff,
        |       o_orderkey % 7 AS k7,
        |       round(sqrt(o_totalprice), 3) AS price_sqrt
        |FROM orders""".stripMargin,
    "q_scalar_array" ->
      """SELECT vec_id,
        |       len(embedding) AS dim,
        |       round(CAST(embedding[1] AS DOUBLE), 4) + 0.0 AS first_val,
        |       round(list_reduce(
        |         list_prepend(0.0, list_transform(embedding, x -> CAST(x AS DOUBLE))),
        |         (acc, x) -> acc + x), 4) + 0.0 AS vsum,
        |       round(sqrt(list_reduce(
        |         list_prepend(0.0, list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
        |         (acc, x) -> acc + x)), 4) + 0.0 AS norm
        |FROM embeddings""".stripMargin,
    "q_scalar_json" ->
      """SELECT event_id,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events""".stripMargin,
    "q_scalar_null" ->
      """WITH d AS (
        |  SELECT o_orderkey, o_orderstatus, o_orderpriority,
        |         CASE WHEN o_orderstatus = 'P' THEN NULL
        |              ELSE o_orderpriority END AS prio_n
        |  FROM orders
        |)
        |SELECT o_orderkey,
        |       coalesce(prio_n, 'none') AS prio_or_none,
        |       nullif(o_orderstatus, 'P') AS status_or_null,
        |       (prio_n IS NOT DISTINCT FROM o_orderpriority) AS same_prio,
        |       (prio_n IS NULL) AS prio_missing
        |FROM d""".stripMargin,
    "q_agg_strings" ->
      """SELECT r_name,
        |       string_agg(n_name, ',' ORDER BY n_name) AS nations,
        |       CAST(count(DISTINCT n_nationkey) AS BIGINT) AS n_distinct
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,
    "q_join_inner" ->
      """SELECT o_orderkey, c_custkey, c_name, round(o_totalprice, 2) AS price
        |FROM orders JOIN customer ON o_custkey = c_custkey""".stripMargin,
    "q_join_bucketed" ->
      """SELECT c_mktsegment, count(*) AS cnt,
        |       round(sum(o_totalprice), 2) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "q_join_broadcast" ->
      """SELECT r_name, n_name, count(*) AS cnt, round(sum(c_acctbal), 2) AS bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
    "q_join_semi_anti" ->
      """SELECT 'semi' AS op, count(*) AS cnt FROM customer
        |  WHERE c_custkey IN (SELECT o_custkey FROM orders)
        |UNION ALL
        |SELECT 'anti' AS op, count(*) AS cnt FROM customer
        |  WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)""".stripMargin,
    "q_join_theta" ->
      """SELECT l_returnflag, count(*) AS cnt
        |FROM orders JOIN lineitem
        |  ON l_orderkey = o_orderkey AND l_shipdate > o_orderdate
        |GROUP BY l_returnflag""".stripMargin,
    // NOT DuckDB's ASOF JOIN: its choice among orders tying on the
    // as-of date is unspecified (passes today only because the fixture
    // is orderkey-sorted); this explicit argmax pins the same tie-break
    // the Spark window uses (max date, then max orderkey).
    "q_join_asof" ->
      """WITH cand AS (
        |  SELECT e.event_id, e.user_id, o.o_orderkey,
        |    row_number() OVER (PARTITION BY e.event_id
        |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e
        |  LEFT JOIN orders o
        |    ON e.user_id = o.o_custkey
        |   AND o.o_orderdate <= date_trunc('microseconds', e.ts)
        |)
        |SELECT event_id, user_id, o_orderkey FROM cand WHERE rn = 1""".stripMargin,
    "q_join_range" ->
      """WITH bands(band, lo, hi) AS (
        |  VALUES ('low', 0.0, 25.0), ('mid', 25.0, 50.0),
        |         ('high', 50.0, 75.0), ('top', 75.0, 1e9)
        |)
        |SELECT band, count(*) AS cnt, round(sum(value), 2) AS sum_v
        |FROM events JOIN bands ON value >= lo AND value < hi
        |GROUP BY band""".stripMargin,
    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price, rn
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |             row_number() OVER (PARTITION BY o_custkey
        |               ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |      FROM orders)
        |WHERE rn <= 3""".stripMargin,
    "q_window_dist" ->
      """SELECT o_custkey, o_orderkey,
        |       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |       percent_rank() OVER w AS pct_rank,
        |       cume_dist() OVER w AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)""".stripMargin,
    "q_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |         ORDER BY o_orderdate, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_rev,
        |       round(lag(o_totalprice, 1) OVER (PARTITION BY o_custkey
        |         ORDER BY o_orderdate, o_orderkey), 2) AS prev_price
        |FROM orders""".stripMargin,
    "q_text_stats" ->
      s"""WITH tk AS (
         |  SELECT lang, doc_id,
         |         unnest(list_filter(string_split_regex(lower(text), '$Ws'), x -> x != '')) AS tok
         |  FROM documents
         |), a AS (
         |  SELECT lang, count(DISTINCT doc_id) AS n_docs, count(*) AS n_tokens,
         |         count(DISTINCT tok) AS n_types
         |  FROM tk GROUP BY lang
         |), c AS (
         |  SELECT lang, round(avg(n_chars), 2) AS avg_chars FROM documents GROUP BY lang
         |)
         |SELECT a.lang, n_docs, n_tokens, n_types, avg_chars,
         |       CAST(n_types AS DOUBLE) / n_tokens AS ttr
         |FROM a JOIN c USING (lang)""".stripMargin,
    "q_lang_id" ->
      s"""WITH t AS (
         |  SELECT doc_id, list_filter(string_split_regex(lower(text), '$Ws'), x -> x != '') AS toks
         |  FROM documents
         |), s AS (
         |  SELECT doc_id,
         |    CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','to','is'))) AS BIGINT) AS s_en,
         |    CAST(len(list_filter(toks, x -> x IN ('der','die','und','das','ist','ein'))) AS BIGINT) AS s_de,
         |    CAST(len(list_filter(toks, x -> x IN ('le','la','et','les','des','un'))) AS BIGINT) AS s_fr,
         |    CAST(len(list_filter(toks, x -> x IN ('el','los','las','una','es','y'))) AS BIGINT) AS s_es
         |  FROM t
         |)
         |SELECT doc_id, s_en, s_de, s_fr, s_es,
         |  CASE WHEN s_en > 0 AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
         |       WHEN s_de > 0 AND s_de >= s_en AND s_de >= s_fr AND s_de >= s_es THEN 'de'
         |       WHEN s_fr > 0 AND s_fr >= s_en AND s_fr >= s_de AND s_fr >= s_es THEN 'fr'
         |       WHEN s_es > 0 AND s_es >= s_en AND s_es >= s_de AND s_es >= s_fr THEN 'es'
         |       ELSE 'und' END AS pred_lang
         |FROM s""".stripMargin,
    // passage-grain language mixing: same profiles/argmax as q_lang_id
    // at 10-token windows, dominant share as one exact integer division
    "q_lang_mix" -> langMixOracle,
    "q_quality_score" ->
      s"""WITH t AS (
         |  SELECT doc_id, text,
         |         list_filter(string_split_regex(lower(text), '$Ws'), x -> x != '') AS toks
         |  FROM documents
         |), w AS (
         |  SELECT doc_id, text, toks, CAST(len(toks) AS BIGINT) AS n_tok FROM t
         |), r AS (
         |  -- zero-token / empty-text guards mirror the Spark operator's
         |  -- explicit 0.0 (unguarded /0 differs between the engines)
         |  SELECT doc_id, n_tok,
         |    CASE WHEN n_tok <= 0 THEN 0.0 ELSE
         |      CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |             list_transform(toks, x -> CAST(length(x) AS BIGINT))),
         |           (a, x) -> a + x) AS DOUBLE) / n_tok END AS avg_tok_len,
         |    CASE WHEN n_tok <= 0 THEN 0.0 ELSE
         |      CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','to','is'))) AS DOUBLE)
         |        / n_tok END AS stop_ratio,
         |    CASE WHEN length(text) <= 0 THEN 0.0 ELSE
         |      CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE)
         |        / length(text) END AS alpha_ratio
         |  FROM w
         |)
         |SELECT doc_id, n_tok, avg_tok_len, stop_ratio, alpha_ratio,
         |       least(CAST(n_tok AS DOUBLE) / 50.0, 1.0) * 0.3
         |         + stop_ratio * 0.3 + alpha_ratio * 0.4 AS score
         |FROM r""".stripMargin,
    // Gopher document-level rules: every counter integer, every ratio
    // ONE double division with matched operand order, flags compare
    // the identical doubles — bit-exact across engines. The signal CTE
    // chain is shared with q_pipeline_web (gopherCtes — no drift).
    "q_quality_gopher" ->
      s"""WITH $webDocsCte, ${gopherCtes("", "webdocs")}
         |SELECT doc_id, n_words, mean_word_len, symbol_ratio, bullet_frac,
         |       ellipsis_frac, alpha_frac, stop_hits,
         |  n_words >= 50 AND n_words <= 100000 AS g_words,
         |  mean_word_len >= 3.0 AND mean_word_len <= 10.0 AS g_mean_len,
         |  symbol_ratio <= 0.1 AS g_symbol,
         |  bullet_frac <= 0.9 AS g_bullets,
         |  ellipsis_frac <= 0.3 AS g_ellipsis,
         |  alpha_frac >= 0.8 AS g_alpha,
         |  stop_hits >= $GopherMinStops AS g_stops,
         |  $GopherKeepSql AS keep
         |FROM r""".stripMargin,
    // C4 line-level cleaning: the same keep-lambda replayed over DuckDB
    // lists; drop-reason precedence is the same CASE chain. The CTE
    // chain is shared with q_pipeline_web (c4Ctes — no drift).
    "q_c4_clean" ->
      s"""WITH $webDocsCte, ${c4Ctes("", "webdocs")}
         |SELECT doc_id, n_lines, n_kept, drop_reason,
         |  drop_reason != 'none' AS dropped,
         |  CASE WHEN drop_reason != 'none' THEN ''
         |       ELSE array_to_string(kept, chr(10)) END AS clean_text
         |FROM r""".stripMargin,
    // the stitched canonical curation chain: per-stage CTEs are the
    // SAME builders / SQL text the individual stage oracles replay
    "q_pipeline_web" -> webOracle,
    // the increment-maintained chain carries the ONE-SHOT oracle
    // verbatim (the q_dedup_append convention): per-doc stage flags are
    // pure functions of the doc, the band/candidate union equals the
    // one-shot candidate set, and the ledger algebra is recomputed over
    // the merged states — so append-then-curate ≡ curate(base ∪ delta)
    "q_pipeline_web_append" -> webOracle,
    // Gopher repetition rules: integer unit/gram counts, each fraction
    // ONE operand-order-matched double division; thresholds
    // interpolated from the operator's constants
    "q_repetition_gopher" -> repetitionGopherOracle,
    "q_token_count" ->
      s"""SELECT doc_id,
         |  CAST(len(list_filter(string_split_regex(lower(text), '$Ws'), x -> x != '')) AS BIGINT) AS ws_tokens,
         |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 \\t\\n\\r\\f\\x0B]')) AS BIGINT) AS wp_tokens
         |FROM documents""".stripMargin,
    "q_fingerprint" ->
      """WITH b AS (
        |  SELECT doc_id, lower(text) AS t FROM documents
        |), c AS (
        |  SELECT doc_id, t,
        |    list_transform(range(1, length(t) + 1),
        |      i -> CAST(ascii(substr(t, CAST(i AS INTEGER), 1)) AS BIGINT)) AS codes
        |  FROM b
        |)
        |SELECT doc_id,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT), codes),
        |    (a, x) -> (a * 31 + x) % 1000000007) AS full_fp,
        |  CASE WHEN length(t) >= 8 THEN
        |    list_aggregate(list_transform(range(1, length(t) - 6),
        |      i -> list_reduce(list_prepend(CAST(0 AS BIGINT), list_slice(codes, i, i + 7)),
        |             (a, x) -> (a * 31 + x) % 1000000007)), 'min')
        |  ELSE list_reduce(list_prepend(CAST(0 AS BIGINT), codes),
        |         (a, x) -> (a * 31 + x) % 1000000007) END AS win_fp
        |FROM c""".stripMargin,
    // winnowing selection replayed exactly: per-position gram hashes
    // (the q_fingerprint fold), per-window rightmost-min via
    // list_position over the reversed slice, the same pos·2³⁰+fp
    // encoding decoded back to (pos, fp) — integer throughout
    "q_winnow" ->
      s"""$winnowSelCte
         |SELECT doc_id, CAST(u.enc // ${functions.WinnowFp.Enc} AS BIGINT) AS pos,
         |       CAST(u.enc % ${functions.WinnowFp.Enc} AS BIGINT) AS fp
         |FROM sel, unnest(encs) AS u(enc)""".stripMargin,
    "q_winnow_dups" -> winnowDupsOracle,
    // the staged/appended serves are bit-identical (integer fp and the
    // gram string round-trip parquet exactly; the per-doc selection is
    // a pure function, so appended rows ≡ one-shot rows) — all three
    // forms share the ONE oracle replay
    "q_winnow_dups_indexed" -> winnowDupsOracle,
    "q_winnow_dups_append" -> winnowDupsOracle,
    // duplicated-region spans: shared verified grams → per-doc
    // gaps-and-islands interval merge, the same window forms in both
    // engines (running max over preceding rows, running sum island id)
    "q_winnow_spans" -> winnowSpansOracle,
    // per-doc duplication coverage: the spans oracle aggregated, left
    // joined onto codepoint lengths; one double division, same order
    "q_winnow_stats" -> winnowStatsOracle,
    // stats-grain staged serve (VERDICT r12 #4): ≡ live bit-for-bit —
    // integer fp/pos and the gram string round-trip parquet exactly,
    // the doc-length sidecar is a pure projection, and the double
    // division has the same operand order — so the live oracle replay
    // is shared verbatim
    "q_winnow_stats_indexed" -> winnowStatsOracle,
    // keep-first-occurrence substring surgery: non-keeper duplicated
    // positions → islands → spans excised, segments reassembled with
    // string_agg ORDER BY (the Spark side folds the same sorted spans)
    "q_winnow_cut" -> winnowCutOracle,
    "q_dedup_exact" ->
      s"""SELECT md5(regexp_replace(trim(lower(text)), '$Ws', ' ', 'g')) AS h,
         |       min(doc_id) AS keep_id, count(*) AS copies
         |FROM documents GROUP BY 1""".stripMargin,
    "q_dedup_ngram" -> jaccardOracle(0.5),
    "q_dedup_minhash" -> jaccardOracle(0.8),
    // cross-source contamination matrix: the exhaustive-pairs CTEs
    // joined to the (doc_id, source) projection — same probabilistic
    // equivalence note as q_dedup_minhash
    "q_dedup_cross" ->
      s"""${jaccardPairsCtes(0.8)},
         |s AS (SELECT doc_id, source FROM documents)
         |SELECT least(x.source, y.source) AS source_a,
         |       greatest(x.source, y.source) AS source_b,
         |       count(*) AS n_pairs
         |FROM p JOIN s x ON p.da = x.doc_id JOIN s y ON p.db = y.doc_id
         |GROUP BY 1, 2""".stripMargin,
    // exact prefix-filtered set-similarity join: the oracle is the
    // BRUTE-FORCE inverted-index join with the integer acceptance
    // predicate — deliberately NOT a replay of the prefix filter, so a
    // green row proves the filter lossless end-to-end (candidates ⊇
    // truth) as well as the verification exact. Shingle text here vs
    // 64-bit shingle hashes in the engine: sizes and intersections
    // agree up to the same ~2⁻⁶⁴ birthday term the whole dedup family
    // documents.
    "q_ssjoin" ->
      s"""WITH toks AS (
         |  SELECT doc_id, list_filter(string_split_regex(lower(text), '$Ws'), x -> x != '') AS ts
         |  FROM documents
         |), sh AS (
         |  SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
         |  FROM toks, unnest(range(1, len(ts) - 1)) AS u(i)
         |  WHERE len(ts) >= 3
         |), sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
         |iv AS (
         |  SELECT a.doc_id AS da, b.doc_id AS db, CAST(count(*) AS BIGINT) AS inter
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |)
         |SELECT da, db, inter, x.n AS na, y.n AS nb,
         |       (1000000 * inter) // (x.n + y.n - inter) AS jacc_micro
         |FROM iv JOIN sz x ON da = x.doc_id JOIN sz y ON db = y.doc_id
         |WHERE 9 * inter >= 4 * (x.n + y.n)""".stripMargin,
    // components of the J >= 0.8 pair graph: min reachable id per node
    // via a recursive transitive closure (tiny graph — pairs only)
    "q_dedup_cc" -> ccOracle,
    // online first-arrival-wins near-dup filter ≡ batch semantics
    // (band rows are per-doc pure functions, so chunking is invisible):
    // dup_of = smallest J≥0.8 partner below me, NULL = keep
    "q_stream_neardup" ->
      s"""WITH p AS (
         |  SELECT da, db FROM (${jaccardOracle(0.8)})
         |), d AS (
         |  SELECT db AS doc_id, min(da) AS dup_of FROM p GROUP BY db
         |)
         |SELECT doc_id, d.dup_of, d.dup_of IS NULL AS keep
         |FROM documents LEFT JOIN d USING (doc_id)""".stripMargin,
    // incremental append-then-dedup ≡ one-shot dedup of the full corpus
    // (band rows are per-doc pure functions — see Dedup.dedupAppend),
    // so the oracle is q_dedup_cc's, verbatim
    "q_dedup_append" -> ccOracle,
    // keep-best: q_dedup_cc's components + a quality argmax per cluster;
    // row_number mirrors max_by(doc_id, struct(n_chars, -doc_id))
    "q_dedup_keep_best" ->
      s"""WITH RECURSIVE toks AS (
         |  SELECT doc_id, list_filter(string_split_regex(lower(text), '$Ws'), x -> x != '') AS ts
         |  FROM documents
         |), sh AS (
         |  SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
         |  FROM toks, unnest(range(1, len(ts) - 1)) AS u(i)
         |  WHERE len(ts) >= 3
         |), sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |iv AS (
         |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS ic
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id
         |), pairs AS (
         |  SELECT da, db
         |  FROM iv JOIN sz x ON da = x.doc_id JOIN sz y ON db = y.doc_id
         |  WHERE CAST(ic AS DOUBLE) / (x.n + y.n - ic) >= 0.8
         |), edges AS (
         |  SELECT da AS u, db AS v FROM pairs
         |  UNION ALL SELECT db, da FROM pairs
         |), reach AS (
         |  SELECT DISTINCT u AS node, u AS r FROM edges
         |  UNION
         |  SELECT e.u AS node, t.r FROM edges e JOIN reach t ON e.v = t.node
         |), comp AS (
         |  SELECT node AS doc_id, min(r) AS comp FROM reach GROUP BY node
         |), lab AS (
         |  SELECT d.doc_id, coalesce(c.comp, d.doc_id) AS comp, d.n_chars
         |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
         |), best AS (
         |  SELECT comp, doc_id AS canonical_id FROM (
         |    SELECT comp, doc_id,
         |           row_number() OVER (PARTITION BY comp
         |                              ORDER BY n_chars DESC, doc_id) AS rn
         |    FROM lab) WHERE rn = 1
         |)
         |SELECT l.doc_id, b.canonical_id,
         |       l.doc_id = b.canonical_id AS is_canonical
         |FROM lab l JOIN best b ON l.comp = b.comp""".stripMargin,
    "q_dedup_simhash" ->
      s"""WITH tc AS (
         |  SELECT doc_id, tok, count(*) AS cnt FROM (
         |    SELECT doc_id,
         |           unnest(list_filter(string_split_regex(lower(text), '$Ws'), x -> x != '')) AS tok
         |    FROM documents)
         |  GROUP BY doc_id, tok
         |), th AS (
         |  SELECT doc_id, cnt,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(range(1, 16),
         |        i -> CAST(strpos('0123456789abcdef', substr(md5(tok), CAST(i AS INTEGER), 1)) - 1 AS BIGINT))),
         |      (a, x) -> a * 16 + x) AS h
         |  FROM tc
         |), bits AS (
         |  SELECT doc_id, j, sum(cnt * (((h >> j) & 1) * 2 - 1)) AS s
         |  FROM th, unnest(range(0, 60)) AS u(j)
         |  GROUP BY doc_id, j
         |)
         |SELECT doc_id,
         |  CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << CAST(j AS INTEGER)) ELSE 0 END) AS BIGINT) AS simhash
         |FROM bits GROUP BY doc_id""".stripMargin,
    "q_dedup_embed" ->
      """WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings
        |), n AS (
        |  SELECT vec_id, e,
        |    sqrt(list_reduce(list_prepend(0.0, list_transform(e, x -> x * x)),
        |         (a, p) -> a + p)) AS nrm
        |  FROM v
        |)
        |SELECT * FROM (
        |  SELECT a.vec_id AS va, b.vec_id AS vb,
        |    list_reduce(list_prepend(0.0,
        |      list_transform(range(1, len(a.e) + 1), i -> a.e[i] * b.e[i])),
        |      (acc, p) -> acc + p) / (a.nrm * b.nrm) AS cos
        |  FROM n a JOIN n b ON a.vec_id < b.vec_id
        |) WHERE cos >= 0.4""".stripMargin,
    "q_simsearch" ->
      """WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings
        |), n AS (
        |  SELECT vec_id, e,
        |    sqrt(list_reduce(list_prepend(0.0, list_transform(e, x -> x * x)),
        |         (a, p) -> a + p)) AS nrm
        |  FROM v
        |), s AS (
        |  SELECT q.vec_id AS qid, c.vec_id AS vec_id,
        |    list_reduce(list_prepend(0.0,
        |      list_transform(range(1, len(q.e) + 1), i -> q.e[i] * c.e[i])),
        |      (acc, p) -> acc + p) / (q.nrm * c.nrm) AS sim
        |  FROM n q JOIN n c ON q.vec_id < 10 AND q.vec_id != c.vec_id
        |), r AS (
        |  SELECT qid, vec_id, sim,
        |         CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS BIGINT) AS rn
        |  FROM s
        |)
        |SELECT qid, vec_id, sim, rn FROM r WHERE rn <= 10""".stripMargin,
    "q_udf_fnv" ->
      s"""WITH w AS (
         |  SELECT DISTINCT unnest(list_filter(string_split_regex(lower(text), '$Ws'), x -> x != '')) AS word
         |  FROM documents
         |), f AS (
         |  SELECT word, ${utf8BytesSql("word")} AS bs FROM w
         |), g AS (
         |  SELECT word,
         |    list_reduce(list_prepend(CAST(2166136261 AS BIGINT), bs),
         |      (h, c) -> (xor(h, c) * 16777619) % 4294967296) AS h
         |  FROM f
         |)
         |SELECT word, h, h % 8 AS bucket FROM g""".stripMargin,
    "q_udaf_typed" ->
      """SELECT l_returnflag,
        |       round(sum(l_quantity * (1 - l_discount)), 2) AS net_qty,
        |       count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_udtf_explode" -> bigramOracle,
    "q_udtf_native" -> bigramOracle,
    "q_multimodal" ->
      s"""SELECT doc_id,
         |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
         |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         |  list_reduce(list_prepend(CAST(0 AS BIGINT), ${utf8BytesSql("text")}),
         |    (a, b) -> (a + b) % 4294967296) AS checksum,
         |  md5(text) AS digest
         |FROM documents""".stripMargin,
    "q_multimodal_frames" ->
      """WITH b AS (
        |  SELECT doc_id, octet_length(encode(text)) AS L FROM documents
        |), f AS (
        |  SELECT doc_id, L, CAST(i AS BIGINT) AS i
        |  FROM b, unnest(range(0, CAST(ceil(L / 256.0) AS BIGINT))) AS u(i)
        |  WHERE i % 2 = 0
        |)
        |SELECT doc_id, count(*) AS n_frames,
        |       CAST(sum(least(256, L - i * 256)) AS BIGINT) AS frame_bytes
        |FROM f GROUP BY doc_id""".stripMargin,
    // Real ImageIO round-trip: the oracle predicts decoded dims and
    // channel means from doc_id arithmetic alone (Multimodal.imgWidth/
    // topRgb/botRgb mirrored); Spark must survive PNG encode→decode
    // (q_multimodal_decode) plus a real bilinear resize + re-encode
    // (q_multimodal_resize, flat color ⇒ exact mean preservation).
    "q_multimodal_decode" ->
      """WITH g AS (
        |  SELECT doc_id,
        |         16 + doc_id % 16 AS w, 12 + doc_id % 8 AS h,
        |         doc_id % 256 AS tr, (doc_id * 31) % 256 AS tg,
        |         (doc_id * 17) % 256 AS tb,
        |         (doc_id * 7) % 256 AS br, (doc_id * 13) % 256 AS bg,
        |         (doc_id * 29) % 256 AS bb
        |  FROM documents
        |)
        |SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  (w * (h // 2) * tr + w * (h - h // 2) * br) / CAST(w * h AS DOUBLE) AS mean_r,
        |  (w * (h // 2) * tg + w * (h - h // 2) * bg) / CAST(w * h AS DOUBLE) AS mean_g,
        |  (w * (h // 2) * tb + w * (h - h // 2) * bb) / CAST(w * h AS DOUBLE) AS mean_b
        |FROM g""".stripMargin,
    "q_multimodal_resize" ->
      """SELECT doc_id, CAST(24 AS INT) AS width, CAST(16 AS INT) AS height,
        |       CAST(doc_id % 256 AS DOUBLE) AS mean_r,
        |       CAST((doc_id * 31) % 256 AS DOUBLE) AS mean_g,
        |       CAST((doc_id * 17) % 256 AS DOUBLE) AS mean_b
        |FROM documents""".stripMargin,
    // Real WAV round-trip: header metadata + exact integer waveform
    // stats predicted from the synth arithmetic (Multimodal.audioSamples)
    "q_multimodal_audio" ->
      """WITH g AS (
        |  SELECT doc_id, 800 + doc_id % 800 AS n FROM documents
        |), s AS (
        |  SELECT doc_id, n, (doc_id * 31 + 7 * i) % 2001 - 1000 AS amp
        |  FROM g, unnest(range(0, n)) AS u(i)
        |)
        |SELECT doc_id, CAST(8000 AS INT) AS sample_rate, CAST(1 AS INT) AS channels,
        |       CAST(any_value(n) AS BIGINT) AS n_samples,
        |       CAST(sum(amp) AS BIGINT) AS sum_amp,
        |       CAST(max(abs(amp)) AS INT) AS peak
        |FROM s GROUP BY doc_id""".stripMargin,
    "q_stream_tumbling" ->
      """SELECT strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M:%S') AS wstart,
        |       event_type, count(*) AS cnt, round(sum(value), 2) AS sval
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q_stream_sliding" ->
      """SELECT strftime(date_trunc('minute', ts) - INTERVAL (i) MINUTE,
        |                '%Y-%m-%d %H:%M:%S') AS wstart,
        |       event_type, count(*) AS cnt
        |FROM events, unnest(range(0, 2)) AS u(i)
        |GROUP BY 1, 2""".stripMargin,
    "q_stream_session" ->
      """WITH e AS (
        |  SELECT user_id, date_trunc('microseconds', ts) AS ts FROM events
        |), o AS (
        |  -- strict > : Spark merges an event at EXACTLY prev + gap
        |  -- (session end is inclusive; pinned by StreamingSpec)
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w > INTERVAL 5 MINUTE
        |         THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), s AS (
        |  SELECT user_id, ts,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |                   ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o
        |)
        |SELECT user_id,
        |       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS s_start,
        |       strftime(max(ts) + INTERVAL 5 MINUTE, '%Y-%m-%d %H:%M:%S') AS s_end,
        |       count(*) AS cnt
        |FROM s GROUP BY user_id, sid""".stripMargin,
    "q_stream_dedup" ->
      "SELECT event_id FROM events",
    // streaming OHLC ≡ the batch bars re-keyed to the window start
    "q_stream_ohlc" ->
      """WITH t AS (
        |  SELECT strftime(make_timestamp(epoch_us(date_trunc('microseconds', ts)) // 300000000 * 300000000),
        |                  '%Y-%m-%d %H:%M:%S') AS wstart,
        |         event_type, value, date_trunc('microseconds', ts) AS ts, event_id
        |  FROM events
        |), r AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY wstart, event_type
        |                       ORDER BY ts, event_id) AS rn_a,
        |    row_number() OVER (PARTITION BY wstart, event_type
        |                       ORDER BY ts DESC, event_id DESC) AS rn_z
        |  FROM t
        |)
        |SELECT wstart, event_type,
        |       max(CASE WHEN rn_a = 1 THEN value END) AS open,
        |       max(value) AS high, min(value) AS low,
        |       max(CASE WHEN rn_z = 1 THEN value END) AS close,
        |       count(*) AS n_ticks,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS volume
        |FROM r GROUP BY wstart, event_type""".stripMargin,
    // Real multi-frame decode: animated GIF staged per doc, every 2nd
    // frame extracted; dims + channel means predicted arithmetically
    "q_multimodal_video" ->
      """WITH g AS (
        |  SELECT doc_id, 4 + doc_id % 4 AS n FROM documents
        |), f AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS frame_idx
        |  FROM g, unnest(range(0, n)) AS u(i)
        |  WHERE i % 2 = 0
        |)
        |SELECT doc_id, frame_idx,
        |       CAST(20 AS INT) AS width, CAST(12 AS INT) AS height,
        |       CAST((doc_id * 31 + frame_idx * 7) % 256 AS DOUBLE) AS mean_r,
        |       CAST((doc_id * 13 + frame_idx * 11) % 256 AS DOUBLE) AS mean_g,
        |       CAST((doc_id * 17 + frame_idx * 23) % 256 AS DOUBLE) AS mean_b
        |FROM f""".stripMargin,
    // transformWithState family: the streaming operators' FINAL state
    // (reduced from the per-batch emission log) must equal the batch
    // aggregation over the same events.
    "q_stream_spend" ->
      """SELECT user_id, round(sum(value), 2) AS total_value
        |FROM events GROUP BY user_id""".stripMargin,
    "q_stream_typecounts" ->
      """SELECT user_id, event_type, count(*) AS cnt
        |FROM events GROUP BY user_id, event_type""".stripMargin,
    "q_stream_recent" ->
      """WITH r AS (
        |  SELECT user_id, event_id, ts,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events
        |)
        |SELECT user_id,
        |       string_agg(CAST(event_id AS VARCHAR), ','
        |                  ORDER BY ts, event_id) AS recent_csv
        |FROM r WHERE rn <= 3 GROUP BY user_id""".stripMargin,
    "q_stream_usersession" ->
      """WITH e AS (
        |  SELECT user_id, date_trunc('microseconds', ts) AS ts FROM events
        |), o AS (
        |  -- strict > : an event at EXACTLY last + gap merges (same rule
        |  -- as q_stream_session / q_sessionize; pinned by StreamingSpec)
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w > INTERVAL 5 MINUTE
        |         THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), s AS (
        |  SELECT user_id, ts,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |                   ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o
        |)
        |SELECT user_id, count(*) AS n_events
        |FROM s GROUP BY user_id, sid""".stripMargin,
    "q_stream_join" ->
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id,
        |       p.user_id AS user_id
        |FROM events p JOIN events c
        |  ON p.event_type = 'purchase' AND c.event_type = 'click'
        | AND p.user_id = c.user_id
        | AND date_trunc('microseconds', c.ts)
        |       >= date_trunc('microseconds', p.ts) - INTERVAL 10 MINUTE
        | AND date_trunc('microseconds', c.ts)
        |       <= date_trunc('microseconds', p.ts)""".stripMargin,
    // left-outer stream-stream: streamed matched pairs + watermark-flushed
    // null-extensions must together equal the batch LEFT JOIN exactly
    "q_stream_outer" ->
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id,
        |       p.user_id AS user_id
        |FROM events p LEFT JOIN events c
        |  ON c.event_type = 'click'
        | AND p.user_id = c.user_id
        | AND date_trunc('microseconds', c.ts)
        |       >= date_trunc('microseconds', p.ts) - INTERVAL 10 MINUTE
        | AND date_trunc('microseconds', c.ts)
        |       <= date_trunc('microseconds', p.ts)
        |WHERE p.event_type = 'purchase'""".stripMargin,
    "q_pipeline_curate" -> curateOracle,
    "q_skew_agg" ->
      """SELECT l_suppkey, round(sum(l_quantity), 2) AS sum_qty, count(*) AS cnt
        |FROM lineitem GROUP BY l_suppkey""".stripMargin,
    "q_skew_join" ->
      """SELECT CAST(s_nationkey AS BIGINT) AS s_nationkey,
        |       round(sum(l_quantity), 2) AS sum_qty, count(*) AS cnt
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY 1""".stripMargin,
    "q_partition_prune" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |       strftime(o_orderdate, '%Y-%m') AS o_month
        |FROM orders WHERE strftime(o_orderdate, '%Y-%m') = '1995-03'""".stripMargin,
    "q_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
        |       coalesce(l_linestatus, 'ALL') AS status,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       count(*) AS cnt
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""".stripMargin,
    "q_join_outer" ->
      """WITH c AS (
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |), o AS (
        |  SELECT o_custkey, count(*) AS n_orders FROM orders
        |  WHERE o_orderstatus = 'F' GROUP BY o_custkey
        |)
        |SELECT CASE WHEN c_custkey IS NOT NULL AND o_custkey IS NOT NULL THEN 'both'
        |            WHEN o_custkey IS NULL THEN 'customer_only'
        |            ELSE 'order_only' END AS op,
        |       count(*) AS cnt,
        |       CAST(sum(coalesce(n_orders, 0)) AS BIGINT) AS sum_orders
        |FROM c FULL OUTER JOIN o ON c_custkey = o_custkey
        |GROUP BY 1""".stripMargin,
    "q_window_value" ->
      """SELECT o_custkey, o_orderkey,
        |       first_value(o_orderkey) OVER wf AS first_ok,
        |       last_value(o_orderkey) OVER wf AS last_ok,
        |       nth_value(o_orderkey, 2) OVER wf AS second_ok,
        |       lead(o_orderkey, 1) OVER w AS next_ok
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |       wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin,
    "q_window_range" ->
      """SELECT o_custkey, o_orderkey,
        |       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |         ORDER BY CAST(o_orderdate AS DATE)
        |         RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW), 2)
        |         AS rev30d
        |FROM orders""".stripMargin,
    // OHLC bars: open/close picked over the total (ts, event_id) order —
    // the oracle's row_number mirrors min_by/max_by's struct order
    "q_ohlc" ->
      """WITH t AS (
        |  SELECT epoch_us(date_trunc('microseconds', ts)) // 300000000 * 300000000 AS bar_start,
        |         event_type, value, date_trunc('microseconds', ts) AS ts, event_id
        |  FROM events
        |), r AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY bar_start, event_type
        |                       ORDER BY ts, event_id) AS rn_a,
        |    row_number() OVER (PARTITION BY bar_start, event_type
        |                       ORDER BY ts DESC, event_id DESC) AS rn_z
        |  FROM t
        |)
        |SELECT bar_start, event_type,
        |       max(CASE WHEN rn_a = 1 THEN value END) AS open,
        |       max(value) AS high, min(value) AS low,
        |       max(CASE WHEN rn_z = 1 THEN value END) AS close,
        |       count(*) AS n_ticks,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS volume
        |FROM r GROUP BY bar_start, event_type""".stripMargin,
    // declarative data-quality audit: each check is an exact count
    "q_expectations" ->
      """SELECT 'lineitem.quantity_in_1_50' AS "check",
        |       CAST(count(*) FILTER (l_quantity < 1 OR l_quantity > 50) AS BIGINT) AS violations
        |FROM lineitem
        |UNION ALL
        |SELECT 'lineitem.price_positive',
        |       CAST(count(*) FILTER (l_extendedprice <= 0) AS BIGINT) FROM lineitem
        |UNION ALL
        |SELECT 'lineitem.discount_in_0_1',
        |       CAST(count(*) FILTER (l_discount < 0 OR l_discount > 1) AS BIGINT) FROM lineitem
        |UNION ALL
        |SELECT 'orders.priority_not_null',
        |       CAST(count(*) FILTER (o_orderpriority IS NULL) AS BIGINT) FROM orders
        |UNION ALL
        |SELECT 'orders.totalprice_positive',
        |       CAST(count(*) FILTER (o_totalprice <= 0) AS BIGINT) FROM orders
        |UNION ALL
        |SELECT 'events.event_id_unique',
        |       CAST(count(*) - count(DISTINCT event_id) AS BIGINT) FROM events
        |UNION ALL
        |SELECT 'lineitem.orderkey_in_orders',
        |       CAST(count(*) AS BIGINT) FROM lineitem l
        |WHERE l.l_orderkey IS NOT NULL
        |  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        |UNION ALL
        |SELECT 'orders.custkey_in_customer',
        |       CAST(count(*) AS BIGINT) FROM orders o
        |WHERE o.o_custkey IS NOT NULL
        |  AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)""".stripMargin,
    "q_sample_hash" ->
      s"""WITH f AS (
         |  SELECT doc_id, lang, ${utf8BytesSql("CAST(doc_id AS VARCHAR)")} AS bs
         |  FROM documents
         |), g AS (
         |  SELECT doc_id, lang,
         |    list_reduce(list_prepend(CAST(2166136261 AS BIGINT), bs),
         |      (h, c) -> (xor(h, c) * 16777619) % 4294967296) AS h
         |  FROM f
         |)
         |SELECT doc_id, lang, h FROM g WHERE h % 20 = 0""".stripMargin,
    // temperature-balanced mixture: exact BIGINT token totals; √t and the
    // lang-asc fold are the only float ops (each correctly rounded, order
    // pinned by list_reduce) — bit parity with Pipeline.mixTemperature
    "q_mix_temperature" ->
      s"""WITH tok AS (
         |  SELECT doc_id, lang,
         |    CAST(len(list_filter(string_split_regex(lower(text), '$Ws'), x -> x != '')) AS BIGINT) AS n_tok
         |  FROM documents
         |), tot AS (
         |  SELECT lang, CAST(sum(n_tok) AS BIGINT) AS t FROM tok GROUP BY lang
         |), g AS (
         |  SELECT floor(0.5 * CAST(sum(t) AS DOUBLE)) AS budget,
         |         list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |           list(sqrt(CAST(t AS DOUBLE)) ORDER BY lang)),
         |           (a, b) -> a + b) AS s
         |  FROM tot
         |), r AS (
         |  SELECT lang, t,
         |    CASE WHEN t = 0 THEN 0 ELSE least(1000000,
         |      (CAST(floor(budget * sqrt(CAST(t AS DOUBLE)) / s) AS BIGINT) * 1000000) // t)
         |    END AS rate_ppm
         |  FROM tot, g
         |), f AS (
         |  SELECT tok.doc_id, tok.lang, tok.n_tok, r.t, r.rate_ppm,
         |    ${utf8BytesSql("CAST(tok.doc_id AS VARCHAR)")} AS bs
         |  FROM tok JOIN r USING (lang)
         |), k AS (
         |  SELECT * FROM f
         |  WHERE list_reduce(list_prepend(CAST(2166136261 AS BIGINT), bs),
         |          (h, c) -> (xor(h, c) * 16777619) % 4294967296) % 1000000 < rate_ppm
         |)
         |SELECT lang, CAST(any_value(t) AS BIGINT) AS tokens_before,
         |       CAST(any_value(rate_ppm) AS BIGINT) AS rate_ppm,
         |       count(*) AS docs_kept,
         |       CAST(sum(n_tok) AS BIGINT) AS tokens_kept
         |FROM k GROUP BY lang""".stripMargin,
    // passage-level dedup: md5 digests as passage identity on both sides
    "q_passage_dedup" ->
      s"""WITH toks AS (
         |  SELECT doc_id, list_filter(string_split_regex(lower(text), '$Ws'), x -> x != '') AS ts
         |  FROM documents
         |), p AS (
         |  SELECT doc_id, CAST(w AS BIGINT) AS widx,
         |         md5(array_to_string(ts[w * 10 + 1 : w * 10 + 10], ' ')) AS ph
         |  FROM toks, unnest(range(0, len(ts) // 10)) AS u(w)
         |  WHERE len(ts) >= 10
         |), f AS (
         |  SELECT doc_id, widx, ph,
         |         row_number() OVER (PARTITION BY ph ORDER BY doc_id, widx) AS rn
         |  FROM p
         |)
         |SELECT doc_id, count(*) AS n_passages,
         |       CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS kept_passages
         |FROM f GROUP BY doc_id""".stripMargin,
    // boilerplate REMOVAL (the corpus rewrite passage_dedup audits):
    // passages in ≥ BoilerplateDf distinct docs stripped everywhere
    // (first occurrence included — the C4 rule), text rebuilt from the
    // kept passages in widx order plus the sub-window tail
    "q_boilerplate" ->
      s"""WITH toks AS (
         |  SELECT doc_id, list_filter(string_split_regex(lower(text), '$Ws'), x -> x != '') AS ts
         |  FROM documents
         |), p AS (
         |  SELECT doc_id, CAST(w AS BIGINT) AS widx,
         |         array_to_string(ts[w * 10 + 1 : w * 10 + 10], ' ') AS passage
         |  FROM toks, unnest(range(0, len(ts) // 10)) AS u(w)
         |  WHERE len(ts) >= 10
         |), bp AS (
         |  SELECT passage FROM p GROUP BY 1
         |  HAVING count(DISTINCT doc_id) >= ${operators.Dedup.BoilerplateDf}
         |), kept AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         |         string_agg(passage, ' ' ORDER BY widx) AS body
         |  FROM p WHERE passage NOT IN (SELECT passage FROM bp)
         |  GROUP BY doc_id
         |), base AS (
         |  SELECT doc_id, CAST(len(ts) // 10 AS BIGINT) AS n_passages,
         |         array_to_string(ts[(len(ts) // 10) * 10 + 1 : len(ts)], ' ') AS tail
         |  FROM toks
         |)
         |SELECT b.doc_id,
         |       trim(concat(COALESCE(k.body, ''), ' ', b.tail)) AS clean_text,
         |       b.n_passages,
         |       b.n_passages - COALESCE(k.n_kept, 0) AS n_stripped
         |FROM base b LEFT JOIN kept k USING (doc_id)""".stripMargin,
    "q_sample_stratified" ->
      s"""WITH f AS (
         |  SELECT doc_id, lang, ${utf8BytesSql("CAST(doc_id AS VARCHAR)")} AS bs
         |  FROM documents
         |), g AS (
         |  SELECT doc_id, lang,
         |    list_reduce(list_prepend(CAST(2166136261 AS BIGINT), bs),
         |      (h, c) -> (xor(h, c) * 16777619) % 4294967296) AS h,
         |    CASE lang WHEN 'en' THEN 10 WHEN 'de' THEN 5
         |              WHEN 'fr' THEN 2 WHEN 'es' THEN 2 END AS m
         |  FROM f
         |)
         |SELECT doc_id, lang, h FROM g WHERE m IS NOT NULL AND h % m = 0""".stripMargin,
    "q_pack_tokens" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang,
         |    CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 \\t\\n\\r\\f\\x0B]')) AS BIGINT) AS wp
         |  FROM documents
         |), c AS (
         |  SELECT doc_id, lang, wp,
         |    sum(wp) OVER (PARTITION BY lang ORDER BY doc_id
         |                  ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM t
         |)
         |SELECT doc_id, lang,
         |       CAST(floor((cum - wp) / 2000.0) AS BIGINT) AS shard
         |FROM c""".stripMargin,
    "q_sql_revenue" ->
      """SELECT n_name,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |       count(*) AS cnt
        |FROM customer
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name""".stripMargin,
    "q_subquery" ->
      """SELECT l_orderkey, l_linenumber, round(l_quantity, 2) AS qty
        |FROM lineitem l
        |WHERE l_quantity > (SELECT avg(l2.l_quantity) FROM lineitem l2
        |                    WHERE l2.l_orderkey = l.l_orderkey)""".stripMargin,
    "q_recursive" ->
      """WITH RECURSIVE cal(d) AS (
        |  SELECT (SELECT min(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))) FROM orders)
        |  UNION ALL
        |  SELECT d + 1 FROM cal
        |  WHERE d < (SELECT min(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))) FROM orders) + 59
        |), daily AS (
        |  SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d, count(*) AS n
        |  FROM orders GROUP BY 1
        |)
        |SELECT CAST(cal.d - (SELECT min(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))) FROM orders) AS BIGINT) AS day_idx,
        |       CAST(coalesce(daily.n, 0) AS BIGINT) AS n_orders
        |FROM cal LEFT JOIN daily ON cal.d = daily.d""".stripMargin,
    // file-format round trips: the oracle reads the ORIGINAL parquet
    // table — a value drift introduced by the staged text/CSV/JSON
    // write→read cycle would break the hash match
    "q_source_text" ->
      s"""SELECT word, count(*) AS cnt
         |FROM (SELECT unnest(string_split_regex(lower(text), '$Ws')) AS word
         |      FROM documents)
         |WHERE length(word) > 0
         |GROUP BY word
         |ORDER BY word""".stripMargin,
    "q_source_csv" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty, count(*) AS cnt
        |FROM lineitem GROUP BY 1, 2""".stripMargin,
    "q_source_json" ->
      """SELECT o_orderstatus, round(sum(o_totalprice), 2) AS sum_price,
        |       count(*) AS cnt
        |FROM orders GROUP BY 1""".stripMargin,
    "q_source_orc" ->
      """SELECT p_brand, round(sum(p_retailprice), 2) AS sum_price,
        |       count(*) AS cnt
        |FROM part GROUP BY p_brand""".stripMargin,
    // same corruption rule (event_id % 97) applied to the original
    // table: quarantined lines must be EXACTLY the broken ones, parsed
    // rows intact
    "q_quarantine" ->
      """WITH cls AS (
        |  SELECT CASE WHEN event_id % 97 = 0 THEN 'quarantined'
        |              ELSE 'parsed' END AS state,
        |         CASE WHEN event_id % 97 = 0 THEN NULL ELSE user_id END AS user_id,
        |         CASE WHEN event_id % 97 = 0 THEN NULL ELSE value END AS value
        |  FROM events
        |)
        |SELECT state, count(*) AS cnt,
        |       coalesce(round(sum(value), 2), 0.0) AS sum_v,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM cls GROUP BY state""".stripMargin,
    // the republished month must carry the corrected values, every
    // other month the originals — proves the overwrite replaced exactly
    // one partition's data
    "q_partition_overwrite" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS o_month, count(*) AS cnt,
        |       round(sum(CASE WHEN strftime(o_orderdate, '%Y-%m') = '1995-03'
        |                      THEN o_totalprice + 1000.0
        |                      ELSE o_totalprice END), 2) AS sum_price
        |FROM orders GROUP BY 1""".stripMargin,
    "q_repetition" ->
      s"""WITH cnt AS (
         |  SELECT doc_id, tok, count(*) AS c FROM (
         |    SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '$Ws'),
         |                                      x -> x != '')) AS tok
         |    FROM documents)
         |  GROUP BY doc_id, tok
         |), per AS (
         |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tok,
         |         count(*) AS n_types, CAST(max(c) AS BIGINT) AS max_c
         |  FROM cnt GROUP BY doc_id
         |)
         |SELECT d.doc_id,
         |  coalesce(n_tok, 0) AS n_tok,
         |  coalesce(n_types, 0) AS n_types,
         |  CASE WHEN n_tok IS NULL OR n_tok <= 0 THEN 0.0
         |       ELSE CAST(n_tok - n_types AS DOUBLE) / n_tok END AS dup_ratio,
         |  CASE WHEN n_tok IS NULL OR n_tok <= 0 THEN 0.0
         |       ELSE CAST(max_c AS DOUBLE) / n_tok END AS top_tok_ratio
         |FROM documents d LEFT JOIN per USING (doc_id)""".stripMargin,
    "q_tfidf" ->
      s"""WITH tf AS (
         |  SELECT doc_id, term, count(*) AS tf FROM (
         |    SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '$Ws'),
         |                                      x -> x != '')) AS term
         |    FROM documents)
         |  GROUP BY doc_id, term
         |), dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |sc AS (
         |  SELECT doc_id, term, tf, df,
         |    CAST(tf AS DOUBLE) * CAST((SELECT count(*) FROM documents) AS DOUBLE)
         |      / CAST(df AS DOUBLE) AS score
         |  FROM tf JOIN dfreq USING (term)
         |)
         |SELECT doc_id, term, tf, df, score,
         |       rnk FROM (
         |  SELECT *, row_number() OVER (PARTITION BY doc_id
         |                               ORDER BY score DESC, term) AS rnk
         |  FROM sc)
         |WHERE rnk <= 3""".stripMargin,
    "q_decontaminate" ->
      s"""WITH toks AS (
         |  SELECT doc_id, list_filter(string_split_regex(lower(text), '$Ws'),
         |                             x -> x != '') AS ts
         |  FROM documents
         |), sh AS (
         |  SELECT DISTINCT doc_id, list_aggregate(ts[i:i+3], 'string_agg', ' ') AS s
         |  FROM toks, unnest(range(1, len(ts) - 2)) AS u(i)
         |  WHERE len(ts) >= 4
         |), bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
         |contam AS (
         |  SELECT DISTINCT sh.doc_id FROM sh JOIN bench USING (s)
         |  WHERE sh.doc_id % 97 != 0
         |)
         |SELECT doc_id, lang FROM documents
         |WHERE doc_id % 97 != 0
         |  AND doc_id NOT IN (SELECT doc_id FROM contam)""".stripMargin,
    "q_cdc_compact" ->
      """WITH r AS (
        |  SELECT user_id, event_type, value,
        |    count(*) OVER (PARTITION BY user_id) AS n_versions,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY date_trunc('microseconds', ts) DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, n_versions, event_type AS last_type, value AS last_value
        |FROM r WHERE rn = 1""".stripMargin,
    // the incremental foreachBatch materialization must converge to the
    // same table as the one-shot batch compaction
    "q_stream_upsert" ->
      """WITH r AS (
        |  SELECT user_id, event_type, value,
        |    count(*) OVER (PARTITION BY user_id) AS n_versions,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY date_trunc('microseconds', ts) DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, n_versions, event_type AS last_type, value AS last_value
        |FROM r WHERE rn = 1""".stripMargin,
    "q_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, date_trunc('microseconds', ts) AS ts, value
        |  FROM events
        |), o AS (
        |  -- strict > : an event at EXACTLY prev + gap extends the session
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w > INTERVAL 5 MINUTE
        |         THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), s AS (
        |  SELECT user_id, ts, value,
        |    CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
        |  FROM o
        |)
        |SELECT user_id, sid, epoch_us(min(ts)) AS start_us,
        |       count(*) AS n_events, round(sum(value), 2) AS sum_v
        |FROM s GROUP BY user_id, sid""".stripMargin,
    "q_redact" ->
      """SELECT c_custkey,
        |       regexp_replace(c_name, '[0-9]+', '<ID>', 'g') AS masked_name,
        |       CAST(len(regexp_extract_all(c_name, '[0-9]+')) AS BIGINT) AS n_masked
        |FROM customer""".stripMargin,
    // read over the Z-ordered staged layout; values must round-trip
    "q_zorder" -> zorderOracle,
    // cluster → raw-append → re-cluster: results equal the plain
    // filter at every stage (layout is an access path) — shared oracle
    "q_zorder_optimize" -> zorderOracle,
    // oracle is the exhaustive n² comparison the deletion index avoids;
    // the cap keeps it bounded at every sf
    "q_join_fuzzy" ->
      """WITH capped AS (
        |  SELECT c_custkey AS id, lower(c_name) AS name
        |  FROM customer WHERE c_custkey < 500
        |)
        |SELECT a.id AS id_a, b.id AS id_b,
        |       CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
        |FROM capped a JOIN capped b
        |  ON a.id < b.id AND levenshtein(a.name, b.name) <= 1""".stripMargin,
    // carried values are raw data (no arithmetic) → exact parity
    "q_fill_forward" ->
      """SELECT user_id, event_id,
        |       epoch_us(date_trunc('microseconds', ts)) AS ts_us,
        |       last_value(CASE WHEN event_type = 'purchase' THEN value END
        |                  IGNORE NULLS)
        |         OVER (PARTITION BY user_id
        |               ORDER BY date_trunc('microseconds', ts), event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         AS last_purchase
        |FROM events""".stripMargin,
    // fuzzy-pair graph closed transitively; singletons map to themselves
    "q_entity_resolve" ->
      """WITH RECURSIVE capped AS (
        |  SELECT c_custkey AS id, lower(c_name) AS name
        |  FROM customer WHERE c_custkey < 500
        |), prs AS (
        |  SELECT a.id AS da, b.id AS db
        |  FROM capped a JOIN capped b
        |    ON a.id < b.id AND levenshtein(a.name, b.name) <= 1
        |), edges AS (
        |  SELECT da AS u, db AS v FROM prs UNION ALL SELECT db, da FROM prs
        |), reach AS (
        |  SELECT DISTINCT u AS node, u AS r FROM edges
        |  UNION
        |  SELECT e.u AS node, t.r FROM edges e JOIN reach t ON e.v = t.node
        |), comp AS (SELECT node, min(r) AS c FROM reach GROUP BY node)
        |SELECT id, coalesce(c, id) AS canon
        |FROM capped LEFT JOIN comp ON id = node""".stripMargin,
    // Misra-Gries in its exact regime (capacity ≥ vocabulary): sketch
    // counts equal true counts, so top-k hash-matches plain wordcount
    "q_topk_sketch" ->
      s"""SELECT word AS tok, cnt AS est FROM (
         |  SELECT word, count(*) AS cnt
         |  FROM (SELECT unnest(string_split_regex(lower(text), '$Ws')) AS word
         |        FROM documents)
         |  WHERE length(word) > 0
         |  GROUP BY word
         |) ORDER BY est DESC, tok LIMIT 10""".stripMargin,
    // stream-static enrichment: streamed result ≡ the batch join+agg
    "q_stream_enrich" ->
      """SELECT strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M:%S') AS wstart,
        |       c_mktsegment, count(*) AS cnt, round(sum(value), 2) AS sval
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY 1, 2""".stripMargin,
    // SCD2 intervals: next version's ts closes the previous one;
    // epoch-microsecond bounds for integer parity
    "q_scd2" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |         date_trunc('microseconds', ts) AS ts
        |  FROM events
        |)
        |SELECT user_id, event_id, event_type,
        |       epoch_us(ts) AS valid_from_us,
        |       epoch_us(lead(ts) OVER (PARTITION BY user_id
        |                               ORDER BY ts, event_id)) AS valid_to_us
        |FROM e""".stripMargin,
    // integer-arithmetic PageRank: the oracle unrolls the 5 damped
    // iterations as chained CTEs; floor divisions and integer sums are
    // reassociation-proof, so ranks are bit-exact across engines
    "q_pagerank" -> pageRankOracle(5),
    // level-synchronous multi-source BFS unrolled as chained frontier
    // CTEs (the pageRank pattern); hop labels are exact integers
    "q_bfs" -> bfsOracle(4),
    // personalized PageRank: the pageRank loop with seed-only teleport,
    // full-node-set left joins so zero-in-mass nodes keep their row
    "q_ppr" -> pprOracle(5),
    // frontier Bellman-Ford replayed as FULL relaxation rounds (the
    // delta-BF ≡ full-relaxation equivalence — see Graphs.ssspDistances);
    // all-BIGINT distances, MATERIALIZED per-round CTEs (each referenced
    // twice — the union branch + the relax branch — would otherwise
    // double the inlined chain per round)
    "q_sssp" -> ssspOracle(4),
    // synchronous LPA unrolled round by round: per-round neighbor-label
    // counts then the (count desc, label asc) argmax via row_number —
    // the same total order as the Spark min-struct
    "q_label_prop" -> labelPropOracle(operators.Graphs.LpaRounds),
    "q_kcore" -> kcoreOracle(operators.Graphs.KcoreRounds),
    "q_hits" -> hitsOracle(operators.Graphs.HitsRounds),
    // market-basket pair mining: integer counts + micro-unit lift
    // (floor div) — every column exact, support filter mirrors
    // Graphs.BasketMinSupport
    "q_basket_pairs" ->
      s"""WITH b AS (
        |  SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem
        |), nb AS (SELECT count(DISTINCT basket) AS n_baskets FROM b),
        |ic AS (SELECT item, count(*) AS c FROM b GROUP BY item),
        |pr AS (
        |  SELECT a.item AS item_a, bb.item AS item_b,
        |         CAST(count(*) AS BIGINT) AS support
        |  FROM b a JOIN b bb ON a.basket = bb.basket AND a.item < bb.item
        |  GROUP BY 1, 2 HAVING count(*) >= ${Graphs.BasketMinSupport}
        |)
        |SELECT pr.item_a, pr.item_b, pr.support,
        |  CAST((pr.support * nb.n_baskets * ${Graphs.LiftMicro})
        |       // (ia.c * ib.c) AS BIGINT) AS lift_micro
        |FROM pr
        |JOIN ic ia ON pr.item_a = ia.item
        |JOIN ic ib ON pr.item_b = ib.item
        |CROSS JOIN nb""".stripMargin,
    // grouped exact quartiles: rank ceil(p*n/100) under (x, id) — p·n/100
    // is a dyadic rational (n/4, n/2, 3n/4), so the double ceil is exact
    "q_group_quantiles" ->
      """WITH r AS (
        |  SELECT o_orderpriority AS grp, o_orderkey AS id,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS x
        |  FROM orders
        |), rk AS (
        |  SELECT grp, x,
        |         row_number() OVER (PARTITION BY grp ORDER BY x, id) AS rk,
        |         count(*) OVER (PARTITION BY grp) AS n
        |  FROM r
        |)
        |SELECT grp, CAST(any_value(n) AS BIGINT) AS n,
        |       max(CASE WHEN rk = CAST(ceil(25 * n / 100.0) AS BIGINT) THEN x END) AS p25,
        |       max(CASE WHEN rk = CAST(ceil(50 * n / 100.0) AS BIGINT) THEN x END) AS p50,
        |       max(CASE WHEN rk = CAST(ceil(75 * n / 100.0) AS BIGINT) THEN x END) AS p75
        |FROM rk GROUP BY grp""".stripMargin,
    // winsorization: the SAME rank quantile discipline at P5/P95, then
    // a clip join back onto the rows — fences replay verbatim
    "q_winsorize" ->
      """WITH r AS (
        |  SELECT o_orderpriority AS grp, o_orderkey AS id,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS x
        |  FROM orders
        |), rk AS (
        |  SELECT grp, x,
        |         row_number() OVER (PARTITION BY grp ORDER BY x, id) AS rk,
        |         count(*) OVER (PARTITION BY grp) AS n
        |  FROM r
        |), f AS (
        |  SELECT grp,
        |         max(CASE WHEN rk = CAST(ceil(5 * n / 100.0) AS BIGINT) THEN x END) AS p5,
        |         max(CASE WHEN rk = CAST(ceil(95 * n / 100.0) AS BIGINT) THEN x END) AS p95
        |  FROM rk GROUP BY grp
        |)
        |SELECT r.id, r.grp, r.x,
        |       least(greatest(r.x, f.p5), f.p95) AS x_wins,
        |       (r.x < f.p5 OR r.x > f.p95) AS clipped
        |FROM r JOIN f USING (grp)""".stripMargin,
    // robust outliers: exact lower medians (rank (n+1) div 2), integer
    // cents throughout — the oracle's windows mirror the two-pass ranks
    "q_mad" ->
      """WITH r AS (
        |  SELECT o_orderpriority AS grp, o_orderkey AS id,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS x
        |  FROM orders
        |), rk AS (
        |  SELECT grp, id, x,
        |         row_number() OVER (PARTITION BY grp ORDER BY x, id) AS rk,
        |         count(*) OVER (PARTITION BY grp) AS n
        |  FROM r
        |), med AS (
        |  SELECT grp, CAST(any_value(n) AS BIGINT) AS n,
        |         max(CASE WHEN rk = (n + 1) // 2 THEN x END) AS med
        |  FROM rk GROUP BY grp
        |), dr AS (
        |  SELECT r.grp, r.id, abs(r.x - med.med) AS d,
        |         row_number() OVER (PARTITION BY r.grp
        |                            ORDER BY abs(r.x - med.med), r.id) AS rk,
        |         med.n
        |  FROM r JOIN med USING (grp)
        |), mad AS (
        |  SELECT grp, max(CASE WHEN rk = (n + 1) // 2 THEN d END) AS mad
        |  FROM dr GROUP BY grp
        |)
        |SELECT r.grp, any_value(med.n) AS n,
        |       any_value(med.med) AS med_cents,
        |       any_value(mad.mad) AS mad_cents,
        |       CAST(count(*) FILTER (abs(r.x - med.med) > 3 * mad.mad) AS BIGINT)
        |         AS n_outliers
        |FROM r JOIN med USING (grp) JOIN mad USING (grp)
        |GROUP BY r.grp""".stripMargin,
    // fixed-point Lloyd's: the loop unrolled as chained CTEs — the last
    // rows-only row that COULD be exact, now exact (see kmeansOracle)
    "q_kmeans" -> kmeansOracle(operators.Clustering.Iters, operators.Clustering.K),
    // fixed-point SemDeDup replayed exactly (Lloyd chain + recursive
    // greedy leader scan, all-integer τ test) — was no_oracle until r8
    "q_dedup_semantic" -> semanticOracle(operators.Clustering.Iters),
    // fixed-point power iteration unrolled as chained CTEs (the
    // kmeansOracle convention): per round, the sign-safe rounded dot
    // downscale, the transpose sum, and the max-norm rescale
    "q_pca_power" -> pcaOracle(operators.Clustering.PcaIters),
    // same unrolled chain, consumed: the per-vector rounded projection
    "q_pca_project" -> pcaOracle(operators.Clustering.PcaIters, project = true),
    // chain → exact-integer projection removal → the chain again on
    // the deflated corpus (both chains from the ONE pcaChainSql source)
    "q_pca_deflate" -> pcaDeflateOracle(operators.Clustering.PcaIters),
    // the deflation LOOPED: chain → deflate → chain → deflate → chain
    "q_pca_topk" -> pcaTopKOracle(operators.Clustering.PcaIters,
      operators.Clustering.PcaK),
    // data-independent JL map: the first JlDims seeded planes inlined
    // as exact double literals, same left-fold ⇒ raw-double bit parity
    "q_jl_project" -> jlOracle,
    // normal-equation sums + integer Cramer solve replayed (HUGEINT ≡
    // the driver's BigInt exactly; any correct 3×3 determinant
    // expansion is the same integer, so formula order cannot drift)
    "q_linreg" -> linregOracle(predict = false),
    "q_linreg_predict" -> linregOracle(predict = true),
    // sums of disjoint slices add exactly, so the appended fit IS the
    // one-shot fit — one shared oracle
    "q_linreg_append" -> linregOracle(predict = false),
    // ... and so is the STREAMED fold (state_N = state_{N−1} + batch
    // statistics — associative integer sums make chunking invisible)
    "q_stream_linreg" -> linregOracle(predict = false),
    // BPE learn/encode replayed exactly (rounds as chained CTEs, greedy
    // merge via separator-encoded replace) — was no_oracle until r8
    "q_bpe" -> bpeOracle(8),
    "q_bpe_encode" -> bpeEncodeOracle(8),
    // hyperplane LSH replayed exactly (inlined plane literals,
    // fold-parity sign buckets, bit-flip probes) — was no_oracle
    "q_simsearch_lsh" -> lshOracle,
    // the staged/appended forms are bit-identical searches (integer
    // buckets round-trip parquet exactly; the appended rows equal the
    // one-shot rows because the planes are data-independent), so all
    // three share the ONE oracle replay
    "q_simsearch_lsh_indexed" -> lshOracle,
    "q_simsearch_lsh_append" -> lshOracle,
    // greedy MMR unrolled as chained CTEs; λ = 1/2 (power of two) so
    // the float blend is bit-identical across engines
    "q_simsearch_mmr" ->
      mmrOracle(operators.Similarity.MmrC, operators.Similarity.MmrK),
    // filtered ANN: the brute oracle with candidates semi-restricted
    // to English docs (pre-filtering — k true matches guaranteed)
    "q_simsearch_filtered" ->
      """WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings
        |), n AS (
        |  SELECT vec_id, e,
        |    sqrt(list_reduce(list_prepend(0.0, list_transform(e, x -> x * x)),
        |         (a, p) -> a + p)) AS nrm
        |  FROM v
        |), s AS (
        |  SELECT q.vec_id AS qid, c.vec_id AS vec_id,
        |    list_reduce(list_prepend(0.0,
        |      list_transform(range(1, len(q.e) + 1), i -> q.e[i] * c.e[i])),
        |      (acc, p) -> acc + p) / (q.nrm * c.nrm) AS sim
        |  FROM n q JOIN n c ON q.vec_id < 10 AND q.vec_id != c.vec_id
        |    AND c.vec_id IN (SELECT doc_id FROM documents WHERE lang = 'en')
        |), r AS (
        |  SELECT qid, vec_id, sim,
        |         CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS BIGINT) AS rn
        |  FROM s
        |)
        |SELECT qid, vec_id, sim, rn FROM r WHERE rn <= 10""".stripMargin,
    // the IVF search with the same candidate restriction in the scoring join
    "q_simsearch_ivf_filtered" -> ivfOracle(operators.Clustering.Iters,
      base = false, candFilter =
        "\n  AND a.vec_id IN (SELECT doc_id FROM documents WHERE lang = 'en')"),
    // fixed-point IVF replayed exactly (Lloyd chain quantizer, integer
    // probe ranking, fold-parity cosine) — was no_oracle until r8; the
    // indexed form shares the oracle by staged≡live identity, the
    // appended form replays the base-only fit
    "q_simsearch_ivf" -> ivfOracle(operators.Clustering.Iters, base = false),
    "q_simsearch_ivf_indexed" -> ivfOracle(operators.Clustering.Iters, base = false),
    "q_simsearch_ivf_append" -> ivfOracle(operators.Clustering.Iters, base = true),
    "q_simsearch_pq" -> pqOracle(operators.Similarity.PqIters),
    // staged ≡ live is an identity (same codebooks ⇒ same codes; parquet
    // round-trips exactly) — shared oracle, also spec-asserted
    "q_simsearch_pq_indexed" -> pqOracle(operators.Similarity.PqIters),
    "q_simsearch_ivfpq" ->
      ivfpqOracle(operators.Clustering.Iters, operators.Similarity.PqIters),
    // staged ≡ live identity again (same model memo ⇒ same codes; cid
    // partition pruning changes WHAT IS READ, not what is computed)
    "q_simsearch_ivfpq_indexed" ->
      ivfpqOracle(operators.Clustering.Iters, operators.Similarity.PqIters),
    // incremental form: the WHOLE model (coarse + residual books) fits
    // on the base slice only; assignment/encode/search replay over the
    // full corpus under that frozen model
    "q_simsearch_ivfpq_append" ->
      ivfpqOracle(operators.Clustering.Iters, operators.Similarity.PqIters,
        base = true),
    // SQ8 replayed exactly: per-dim min/max "model", affine 8-bit
    // codes, integer decode, d2 shortlist, exact-cosine re-rank —
    // every division has non-negative operands (trunc ≡ floor)
    "q_simsearch_sq" -> sqOracle,
    // BQ replayed exactly: sign-bit words rebuilt as sums of shifted
    // literals, Hamming via xor+bit_count, shortlist, exact-cosine
    // re-rank; ONE oracle for all three forms — the signature is a
    // data-independent pure row function, so live, staged, and
    // appended searches are bit-identical by construction
    "q_simsearch_bq" -> bqOracle,
    "q_simsearch_bq_indexed" -> bqOracle,
    "q_simsearch_bq_append" -> bqOracle,
    // kNN self-join: every vector's top-5 — exact all-pairs window for
    // the exact form; the blocked form is the IVF oracle with the
    // whole corpus as the query set (same quantizer chain, k=5)
    "q_knn_join" ->
      s"""WITH v AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
         |  FROM embeddings
         |), n AS (
         |  SELECT vec_id, e,
         |    sqrt(list_reduce(list_prepend(0.0, list_transform(e, x -> x * x)),
         |         (a, p) -> a + p)) AS nrm
         |  FROM v
         |), s AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS vec_id,
         |    list_reduce(list_prepend(0.0,
         |      list_transform(range(1, len(q.e) + 1), i -> q.e[i] * c.e[i])),
         |      (acc, p) -> acc + p) / (q.nrm * c.nrm) AS sim
         |  FROM n q JOIN n c ON q.vec_id != c.vec_id
         |), r AS (
         |  SELECT qid, vec_id, sim,
         |         CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS BIGINT) AS rn
         |  FROM s
         |)
         |SELECT qid, vec_id, sim, rn FROM r WHERE rn <= ${operators.Similarity.KnnK}""".stripMargin,
    "q_knn_join_blocked" ->
      ivfOracle(operators.Clustering.Iters, base = false, allQ = true,
        k = operators.Similarity.KnnK,
        probeFraction = operators.Similarity.KnnJoinProbeFraction),
    // mutual-kNN communities: the knn chain → mutuality filter →
    // the ccOracle recursive closure, singletons self-labeled
    "q_knn_graph" ->
      s"""WITH RECURSIVE v AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
         |  FROM embeddings
         |), n AS (
         |  SELECT vec_id, e,
         |    sqrt(list_reduce(list_prepend(0.0, list_transform(e, x -> x * x)),
         |         (a, p) -> a + p)) AS nrm
         |  FROM v
         |), s AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS vec_id,
         |    list_reduce(list_prepend(0.0,
         |      list_transform(range(1, len(q.e) + 1), i -> q.e[i] * c.e[i])),
         |      (acc, p) -> acc + p) / (q.nrm * c.nrm) AS sim
         |  FROM n q JOIN n c ON q.vec_id != c.vec_id
         |), r AS (
         |  SELECT qid, vec_id,
         |         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rn
         |  FROM s
         |), knn AS (
         |  SELECT qid AS da, vec_id AS db FROM r WHERE rn <= ${operators.Similarity.KnnK}
         |), mut AS (
         |  SELECT k1.da, k1.db FROM knn k1
         |  JOIN knn k2 ON k1.da = k2.db AND k1.db = k2.da
         |  WHERE k1.da < k1.db
         |), edges AS (
         |  SELECT da AS u, db AS v FROM mut
         |  UNION ALL SELECT db, da FROM mut
         |), reach AS (
         |  SELECT DISTINCT u AS node, u AS r FROM edges
         |  UNION
         |  SELECT e.u AS node, t.r FROM edges e JOIN reach t ON e.v = t.node
         |), cmp AS (
         |  SELECT node, min(r) AS comp FROM reach GROUP BY node
         |)
         |SELECT emb.vec_id, coalesce(c.comp, emb.vec_id) AS comp
         |FROM embeddings emb LEFT JOIN cmp c ON c.node = emb.vec_id""".stripMargin,
    // link prediction replay: the knn chain -> mutual edges -> 2-hop
    // wedges minus existing edges -> integer neighborhood Jaccard
    "q_link_predict" ->
      s"""WITH v AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
         |  FROM embeddings
         |), n AS (
         |  SELECT vec_id, e,
         |    sqrt(list_reduce(list_prepend(0.0, list_transform(e, x -> x * x)),
         |         (a, p) -> a + p)) AS nrm
         |  FROM v
         |), s AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS vec_id,
         |    list_reduce(list_prepend(0.0,
         |      list_transform(range(1, len(q.e) + 1), i -> q.e[i] * c.e[i])),
         |      (acc, p) -> acc + p) / (q.nrm * c.nrm) AS sim
         |  FROM n q JOIN n c ON q.vec_id != c.vec_id
         |), r AS (
         |  SELECT qid, vec_id,
         |         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rn
         |  FROM s
         |), knn AS (
         |  SELECT qid AS da, vec_id AS db FROM r WHERE rn <= ${operators.Similarity.KnnK}
         |), mut AS (
         |  SELECT k1.da, k1.db FROM knn k1
         |  JOIN knn k2 ON k1.da = k2.db AND k1.db = k2.da
         |  WHERE k1.da < k1.db
         |), ed AS (
         |  SELECT da, db FROM mut UNION ALL SELECT db, da FROM mut
         |), deg AS (
         |  SELECT da AS node, CAST(count(*) AS BIGINT) AS deg FROM ed GROUP BY 1
         |), cand AS (
         |  SELECT l.da AS da, r2.da AS db, CAST(count(*) AS BIGINT) AS cn
         |  FROM ed l JOIN ed r2 ON l.db = r2.db AND l.da < r2.da
         |  GROUP BY 1, 2
         |), nonadj AS (
         |  SELECT c.* FROM cand c
         |  WHERE NOT EXISTS (SELECT 1 FROM mut m WHERE m.da = c.da AND m.db = c.db)
         |)
         |SELECT c.da, c.db, c.cn,
         |  (1000000 * c.cn) // (x.deg + y.deg - c.cn) AS jacc_micro
         |FROM nonadj c
         |JOIN deg x ON x.node = c.da JOIN deg y ON y.node = c.db""".stripMargin,
    // leave-one-out kNN majority vote replayed on top of the knn CTE:
    // same tie-broken top-5, neighbor labels vote, (votes desc, label
    // asc) picks — the whole chain is integer-deterministic
    "q_knn_classify" ->
      s"""WITH v AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
         |  FROM embeddings
         |), n AS (
         |  SELECT vec_id, e,
         |    sqrt(list_reduce(list_prepend(0.0, list_transform(e, x -> x * x)),
         |         (a, p) -> a + p)) AS nrm
         |  FROM v
         |), s AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS vec_id,
         |    list_reduce(list_prepend(0.0,
         |      list_transform(range(1, len(q.e) + 1), i -> q.e[i] * c.e[i])),
         |      (acc, p) -> acc + p) / (q.nrm * c.nrm) AS sim
         |  FROM n q JOIN n c ON q.vec_id != c.vec_id
         |), r AS (
         |  SELECT qid, vec_id,
         |         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rn
         |  FROM s
         |), knn AS (
         |  SELECT qid, vec_id FROM r WHERE rn <= ${operators.Similarity.KnnK}
         |), votes AS (
         |  SELECT k.qid, e.label AS nlabel, CAST(count(*) AS BIGINT) AS votes
         |  FROM knn k JOIN embeddings e ON e.vec_id = k.vec_id
         |  GROUP BY 1, 2
         |), pred AS (
         |  SELECT qid, nlabel, votes FROM (
         |    SELECT *, row_number() OVER (PARTITION BY qid
         |                                 ORDER BY votes DESC, nlabel) AS pr
         |    FROM votes)
         |  WHERE pr = 1
         |)
         |SELECT e.vec_id, e.label, p.nlabel AS predicted, p.votes,
         |       e.label = p.nlabel AS correct
         |FROM embeddings e JOIN pred p ON p.qid = e.vec_id""".stripMargin,
    // exact midrank Mann–Whitney replay: cents-discretized score
    // multiplicities, prefix-sum min-ranks, one BIGINT→DOUBLE division
    "q_auc" ->
      """WITH e AS (
        |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE value IS NOT NULL
        |), pv AS (
        |  SELECT cents, event_type, CAST(count(*) AS BIGINT) AS c_vt
        |  FROM e GROUP BY 1, 2
        |), cv AS (
        |  SELECT cents, CAST(sum(c_vt) AS BIGINT) AS c_v FROM pv GROUP BY 1
        |), r AS (
        |  SELECT cents, c_v,
        |    1 + CAST(coalesce(sum(c_v) OVER (ORDER BY cents
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |        AS BIGINT) AS minrank
        |  FROM cv
        |), s AS (
        |  SELECT pv.event_type,
        |    CAST(sum(pv.c_vt * (2 * r.minrank + r.c_v - 1)) AS BIGINT) AS twoS,
        |    CAST(sum(pv.c_vt) AS BIGINT) AS n_pos
        |  FROM pv JOIN r USING (cents) GROUP BY 1
        |), t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM e)
        |SELECT event_type, n_pos, n - n_pos AS n_neg,
        |       CAST(twoS - n_pos * (n_pos + 1) AS DOUBLE) /
        |       CAST(2 * n_pos * (n - n_pos) AS DOUBLE) AS auc
        |FROM s, t WHERE n_pos > 0 AND n_pos < n""".stripMargin,
    // NDCG@10 replay on the knn CTE: binary label-match gains, the
    // SAME pinned micro-unit discount literals (VALUES tables — no
    // libm in either engine), IDCG via the exclusive prefix-sum
    // lookup at min(R, 10), one integer division
    "q_ndcg" ->
      s"""WITH v AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
         |  FROM embeddings
         |), n AS (
         |  SELECT vec_id, e,
         |    sqrt(list_reduce(list_prepend(0.0, list_transform(e, x -> x * x)),
         |         (a, p) -> a + p)) AS nrm
         |  FROM v
         |), s AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS vec_id,
         |    list_reduce(list_prepend(0.0,
         |      list_transform(range(1, len(q.e) + 1), i -> q.e[i] * c.e[i])),
         |      (acc, p) -> acc + p) / (q.nrm * c.nrm) AS sim
         |  FROM n q JOIN n c ON q.vec_id != c.vec_id
         |), r AS (
         |  SELECT qid, vec_id,
         |         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rn
         |  FROM s
         |), knn AS (
         |  SELECT qid, vec_id, rn FROM r WHERE rn <= ${operators.Evaluation.NdcgK}
         |), w(rn, wu) AS (VALUES
         |  ${operators.Evaluation.NdcgW.zipWithIndex
               .map { case (u, i) => s"(${i + 1}, CAST($u AS BIGINT))" }
               .mkString(", ")}
         |), cw(j, cu) AS (VALUES
         |  ${operators.Evaluation.NdcgCum.zipWithIndex
               .map { case (u, j) => s"($j, CAST($u AS BIGINT))" }
               .mkString(", ")}
         |), rel AS (
         |  SELECT label, CAST(count(*) - 1 AS BIGINT) AS r_rel
         |  FROM embeddings GROUP BY 1
         |), dcg AS (
         |  SELECT k.qid,
         |    CAST(sum(CASE WHEN ne.label = qe.label THEN w.wu ELSE 0 END)
         |         AS BIGINT) AS dcg_u
         |  FROM knn k
         |  JOIN embeddings qe ON qe.vec_id = k.qid
         |  JOIN embeddings ne ON ne.vec_id = k.vec_id
         |  JOIN w ON w.rn = k.rn
         |  GROUP BY 1
         |)
         |SELECT e.vec_id, e.label, d.dcg_u, cw.cu AS idcg_u,
         |  CASE WHEN cw.cu = 0 THEN 0
         |       ELSE (1000000 * d.dcg_u) // cw.cu END AS ndcg_micro
         |FROM embeddings e
         |JOIN dcg d ON d.qid = e.vec_id
         |JOIN rel ON rel.label = e.label
         |JOIN cw ON cw.j = least(rel.r_rel, ${operators.Evaluation.NdcgK})""".stripMargin,
    // per-class confusion summary replayed on the knn-classify chain:
    // BIGINT cell sums, the same CASE-guarded integer micro divisions
    "q_confusion" ->
      s"""WITH v AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
         |  FROM embeddings
         |), n AS (
         |  SELECT vec_id, e,
         |    sqrt(list_reduce(list_prepend(0.0, list_transform(e, x -> x * x)),
         |         (a, p) -> a + p)) AS nrm
         |  FROM v
         |), s AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS vec_id,
         |    list_reduce(list_prepend(0.0,
         |      list_transform(range(1, len(q.e) + 1), i -> q.e[i] * c.e[i])),
         |      (acc, p) -> acc + p) / (q.nrm * c.nrm) AS sim
         |  FROM n q JOIN n c ON q.vec_id != c.vec_id
         |), r AS (
         |  SELECT qid, vec_id,
         |         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rn
         |  FROM s
         |), knn AS (
         |  SELECT qid, vec_id FROM r WHERE rn <= ${operators.Similarity.KnnK}
         |), votes AS (
         |  SELECT k.qid, e.label AS nlabel, CAST(count(*) AS BIGINT) AS votes
         |  FROM knn k JOIN embeddings e ON e.vec_id = k.vec_id
         |  GROUP BY 1, 2
         |), pred AS (
         |  SELECT qid, nlabel FROM (
         |    SELECT *, row_number() OVER (PARTITION BY qid
         |                                 ORDER BY votes DESC, nlabel) AS pr
         |    FROM votes)
         |  WHERE pr = 1
         |), cells AS (
         |  SELECT e.label, p.nlabel AS predicted, CAST(count(*) AS BIGINT) AS c
         |  FROM embeddings e JOIN pred p ON p.qid = e.vec_id
         |  GROUP BY 1, 2
         |), act AS (
         |  SELECT label, CAST(sum(c) AS BIGINT) AS support FROM cells GROUP BY 1
         |), prd AS (
         |  SELECT predicted AS label, CAST(sum(c) AS BIGINT) AS n_pred
         |  FROM cells GROUP BY 1
         |), tpc AS (
         |  SELECT label, c AS tp FROM cells WHERE label = predicted
         |), m AS (
         |  SELECT coalesce(a.label, q.label) AS label,
         |    CAST(coalesce(t.tp, 0) AS BIGINT) AS tp,
         |    CAST(coalesce(q.n_pred, 0) - coalesce(t.tp, 0) AS BIGINT) AS fp,
         |    CAST(coalesce(a.support, 0) - coalesce(t.tp, 0) AS BIGINT) AS fn,
         |    CAST(coalesce(a.support, 0) AS BIGINT) AS support
         |  FROM act a FULL OUTER JOIN prd q ON a.label = q.label
         |  LEFT JOIN tpc t ON t.label = coalesce(a.label, q.label)
         |)
         |SELECT label, tp, fp, fn, support,
         |  CASE WHEN tp + fp = 0 THEN 0
         |       ELSE (1000000 * tp) // (tp + fp) END AS precision_micro,
         |  CASE WHEN support = 0 THEN 0
         |       ELSE (1000000 * tp) // (tp + fn) END AS recall_micro,
         |  CASE WHEN 2 * tp + fp + fn = 0 THEN 0
         |       ELSE (2000000 * tp) // (2 * tp + fp + fn) END AS f1_micro
         |FROM m""".stripMargin,
    // KMV replay: distinct 60-bit user hashes per type, the K smallest
    // (row_number window), k-th-minimum estimate in HUGEINT — a
    // hash-exact oracle over an approximation algorithm (the sketch is
    // a pure function of the value set under the seedless hash)
    "q_kmv_distinct" -> kmvDistinctOracle,
    // streamed sketch == batch sketch exactly (min-k is associative
    // and idempotent) — one truth for both forms
    "q_stream_kmv" -> kmvDistinctOracle,
    // the closure property replayed: union sketch = K smallest of the
    // two sketches' value sets, intersection via the match ratio
    "q_kmv_ops" ->
      s"""WITH $kmvSketchCtes,
         |ty AS (SELECT DISTINCT event_type FROM events),
         |p AS (
         |  SELECT a.event_type AS ta, b.event_type AS tb
         |  FROM ty a JOIN ty b ON a.event_type < b.event_type
         |), uv AS (
         |  SELECT p.ta, p.tb, s.h FROM p
         |  JOIN s ON s.event_type IN (p.ta, p.tb)
         |  GROUP BY 1, 2, 3
         |), ur AS (
         |  SELECT ta, tb, h,
         |         row_number() OVER (PARTITION BY ta, tb ORDER BY h) AS rn
         |  FROM uv
         |), u AS (SELECT ta, tb, h FROM ur WHERE rn <= ${operators.Sketches.KmvK}),
         |m0 AS (
         |  SELECT u.ta, u.tb, u.h,
         |    (sa.h IS NOT NULL AND sb.h IS NOT NULL) AS inboth
         |  FROM u
         |  LEFT JOIN s sa ON sa.event_type = u.ta AND sa.h = u.h
         |  LEFT JOIN s sb ON sb.event_type = u.tb AND sb.h = u.h
         |), m AS (
         |  SELECT ta, tb, CAST(count(*) AS BIGINT) AS k_eff, max(h) AS kth,
         |    CAST(sum(CASE WHEN inboth THEN 1 ELSE 0 END) AS BIGINT) AS matches
         |  FROM m0 GROUP BY 1, 2
         |), e AS (
         |  SELECT ta, tb, k_eff, matches,
         |    CASE WHEN k_eff < ${operators.Sketches.KmvK} THEN k_eff
         |         ELSE CAST(CAST('${operators.Sketches.KmvNum}' AS HUGEINT)
         |                   // kth AS BIGINT) END AS est_union
         |  FROM m
         |)
         |SELECT ta, tb, k_eff, matches, est_union,
         |  CASE WHEN k_eff = 0 THEN 0
         |       ELSE (matches * est_union) // k_eff END AS est_inter
         |FROM e""".stripMargin,
    // Poisson-bootstrap replay: the same md5 draw, the same pinned
    // inverse-CDF thresholds, BIGINT mass sums, one integer division
    "q_bootstrap" ->
      s"""WITH e AS (
         |  SELECT event_id, CAST(round(value * 100) AS BIGINT) AS cents
         |  FROM events WHERE value IS NOT NULL
         |), f AS (
         |  SELECT cents, u.r AS r,
         |    ${utf8BytesSql("CAST(event_id AS VARCHAR) || ':' || CAST(u.r AS VARCHAR)")} AS bs
         |  FROM e, unnest(range(0, ${operators.Evaluation.BootR})) AS u(r)
         |), h0 AS (
         |  SELECT cents, r,
         |    list_reduce(list_prepend(CAST(2166136261 AS BIGINT), bs),
         |      (h, c) -> (xor(h, c) * 16777619) % 4294967296) AS h
         |  FROM f
         |), h1 AS (
         |  SELECT cents, r, (xor(h >> 16, h) * 73244475) % 4294967296 AS h FROM h0
         |), h2 AS (
         |  SELECT cents, r, (xor(h >> 16, h) * 73244475) % 4294967296 AS h FROM h1
         |), x AS (
         |  SELECT r, cents,
         |    CAST(len(list_filter([367879, 735759, 919699, 981012, 996340, 999406, 999917, 999990, 999999],
         |      c -> c <= xor(h >> 16, h) % 1000000)) AS BIGINT) AS m
         |  FROM h2
         |), g AS (
         |  SELECT CAST(r AS BIGINT) AS resample,
         |         CAST(sum(m) AS BIGINT) AS n_eff,
         |         CAST(sum(m * cents) AS BIGINT) AS sum_cents
         |  FROM x GROUP BY 1
         |)
         |SELECT resample, n_eff, sum_cents,
         |  CASE WHEN n_eff = 0 THEN 0
         |       ELSE (1000000 * sum_cents) // n_eff END AS mean_microcents
         |FROM g""".stripMargin,
    // Welch t replay: exact BIGINT moments, then the identical pinned
    // double chain (divisions and sqrt are IEEE correctly-rounded)
    "q_ab_test" ->
      """WITH m AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(cents) AS BIGINT) AS s,
        |         CAST(sum(cents * cents) AS BIGINT) AS s2
        |  FROM (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
        |        FROM events WHERE value IS NOT NULL)
        |  GROUP BY 1 HAVING count(*) >= 2
        |), j AS (
        |  SELECT a.event_type AS ta, b.event_type AS tb,
        |         a.n AS na, b.n AS nb, a.s AS sa, b.s AS sb,
        |         a.s2 AS s2a, b.s2 AS s2b
        |  FROM m a JOIN m b ON a.event_type < b.event_type
        |), d AS (
        |  SELECT ta, tb, na, nb,
        |    CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) AS mean_a,
        |    CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) AS mean_b,
        |    (CAST(s2a AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)) / CAST(na - 1 AS DOUBLE) AS var_a,
        |    (CAST(s2b AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)) / CAST(nb - 1 AS DOUBLE) AS var_b
        |  FROM j
        |)
        |SELECT ta, tb, na, nb, mean_a, mean_b,
        |  (mean_a - mean_b) / sqrt(var_a / CAST(na AS DOUBLE) + var_b / CAST(nb AS DOUBLE)) AS t_stat
        |FROM d""".stripMargin,
    // prospective 3σ detector: per-type strictly-prior window sums in
    // exact cents, the z² > 9 test cleared of divisions, squares in
    // HUGEINT (DECIMAL(38,0) on the Spark side — exact integers both
    // ways, so the boolean is bit-stable)
    "q_anomaly" -> anomalyOracle,
    // streamed ≡ batch exactly (strict ts-split feed + shared integer
    // flag predicate) — one truth for both forms
    "q_stream_anomaly" -> anomalyOracle,
    // DBSCAN replay: ε-pairs (the knn CTE's cosine), degrees, cores,
    // recursive closure over core-core edges (ccOracle's pattern),
    // border = min core-neighbor cluster, noise −1
    "q_dbscan" ->
      s"""WITH RECURSIVE v AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
         |  FROM embeddings
         |), n AS (
         |  SELECT vec_id, e,
         |    sqrt(list_reduce(list_prepend(0.0, list_transform(e, x -> x * x)),
         |         (a, p) -> a + p)) AS nrm
         |  FROM v
         |), p AS (
         |  SELECT q.vec_id AS va, c.vec_id AS vb
         |  FROM n q JOIN n c ON q.vec_id < c.vec_id
         |  WHERE list_reduce(list_prepend(0.0,
         |      list_transform(range(1, len(q.e) + 1), i -> q.e[i] * c.e[i])),
         |      (acc, x) -> acc + x) / (q.nrm * c.nrm)
         |    >= ${operators.Clustering.DbscanEps}
         |), ed AS (
         |  SELECT va, vb FROM p UNION ALL SELECT vb, va FROM p
         |), core AS (
         |  SELECT emb.vec_id,
         |    coalesce(d.nbrs, 0) + 1 >= ${operators.Clustering.DbscanMinPts}
         |      AS is_core
         |  FROM embeddings emb LEFT JOIN (
         |    SELECT va AS vec_id, CAST(count(*) AS BIGINT) AS nbrs
         |    FROM ed GROUP BY 1) d USING (vec_id)
         |), ce AS (
         |  SELECT p.va, p.vb FROM p
         |  JOIN core a ON a.vec_id = p.va AND a.is_core
         |  JOIN core b ON b.vec_id = p.vb AND b.is_core
         |), cedges AS (
         |  SELECT va AS u, vb AS w FROM ce UNION ALL SELECT vb, va FROM ce
         |), reach AS (
         |  SELECT DISTINCT u AS node, u AS r FROM cedges
         |  UNION
         |  SELECT e.u AS node, t.r FROM cedges e JOIN reach t ON e.w = t.node
         |), cmp AS (
         |  SELECT node, min(r) AS comp FROM reach GROUP BY node
         |), corecomp AS (
         |  SELECT c.vec_id, coalesce(m.comp, c.vec_id) AS cluster
         |  FROM core c LEFT JOIN cmp m ON m.node = c.vec_id
         |  WHERE c.is_core
         |), border AS (
         |  SELECT e.va AS vec_id, min(cc.cluster) AS bcluster
         |  FROM ed e JOIN corecomp cc ON cc.vec_id = e.vb
         |  GROUP BY 1
         |)
         |SELECT c.vec_id,
         |  CASE WHEN c.is_core THEN 'core'
         |       WHEN b.bcluster IS NOT NULL THEN 'border'
         |       ELSE 'noise' END AS role,
         |  CAST(coalesce(cc.cluster,
         |    CASE WHEN NOT c.is_core THEN b.bcluster END, -1) AS BIGINT)
         |    AS cluster
         |FROM core c
         |LEFT JOIN corecomp cc ON cc.vec_id = c.vec_id
         |LEFT JOIN border b ON b.vec_id = c.vec_id""".stripMargin,
    // χ² replay: presence counts per (term, lang), the pinned
    // numerator/denominator cast-and-divide order, positive association
    "q_chi2" ->
      s"""WITH td AS (
         |  SELECT DISTINCT doc_id, lang, term FROM (
         |    SELECT doc_id, lang,
         |      unnest(list_filter(string_split_regex(lower(text), '$Ws'),
         |                         x -> x != '')) AS term
         |    FROM documents)
         |), t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
         |byl AS (
         |  SELECT term, lang, CAST(count(*) AS BIGINT) AS a
         |  FROM td GROUP BY 1, 2
         |), dfreq AS (
         |  SELECT term, CAST(count(*) AS BIGINT) AS df FROM td GROUP BY 1
         |), nl AS (
         |  SELECT lang, CAST(count(*) AS BIGINT) AS n_lang
         |  FROM documents GROUP BY 1
         |), cells AS (
         |  SELECT byl.lang, byl.term, byl.a, dfreq.df, nl.n_lang, t.n,
         |         dfreq.df - byl.a AS b, nl.n_lang - byl.a AS c,
         |         t.n - nl.n_lang - (dfreq.df - byl.a) AS d
         |  FROM byl JOIN dfreq USING (term) JOIN nl USING (lang), t
         |  WHERE dfreq.df >= ${operators.TextOps.Chi2MinDf} AND dfreq.df < t.n
         |), scored AS (
         |  SELECT lang, term, a, df,
         |    CAST(n AS DOUBLE) *
         |      CAST(a * d - b * c AS DOUBLE) * CAST(a * d - b * c AS DOUBLE) /
         |      CAST(df * (n - df) AS DOUBLE) /
         |      CAST(n_lang * (n - n_lang) AS DOUBLE) AS chi2
         |  FROM cells WHERE a * d - b * c > 0
         |)
         |SELECT lang, term, a, df, chi2, rn FROM (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY lang
         |              ORDER BY chi2 DESC, term) AS BIGINT) AS rn
         |  FROM scored)
         |WHERE rn <= ${operators.TextOps.Chi2TopK}""".stripMargin,
    // aggregated top-N-per-group (the TopKByScore partial-agg form of
    // q_window_rank's question) — oracle keeps the window since DuckDB
    // has no bounded-top-k aggregate; ties break (price DESC, key ASC)
    "q_group_topk" -> groupTopkOracle,
    // maintained ranked state folds to the full-corpus top-k (the
    // TopKByScore merge is associative) — shared oracle; the
    // state/delta plan split is spec-asserted
    "q_incr_topk" -> groupTopkOracle,
    // incremental word count ≡ the full flagship word count (counts
    // are associative) — shares q_wordcount's oracle def; the
    // state/delta split is spec-asserted on the plan
    "q_incr_wordcount" -> wordcountOracle,
    // the streamed fold lands on the same count (associative partials,
    // one fold generation per micro-batch) — third sharer of the
    // flagship oracle
    "q_stream_wordcount" -> wordcountOracle,
    // incremental rollup ≡ full recompute (BIGINT cent partials are
    // associative), so the oracle is the plain group-by; the merge
    // plan's delta-bounded scans are spec-asserted instead
    "q_incr_agg" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |       o_orderstatus,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
        |       count(*) AS cnt
        |FROM orders GROUP BY 1, 2""".stripMargin,
    // exact BIGINT numerator; two fixed-order divisions → bit parity
    "q_lm_score" ->
      s"""WITH tok AS (
         |  SELECT doc_id,
         |         unnest(list_filter(string_split_regex(lower(text), '$Ws'),
         |                            x -> x != '')) AS tok
         |  FROM documents
         |), ctf AS (SELECT tok, count(*) AS ctf FROM tok GROUP BY tok),
         |tot AS (SELECT CAST(sum(ctf) AS BIGINT) AS nt FROM ctf),
         |per AS (
         |  SELECT doc_id, count(*) AS n_tok, CAST(sum(ctf) AS BIGINT) AS num
         |  FROM tok JOIN ctf USING (tok) GROUP BY doc_id
         |)
         |SELECT d.doc_id, coalesce(n_tok, 0) AS n_tok,
         |       coalesce(num, 0) AS lm_num,
         |       CASE WHEN n_tok IS NULL OR n_tok <= 0 THEN 0.0
         |            ELSE CAST(num AS DOUBLE) / CAST(n_tok AS DOUBLE)
         |                   / CAST((SELECT nt FROM tot) AS DOUBLE) END AS lm_score
         |FROM documents d LEFT JOIN per USING (doc_id)""".stripMargin,
    // μ/σ from the same exact integer sums as q_stats_moments → the
    // 1.5σ threshold is the identical double in both engines
    "q_outliers" ->
      """WITH s AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    sum(CAST(l_quantity AS BIGINT)) AS sx,
        |    sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sxx
        |  FROM lineitem GROUP BY l_returnflag
        |), st AS (
        |  SELECT l_returnflag,
        |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
        |    sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
        |         / CAST(n AS DOUBLE) / CAST(n AS DOUBLE)) AS sigma
        |  FROM s
        |)
        |SELECT l.l_returnflag, count(*) AS n_outliers,
        |       round(min(l_quantity), 2) AS min_q,
        |       round(max(l_quantity), 2) AS max_q
        |FROM lineitem l JOIN st USING (l_returnflag)
        |WHERE abs(l_quantity - mu) > 1.5 * sigma
        |GROUP BY l.l_returnflag""".stripMargin,
    // global ordinal assignment; the two-pass decomposition must equal
    // the oracle's single global window exactly
    "q_row_ids" ->
      """SELECT doc_id,
        |       CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) AS rid
        |FROM documents""".stripMargin,
    // deterministic corpus shuffle: the q_udf_fnv byte fold applied
    // TWICE (id's decimal string, then the first hash's decimal
    // string — diffusing FNV's last-byte linearity on sequential
    // ids), ranked by the collision-proof composite key
    "q_shuffle" ->
      s"""WITH f AS (
         |  SELECT doc_id,
         |         ${utf8BytesSql("CAST(doc_id AS VARCHAR)")} AS bs
         |  FROM documents
         |), g AS (
         |  SELECT doc_id,
         |    CAST(list_reduce(list_prepend(CAST(2166136261 AS BIGINT), bs),
         |      (h, c) -> (xor(h, c) * 16777619) % 4294967296) AS BIGINT) AS h1
         |  FROM f
         |), g2 AS (
         |  SELECT doc_id,
         |         ${utf8BytesSql("CAST(h1 AS VARCHAR)")} AS bs
         |  FROM g
         |), g3 AS (
         |  SELECT doc_id,
         |    list_reduce(list_prepend(CAST(2166136261 AS BIGINT), bs),
         |      (h, c) -> (xor(h, c) * 16777619) % 4294967296) AS h
         |  FROM g2
         |)
         |SELECT doc_id, CAST(h AS BIGINT) AS h,
         |       CAST(row_number() OVER (ORDER BY h * 2147483648 + doc_id) AS BIGINT) AS shuffle_pos
         |FROM g3""".stripMargin,
    // ordered min-timestamp chaining; µs truncation on both engines
    "q_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, date_trunc('microseconds', ts) AS ts
        |  FROM events
        |), s1 AS (
        |  SELECT user_id, min(ts) AS t FROM e
        |  WHERE event_type = 'view' GROUP BY user_id
        |), s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t
        |  FROM e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND e.ts >= s1.t GROUP BY e.user_id
        |), s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t
        |  FROM e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= s2.t GROUP BY e.user_id
        |)
        |SELECT CAST(1 AS BIGINT) AS step_idx, 'view' AS step, count(*) AS n_users FROM s1
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), 'click', count(*) FROM s2
        |UNION ALL
        |SELECT CAST(3 AS BIGINT), 'purchase', count(*) FROM s3""".stripMargin,
    // user-relative day-offset weeks (integer day arithmetic — exact)
    "q_cohort" ->
      """WITH e AS (
        |  SELECT user_id,
        |         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day
        |  FROM events
        |), f AS (
        |  SELECT user_id, min(day) AS cohort_day FROM e GROUP BY user_id
        |)
        |SELECT CAST(cohort_day // 7 AS BIGINT) AS cohort_wk,
        |       CAST((day - cohort_day) // 7 AS BIGINT) AS age_wk,
        |       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users,
        |       count(*) AS n_events
        |FROM e JOIN f USING (user_id)
        |GROUP BY 1, 2""".stripMargin,
    // the dim-side quarter filter resolves to the same three months the
    // DPP subquery prunes to at runtime; same integer quarter arithmetic
    "q_dpp" ->
      """WITH dim AS (
        |  SELECT m_month,
        |         substring(m_month, 1, 4) || '-Q' ||
        |           CAST((CAST(substring(m_month, 6, 2) AS INTEGER) - 1) // 3 + 1
        |                AS VARCHAR) AS m_quarter
        |  FROM (SELECT DISTINCT strftime(o_orderdate, '%Y-%m') AS m_month FROM orders)
        |)
        |SELECT strftime(o_orderdate, '%Y-%m') AS o_month,
        |       count(*) AS cnt, round(sum(o_totalprice), 2) AS sum_price
        |FROM orders JOIN dim ON strftime(o_orderdate, '%Y-%m') = m_month
        |WHERE m_quarter = '1995-Q1'
        |GROUP BY 1""".stripMargin,
    // old-generation rows (even keys, staged without the column) must
    // read back as NULL priority; new rows keep their values
    "q_schema_evolution" ->
      """SELECT o_orderstatus,
        |       CASE WHEN o_orderkey % 2 = 0 THEN 'pre-schema'
        |            ELSE o_orderpriority END AS prio,
        |       count(*) AS cnt, round(sum(o_totalprice), 2) AS sum_price
        |FROM orders GROUP BY 1, 2""".stripMargin,
    // raw data values only (no arithmetic) → exact parity; numeric
    // min/max as DOUBLE, strings as VARCHAR, one row per profiled column
    "q_profile" -> Seq(
        "o_orderkey" -> true, "o_custkey" -> true, "o_orderstatus" -> false,
        "o_totalprice" -> true, "o_orderpriority" -> false)
      .map { case (c, num) =>
        val (mnN, mxN) = if (num) (s"CAST(min($c) AS DOUBLE)", s"CAST(max($c) AS DOUBLE)")
                         else ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)")
        val (mnS, mxS) = if (num) ("CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)")
                         else (s"CAST(min($c) AS VARCHAR)", s"CAST(max($c) AS VARCHAR)")
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
           |  count(*) - count($c) AS n_nulls,
           |  count(DISTINCT $c) AS n_distinct,
           |  $mnN AS min_num, $mxN AS max_num,
           |  $mnS AS min_str, $mxS AS max_str FROM orders""".stripMargin
      }.mkString("\nUNION ALL\n"),
    // exact integer power sums → fixed-order IEEE double formulas:
    // bit-identical across engines, no rounding anywhere
    "q_stats_moments" ->
      """WITH s AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    sum(CAST(l_quantity AS BIGINT)) AS sx,
        |    sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sxx,
        |    sum(CAST(l_linenumber AS BIGINT)) AS sy,
        |    sum(CAST(l_linenumber AS BIGINT) * CAST(l_linenumber AS BIGINT)) AS syy,
        |    sum(CAST(l_quantity AS BIGINT) * CAST(l_linenumber AS BIGINT)) AS sxy
        |  FROM lineitem GROUP BY l_returnflag
        |)
        |SELECT l_returnflag, n,
        |  CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean_x,
        |  CAST(n * sxx - sx * sx AS DOUBLE) / CAST(n AS DOUBLE) / CAST(n AS DOUBLE) AS var_x,
        |  sqrt(CAST(n * sxx - sx * sx AS DOUBLE) / CAST(n AS DOUBLE) / CAST(n AS DOUBLE)) AS std_x,
        |  CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n AS DOUBLE) / CAST(n AS DOUBLE) AS cov_xy,
        |  CAST(n * sxy - sx * sy AS DOUBLE)
        |    / sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
        |    / sqrt(CAST(n * syy - sy * sy AS DOUBLE)) AS corr_xy
        |FROM s""".stripMargin,
    // same explicit bucket arithmetic as the Spark side (bit-identical)
    "q_histogram" ->
      """SELECT CAST(floor(o_totalprice * 20.0 / 600000.0) AS BIGINT) AS bucket,
        |       count(*) AS cnt, round(sum(o_totalprice), 2) AS sum_price
        |FROM orders GROUP BY 1""".stripMargin,
    "q_histogram2d" ->
      """SELECT CAST(floor((l_quantity - 1.0) * 10.0 / 50.0) AS BIGINT) AS bx,
        |       CAST(floor(l_extendedprice * 10.0 / 120000.0) AS BIGINT) AS by,
        |       count(*) AS cnt, round(sum(l_discount), 2) AS sum_disc
        |FROM lineitem GROUP BY 1, 2""".stripMargin,
    // the oracle's UNION ALL scans lineitem four times — the Spark side's
    // single-Expand unpivot is the point; values are raw (exact parity)
    "q_unpivot" ->
      """SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS val FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem""".stripMargin,
    "q_kanon" ->
      """WITH g AS (
        |  SELECT c_mktsegment, c_nationkey, count(*) AS grp_n
        |  FROM customer GROUP BY c_mktsegment, c_nationkey
        |)
        |SELECT c_custkey,
        |       CASE WHEN grp_n >= 10 THEN c_mktsegment ELSE '*' END AS seg_anon,
        |       CASE WHEN grp_n >= 10 THEN CAST(c_nationkey AS VARCHAR)
        |            ELSE '*' END AS nation_anon,
        |       (grp_n >= 10) AS published
        |FROM customer JOIN g USING (c_mktsegment, c_nationkey)""".stripMargin,
    // same FNV bucket arithmetic as q_sample_hash; disjoint-bucket split
    "q_split" ->
      s"""WITH f AS (
         |  SELECT doc_id, lang, ${utf8BytesSql("CAST(doc_id AS VARCHAR)")} AS bs
         |  FROM documents
         |), g AS (
         |  SELECT doc_id, lang,
         |    list_reduce(list_prepend(CAST(2166136261 AS BIGINT), bs),
         |      (h, c) -> (xor(h, c) * 16777619) % 4294967296) AS h
         |  FROM f
         |)
         |SELECT doc_id, lang,
         |       CASE WHEN h % 10 = 0 THEN 'val' ELSE 'train' END AS split
         |FROM g""".stripMargin,
    // cluster-keyed split: CC labels (the q_dedup_cc truth) decide the
    // hash key, so near-dup clusters land whole on one side
    "q_split_leakage" -> splitLeakageOracle,
    // oracle reads the ORIGINAL table: the shatter→compact→read cycle
    // must be byte-faithful per row (md5 over the utf-8 text)
    "q_compact" ->
      "SELECT doc_id, lang, n_chars, md5(text) AS digest FROM documents",
    // the bloom filter is a plan-level optimization; results must equal
    // the plain filtered join exactly
    "q_join_bloom" ->
      """SELECT CAST(s_nationkey AS BIGINT) AS s_nationkey,
        |       round(sum(l_quantity), 2) AS sum_qty, count(*) AS cnt
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |WHERE s_acctbal > 5000.0
        |GROUP BY 1""".stripMargin,
    // per-token FNV-1a (same byte-loop as q_udf_fnv), folded mod 64
    "q_feature_hash" ->
      s"""WITH w AS (
         |  SELECT doc_id,
         |         unnest(list_filter(string_split_regex(lower(text), '$Ws'),
         |                            x -> x != '')) AS tok
         |  FROM documents
         |), f AS (
         |  SELECT doc_id, ${utf8BytesSql("tok")} AS bs FROM w
         |), g AS (
         |  SELECT doc_id,
         |    list_reduce(list_prepend(CAST(2166136261 AS BIGINT), bs),
         |      (h, c) -> (xor(h, c) * 16777619) % 4294967296) % 64 AS bucket
         |  FROM f
         |)
         |SELECT doc_id, bucket, count(*) AS cnt
         |FROM g GROUP BY doc_id, bucket""".stripMargin,
    // the two-phase top-k must equal the oracle's single global window
    "q_sample_group" ->
      s"""WITH f AS (
         |  SELECT doc_id, lang, ${utf8BytesSql("CAST(doc_id AS VARCHAR)")} AS bs
         |  FROM documents
         |), g AS (
         |  SELECT doc_id, lang,
         |    list_reduce(list_prepend(CAST(2166136261 AS BIGINT), bs),
         |      (h, c) -> (xor(h, c) * 16777619) % 4294967296) AS h
         |  FROM f
         |), r AS (
         |  SELECT doc_id, lang, h,
         |         CAST(row_number() OVER (PARTITION BY lang
         |                                 ORDER BY h, doc_id) AS BIGINT) AS rk
         |  FROM g
         |)
         |SELECT doc_id, lang, h, rk FROM r WHERE rk <= 5""".stripMargin,
    "q_sequence" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |         date_trunc('microseconds', ts) AS ts
        |  FROM events
        |), t AS (
        |  SELECT user_id, event_type,
        |         lag(event_type) OVER (PARTITION BY user_id
        |                               ORDER BY ts, event_id) AS prev_type
        |  FROM e
        |)
        |SELECT prev_type, event_type AS next_type, count(*) AS cnt,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM t WHERE prev_type IS NOT NULL
        |GROUP BY prev_type, next_type""".stripMargin,
    // triangle count is orientation-independent, so the oracle may use
    // the simple id-ordered triple join (fine at oracle scale) while the
    // Spark side uses degree-ordered wedges — identical totals
    "q_triangle" ->
      """WITH lp AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem
        |), e AS (
        |  SELECT DISTINCT a.p AS u, b.p AS v
        |  FROM lp a JOIN lp b ON a.ok = b.ok AND a.p < b.p
        |), deg AS (
        |  SELECT n, count(*) AS d
        |  FROM (SELECT u AS n FROM e UNION ALL SELECT v AS n FROM e)
        |  GROUP BY n
        |), w AS (
        |  SELECT count(*) AS n_nodes,
        |         CAST(sum((d * (d - 1)) // 2) AS BIGINT) AS n_wedges
        |  FROM deg
        |), t AS (
        |  SELECT count(*) AS n_triangles
        |  FROM e e1 JOIN e e2 ON e2.u = e1.v
        |            JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
        |)
        |SELECT w.n_nodes, (SELECT count(*) FROM e) AS n_edges, w.n_wedges,
        |       t.n_triangles, 3.0 * t.n_triangles / w.n_wedges AS clustering
        |FROM w, t""".stripMargin,
    // DOULION replay: the FNV keep-coin is deterministic, so the oracle
    // recomputes the SAME sampled edge set and counts its triangles
    // exactly (id-ordered triple join — orientation-independent); the
    // 1/p³ correction is an exact ×64 BIGINT multiply
    "q_triangle_approx" ->
      s"""WITH lp AS MATERIALIZED (
         |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem
         |), e AS MATERIALIZED (
         |  SELECT DISTINCT a.p AS u, b.p AS v
         |  FROM lp a JOIN lp b ON a.ok = b.ok AND a.p < b.p
         |), h0 AS (
         |  SELECT u, v,
         |    list_reduce(list_prepend(CAST(2166136261 AS BIGINT),
         |      ${utf8BytesSql("CAST(u AS VARCHAR) || '_' || CAST(v AS VARCHAR)")}),
         |      (h, c) -> (xor(h, c) * 16777619) % 4294967296) AS h
         |  FROM e
         |), m1 AS (
         |  SELECT u, v, (xor(h >> 16, h) * 73244475) % 4294967296 AS h FROM h0
         |), m2 AS (
         |  SELECT u, v, (xor(h >> 16, h) * 73244475) % 4294967296 AS h FROM m1
         |), k AS MATERIALIZED (
         |  SELECT u, v FROM m2
         |  WHERE xor(h >> 16, h) % ${operators.Graphs.TriangleKeepMod} = 0
         |), t AS (
         |  SELECT count(*) AS n
         |  FROM k e1 JOIN k e2 ON e2.u = e1.v
         |            JOIN k e3 ON e3.u = e1.u AND e3.v = e2.v
         |)
         |SELECT (SELECT count(*) FROM k) AS n_edges_sampled,
         |       t.n AS n_triangles_sampled,
         |       CAST(t.n * ${operators.Graphs.TriangleKeepMod.toLong * operators.Graphs.TriangleKeepMod * operators.Graphs.TriangleKeepMod} AS BIGINT) AS est_triangles
         |FROM t""".stripMargin,
    // deterministic random walks replayed step by step: the ranked
    // adjacency (row_number per src), then per step the SAME
    // fnv32a + double-round mix32 coin mod degree picking the ranked
    // neighbor — a hash-exact replay of a randomized-walk algorithm,
    // chained CTEs like the unrolled pagerank/kcore rounds
    "q_random_walk" -> s"WITH $rwOracleCtes\n$rwOracleUnions",
    // skip-gram co-occurrence counts over the SAME replayed walks —
    // the walk CTE chain is shared verbatim with q_random_walk, then
    // a banded self-join + count
    "q_walk_pairs" ->
      s"""WITH $rwOracleCtes, walks AS (
         |$rwOracleUnions
         |)
         |SELECT a.node AS center, b.node AS context,
         |       CAST(count(*) AS BIGINT) AS cnt
         |FROM walks a JOIN walks b
         |  ON a.start = b.start
         | AND abs(a.step - b.step) <= ${operators.Graphs.WalkWindow}
         | AND a.step != b.step
         |GROUP BY 1, 2""".stripMargin,
    // biased second-order walks replayed: step 1 is the uniform ranked
    // pick; steps 2+ weight each neighbor (Back/In/Out integers) and
    // pick the first dst-ordered neighbor whose window cumsum exceeds
    // coin mod total — the Spark fold and the SQL window agree exactly
    "q_node2vec" -> {
      def mixChain(k: Int, cols: String, input: String, from: String): String =
        s"""h${k}0 AS (
           |  SELECT $cols,
           |    list_reduce(list_prepend(CAST(2166136261 AS BIGINT),
           |      ${utf8BytesSql(input)}),
           |      (h, c) -> (xor(h, c) * 16777619) % 4294967296) AS h
           |  FROM $from
           |), h${k}1 AS (
           |  SELECT $cols, (xor(h >> 16, h) * 73244475) % 4294967296 AS h FROM h${k}0
           |), h${k}2 AS (
           |  SELECT $cols, (xor(h >> 16, h) * 73244475) % 4294967296 AS h FROM h${k}1
           |)""".stripMargin
      val step1 =
        s"""${mixChain(1, "start, node",
             "CAST(start AS VARCHAR) || '_0_' || CAST(node AS VARCHAR)", "w0")}, w1 AS (
           |  SELECT q.start, q.node AS prev, e.dst AS node
           |  FROM h12 q
           |  JOIN dg ON dg.src = q.node
           |  JOIN e ON e.src = q.node AND e.rnk = xor(q.h >> 16, q.h) % dg.d
           |)""".stripMargin
      val later = (2 to operators.Graphs.RwSteps).map { k =>
        s"""${mixChain(k, "start, prev, node",
             s"CAST(start AS VARCHAR) || '_${k - 1}_' || CAST(prev AS VARCHAR) || '_' || CAST(node AS VARCHAR)",
             s"w${k - 1}")}, nbr$k AS (
           |  SELECT q.start, q.prev, q.node, e.dst, xor(q.h >> 16, q.h) AS hh,
           |    CASE WHEN e.dst = q.prev THEN 0
           |         WHEN pe.src IS NOT NULL THEN 1 ELSE 2 END AS grp,
           |    CASE WHEN e.dst = q.prev THEN ${operators.Graphs.N2vBack}
           |         WHEN pe.src IS NOT NULL THEN ${operators.Graphs.N2vIn}
           |         ELSE ${operators.Graphs.N2vOut} END AS wt
           |  FROM h${k}2 q
           |  JOIN e0 e ON e.src = q.node
           |  LEFT JOIN e0 pe ON pe.src = q.prev AND pe.dst = e.dst
           |), cum$k AS (
           |  SELECT start, prev, node, dst, hh, grp,
           |    sum(wt) OVER (PARTITION BY start ORDER BY grp, dst) AS cum,
           |    sum(wt) OVER (PARTITION BY start) AS total
           |  FROM nbr$k
           |), w$k AS (
           |  SELECT start, prev2 AS prev, node FROM (
           |    SELECT start, node AS prev2, dst AS node,
           |           row_number() OVER (PARTITION BY start ORDER BY grp, dst) AS rn
           |    FROM cum$k WHERE cum > hh % total) WHERE rn = 1
           |)""".stripMargin
      }.mkString(", ")
      val unions = (s"SELECT start, CAST(0 AS BIGINT) AS step, start AS node FROM w0" +:
        (1 to operators.Graphs.RwSteps).map(k =>
          s"SELECT start, CAST($k AS BIGINT) AS step, node FROM w$k"))
        .mkString("\n|UNION ALL\n|")
      s"""WITH lp AS MATERIALIZED (
         |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem
         |), und AS MATERIALIZED (
         |  SELECT DISTINCT a.p AS u, b.p AS v
         |  FROM lp a JOIN lp b ON a.ok = b.ok AND a.p < b.p
         |), e0 AS MATERIALIZED (
         |  SELECT u AS src, v AS dst FROM und
         |  UNION ALL SELECT v AS src, u AS dst FROM und
         |), e AS MATERIALIZED (
         |  SELECT src, dst,
         |         CAST(row_number() OVER (PARTITION BY src ORDER BY dst) AS BIGINT) - 1 AS rnk
         |  FROM e0
         |), dg AS MATERIALIZED (
         |  SELECT src, CAST(count(*) AS BIGINT) AS d FROM e0 GROUP BY src
         |), s0 AS (
         |  SELECT src,
         |    list_reduce(list_prepend(CAST(2166136261 AS BIGINT),
         |      ${utf8BytesSql("'n2v_' || CAST(src AS VARCHAR)")}),
         |      (h, c) -> (xor(h, c) * 16777619) % 4294967296) AS h
         |  FROM dg
         |), s1 AS (
         |  SELECT src, (xor(h >> 16, h) * 73244475) % 4294967296 AS h FROM s0
         |), s2 AS (
         |  SELECT src, (xor(h >> 16, h) * 73244475) % 4294967296 AS h FROM s1
         |), w0 AS (
         |  SELECT src AS start, src AS node FROM s2
         |  WHERE xor(h >> 16, h) % ${operators.Graphs.N2vShards} = 0
         |), $step1, $later
         |$unions""".stripMargin
    },
    "q_pmi" ->
      s"""WITH toks AS (
         |  SELECT doc_id, list_filter(string_split_regex(lower(text), '$Ws'), x -> x != '') AS ts
         |  FROM documents
         |), uni AS (
         |  SELECT unnest(ts) AS tok FROM toks
         |), ucnt AS (
         |  SELECT tok, count(*) AS c FROM uni GROUP BY tok
         |), bi AS (
         |  SELECT ts[i] || ' ' || ts[i+1] AS bigram
         |  FROM toks, unnest(range(1, len(ts))) AS u(i)
         |  WHERE len(ts) >= 2
         |), bcnt AS (
         |  SELECT bigram, count(*) AS c_xy FROM bi GROUP BY bigram
         |)
         |SELECT f.bigram, f.c_xy, x.c AS c_x, y.c AS c_y,
         |       CAST(f.c_xy AS DOUBLE) * (SELECT count(*) FROM uni)
         |         / (SELECT count(*) FROM bi) * (SELECT count(*) FROM uni)
         |         / x.c / y.c AS lift
         |FROM bcnt f
         |JOIN ucnt x ON x.tok = string_split(f.bigram, ' ')[1]
         |JOIN ucnt y ON y.tok = string_split(f.bigram, ' ')[2]
         |WHERE f.c_xy >= 5""".stripMargin,
    "q_ngram_df" ->
      s"""WITH toks AS (
         |  SELECT doc_id, list_filter(string_split_regex(lower(text), '$Ws'), x -> x != '') AS ts
         |  FROM documents
         |), sh AS (
         |  SELECT DISTINCT doc_id,
         |         ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS ngram
         |  FROM toks, unnest(range(1, len(ts) - 1)) AS u(i)
         |  WHERE len(ts) >= 3
         |)
         |SELECT ngram, count(*) AS df FROM sh
         |GROUP BY ngram HAVING count(*) >= 3""".stripMargin,
    "q_sample_weighted" ->
      s"""WITH f AS (
         |  SELECT o_orderkey AS id, o_totalprice AS w,
         |         ${utf8BytesSql("CAST(o_orderkey AS VARCHAR)")} AS bs
         |  FROM orders
         |), g AS (
         |  SELECT id, w,
         |    list_reduce(list_prepend(CAST(2166136261 AS BIGINT), bs),
         |      (h, c) -> (xor(h, c) * 16777619) % 4294967296) AS h
         |  FROM f
         |)
         |SELECT id, round(w, 2) AS weight FROM g
         |ORDER BY ln((h + 0.5) / 4294967296) / w DESC, id
         |LIMIT 100""".stripMargin,
    "q_join_interval" ->
      """SELECT CAST(p.ts AS DATE) AS day, count(*) AS n_pairs,
        |       CAST(count(DISTINCT p.event_id) AS BIGINT) AS n_purchases,
        |       CAST(count(DISTINCT c.event_id) AS BIGINT) AS n_clicks
        |FROM events p JOIN events c
        |  ON abs(epoch_us(p.ts) - epoch_us(c.ts)) <= 60000000
        |WHERE p.event_type = 'purchase' AND c.event_type = 'click'
        |GROUP BY CAST(p.ts AS DATE)""".stripMargin,
    "q_skyline" ->
      """WITH p AS (
        |  SELECT o_totalprice AS price, o_orderdate AS odate, count(*) AS n_dups
        |  FROM orders GROUP BY 1, 2
        |)
        |SELECT price, odate, n_dups FROM p b
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM p a
        |  WHERE a.price >= b.price AND a.odate <= b.odate
        |    AND (a.price > b.price OR a.odate < b.odate))""".stripMargin,
    "q_dedup_contain" ->
      s"""WITH toks AS (
         |  SELECT doc_id, list_filter(string_split_regex(lower(text), '$Ws'), x -> x != '') AS ts
         |  FROM documents
         |), sh AS (
         |  SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
         |  FROM toks, unnest(range(1, len(ts) - 1)) AS u(i)
         |  WHERE len(ts) >= 3
         |), sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |iv AS (
         |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS ic
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id
         |), d AS (
         |  SELECT da AS src, db AS dst, CAST(ic AS DOUBLE) / x.n AS cont
         |  FROM iv JOIN sz x ON da = x.doc_id
         |  UNION ALL
         |  SELECT db AS src, da AS dst, CAST(ic AS DOUBLE) / y.n AS cont
         |  FROM iv JOIN sz y ON db = y.doc_id
         |)
         |SELECT src, dst, cont FROM d WHERE cont >= 0.6""".stripMargin,
    "q_source_binary" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |       md5(text) AS md5
        |FROM documents""".stripMargin,
    "q_cogroup" ->
      """WITH o AS (
        |  SELECT o_orderkey, count(*) AS n_orders FROM orders GROUP BY 1
        |), l AS (
        |  SELECT l_orderkey, count(*) AS n_lines,
        |         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |  FROM lineitem GROUP BY 1
        |)
        |SELECT COALESCE(o.o_orderkey, l.l_orderkey) AS o_orderkey,
        |       COALESCE(o.n_orders, 0) AS n_orders,
        |       COALESCE(l.n_lines, 0) AS n_lines,
        |       COALESCE(l.sum_qty, 0) AS sum_qty,
        |       CASE WHEN o.o_orderkey IS NOT NULL AND l.l_orderkey IS NOT NULL
        |              THEN 'both'
        |            WHEN o.o_orderkey IS NOT NULL THEN 'order_only'
        |            ELSE 'lines_only' END AS side
        |FROM o FULL OUTER JOIN l ON o.o_orderkey = l.l_orderkey""".stripMargin,
    "q_source_xml" ->
      """SELECT CAST(s_nationkey AS BIGINT) AS s_nationkey, count(*) AS cnt,
        |       round(sum(s_acctbal), 2) AS sum_bal
        |FROM supplier GROUP BY s_nationkey""".stripMargin,
    "q_histogram_eq" ->
      """WITH r AS (
        |  SELECT o_totalprice AS v,
        |         row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rn,
        |         count(*) OVER () AS n
        |  FROM orders
        |)
        |SELECT ((rn - 1) * 10) // n AS bucket, count(*) AS cnt,
        |       min(v) AS lo_v, max(v) AS hi_v, round(sum(v), 2) AS sum_v
        |FROM r GROUP BY 1""".stripMargin,
    "q_corr_matrix" ->
      """WITH s AS (
        |  SELECT count(*) AS n,
        |    sum(a) AS sa, sum(b) AS sb, sum(c) AS sc,
        |    sum(a*a) AS saa, sum(b*b) AS sbb, sum(c*c) AS scc,
        |    sum(a*b) AS sab, sum(a*c) AS sac, sum(b*c) AS sbc
        |  FROM (SELECT CAST(round(l_quantity*100) AS BIGINT) AS a,
        |               CAST(round(l_extendedprice*100) AS BIGINT) AS b,
        |               CAST(round(l_discount*100) AS BIGINT) AS c FROM lineitem)
        |)
        |SELECT x_col, y_col, corr FROM (
        |  SELECT 'l_quantity' AS x_col, 'l_extendedprice' AS y_col,
        |         CAST(n*sab - sa*sb AS DOUBLE)
        |           / sqrt(CAST(n*saa - sa*sa AS DOUBLE))
        |           / sqrt(CAST(n*sbb - sb*sb AS DOUBLE)) AS corr FROM s
        |  UNION ALL
        |  SELECT 'l_quantity', 'l_discount',
        |         CAST(n*sac - sa*sc AS DOUBLE)
        |           / sqrt(CAST(n*saa - sa*sa AS DOUBLE))
        |           / sqrt(CAST(n*scc - sc*sc AS DOUBLE)) FROM s
        |  UNION ALL
        |  SELECT 'l_extendedprice', 'l_discount',
        |         CAST(n*sbc - sb*sc AS DOUBLE)
        |           / sqrt(CAST(n*sbb - sb*sb AS DOUBLE))
        |           / sqrt(CAST(n*scc - sc*sc AS DOUBLE)) FROM s
        |)""".stripMargin,
    "q_degree_dist" ->
      """WITH lp AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem
        |), e AS (
        |  SELECT DISTINCT a.p AS u, b.p AS v
        |  FROM lp a JOIN lp b ON a.ok = b.ok AND a.p < b.p
        |), deg AS (
        |  SELECT n, count(*) AS degree
        |  FROM (SELECT u AS n FROM e UNION ALL SELECT v AS n FROM e)
        |  GROUP BY n
        |)
        |SELECT degree, count(*) AS n_nodes FROM deg GROUP BY degree""".stripMargin,
    "q_stream_topevent" ->
      """WITH c AS (
        |  SELECT strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M:%S') AS wstart,
        |         event_type, count(*) AS cnt
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT wstart, event_type AS top_type, cnt AS top_cnt
        |FROM c
        |QUALIFY row_number() OVER (
        |  PARTITION BY wstart ORDER BY cnt DESC, event_type DESC) = 1""".stripMargin,
    "q_snapshot_diff" ->
      """WITH v1 AS (
        |  SELECT o_orderkey AS key, o_orderpriority AS p1
        |  FROM orders WHERE o_orderkey % 89 <> 0
        |), v2 AS (
        |  SELECT o_orderkey AS key,
        |         CASE WHEN o_orderkey % 13 = 0
        |              THEN 'CHANGED-' || o_orderpriority
        |              ELSE o_orderpriority END AS p2
        |  FROM orders WHERE o_orderkey % 97 <> 0
        |)
        |SELECT COALESCE(v1.key, v2.key) AS key,
        |       CASE WHEN v1.key IS NULL THEN 'added'
        |            WHEN v2.key IS NULL THEN 'removed'
        |            WHEN p1 <> p2 THEN 'modified'
        |            ELSE 'unchanged' END AS change,
        |       p1, p2
        |FROM v1 FULL OUTER JOIN v2 ON v1.key = v2.key""".stripMargin,
    // three-clause MERGE replay: same 90-day feed cut, same erasure
    // slice, same full-outer CASE — exact BIGINT cents throughout
    "q_merge" ->
      """WITH cut AS (
        |  SELECT max(o_orderdate) - INTERVAL 90 DAY AS c FROM orders
        |), feed AS (
        |  SELECT o_custkey AS c_custkey,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS spend_cents,
        |         CASE WHEN o_custkey % 11 = 0 THEN 'D' ELSE 'U' END AS op
        |  FROM orders, cut WHERE o_orderdate >= cut.c
        |  GROUP BY o_custkey
        |), base AS (
        |  SELECT c_custkey, c_name,
        |         CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents
        |  FROM customer WHERE c_custkey % 13 <> 5
        |)
        |SELECT COALESCE(b.c_custkey, f.c_custkey) AS c_custkey,
        |       CASE WHEN b.c_custkey IS NULL
        |            THEN 'new:' || CAST(f.c_custkey AS VARCHAR)
        |            ELSE b.c_name END AS c_name,
        |       CASE WHEN b.c_custkey IS NULL THEN f.spend_cents
        |            WHEN f.c_custkey IS NULL THEN b.acctbal_cents
        |            ELSE b.acctbal_cents + f.spend_cents END AS acctbal_cents,
        |       CASE WHEN b.c_custkey IS NULL THEN 'insert'
        |            WHEN f.c_custkey IS NULL THEN 'keep'
        |            ELSE 'update' END AS action
        |FROM base b FULL OUTER JOIN feed f ON b.c_custkey = f.c_custkey
        |WHERE NOT (f.c_custkey IS NOT NULL AND f.op = 'D')""".stripMargin,
    "q_embed_centroid" ->
      """SELECT CAST(label AS BIGINT) AS label, CAST(i AS BIGINT) AS dim,
        |       count(*) AS n,
        |       round(avg(CAST(embedding[i] AS DOUBLE)), 4) + 0.0 AS mean_e
        |FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)
        |GROUP BY label, i""".stripMargin,
    "q_nearest_centroid" ->
      """WITH cent AS (
        |  SELECT CAST(label AS BIGINT) AS cand, CAST(i AS BIGINT) AS dim,
        |         round(avg(CAST(embedding[i] AS DOUBLE)), 4) AS c
        |  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)
        |  GROUP BY label, i
        |), ex AS (
        |  SELECT vec_id, CAST(label AS BIGINT) AS true_label,
        |         CAST(i AS BIGINT) AS dim, CAST(embedding[i] AS DOUBLE) AS x
        |  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)
        |), d AS (
        |  SELECT vec_id, true_label, cand, sum((x - c) * (x - c)) AS d2
        |  FROM ex JOIN cent ON ex.dim = cent.dim
        |  GROUP BY vec_id, true_label, cand
        |), p AS (
        |  SELECT vec_id, true_label, cand AS pred_label
        |  FROM d
        |  QUALIFY row_number() OVER (
        |    PARTITION BY vec_id ORDER BY d2, cand) = 1
        |)
        |SELECT true_label, pred_label, count(*) AS n
        |FROM p GROUP BY true_label, pred_label""".stripMargin,
    "q_gini" ->
      """WITH r AS (
        |  SELECT o_orderpriority AS grp,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS x,
        |         row_number() OVER (
        |           PARTITION BY o_orderpriority
        |           ORDER BY CAST(round(o_totalprice * 100) AS BIGINT), o_orderkey) AS rk
        |  FROM orders
        |)
        |SELECT grp, count(*) AS n, CAST(sum(x) AS BIGINT) AS total_cents,
        |       CAST(2 * sum(rk * x) - (count(*) + 1) * sum(x) AS DOUBLE)
        |         / count(*) / CAST(sum(x) AS DOUBLE) AS gini
        |FROM r GROUP BY grp""".stripMargin,
    "q_dedup_stats" ->
      s"""WITH RECURSIVE toks AS (
         |  SELECT doc_id, list_filter(string_split_regex(lower(text), '$Ws'), x -> x != '') AS ts
         |  FROM documents
         |), sh AS (
         |  SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
         |  FROM toks, unnest(range(1, len(ts) - 1)) AS u(i)
         |  WHERE len(ts) >= 3
         |), sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |iv AS (
         |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS ic
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id
         |), pairs AS (
         |  SELECT da, db
         |  FROM iv JOIN sz x ON da = x.doc_id JOIN sz y ON db = y.doc_id
         |  WHERE CAST(ic AS DOUBLE) / (x.n + y.n - ic) >= 0.8
         |), edges AS (
         |  SELECT da AS u, db AS v FROM pairs
         |  UNION ALL SELECT db, da FROM pairs
         |), reach AS (
         |  SELECT DISTINCT u AS node, u AS r FROM edges
         |  UNION
         |  SELECT e.u AS node, t.r FROM edges e JOIN reach t ON e.v = t.node
         |), comp AS (
         |  SELECT node AS doc_id, min(r) AS comp FROM reach GROUP BY node
         |), csz AS (
         |  SELECT comp, count(*) AS sz FROM comp GROUP BY comp
         |), hist AS (
         |  SELECT sz, count(*) AS n_clusters FROM csz GROUP BY sz
         |  UNION ALL
         |  SELECT 1 AS sz,
         |         (SELECT count(*) FROM documents)
         |           - COALESCE((SELECT sum(sz) FROM csz), 0) AS n_clusters
         |)
         |SELECT sz, CAST(sum(n_clusters) AS BIGINT) AS n_clusters
         |FROM hist GROUP BY sz HAVING sum(n_clusters) > 0""".stripMargin,
    "q_chunk" ->
      s"""WITH toks AS (
         |  SELECT doc_id, list_filter(string_split_regex(lower(text), '$Ws'), x -> x != '') AS ts
         |  FROM documents
         |), d AS (
         |  SELECT doc_id, ts, len(ts) AS n FROM toks WHERE len(ts) > 0
         |)
         |SELECT doc_id,
         |       CAST((s - 1) // 40 AS BIGINT) AS chunk_idx,
         |       CAST(least(50, n - s + 1) AS BIGINT) AS chunk_len,
         |       md5(array_to_string(list_slice(ts, s, s + 49), ' ')) AS chunk_md5
         |FROM d, unnest(range(1, n + 1, 40)) AS u(s)""".stripMargin
  )

  /** DuckDB whitespace-run class (single-backslash: DuckDB string
    * literals do not unescape). */
  private val Ws = "[ \\t\\n\\r\\f\\x0B]+"

  /** Gopher stopword list / threshold interpolated from the SAME
    * constants the Spark operator reads (the LangProfiles/$Ws "no
    * drift" convention — ADVICE r13). */
  private def GopherStopsSql: String =
    graft.operators.TextOps.GopherStops.map("'" + _ + "'").mkString(",")
  private def GopherMinStops: Long = graft.operators.TextOps.GopherMinStopHits

  /** The enriched curation corpus as a CTE: driver fixture ∪ the
    * web-shaped slice, the SAME rows the Spark side unions in
    * (`sources/WebCorpus.scala` — ONE Scala generator feeds both
    * engines, so the corpus cannot drift; the slice is INPUT, like the
    * shared parquet, not re-implemented computation). Lines are joined
    * with chr(10) so the literal survives JSON/SQL transport. */
  private def webDocsCte: String = {
    val vals = graft.sources.WebCorpus.sliceRows.map {
      case (id, text, lang, src, nc) =>
        val lit = text.split("\n").map("'" + _ + "'").mkString(" || chr(10) || ")
        s"($id, $lit, '$lang', '$src', $nc)"
    }.mkString(",\n    ")
    s"""webdocs AS (
       |  SELECT doc_id, text, lang, source, n_chars FROM documents
       |  UNION ALL
       |  SELECT * FROM (VALUES
       |    $vals) AS w(doc_id, text, lang, source, n_chars)
       |)""".stripMargin
  }

  /** Gopher signal CTE chain over `src` (doc_id, text): emits `${p}t`,
    * `${p}s`, `${p}r` — `${p}r` carries (doc_id, n_words,
    * mean_word_len, symbol_ratio, bullet_frac, ellipsis_frac,
    * alpha_frac, stop_hits). ONE definition serves q_quality_gopher
    * (src = documents) and q_pipeline_web (src = the C4-cleaned CTE):
    * the stitched pipeline replays byte-identical rule SQL. */
  private def gopherCtes(p: String, src: String): String =
    s"""${p}t AS (
       |  SELECT doc_id, text,
       |         list_filter(string_split_regex(lower(text), '$Ws'), x -> x != '') AS toks,
       |         string_split(text, chr(10)) AS lines
       |  FROM $src
       |), ${p}s AS (
       |  SELECT doc_id,
       |    CAST(len(toks) AS BIGINT) AS n_words,
       |    CAST(len(lines) AS BIGINT) AS n_lines,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |        list_transform(toks, x -> CAST(length(x) AS BIGINT))),
       |      (a, x) -> a + x) AS sum_len,
       |    CAST(length(text) - length(replace(text, '#', ''))
       |      + len(regexp_extract_all(text, '\\.\\.\\.')) AS BIGINT) AS n_sym,
       |    CAST(len(list_filter(lines, x -> regexp_matches(x, '^[-*] '))) AS BIGINT) AS n_bullet,
       |    CAST(len(list_filter(lines, x -> regexp_matches(x, '\\.\\.\\.\\z'))) AS BIGINT) AS n_ell_end,
       |    CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS n_alpha,
       |    CAST(len(list_filter([$GopherStopsSql],
       |      w -> list_contains(toks, w))) AS BIGINT) AS stop_hits
       |  FROM ${p}t
       |), ${p}r AS (
       |  SELECT doc_id, n_words,
       |    CASE WHEN n_words <= 0 THEN 0.0 ELSE CAST(sum_len AS DOUBLE) / n_words END AS mean_word_len,
       |    CASE WHEN n_words <= 0 THEN 0.0 ELSE CAST(n_sym AS DOUBLE) / n_words END AS symbol_ratio,
       |    CAST(n_bullet AS DOUBLE) / n_lines AS bullet_frac,
       |    CAST(n_ell_end AS DOUBLE) / n_lines AS ellipsis_frac,
       |    CASE WHEN n_words <= 0 THEN 0.0 ELSE CAST(n_alpha AS DOUBLE) / n_words END AS alpha_frac,
       |    stop_hits
       |  FROM ${p}s
       |)""".stripMargin

  /** The Gopher conjunctive keep, over a `${p}r` row. */
  private def GopherKeepSql: String =
    s"""(n_words >= 50 AND n_words <= 100000)
       |    AND (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
       |    AND symbol_ratio <= 0.1 AND bullet_frac <= 0.9
       |    AND ellipsis_frac <= 0.3 AND alpha_frac >= 0.8
       |    AND stop_hits >= $GopherMinStops""".stripMargin

  /** C4 line-clean CTE chain over `src` (doc_id, text): emits `${p}t`,
    * `${p}s`, `${p}r` — `${p}r` carries (doc_id, n_lines, n_kept,
    * drop_reason, kept). Shared by q_c4_clean and q_pipeline_web. */
  private def c4Ctes(p: String, src: String): String =
    s"""${p}t AS (
       |  SELECT doc_id, text, string_split(text, chr(10)) AS lines FROM $src
       |), ${p}s AS (
       |  SELECT doc_id, text, lines,
       |    list_filter(lines, x -> regexp_matches(x, '[.!?"]\\z')
       |      AND len(list_filter(string_split_regex(x, '[ \\t]+'), w -> w != '')) >= 5
       |      AND NOT regexp_matches(lower(x), 'javascript')) AS kept
       |  FROM ${p}t
       |), ${p}r AS (
       |  SELECT doc_id,
       |    CAST(len(lines) AS BIGINT) AS n_lines,
       |    CAST(len(kept) AS BIGINT) AS n_kept,
       |    CASE WHEN contains(lower(text), 'lorem ipsum') THEN 'lorem_ipsum'
       |         WHEN contains(text, '{') THEN 'brace'
       |         WHEN len(kept) < 3 THEN 'too_few_lines'
       |         ELSE 'none' END AS drop_reason,
       |    kept
       |  FROM ${p}s
       |)""".stripMargin

  /** q_repetition_gopher oracle: the 13 Gopher repetition signals
    * replayed grain-for-grain — line/paragraph duplicate counts over
    * trimmed-non-empty splits, word n-gram top/duplicate char masses
    * for n = 2..10 (one UNION ALL arm per n, the q_decontaminate
    * slice idiom), every ratio the same single CAST(x AS DOUBLE)/y
    * division and every threshold interpolated from the TextOps
    * constants. */
  private def repetitionGopherOracle: String = {
    import graft.operators.TextOps._
    val gramArms = (GopherTopGramFrac ++ GopherDupGramFrac).map(_._1).map(n =>
      s"""  SELECT doc_id, $n AS n,
         |         list_aggregate(ts[i:i+${n - 1}], 'string_agg', ' ') AS g
         |  FROM t, unnest(range(1, len(ts) - ${n - 2})) AS u(i)
         |  WHERE len(ts) >= $n""".stripMargin).mkString("\n  UNION ALL\n")
    val gwCols = (GopherTopGramFrac.map { case (n, _) =>
        s"max(CASE WHEN n = $n THEN top_mass END) AS top${n}_mass" } ++
      GopherDupGramFrac.map { case (n, _) =>
        s"max(CASE WHEN n = $n THEN dup_mass END) AS dup${n}_mass" })
      .mkString(",\n  ")
    val fracCols = (GopherTopGramFrac.map { case (n, _) =>
        s"CASE WHEN COALESCE(m, 0) <= 0 THEN 0.0 ELSE CAST(COALESCE(top${n}_mass, 0) AS DOUBLE) / m END AS top${n}_char_frac" } ++
      GopherDupGramFrac.map { case (n, _) =>
        s"CASE WHEN COALESCE(m, 0) <= 0 THEN 0.0 ELSE CAST(COALESCE(dup${n}_mass, 0) AS DOUBLE) / m END AS dup${n}_char_frac" })
      .mkString(",\n  ")
    val keep = (Seq(
        s"dup_line_frac <= $GopherDupLineFrac",
        s"dup_line_char_frac <= $GopherDupLineCharFrac",
        s"dup_para_frac <= $GopherDupParaFrac",
        s"dup_para_char_frac <= $GopherDupParaCharFrac") ++
      GopherTopGramFrac.map { case (n, t) => s"top${n}_char_frac <= $t" } ++
      GopherDupGramFrac.map { case (n, t) => s"dup${n}_char_frac <= $t" })
      .mkString(" AND ")
    s"""WITH t AS (
       |  SELECT doc_id, text,
       |         list_filter(string_split_regex(lower(text), '$Ws'), x -> x != '') AS ts
       |  FROM documents
       |), lcnt AS (
       |  SELECT doc_id, u, count(*) AS c
       |  FROM (SELECT doc_id, x AS u
       |        FROM t, unnest(list_filter(string_split(text, chr(10)),
       |                                   x -> trim(x) != '')) AS un(x))
       |  GROUP BY doc_id, u
       |), lstat AS (
       |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS l_n,
       |         CAST(count(*) AS BIGINT) AS l_nd,
       |         CAST(sum(length(u) * c) AS BIGINT) AS l_mass,
       |         CAST(sum(length(u) * (c - 1)) AS BIGINT) AS l_dup
       |  FROM lcnt GROUP BY doc_id
       |), pcnt AS (
       |  SELECT doc_id, u, count(*) AS c
       |  FROM (SELECT doc_id, x AS u
       |        FROM t, unnest(list_filter(string_split_regex(text, '\\n\\n+'),
       |                                   x -> trim(x) != '')) AS un(x))
       |  GROUP BY doc_id, u
       |), pstat AS (
       |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS p_n,
       |         CAST(count(*) AS BIGINT) AS p_nd,
       |         CAST(sum(length(u) * c) AS BIGINT) AS p_mass,
       |         CAST(sum(length(u) * (c - 1)) AS BIGINT) AS p_dup
       |  FROM pcnt GROUP BY doc_id
       |), grams AS (
       |$gramArms
       |), gcnt AS (
       |  SELECT doc_id, n, g, count(*) AS c FROM grams GROUP BY doc_id, n, g
       |), gs0 AS (
       |  -- most-frequent-gram argmax, ties to the longer gram: the same
       |  -- lexicographic (count, chars) struct max the engine computes
       |  SELECT doc_id, n,
       |         max(struct_pack(c := c, l := length(g) - (n - 1))) AS top_s,
       |         CAST(sum(CASE WHEN c >= 2 THEN c * (length(g) - (n - 1))
       |                       ELSE 0 END) AS BIGINT) AS dup_mass
       |  FROM gcnt GROUP BY doc_id, n
       |), gs AS (
       |  SELECT doc_id, n,
       |         CAST(struct_extract(top_s, 'c') * struct_extract(top_s, 'l') AS BIGINT) AS top_mass,
       |         dup_mass
       |  FROM gs0
       |), gw AS (
       |  SELECT doc_id,
       |  $gwCols
       |  FROM gs GROUP BY doc_id
       |), mass AS (
       |  SELECT doc_id,
       |         list_reduce(list_prepend(CAST(0 AS BIGINT),
       |             list_transform(ts, x -> CAST(length(x) AS BIGINT))),
       |           (a, x) -> a + x) AS m
       |  FROM t
       |), sig AS (
       |  SELECT d.doc_id,
       |  CASE WHEN COALESCE(l_n, 0) <= 0 THEN 0.0
       |       ELSE CAST(COALESCE(l_n, 0) - COALESCE(l_nd, 0) AS DOUBLE) / l_n END AS dup_line_frac,
       |  CASE WHEN COALESCE(l_mass, 0) <= 0 THEN 0.0
       |       ELSE CAST(COALESCE(l_dup, 0) AS DOUBLE) / l_mass END AS dup_line_char_frac,
       |  CASE WHEN COALESCE(p_n, 0) <= 0 THEN 0.0
       |       ELSE CAST(COALESCE(p_n, 0) - COALESCE(p_nd, 0) AS DOUBLE) / p_n END AS dup_para_frac,
       |  CASE WHEN COALESCE(p_mass, 0) <= 0 THEN 0.0
       |       ELSE CAST(COALESCE(p_dup, 0) AS DOUBLE) / p_mass END AS dup_para_char_frac,
       |  $fracCols
       |  FROM documents d
       |  LEFT JOIN lstat ON d.doc_id = lstat.doc_id
       |  LEFT JOIN pstat ON d.doc_id = pstat.doc_id
       |  LEFT JOIN gw ON d.doc_id = gw.doc_id
       |  LEFT JOIN mass ON d.doc_id = mass.doc_id
       |)
       |SELECT *, $keep AS keep FROM sig""".stripMargin
  }

  /** q_pipeline_web oracle: the canonical chain C4 → Gopher → exact-
    * Jaccard near-dup components (the q_pipeline_curate equivalence:
    * banded MinHash + exact verify ≡ exhaustive J ≥ 0.8 pairs whp) →
    * shingle decontamination (q_decontaminate's SQL over the canonical
    * survivors) → per-language ledger. Stage CTEs are the builders the
    * individual oracles use — byte-identical rule SQL, zero drift. */
  private def webOracle: String = {
    val mod = graft.operators.Pipeline.WebBenchMod
    s"""WITH RECURSIVE $webDocsCte, ${c4Ctes("c4", "webdocs")},
       |cleaned AS (
       |  SELECT doc_id, array_to_string(kept, chr(10)) AS text
       |  FROM c4r WHERE drop_reason = 'none'
       |), ${gopherCtes("g", "cleaned")},
       |gflag AS (
       |  SELECT doc_id, $GopherKeepSql AS keep FROM gr
       |), surv AS (
       |  SELECT cleaned.doc_id, cleaned.text FROM cleaned
       |  JOIN gflag USING (doc_id) WHERE gflag.keep
       |), toks AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '$Ws'), x -> x != '') AS ts
       |  FROM surv
       |), sh AS (
       |  SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
       |  FROM toks, unnest(range(1, len(ts) - 1)) AS u(i)
       |  WHERE len(ts) >= 3
       |), sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |iv AS (
       |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS ic
       |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id
       |), prs AS (
       |  SELECT da, db
       |  FROM iv JOIN sz x ON da = x.doc_id JOIN sz y ON db = y.doc_id
       |  WHERE CAST(ic AS DOUBLE) / (x.n + y.n - ic) >= 0.8
       |), edges AS (
       |  SELECT da AS u, db AS v FROM prs UNION ALL SELECT db, da FROM prs
       |), reach AS (
       |  SELECT DISTINCT u AS node, u AS r FROM edges
       |  UNION
       |  SELECT e.u AS node, t.r FROM edges e JOIN reach t ON e.v = t.node
       |), dups AS (
       |  SELECT node AS doc_id FROM reach GROUP BY node HAVING min(r) != node
       |), canon AS (
       |  SELECT surv.doc_id, surv.text FROM surv
       |  LEFT JOIN dups ON surv.doc_id = dups.doc_id
       |  WHERE dups.doc_id IS NULL
       |), dtoks AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '$Ws'),
       |                             x -> x != '') AS ts
       |  FROM canon
       |), dsh AS (
       |  SELECT DISTINCT doc_id, list_aggregate(ts[i:i+3], 'string_agg', ' ') AS s
       |  FROM dtoks, unnest(range(1, len(ts) - 2)) AS u(i)
       |  WHERE len(ts) >= 4
       |), bench AS (SELECT DISTINCT s FROM dsh WHERE doc_id % $mod = 0),
       |cont AS (
       |  SELECT DISTINCT dsh.doc_id FROM dsh JOIN bench USING (s)
       |  WHERE dsh.doc_id % $mod != 0
       |), wp AS (
       |  SELECT doc_id, CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 \\t\\n\\r\\f\\x0B]')) AS BIGINT) AS wp_tokens
       |  FROM canon
       |), states AS (
       |  SELECT d.lang,
       |    CASE WHEN c4r.drop_reason != 'none' THEN 'c4_dropped'
       |         WHEN NOT gflag.keep THEN 'gopher_dropped'
       |         WHEN dups.doc_id IS NOT NULL THEN 'dup'
       |         WHEN d.doc_id % $mod = 0 THEN 'bench'
       |         WHEN cont.doc_id IS NOT NULL THEN 'contaminated'
       |         ELSE 'kept' END AS state,
       |    wp.wp_tokens
       |  FROM webdocs d
       |  JOIN c4r ON d.doc_id = c4r.doc_id
       |  LEFT JOIN gflag ON d.doc_id = gflag.doc_id
       |  LEFT JOIN dups ON d.doc_id = dups.doc_id
       |  LEFT JOIN cont ON d.doc_id = cont.doc_id
       |  LEFT JOIN wp ON d.doc_id = wp.doc_id
       |)
       |SELECT lang,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN state = 'c4_dropped' THEN 1 ELSE 0 END) AS BIGINT) AS n_c4_dropped,
       |  CAST(sum(CASE WHEN state = 'gopher_dropped' THEN 1 ELSE 0 END) AS BIGINT) AS n_gopher_dropped,
       |  CAST(sum(CASE WHEN state = 'dup' THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       |  CAST(sum(CASE WHEN state = 'bench' THEN 1 ELSE 0 END) AS BIGINT) AS n_bench,
       |  CAST(sum(CASE WHEN state = 'contaminated' THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
       |  CAST(sum(CASE WHEN state = 'kept' THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(sum(CASE WHEN state = 'kept' THEN wp_tokens ELSE 0 END) AS BIGINT) AS kept_tokens
       |FROM states GROUP BY lang""".stripMargin
  }

  /** Flagship word-count oracle, shared by q_wordcount and
    * q_incr_wordcount (integer counts are associative, so the
    * maintained count folds to the full count exactly). */
  private def wordcountOracle: String =
    """SELECT word, count(*) AS cnt
      |FROM (SELECT unnest(string_split_regex(lower(text), '[ \t\n\r\f\x0B]+')) AS word
      |      FROM documents)
      |WHERE length(word) > 0
      |GROUP BY word
      |ORDER BY word""".stripMargin

  /** Z-order selective-read oracle (the plain filter over the original
    * layout), shared by q_zorder and q_zorder_optimize. */
  private def zorderOracle: String =
    """SELECT l_orderkey, l_linenumber, l_suppkey, l_partkey, l_quantity
      |FROM lineitem WHERE l_suppkey < 10 AND l_partkey < 200""".stripMargin

  /** Top-k-per-month oracle (window mirror), shared by q_group_topk
    * and q_incr_topk (the maintained ranked state folds to the
    * full-corpus top-k — TopKByScore's merge is associative). */
  private def groupTopkOracle: String =
    s"""SELECT month, o_orderkey, o_totalprice, rn FROM (
       |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
       |         o_orderkey, o_totalprice,
       |         CAST(row_number() OVER (
       |           PARTITION BY date_trunc('month', o_orderdate)
       |           ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
       |  FROM orders
       |) WHERE rn <= ${graft.operators.Relational.GroupTopkK}""".stripMargin

  /** Conjunctive-lookup oracle, shared by q_index_lookup and
    * q_index_append (the appended postings artifact carries exactly
    * the full-corpus posting rows). */
  private def lookupOracle: String = {
    val (t1, t2) = graft.operators.TextOps.LookupTerms
    s"""WITH t AS (
       |  SELECT doc_id,
       |         unnest(list_filter(string_split_regex(lower(text), '$Ws'), x -> x != '')) AS word
       |  FROM documents
       |), c AS (
       |  SELECT doc_id,
       |         CAST(sum(CASE WHEN word = '$t1' THEN 1 END) AS BIGINT) AS tf_a,
       |         CAST(sum(CASE WHEN word = '$t2' THEN 1 END) AS BIGINT) AS tf_b
       |  FROM t GROUP BY doc_id
       |)
       |SELECT doc_id, tf_a, tf_b FROM c
       |WHERE tf_a IS NOT NULL AND tf_b IS NOT NULL
       |ORDER BY doc_id""".stripMargin
  }

  /** Inverted-index oracle, shared by q_inverted_index and
    * q_incr_inverted (the maintained form folds to the one-shot index
    * bit-for-bit — see Incremental.incrInverted). */
  private def invertedOracle: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |         unnest(list_filter(string_split_regex(lower(text), '$Ws'), x -> x != '')) AS word
       |  FROM documents
       |), d AS (
       |  SELECT word, doc_id, CAST(count(*) AS BIGINT) AS tf FROM t GROUP BY 1, 2
       |)
       |SELECT word, CAST(count(*) AS BIGINT) AS df,
       |       CAST(sum(tf) AS BIGINT) AS total_tf,
       |       array_to_string(list_sort(list(doc_id))[1:${graft.operators.TextOps.PostingsCap}], ',') AS postings
       |FROM d GROUP BY word ORDER BY word""".stripMargin

  /** Deterministic-HLL oracle (hash → bucket → rank → register
    * max-merge → exact-integer raw estimator), shared verbatim by
    * q_approx_distinct_det and q_incr_distinct — the incremental form
    * is register-merge-associative so both land on this sketch. */
  private def hllOracle: String = {
    val m = graft.operators.Relational.HllM
    val rMax = graft.operators.Relational.HllRhoMax
    val num = graft.operators.Relational.HllEstNum
    val den = graft.operators.Relational.HllEstDen
    s"""WITH h0 AS (
       |  SELECT l_returnflag,
       |    list_reduce(list_prepend(CAST(2166136261 AS BIGINT),
       |      ${utf8BytesSql("CAST(l_orderkey AS VARCHAR)")}),
       |      (h, c) -> (xor(h, c) * 16777619) % 4294967296) AS h
       |  FROM lineitem
       |), m1 AS (
       |  SELECT l_returnflag, (xor(h >> 16, h) * 73244475) % 4294967296 AS h FROM h0
       |), m2 AS (
       |  SELECT l_returnflag, (xor(h >> 16, h) * 73244475) % 4294967296 AS h FROM m1
       |), h AS (
       |  SELECT l_returnflag, xor(h >> 16, h) AS h FROM m2
       |), hb AS (
       |  SELECT l_returnflag, h % $m AS bucket,
       |         CASE WHEN h // $m = 0 THEN $rMax
       |              ELSE bit_count(xor(h // $m, h // $m - 1)) END AS rho
       |  FROM h
       |), mj AS (
       |  SELECT l_returnflag, bucket, max(rho) AS mj FROM hb GROUP BY 1, 2
       |), grid AS (
       |  SELECT f.l_returnflag, b.bucket
       |  FROM (SELECT DISTINCT l_returnflag FROM lineitem) f,
       |       (SELECT unnest(range($m)) AS bucket) b
       |), agg AS (
       |  SELECT g.l_returnflag,
       |         CAST(sum(CASE WHEN coalesce(mj.mj, 0) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS zero_buckets,
       |         CAST(sum(CAST(1 AS BIGINT) << CAST($rMax - coalesce(mj.mj, 0) AS INTEGER)) AS BIGINT) AS s_scaled
       |  FROM grid g LEFT JOIN mj
       |    ON g.l_returnflag = mj.l_returnflag AND g.bucket = mj.bucket
       |  GROUP BY 1
       |)
       |SELECT l_returnflag, zero_buckets, s_scaled,
       |       CAST($num AS BIGINT) // (CAST($den AS BIGINT) * s_scaled) AS hll_est
       |FROM agg""".stripMargin
  }

  /** DuckDB expression: UTF-8 BYTE values of a string column as a
    * BIGINT list (via hex of the encoded blob — `ascii()` would give
    * CODEPOINTS, silently diverging from the Spark side's byte loops on
    * any non-ASCII text). */
  private def utf8BytesSql(col: String): String =
    s"""list_transform(range(1, octet_length(encode($col)) + 1),
       |      i -> CAST(strpos('0123456789abcdef', substr(lower(hex(encode($col))), CAST(2*i-1 AS INTEGER), 1)) - 1 AS BIGINT) * 16
       |         + CAST(strpos('0123456789abcdef', substr(lower(hex(encode($col))), CAST(2*i AS INTEGER), 1)) - 1 AS BIGINT))""".stripMargin

  /** Oracle for the composed curation pipeline: the jaccard-pair,
    * quality-score and token-count oracles stitched into one statement
    * (same formulas, same fold orders as their standalone queries). */
  private def curateOracle: String =
    s"""WITH RECURSIVE toks AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '$Ws'), x -> x != '') AS ts
       |  FROM documents
       |), sh AS (
       |  SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
       |  FROM toks, unnest(range(1, len(ts) - 1)) AS u(i)
       |  WHERE len(ts) >= 3
       |), sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |iv AS (
       |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS ic
       |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id
       |), prs AS (
       |  SELECT da, db
       |  FROM iv JOIN sz x ON da = x.doc_id JOIN sz y ON db = y.doc_id
       |  WHERE CAST(ic AS DOUBLE) / (x.n + y.n - ic) >= 0.8
       |), edges AS (
       |  SELECT da AS u, db AS v FROM prs UNION ALL SELECT db, da FROM prs
       |), reach AS (
       |  SELECT DISTINCT u AS node, u AS r FROM edges
       |  UNION
       |  SELECT e.u AS node, t.r FROM edges e JOIN reach t ON e.v = t.node
       |), dups AS (
       |  -- transitive: non-canonical members of each dup component
       |  SELECT node AS doc_id FROM reach GROUP BY node
       |  HAVING min(r) != node
       |), q AS (
       |  SELECT d.doc_id,
       |    least(CAST(CAST(len(t.ts) AS BIGINT) AS DOUBLE) / 50.0, 1.0) * 0.3
       |      + CASE WHEN len(t.ts) <= 0 THEN 0.0 ELSE
       |          CAST(len(list_filter(t.ts, x -> x IN ('the','a','of','and','to','is'))) AS DOUBLE)
       |            / CAST(len(t.ts) AS BIGINT) END * 0.3
       |      + CASE WHEN length(d.text) <= 0 THEN 0.0 ELSE
       |          CAST(length(regexp_replace(lower(d.text), '[^a-z]', '', 'g')) AS DOUBLE)
       |            / length(d.text) END * 0.4 AS score,
       |    CAST(len(regexp_extract_all(lower(d.text), '[a-z]+|[0-9]+|[^a-z0-9 \\t\\n\\r\\f\\x0B]')) AS BIGINT) AS wp_tokens
       |  FROM documents d JOIN toks t USING (doc_id)
       |), staged AS (
       |  SELECT d.lang,
       |    CASE WHEN dup.doc_id IS NOT NULL THEN 'dup'
       |         WHEN q.score < ${Pipeline.QualityThreshold} THEN 'lowq'
       |         ELSE 'kept' END AS state,
       |    q.wp_tokens
       |  FROM documents d
       |  LEFT JOIN dups dup ON d.doc_id = dup.doc_id
       |  JOIN q ON d.doc_id = q.doc_id
       |)
       |SELECT lang,
       |  CAST(sum(CASE WHEN state = 'kept' THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(sum(CASE WHEN state = 'dup' THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       |  CAST(sum(CASE WHEN state = 'lowq' THEN 1 ELSE 0 END) AS BIGINT) AS n_lowq,
       |  CAST(sum(CASE WHEN state = 'kept' THEN wp_tokens ELSE 0 END) AS BIGINT) AS kept_tokens
       |FROM staged GROUP BY lang""".stripMargin

  /** Oracle for q_pagerank: the fixed-iteration loop unrolled as
    * chained CTEs (same node encoding, same integer floor-div/damping
    * arithmetic as `Graphs.pageRank` — see there for the bit-parity
    * argument). */
  private def pageRankOracle(iters: Int): String = {
    val head =
      """WITH e AS (
        |  SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst FROM lineitem
        |  UNION
        |  SELECT DISTINCT l_suppkey * 2 + 1, l_partkey * 2 FROM lineitem
        |), deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
        |r0 AS (SELECT src AS node, CAST(1000000000000 AS BIGINT) AS r FROM deg)""".stripMargin
    val its = (1 to iters).map { i =>
      s"""r$i AS (
         |  SELECT e.dst AS node,
         |         CAST(150000000000 + (85 * sum(r // d)) // 100 AS BIGINT) AS r
         |  FROM e JOIN deg USING (src) JOIN r${i - 1} ON e.src = r${i - 1}.node
         |  GROUP BY e.dst
         |)""".stripMargin
    }
    head + ",\n" + its.mkString(",\n") + s"\nSELECT node, r FROM r$iters"
  }

  /** Oracle for q_bfs: the fixed-round level-synchronous BFS unrolled
    * as chained CTEs (frontier fᵢ = distinct neighbors of fᵢ₋₁ minus
    * visited vᵢ₋₁; vᵢ = vᵢ₋₁ ∪ fᵢ at dist i) — same node encoding and
    * seed definition as `Graphs.bfsDistances`. Hop labels are integers,
    * so the result is bit-exact with no ordering contract. */
  private def bfsOracle(maxHops: Int): String = {
    val head =
      """WITH e AS (
        |  SELECT DISTINCT CAST(l_partkey * 2 AS BIGINT) AS src,
        |         CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst FROM lineitem
        |  UNION
        |  SELECT DISTINCT CAST(l_suppkey * 2 + 1 AS BIGINT),
        |         CAST(l_partkey * 2 AS BIGINT) FROM lineitem
        |), f0 AS (
        |  SELECT DISTINCT CAST(s_suppkey * 2 + 1 AS BIGINT) AS node
        |  FROM supplier
        |  WHERE s_nationkey = (SELECT min(s_nationkey) FROM supplier)
        |), v0 AS (SELECT node, CAST(0 AS BIGINT) AS dist FROM f0)""".stripMargin
    val its = (1 to maxHops).map { i =>
      s"""f$i AS (
         |  SELECT n.node FROM (
         |    SELECT DISTINCT e.dst AS node
         |    FROM e JOIN f${i - 1} ON e.src = f${i - 1}.node) n
         |  WHERE n.node NOT IN (SELECT node FROM v${i - 1})
         |), v$i AS (
         |  SELECT * FROM v${i - 1}
         |  UNION ALL SELECT node, CAST($i AS BIGINT) FROM f$i
         |)""".stripMargin
    }
    head + ",\n" + its.mkString(",\n") + s"\nSELECT node, dist FROM v$maxHops"
  }

  /** Oracle for q_hits: `Graphs.hits`' mutual-reinforcement loop
    * unrolled as chained CTEs — same directed supplier→part edges,
    * same BIGINT max-norm `(s · Scale) // max(s)` per half-round, so
    * scores are bit-exact. Per-round CTEs are referenced twice (the
    * scalar max subquery + the normalize scan) → AS MATERIALIZED, or
    * DuckDB's CTE inlining doubles the evaluated chain per round. */
  private def hitsOracle(rounds: Int): String = {
    val sc = operators.Graphs.HitsScale
    val head =
      s"""WITH e AS MATERIALIZED (
         |  SELECT DISTINCT l_suppkey AS src, l_partkey AS dst FROM lineitem
         |), h0 AS (
         |  SELECT DISTINCT src AS node, CAST($sc AS BIGINT) AS s FROM e
         |)""".stripMargin
    val its = (1 to rounds).map { i =>
      s"""a${i}r AS MATERIALIZED (
         |  SELECT e.dst AS node, sum(h${i - 1}.s) AS raw
         |  FROM e JOIN h${i - 1} ON e.src = h${i - 1}.node GROUP BY e.dst
         |), a$i AS MATERIALIZED (
         |  SELECT node, CAST((raw * $sc) // (SELECT max(raw) FROM a${i}r) AS BIGINT) AS s
         |  FROM a${i}r
         |), h${i}r AS MATERIALIZED (
         |  SELECT e.src AS node, sum(a$i.s) AS raw
         |  FROM e JOIN a$i ON e.dst = a$i.node GROUP BY e.src
         |), h$i AS MATERIALIZED (
         |  SELECT node, CAST((raw * $sc) // (SELECT max(raw) FROM h${i}r) AS BIGINT) AS s
         |  FROM h${i}r
         |)""".stripMargin
    }
    head + ",\n" + its.mkString(",\n") +
      "\nSELECT 'hub' AS kind, node, s AS score FROM h" + rounds +
      "\nUNION ALL\nSELECT 'authority' AS kind, node, s AS score FROM a" + rounds
  }

  /** Oracle for q_ppr: `Graphs.personalizedPageRank`'s loop unrolled —
    * the pageRankOracle pattern with seed-only teleport and LEFT joins
    * from the full node set (zero-in-mass non-seeds keep a 0 row).
    * `sum(r // d)` is HUGEINT in DuckDB and propagates — the final
    * select CASTs back to BIGINT (the repo-wide rule). */
  private def pprOracle(iters: Int): String = {
    val tp = operators.Graphs.Scale * 15L / 100L
    val head =
      s"""WITH e AS MATERIALIZED (
        |  SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst FROM lineitem
        |  UNION
        |  SELECT DISTINCT l_suppkey * 2 + 1, l_partkey * 2 FROM lineitem
        |), deg AS MATERIALIZED (SELECT src, count(*) AS d FROM e GROUP BY src),
        |nodes AS MATERIALIZED (SELECT src AS node FROM deg),
        |seeds AS MATERIALIZED (
        |  SELECT DISTINCT CAST(s_suppkey * 2 + 1 AS BIGINT) AS node,
        |         CAST($tp AS BIGINT) AS tp
        |  FROM supplier
        |  WHERE s_nationkey = (SELECT min(s_nationkey) FROM supplier)
        |), r0 AS MATERIALIZED (
        |  SELECT n.node,
        |         CAST(CASE WHEN s.node IS NULL THEN 0
        |              ELSE ${operators.Graphs.Scale} END AS BIGINT) AS r
        |  FROM nodes n LEFT JOIN seeds s ON n.node = s.node
        |)""".stripMargin
    val its = (1 to iters).map { i =>
      s"""r$i AS MATERIALIZED (
         |  SELECT n.node,
         |         CAST(COALESCE(s.tp, 0) + (85 * COALESCE(m.s, 0)) // 100 AS BIGINT) AS r
         |  FROM nodes n
         |  LEFT JOIN (
         |    SELECT e.dst AS node, sum(r // d) AS s
         |    FROM e JOIN deg USING (src) JOIN r${i - 1} ON e.src = r${i - 1}.node
         |    GROUP BY e.dst
         |  ) m ON n.node = m.node
         |  LEFT JOIN seeds s ON n.node = s.node
         |)""".stripMargin
    }
    head + ",\n" + its.mkString(",\n") + s"\nSELECT node, r FROM r$iters"
  }

  /** Oracle for q_sssp: `Graphs.ssspDistances`' frontier Bellman-Ford
    * replayed as FULL relaxation rounds — legal because delta-BF after
    * k rounds ≡ dist_k(v) = min over ≤ k-edge paths (see the operator
    * Scaladoc). Same edge weights (min l_quantity per directed pair,
    * BIGINT), same seeds; every distance is exact integer. Each round
    * CTE is referenced twice (carry + relax), so MATERIALIZED —
    * without it DuckDB's inlining doubles the chain per round. */
  private def ssspOracle(rounds: Int): String = {
    val head =
      """WITH e AS MATERIALIZED (
        |  SELECT CAST(l_partkey * 2 AS BIGINT) AS src,
        |         CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst,
        |         min(CAST(l_quantity AS BIGINT)) AS w
        |  FROM lineitem GROUP BY 1, 2
        |  UNION ALL
        |  SELECT CAST(l_suppkey * 2 + 1 AS BIGINT),
        |         CAST(l_partkey * 2 AS BIGINT),
        |         min(CAST(l_quantity AS BIGINT))
        |  FROM lineitem GROUP BY 1, 2
        |), d0 AS MATERIALIZED (
        |  SELECT DISTINCT CAST(s_suppkey * 2 + 1 AS BIGINT) AS node,
        |         CAST(0 AS BIGINT) AS d
        |  FROM supplier
        |  WHERE s_nationkey = (SELECT min(s_nationkey) FROM supplier)
        |)""".stripMargin
    val its = (1 to rounds).map { i =>
      s"""d$i AS MATERIALIZED (
         |  SELECT node, min(d) AS d FROM (
         |    SELECT node, d FROM d${i - 1}
         |    UNION ALL
         |    SELECT e.dst AS node, d${i - 1}.d + e.w AS d
         |    FROM e JOIN d${i - 1} ON e.src = d${i - 1}.node
         |  ) GROUP BY node
         |)""".stripMargin
    }
    head + ",\n" + its.mkString(",\n") +
      s"\nSELECT node, CAST(d AS BIGINT) AS d FROM d$rounds"
  }

  /** Oracle for q_label_prop: `Graphs.labelProp`'s synchronous rounds
    * unrolled — per round a neighbor-label count CTE then the
    * (count desc, label asc) argmax via row_number, the same total
    * order as the Spark min-struct. Labels are node ids (BIGINT) —
    * exact at every round. */
  private def labelPropOracle(rounds: Int): String = {
    val head =
      """WITH lp AS MATERIALIZED (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem
        |), und AS MATERIALIZED (
        |  SELECT DISTINCT a.p AS u, b.p AS v
        |  FROM lp a JOIN lp b ON a.ok = b.ok AND a.p < b.p
        |), adj AS MATERIALIZED (
        |  SELECT u AS src, v AS dst FROM und
        |  UNION ALL SELECT v, u FROM und
        |), l0 AS MATERIALIZED (
        |  SELECT DISTINCT src AS node, CAST(src AS BIGINT) AS lbl FROM adj
        |)""".stripMargin
    val its = (1 to rounds).map { i =>
      s"""c$i AS MATERIALIZED (
         |  SELECT a.dst AS node, l.lbl, count(*) AS c
         |  FROM adj a JOIN l${i - 1} l ON a.src = l.node
         |  GROUP BY a.dst, l.lbl
         |), l$i AS MATERIALIZED (
         |  SELECT node, lbl FROM (
         |    SELECT node, lbl,
         |      row_number() OVER (PARTITION BY node ORDER BY c DESC, lbl) AS rn
         |    FROM c$i) WHERE rn = 1
         |)""".stripMargin
    }
    head + ",\n" + its.mkString(",\n") +
      s"\nSELECT node, lbl FROM l$rounds"
  }

  /** Oracle for q_kcore: `Graphs.kcore`'s peel rounds unrolled — per
    * round a degree CTE gates survivors at the data-derived threshold
    * k = (3·((2m) div n)) div 4 (all operands non-negative, so DuckDB
    * `//` ≡ Spark integer division), then both edge endpoints are
    * filtered; final degrees from the round-R edge set. */
  private def kcoreOracle(rounds: Int): String = {
    val head =
      """WITH lp AS MATERIALIZED (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem
        |), und AS MATERIALIZED (
        |  SELECT DISTINCT a.p AS u, b.p AS v
        |  FROM lp a JOIN lp b ON a.ok = b.ok AND a.p < b.p
        |), e0 AS MATERIALIZED (
        |  SELECT u AS src, v AS dst FROM und
        |  UNION ALL SELECT v, u FROM und
        |), kv AS MATERIALIZED (
        |  SELECT (3 * ((2 * (SELECT count(*) FROM und))
        |               // (SELECT count(DISTINCT src) FROM e0))) // 4 AS k
        |)""".stripMargin
    val its = (1 to rounds).map { i =>
      s"""k$i AS MATERIALIZED (
         |  SELECT src FROM (
         |    SELECT src, count(*) AS d FROM e${i - 1} GROUP BY src), kv
         |  WHERE d >= kv.k
         |), e$i AS MATERIALIZED (
         |  SELECT e.src, e.dst FROM e${i - 1} e
         |  JOIN k$i a ON e.src = a.src
         |  JOIN k$i b ON e.dst = b.src
         |)""".stripMargin
    }
    head + ",\n" + its.mkString(",\n") +
      s"\nSELECT src AS node, CAST(count(*) AS BIGINT) AS deg FROM e$rounds GROUP BY src"
  }

  /** Oracle for q_kmeans: `Clustering.fitFixed`'s micro-unit integer
    * Lloyd loop unrolled as chained CTEs (the q_pagerank pattern).
    * Bit parity holds with NO ordering contract: quantization is one
    * identical double multiply + round per component, and every
    * subsequent distance/sum/mean is exact BIGINT arithmetic — the
    * half-away-from-zero mean uses the same integer CASE formula as
    * `Clustering.roundDiv`. The final inertia is one BIGINT→DOUBLE
    * division per cluster, correctly rounded in both engines. */
  private def kmeansOracle(iters: Int, k: Int): String = {
    val head =
      s"""WITH x AS (
         |  SELECT vec_id, CAST(u.i AS INT) AS dim,
         |         CAST(round(CAST(embedding[u.i] AS DOUBLE) * 1000000) AS BIGINT) AS xi
         |  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)
         |), c0 AS (
         |  SELECT dense_rank() OVER (ORDER BY s.vec_id) - 1 AS cid, x.dim, x.xi AS c
         |  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT $k) s
         |  JOIN x ON x.vec_id = s.vec_id
         |)""".stripMargin
    def assignCte(i: Int, from: String): String =
      s"""a$i AS (
         |  SELECT x.vec_id, c.cid, CAST(sum((x.xi - c.c) * (x.xi - c.c)) AS BIGINT) AS d2
         |  FROM x JOIN $from c ON x.dim = c.dim
         |  GROUP BY x.vec_id, c.cid
         |), b$i AS (
         |  SELECT vec_id, cid, d2 FROM (
         |    SELECT vec_id, cid, d2,
         |           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
         |    FROM a$i) WHERE rn = 1
         |)""".stripMargin
    val its = (1 to iters).map { i =>
      assignCte(i, s"c${i - 1}") + s""",
         |m$i AS (
         |  SELECT b.cid, x.dim,
         |    CASE WHEN sum(x.xi) >= 0
         |         THEN (2 * CAST(sum(x.xi) AS BIGINT) + count(*)) // (2 * count(*))
         |         ELSE -((2 * -CAST(sum(x.xi) AS BIGINT) + count(*)) // (2 * count(*)))
         |    END AS c
         |  FROM b$i b JOIN x ON x.vec_id = b.vec_id
         |  GROUP BY b.cid, x.dim
         |), c$i AS (
         |  SELECT p.cid, p.dim, coalesce(m.c, p.c) AS c
         |  FROM c${i - 1} p LEFT JOIN m$i m ON m.cid = p.cid AND m.dim = p.dim
         |)""".stripMargin
    }
    val fin = iters + 1
    head + ",\n" + its.mkString(",\n") + ",\n" + assignCte(fin, s"c$iters") +
      s"""
         |SELECT CAST(cid AS BIGINT) AS cid, count(*) AS n,
         |       CAST(sum(d2) AS DOUBLE) / 1000000000000.0 AS inertia
         |FROM b$fin GROUP BY cid""".stripMargin
  }

  /** Oracle for q_dedup_semantic (`Dedup.semanticDedupFixed`): the
    * fixed-point SemDeDup pipeline replayed end-to-end in DuckDB.
    * Three exact-integer stages, so bit parity needs NO float or
    * fold-order contract anywhere:
    *  1. the `fitFixed` Lloyd loop (K = ivfK(n) from a data-derived
    *     kpar CTE) unrolled as chained CTEs — same chain as
    *     [[kmeansOracle]];
    *  2. cells: cluster size counts → nsub = ⌈csz/4096⌉, cell =
    *     Lehmer-mixed id mod nsub (integer, engine-agnostic;
    *     see Dedup.CellMixP/CellMixA);
    *  3. the per-cell greedy leader scan as a RECURSIVE CTE stepping
    *     one member rank per iteration, the kept-so-far set carried in
    *     list columns (ids, micro-unit vectors, |a|²); the drop test
    *     cos ≥ 2/5 is `s > 0 ∧ 25·s² ≥ 4·|a|²·|b|²` in HUGEINT.
    * `mem` is MATERIALIZED: inlined, the recursive part would re-run
    * the whole Lloyd chain once per recursion step. */
  private def semanticOracle(iters: Int): String = {
    def assignCte(i: Int, from: String): String =
      s"""a$i AS (
         |  SELECT x.vec_id, c.cid, CAST(sum((x.xi - c.c) * (x.xi - c.c)) AS BIGINT) AS d2
         |  FROM x JOIN $from c ON x.dim = c.dim
         |  GROUP BY x.vec_id, c.cid
         |), b$i AS (
         |  SELECT vec_id, cid, d2 FROM (
         |    SELECT vec_id, cid, d2,
         |           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
         |    FROM a$i) WHERE rn = 1
         |)""".stripMargin
    val head =
      s"""WITH RECURSIVE q AS (
         |  SELECT vec_id,
         |         list_transform(embedding,
         |           v -> CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) AS qe
         |  FROM embeddings
         |), x AS (
         |  SELECT vec_id, CAST(u.i AS INT) AS dim, qe[u.i] AS xi
         |  FROM q, unnest(range(1, len(qe) + 1)) AS u(i)
         |), kpar AS (
         |  SELECT GREATEST(4, LEAST(4096, CAST(round(sqrt(count(*))) AS BIGINT))) AS k
         |  FROM embeddings
         |), c0 AS (
         |  SELECT dense_rank() OVER (ORDER BY s.vec_id) - 1 AS cid, x.dim, x.xi AS c
         |  FROM (SELECT vec_id FROM
         |          (SELECT vec_id, row_number() OVER (ORDER BY vec_id) AS rn
         |           FROM embeddings), kpar
         |        WHERE rn <= k) s
         |  JOIN x ON x.vec_id = s.vec_id
         |)""".stripMargin
    val its = (1 to iters).map { i =>
      assignCte(i, s"c${i - 1}") + s""",
         |m$i AS (
         |  SELECT b.cid, x.dim,
         |    CASE WHEN sum(x.xi) >= 0
         |         THEN (2 * CAST(sum(x.xi) AS BIGINT) + count(*)) // (2 * count(*))
         |         ELSE -((2 * -CAST(sum(x.xi) AS BIGINT) + count(*)) // (2 * count(*)))
         |    END AS c
         |  FROM b$i b JOIN x ON x.vec_id = b.vec_id
         |  GROUP BY b.cid, x.dim
         |), c$i AS (
         |  SELECT p.cid, p.dim, coalesce(m.c, p.c) AS c
         |  FROM c${i - 1} p LEFT JOIN m$i m ON m.cid = p.cid AND m.dim = p.dim
         |)""".stripMargin
    }
    val fin = iters + 1
    head + ",\n" + its.mkString(",\n") + ",\n" + assignCte(fin, s"c$iters") +
      s""",
         |asg AS (SELECT vec_id, cid FROM b$fin),
         |cnt AS (SELECT cid, count(*) AS csz FROM asg GROUP BY cid),
         |mem AS MATERIALIZED (
         |  SELECT m.vec_id, m.cid,
         |         CAST((m.vec_id % 2147483647 + 2147483647) % 2147483647 * 48271 % 2147483647 * 48271 % 2147483647 % GREATEST(1, CAST(ceil(CAST(c.csz AS DOUBLE) / 4096.0) AS BIGINT)) AS INT) AS cell,
         |         q.qe,
         |         list_sum(list_transform(q.qe, e -> e * e)) AS na2,
         |         row_number() OVER (
         |           PARTITION BY m.cid,
         |             CAST((m.vec_id % 2147483647 + 2147483647) % 2147483647 * 48271 % 2147483647 * 48271 % 2147483647 % GREATEST(1, CAST(ceil(CAST(c.csz AS DOUBLE) / 4096.0) AS BIGINT)) AS INT)
         |           ORDER BY m.vec_id) AS rnk
         |  FROM asg m JOIN cnt c USING (cid) JOIN q USING (vec_id)
         |),
         |g AS (
         |  SELECT 1 AS it, m.cid, m.cell, m.vec_id AS dv, TRUE AS dkeep,
         |         CAST(NULL AS BIGINT) AS dby,
         |         [m.vec_id] AS kept_ids, [m.qe] AS kept_qes, [m.na2] AS kept_n2s
         |  FROM mem m WHERE m.rnk = 1
         |  UNION ALL
         |  SELECT g.it + 1, g.cid, g.cell, m.vec_id,
         |         d.kb IS NULL, d.kb,
         |         CASE WHEN d.kb IS NULL THEN list_append(g.kept_ids, m.vec_id) ELSE g.kept_ids END,
         |         CASE WHEN d.kb IS NULL THEN list_append(g.kept_qes, m.qe) ELSE g.kept_qes END,
         |         CASE WHEN d.kb IS NULL THEN list_append(g.kept_n2s, m.na2) ELSE g.kept_n2s END
         |  FROM g
         |  JOIN mem m ON m.cid = g.cid AND m.cell = g.cell AND m.rnk = g.it + 1
         |  LEFT JOIN LATERAL (
         |    SELECT min(kv) AS kb FROM (
         |      SELECT g.kept_ids[u.j] AS kv,
         |             list_sum(list_transform(range(1, len(m.qe) + 1),
         |               d -> g.kept_qes[u.j][d] * m.qe[d])) AS s,
         |             g.kept_n2s[u.j] AS kn2
         |      FROM unnest(range(1, len(g.kept_ids) + 1)) AS u(j)
         |    ) WHERE s > 0 AND 25 * s * s >= 4 * kn2 * m.na2
         |  ) d ON TRUE
         |)
         |SELECT g.dv AS vec_id, CAST(g.cid AS BIGINT) AS cid, g.dkeep AS keep,
         |       g.dby AS kept_by, CAST(g.cell AS BIGINT) AS cell
         |FROM g""".stripMargin
  }

  /** Oracles for q_bpe / q_bpe_encode (`TextOps.bpeLearn` / `.bpeEncode`):
    * the BPE merge-learning loop replayed in DuckDB. Rounds unroll as
    * chained CTEs (the kmeansOracle pattern — no aggregates inside a
    * recursive term); the greedy left-to-right NON-OVERLAPPING merge
    * application is one `replace()` per round over a separator-encoded
    * symbol string: a word's symbols are joined as
    * `SEP sym SEP SEP sym … SEP` (SEP = chr(1), absent from the corpus),
    * so the merge (l, r) is the literal rewrite
    * `SEP+l+SEP+SEP+r+SEP → SEP+lr+SEP` — `replace` scans left to right
    * and resumes AFTER each match, which is exactly BPE's greedy
    * non-overlap ("a a a" → "aa a"), and the doubled inner separator
    * keeps adjacent matches from sharing a boundary character. The
    * argmax total order (count desc, l, r) is binary-collation string
    * comparison on both engines. Every CTE is MATERIALIZED: inlined,
    * round i would re-expand round i−1 ~5× (scalar subqueries) for an
    * exponential blowup. Encode continues from the final vocab: ids =
    * row_number over the sorted distinct final symbols − 1, per-doc id
    * sequences flattened in word order. */
  private def bpeLearnCtes(nMerges: Int): String = {
    val head =
      s"""WITH v0 AS MATERIALIZED (
         |  SELECT word, chr(1) || array_to_string(
         |           list_append(list_transform(range(1, length(word) + 1), i -> word[i]), '</w>'),
         |           chr(1) || chr(1)) || chr(1) AS enc,
         |         count(*) AS cnt
         |  FROM (SELECT unnest(string_split_regex(lower(text), '$Ws')) AS word
         |        FROM documents)
         |  WHERE length(word) > 0
         |  GROUP BY word
         |)""".stripMargin
    val rounds = (1 to nMerges).map { i =>
      s"""p$i AS MATERIALIZED (
         |  SELECT s.syms[j] AS l, s.syms[j + 1] AS r, CAST(sum(s.cnt) AS BIGINT) AS c
         |  FROM (SELECT string_split(trim(v${i - 1}.enc, chr(1)), chr(1) || chr(1)) AS syms, cnt
         |        FROM v${i - 1}) s,
         |       unnest(range(1, len(s.syms))) AS u(j)
         |  GROUP BY 1, 2
         |), m$i AS MATERIALIZED (
         |  SELECT l, r, c FROM p$i ORDER BY c DESC, l, r LIMIT 1
         |), v$i AS MATERIALIZED (
         |  SELECT word, CASE WHEN (SELECT count(*) FROM m$i) = 0 THEN enc
         |         ELSE replace(enc,
         |                chr(1) || (SELECT l FROM m$i) || chr(1) || chr(1) || (SELECT r FROM m$i) || chr(1),
         |                chr(1) || (SELECT l FROM m$i) || (SELECT r FROM m$i) || chr(1))
         |         END AS enc, cnt
         |  FROM v${i - 1}
         |)""".stripMargin
    }
    head + ",\n" + rounds.mkString(",\n")
  }

  private def bpeOracle(nMerges: Int): String =
    bpeLearnCtes(nMerges) + "\nSELECT * FROM (" +
      (1 to nMerges).map(i =>
        s"""SELECT CAST($i AS BIGINT) AS rank, l AS "left", r AS "right", c AS pair_count FROM m$i""")
        .mkString("\nUNION ALL ") + ")"

  private def bpeEncodeOracle(nMerges: Int): String =
    bpeLearnCtes(nMerges) +
      s""",
         |ws AS MATERIALIZED (
         |  SELECT word, string_split(trim(enc, chr(1)), chr(1) || chr(1)) AS syms FROM v$nMerges
         |),
         |vocab AS MATERIALIZED (
         |  SELECT s AS sym, CAST(row_number() OVER (ORDER BY s) - 1 AS INT) AS id
         |  FROM (SELECT DISTINCT unnest(syms) AS s FROM ws)
         |),
         |wid AS MATERIALIZED (
         |  SELECT w.word, list(v.id ORDER BY w.j) AS ids
         |  FROM (SELECT word, syms[u.j] AS sym, u.j AS j
         |        FROM ws, unnest(range(1, len(syms) + 1)) AS u(j)) w
         |  JOIN vocab v ON v.sym = w.sym
         |  GROUP BY w.word
         |),
         |dw AS (
         |  SELECT t.doc_id, u.j AS pos, t.toks[u.j] AS word
         |  FROM (SELECT doc_id,
         |               list_filter(string_split_regex(lower(text), '$Ws'),
         |                           x -> x != '') AS toks
         |        FROM documents) t,
         |       unnest(range(1, len(t.toks) + 1)) AS u(j)
         |),
         |encd AS (
         |  SELECT dw.doc_id, count(*) AS n_words,
         |         CAST(sum(len(wid.ids)) AS BIGINT) AS n_tokens,
         |         string_agg(array_to_string(wid.ids, ' '), ' ' ORDER BY dw.pos) AS token_ids
         |  FROM dw JOIN wid USING (word)
         |  GROUP BY dw.doc_id
         |)
         |SELECT d.doc_id, coalesce(e.n_words, 0) AS n_words,
         |       coalesce(e.n_tokens, 0) AS n_tokens,
         |       coalesce(e.token_ids, '') AS token_ids
         |FROM documents d LEFT JOIN encd e USING (doc_id)""".stripMargin


  /** Oracle for q_bm25 AND q_bm25_append (`TextOps.bm25` /
    * `bm25Appended`): same tokenization, df/dl/N/T from the corpus,
    * the single integer division per (doc, term) — `//` ≡ Spark's div
    * on the non-negative operands. The appended artifacts hold exactly
    * the one-shot row sets (per-doc pure posting/dl rows over disjoint
    * doc slices), so both forms share this one truth. */
  /** Oracle for q_hybrid_rrf: the BM25 chain (same arithmetic as
    * [[oracleSqlBm25]], ranked to SearchK instead of limited), the
    * single-query cosine chain (same kernel as the knn CTEs), and the
    * pinned integer RRF fusion 10⁶ div (60 + rank) with the 0 sentinel
    * for absent-from-list. */
  private def oracleSqlHybridRrf: String = {
    val (t1, t2) = graft.operators.TextOps.LookupTerms
    val kList = graft.operators.TextOps.SearchK
    val scl = graft.operators.TextOps.Bm25Scale
    val c = graft.operators.TextOps.RrfC
    val kOut = graft.operators.TextOps.HybridK
    val qv = graft.operators.TextOps.HybridQueryVec
    s"""WITH t AS (
       |  SELECT doc_id,
       |         unnest(list_filter(string_split_regex(lower(text), '$Ws'), x -> x != '')) AS word
       |  FROM documents
       |), dl AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM t GROUP BY doc_id
       |), par AS (
       |  SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n,
       |         (SELECT CAST(count(*) AS BIGINT) FROM t) AS tt
       |), d AS (
       |  SELECT word, doc_id, CAST(count(*) AS BIGINT) AS tf FROM t
       |  WHERE word IN ('$t1', '$t2') GROUP BY 1, 2
       |), sc AS (
       |  SELECT d.doc_id,
       |    CAST(($scl * (2 * n - 2 * (count(*) OVER (PARTITION BY word)) + 1) * 22 * tf * tt) //
       |      ((2 * (count(*) OVER (PARTITION BY word)) + 1) * (10 * tt * tf + 3 * tt + 9 * dl.dl * n)) AS BIGINT) AS s
       |  FROM d JOIN dl ON d.doc_id = dl.doc_id, par
       |), bs AS (
       |  SELECT doc_id, CAST(sum(s) AS BIGINT) AS score FROM sc GROUP BY doc_id
       |), brank AS (
       |  SELECT doc_id,
       |         CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS bm25_rank
       |  FROM bs QUALIFY bm25_rank <= $kList
       |), v AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
       |  FROM embeddings
       |), nv AS (
       |  SELECT vec_id, e,
       |    sqrt(list_reduce(list_prepend(0.0, list_transform(e, x -> x * x)),
       |         (a, p) -> a + p)) AS nrm
       |  FROM v
       |), cs AS (
       |  SELECT c.vec_id AS doc_id,
       |    list_reduce(list_prepend(0.0,
       |      list_transform(range(1, len(q.e) + 1), i -> q.e[i] * c.e[i])),
       |      (acc, p) -> acc + p) / (q.nrm * c.nrm) AS cos
       |  FROM nv q JOIN nv c ON q.vec_id = $qv AND c.vec_id != $qv
       |), crank AS (
       |  SELECT doc_id,
       |         CAST(row_number() OVER (ORDER BY cos DESC, doc_id) AS BIGINT) AS cos_rank
       |  FROM cs QUALIFY cos_rank <= $kList
       |), fused AS (
       |  SELECT coalesce(b.doc_id, c.doc_id) AS doc_id,
       |    coalesce(b.bm25_rank, 0) AS bm25_rank,
       |    coalesce(c.cos_rank, 0) AS cos_rank
       |  FROM brank b FULL OUTER JOIN crank c ON b.doc_id = c.doc_id
       |)
       |SELECT doc_id, bm25_rank, cos_rank,
       |  (CASE WHEN bm25_rank = 0 THEN 0 ELSE 1000000 // ($c + bm25_rank) END +
       |   CASE WHEN cos_rank = 0 THEN 0 ELSE 1000000 // ($c + cos_rank) END)
       |    AS rrf_micro
       |FROM fused
       |ORDER BY rrf_micro DESC, doc_id LIMIT $kOut""".stripMargin
  }

  private def oracleSqlBm25: String = {
      val (t1, t2) = graft.operators.TextOps.LookupTerms
      val k = graft.operators.TextOps.SearchK
      val sc = graft.operators.TextOps.Bm25Scale
      s"""WITH t AS (
         |  SELECT doc_id,
         |         unnest(list_filter(string_split_regex(lower(text), '$Ws'), x -> x != '')) AS word
         |  FROM documents
         |), dl AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM t GROUP BY doc_id
         |), par AS (
         |  SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n,
         |         (SELECT CAST(count(*) AS BIGINT) FROM t) AS tt
         |), d AS (
         |  SELECT word, doc_id, CAST(count(*) AS BIGINT) AS tf FROM t
         |  WHERE word IN ('$t1', '$t2') GROUP BY 1, 2
         |), sc AS (
         |  SELECT d.doc_id,
         |    CAST(($sc * (2 * n - 2 * (count(*) OVER (PARTITION BY word)) + 1) * 22 * tf * tt) //
         |      ((2 * (count(*) OVER (PARTITION BY word)) + 1) * (10 * tt * tf + 3 * tt + 9 * dl.dl * n)) AS BIGINT) AS s
         |  FROM d JOIN dl ON d.doc_id = dl.doc_id, par
         |)
         |SELECT doc_id, CAST(sum(s) AS BIGINT) AS score, CAST(count(*) AS BIGINT) AS terms_hit
         |FROM sc GROUP BY doc_id
         |ORDER BY score DESC, doc_id LIMIT $k""".stripMargin
    }

  /** Oracle for q_pca_power (`Clustering.pcaPowerFixed`): the power
    * iteration unrolled — per round, s_i = roundDiv(⟨x_i, v⟩, F)
    * (sign-safe CASE, `//` ≡ div on the non-negative operands), the
    * transpose sum w_d = Σ x_id·s_i, and the max-norm rescale
    * v'_d = roundDiv(w_d, max(1, roundDiv(max|w|, F))). All BIGINT. */
  private val PcaF = 1000000L
  private def pcaRdiv(e: String, n: String): String =
    s"CASE WHEN $e >= 0 THEN (2 * ($e) + $n) // (2 * ($n)) " +
      s"ELSE -((2 * -($e) + $n) // (2 * ($n))) END"

  /** ONE power-iteration chain as CTE text — the single source for
    * pcaOracle AND pcaDeflateOracle (the deflate oracle runs it twice,
    * prefix "" on x then prefix "b" on the deflated x2, so the round
    * arithmetic cannot drift between the first and second component).
    * Emits v${pfx}0 (all-ones init over `src`'s dims) and `iters`
    * rounds ending at v$pfx$iters; starts with a comma (appends after
    * the x CTE). */
  private def pcaChainSql(src: String, pfx: String, iters: Int): String = {
    val f = PcaF
    val rounds = (1 to iters).map { t =>
      // MATERIALIZED per round: w$t is referenced twice (md + rescale)
      // and DuckDB's CTE inlining would otherwise double the evaluated
      // chain every round — 2^iters blowup (measured: 8 rounds never
      // finish un-materialized, milliseconds materialized)
      s"""s$pfx$t AS MATERIALIZED (
         |  SELECT x.vec_id, ${pcaRdiv(s"sum(x.xi * v.c)", f.toString)} AS s
         |  FROM $src x JOIN v$pfx${t - 1} v ON x.dim = v.dim GROUP BY x.vec_id
         |), w$pfx$t AS MATERIALIZED (
         |  SELECT x.dim, sum(x.xi * s.s) AS w
         |  FROM $src x JOIN s$pfx$t s ON x.vec_id = s.vec_id GROUP BY x.dim
         |), md$pfx$t AS (
         |  SELECT GREATEST(CAST(1 AS BIGINT),
         |    (2 * max(abs(w)) + $f) // ${2 * f}) AS md FROM w$pfx$t
         |), v$pfx$t AS MATERIALIZED (
         |  SELECT w.dim, ${pcaRdiv("w.w", "md.md")} AS c FROM w$pfx$t w, md$pfx$t md
         |)""".stripMargin
    }.mkString(",\n")
    s""", v${pfx}0 AS (
       |  SELECT dim, CAST($f AS BIGINT) AS c FROM (SELECT DISTINCT dim FROM $src)
       |),
       |$rounds""".stripMargin
  }

  /** Shared q/x head (micro-unit long dims) for the PCA oracles. */
  private def pcaHeadSql: String =
    s"""WITH q AS (
       |  SELECT vec_id,
       |         list_transform(embedding,
       |           v -> CAST(round(CAST(v AS DOUBLE) * $PcaF) AS BIGINT)) AS qe
       |  FROM embeddings
       |), x AS MATERIALIZED (
       |  SELECT vec_id, CAST(u.i AS INT) AS dim, qe[u.i] AS xi
       |  FROM q, unnest(range(1, len(qe) + 1)) AS u(i)
       |)""".stripMargin

  private def pcaOracle(iters: Int, project: Boolean = false): String = {
    val f = PcaF
    pcaHeadSql + pcaChainSql("x", "", iters) + "\n" + {
      // CAST: DuckDB sum(BIGINT) is HUGEINT and it propagates through
      // the CASE arithmetic — pandas would surface float64 columns
      if (project)
        s"""SELECT x.vec_id, CAST(${pcaRdiv(s"sum(x.xi * v.c)", f.toString)} AS BIGINT) AS proj
           |FROM x JOIN v$iters v ON x.dim = v.dim GROUP BY x.vec_id""".stripMargin
      else
        s"SELECT CAST(dim - 1 AS BIGINT) AS dim, CAST(c AS BIGINT) AS c FROM v$iters ORDER BY dim"
    }
  }

  /** Deflation CTEs: exact-integer projection removal of the chain
    * `chainPfx`'s final direction from `src`, emitting the deflated
    * corpus `out` — s = roundDiv(⟨x, v⟩, F) (the pcaProject scalar),
    * vvf = max(1, roundDiv(⟨v,v⟩, F)), x′ = x − roundDiv(s·v_d, vvf).
    * The ONE deflation source for pcaDeflateOracle and pcaTopKOracle. */
  private def pcaDeflCtes(src: String, chainPfx: String, out: String,
                          iters: Int): String = {
    val f = PcaF
    s""",
       |vv$out AS (SELECT sum(c * c) AS vv FROM v$chainPfx$iters),
       |vvf$out AS (SELECT GREATEST(CAST(1 AS BIGINT), (2 * vv + $f) // ${2 * f}) AS vvf FROM vv$out),
       |sx$out AS MATERIALIZED (
       |  SELECT x.vec_id, ${pcaRdiv(s"sum(x.xi * v.c)", f.toString)} AS s
       |  FROM $src x JOIN v$chainPfx$iters v ON x.dim = v.dim GROUP BY x.vec_id
       |),
       |$out AS MATERIALIZED (
       |  SELECT x.vec_id, x.dim, x.xi - ${pcaRdiv(s"sx$out.s * v.c", s"vvf$out.vvf")} AS xi
       |  FROM $src x JOIN sx$out ON sx$out.vec_id = x.vec_id
       |  JOIN v$chainPfx$iters v ON v.dim = x.dim, vvf$out
       |)""".stripMargin
  }

  /** Oracle for q_pca_deflate (`Clustering.pcaDeflateFixed`): the
    * power chain run to v$iters, [[pcaDeflCtes]]' projection removal,
    * then the IDENTICAL chain (prefix "b") on the deflated x2 — both
    * chains from [[pcaChainSql]], so deflation cannot drift from the
    * first-component replay. All integer; hash-exact. */
  private def pcaDeflateOracle(iters: Int): String =
    pcaHeadSql + pcaChainSql("x", "", iters) +
      pcaDeflCtes("x", "", "x2", iters) + pcaChainSql("x2", "b", iters) + "\n" +
      s"SELECT CAST(dim - 1 AS BIGINT) AS dim, CAST(c AS BIGINT) AS c FROM vb$iters ORDER BY dim"

  /** Oracle for q_pca_topk (`Clustering.pcaTopKFixed`): chain →
    * deflate → chain → deflate → chain, all from the same two
    * builders; component j is learned on the corpus with components
    * 1..j−1 removed. */
  private def pcaTopKOracle(iters: Int, k: Int): String = {
    val pfx = Seq("", "b", "c", "d", "e").take(k)
    val srcs = Seq("x", "x2", "x3", "x4", "x5").take(k)
    var sql = pcaHeadSql
    for (j <- 0 until k) {
      sql += pcaChainSql(srcs(j), pfx(j), iters)
      if (j < k - 1) sql += pcaDeflCtes(srcs(j), pfx(j), srcs(j + 1), iters)
    }
    val sel = (0 until k).map(j =>
      s"SELECT $j AS comp, dim, c FROM v${pfx(j)}$iters").mkString("\n  UNION ALL ")
    sql + "\n" +
      s"""SELECT CAST(comp AS BIGINT) AS comp, CAST(dim - 1 AS BIGINT) AS dim,
         |       CAST(c AS BIGINT) AS c
         |FROM (
         |  $sel
         |)""".stripMargin
  }


  /** Oracle for q_simsearch_mmr (`Similarity.mmrTopK`): the greedy
    * MMR selection unrolled as chained CTEs (the Lloyd-chain
    * convention — aggregates are not allowed inside a recursive CTE's
    * recursive term, so the k−1 dependent steps unroll). Candidates
    * are the exact brute-force top-C (the proven list_reduce scoring),
    * pairwise candidate sims come from one MATERIALIZED table, step t
    * scores remaining candidates 0.5·sim − 0.5·max(sim to the
    * accumulated selection) — λ = 1/2 is a power of two, so both
    * engines' float ops are identical — and every argmax tie-breaks
    * ascending vec_id. Rank 1 carries the raw query sim (the empty-set
    * MMR), mirroring the operator. */
  private def mmrOracle(c: Int, k: Int): String = {
    val steps = (2 to k).map { t =>
      s"""s$t AS MATERIALIZED (
         |  SELECT cd.qid, cd.vec_id, 0.5 * cd.sim - 0.5 * max(p.s) AS score
         |  FROM cand cd
         |  JOIN ps p ON p.qid = cd.qid AND p.i = cd.vec_id
         |  JOIN acc${t - 1} a ON a.qid = p.qid AND a.vec_id = p.j
         |  WHERE NOT EXISTS (SELECT 1 FROM acc${t - 1} x
         |                    WHERE x.qid = cd.qid AND x.vec_id = cd.vec_id)
         |  GROUP BY cd.qid, cd.vec_id, cd.sim
         |), sel$t AS MATERIALIZED (
         |  SELECT qid, vec_id, score, $t AS rank FROM (
         |    SELECT qid, vec_id, score,
         |           row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rn
         |    FROM s$t) WHERE rn = 1
         |), acc$t AS MATERIALIZED (
         |  SELECT qid, vec_id FROM acc${t - 1}
         |  UNION ALL SELECT qid, vec_id FROM sel$t
         |)""".stripMargin
    }.mkString(",\n")
    val unionAll = (1 to k).map(t => s"SELECT * FROM sel$t").mkString("\n  UNION ALL ")
    s"""WITH v AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
       |  FROM embeddings
       |), n AS MATERIALIZED (
       |  SELECT vec_id, e,
       |    sqrt(list_reduce(list_prepend(0.0, list_transform(e, x -> x * x)),
       |         (a, p) -> a + p)) AS nrm
       |  FROM v
       |), sc AS (
       |  SELECT q.vec_id AS qid, c.vec_id AS vec_id,
       |    list_reduce(list_prepend(0.0,
       |      list_transform(range(1, len(q.e) + 1), i -> q.e[i] * c.e[i])),
       |      (acc, p) -> acc + p) / (q.nrm * c.nrm) AS sim
       |  FROM n q JOIN n c ON q.vec_id < 10 AND q.vec_id != c.vec_id
       |), cand AS MATERIALIZED (
       |  SELECT qid, vec_id, sim FROM (
       |    SELECT qid, vec_id, sim,
       |           row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rn
       |    FROM sc) WHERE rn <= $c
       |), ps AS MATERIALIZED (
       |  SELECT a.qid, a.vec_id AS i, b.vec_id AS j,
       |    list_reduce(list_prepend(0.0,
       |      list_transform(range(1, len(na.e) + 1), x -> na.e[x] * nb.e[x])),
       |      (acc, p) -> acc + p) / (na.nrm * nb.nrm) AS s
       |  FROM cand a JOIN cand b ON a.qid = b.qid AND a.vec_id != b.vec_id
       |  JOIN n na ON na.vec_id = a.vec_id
       |  JOIN n nb ON nb.vec_id = b.vec_id
       |), sel1 AS MATERIALIZED (
       |  SELECT qid, vec_id, sim AS score, 1 AS rank FROM (
       |    SELECT qid, vec_id, sim,
       |           row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rn
       |    FROM cand) WHERE rn = 1
       |), acc1 AS MATERIALIZED (
       |  SELECT qid, vec_id FROM sel1
       |),
       |$steps
       |SELECT qid, CAST(rank AS BIGINT) AS rank, vec_id, score FROM (
       |  $unionAll
       |)""".stripMargin
  }

  /** Oracle for q_linreg / q_linreg_predict (`Regression`): the
    * normal-equation sufficient statistics (DuckDB sums promote to
    * HUGEINT ≡ the driver's BigInt), explicit 3×3 Cramer determinants,
    * and the family's sign-safe round-half-away division against
    * |det| with det's sign folded into the numerator — every value
    * exact integer, so the fit and the per-doc predictions
    * hash-match. */
  private def linregOracle(predict: Boolean): String = {
    val f = operators.Regression.F
    def rdiv(e: String, n: String): String =
      s"CASE WHEN $e >= 0 THEN (2 * ($e) + $n) // (2 * ($n)) " +
        s"ELSE -((2 * -($e) + $n) // (2 * ($n))) END"
    val head =
      s"""WITH f AS (
         |  SELECT doc_id, CAST(n_chars AS BIGINT) AS x1,
         |         CAST(length(text) - length(replace(text, 'e', '')) AS BIGINT) AS x2,
         |         CAST(len(list_filter(string_split(text, ' '), w -> length(w) > 0)) AS BIGINT) AS y
         |  FROM documents
         |), s AS (
         |  SELECT CAST(count(*) AS HUGEINT) AS n,
         |         sum(x1) AS sx1, sum(x2) AS sx2,
         |         sum(x1 * x1) AS sx11, sum(x1 * x2) AS sx12, sum(x2 * x2) AS sx22,
         |         sum(y) AS sy, sum(x1 * y) AS sx1y, sum(x2 * y) AS sx2y
         |  FROM f
         |), d AS (
         |  SELECT
         |    n   * (sx11 * sx22 - sx12 * sx12) - sx1 * (sx1  * sx22 - sx12 * sx2)  + sx2 * (sx1  * sx12 - sx11 * sx2) AS det,
         |    sy  * (sx11 * sx22 - sx12 * sx12) - sx1 * (sx1y * sx22 - sx12 * sx2y) + sx2 * (sx1y * sx12 - sx11 * sx2y) AS d0,
         |    n   * (sx1y * sx22 - sx12 * sx2y) - sy  * (sx1  * sx22 - sx12 * sx2)  + sx2 * (sx1  * sx2y - sx1y * sx2) AS d1,
         |    n   * (sx11 * sx2y - sx1y * sx12) - sx1 * (sx1  * sx2y - sx1y * sx2)  + sy  * (sx1  * sx12 - sx11 * sx2) AS d2
         |  FROM s
         |), bb AS (
         |  SELECT
         |    ${rdiv(s"$f * d0 * (CASE WHEN det < 0 THEN -1 ELSE 1 END)", "abs(det)")} AS b0,
         |    ${rdiv(s"$f * d1 * (CASE WHEN det < 0 THEN -1 ELSE 1 END)", "abs(det)")} AS b1,
         |    ${rdiv(s"$f * d2 * (CASE WHEN det < 0 THEN -1 ELSE 1 END)", "abs(det)")} AS b2
         |  FROM d
         |)""".stripMargin
    if (predict)
      head + s"""
         |SELECT f.doc_id, f.y,
         |       CAST(bb.b0 + bb.b1 * f.x1 + bb.b2 * f.x2 AS BIGINT) AS yhat_fp,
         |       CAST(f.y * $f - (bb.b0 + bb.b1 * f.x1 + bb.b2 * f.x2) AS BIGINT) AS resid_fp
         |FROM f, bb""".stripMargin
    else
      head + s"""
         |SELECT CAST(j AS BIGINT) AS j, CAST(b AS BIGINT) AS beta_fp FROM (
         |  SELECT 0 AS j, b0 AS b FROM bb
         |  UNION ALL SELECT 1, b1 FROM bb
         |  UNION ALL SELECT 2, b2 FROM bb
         |)""".stripMargin
  }

  /** Oracle for q_winnow_dups (+ the _indexed and _append serves —
    * bit-identical searches, one replay): verified shared grams under
    * the df cap, pair-joined and counted. */
  private def winnowDupsOracle: String =
    s"""$winnowSelCte, fd AS (
       |  SELECT DISTINCT doc_id, u.enc % ${functions.WinnowFp.Enc} AS fp,
       |         substr(t, CAST(u.enc // ${functions.WinnowFp.Enc} AS INTEGER), ${functions.WinnowFp.K}) AS gram
       |  FROM sel, unnest(encs) AS u(enc)
       |), rare AS (
       |  SELECT fp, gram FROM fd GROUP BY fp, gram
       |  HAVING count(*) <= ${operators.TextOps.WinnowMaxDf}
       |), fdr AS (
       |  SELECT fd.* FROM fd JOIN rare USING (fp, gram)
       |)
       |SELECT a.doc_id AS da, b.doc_id AS db,
       |       CAST(count(DISTINCT a.gram) AS BIGINT) AS shared_grams
       |FROM fdr a JOIN fdr b
       |  ON a.fp = b.fp AND a.gram = b.gram AND a.doc_id < b.doc_id
       |GROUP BY da, db""".stripMargin

  /** Oracle for q_winnow_spans (`TextOps.winnowSpans`) — also embedded
    * as a subquery by the q_winnow_stats oracle (oracleSql is a def:
    * entries must not call back into the map during construction). */
  /** Oracle for q_winnow_stats (and its staged serve
    * q_winnow_stats_indexed — identical by parquet round-trip): the
    * spans oracle aggregated per doc, left joined onto codepoint
    * lengths; one double division, same operand order as the Spark
    * side. */
  private def winnowStatsOracle: String =
    s"""WITH spans AS (
       |${winnowSpansOracle.linesIterator.map("  " + _).mkString("\n")}
       |), agg AS (
       |  SELECT doc_id, CAST(sum(span_len) AS BIGINT) AS dup_chars
       |  FROM spans GROUP BY doc_id
       |)
       |SELECT d.doc_id, CAST(length(lower(d.text)) AS BIGINT) AS n,
       |       COALESCE(a.dup_chars, 0) AS dup_chars,
       |       CASE WHEN length(lower(d.text)) > 0
       |            THEN CAST(COALESCE(a.dup_chars, 0) AS DOUBLE)
       |                 / CAST(length(lower(d.text)) AS BIGINT)
       |            ELSE 0.0 END AS dup_frac
       |FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id""".stripMargin

  private def winnowSpansOracle: String = {
      val k = functions.WinnowFp.K
      s"""$winnowSelCte, f AS (
         |  SELECT doc_id, CAST(u.enc // ${functions.WinnowFp.Enc} AS BIGINT) AS pos,
         |         u.enc % ${functions.WinnowFp.Enc} AS fp,
         |         substr(t, CAST(u.enc // ${functions.WinnowFp.Enc} AS INTEGER), $k) AS gram
         |  FROM sel, unnest(encs) AS u(enc)
         |), keys AS (
         |  SELECT fp, gram FROM (SELECT DISTINCT doc_id, fp, gram FROM f)
         |  GROUP BY fp, gram
         |  HAVING count(*) >= 2 AND count(*) <= ${operators.TextOps.WinnowMaxDf}
         |), sp AS (
         |  SELECT DISTINCT doc_id, pos FROM f JOIN keys USING (fp, gram)
         |), isl AS (
         |  SELECT doc_id, pos,
         |    CASE WHEN max(pos + ${k - 1}) OVER (PARTITION BY doc_id ORDER BY pos
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
         |         OR pos > max(pos + ${k - 1}) OVER (PARTITION BY doc_id ORDER BY pos
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
         |         THEN 1 ELSE 0 END AS brk
         |  FROM sp
         |), grp AS (
         |  SELECT doc_id, pos,
         |    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
         |  FROM isl
         |)
         |SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
         |       CAST(max(pos) + ${k - 1} AS BIGINT) AS span_end,
         |       CAST(max(pos) + ${k - 1} - min(pos) + 1 AS BIGINT) AS span_len
         |FROM grp GROUP BY doc_id, island""".stripMargin
    }

  /** Oracle for q_winnow_cut (`TextOps.winnowCut`): the keep-first-
    * occurrence substring surgery replayed — shared-gram keys carry
    * their min doc_id (the keeper), cut-worthy positions are the
    * non-keeper occurrences, the winnowSpansOracle islands merge them
    * into spans, and the text surgery is kept-segment rows (lag-based
    * gaps plus the tail) reassembled with `string_agg ORDER BY` —
    * byte-identical to the Spark fold because both concatenate the
    * same disjoint sorted substrings of lower(text). */
  private def winnowCutOracle: String = {
    val k = functions.WinnowFp.K
    s"""$winnowSelCte, f AS (
       |  SELECT doc_id, CAST(u.enc // ${functions.WinnowFp.Enc} AS BIGINT) AS pos,
       |         u.enc % ${functions.WinnowFp.Enc} AS fp,
       |         substr(t, CAST(u.enc // ${functions.WinnowFp.Enc} AS INTEGER), $k) AS gram
       |  FROM sel, unnest(encs) AS u(enc)
       |), keys AS (
       |  SELECT fp, gram, min(doc_id) AS keeper
       |  FROM (SELECT DISTINCT doc_id, fp, gram FROM f)
       |  GROUP BY fp, gram
       |  HAVING count(*) >= 2 AND count(*) <= ${operators.TextOps.WinnowMaxDf}
       |), cp AS (
       |  SELECT DISTINCT f.doc_id, f.pos
       |  FROM f JOIN keys USING (fp, gram)
       |  WHERE f.doc_id != keys.keeper
       |), isl AS (
       |  SELECT doc_id, pos,
       |    CASE WHEN max(pos + ${k - 1}) OVER (PARTITION BY doc_id ORDER BY pos
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
       |         OR pos > max(pos + ${k - 1}) OVER (PARTITION BY doc_id ORDER BY pos
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
       |         THEN 1 ELSE 0 END AS brk
       |  FROM cp
       |), grp AS (
       |  SELECT doc_id, pos,
       |    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
       |  FROM isl
       |), spn AS MATERIALIZED (
       |  SELECT doc_id, CAST(min(pos) AS BIGINT) AS s,
       |         CAST(max(pos) + ${k - 1} AS BIGINT) AS e
       |  FROM grp GROUP BY doc_id, island
       |), seg AS (
       |  SELECT doc_id,
       |         lag(e, 1, CAST(0 AS BIGINT)) OVER (PARTITION BY doc_id ORDER BY s) + 1 AS st,
       |         s - 1 AS en
       |  FROM spn
       |  UNION ALL
       |  SELECT spn.doc_id, max(spn.e) + 1 AS st,
       |         CAST(max(length(c.t)) AS BIGINT) AS en
       |  FROM spn JOIN c USING (doc_id) GROUP BY spn.doc_id
       |), clean AS (
       |  SELECT s.doc_id,
       |         string_agg(substr(c.t, CAST(s.st AS INTEGER),
       |                           CAST(s.en - s.st + 1 AS INTEGER)),
       |                    '' ORDER BY s.st) AS ct
       |  FROM seg s JOIN c USING (doc_id)
       |  WHERE s.en >= s.st
       |  GROUP BY s.doc_id
       |), rem AS (
       |  SELECT doc_id, CAST(sum(e - s + 1) AS BIGINT) AS removed_chars
       |  FROM spn GROUP BY doc_id
       |)
       |SELECT c.doc_id,
       |       COALESCE(rem.removed_chars, CAST(0 AS BIGINT)) AS removed_chars,
       |       CAST(length(COALESCE(clean.ct,
       |              CASE WHEN rem.doc_id IS NOT NULL THEN '' ELSE c.t END)) AS BIGINT) AS clean_len,
       |       COALESCE(clean.ct,
       |              CASE WHEN rem.doc_id IS NOT NULL THEN '' ELSE c.t END) AS clean_text
       |FROM c LEFT JOIN rem ON rem.doc_id = c.doc_id
       |LEFT JOIN clean ON clean.doc_id = c.doc_id""".stripMargin
  }

  /** Shared winnow-selection CTEs (q_winnow / q_winnow_dups —
    * `TextOps.winnow` family): per-position K-char-gram polynomial
    * hashes (the q_fingerprint fold, K = WinnowFp.K = 20), then per
    * window of W gram hashes the rightmost minimum, encoded
    * pos·2³⁰ + hash. The
    * rightmost-tie rule is `len(slice) − list_position(reverse(slice),
    * min)` — first match in the reversed window IS the rightmost in
    * the original. `GREATEST(ng − W + 1, 1)` degrades to one whole-list
    * window when a document has fewer than W grams, the Expression's
    * short-document branch. list_distinct mirrors the Expression's
    * consecutive-selection dedupe (selection positions are
    * non-decreasing, so set-dedupe ≡ consecutive-dedupe). */
  private def winnowSelCte: String = {
    val k = functions.WinnowFp.K
    val w = functions.WinnowFp.W
    s"""WITH c AS (
       |  SELECT doc_id, lower(text) AS t FROM documents
       |), g AS (
       |  SELECT doc_id, t,
       |    list_transform(range(1, length(t) + 1),
       |      i -> CAST(ascii(substr(t, CAST(i AS INTEGER), 1)) AS BIGINT)) AS codes
       |  FROM c
       |), h AS (
       |  SELECT doc_id, t,
       |    CASE WHEN length(t) >= $k THEN
       |      list_transform(range(1, length(t) - ${k - 2}),
       |        i -> list_reduce(list_prepend(CAST(0 AS BIGINT), list_slice(codes, i, i + ${k - 1})),
       |               (a, x) -> (a * 31 + x) % 1000000007))
       |    ELSE CAST([] AS BIGINT[]) END AS hs
       |  FROM g
       |), w AS (
       |  SELECT doc_id, t, hs, len(hs) AS ng FROM h WHERE len(hs) > 0
       |), sel AS (
       |  SELECT doc_id, t,
       |    list_distinct(list_transform(range(1, GREATEST(ng - ${w - 1}, 1) + 1),
       |      j -> (j + len(list_slice(hs, j, LEAST(j + ${w - 1}, ng)))
       |              - list_position(list_reverse(list_slice(hs, j, LEAST(j + ${w - 1}, ng))),
       |                  list_min(list_slice(hs, j, LEAST(j + ${w - 1}, ng))))) * ${functions.WinnowFp.Enc}
       |           + list_min(list_slice(hs, j, LEAST(j + ${w - 1}, ng)))
       |    )) AS encs
       |  FROM w
       |)""".stripMargin
  }

  /** Oracle for q_simsearch_lsh (`Similarity.lshTopK`): the
    * multi-table hyperplane-LSH search replayed exactly. Everything in
    * the operator is deterministic given the fixed seeded plane pool,
    * so "approximate" (vs brute force) does not mean "uncheckable" —
    * the planes inline as exact shortest-round-trip double literals
    * (Double.toString → DuckDB's decimal parser returns the identical
    * double), table t's bit i reads plane t·LshMaxBits + i, the
    * sign-bit bucket uses the same left-fold dot as the Spark kernel
    * (list_reduce parity, proven by q_simsearch), probes are the own
    * bucket plus every single-bit flip PER TABLE, candidate pairs
    * dedup across tables before scoring, and scoring/top-k mirror the
    * brute-force oracle. The per-table plane-count formula is
    * mirrored via log2 (Scala uses ln x / ln 2): the two can disagree
    * only when n/32 sits within 1 ulp of a power of two — not a
    * corpus cardinality the harness uses. */
  /** Exact-round-trip double literal for DuckDB: a bare decimal
    * literal is parsed through a wide-DECIMAL intermediate whose
    * cast to DOUBLE double-rounds (measured: 16/48 plane coefficients
    * land 1 ulp off), while a string cast is a correctly-rounded
    * strtod — so inlined doubles that feed HASH-COMPARED output must
    * use this form. (The lshOracle planes survive bare literals only
    * because a 1-ulp dot perturbation can't flip a sign at any
    * realistic margin.) */
  private def dlit(x: Double): String = s"CAST('$x' AS DOUBLE)"

  /** Oracle for q_jl_project: the first JlDims pool planes inlined as
    * exact round-trip double literals, the dot replayed with the
    * identical left fold — raw doubles hash-match bit-for-bit. */
  private def jlOracle: String = {
    val planeRows = operators.Similarity.planes
      .take(operators.Clustering.JlDims).zipWithIndex
      .map { case (p, j) => s"($j, [${p.map(dlit).mkString(", ")}])" }
      .mkString(",\n      ")
    s"""WITH v AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
       |  FROM embeddings
       |), pl(dim, p) AS (VALUES
       |      $planeRows
       |)
       |SELECT v.vec_id, CAST(pl.dim AS BIGINT) AS dim,
       |  list_reduce(list_prepend(0.0,
       |    list_transform(range(1, len(v.e) + 1), j -> pl.p[j] * v.e[j])),
       |    (a, x) -> a + x) AS y
       |FROM v, pl""".stripMargin
  }

  private def lshOracle: String = {
    val planeRows = operators.Similarity.planes.zipWithIndex.map { case (p, i) =>
      s"($i, [${p.map(_.toString).mkString(", ")}])"
    }.mkString(",\n      ")
    val mb = operators.Similarity.LshMaxBits
    val cap = operators.Similarity.LshBitsCap
    s"""WITH v AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
       |  FROM embeddings
       |), n AS (
       |  SELECT vec_id, e,
       |    sqrt(list_reduce(list_prepend(0.0, list_transform(e, x -> x * x)),
       |         (a, p) -> a + p)) AS nrm
       |  FROM v
       |), pl(i, p) AS (VALUES
       |      $planeRows
       |), np AS (
       |  SELECT GREATEST(4, LEAST($cap,
       |    CAST(ceil(log2(GREATEST(1.0, count(*) / ${operators.Similarity.TargetBucket}.0))) AS BIGINT))) AS np,
       |    CASE WHEN count(*) > ${operators.Similarity.TargetBucket.toLong << operators.Similarity.LshBitsCap}
       |         THEN ${operators.Similarity.LshTablesMax}
       |         ELSE ${operators.Similarity.LshTablesBase} END AS ntab
       |  FROM embeddings
       |), b AS MATERIALIZED (
       |  SELECT n.vec_id, tb.t,
       |    CAST(sum(CASE WHEN list_reduce(list_prepend(0.0,
       |           list_transform(range(1, len(n.e) + 1), j -> pl.p[j] * n.e[j])),
       |           (a, x) -> a + x) > 0
       |         THEN (1 << (pl.i - tb.t * $mb)) ELSE 0 END) AS INT) AS bucket
       |  FROM n, pl, np, range(0, ${operators.Similarity.LshTablesMax}) tb(t)
       |  WHERE tb.t < np.ntab
       |    AND pl.i >= tb.t * $mb AND pl.i < tb.t * $mb + np.np
       |  GROUP BY n.vec_id, tb.t
       |), q AS (
       |  SELECT b.vec_id, b.t,
       |    list_distinct(list_prepend(b.bucket,
       |      list_transform(range(0, np.np), i -> xor(b.bucket, CAST(1 << i AS INT))))) AS probes
       |  FROM b, np WHERE b.vec_id < 10
       |), cand AS (
       |  SELECT DISTINCT q.vec_id AS qid, c.vec_id AS vec_id
       |  FROM q JOIN b c ON q.t = c.t AND list_contains(q.probes, c.bucket)
       |    AND q.vec_id != c.vec_id
       |), s AS (
       |  SELECT cand.qid, cand.vec_id,
       |    list_reduce(list_prepend(0.0,
       |      list_transform(range(1, len(qn.e) + 1), i -> qn.e[i] * cn.e[i])),
       |      (acc, p) -> acc + p) / (qn.nrm * cn.nrm) AS sim
       |  FROM cand JOIN n qn ON qn.vec_id = cand.qid
       |  JOIN n cn ON cn.vec_id = cand.vec_id
       |), r AS (
       |  SELECT qid, vec_id, sim,
       |         CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS BIGINT) AS rn
       |  FROM s
       |)
       |SELECT qid, vec_id, sim, rn FROM r WHERE rn <= 10""".stripMargin
  }

  /** Oracle for q_simsearch_ivf / _indexed / _append
    * (`Similarity.ivfTopK` family): the inverted-file search replayed
    * end-to-end in DuckDB. Possible because the coarse quantizer is the
    * FIXED-POINT Lloyd fit (micro-unit BIGINT — the kmeansOracle /
    * semanticOracle chain) and probe ranking is exact-integer d2 with
    * a (d2, cid) tie-break; only the final cosine is floating point,
    * and that kernel's list_reduce fold parity is proven by the
    * q_simsearch oracle. The indexed form shares this oracle verbatim:
    * parquet round-trips doubles/longs bit-exactly, so staged search ≡
    * live search is an identity (also spec-asserted). The appended form
    * (`base = true`) fits the quantizer on the base slice only
    * (vec_id < n − max(1, n⁄10), the operator's arrival cut) and
    * assigns the FULL corpus under it — replaying the append path; the
    * refresh branch (appended fraction > 0.5) cannot trigger under
    * this cut construction on the harness's dense-id corpora, and the
    * operator spec covers it separately. */
  /** THE single source of the coarse-quantizer replay (VERDICT r9 #7)
    * — shared verbatim by [[ivfOracle]] and [[ivfpqOracle]] so the
    * base-cut arithmetic, Lloyd-round CTEs, full-corpus assignment and
    * probe math cannot drift between the flat and composed searches.
    * Emits the CTE text from `WITH q` through `pr` (no trailing
    * comma): q/x (micro-unit long dims), n (double norms), optional
    * cutpar/bx base slice (`base` — fit rows predate the last-decile
    * delta; K always sizes from the FULL corpus), kpar (K ≈ √n lists,
    * nprobe = max(3, round(probeFraction·K))), c0 (deterministic
    * first-K init), `iters` assign/argmin/mean rounds (sign-safe
    * round-half-away division, empty lists keep their centroid),
    * cfin + the full-corpus assignment `asg`, and the query probe
    * selection `qd`/`pr` (all vectors when `allQ`, else vec_id < 10). */
  private def coarseChainSql(iters: Int, base: Boolean,
                             probeFraction: Double, allQ: Boolean): String = {
    // fit-side rows: the base slice for the appended variant, the whole
    // corpus otherwise. K always sizes from the FULL corpus (ivfK(n)).
    val fx = if (base) "bx" else "x"
    val initSrc =
      if (base) "(SELECT vec_id FROM embeddings, cutpar WHERE vec_id < cut)"
      else "embeddings"
    def assignCte(i: Int, cfrom: String, xfrom: String): String =
      s"""a$i AS (
         |  SELECT x.vec_id, c.cid, CAST(sum((x.xi - c.c) * (x.xi - c.c)) AS BIGINT) AS d2
         |  FROM $xfrom x JOIN $cfrom c ON x.dim = c.dim
         |  GROUP BY x.vec_id, c.cid
         |), b$i AS (
         |  SELECT vec_id, cid, d2 FROM (
         |    SELECT vec_id, cid, d2,
         |           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
         |    FROM a$i) WHERE rn = 1
         |)""".stripMargin
    val cutCte =
      if (base) """cutpar AS (
        |  SELECT count(*) - GREATEST(1, count(*) // 10) AS cut FROM embeddings
        |), bx AS MATERIALIZED (SELECT x.* FROM x, cutpar WHERE x.vec_id < cut),
        |""".stripMargin
      else ""
    val head =
      s"""WITH q AS (
         |  SELECT vec_id,
         |         list_transform(embedding,
         |           v -> CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) AS qe
         |  FROM embeddings
         |), x AS MATERIALIZED (
         |  SELECT vec_id, CAST(u.i AS INT) AS dim, qe[u.i] AS xi
         |  FROM q, unnest(range(1, len(qe) + 1)) AS u(i)
         |), n AS MATERIALIZED (
         |  SELECT vec_id, e,
         |    sqrt(list_reduce(list_prepend(0.0, list_transform(e, x -> x * x)),
         |         (a, p) -> a + p)) AS nrm
         |  FROM (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
         |        FROM embeddings)
         |), ${cutCte}kpar AS (
         |  SELECT k, GREATEST(3, CAST(floor($probeFraction * k + 0.5) AS BIGINT)) AS nprobe
         |  FROM (SELECT GREATEST(4, LEAST(4096,
         |          CAST(round(sqrt(count(*))) AS BIGINT))) AS k FROM embeddings)
         |), c0 AS (
         |  SELECT dense_rank() OVER (ORDER BY s.vec_id) - 1 AS cid, x.dim, x.xi AS c
         |  FROM (SELECT vec_id FROM
         |          (SELECT vec_id, row_number() OVER (ORDER BY vec_id) AS rn
         |           FROM $initSrc), kpar
         |        WHERE rn <= k) s
         |  JOIN x ON x.vec_id = s.vec_id
         |)""".stripMargin
    val its = (1 to iters).map { i =>
      assignCte(i, s"c${i - 1}", fx) + s""",
         |m$i AS (
         |  SELECT b.cid, x.dim,
         |    CASE WHEN sum(x.xi) >= 0
         |         THEN (2 * CAST(sum(x.xi) AS BIGINT) + count(*)) // (2 * count(*))
         |         ELSE -((2 * -CAST(sum(x.xi) AS BIGINT) + count(*)) // (2 * count(*)))
         |    END AS c
         |  FROM b$i b JOIN $fx x ON x.vec_id = b.vec_id
         |  GROUP BY b.cid, x.dim
         |), c$i AS (
         |  SELECT p.cid, p.dim, coalesce(m.c, p.c) AS c
         |  FROM c${i - 1} p LEFT JOIN m$i m ON m.cid = p.cid AND m.dim = p.dim
         |)""".stripMargin
    }
    val fin = iters + 1
    head + ",\n" + its.mkString(",\n") + ",\n" +
      s"cfin AS MATERIALIZED (SELECT cid, dim, c FROM c$iters),\n" +
      assignCte(fin, "cfin", "x") + // full-corpus list assignment
      s""",
         |asg AS MATERIALIZED (SELECT vec_id, cid FROM b$fin),
         |qd AS (
         |  SELECT x.vec_id, c.cid, CAST(sum((x.xi - c.c) * (x.xi - c.c)) AS BIGINT) AS d2
         |  FROM x JOIN cfin c ON x.dim = c.dim
         |  ${if (allQ) "" else "WHERE x.vec_id < 10"}
         |  GROUP BY x.vec_id, c.cid
         |), pr AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
         |    FROM qd), kpar
         |  WHERE rn <= nprobe
         |)""".stripMargin
  }

  private def ivfOracle(iters: Int, base: Boolean, allQ: Boolean = false,
                        k: Int = 10,
                        probeFraction: Double = 0.15,
                        candFilter: String = ""): String = {
    coarseChainSql(iters, base, probeFraction, allQ) +
      s""",
         |s AS (
         |  SELECT pr.vec_id AS qid, a.vec_id AS vec_id,
         |    list_reduce(list_prepend(0.0,
         |      list_transform(range(1, len(qn.e) + 1), i -> qn.e[i] * cn.e[i])),
         |      (acc, p) -> acc + p) / (qn.nrm * cn.nrm) AS sim
         |  FROM pr JOIN asg a ON a.cid = pr.cid AND a.vec_id != pr.vec_id$candFilter
         |  JOIN n qn ON qn.vec_id = pr.vec_id
         |  JOIN n cn ON cn.vec_id = a.vec_id
         |), r AS (
         |  SELECT qid, vec_id, sim,
         |         CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS BIGINT) AS rn
         |  FROM s
         |)
         |SELECT qid, vec_id, sim, rn FROM r WHERE rn <= $k""".stripMargin
  }

  /** Oracle for q_simsearch_pq (`Similarity.pqTopK`): product
    * quantization replayed end-to-end — 8 independent fixed-point
    * Lloyd chains (one per subspace, the ivfOracle fit pattern over the
    * subspace's dim slice), code assignment and query LUTs from ONE
    * shared distance CTE per subspace (`ea$s` serves both: argmin → the
    * corpus code, filter vec_id < 10 → the query's per-code distances),
    * integer ADC scoring + shortlist, exact-cosine re-rank (the proven
    * list_reduce kernel). */
  /** ONE fixed-point Lloyd chain over a dim-slice of `src`, as CTE
    * text: slice (`${p}xs$s`, MATERIALIZED), deterministic init (first
    * `kc` corpus vec_ids), `iters` assign/argmin/mean/update rounds
    * (sign-safe round-half-away division, empty clusters keep their
    * centroid — the fitFixed contract), then the all-(vector, codeword)
    * distance table `${p}ea$s` and the argmin codes `${p}eb$s
    * (vec_id, cid)`. Shared by pqOracle (p = "", src = x) and
    * ivfpqOracle (p = "r", src = xr residuals); ivfOracle's COARSE
    * chain stays separate — it is parameterized differently (corpus-
    * derived k from kpar, base-slice fit source for the append
    * variant) — but mirrors the same assign/update CTE text. */
  private def lloydSubspaceSql(p: String, src: String, s: Int, iters: Int,
                               kc: Int, d: Int,
                               fitSrc: String = null,
                               initFrom: String = "embeddings"): String = {
    // fit rows (iterations + init) may come from a RESTRICTED source
    // (the append variant fits on the base slice only) while the
    // encode tail always covers the full src
    val fitRef = if (fitSrc == null) s"${p}xs$s" else s"${p}fxs$s"
    val fitCte =
      if (fitSrc == null) ""
      else
        s"""${p}fxs$s AS MATERIALIZED (
           |  SELECT vec_id, dim, xi FROM $fitSrc WHERE dim > ${s * d} AND dim <= ${(s + 1) * d}
           |), """.stripMargin
    val head =
      s"""${p}xs$s AS MATERIALIZED (
         |  SELECT vec_id, dim, xi FROM $src WHERE dim > ${s * d} AND dim <= ${(s + 1) * d}
         |), ${fitCte}${p}c${s}_0 AS (
         |  SELECT dense_rank() OVER (ORDER BY sv.vec_id) - 1 AS cid, x.dim, x.xi AS c
         |  FROM (SELECT vec_id FROM
         |          (SELECT vec_id, row_number() OVER (ORDER BY vec_id) AS rn
         |           FROM $initFrom)
         |        WHERE rn <= $kc) sv
         |  JOIN $fitRef x ON x.vec_id = sv.vec_id
         |)""".stripMargin
    val its = (1 to iters).map { i =>
      s"""${p}a${s}_$i AS (
         |  SELECT x.vec_id, c.cid, CAST(sum((x.xi - c.c) * (x.xi - c.c)) AS BIGINT) AS d2
         |  FROM $fitRef x JOIN ${p}c${s}_${i - 1} c ON x.dim = c.dim
         |  GROUP BY x.vec_id, c.cid
         |), ${p}b${s}_$i AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
         |    FROM ${p}a${s}_$i) WHERE rn = 1
         |), ${p}m${s}_$i AS (
         |  SELECT b.cid, x.dim,
         |    CASE WHEN sum(x.xi) >= 0
         |         THEN (2 * CAST(sum(x.xi) AS BIGINT) + count(*)) // (2 * count(*))
         |         ELSE -((2 * -CAST(sum(x.xi) AS BIGINT) + count(*)) // (2 * count(*)))
         |    END AS c
         |  FROM ${p}b${s}_$i b JOIN $fitRef x ON x.vec_id = b.vec_id
         |  GROUP BY b.cid, x.dim
         |), ${p}c${s}_$i AS (
         |  SELECT pp.cid, pp.dim, coalesce(mm.c, pp.c) AS c
         |  FROM ${p}c${s}_${i - 1} pp LEFT JOIN ${p}m${s}_$i mm
         |    ON mm.cid = pp.cid AND mm.dim = pp.dim
         |)""".stripMargin
    }
    val enc =
      s"""${p}ea$s AS (
         |  SELECT x.vec_id, c.cid, CAST(sum((x.xi - c.c) * (x.xi - c.c)) AS BIGINT) AS d2
         |  FROM ${p}xs$s x JOIN ${p}c${s}_$iters c ON x.dim = c.dim
         |  GROUP BY x.vec_id, c.cid
         |), ${p}eb$s AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
         |    FROM ${p}ea$s) WHERE rn = 1
         |)""".stripMargin
    (head +: its :+ enc).mkString(",\n")
  }

  private def pqOracle(iters: Int): String = {
    val m = operators.Similarity.PqM
    val d = operators.Similarity.PqD
    val kc = operators.Similarity.PqK
    val shortN = s"GREATEST(${operators.Similarity.pqShortlistFloor(10)}, (SELECT COUNT(*) FROM embeddings) // 8)"
    def chain(s: Int): String = lloydSubspaceSql("", "x", s, iters, kc, d)
    val encU = (0 until m)
      .map(s => s"SELECT vec_id, $s AS s, cid FROM eb$s").mkString("\n  UNION ALL ")
    val lutU = (0 until m)
      .map(s => s"SELECT vec_id AS qid, $s AS s, cid AS code, d2 FROM ea$s WHERE vec_id < 10")
      .mkString("\n  UNION ALL ")
    s"""WITH q AS (
       |  SELECT vec_id,
       |         list_transform(embedding,
       |           v -> CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) AS qe
       |  FROM embeddings
       |), x AS MATERIALIZED (
       |  SELECT vec_id, CAST(u.i AS INT) AS dim, qe[u.i] AS xi
       |  FROM q, unnest(range(1, len(qe) + 1)) AS u(i)
       |), n AS MATERIALIZED (
       |  SELECT vec_id, e,
       |    sqrt(list_reduce(list_prepend(0.0, list_transform(e, x -> x * x)),
       |         (a, p) -> a + p)) AS nrm
       |  FROM (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
       |        FROM embeddings)
       |),
       |${(0 until m).map(chain).mkString(",\n")},
       |enc AS (
       |  $encU
       |), lut AS (
       |  $lutU
       |), sc AS (
       |  SELECT l.qid, e.vec_id, CAST(sum(l.d2) AS BIGINT) AS pqd2
       |  FROM enc e JOIN lut l ON l.s = e.s AND l.code = e.cid AND l.qid != e.vec_id
       |  GROUP BY 1, 2
       |), sh AS (
       |  SELECT qid, vec_id FROM (
       |    SELECT qid, vec_id,
       |           row_number() OVER (PARTITION BY qid ORDER BY pqd2, vec_id) AS srn
       |    FROM sc) WHERE srn <= $shortN
       |), s2 AS (
       |  SELECT sh.qid, sh.vec_id,
       |    list_reduce(list_prepend(0.0,
       |      list_transform(range(1, len(qn.e) + 1), i -> qn.e[i] * cn.e[i])),
       |      (acc, p) -> acc + p) / (qn.nrm * cn.nrm) AS sim
       |  FROM sh JOIN n qn ON qn.vec_id = sh.qid
       |  JOIN n cn ON cn.vec_id = sh.vec_id
       |), r AS (
       |  SELECT qid, vec_id, sim,
       |         CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS BIGINT) AS rn
       |  FROM s2
       |)
       |SELECT qid, vec_id, sim, rn FROM r WHERE rn <= 10""".stripMargin
  }

  /** Oracle for q_simsearch_ivfpq (`Similarity.ivfpqTopK`): the
    * composed search replayed end-to-end — the ivfOracle coarse-fit
    * chain (kpar/c0..cN + full assignment), exact-integer residuals
    * xr = x − centroid, 8 residual-subspace Lloyd chains (rc…, the
    * pqOracle pattern over residual dims), corpus codes (rea/reb),
    * per-probed-list query residuals + LUTs (xqr/lu…), integer ADC
    * scoring restricted to probed lists, shortlist, cosine re-rank. */
  private def ivfpqOracle(ivfIters: Int, pqIters: Int,
                          base: Boolean = false): String = {
    val m = operators.Similarity.PqM
    val d = operators.Similarity.PqD
    val kc = operators.Similarity.PqK
    val shortN = s"GREATEST(${operators.Similarity.pqShortlistFloor(10)}, (SELECT COUNT(*) FROM embeddings) // 8)"
    // fit rows come from the base slice for the append variant (the
    // model predates the delta); the full-corpus assignment, residuals
    // and encode tails are unchanged — the coarseChainSql base convention
    val initSrc =
      if (base) "(SELECT vec_id FROM embeddings, cutpar WHERE vec_id < cut)"
      else "embeddings"
    // residual-subspace codebook chain over xr's global dim slice (the
    // shared lloydSubspaceSql with prefix "r"), plus the per-probed-
    // list query LUT — the one piece flat PQ does not have (the query
    // residual differs per probed list, so lu comes from xqr, not rea)
    def rchain(s: Int): String =
      lloydSubspaceSql("r", "xr", s, pqIters, kc, d,
        fitSrc = if (base) "bxr" else null, initFrom = initSrc) + s""",
         |lu$s AS (
         |  SELECT q.qid, q.cid AS probe, c.cid AS code,
         |         CAST(sum((q.xi - c.c) * (q.xi - c.c)) AS BIGINT) AS d2
         |  FROM (SELECT qid, cid, dim, xi FROM xqr
         |        WHERE dim > ${s * d} AND dim <= ${(s + 1) * d}) q
         |  JOIN rc${s}_$pqIters c ON c.dim = q.dim
         |  GROUP BY 1, 2, 3
         |)""".stripMargin
    val encU = (0 until m)
      .map(s => s"SELECT eb.vec_id, a.cid, $s AS s, eb.cid AS code FROM reb$s eb JOIN asg a ON a.vec_id = eb.vec_id")
      .mkString("\n  UNION ALL ")
    val lutU = (0 until m)
      .map(s => s"SELECT qid, probe, $s AS s, code, d2 FROM lu$s")
      .mkString("\n  UNION ALL ")
    coarseChainSql(ivfIters, base, 0.15, allQ = false) + s""",
       |xr AS MATERIALIZED (
       |  SELECT x.vec_id, x.dim, x.xi - c.c AS xi
       |  FROM x JOIN asg a ON a.vec_id = x.vec_id
       |  JOIN cfin c ON c.cid = a.cid AND c.dim = x.dim
       |),${if (base) """
       |bxr AS MATERIALIZED (SELECT xr.* FROM xr, cutpar WHERE xr.vec_id < cut),""".stripMargin else ""}
       |xqr AS MATERIALIZED (
       |  SELECT pr.vec_id AS qid, pr.cid, x.dim, x.xi - c.c AS xi
       |  FROM pr JOIN x ON x.vec_id = pr.vec_id
       |  JOIN cfin c ON c.cid = pr.cid AND c.dim = x.dim
       |),
       |${(0 until m).map(rchain).mkString(",\n")},
       |enc AS (
       |  $encU
       |), lut AS (
       |  $lutU
       |), sc AS (
       |  SELECT l.qid, e.vec_id, CAST(sum(l.d2) AS BIGINT) AS pqd2
       |  FROM enc e JOIN lut l
       |    ON l.probe = e.cid AND l.s = e.s AND l.code = e.code AND l.qid != e.vec_id
       |  GROUP BY 1, 2
       |), sh AS (
       |  SELECT qid, vec_id FROM (
       |    SELECT qid, vec_id,
       |           row_number() OVER (PARTITION BY qid ORDER BY pqd2, vec_id) AS srn
       |    FROM sc) WHERE srn <= $shortN
       |), s2 AS (
       |  SELECT sh.qid, sh.vec_id,
       |    list_reduce(list_prepend(0.0,
       |      list_transform(range(1, len(qn.e) + 1), i -> qn.e[i] * cn.e[i])),
       |      (acc, p) -> acc + p) / (qn.nrm * cn.nrm) AS sim
       |  FROM sh JOIN n qn ON qn.vec_id = sh.qid
       |  JOIN n cn ON cn.vec_id = sh.vec_id
       |), r AS (
       |  SELECT qid, vec_id, sim,
       |         CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS BIGINT) AS rn
       |  FROM s2
       |)
       |SELECT qid, vec_id, sim, rn FROM r WHERE rn <= 10""".stripMargin
  }

  /** Shared by the typed-flatMap and native-Generator bigram queries
    * (same semantics, two execution tiers). */
  private def bigramOracle: String =
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '$Ws'), x -> x != '') AS ts
       |  FROM documents
       |), bg AS (
       |  SELECT doc_id, ts[i] || ' ' || ts[i+1] AS bigram
       |  FROM toks, unnest(range(1, len(ts))) AS u(i)
       |  WHERE len(ts) >= 2
       |)
       |SELECT bigram, count(*) AS cnt FROM bg GROUP BY bigram""".stripMargin

  /** Exhaustive 3-token-shingle Jaccard pairs at/above tau — oracle for
    * both the inverted-index (q_dedup_ngram) and the MinHash-LSH
    * (q_dedup_minhash) engines; see Dedup for the recall argument. */
  /** The 60-bit md5 user-hash fold (engine side: conv(md5-prefix)) and
    * per-type KMV sketch rows, shared by both KMV oracles. Hash-exact
    * replay of an APPROXIMATION algorithm: the sketch is a pure
    * function of the value set under a seedless hash. */
  private def kmvSketchCtes: String =
    s"""h AS (
       |  SELECT DISTINCT event_type,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(range(1, 16),
       |        i -> CAST(strpos('0123456789abcdef',
       |               substr(md5(CAST(user_id AS VARCHAR)),
       |                      CAST(i AS INTEGER), 1)) - 1 AS BIGINT))),
       |      (a, x) -> a * 16 + x) AS h
       |  FROM events
       |), r AS (
       |  SELECT event_type, h,
       |         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
       |  FROM h
       |), s AS (SELECT event_type, h FROM r WHERE rn <= ${operators.Sketches.KmvK})""".stripMargin

  /** Shared truth for q_kmv_distinct and q_stream_kmv (min-k of a set
    * is associative and idempotent — chunking is invisible). */
  private def kmvDistinctOracle: String =
    s"""WITH $kmvSketchCtes,
       |t AS (
       |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_sketch,
       |         max(h) AS kth_hash
       |  FROM s GROUP BY 1
       |)
       |SELECT event_type, n_sketch, kth_hash,
       |  CASE WHEN n_sketch < ${operators.Sketches.KmvK} THEN n_sketch
       |       ELSE CAST(CAST('${operators.Sketches.KmvNum}' AS HUGEINT)
       |                 // kth_hash AS BIGINT) END AS est_distinct
       |FROM t""".stripMargin

  /** Shared truth for q_anomaly and q_stream_anomaly (the streamed fold
    * reproduces the batch window exactly — strict ts-split feed, shared
    * integer flag predicate). Ordering uses the µs-truncated timestamp
    * (the engine's ts convention: DuckDB reads the fixture at ns). */
  private def anomalyOracle: String =
    s"""WITH e AS (
       |  SELECT event_id, date_trunc('microseconds', ts) AS ts, event_type,
       |         CAST(round(value * 100) AS BIGINT) AS cents
       |  FROM events WHERE value IS NOT NULL
       |), p AS (
       |  SELECT event_id, event_type, cents,
       |    CAST(count(cents) OVER w AS BIGINT) AS n_prior,
       |    CAST(coalesce(sum(cents) OVER w, 0) AS BIGINT) AS s,
       |    CAST(coalesce(sum(cents * cents) OVER w, 0) AS BIGINT) AS s2
       |  FROM e
       |  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |)
       |SELECT event_id, event_type, cents, n_prior,
       |  n_prior >= ${operators.Events.AnomMinPrior} AND
       |  (CAST(n_prior AS HUGEINT) * cents - s) *
       |    (CAST(n_prior AS HUGEINT) * cents - s)
       |  > ${operators.Events.AnomZSq} *
       |    (CAST(n_prior AS HUGEINT) * s2 - CAST(s AS HUGEINT) * s)
       |    AS is_anomaly
       |FROM p""".stripMargin

  /** Oracle for q_lang_mix: `TextOps.langMix`'s passage split (10-token
    * non-overlapping windows), the q_lang_id score CASE per passage
    * (profiles generated from the SAME LangProfiles constant — no
    * drift), then the (count desc, lang asc) argmax via row_number and
    * one exact integer share division. */
  private def langMixOracle: String = {
    val p = graft.operators.TextOps.LangMixPassage
    val profs = graft.operators.TextOps.LangProfiles
    val scoreCols = profs.map { case (l, ws) =>
      s"CAST(len(list_filter(ptoks, x -> x IN (${ws.map("'" + _ + "'").mkString(",")}))) AS BIGINT) AS s_$l"
    }.mkString(",\n         ")
    val langs = profs.map(_._1)
    val caseArms = langs.map { l =>
      val geAll = langs.filter(_ != l).map(o => s"s_$l >= s_$o").mkString(" AND ")
      s"WHEN s_$l > 0 AND $geAll THEN '$l'"
    }.mkString("\n       ")
    s"""WITH t AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '$Ws'), x -> x != '') AS toks
       |  FROM documents
       |), pp AS (
       |  SELECT doc_id, toks[u.i * $p + 1 : u.i * $p + $p] AS ptoks
       |  FROM t, unnest(range(0, (len(toks) - 1) // $p + 1)) AS u(i)
       |  WHERE len(toks) >= 1
       |), s AS (
       |  SELECT doc_id,
       |         $scoreCols
       |  FROM pp
       |), sc AS (
       |  SELECT doc_id,
       |    CASE $caseArms
       |       ELSE 'und' END AS plang
       |  FROM s
       |), c AS (
       |  SELECT doc_id, plang, count(*) AS c FROM sc GROUP BY 1, 2
       |), g AS (
       |  SELECT doc_id, plang, c,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, plang) AS rn,
       |    CAST(sum(c) OVER (PARTITION BY doc_id) AS BIGINT) AS n_passages,
       |    CAST(count(*) OVER (PARTITION BY doc_id) AS BIGINT) AS n_langs
       |  FROM c
       |)
       |SELECT doc_id, n_passages, plang AS dom_lang,
       |       CAST((1000000 * c) // n_passages AS BIGINT) AS dom_share_micro,
       |       n_langs, n_langs > 1 AS mixed
       |FROM g WHERE rn = 1""".stripMargin
  }

  /** WITH-body ending in `p` = the exhaustive J ≥ tau pairs (da, db,
    * jac) — shared by the q_dedup_minhash oracle and the source-matrix
    * composition of q_dedup_cross. */
  private def jaccardPairsCtes(tau: Double): String =
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '$Ws'), x -> x != '') AS ts
       |  FROM documents
       |), sh AS MATERIALIZED (
       |  SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
       |  FROM toks, unnest(range(1, len(ts) - 1)) AS u(i)
       |  WHERE len(ts) >= 3
       |), sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |iv AS (
       |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS ic
       |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id
       |), p AS (
       |  SELECT * FROM (
       |    SELECT da, db, CAST(ic AS DOUBLE) / (x.n + y.n - ic) AS jac
       |    FROM iv JOIN sz x ON da = x.doc_id JOIN sz y ON db = y.doc_id
       |  ) WHERE jac >= $tau
       |)""".stripMargin

  private def jaccardOracle(tau: Double): String =
    s"""${jaccardPairsCtes(tau)}
       |SELECT da, db, jac FROM p""".stripMargin

  /** Connected components of the exhaustive J ≥ 0.8 pair graph (min
    * reachable id per node, recursive transitive closure) — oracle for
    * BOTH q_dedup_cc and q_dedup_append: the incremental append path
    * reproduces the one-shot pair set exactly (per-doc band purity;
    * see Dedup.dedupAppend), so the two queries share one truth. */
  /** Oracle for q_simsearch_sq (`Similarity.sqTopK`): the SQ8 model is
    * a per-dim min/max GROUP BY (no Lloyd chains), codes and decode are
    * single integer expressions, the approximate d2 is an exact BIGINT
    * sum, and shortlist/re-rank mirror the pqOracle tail. */
  private def sqOracle: String = {
    val shortN = s"GREATEST(${operators.Similarity.pqShortlistFloor(10)}, (SELECT COUNT(*) FROM embeddings) // 8)"
    val lv = operators.Similarity.SqLevels
    s"""WITH q AS (
       |  SELECT vec_id,
       |         list_transform(embedding,
       |           v -> CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) AS qe
       |  FROM embeddings
       |), x AS MATERIALIZED (
       |  SELECT vec_id, CAST(u.i AS INT) AS dim, qe[u.i] AS xi
       |  FROM q, unnest(range(1, len(qe) + 1)) AS u(i)
       |), n AS MATERIALIZED (
       |  SELECT vec_id, e,
       |    sqrt(list_reduce(list_prepend(0.0, list_transform(e, x -> x * x)),
       |         (a, p) -> a + p)) AS nrm
       |  FROM (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
       |        FROM embeddings)
       |), st AS MATERIALIZED (
       |  SELECT dim, min(xi) AS lo, GREATEST(1, max(xi) - min(xi)) AS w
       |  FROM x GROUP BY dim
       |), xh AS MATERIALIZED (
       |  SELECT x.vec_id, x.dim,
       |         st.lo + (2 * ((x.xi - st.lo) * $lv // st.w) * st.w + $lv) // (2 * $lv) AS xhat
       |  FROM x JOIN st USING (dim)
       |), sc AS (
       |  SELECT qx.vec_id AS qid, c.vec_id,
       |         CAST(sum((qx.xi - c.xhat) * (qx.xi - c.xhat)) AS BIGINT) AS pqd2
       |  FROM x qx JOIN xh c ON qx.dim = c.dim AND qx.vec_id < 10
       |       AND qx.vec_id != c.vec_id
       |  GROUP BY 1, 2
       |), sh AS (
       |  SELECT qid, vec_id FROM (
       |    SELECT qid, vec_id,
       |           row_number() OVER (PARTITION BY qid ORDER BY pqd2, vec_id) AS srn
       |    FROM sc) WHERE srn <= $shortN
       |), s2 AS (
       |  SELECT sh.qid, sh.vec_id,
       |    list_reduce(list_prepend(0.0,
       |      list_transform(range(1, len(qn.e) + 1), i -> qn.e[i] * cn.e[i])),
       |      (acc, p) -> acc + p) / (qn.nrm * cn.nrm) AS sim
       |  FROM sh JOIN n qn ON qn.vec_id = sh.qid
       |  JOIN n cn ON cn.vec_id = sh.vec_id
       |), r AS (
       |  SELECT qid, vec_id, sim,
       |         CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS BIGINT) AS rn
       |  FROM s2
       |)
       |SELECT qid, vec_id, sim, rn FROM r WHERE rn <= 10""".stripMargin
  }

  /** Oracle for the q_simsearch_bq family (`Similarity.bqTopK` /
    * `bqTopKIndexed` / `bqTopKAppended` — ONE oracle, the three forms
    * are bit-identical by construction): sign-bit signatures packed
    * into 32-bit BIGINT words (bit i of word w set iff dim 32w+i+1 is
    * > 0 — a comparison, exact on floats in both engines), Hamming
    * distance as xor + bit_count summed over words, the corpus-aware
    * shortlist by (hd, vec_id), exact-cosine re-rank — the sqOracle
    * tail. Every step is integer or a float comparison; the whole
    * search replays. */
  private def bqOracle: String = {
    val shortN = s"GREATEST(${operators.Similarity.pqShortlistFloor(10)}, (SELECT COUNT(*) FROM embeddings) // 8)"
    s"""WITH n AS MATERIALIZED (
       |  SELECT vec_id, e,
       |    sqrt(list_reduce(list_prepend(0.0, list_transform(e, x -> x * x)),
       |         (a, p) -> a + p)) AS nrm
       |  FROM (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
       |        FROM embeddings)
       |), x AS (
       |  SELECT vec_id, CAST(u.i AS INT) AS dim, e[u.i] AS xi
       |  FROM n, unnest(range(1, len(e) + 1)) AS u(i)
       |), sig AS MATERIALIZED (
       |  SELECT vec_id, (dim - 1) // 32 AS w,
       |         CAST(sum(CASE WHEN xi > 0 THEN (CAST(1 AS BIGINT) << ((dim - 1) % 32))
       |                       ELSE 0 END) AS BIGINT) AS bits
       |  FROM x GROUP BY 1, 2
       |), sc AS (
       |  SELECT q.vec_id AS qid, c.vec_id,
       |         CAST(sum(bit_count(xor(q.bits, c.bits))) AS BIGINT) AS hd
       |  FROM sig q JOIN sig c ON q.w = c.w AND q.vec_id < 10
       |       AND q.vec_id != c.vec_id
       |  GROUP BY 1, 2
       |), sh AS (
       |  SELECT qid, vec_id FROM (
       |    SELECT qid, vec_id,
       |           row_number() OVER (PARTITION BY qid ORDER BY hd, vec_id) AS srn
       |    FROM sc) WHERE srn <= $shortN
       |), s2 AS (
       |  SELECT sh.qid, sh.vec_id,
       |    list_reduce(list_prepend(0.0,
       |      list_transform(range(1, len(qn.e) + 1), i -> qn.e[i] * cn.e[i])),
       |      (acc, p) -> acc + p) / (qn.nrm * cn.nrm) AS sim
       |  FROM sh JOIN n qn ON qn.vec_id = sh.qid
       |  JOIN n cn ON cn.vec_id = sh.vec_id
       |), r AS (
       |  SELECT qid, vec_id, sim,
       |         CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS BIGINT) AS rn
       |  FROM s2
       |)
       |SELECT qid, vec_id, sim, rn FROM r WHERE rn <= 10""".stripMargin
  }

  /** The q_random_walk replay CTE chain (ranked adjacency + per-step
    * fnv/mix coin + rank join), shared verbatim by the q_walk_pairs
    * oracle so the two can never replay different walks. */
  private def rwOracleCtes: String = {
    val stepCtes = (1 to operators.Graphs.RwSteps).map { k =>
      s"""h${k}0 AS (
         |  SELECT start, node,
         |    list_reduce(list_prepend(CAST(2166136261 AS BIGINT),
         |      ${utf8BytesSql(s"CAST(start AS VARCHAR) || '_${k - 1}_' || CAST(node AS VARCHAR)")}),
         |      (h, c) -> (xor(h, c) * 16777619) % 4294967296) AS h
         |  FROM w${k - 1}
         |), h${k}1 AS (
         |  SELECT start, node, (xor(h >> 16, h) * 73244475) % 4294967296 AS h FROM h${k}0
         |), h${k}2 AS (
         |  SELECT start, node, (xor(h >> 16, h) * 73244475) % 4294967296 AS h FROM h${k}1
         |), w$k AS (
         |  SELECT q.start, e.dst AS node
         |  FROM h${k}2 q
         |  JOIN dg ON dg.src = q.node
         |  JOIN e ON e.src = q.node AND e.rnk = xor(q.h >> 16, q.h) % dg.d
         |)""".stripMargin
    }.mkString(", ")
    s"""lp AS MATERIALIZED (
       |  SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst
       |  FROM lineitem
       |), e0 AS (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT src, dst FROM lp UNION ALL SELECT dst AS src, src AS dst FROM lp)
       |), e AS MATERIALIZED (
       |  SELECT src, dst,
       |         CAST(row_number() OVER (PARTITION BY src ORDER BY dst) AS BIGINT) - 1 AS rnk
       |  FROM e0
       |), dg AS MATERIALIZED (
       |  SELECT src, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY src
       |), w0 AS (
       |  SELECT src AS start, src AS node FROM dg
       |), $stepCtes""".stripMargin
  }

  private def rwOracleUnions: String =
    (0 to operators.Graphs.RwSteps).map(k =>
      s"SELECT start, CAST($k AS BIGINT) AS step, node FROM w$k")
      .mkString("\nUNION ALL\n")

  /** The shared CC-closure CTE chain (exhaustive J ≥ 0.8 pair graph →
    * recursive reachability) — the body of [[ccOracle]], also composed
    * into the q_split_leakage oracle. */
  private def ccCtes: String =
    s"""toks AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '$Ws'), x -> x != '') AS ts
       |  FROM documents
       |), sh AS (
       |  SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
       |  FROM toks, unnest(range(1, len(ts) - 1)) AS u(i)
       |  WHERE len(ts) >= 3
       |), sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |iv AS (
       |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS ic
       |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id
       |), pairs AS (
       |  SELECT da, db
       |  FROM iv JOIN sz x ON da = x.doc_id JOIN sz y ON db = y.doc_id
       |  WHERE CAST(ic AS DOUBLE) / (x.n + y.n - ic) >= 0.8
       |), edges AS (
       |  SELECT da AS u, db AS v FROM pairs
       |  UNION ALL SELECT db, da FROM pairs
       |), reach AS (
       |  SELECT DISTINCT u AS node, u AS r FROM edges
       |  UNION
       |  SELECT e.u AS node, t.r FROM edges e JOIN reach t ON e.v = t.node
       |)""".stripMargin

  private def ccOracle: String =
    s"""WITH RECURSIVE $ccCtes
       |SELECT node AS doc_id, min(r) AS comp FROM reach GROUP BY node""".stripMargin

  /** Oracle for q_split_leakage: the CC labels ([[ccCtes]], the
    * q_dedup_cc truth) left-joined onto documents, split key =
    * COALESCE(comp, doc_id), then the q_split FNV bucket rule over the
    * CLUSTER key — same fold, same modulus. */
  private def splitLeakageOracle: String =
    s"""WITH RECURSIVE $ccCtes,
       |comp AS (SELECT node AS doc_id, min(r) AS comp FROM reach GROUP BY node),
       |k AS (
       |  SELECT d.doc_id, d.lang, COALESCE(c.comp, d.doc_id) AS cluster
       |  FROM documents d LEFT JOIN comp c USING (doc_id)
       |), g AS (
       |  SELECT doc_id, lang, cluster,
       |    list_reduce(list_prepend(CAST(2166136261 AS BIGINT),
       |      ${utf8BytesSql("CAST(cluster AS VARCHAR)")}),
       |      (h, c) -> (xor(h, c) * 16777619) % 4294967296) AS h
       |  FROM k
       |)
       |SELECT doc_id, lang, cluster,
       |       CASE WHEN h % 10 = 0 THEN 'val' ELSE 'train' END AS split
       |FROM g""".stripMargin
}
