package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each key in `queries` is one operator from SURVEY.md §2 (or a
  * beyond-reference LLM-pipeline operator); `oracleSql` holds the
  * equivalent DuckDB SQL the driver hash-compares against at sf0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    TimeSeries.tvl(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts_tvl"             -> (TimeSeries.tvl _),
    "ts_gotk"            -> (TimeSeries.gotk _),
    "ts_total_return"    -> (TimeSeries.totalReturn _),
    "ts_trailing_return" -> (TimeSeries.trailingReturn _),
    "ts_interpolate"     -> (TimeSeries.interpolate _),
    "risk"               -> (Risk.risk _),
    "rel_scan_filter"    -> (Relational.scanFilter _),
    "rel_scalar_agg"     -> (Relational.scalarAgg _),
    "rel_pricing_summary" -> (Relational.pricingSummary _),
    "rel_top_customers"  -> (Relational.topCustomers _),
    "rel_region_revenue" -> (Relational.regionRevenue _),
    "rel_semi_join"      -> (Relational.semiJoin _),
    "rel_anti_join"      -> (Relational.antiJoin _),
    "rel_left_join_fill" -> (Relational.leftJoinFill _),
    "rel_window_rank"    -> (Relational.windowRank _),
    "rel_minmax_by"      -> (Relational.minMaxBy _),
    "rel_top_latest"     -> (Relational.topLatest _),
    "rel_rollup"         -> (Relational.rollupRevenue _),
    "rel_cube"           -> (Relational.cubeRevenue _),
    "rel_ntile"          -> (Relational.ntileRevenue _),
    "rel_setops"         -> (Relational.setOps _),
    "rel_quantiles"      -> (Relational.quantiles _),
    "rel_pivot"          -> (Relational.pivotRevenue _),
    "rel_unpivot"        -> (Relational.unpivotRevenue _),
    "text_split"         -> (Text.trainValTestSplit _),
    "ev_range_join"      -> (Relational.rangeJoin _),
    "ev_hourly"          -> (Events.hourlyRollup _),
    "ev_json"            -> (Events.jsonExtract _),
    "ev_sessionize"      -> (Events.sessionize _),
    "ev_session_window"  -> (Events.sessionWindows _),
    "ev_approx"          -> (Events.approxSketches _),
    "ev_asof"            -> (Events.asofJoin _),
    "ev_asof_by_key"     -> (Events.asofJoinByKey _),
    "ts_moving_avg"      -> (TimeSeries.movingAverage _),
    "text_langid"        -> (Text.langId _),
    "text_quality"       -> (Text.quality _),
    "text_tokens"        -> (Text.tokenCount _),
    "text_fingerprint"   -> (Text.fingerprint _),
    "text_repetition"    -> (Text.repetition _),
    "dedup_exact"        -> (Dedup.exact _),
    "dedup_prefix"       -> (Dedup.prefix _),
    "dedup_minhash"      -> (Dedup.minhashCandidates _),
    "dedup_minhash_est"  -> (Dedup.minhashEstJaccard _),
    "dedup_jaccard"      -> (Dedup.jaccard _),
    "dedup_simhash"      -> (Dedup.simhash _),
    "dedup_simhash_pairs" -> (Dedup.simhashPairs _),
    "dedup_clusters"     -> (Dedup.clusters _),
    "dedup_apply"        -> (Dedup.applyDedup _),
    "text_decontaminate" -> (Dedup.decontaminate _),
    "text_curate"        -> (Text.curate _),
    "text_vocab"         -> (Text.vocab _),
    "text_sample"        -> (Text.sampleStratified _),
    "text_chunks"        -> (Text.chunks _),
    "sim_topk"           -> (Similarity.bruteForceTopK _),
    "sim_lsh"            -> (Similarity.lshTopK _),
    "sim_ivf"            -> (Similarity.ivfTopK _),
    "sim_neardup"        -> (Similarity.cosineNearDup _),
    "sim_neardup_loose"  -> (Similarity.cosineNearDupLoose _),
    "sim_clusters"       -> (Similarity.nearDupClusters _),
    "sim_clusters_loose" -> (Similarity.nearDupClustersLoose _),
    "sim_centroids"      -> (Similarity.labelCentroids _),
    "mm_meta"            -> (Multimodal.mediaMeta _),
    "mm_decode"          -> (Multimodal.decodeSummary _),
    "mm_frames"          -> (Multimodal.frameSummary _),
    "ts_drawdown"        -> (Drawdown.drawdownQuery _),
    "ts_drawdown_by_segment" -> (Drawdown.drawdownBySegmentQuery _),
    "ts_benchmark"       -> (TimeSeries.benchmarkBuyHold _),
    "ts_gotk_by_segment" -> (TimeSeries.gotkBySegment _),
    "ts_trailing_by_segment" -> (TimeSeries.trailingReturnBySegment _),
    "risk_by_segment"    -> (Risk.riskBySegment _),
    "datamart_summary"   -> (graft.pipelines.Datamart.dimSummary _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "ts_tvl"             -> OracleSql.tsTvl,
    "ts_gotk"            -> OracleSql.tsGotk,
    "ts_total_return"    -> OracleSql.tsTotalReturn,
    "ts_trailing_return" -> OracleSql.tsTrailingReturn,
    "ts_interpolate"     -> OracleSql.tsInterpolate,
    "risk"               -> OracleSql.risk,
    "rel_scan_filter"    -> OracleSql.relScanFilter,
    "rel_scalar_agg"     -> OracleSql.relScalarAgg,
    "rel_pricing_summary" -> OracleSql.relPricingSummary,
    "rel_top_customers"  -> OracleSql.relTopCustomers,
    "rel_region_revenue" -> OracleSql.relRegionRevenue,
    "rel_semi_join"      -> OracleSql.relSemiJoin,
    "rel_anti_join"      -> OracleSql.relAntiJoin,
    "rel_left_join_fill" -> OracleSql.relLeftJoinFill,
    "rel_window_rank"    -> OracleSql.relWindowRank,
    "rel_minmax_by"      -> OracleSql.relMinMaxBy,
    "rel_top_latest"     -> OracleSql.relTopLatest,
    "rel_rollup"         -> OracleSql.relRollup,
    "rel_cube"           -> OracleSql.relCube,
    "rel_ntile"          -> OracleSql.relNtile,
    "rel_setops"         -> OracleSql.relSetOps,
    "rel_quantiles"      -> OracleSql.relQuantiles,
    "rel_pivot"          -> OracleSql.relPivot,
    "rel_unpivot"        -> OracleSql.relUnpivot,
    "text_split"         -> OracleSql.textSplit,
    "ev_range_join"      -> OracleSql.evRangeJoin,
    "ev_hourly"          -> OracleSql.evHourly,
    "ev_json"            -> OracleSql.evJson,
    "ev_sessionize"      -> OracleSql.evSessionize,
    "ev_session_window"  -> OracleSql.evSessionWindow,
    // ev_approx intentionally omitted: sketch internals (HLL,
    // approx-quantile) are engine-specific — driver records the weaker
    // rows-only check; tolerance tests compare against exact values.
    "ev_asof"            -> OracleSql.evAsof,
    "ev_asof_by_key"     -> OracleSql.evAsofByKey,
    "ts_moving_avg"      -> OracleSql.tsMovingAvg,
    "text_langid"        -> OracleSql.textLangId,
    "text_quality"       -> OracleSql.textQuality,
    "text_tokens"        -> OracleSql.textTokens,
    "text_fingerprint"   -> OracleSql.textFingerprint,
    "text_repetition"    -> OracleSql.textRepetition,
    "dedup_exact"        -> OracleSql.dedupExact,
    "dedup_prefix"       -> OracleSql.dedupPrefix,
    "dedup_minhash"      -> OracleSql.dedupMinhash,
    "dedup_minhash_est"  -> OracleSql.dedupMinhashEst,
    "dedup_jaccard"      -> OracleSql.dedupJaccard,
    "dedup_simhash"      -> OracleSql.dedupSimhash,
    "dedup_simhash_pairs" -> OracleSql.dedupSimhashPairs,
    "dedup_clusters"     -> OracleSql.dedupClusters,
    "dedup_apply"        -> OracleSql.dedupApply,
    "text_decontaminate" -> OracleSql.textDecontaminate,
    "text_curate"        -> OracleSql.textCurate,
    "text_vocab"         -> OracleSql.textVocab,
    "text_sample"        -> OracleSql.textSampleStratified,
    "text_chunks"        -> OracleSql.textChunks,
    "sim_topk"           -> OracleSql.simTopK,
    "sim_lsh"            -> OracleSql.simLsh,
    "sim_ivf"            -> OracleSql.simIvf,
    "sim_neardup"        -> OracleSql.simNearDup,
    "sim_neardup_loose"  -> OracleSql.simNearDupLoose,
    "sim_clusters"       -> OracleSql.simClusters,
    "sim_clusters_loose" -> OracleSql.simClustersLoose,
    "sim_centroids"      -> OracleSql.simCentroids,
    // mm_decode IS oracle-checked despite running through
    // mapPartitions: the stub decode is a pure function of md5(text)
    // bytes, which DuckDB reproduces from hex substrings.
    "mm_decode"          -> OracleSql.mmDecode,
    "mm_frames"          -> OracleSql.mmFrames,
    "mm_meta"            -> OracleSql.mmMeta,
    "ts_drawdown"        -> OracleSql.tsDrawdown,
    "ts_drawdown_by_segment" -> OracleSql.tsDrawdownBySegment,
    "ts_benchmark"       -> OracleSql.tsBenchmark,
    "ts_gotk_by_segment" -> OracleSql.tsGotkBySegment,
    "ts_trailing_by_segment" -> OracleSql.tsTrailingReturnBySegment,
    "risk_by_segment"    -> OracleSql.riskBySegment,
    "datamart_summary"   -> OracleSql.datamartSummary
  )
}
