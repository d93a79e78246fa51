package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Events, Tpch}
import graft.merge.{MergePipeline, MergeQueries, OrchestratorQueries}
import graft.text.TextAnalysis
import graft.dedup.Dedup
import graft.similarity.Knn
import graft.multimodal.Media

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  * Each `queries` entry is one operator/capability; `oracleSql` holds
  * the DuckDB-equivalent SQL the driver uses for the correctness gate.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Tpch.q1(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary"   -> (Tpch.q1 _),
    "q3_shipping_priority" -> (Tpch.q3 _),
    "q4_order_priority"    -> (Tpch.q4 _),
    "q5_local_supplier"    -> (Tpch.q5 _),
    "q6_forecast_revenue"  -> (Tpch.q6 _),
    "q10_returned_items"   -> (Tpch.q10 _),
    "q12_priority_class"   -> (Tpch.q12 _),
    "q13_cust_dist"        -> (Tpch.q13CustDist _),
    "q14_promo_revenue"    -> (Tpch.q14 _),
    "q15_top_supplier"     -> (Tpch.q15TopSupplier _),
    "q16_supplier_cnt"     -> (Tpch.q16SupplierCnt _),
    "q17_small_qty"        -> (Tpch.q17SmallQty _),
    "q18_large_orders"     -> (Tpch.q18 _),
    "q19_disjunctive"      -> (Tpch.q19 _),
    "q20_count_distinct"   -> (Tpch.q20 _),
    "q21_exists_combo"     -> (Tpch.q21 _),
    "q22_rollup"           -> (Tpch.q22Rollup _),
    "q23_pivot"            -> (Tpch.q23Pivot _),
    "q24_above_avg"        -> (Tpch.q24AboveAvg _),
    "j1_salted_join"       -> (Tpch.j1SaltedJoin _),
    "w1_topk_per_group"    -> (Tpch.w1TopkPerGroup _),
    "w2_running_total"     -> (Tpch.w2RunningTotal _),
    "w3_moving_avg"        -> (Tpch.w3MovingAvg _),
    "m1_consolidate_meta"  -> (MergeQueries.m1Consolidate _),
    "m2_remap_fk"          -> (MergeQueries.m2RemapFk _),
    "m3_uuid_collision"    -> (MergeQueries.m3UuidCollision _),
    "m4_orphan_check"      -> (MergeQueries.m4OrphanCheck _),
    "m5_exclude_moved"     -> (MergeQueries.m5ExcludeMoved _),
    "m6_audit_counts"      -> (MergeQueries.m6AuditCounts _),
    "m7_merge_pipeline"    -> (MergePipeline.m7Merge _),
    "m8_upsert_latest"     -> (MergeQueries.m8UpsertLatest _),
    "m9_seq_assign"        -> (MergeQueries.m9SeqAssign _),
    "m10_setunion_merge"   -> (MergeQueries.m10SetUnion _),
    "m11_selfref_remap"    -> (MergeQueries.m11SelfRefRemap _),
    "m12_consolidate_fkmapped" -> (MergeQueries.m12ConsolidateMapped _),
    "m13_full_pipeline"    -> (OrchestratorQueries.m13FullPipeline _),
    "m14_dry_run"          -> (OrchestratorQueries.m14DryRun _),
    "m15_uuid_regen"       -> (OrchestratorQueries.m15UuidRegen _),
    "e1_windowed_agg"      -> (Events.e1WindowedAgg _),
    "e2_sessionize"        -> ((s, d) => Events.e2Sessionize(s, d)),
    "e3_event_funnel"      -> (Events.e3Funnel _),
    "e4_json_extract"      -> (Events.e4JsonExtract _),
    "e5_last_touch"        -> (Events.e5LastTouch _),
    "e6_asof_join"         -> (Events.e6AsofJoin _),
    "e7_range_join"        -> (Events.e7RangeJoin _),
    "d1_exact_dedup"       -> (Dedup.d1Exact _),
    "d2_minhash_lsh"       -> ((s, d) => Dedup.d2MinhashLsh(s, d)),
    "d3_simhash"           -> ((s, d) => Dedup.d3Simhash(s, d)),
    "d4_ngram_jaccard"     -> ((s, d) => Dedup.d4NgramJaccard(s, d)),
    "d5_embedding_neardup" -> ((s, d) => Dedup.d5EmbeddingNearDup(s, d)),
    "d6_incremental_dedup" -> (Dedup.d6IncrementalDedup _),
    "s1_knn_brute"         -> ((s, d) => Knn.s1Brute(s, d)),
    "s2_knn_ivf"           -> ((s, d) => Knn.s2Ivf(s, d)),
    "s3_embed_cluster"     -> ((s, d) => Knn.s3Cluster(s, d)),
    "t1_lang_id"           -> (TextAnalysis.t1LangId _),
    "t2_quality_score"     -> (TextAnalysis.t2QualityScore _),
    "t3_token_count"       -> (TextAnalysis.t3TokenCount _),
    "t4_fingerprint"       -> (TextAnalysis.t4Fingerprint _),
    "t5_stable_split"      -> (TextAnalysis.t5StableSplit _),
    "t6_vocab_stats"       -> (TextAnalysis.t6VocabStats _),
    "t7_repetition"        -> (TextAnalysis.t7Repetition _),
    "t8_balanced_sample"   -> ((s, d) => TextAnalysis.t8BalancedSample(s, d)),
    "mm1_media_stats"      -> (Media.mm1MediaStats _),
    "mm2_frame_sample"     -> ((s, d) => Media.mm2FrameSample(s, d)),
  )

  /** DuckDB oracle SQL per query (same parquet tables, bare names). */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary"   -> Tpch.q1Sql,
    "q3_shipping_priority" -> Tpch.q3Sql,
    "q4_order_priority"    -> Tpch.q4Sql,
    "q5_local_supplier"    -> Tpch.q5Sql,
    "q6_forecast_revenue"  -> Tpch.q6Sql,
    "q10_returned_items"   -> Tpch.q10Sql,
    "q12_priority_class"   -> Tpch.q12Sql,
    "q13_cust_dist"        -> Tpch.q13Sql,
    "q14_promo_revenue"    -> Tpch.q14Sql,
    "q15_top_supplier"     -> Tpch.q15Sql,
    "q16_supplier_cnt"     -> Tpch.q16Sql,
    "q17_small_qty"        -> Tpch.q17Sql,
    "q18_large_orders"     -> Tpch.q18Sql,
    "q19_disjunctive"      -> Tpch.q19Sql,
    "q20_count_distinct"   -> Tpch.q20Sql,
    "q21_exists_combo"     -> Tpch.q21Sql,
    "q22_rollup"           -> Tpch.q22Sql,
    "q23_pivot"            -> Tpch.q23Sql,
    "q24_above_avg"        -> Tpch.q24Sql,
    "j1_salted_join"       -> Tpch.j1Sql,
    "w1_topk_per_group"    -> Tpch.w1Sql,
    "w2_running_total"     -> Tpch.w2Sql,
    "w3_moving_avg"        -> Tpch.w3Sql,
    "m1_consolidate_meta"  -> MergeQueries.m1Sql,
    "m2_remap_fk"          -> MergeQueries.m2Sql,
    "m3_uuid_collision"    -> MergeQueries.m3Sql,
    "m4_orphan_check"      -> MergeQueries.m4Sql,
    "m5_exclude_moved"     -> MergeQueries.m5Sql,
    "m6_audit_counts"      -> MergeQueries.m6Sql,
    "m7_merge_pipeline"    -> MergePipeline.m7Sql,
    "m8_upsert_latest"     -> MergeQueries.m8Sql,
    "m9_seq_assign"        -> MergeQueries.m9Sql,
    "m10_setunion_merge"   -> MergeQueries.m10Sql,
    "m11_selfref_remap"    -> MergeQueries.m11Sql,
    "m12_consolidate_fkmapped" -> MergeQueries.m12Sql,
    "m13_full_pipeline"    -> OrchestratorQueries.m13Sql,
    "m14_dry_run"          -> OrchestratorQueries.m14Sql,
    "m15_uuid_regen"       -> OrchestratorQueries.m15Sql,
    "e1_windowed_agg"      -> Events.e1Sql,
    "e2_sessionize"        -> Events.e2Sql,
    "e3_event_funnel"      -> Events.e3Sql,
    "e4_json_extract"      -> Events.e4Sql,
    "e5_last_touch"        -> Events.e5Sql,
    "e6_asof_join"         -> Events.e6Sql,
    "e7_range_join"        -> Events.e7Sql,
    "d1_exact_dedup"       -> Dedup.d1Sql,
    "d2_minhash_lsh"       -> Dedup.d2Sql,
    "d3_simhash"           -> Dedup.d3Sql,
    "d4_ngram_jaccard"     -> Dedup.d4Sql,
    "d5_embedding_neardup" -> Dedup.d5Sql,
    "d6_incremental_dedup" -> Dedup.d6Sql,
    "s1_knn_brute"         -> Knn.s1Sql,
    "s2_knn_ivf"           -> Knn.s2Sql,
    "t1_lang_id"           -> TextAnalysis.t1Sql,
    "t2_quality_score"     -> TextAnalysis.t2Sql,
    "t3_token_count"       -> TextAnalysis.t3Sql,
    "t4_fingerprint"       -> TextAnalysis.t4Sql,
    "t5_stable_split"      -> TextAnalysis.t5Sql,
    "t6_vocab_stats"       -> TextAnalysis.t6Sql,
    "t7_repetition"        -> TextAnalysis.t7Sql,
    "t8_balanced_sample"   -> TextAnalysis.t8Sql,
    "mm1_media_stats"      -> Media.mm1Sql,
    "mm2_frame_sample"     -> Media.mm2Sql,
    // rows-only (documented in SURVEY §2): s3_embed_cluster — k-means
    // isn't reasonably expressible in ANSI SQL; ScalaTest pins its
    // behavior (seed, k, determinism, coverage) instead.
  )
}
