package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{CoreQueries, PipelineQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator has a `queries` entry; everything
  * SQL-expressible also has a DuckDB-dialect `oracleSql` entry with
  * IDENTICAL output column names and a total ORDER BY (the driver sorts
  * columns by name and hashes values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q05JoinAgg(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_filter_project" -> (CoreQueries.q01FilterProject _),
    "q02_hash_agg" -> (CoreQueries.q02HashAgg _),
    "q03_pricing_summary" -> (CoreQueries.q03PricingSummary _),
    "q04_in_between" -> (CoreQueries.q04InBetween _),
    "q05_join_agg" -> (CoreQueries.q05JoinAgg _),
    "q06_broadcast_dims" -> (CoreQueries.q06BroadcastDims _),
    "q07_left_outer" -> (CoreQueries.q07LeftOuter _),
    "q08_anti_join" -> (CoreQueries.q08AntiJoin _),
    "q09_theta_residual" -> (CoreQueries.q09ThetaResidual _),
    "q10_asof_latest" -> (CoreQueries.q10AsOfLatest _),
    "q11_distinct" -> (CoreQueries.q11Distinct _),
    "q12_distinct_card" -> (CoreQueries.q12DistinctCardinality _),
    "q12_approx_distinct" -> (CoreQueries.q12ApproxDistinct _),
    "q13_rollup" -> (CoreQueries.q13Rollup _),
    "q14_rank_window" -> (CoreQueries.q14RankWindow _),
    "q15_analytic_frame" -> (CoreQueries.q15AnalyticFrame _),
    "q16_topk" -> (CoreQueries.q16TopK _),
    "q17_intersect" -> (CoreQueries.q17Intersect _),
    "q18_string_fns" -> (CoreQueries.q18StringFns _),
    "q19_date_fns" -> (CoreQueries.q19DateFns _),
    "q20_math_fns" -> (CoreQueries.q20MathFns _),
    "q21_array_fns" -> (CoreQueries.q21ArrayFns _),
    "q22_json" -> (CoreQueries.q22Json _),
    "q23_tumbling_window" -> (CoreQueries.q23TumblingWindow _),
    "q24_weighted_mean_udaf" -> (CoreQueries.q24WeightedMeanUdaf _),
    "q25_dedup_exact" -> (CoreQueries.q25DedupExact _),
    "q26_cosine_topk" -> (CoreQueries.q26CosineTopK _),
    "q27_text_analysis" -> (CoreQueries.q27TextAnalysis _),
    "q28_token_stats" -> (PipelineQueries.q28TokenStats _),
    "q29_lang_id" -> (PipelineQueries.q29LangId _),
    "q30_quality" -> (PipelineQueries.q30Quality _),
    "q31_fingerprint" -> (PipelineQueries.q31Fingerprint _),
    "q32_jaccard_pairs" -> (PipelineQueries.q32JaccardPairs _),
    "q33_minhash_lsh" -> (PipelineQueries.q33MinHashLsh _),
    "q34_simhash_pairs" -> (PipelineQueries.q34SimHashPairs _),
    "q35_embedding_neardup" -> (PipelineQueries.q35EmbeddingNearDup _),
    "q36_ann" -> (PipelineQueries.q36Ann _),
    "q37_cube" -> (CoreQueries.q37Cube _),
    "q38_sessionize" -> (CoreQueries.q38Sessionize _),
    "q39_percentiles" -> (CoreQueries.q39Percentiles _),
    "q40_asof_join" -> (CoreQueries.q40AsOfJoin _),
    "q41_semi_join" -> (CoreQueries.q41SemiJoin _),
    "q42_pivot" -> (CoreQueries.q42Pivot _),
    "q43_explode" -> (CoreQueries.q43Explode _),
    "q44_ntile" -> (CoreQueries.q44Ntile _),
    "q45_approx_percentiles" -> (CoreQueries.q45ApproxPercentiles _),
    "q46_neardup_clusters" -> (PipelineQueries.q46NearDupClusters _),
    "q47_pipeline_e2e" -> (PipelineQueries.q47PipelineE2e _),
    "q49_embedding_clusters" -> (PipelineQueries.q49EmbeddingClusters _),
    "q50_token_topk" -> (PipelineQueries.q50TokenTopK _),
    "q51_knn_join" -> (PipelineQueries.q51KnnJoin _),
    "q52_pii_redact" -> (PipelineQueries.q52PiiRedact _),
    "q53_decontaminate" -> (PipelineQueries.q53Decontaminate _),
    "q54_pack" -> (PipelineQueries.q54Pack _),
    "q55_sample" -> (PipelineQueries.q55Sample _),
    "q56_quantize" -> (PipelineQueries.q56Quantize _),
    "q59_dedup_corpus" -> (PipelineQueries.q59DedupCorpus _),
    "q60_cross_dedup" -> (PipelineQueries.q60CrossDedup _),
    "q61_mix" -> (PipelineQueries.q61Mix _),
    "q62_repetition" -> (PipelineQueries.q62Repetition _),
    "q63_containment" -> (PipelineQueries.q63Containment _),
    // _check queries: oracle-checkable bound contracts for the approximate
    // operators (booleans computed in Spark vs their exact twins; constant
    // truth on the DuckDB side). Excluded from Bench by the _check suffix.
    "q12_check_hll" -> (CoreQueries.q12CheckHll _),
    "q34_check_precision" -> (PipelineQueries.q34CheckPrecision _),
    "q36_check_recall" -> (CoreQueries.q36CheckRecall _),
    "q45_check_bound" -> (CoreQueries.q45CheckBound _),
    "q48_check_lsh_neardup" -> (PipelineQueries.q48CheckLshNearDup _),
    "q51_check_knn_ivf" -> (PipelineQueries.q51CheckKnnIvf _),
    "q57_check_quant_cos" -> (PipelineQueries.q57CheckQuantCos _),
    "q58_check_ivf_store" -> (PipelineQueries.q58CheckIvfStore _),
    "q64_check_cross_vectors" -> (PipelineQueries.q64CheckCrossVectors _),
    "q65_check_bloom_decontam" -> (PipelineQueries.q65CheckBloomDecontam _),
    "q66_topics" -> (PipelineQueries.q66Topics _),
    "q66_check_topics" -> (PipelineQueries.q66CheckTopics _),
    "q67_surprisal" -> (PipelineQueries.q67Surprisal _),
    "q68_curate" -> (PipelineQueries.q68Curate _),
    "q69_check_bpe" -> (PipelineQueries.q69CheckBpe _),
    "q70_clean" -> (PipelineQueries.q70Clean _),
    "q71_project" -> (PipelineQueries.q71Project _),
    "q72_bigram_nll" -> (PipelineQueries.q72BigramNll _),
    "q73_zorder" -> (PipelineQueries.q73Zorder _),
    "q74_split" -> (PipelineQueries.q74Split _),
    "q75_funnel" -> (PipelineQueries.q75Funnel _),
    "q76_retention" -> (PipelineQueries.q76Retention _),
    "q77_passages" -> (PipelineQueries.q77Passages _),
    "q78_cross_passages" -> (PipelineQueries.q78CrossPassages _),
    "q79_redact_passages" -> (PipelineQueries.q79RedactPassages _),
    "q80_gopher_rules" -> (PipelineQueries.q80Gopher _),
    "q81_dsir" -> (PipelineQueries.q81Dsir _),
    "q82_semdedup" -> (PipelineQueries.q82SemDedup _),
    "q82_check_semdedup" -> (PipelineQueries.q82CheckSemDedup _),
    "q83_ccnet_buckets" -> (PipelineQueries.q83CcnetBuckets _),
    "q84_quality_classifier" -> (PipelineQueries.q84QualityClassifier _),
    "q85_domain_stats" -> (PipelineQueries.q85DomainStats _),
    "q86_cms_heavy_hitters" -> (PipelineQueries.q86CmsHeavyHitters _),
    "q86_check_cms" -> (PipelineQueries.q86CheckCms _),
    "q87_bm25" -> (PipelineQueries.q87Bm25 _),
    "q88_corpus_diagnostics" -> (PipelineQueries.q88CorpusDiagnostics _),
    "q89_margin_pairs" -> (PipelineQueries.q89MarginPairs _),
    "q90_prototypicality" -> (PipelineQueries.q90PrototypicalityPrune _),
    "q90_check_prune" -> (PipelineQueries.q90CheckPrune _),
    "q91_chunks" -> (PipelineQueries.q91Chunks _),
    "q92_stratified_exact_k" -> (PipelineQueries.q92StratifiedExactK _),
    "q93_kcenter" -> (PipelineQueries.q93KCenter _),
    "q93_check_kcenter" -> (PipelineQueries.q93CheckKCenter _),
    "q94_pipeline_v2" -> (PipelineQueries.q94PipelineV2 _),
    "q95_check_ivf_append" -> (PipelineQueries.q95CheckIvfAppend _),
    "q96_normalize" -> (PipelineQueries.q96Normalize _),
    "q97_temperature_mix" -> (PipelineQueries.q97TemperatureMix _),
    "q98_detect_format" -> (PipelineQueries.q98DetectFormat _),
    "q99_tfidf_keywords" -> (PipelineQueries.q99TfidfKeywords _),
    "q100_pipeline_v3" -> (PipelineQueries.q100PipelineV3 _),
    "q101_check_ivf_rebuild" -> (PipelineQueries.q101CheckIvfRebuild _),
    "q102_blocklist_curate" -> (PipelineQueries.q102BlocklistCurate _),
    "q103_line_dedup" -> (PipelineQueries.q103LineDedup _),
    "q104_check_bpe_mix" -> (PipelineQueries.q104CheckBpeMix _),
    "q105_pipeline_v4" -> (PipelineQueries.q105PipelineV4 _),
    "q106_pii_validate" -> (PipelineQueries.q106PiiValidate _),
    "q107_strip_boilerplate" -> (PipelineQueries.q107StripBoilerplate _),
    "q108_check_fertility" -> (PipelineQueries.q108CheckFertility _),
    "q109_training_shards" -> (PipelineQueries.q109TrainingShards _),
    "q110_url_dedup" -> (PipelineQueries.q110UrlDedup _),
    "q111_repeat_allocation" -> (PipelineQueries.q111RepeatAllocation _),
    "q112_scd2_history" -> (PipelineQueries.q112Scd2History _),
    "q113_mmr_rerank" -> (PipelineQueries.q113MmrRerank _),
    "q113_check_mmr" -> (PipelineQueries.q113CheckMmr _),
    "q114_calibration" -> (PipelineQueries.q114Calibration _),
    "q115_domain_pagerank" -> (PipelineQueries.q115DomainPagerank _),
    "q116_leakage_safe_splits" -> (PipelineQueries.q116LeakageSafeSplits _),
    "q117_dedup_sweep" -> (PipelineQueries.q117DedupSweep _),
    "q118_badword_gate" -> (PipelineQueries.q118BadwordGate _),
    "q119_hybrid_rrf" -> (PipelineQueries.q119HybridRrf _),
    "q120_scd2_merge" -> (PipelineQueries.q120Scd2Merge _),
    "q121_snapshot_diff" -> (PipelineQueries.q121SnapshotDiff _),
    "q122_nb_langid" -> (PipelineQueries.q122NbLangid _),
    "q123_pipeline_v5" -> (PipelineQueries.q123PipelineV5 _),
    "q124_scd2_asof" -> (PipelineQueries.q124Scd2AsOf _),
    "q125_packed_sequences" -> (PipelineQueries.q125PackedSequences _),
    "q126_rerank" -> (PipelineQueries.q126Rerank _),
    "q126_check_rerank" -> (PipelineQueries.q126CheckRerank _),
    "q127_quality_quantile" -> (PipelineQueries.q127QualityQuantile _),
    "q128_attribute_sheet" -> (PipelineQueries.q128AttributeSheet _),
    "q129_url_param_sort" -> (PipelineQueries.q129UrlParamSort _),
    "q130_check_takedown" -> (PipelineQueries.q130CheckTakedown _),
    "q131_check_attr_upkeep" -> (PipelineQueries.q131CheckAttrUpkeep _),
    "q132_check_dedup_aliases" -> (PipelineQueries.q132CheckDedupAliases _),
    "q133_probe_sweep" -> (PipelineQueries.q133ProbeSweep _),
    "q133_check_probe_sweep" -> (PipelineQueries.q133CheckProbeSweep _),
    "q134_url_percent" -> (PipelineQueries.q134UrlPercent _),
    "q135_check_pq" -> (PipelineQueries.q135CheckPq _),
    "q136_check_unigram" -> (PipelineQueries.q136CheckUnigram _),
    "q142_check_opq" -> (PipelineQueries.q142CheckOpq _),
    "q143_ivm_agg" -> (PipelineQueries.q143IvmAgg _),
    "q144_check_distinct_view" -> (PipelineQueries.q144CheckDistinctView _),
    "q145_ivm_minmax" -> (PipelineQueries.q145IvmMinMax _),
    "q146_ivm_join" -> (PipelineQueries.q146IvmJoin _),
    "q147_text_index" -> (PipelineQueries.q147TextIndex _),
    "q148_phrase_search" -> (PipelineQueries.q148PhraseSearch _),
    "q149_ivm_topk" -> (PipelineQueries.q149IvmTopK _),
    "q150_store_sql" -> (PipelineQueries.q150StoreSql _),
    "q151_check_ivfadc" -> (PipelineQueries.q151CheckIvfadc _),
    "q152_check_quantile_view" -> (PipelineQueries.q152CheckQuantileView _),
    "q153_slop_search" -> (PipelineQueries.q153SlopSearch _),
    "q154_stop_search" -> (PipelineQueries.q154StopSearch _),
    "q155_check_porter" -> (PipelineQueries.q155CheckPorter _),
    "q156_skip_sql" -> (PipelineQueries.q156SkipSql _),
    "q157_gap_slop" -> (PipelineQueries.q157GapSlop _),
    "q158_check_store_stream" -> (PipelineQueries.q158CheckStoreStream _),
    "q159_check_store_catalog" -> (PipelineQueries.q159CheckStoreCatalog _),
    "q160_store_asof" -> (PipelineQueries.q160StoreAsof _),
    "q161_cluster_sql" -> (PipelineQueries.q161ClusterSql _),
    "q162_sql_optimize" -> (PipelineQueries.q162SqlOptimize _),
    "q165_check_ivm_tail" -> (PipelineQueries.q165CheckIvmTail _),
    "q166_sql_clone" -> (PipelineQueries.q166SqlClone _),
    "q163_sql_delete" -> (PipelineQueries.q163SqlDelete _),
    "q164_sql_vacuum" -> (PipelineQueries.q164SqlVacuum _),
    "q137_drift_sheet" -> (PipelineQueries.q137DriftSheet _),
    "q138_lang_segments" -> (PipelineQueries.q138LangSegments _),
    "q139_check_bfd" -> (PipelineQueries.q139CheckBfd _),
    "q140_pipeline_v6" -> (PipelineQueries.q140PipelineV6 _),
    "q141_hard_negatives" -> (PipelineQueries.q141HardNegatives _)
  )

  def oracleSql: Map[String, String] = Map(
    "q01_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_returnflag = 'R' AND l_quantity > 45
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q02_hash_agg" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
        |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sq,
        |  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 2) AS ap
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q03_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS rev,
        |  COUNT(*) AS cnt
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q04_in_between" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
        |WHERE o_orderpriority IN ('1-URGENT','2-HIGH') AND o_totalprice BETWEEN 1000 AND 2000
        |ORDER BY o_orderkey""".stripMargin,
    "q05_join_agg" ->
      """SELECT n_name,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS rev
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY rev DESC, n_name""".stripMargin,
    "q06_broadcast_dims" ->
      """SELECT r_name, COUNT(*) AS suppliers FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q07_left_outer" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders FROM customer
        |LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY n_orders DESC, c_custkey LIMIT 100""".stripMargin,
    "q08_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q09_theta_residual" ->
      """SELECT p_brand, COUNT(*) AS n FROM part
        |JOIN lineitem ON l_partkey = p_partkey AND l_quantity > p_size
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q10_asof_latest" ->
      """SELECT user_id, event_type FROM (
        |  SELECT user_id, event_type,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events WHERE ts < TIMESTAMP '2024-01-10 00:00:00') t
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q11_distinct" ->
      """SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS dc
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q12_distinct_card" ->
      "SELECT COUNT(DISTINCT user_id) AS du FROM events",
    "q13_rollup" ->
      """SELECT COALESCE(n_name, 'ALL') AS nation, COALESCE(o_orderstatus, 'ALL') AS st,
        |  COUNT(*) AS cnt
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP(n_name, o_orderstatus)
        |ORDER BY nation, st""".stripMargin,
    "q14_rank_window" ->
      """SELECT n_name, c_custkey, rnk FROM (
        |  SELECT n_name, c_custkey,
        |    RANK() OVER (PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey) AS rnk
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey) t
        |WHERE rnk <= 3 ORDER BY n_name, rnk, c_custkey""".stripMargin,
    "q15_analytic_frame" ->
      """SELECT user_id, event_id,
        |  CAST(v - COALESCE(LAG(v, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id), 0) AS DOUBLE) AS delta,
        |  CAST(SUM(v) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rsum
        |FROM (SELECT user_id, event_id, ts, CAST(value AS DECIMAL(18,2)) AS v
        |      FROM events WHERE user_id < 20) s
        |ORDER BY user_id, event_id""".stripMargin,
    "q16_topk" ->
      """SELECT o_orderkey, ROUND(o_totalprice, 2) AS p FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin,
    "q17_intersect" ->
      """SELECT c_nationkey AS k FROM customer
        |INTERSECT SELECT s_nationkey AS k FROM supplier ORDER BY k""".stripMargin,
    "q18_string_fns" ->
      """SELECT p_partkey, UPPER(SUBSTR(p_name, 1, 8)) AS u, CAST(LENGTH(p_name) AS BIGINT) AS l
        |FROM part WHERE p_name LIKE '%red%' ORDER BY p_partkey""".stripMargin,
    "q19_date_fns" ->
      """SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS m, COUNT(*) AS cnt
        |FROM orders GROUP BY 1 ORDER BY m""".stripMargin,
    "q20_math_fns" ->
      """SELECT l_linenumber,
        |  ROUND(SQRT(CAST(SUM(CAST(l_discount AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)), 4) AS d
        |FROM lineitem GROUP BY l_linenumber ORDER BY l_linenumber""".stripMargin,
    "q21_array_fns" ->
      """SELECT label, CAST(len(embedding) AS BIGINT) AS dim, COUNT(*) AS n
        |FROM embeddings GROUP BY label, len(embedding) ORDER BY label, dim""".stripMargin,
    "q22_json" ->
      """SELECT event_type,
        |  ROUND(AVG(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 2) AS ak
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q23_tumbling_window" ->
      """SELECT CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS w, event_type, COUNT(*) AS cnt,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sv
        |FROM events WHERE ts < TIMESTAMP '2024-01-03 00:00:00'
        |GROUP BY 1, 2 ORDER BY w, event_type""".stripMargin,
    "q24_weighted_mean_udaf" ->
      """SELECT l_returnflag,
        |  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |        / CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS wavg
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q25_dedup_exact" ->
      """SELECT lang, source, COUNT(*) AS n FROM
        |  (SELECT DISTINCT text, lang, source FROM documents) t
        |GROUP BY lang, source ORDER BY lang, source""".stripMargin,
    "q26_cosine_topk" ->
      """WITH probe AS (SELECT embedding AS tv FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id,
        |  ROUND(
        |    list_sum(list_transform(list_zip(e.embedding, p.tv),
        |      z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))
        |    / (SQRT(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |       * SQRT(list_sum(list_transform(p.tv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4) AS cos_sim
        |FROM embeddings e, probe p WHERE e.vec_id != 0
        |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin,
    "q27_text_analysis" ->
      """SELECT lang, ROUND(AVG(CAST(n_chars AS DOUBLE)), 2) AS avg_chars,
        |  ROUND(AVG(CAST(len(string_split(text, ' ')) AS DOUBLE)), 2) AS avg_tokens
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q37_cube" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS st, COALESCE(o_orderpriority, 'ALL') AS prio,
        |  COUNT(*) AS cnt
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY st, prio""".stripMargin,
    "q38_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events WHERE user_id < 50),
        |s AS (
        |  SELECT user_id,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM g),
        |c AS (SELECT user_id, session_id, COUNT(*) AS n_events FROM s GROUP BY 1, 2)
        |SELECT user_id, COUNT(*) AS n_sessions, MAX(n_events) AS max_len
        |FROM c GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q39_percentiles" ->
      """SELECT l_returnflag,
        |  ROUND(quantile_cont(l_extendedprice, 0.5), 2) AS p50,
        |  ROUND(quantile_cont(l_extendedprice, 0.9), 2) AS p90
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q40_asof_join" ->
      """WITH p AS (SELECT user_id, event_id, ts FROM events
        |           WHERE user_id < 30 AND event_type = 'purchase'),
        |c AS (SELECT user_id, ts, MAX(event_id) AS click_id FROM events
        |      WHERE user_id < 30 AND event_type = 'click' GROUP BY user_id, ts)
        |SELECT p.user_id, p.event_id, c.click_id
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.user_id, p.event_id""".stripMargin,
    "q41_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q42_pivot" ->
      """SELECT o_orderstatus AS st,
        |  COUNT(*) FILTER (substr(o_orderpriority,1,1) = '1') AS p1,
        |  COUNT(*) FILTER (substr(o_orderpriority,1,1) = '2') AS p2,
        |  COUNT(*) FILTER (substr(o_orderpriority,1,1) = '3') AS p3,
        |  COUNT(*) FILTER (substr(o_orderpriority,1,1) = '4') AS p4,
        |  COUNT(*) FILTER (substr(o_orderpriority,1,1) = '5') AS p5
        |FROM orders GROUP BY o_orderstatus ORDER BY st""".stripMargin,
    "q43_explode" ->
      """WITH e AS (SELECT unnest(range(len(embedding))) AS pos,
        |                  unnest(embedding) AS x FROM embeddings)
        |SELECT CAST(pos AS INT) AS pos, ROUND(AVG(CAST(x AS DOUBLE)), 4) + 0.0 AS ax
        |FROM e GROUP BY 1 ORDER BY pos""".stripMargin,
    "q44_ntile" ->
      """SELECT c_mktsegment, c_custkey,
        |  NTILE(4) OVER w AS quartile,
        |  ROUND(PERCENT_RANK() OVER w, 4) AS pr
        |FROM customer WHERE c_custkey <= 200
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_mktsegment, c_custkey""".stripMargin,
    "q12_check_hll" ->
      """SELECT o_orderstatus, CAST(1 AS BOOLEAN) AS within_bound
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q36_check_recall" ->
      "SELECT 10 AS k, CAST(1 AS BOOLEAN) AS recall_ok",
    "q45_check_bound" ->
      """SELECT l_returnflag, CAST(1 AS BOOLEAN) AS within_bound
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q48_check_lsh_neardup" ->
      """SELECT CAST(x AS BIGINT) AS va, CAST(1 AS BOOLEAN) AS found
        |FROM generate_series(0, 9) AS t(x) ORDER BY va""".stripMargin,
    "q64_check_cross_vectors" ->
      """SELECT CAST(1 AS BOOLEAN) AS planted_ok, CAST(1 AS BOOLEAN) AS recall_ok,
        |CAST(1 AS BOOLEAN) AS precision_ok, CAST(1 AS BOOLEAN) AS survivors_ok""".stripMargin,
    "q65_check_bloom_decontam" ->
      """SELECT CAST(1 AS BOOLEAN) AS planted_ok, CAST(1 AS BOOLEAN) AS superset_ok,
        |CAST(1 AS BOOLEAN) AS inflation_ok""".stripMargin,
    // q66_topics itself is rows-only (assignment depends on
    // Spark-computed centroids); this is its hard contract
    "q66_check_topics" ->
      """SELECT CAST(1 AS BOOLEAN) AS assigned_ok, CAST(1 AS BOOLEAN) AS optimal_ok,
        |CAST(1 AS BOOLEAN) AS used_ok, CAST(1 AS BOOLEAN) AS deterministic_ok""".stripMargin,
    // BPE's merge loop has no tractable SQL twin; this is its audited
    // replay contract (argmax/monotonic/encode/determinism)
    "q69_check_bpe" ->
      """SELECT CAST(1 AS BOOLEAN) AS trained_ok, CAST(1 AS BOOLEAN) AS argmax_ok,
        |CAST(1 AS BOOLEAN) AS monotonic_ok, CAST(1 AS BOOLEAN) AS encode_ok,
        |CAST(1 AS BOOLEAN) AS deterministic_ok""".stripMargin
  ) ++ PipelineQueries.oracles
}
