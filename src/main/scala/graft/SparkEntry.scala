package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 (inventory) and §7. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    Engine.configure(spark)
    Relational.q01PricingSummary(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (Relational.q01PricingSummary _),
    "q02_filter_project" -> (Relational.q02FilterProject _),
    "q03_join_agg_topk" -> (Relational.q03JoinAggTopk _),
    "q04_semijoin" -> (Relational.q04Semijoin _),
    "q05_multiway_join" -> (Relational.q05MultiwayJoin _),
    "q06_selective_agg" -> (Relational.q06SelectiveAgg _),
    "q07_antijoin" -> (Relational.q07Antijoin _),
    "q08_window_rank" -> (Relational.q08WindowRank _),
    "q09_window_running" -> (Relational.q09WindowRunning _),
    "q10_distinct_agg" -> (Relational.q10DistinctAgg _),
    "q11_group_having" -> (Relational.q11GroupHaving _),
    "q12_case_agg" -> (Relational.q12CaseAgg _),
    "q13_outerjoin_dist" -> (Relational.q13OuterjoinDist _),
    "q14_union_agg" -> (Relational.q14UnionAgg _),
    "q15_intersect" -> (Relational.q15SetOps _),
    "q16_scalar_subquery" -> (Relational.q16ScalarSubquery _),
    "q17_in_subquery" -> (Relational.q17InSubquery _),
    "q18_rollup" -> (Relational.q18Rollup _),
    "q19_string_funcs" -> (Relational.q19StringFuncs _),
    "q20_date_funcs" -> (Relational.q20DateFuncs _),
    "q21_topk_pergroup" -> (Relational.q21TopkPergroup _),
    "q22_pivot" -> (Relational.q22Pivot _),
    "q23_join_skew_salt" -> (Relational.q23JoinSkewSalt _),
    "q24_cube" -> (Relational.q24Cube _),
    "q25_percentile" -> (Relational.q25Percentile _),
    "q26_grouping_sets" -> (Relational.q26GroupingSets _),
    "q27_ntile_window" -> (Relational.q27NtileWindow _),
    "q28_setops_all" -> (Relational.q28SetOpsAll _),
    "q29_range_window" -> (Relational.q29RangeWindow _),
    "q34_approx_agg" -> (Relational.q34ApproxAgg _),
    "q35_window_suite" -> (Relational.q35WindowSuite _),
    "q36_unpivot" -> (Relational.q36Unpivot _),
    "q37_lateral" -> (Relational.q37Lateral _),
    "q38_latest_per_key" -> (Relational.q38LatestPerKey _),
    "q39_recursive_cal" -> (Relational.q39RecursiveCal _),
    "q40_stats_suite" -> (Relational.q40StatsSuite _),
    "q42_window_extras" -> (Relational.q42WindowExtras _),
    "q44_histogram" -> (Relational.q44Histogram _),
    "q45_mode_per_group" -> (Relational.q45ModePerGroup _),
    "q46_referential_audit" -> (Relational.q46ReferentialAudit _),
    "q47_zorder_key" -> (Relational.q47ZorderKey _),
    "q49_ridge_regression" -> (Relational.q49RidgeRegression _),
    "q50_logistic_regression" -> (Relational.q50LogisticRegression _),
    "q57_lasso" -> (Relational.q57Lasso _),
    "q62_quantile_reg" -> (Relational.q62QuantileReg _),
    "q65_huber" -> (Relational.q65Huber _),
    "q66_relu_mlp" -> (Relational.q66ReluMlp _),
    "q69_mlp_sigmoid" -> (Relational.q69MlpSigmoid _),
    "q63_one_vs_rest" -> (Relational.q63OneVsRest _),
    "q64_poisson_glm" -> (Relational.q64PoissonGlm _),
    "q56_linear_svm" -> (Relational.q56LinearSvm _),
    "q51_kde" -> (Relational.q51Kde _),
    "q30_event_window_agg" -> (Events.q30EventWindowAgg _),
    "q31_sessionize" -> (Events.q31Sessionize _),
    "j04_overlap_join" -> (Joins.j04OverlapJoin _),
    "q32_event_funnel" -> (Events.q32EventFunnel _),
    "q33_json_extract" -> (Events.q33JsonExtract _),
    "q41_retention_cohorts" -> (Events.q41RetentionCohorts _),
    "q43_gaps_islands" -> (Events.q43GapsIslands _),
    "q48_incremental_agg" -> (Events.q48IncrementalAgg _),
    "q52_rolling_anomaly" -> (Events.q52RollingAnomaly _),
    "q53_ks_test" -> (Events.q53KsTest _),
    "q58_ks_uniform" -> (Events.q58KsUniform _),
    "q67_kaplan_meier" -> (Events.q67KaplanMeier _),
    "q68_aft_weibull" -> (Events.q68AftWeibull _),
    "q55_isotonic" -> (Relational.q55Isotonic _),
    "q54_rank_sum" -> (Events.q54RankSum _),
    "q59_t_test" -> (Events.q59TTest _),
    "q60_skew_kurtosis" -> (Relational.q60SkewKurtosis _),
    "q61_hof_suite" -> (Relational.q61HofSuite _),
    "d01_dedup_exact" -> (Dedup.d01DedupExact _),
    "d02_dedup_minhash" -> (Dedup.d02DedupMinhash _),
    "d22_minhash_estimate" -> (Dedup.d22MinhashEstimate _),
    "d03_dedup_simhash" -> (Dedup.d03DedupSimhash _),
    "d04_dedup_ngram" -> (Dedup.d04DedupNgram _),
    "d05_dedup_embedding" -> (Dedup.d05DedupEmbedding _),
    "d09_dedup_containment" -> (Dedup.d09DedupContainment _),
    "d10_dedup_incremental" -> (Dedup.d10DedupIncremental _),
    "d06_contamination" -> (Dedup.d06Contamination _),
    "d12_contamination_bloom" -> (Dedup.d12ContaminationBloom _),
    "d13_chunk_dedup" -> (Dedup.d13ChunkDedup _),
    "d15_dedup_prefix" -> (Dedup.d15DedupPrefix _),
    "d16_dedup_sweep" -> (Dedup.d16DedupSweep _),
    "d17_cross_source_dups" -> (Dedup.d17CrossSourceDups _),
    "d18_match_forensics" -> (Dedup.d18MatchForensics _),
    "d14_dedup_report" -> (Dedup.d14DedupReport _),
    "d07_dedup_clusters" -> (Dedup.d07DedupClusters _),
    "d20_soft_dedup" -> (Dedup.d20SoftDedup _),
    "d21_dedup_tuned" -> (Dedup.d21DedupTuned _),
    "f01_freq_itemsets" -> (Itemsets.f01FreqItemsets _),
    "f02_assoc_rules" -> (Itemsets.f02AssocRules _),
    "f03_itemsets_l3" -> (Itemsets.f03FreqTriples _),
    "f04_seq_patterns" -> (Itemsets.f04SeqPatterns _),
    "f05_itemsets_depth" -> (Itemsets.f05ItemsetsDepth _),
    "d08_dedup_apply" -> (Dedup.d08DedupApply _),
    "p03_mix_sample" -> (Pipeline.p03MixSample _),
    "j01_asof_join" -> (Joins.j01AsofJoin _),
    "j02_range_join" -> (Joins.j02RangeJoin _),
    "j03_nearest_join" -> (Joins.j03NearestJoin _),
    "s01_ann_bruteforce" -> (Similarity.s01AnnBruteforce _),
    "s09_mmr_select" -> (Similarity.s09MmrSelect _),
    "s10_ann_int8" -> (Similarity.s10AnnInt8 _),
    "s11_ann_rerank" -> (Similarity.s11AnnRerank _),
    "s12_ann_index_stats" -> (Similarity.s12AnnIndexStats _),
    "s13_als_recommend" -> (Recommend.s13AlsRecommend _),
    "s14_pq_ann" -> (Similarity.s14PqAnn _),
    "s15_biased_mf" -> (Recommend.s15BiasedMf _),
    "s17_pca" -> (Similarity.s17Pca _),
    "s18_pca_ann" -> (Similarity.s18PcaAnn _),
    "s34_svd" -> (Similarity.s34Svd _),
    "s19_corr_matrix" -> (Similarity.s19CorrMatrix _),
    "s02_ann_lsh" -> (Similarity.s02AnnLsh _),
    "s07_radius_search" -> (Similarity.s07RadiusSearch _),
    "s08_diversity_stats" -> (Similarity.s08DiversityStats _),
    "s03_ann_ivf" -> (Similarity.s03AnnIvf _),
    "s05_knn_join" -> (Similarity.s05KnnJoin _),
    "s20_nn_descent" -> (Similarity.s20NnDescent _),
    "s33_graph_ann" -> (Similarity.s33GraphAnn _),
    "s06_knn_classify" -> (Similarity.s06KnnClassify _),
    "t01_langid" -> (TextAnalysis.t01Langid _),
    "t02_quality_score" -> (TextAnalysis.t02QualityScore _),
    "t03_token_count" -> (TextAnalysis.t03TokenCount _),
    "t04_fingerprint" -> (TextAnalysis.t04Fingerprint _),
    "t05_repetition" -> (TextAnalysis.t05Repetition _),
    "t06_redact_ids" -> (TextAnalysis.t06RedactIds _),
    "t07_vocab" -> (TextAnalysis.t07Vocab _),
    "t08_entropy" -> (TextAnalysis.t08Entropy _),
    "t09_surprisal" -> (TextAnalysis.t09Surprisal _),
    "t15_bigram_bits" -> (TextAnalysis.t15BigramBits _),
    "t16_source_kl" -> (TextAnalysis.t16SourceKl _),
    "t17_keyphrases" -> (TextAnalysis.t17RakeKeyphrases _),
    "t18_bpe_merges" -> (TextAnalysis.t18BpeMerges _),
    "t19_naive_bayes" -> (TextAnalysis.t19NaiveBayes _),
    "t20_decision_stump" -> (TextAnalysis.t20DecisionStump _),
    "t21_bpe_encode" -> (TextAnalysis.t21BpeEncode _),
    "t22_decision_tree" -> (TextAnalysis.t22DecisionTree _),
    "t33_deep_tree" -> (TextAnalysis.t33DeepTree _),
    "t25_random_forest" -> (TextAnalysis.t25RandomForest _),
    "t34_rf_regression" -> (TextAnalysis.t34RfRegression _),
    "t26_boosted_stumps" -> (TextAnalysis.t26BoostedStumps _),
    "t27_chi2_contingency" -> (TextAnalysis.t27Chi2 _),
    "t29_chi2_select" -> (TextAnalysis.t29Chi2Select _),
    "t30_hashing_tf" -> (TextAnalysis.t30HashingTf _),
    "t31_gbt_stumps" -> (TextAnalysis.t31GbtStumps _),
    "t23_topics" -> (Recommend.t23Topics _),
    "t24_topic_terms" -> (Recommend.t24TopicTerms _),
    "t28_word_vectors" -> (Recommend.t28WordVectors _),
    "t10_topk_sketch" -> (TextAnalysis.t10TopkSketch _),
    "t11_collocations" -> (TextAnalysis.t11Collocations _),
    "t12_zipf_fit" -> (TextAnalysis.t12ZipfFit _),
    "p09_epoch_repeats" -> (Pipeline.p09EpochRepeats _),
    "p10_token_budget" -> (Pipeline.p10TokenBudget _),
    "p11_corpus_shuffle" -> (Pipeline.p11CorpusShuffle _),
    "t13_distinctive_tokens" -> (TextAnalysis.t13DistinctiveTokens _),
    "p01_split_assign" -> (Pipeline.p01SplitAssign _),
    "p02_pack_chunks" -> (Pipeline.p02PackChunks _),
    "p04_curate" -> (Pipeline.p04Curate _),
    "p05_profile" -> (Pipeline.p05Profile _),
    "p06_stratified_sample" -> (Pipeline.p06StratifiedSample _),
    "p12_curriculum" -> (Pipeline.p12Curriculum _),
    "p13_yield_report" -> (Pipeline.p13YieldReport _),
    "p14_chunk_overlap" -> (Pipeline.p14ChunkOverlap _),
    "p15_eval_report" -> (Pipeline.p15EvalReport _),
    "p16_feature_encode" -> (Pipeline.p16FeatureEncode _),
    "p17_roc_auc" -> (Pipeline.p17RocAuc _),
    "p18_regression_eval" -> (Pipeline.p18RegressionEval _),
    "p19_ranking_eval" -> (Pipeline.p19RankingEval _),
    "p28_ranking_eval_sampled" -> (Pipeline.p28RankingEvalSampled _),
    "p20_random_features" -> (Pipeline.p20RandomFeatures _),
    "p21_quantile_bins" -> (Pipeline.p21QuantileBins _),
    "p22_cross_validation" -> (Pipeline.p22CrossValidation _),
    "p29_param_sweep" -> (Pipeline.p29ParamSweep _),
    "p24_data_scaling" -> (Pipeline.p24DataScaling _),
    "p23_vector_transforms" -> (Pipeline.p23VectorTransforms _),
    "p25_feature_scalers" -> (Pipeline.p25FeatureScalers _),
    "p26_feature_expand" -> (Pipeline.p26FeatureExpand _),
    "p27_multilabel" -> (Pipeline.p27Multilabel _),
    "p07_mix_temperature" -> (Pipeline.p07MixTemperature _),
    "p08_decontaminated_split" -> (Pipeline.p08DecontaminatedSplit _),
    "s04_kmeans" -> (Similarity.s04Kmeans _),
    "s21_bisecting_kmeans" -> (Similarity.s21BisectingKmeans _),
    "s22_tfidf_search" -> (Similarity.s22TfidfSearch _),
    "s23_silhouette" -> (Similarity.s23Silhouette _),
    "s30_silhouette_exact" -> (Similarity.s30SilhouetteExact _),
    "s32_item_knn" -> (Recommend.s32ItemKnn _),
    "s31_dimsum_sampled" -> (Similarity.s31DimsumSampled _),
    "s24_implicit_als" -> (Recommend.s24ImplicitAls _),
    "s25_recommend_topk" -> (Recommend.s25RecommendTopk _),
    "s28_svdpp" -> (Recommend.s28Svdpp _),
    "t32_topic_infer" -> (Recommend.t32TopicInfer _),
    "t35_lda_map" -> (Recommend.t35LdaMap _),
    "s26_spearman" -> (Similarity.s26Spearman _),
    "s27_gmm" -> (Similarity.s27Gmm _),
    "s35_gmm_soft" -> (Similarity.s35GmmSoft _),
    "s29_col_similarity" -> (Similarity.s29ColSimilarity _),
    "d11_dedup_semantic" -> (Similarity.d11DedupSemantic _),
    "m01_binary_meta" -> (Multimodal.m01BinaryMeta _),
    "m02_image_decode" -> (Multimodal.m02ImageDecode _),
    "m07_audio_decode" -> (Multimodal.m07AudioDecode _),
    "m03_frame_sample" -> (Multimodal.m03FrameSample _),
    "m04_sample_assembly" -> (Multimodal.m04SampleAssembly _),
    "m05_integrity" -> (Multimodal.m05Integrity _),
    "m06_media_neardup" -> (Multimodal.m06MediaNearDup _),
    "g01_pagerank" -> (Graph.g01PageRank _),
    "g02_hits" -> (Graph.g02Hits _),
    "t14_tfidf" -> (TextAnalysis.t14Tfidf _),
    "d19_span_dedup" -> (Dedup.d19SpanDedup _),
    "g03_ppr" -> (Graph.g03PersonalizedPagerank _),
    "g04_triangles" -> (Graph.g04TriangleCount _),
    "g05_labelprop" -> (Graph.g05LabelProp _),
    "g13_modularity" -> (Graph.g13Modularity _),
    "g14_betweenness" -> (Graph.g14Betweenness _),
    "g15_components" -> (Graph.g15Components _),
    "g19_scc" -> (Graph.g19Scc _),
    "g06_sssp" -> (Graph.g06ShortestPaths _),
    "g16_landmark_paths" -> (Graph.g16LandmarkPaths _),
    "g17_closeness" -> (Graph.g17Closeness _),
    "g18_assortativity" -> (Graph.g18Assortativity _),
    "g07_linkpred" -> (Graph.g07LinkPredict _),
    "g08_graph_profile" -> (Graph.g08GraphProfile _),
    "g09_kcore" -> (Graph.g09Kcore _),
    "g10_random_walks" -> (Graph.g10RandomWalks _),
    "g11_walk_cooccurrence" -> (Graph.g11WalkCooccurrence _),
    "g12_power_iter_clustering" -> (Graph.g12PowerIterClustering _),
    "s16_walk_embeddings" -> (Recommend.s16WalkEmbeddings _),
  )

  /** s04 oracle: unrolls EXACTLY `iters` fixed-point Lloyd rounds —
    * the same cosine / argmax / fixed-point-mean CTE blocks as the
    * s03 oracle, GENERATED one block per round (c0 → c1 → … → c_iters)
    * rather than hand-written — then the final assignment and cell
    * sizes. Bit-exactness across rounds holds because cell means are
    * long sums of `floor(x·1024+0.5)` (order-independent in both
    * engines) and cosines are double-precision in index order.
    */
  /** The double-precision cosine SQL fragment (index-order sums —
    * bit-identical to the Spark kernel) between two array columns.
    * Single source for every embedding oracle below.
    */
  private def cosSql(a: String, b: String): String =
    s"""list_sum(list_transform(range(1, 65),
       |      i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))) /
       |    (sqrt(list_sum(list_transform(range(1, 65),
       |      i -> CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE)))) *
       |     sqrt(list_sum(list_transform(range(1, 65),
       |      i -> CAST($b[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))))""".stripMargin

  private def kmeansOracle(iters: Int): String = {
    def assignCtes(tag: String, cents: String): String =
      s"""sc$tag AS (
         |  SELECT e.vec_id, e.embedding, c.cid,
         |    ${cosSql("e.embedding", "c.cv")} AS cs
         |  FROM embeddings e CROSS JOIN $cents c),
         |rk$tag AS (
         |  SELECT vec_id, embedding, cid,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
         |  FROM sc$tag),
         |asg$tag AS (SELECT vec_id, embedding, cid AS cell FROM rk$tag WHERE rn = 1)""".stripMargin
    def meanCtes(tag: String, prevCents: String, outCents: String): String =
      s"""lex$tag AS (
         |  SELECT cell, generate_subscripts(embedding, 1) AS j, unnest(embedding) AS x
         |  FROM asg$tag),
         |lsum$tag AS (
         |  SELECT cell, j,
         |    CAST(sum(CAST(floor(CAST(x AS DOUBLE) * 1024.0 + 0.5) AS BIGINT)) AS BIGINT) AS s
         |  FROM lex$tag GROUP BY cell, j),
         |lcnt$tag AS (SELECT cell, count(*) AS n FROM asg$tag GROUP BY cell),
         |cm$tag AS (
         |  SELECT cell AS cid,
         |    list(CAST(CAST(s AS DOUBLE) / (1024.0 * n) AS FLOAT) ORDER BY j) AS cv
         |  FROM lsum$tag JOIN lcnt$tag USING (cell) GROUP BY cell, n),
         |$outCents AS (
         |  SELECT cid, cv FROM cm$tag
         |  UNION ALL
         |  SELECT cid, cv FROM $prevCents WHERE cid NOT IN (SELECT cell FROM lcnt$tag))""".stripMargin
    val seed =
      """c0 AS (
        |  SELECT vec_id AS cid, embedding AS cv
        |  FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 32)""".stripMargin
    // prefix ends at asg_f: (vec_id, embedding, cell) under the final
    // centroids — shared by the s03/s04/d11 oracles. Built as a part
    // list so iters = 0 (seed-only) still yields valid SQL.
    val parts = seed +:
      (1 to iters).map { r =>
        assignCtes(s"_$r", s"c${r - 1}") + ",\n" +
          meanCtes(s"_$r", s"c${r - 1}", s"c$r")
      } :+ assignCtes("_f", s"c$iters")
    s"WITH ${parts.mkString(",\n")}"
  }

  /** s21 oracle: the bisecting tree replicated split by split — each
    * split picks the largest leaf (ties → smallest id), seeds its
    * children from the first/last member by md5 order, runs the
    * kmeansOracle assign/mean pattern restricted to that leaf's
    * members, and folds the child assignment back by LEFT JOIN.
    */
  private def s21OracleSql(splits: Int, lloyd: Int): String = {
    def lloydCtes(s: Int, r: Int): String =
      s"""s${s}sc$r AS (
         |  SELECT m.vec_id, m.embedding, c.cid,
         |    ${cosSql("m.embedding", "c.cv")} AS cs
         |  FROM mb$s m CROSS JOIN s${s}c${r - 1} c),
         |s${s}rk$r AS (
         |  SELECT vec_id, embedding, cid,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
         |  FROM s${s}sc$r),
         |s${s}asg$r AS (SELECT vec_id, embedding, cid AS cell
         |  FROM s${s}rk$r WHERE rn = 1),
         |s${s}lex$r AS (
         |  SELECT cell, generate_subscripts(embedding, 1) AS j,
         |    unnest(embedding) AS x
         |  FROM s${s}asg$r),
         |s${s}lsum$r AS (
         |  SELECT cell, j,
         |    CAST(sum(CAST(floor(CAST(x AS DOUBLE) * 1024.0 + 0.5) AS BIGINT))
         |      AS BIGINT) AS s
         |  FROM s${s}lex$r GROUP BY cell, j),
         |s${s}lcnt$r AS (SELECT cell, count(*) AS n FROM s${s}asg$r GROUP BY cell),
         |s${s}cm$r AS (
         |  SELECT cell AS cid,
         |    list(CAST(CAST(s AS DOUBLE) / (1024.0 * n) AS FLOAT) ORDER BY j) AS cv
         |  FROM s${s}lsum$r JOIN s${s}lcnt$r USING (cell) GROUP BY cell, n),
         |s${s}c$r AS (
         |  SELECT cid, cv FROM s${s}cm$r
         |  UNION ALL
         |  SELECT cid, cv FROM s${s}c${r - 1}
         |  WHERE cid NOT IN (SELECT cell FROM s${s}lcnt$r))""".stripMargin
    def splitCtes(s: Int): String = {
      val rounds = (1 to lloyd).map(r => lloydCtes(s, r)).mkString(",\n")
      s"""tg$s AS (SELECT cluster AS tcl FROM a${s - 1}
         |  GROUP BY cluster ORDER BY count(*) DESC, cluster LIMIT 1),
         |mb$s AS MATERIALIZED (
         |  SELECT vec_id, embedding FROM a${s - 1}
         |  WHERE cluster = (SELECT tcl FROM tg$s)),
         |s${s}c0 AS (
         |  SELECT (SELECT tcl FROM tg$s) * 2 + 1 AS cid, cv FROM
         |    (SELECT embedding AS cv FROM mb$s
         |     ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 1)
         |  UNION ALL
         |  SELECT (SELECT tcl FROM tg$s) * 2 + 2, cv FROM
         |    (SELECT embedding AS cv FROM mb$s
         |     ORDER BY md5(CAST(vec_id AS VARCHAR)) DESC, vec_id DESC LIMIT 1)),
         |$rounds,
         |s${s}fsc AS (
         |  SELECT m.vec_id, c.cid, ${cosSql("m.embedding", "c.cv")} AS cs
         |  FROM mb$s m CROSS JOIN s${s}c$lloyd c),
         |s${s}frk AS (
         |  SELECT vec_id, cid,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
         |  FROM s${s}fsc),
         |s${s}fa AS (SELECT vec_id, cid FROM s${s}frk WHERE rn = 1),
         |a$s AS MATERIALIZED (
         |  SELECT a.vec_id, a.embedding, COALESCE(f.cid, a.cluster) AS cluster
         |  FROM a${s - 1} a LEFT JOIN s${s}fa f ON a.vec_id = f.vec_id)""".stripMargin
    }
    val parts =
      """a0 AS MATERIALIZED (
        |  SELECT vec_id, embedding, CAST(0 AS BIGINT) AS cluster
        |  FROM embeddings)""".stripMargin +:
        (1 to splits).map(splitCtes)
    s"""WITH ${parts.mkString(",\n")},
       |sz AS (SELECT cluster, CAST(count(*) AS BIGINT) AS cluster_size
       |       FROM a$splits GROUP BY 1)
       |SELECT a.vec_id, a.cluster, sz.cluster_size
       |FROM a$splits a JOIN sz USING (cluster)
       |ORDER BY vec_id""".stripMargin
  }

  /** s14 oracle: the PQ pipeline replicated end to end — subvector
    * split, md5-seeded codebook, [[graft.operators.Similarity.PqIters]]
    * fixed-point Lloyd rounds per subspace (the kmeansOracle mean
    * contract keyed by (m, code)), argmin-L2² encoding (d2 doubles
    * from the identical sequential expression tree as the l2_sq
    * kernel), tick-quantized ADC tables, and the integer-sum scoring.
    */
  private def s14OracleSql(iters: Int, pm: Int, subDim: Int, pk: Int,
      tick: Double): String = {
    def l2(a: String, b: String): String =
      s"""list_sum(list_transform(range(1, $subDim + 1),
         |      i -> (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)) *
         |           (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))))""".stripMargin
    def dotp(a: String, b: String): String =
      s"""list_sum(list_transform(range(1, $subDim + 1),
         |      i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))""".stripMargin
    def assignCtes(tag: String, cents: String): String =
      s"""sc$tag AS (
         |  SELECT s.vec_id, s.m, s.sv, c.code, ${l2("s.sv", "c.cv")} AS d2
         |  FROM subs s JOIN $cents c ON c.m = s.m),
         |rk$tag AS (
         |  SELECT vec_id, m, sv, code,
         |    row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, code) AS rn
         |  FROM sc$tag),
         |asg$tag AS (SELECT vec_id, m, sv, code FROM rk$tag WHERE rn = 1)""".stripMargin
    def meanCtes(tag: String, prevCents: String, outCents: String): String =
      s"""lex$tag AS (
         |  SELECT m, code, generate_subscripts(sv, 1) AS j, unnest(sv) AS x
         |  FROM asg$tag),
         |lsum$tag AS (
         |  SELECT m, code, j,
         |    CAST(sum(CAST(floor(CAST(x AS DOUBLE) * 1024.0 + 0.5) AS BIGINT)) AS BIGINT) AS s
         |  FROM lex$tag GROUP BY m, code, j),
         |lcnt$tag AS (SELECT m, code, count(*) AS n FROM asg$tag GROUP BY m, code),
         |cm$tag AS (
         |  SELECT m, code,
         |    list(CAST(CAST(s AS DOUBLE) / (1024.0 * n) AS FLOAT) ORDER BY j) AS cv
         |  FROM lsum$tag JOIN lcnt$tag USING (m, code) GROUP BY m, code, n),
         |$outCents AS (
         |  SELECT m, code, cv FROM cm$tag
         |  UNION ALL
         |  SELECT p.m, p.code, p.cv FROM $prevCents p
         |  WHERE NOT EXISTS (
         |    SELECT 1 FROM lcnt$tag l WHERE l.m = p.m AND l.code = p.code))""".stripMargin
    val prefix =
      s"""subs AS MATERIALIZED (
         |  SELECT vec_id, mm.m,
         |    embedding[mm.m * $subDim + 1 : (mm.m + 1) * $subDim] AS sv
         |  FROM embeddings, (SELECT unnest(range($pm)) AS m) mm),
         |sd AS (
         |  SELECT vec_id,
         |    row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS code
         |  FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $pk),
         |pc0 AS (SELECT s.m, d.code, s.sv AS cv FROM sd d JOIN subs s ON s.vec_id = d.vec_id)""".stripMargin
    val rounds = (1 to iters).map { r =>
      assignCtes(s"_$r", s"pc${r - 1}") + ",\n" +
        meanCtes(s"_$r", s"pc${r - 1}", s"pc$r")
    }.mkString(",\n")
    s"""WITH $prefix,
       |$rounds,
       |${assignCtes("_f", s"pc$iters")},
       |cn AS (
       |  SELECT m, code,
       |    CAST(floor(${dotp("cv", "cv")} * $tick + 0.5) AS BIGINT) AS ct
       |  FROM pc$iters),
       |q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
       |nqt AS (
       |  SELECT query_id,
       |    sqrt(list_sum(list_transform(range(1, len(qv) + 1),
       |      i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)))) AS nq
       |  FROM q),
       |qs AS (
       |  SELECT query_id, mm.m, qv[mm.m * $subDim + 1 : (mm.m + 1) * $subDim] AS qsv
       |  FROM q, (SELECT unnest(range($pm)) AS m) mm),
       |qt AS (
       |  SELECT s.query_id, s.m, c.code,
       |    CAST(floor(${dotp("s.qsv", "c.cv")} * $tick + 0.5) AS BIGINT) AS dt
       |  FROM qs s JOIN pc$iters c ON c.m = s.m),
       |ad AS (
       |  SELECT t.query_id, a.vec_id,
       |    CAST(sum(t.dt) AS BIGINT) AS dts, CAST(sum(n.ct) AS BIGINT) AS cts
       |  FROM asg_f a
       |  JOIN qt t ON t.m = a.m AND t.code = a.code
       |  JOIN cn n ON n.m = a.m AND n.code = a.code
       |  WHERE a.vec_id <> t.query_id
       |  GROUP BY 1, 2),
       |scq AS (
       |  SELECT query_id, vec_id,
       |    (CAST(dts AS DOUBLE) / $tick) /
       |      (nq * sqrt(CAST(cts AS DOUBLE) / $tick)) AS adc_raw
       |  FROM ad JOIN nqt USING (query_id)
       |  WHERE cts > 0),
       |rq AS (
       |  SELECT query_id, vec_id, adc_raw,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY adc_raw DESC, vec_id) AS rank
       |  FROM scq)
       |SELECT query_id, vec_id AS neighbor_id, round(adc_raw, 4) AS adc_cos, rank
       |FROM rq WHERE rank <= 10
       |ORDER BY query_id, rank""".stripMargin
  }

  /** The q47 oracle's Morton spread ladder — the identical mask-shift
    * tree [[graft.sources.Sources.zOrderKey]] builds as Columns.
    */
  private def zSpreadSql(x: String): String = {
    val x0 = s"(CAST($x AS BIGINT) & 65535)"
    val x1 = s"(($x0 | ($x0 << 8)) & 16711935)"
    val x2 = s"(($x1 | ($x1 << 4)) & 252645135)"
    val x3 = s"(($x2 | ($x2 << 2)) & 858993459)"
    s"(($x3 | ($x3 << 1)) & 1431655765)"
  }

  /** s23 oracle: the generated k-means prefix, then per-vector top-2
    * centroid cosines off sc_f (rank window — fine in the oracle,
    * the engine side uses the bounded top-2 aggregate) and the
    * simplified-silhouette coefficient in 2^20 ticks; `//` and
    * Spark's `div` agree on the non-negative tick sums.
    */
  private def s23OracleSql(iters: Int): String =
    s"""${kmeansOracle(iters)},
       |rk2 AS (SELECT vec_id, cid, cs,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
       |  FROM sc_f),
       |t2 AS (SELECT vec_id,
       |    max(CASE WHEN rn = 1 THEN cs END) AS cs1,
       |    COALESCE(max(CASE WHEN rn = 2 THEN cs END),
       |             max(CASE WHEN rn = 1 THEN cs END)) AS cs2,
       |    max(CASE WHEN rn = 1 THEN cid END) AS cell
       |  FROM rk2 WHERE rn <= 2 GROUP BY vec_id),
       |sil AS (SELECT cell,
       |    CASE WHEN 1.0 - cs2 > 0
       |      THEN CAST(floor((cs1 - cs2) / (1.0 - cs2) * 1048576.0 + 0.5)
       |        AS BIGINT)
       |      ELSE CAST(0 AS BIGINT) END AS st
       |  FROM t2)
       |SELECT cell, CAST(count(*) AS BIGINT) AS n_points,
       |  CAST(sum(st) AS BIGINT) AS sum_sil_ticks,
       |  CAST(sum(st) AS BIGINT) // CAST(count(*) AS BIGINT) AS mean_sil_ticks
       |FROM sil GROUP BY cell ORDER BY cell""".stripMargin

  /** s30 oracle: the generated k-means prefix for the assignment,
    * then the exact cosine silhouette replicated relationally —
    * normalized ticks off the sequential list_sum norm (the s14 nq
    * contract), per-(cell, dim) Ω long sums, P per (vector, cluster)
    * via the dim join, and the reference's three-way a/b comparison
    * on exactly-rounded integer-ratio doubles. The oracle's N·D·k
    * join rows are fine at oracle scale; the engine side never
    * materializes them (one-row broadcast + higher-order functions).
    */
  private def s30OracleSql(iters: Int): String =
    s"""${kmeansOracle(iters)},
       |xnrm AS MATERIALIZED (SELECT e.vec_id, a.cell, e.embedding,
       |    sqrt(list_sum(list_transform(range(1, 65),
       |      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))) AS nv
       |  FROM embeddings e JOIN asg_f a ON a.vec_id = e.vec_id),
       |xq AS MATERIALIZED (SELECT vec_id, cell, jj.j,
       |    CAST(floor(CAST(embedding[jj.j] AS DOUBLE) / nv * 1024.0 + 0.5)
       |      AS BIGINT) AS q
       |  FROM xnrm, (SELECT unnest(range(1, 65)) AS j) jj),
       |om AS (SELECT cell AS gcell, j, CAST(sum(q) AS BIGINT) AS o
       |  FROM xq GROUP BY 1, 2),
       |cnx AS (SELECT cell AS gcell, CAST(count(*) AS BIGINT) AS n
       |  FROM asg_f GROUP BY 1),
       |ppx AS (SELECT x.vec_id, x.cell, o.gcell,
       |    CAST(sum(x.q * o.o) AS BIGINT) AS p
       |  FROM xq x JOIN om o ON o.j = x.j GROUP BY 1, 2, 3),
       |abx AS (SELECT p.vec_id, p.cell,
       |    max(CASE WHEN p.gcell = p.cell THEN
       |      CASE WHEN c.n = 1 THEN 0.0
       |        ELSE CAST(1048576 * c.n - p.p AS DOUBLE) /
       |             CAST(1048576 * (c.n - 1) AS DOUBLE) END
       |      END) AS a,
       |    min(CASE WHEN p.gcell <> p.cell THEN
       |      CAST(1048576 * c.n - p.p AS DOUBLE) /
       |      CAST(1048576 * c.n AS DOUBLE) END) AS b
       |  FROM ppx p JOIN cnx c USING (gcell) GROUP BY 1, 2),
       |silx AS (SELECT cell,
       |    CAST(floor((CASE WHEN a < b AND b > 0 THEN 1.0 - a / b
       |      WHEN a > b AND a > 0 THEN b / a - 1.0
       |      ELSE 0.0 END) * 1048576.0 + 0.5) AS BIGINT) AS st
       |  FROM abx)
       |SELECT cell, CAST(count(*) AS BIGINT) AS n_points,
       |  CAST(sum(st) AS BIGINT) AS sum_sil_ticks,
       |  CAST(sum(st) AS BIGINT) // CAST(count(*) AS BIGINT) AS mean_sil_ticks
       |FROM silx GROUP BY cell ORDER BY cell""".stripMargin

  private def s04OracleSql(iters: Int): String =
    s"""${kmeansOracle(iters)},
       |siz AS (SELECT cell, count(*) AS cell_size FROM asg_f GROUP BY cell)
       |SELECT a.vec_id, a.cell, CAST(s.cell_size AS BIGINT) AS cell_size
       |FROM asg_f a JOIN siz s ON a.cell = s.cell
       |ORDER BY a.vec_id""".stripMargin

  /** d11 oracle: same generated k-means prefix, then the min-id-
    * representative rule under MULTI-PROBE assignment — a vector is a
    * dup iff a smaller-id vector sharing ANY of its `probes`-nearest
    * cells (rk_f rank ≤ probes) has cosine ≥ the bar; the reported
    * cell stays the rank-1 (asg_f) cell.
    */
  private def d11OracleSql(iters: Int, bar: Double, probes: Int): String =
    s"""${kmeansOracle(iters)},
       |ma AS (SELECT vec_id, embedding, cid AS cell FROM rk_f WHERE rn <= $probes),
       |pr AS (
       |  SELECT DISTINCT b.vec_id AS vb
       |  FROM ma a JOIN ma b ON a.cell = b.cell AND a.vec_id < b.vec_id
       |  WHERE ${cosSql("a.embedding", "b.embedding")} >= $bar)
       |SELECT v.vec_id, v.cell, v.vec_id IN (SELECT vb FROM pr) AS is_dup
       |FROM asg_f v ORDER BY v.vec_id""".stripMargin

  /** s03 oracle: the generated one-round k-means prefix (identical to
    * what `ivfCentroids` computes) plus the probe/top-k suffix —
    * sc_f scores every vector against the refined centroids, so the
    * query probes read straight off it.
    */
  private def s03OracleSql: String =
    s"""${kmeansOracle(1)},
       |q1 AS (
       |  SELECT vec_id AS query_id, embedding AS qv, cid, cs,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
       |  FROM sc_f WHERE vec_id < 5),
       |probe AS (SELECT query_id, qv, cid AS cell FROM q1 WHERE rn <= 8),
       |scq AS (
       |  SELECT p.query_id, a.vec_id,
       |    ${cosSql("p.qv", "a.embedding")} AS cos_raw
       |  FROM probe p JOIN asg_f a ON a.cell = p.cell
       |  WHERE a.vec_id <> p.query_id),
       |rq AS (
       |  SELECT query_id, vec_id, cos_raw,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY cos_raw DESC, vec_id) AS rank
       |  FROM scq)
       |SELECT query_id, vec_id AS neighbor_id, round(cos_raw, 4) AS cos, rank
       |FROM rq WHERE rank <= 10
       |ORDER BY query_id, rank""".stripMargin

  /** DuckDB-runnable ANSI SQL oracle per query key. Aliases match the
    * Spark result column names exactly (driver hash-compares by
    * name-sorted columns).
    */
  /** Shared by d06 and d12: the two operators compute the SAME result
    * by contract (d12's bloom stage is a prefilter with no false
    * negatives, followed by the same exact verify).
    */
  private val contaminationOracleSql: String =
    """WITH tk AS (
      |  SELECT doc_id, source,
      |    list_filter(regexp_split_to_array(text, '[ \n\t\r]+'), t -> t <> '') AS t
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, source, list_distinct(CASE WHEN len(t) >= 3
      |    THEN list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
      |    ELSE [] END) AS s
      |  FROM tk),
      |bench AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE source = 'src0'),
      |corp AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE source <> 'src0'),
      |m AS (SELECT c.doc_id, count(*) AS n_matched FROM corp c
      |      WHERE c.g IN (SELECT g FROM bench) GROUP BY c.doc_id),
      |tot AS (SELECT doc_id, len(s) AS n_sh FROM sh WHERE source <> 'src0')
      |SELECT t.doc_id, CAST(t.n_sh AS BIGINT) AS n_sh,
      |  CAST(coalesce(m.n_matched, 0) AS BIGINT) AS n_matched,
      |  round(coalesce(m.n_matched, 0) / CAST(greatest(t.n_sh, 1) AS DOUBLE), 4) AS containment,
      |  (coalesce(m.n_matched, 0) / CAST(greatest(t.n_sh, 1) AS DOUBLE)) >= 0.5 AS contaminated
      |FROM tot t LEFT JOIN m ON t.doc_id = m.doc_id
      |ORDER BY t.doc_id""".stripMargin

  /** t02's DuckDB replication without the final ORDER BY — used
    * standalone (t02) and as p06's scoring CTE.
    */
  private val qualityScoreOracleBody: String =
    """WITH r AS (
      |  SELECT doc_id,
      |    length(text) AS n_chars_m,
      |    len(string_split(text, ' ')) AS n_tokens,
      |    round((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))::DOUBLE
      |          / length(text), 4) AS punct_ratio,
      |    round(len(list_filter(string_split(text, ' '),
      |            t -> t IN ('the','and','of','to','in','is','that','for','with','on')))::DOUBLE
      |          / len(string_split(text, ' ')), 4) AS stopword_ratio,
      |    round(len(list_distinct(string_split(text, ' ')))::DOUBLE
      |          / len(string_split(text, ' ')), 4) AS distinct_ratio
      |  FROM documents)
      |SELECT doc_id, n_chars_m, n_tokens, punct_ratio, stopword_ratio, distinct_ratio,
      |  round(least(1.0, n_tokens / 100.0) * 0.4
      |        + stopword_ratio * 0.3 + distinct_ratio * 0.3, 5) AS quality_score
      |FROM r""".stripMargin

  /** The d02 all-pairs 3-gram Jaccard truth up to the scored-pair
    * CTE `j` (no WITH keyword; shingle lists live in CTE `sh`) —
    * shared by d02 (threshold tail), d17 (source rollup) and d18
    * (shared-shingle forensics).
    */
  private val minhashTruthOracleCtes: String =
    """tk AS (
      |  SELECT doc_id,
      |         list_filter(regexp_split_to_array(text, '[ \n\t\r]+'), t -> t <> '') AS t
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id,
      |         list_distinct(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
      |           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
      |  FROM tk),
      |p AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |         len(list_intersect(a.s, b.s)) AS i, len(a.s) AS na, len(b.s) AS nb
      |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
      |j AS (
      |  SELECT doc_a, doc_b,
      |         CASE WHEN na = 0 AND nb = 0 THEN 1.0
      |              WHEN na = 0 OR nb = 0 THEN 0.0
      |              ELSE i / CAST(na + nb - i AS DOUBLE) END AS jac
      |  FROM p)""".stripMargin

  /** The d04 all-pairs 2-gram Jaccard truth up to the scored-pair
    * CTE `j` (no WITH keyword) — shared by d04 (threshold tail) and
    * d16 (decile-sweep tail).
    */
  private val ngramTruthOracleCtes: String =
    """tk AS (
      |  SELECT doc_id,
      |         list_filter(regexp_split_to_array(text, '[ \n\t\r]+'), t -> t <> '') AS t
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id,
      |         list_distinct(list_transform(range(1, greatest(len(t) - 1, 0) + 1),
      |           i -> t[i] || ' ' || t[i+1])) AS s
      |  FROM tk),
      |p AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |         len(list_intersect(a.s, b.s)) AS i, len(a.s) AS na, len(b.s) AS nb
      |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
      |j AS (
      |  SELECT doc_a, doc_b,
      |         CASE WHEN na = 0 AND nb = 0 THEN 1.0
      |              WHEN na = 0 OR nb = 0 THEN 0.0
      |              ELSE i / CAST(na + nb - i AS DOUBLE) END AS jac
      |  FROM p)""".stripMargin

  /** The s02/s07 query-probe LSH replication up to the scored
    * candidate CTE `sc` (no WITH keyword) — banding, query×corpus
    * bucket join, exact cosine. s02 appends the top-k tail, s07 the
    * radius tail.
    */
  private val annProbeOracleCtes: String =
    """nb AS (
      |  SELECT greatest(3, CASE WHEN (count(*) + 1023) // 1024 <= 1 THEN 3
      |    ELSE length(bin((count(*) + 1023) // 1024 - 1)) END) AS bits
      |  FROM embeddings),
      |pl AS (
      |  SELECT p.p AS p, j.j AS j,
      |    ((('0x' || substr(md5('7:' || CAST(p.p AS VARCHAR) || ':' || CAST(j.j AS VARCHAR)), 1, 12))::UBIGINT
      |      / 281474976710656.0) * 2.0 - 1.0) AS w
      |  FROM range(756) p(p), range(64) j(j), nb WHERE p.p < 12 * nb.bits),
      |pw AS (SELECT p, list(w ORDER BY j) AS ws FROM pl GROUP BY p),
      |sb AS (
      |  SELECT e.vec_id, pw.p,
      |    CASE WHEN list_sum(list_transform(range(1, 65),
      |           j -> ws[j] * CAST(e.embedding[j] AS DOUBLE))) >= 0 THEN 1 ELSE 0 END AS bit
      |  FROM embeddings e, pw),
      |bands AS (
      |  SELECT vec_id, p // nb.bits AS band_id, sum(bit * (1 << (p % nb.bits))) AS band_val
      |  FROM sb, nb GROUP BY vec_id, p // nb.bits),
      |cand AS (
      |  SELECT DISTINCT qb.vec_id AS query_id, cb.vec_id AS vec_id
      |  FROM bands cb JOIN bands qb
      |    ON cb.band_id = qb.band_id AND cb.band_val = qb.band_val
      |  WHERE qb.vec_id < 5 AND cb.vec_id <> qb.vec_id),
      |sc AS (
      |  SELECT c.query_id, c.vec_id,
      |    list_sum(list_transform(range(1, 65),
      |      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(v.embedding[i] AS DOUBLE))) /
      |    (sqrt(list_sum(list_transform(range(1, 65),
      |      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)))) *
      |     sqrt(list_sum(list_transform(range(1, 65),
      |      i -> CAST(v.embedding[i] AS DOUBLE) * CAST(v.embedding[i] AS DOUBLE))))) AS cos_raw
      |  FROM cand c
      |  JOIN embeddings q ON q.vec_id = c.query_id
      |  JOIN embeddings v ON v.vec_id = c.vec_id)""".stripMargin

  /** The s05 k-NN-graph replication up to the ranked candidate CTE
    * `r` (no WITH keyword) — shared by s05 and s06.
    */
  private val knnGraphOracleCtes: String =
    """nb AS (
      |  SELECT greatest(3, CASE WHEN (count(*) + 1023) // 1024 <= 1 THEN 3
      |    ELSE length(bin((count(*) + 1023) // 1024 - 1)) END) AS bits
      |  FROM embeddings),
      |pl AS (
      |  SELECT p.p AS p, j.j AS j,
      |    ((('0x' || substr(md5('7:' || CAST(p.p AS VARCHAR) || ':' || CAST(j.j AS VARCHAR)), 1, 12))::UBIGINT
      |      / 281474976710656.0) * 2.0 - 1.0) AS w
      |  FROM range(756) p(p), range(64) j(j), nb WHERE p.p < 12 * nb.bits),
      |pw AS (SELECT p, list(w ORDER BY j) AS ws FROM pl GROUP BY p),
      |sb AS (
      |  SELECT e.vec_id, pw.p,
      |    CASE WHEN list_sum(list_transform(range(1, 65),
      |           j -> ws[j] * CAST(e.embedding[j] AS DOUBLE))) >= 0 THEN 1 ELSE 0 END AS bit
      |  FROM embeddings e, pw),
      |bands AS (
      |  SELECT vec_id, p // nb.bits AS band_id, sum(bit * (1 << (p % nb.bits))) AS band_val
      |  FROM sb, nb GROUP BY vec_id, p // nb.bits),
      |cand AS (
      |  SELECT DISTINCT qb.vec_id AS query_id, cb.vec_id AS vec_id
      |  FROM bands cb JOIN bands qb
      |    ON cb.band_id = qb.band_id AND cb.band_val = qb.band_val
      |  WHERE cb.vec_id <> qb.vec_id),
      |sc AS (
      |  SELECT c.query_id, c.vec_id,
      |    list_sum(list_transform(range(1, 65),
      |      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(v.embedding[i] AS DOUBLE))) /
      |    (sqrt(list_sum(list_transform(range(1, 65),
      |      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)))) *
      |     sqrt(list_sum(list_transform(range(1, 65),
      |      i -> CAST(v.embedding[i] AS DOUBLE) * CAST(v.embedding[i] AS DOUBLE))))) AS cos_raw
      |  FROM cand c
      |  JOIN embeddings q ON q.vec_id = c.query_id
      |  JOIN embeddings v ON v.vec_id = c.vec_id),
      |r AS (
      |  SELECT query_id, vec_id, cos_raw,
      |    row_number() OVER (PARTITION BY query_id
      |                       ORDER BY cos_raw DESC, vec_id) AS rank
      |  FROM sc)""".stripMargin

  /** s20's DuckDB twin: [[knnGraphOracleCtes]]' ranked graph as the
    * seed, then [[graft.operators.Similarity.NnDescentRounds]]
    * unrolled refinement rounds — reverse edges capped at k by
    * (rounded cos desc, id asc) row_number (the top_k_by_score
    * total order), two-hop expansion, exact rescore with the same
    * list-dot text, top-k re-rank on the RAW cosine.
    */
  /** The table-aliased cosine fragment (q.embedding vs v.embedding —
    * the two-relation form of [[cosSql]] above) — ONE definition
    * shared by the s20 and s33 oracles so the tree cannot drift
    * between the graph build and the beam serve.
    */
  private def cosSqlAliased(q: String, v: String): String =
    s"""list_sum(list_transform(range(1, 65),
       |      i -> CAST($q.embedding[i] AS DOUBLE) * CAST($v.embedding[i] AS DOUBLE))) /
       |    (sqrt(list_sum(list_transform(range(1, 65),
       |      i -> CAST($q.embedding[i] AS DOUBLE) * CAST($q.embedding[i] AS DOUBLE)))) *
       |     sqrt(list_sum(list_transform(range(1, 65),
       |      i -> CAST($v.embedding[i] AS DOUBLE) * CAST($v.embedding[i] AS DOUBLE)))))""".stripMargin

  /** The s20 refined-graph chain as a CTE body ending in `g{rounds}`
    * ("WITH " prepended by callers) — ONE definition backs the s20
    * report and s33's beam serve, mirroring the engine-side shared
    * refinedMemo (the g16Ctes pattern; replaces the substring cut
    * that used to extract this from the finished s20 SQL).
    */
  private def s20GraphCtes(seedK: Int, k: Int, rounds: Int): String = {
    def cosSql(q: String, v: String) = cosSqlAliased(q, v)
    val roundCtes = (1 to rounds).map { kk =>
      val prev = if (kk == 1) "g0" else s"g${kk - 1}"
      s"""rv$kk AS (
         |  SELECT query_id, vec_id FROM (
         |    SELECT vec_id AS query_id, query_id AS vec_id,
         |      row_number() OVER (PARTITION BY vec_id
         |                         ORDER BY cos DESC, query_id) AS rn
         |    FROM $prev) x WHERE rn <= $k),
         |un$kk AS (SELECT DISTINCT query_id, vec_id FROM (
         |    SELECT query_id, vec_id FROM $prev
         |    UNION ALL SELECT query_id, vec_id FROM rv$kk) u),
         |hp$kk AS (SELECT x.query_id AS query_id, y.vec_id AS vec_id
         |  FROM un$kk x JOIN un$kk y ON x.vec_id = y.query_id),
         |cd$kk AS (SELECT DISTINCT query_id, vec_id FROM (
         |    SELECT query_id, vec_id FROM un$kk
         |    UNION ALL SELECT query_id, vec_id FROM hp$kk) c
         |  WHERE query_id <> vec_id),
         |sc$kk AS (
         |  SELECT c.query_id, c.vec_id, ${cosSql("q", "v")} AS cos_raw
         |  FROM cd$kk c
         |  JOIN embeddings q ON q.vec_id = c.query_id
         |  JOIN embeddings v ON v.vec_id = c.vec_id),
         |g$kk AS (
         |  SELECT query_id, vec_id, round(cos_raw, 4) AS cos, rank FROM (
         |    SELECT query_id, vec_id, cos_raw,
         |      row_number() OVER (PARTITION BY query_id
         |                         ORDER BY cos_raw DESC, vec_id) AS rank
         |    FROM sc$kk) s WHERE rank <= $k)""".stripMargin
    }.mkString(",\n")
    knnGraphOracleCtes + s""",
       |g0 AS (SELECT query_id, vec_id, round(cos_raw, 4) AS cos
       |       FROM r WHERE rank <= $seedK),
       |$roundCtes""".stripMargin
  }

  private def s20OracleSql(seedK: Int, k: Int, rounds: Int): String =
    "WITH " + s20GraphCtes(seedK, k, rounds) + s"""
       |SELECT query_id, vec_id AS neighbor_id, cos, CAST(rank AS BIGINT) AS rank
       |FROM g$rounds ORDER BY query_id, rank""".stripMargin

  /** s33's DuckDB twin: the s20 refined-graph chain (shared CTE
    * body, ending in g{rounds}) + the beam rounds unrolled — fixed
    * smallest-id entry set, per hop the beam ∪ its graph neighbors
    * rescored by the identical index-order cosine and cut by
    * row_number over (cos desc, vec_id) — the top_k_by_score total
    * order.
    */
  private def s33OracleSql(seedK: Int, k: Int, rounds: Int, b: Int,
      hops: Int): String = {
    def cosSql(q: String, v: String) = cosSqlAliased(q, v)
    // every bm is referenced twice by the next hop and gm three
    // times — MATERIALIZED throughout, or DuckDB's CTE inlining
    // re-expands the whole upstream graph chain 2^hops times (the
    // observed 80 GB temp-spill failure at sf0.1)
    def scoreCtes(t: Int, candRel: String): String =
      s"""bs$t AS (
         |  SELECT c.query_id, c.vec_id, ${cosSql("q", "v")} AS cos_raw
         |  FROM $candRel c
         |  JOIN embeddings q ON q.vec_id = c.query_id
         |  JOIN embeddings v ON v.vec_id = c.vec_id
         |  WHERE c.vec_id <> c.query_id),
         |bm$t AS MATERIALIZED (SELECT query_id, vec_id, cos_raw, rn AS rank
         |  FROM (
         |    SELECT query_id, vec_id, cos_raw,
         |      row_number() OVER (PARTITION BY query_id
         |                         ORDER BY cos_raw DESC, vec_id) AS rn
         |    FROM bs$t) x WHERE rn <= $b)""".stripMargin
    val hopCtes = (1 to hops).map { t =>
      s"""bc$t AS (SELECT DISTINCT query_id, vec_id FROM (
         |    SELECT query_id, vec_id FROM bm${t - 1}
         |    UNION ALL
         |    SELECT bb.query_id, g.vec_id
         |    FROM bm${t - 1} bb JOIN gm g ON g.query_id = bb.vec_id) u),
         |${scoreCtes(t, s"bc$t")}""".stripMargin
    }.mkString(",\n")
    s"""WITH ${s20GraphCtes(seedK, k, rounds)},
       |gm AS MATERIALIZED (SELECT query_id, vec_id FROM g$rounds),
       |bq AS (SELECT vec_id AS query_id FROM embeddings WHERE vec_id < 5),
       |en AS (SELECT vec_id FROM embeddings
       |       ORDER BY md5('hnsw:' || CAST(vec_id AS VARCHAR)), vec_id
       |       LIMIT ${graft.operators.Similarity.CoarseSize}),
       |bc0 AS (SELECT b.query_id, e.vec_id FROM bq b CROSS JOIN en e),
       |${scoreCtes(0, "bc0")},
       |$hopCtes
       |SELECT query_id, vec_id AS neighbor_id, round(cos_raw, 4) AS cos,
       |  CAST(rank AS BIGINT) AS rank
       |FROM bm$hops ORDER BY query_id, rank""".stripMargin
  }

  /** The d02 all-pairs truth edge set + recursive-CTE transitive
    * closure up to `lab` (doc_id, cluster_id) and `sz` (cluster_id,
    * cluster_size) — shared by the d07/d08/d14 oracles. No WITH
    * keyword (callers prepend "WITH RECURSIVE ").
    */
  private val closureOracleCtes: String =
    """tk AS (
      |  SELECT doc_id,
      |         list_filter(regexp_split_to_array(text, '[ \n\t\r]+'), t -> t <> '') AS t
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id,
      |         list_distinct(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
      |           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
      |  FROM tk),
      |p AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |         len(list_intersect(a.s, b.s)) AS i, len(a.s) AS na, len(b.s) AS nb
      |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
      |e AS (
      |  SELECT doc_a, doc_b FROM p
      |  WHERE CASE WHEN na = 0 AND nb = 0 THEN 1.0
      |             WHEN na = 0 OR nb = 0 THEN 0.0
      |             ELSE i / CAST(na + nb - i AS DOUBLE) END >= 0.7),
      |edges AS (SELECT doc_a AS a, doc_b AS b FROM e
      |          UNION ALL SELECT doc_b, doc_a FROM e),
      |reach(doc_id, node) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT r.doc_id, ed.b FROM reach r JOIN edges ed ON r.node = ed.a),
      |lab AS (SELECT doc_id, min(node) AS cluster_id FROM reach GROUP BY doc_id),
      |sz AS (SELECT cluster_id, count(*) AS cluster_size FROM lab GROUP BY cluster_id)""".stripMargin

  /** g01 oracle: unrolls EXACTLY [[graft.operators.Graph.PageRankIters]]
    * integer-tick PageRank rounds (the s04 generated-per-round
    * pattern). Bit-exactness: every value is a positive long, every
    * division floors (DuckDB `//` == Spark `div` on positives), and
    * long sums are order-independent. The per-round sum is cast back
    * to BIGINT (DuckDB widens sum(BIGINT) to HUGEINT — the same guard
    * [[g02OracleSql]] applies) so `rank_ticks` types as int64 and the
    * driver's type-sensitive hash matches Spark's LongType.
    */
  /** q49's DuckDB twin: dyadic-grid features, one grouped Gram
    * aggregation, then [[graft.operators.Recommend.solveSqlNested]] —
    * the SAME scalar trees the engine runs.
    */
  /** The q49 on-grid feature CTE body ([[graft.operators.Relational
    * .ridgeBase]]'s DuckDB twin) — shared with p18's evaluation.
    */
  private def ridgeBaseSql: String =
    """b AS (
      |  SELECT l_returnflag,
      |    CAST(('0x' || substr(md5(concat('cv:', CAST(l_orderkey AS VARCHAR),
      |      ':', CAST(l_linenumber AS VARCHAR))), 1, 5))::UBIGINT % 4
      |      AS BIGINT) AS fold,
      |    floor(l_extendedprice + 0.5) / CAST(4096.0 AS DOUBLE) AS r,
      |    CAST(1.0 AS DOUBLE) AS f0,
      |    l_quantity AS f1,
      |    floor(l_discount * 4096.0 + 0.5) / CAST(4096.0 AS DOUBLE) AS f2,
      |    floor(l_tax * 4096.0 + 0.5) / CAST(4096.0 AS DOUBLE) AS f3
      |  FROM lineitem)""".stripMargin

  /** The solved per-group ridge model over the `b` CTE — the q49
    * Gram + [[graft.operators.Recommend.solveSqlNested]] chain.
    */
  private def ridgeSolvedSql: String = ridgeSolvedSqlOver("b")

  private def ridgeSolvedSqlOver(rel: String): String =
    ridgeSolvedSqlOverLam(rel, "0.25")

  private def ridgeSolvedSqlOverLam(rel: String, lamCoef: String): String = {
    val rank = graft.operators.Recommend.AlsRank
    val gramSel =
      (for { i <- 0 until rank; j <- 0 to i }
        yield s"sum(f$j * f$i) AS g$i$j").mkString(", ") + ", " +
        (0 until rank).map(k => s"sum(r * f$k) AS b$k").mkString(", ")
    graft.operators.Recommend.solveSqlNestedFor(
      s"SELECT l_returnflag, count(*) AS n, $gramSel FROM $rel GROUP BY l_returnflag",
      lamCoef)
  }

  private def q49OracleSql: String = {
    val rank = graft.operators.Recommend.AlsRank
    val coefOut = (0 until rank)
      .map(k => s"CAST(t$k AS BIGINT) AS c${k}_ticks").mkString(", ")
    s"""WITH $ridgeBaseSql
       |SELECT l_returnflag, CAST(n AS BIGINT) AS n, $coefOut
       |FROM $ridgeSolvedSql
       |ORDER BY l_returnflag""".stripMargin
  }

  /** p18's DuckDB twin: the q49 model CTE scored back over `b` with
    * the identical prediction tree, residual/target/prediction
    * quantized to integer grids before squaring, and every ratio a
    * truncating division of non-negative BIGINTs (`//` ≡ `div`).
    * Sums CAST back to BIGINT (the HUGEINT→float64 driver-hash trap).
    */
  /** The p18 metric chain as one nested SELECT over a base relation
    * and a model relation (columns c0..c3) — shared by the p18
    * oracle and p22's per-fold held-out evaluations.
    */
  private def regressionMetricsSql(baseRel: String, modelRel: String): String =
    s"""SELECT l_returnflag, n,
       |  (sae12 * 256) // n AS mae_ticks,
       |  (sse6 * 256) // n AS mse_ticks,
       |  CASE WHEN (n * syy6 - sy6 * sy6) // n > 0
       |  THEN 1048576 - (sse6 * 1048576) // ((n * syy6 - sy6 * sy6) // n)
       |  ELSE CAST(0 AS BIGINT) END AS r2_ticks,
       |  (((n * spp6 - sp6 * sp6) // n) * 256) // n AS evar_ticks
       |FROM (
       |  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(abs(r12)) AS BIGINT) AS sae12,
       |    CAST(sum(r6 * r6) AS BIGINT) AS sse6,
       |    CAST(sum(y6) AS BIGINT) AS sy6,
       |    CAST(sum(y6 * y6) AS BIGINT) AS syy6,
       |    CAST(sum(p6) AS BIGINT) AS sp6,
       |    CAST(sum(p6 * p6) AS BIGINT) AS spp6
       |  FROM (
       |    SELECT l_returnflag,
       |      CAST(floor((r - pred) * 4096.0 + 0.5) AS BIGINT) AS r12,
       |      CAST(floor((r - pred) * 64.0 + 0.5) AS BIGINT) AS r6,
       |      CAST(floor(r * 64.0 + 0.5) AS BIGINT) AS y6,
       |      CAST(floor(pred * 64.0 + 0.5) AS BIGINT) AS p6
       |    FROM (
       |      SELECT tb.l_returnflag, tb.r,
       |        tm.c0*tb.f0 + tm.c1*tb.f1 + tm.c2*tb.f2 + tm.c3*tb.f3 AS pred
       |      FROM $baseRel tb
       |      JOIN $modelRel tm ON tb.l_returnflag = tm.l_returnflag) pr
       |    ) rr
       |  GROUP BY l_returnflag) ag""".stripMargin

  private def p18OracleSql: String =
    s"""WITH $ridgeBaseSql,
       |m AS (SELECT l_returnflag, f0 AS c0, f1 AS c1, f2 AS c2, f3 AS c3
       |  FROM $ridgeSolvedSql)
       |${regressionMetricsSql("b", "m")}
       |ORDER BY l_returnflag""".stripMargin

  /** p22's DuckDB twin: per fold, the ridge solve over the training
    * complement and the p18 metric chain over the held-out fold.
    */
  private def p22OracleSql: String = {
    val folds = graft.operators.Pipeline.CvFolds
    val foldCtes = (0 until folds).map { f =>
      s"""tr$f AS (SELECT * FROM b WHERE fold <> $f),
         |te$f AS (SELECT * FROM b WHERE fold = $f),
         |m$f AS (SELECT l_returnflag, f0 AS c0, f1 AS c1, f2 AS c2, f3 AS c3
         |  FROM ${ridgeSolvedSqlOver(s"tr$f")})""".stripMargin
    }.mkString(",\n")
    val unions = (0 until folds).map { f =>
      s"SELECT CAST($f AS BIGINT) AS fold, * FROM (" +
        s"${regressionMetricsSql(s"te$f", s"m$f")}) f$f"
    }.mkString("\nUNION ALL\n")
    s"""WITH $ridgeBaseSql,
       |$foldCtes
       |$unions
       |ORDER BY fold, l_returnflag""".stripMargin
  }

  /** p29's DuckDB twin: ONE train/test split CTE pair, the ridge
    * solve CTE per grid λ (same Gram aggregate text — DuckDB's
    * optimizer can share it; the engine side shares it physically),
    * the p18 metric chain per λ over the SAME te relation, and the
    * identical row_number best-pick.
    */
  private def p29OracleSql: String = {
    val lams = graft.operators.Pipeline.SweepLams
    val valFold = graft.operators.Pipeline.SweepValFold
    val modelCtes = lams.zipWithIndex.map { case ((coef, _), i) =>
      s"""m$i AS (SELECT l_returnflag, f0 AS c0, f1 AS c1, f2 AS c2, f3 AS c3
         |  FROM ${ridgeSolvedSqlOverLam("tr", coef)})""".stripMargin
    }.mkString(",\n")
    val unions = lams.zipWithIndex.map { case ((_, ticks), i) =>
      s"SELECT CAST($ticks AS BIGINT) AS lam_ticks, * FROM (" +
        s"${regressionMetricsSql("te", s"m$i")}) s$i"
    }.mkString("\nUNION ALL\n")
    s"""WITH $ridgeBaseSql,
       |tr AS (SELECT * FROM b WHERE fold <> $valFold),
       |te AS (SELECT * FROM b WHERE fold = $valFold),
       |$modelCtes,
       |u AS ($unions)
       |SELECT lam_ticks, l_returnflag, n, mae_ticks, mse_ticks,
       |  r2_ticks, evar_ticks,
       |  row_number() OVER (PARTITION BY l_returnflag
       |    ORDER BY mse_ticks, lam_ticks) = 1 AS is_best
       |FROM u
       |ORDER BY lam_ticks, l_returnflag""".stripMargin
  }

  /** p24's DuckDB twin: per nested pool fold ≤ t, the ridge solve
    * and the p18 metric chain over the fixed held-out fold, plus the
    * pool's per-group count.
    */
  private def p24OracleSql: String = {
    val evalFold = graft.operators.Pipeline.ScaleEvalFold
    val pools = graft.operators.Pipeline.CvFolds - 1
    val poolCtes = (0 until pools).map { t =>
      s"""tr$t AS (SELECT * FROM b WHERE fold <= $t),
         |nt$t AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_train
         |  FROM tr$t GROUP BY 1),
         |m$t AS (SELECT l_returnflag, f0 AS c0, f1 AS c1, f2 AS c2, f3 AS c3
         |  FROM ${ridgeSolvedSqlOver(s"tr$t")})""".stripMargin
    }.mkString(",\n")
    val unions = (0 until pools).map { t =>
      s"SELECT CAST(${t + 1} AS BIGINT) AS train_folds, nt$t.n_train, f$t.* " +
        s"FROM (${regressionMetricsSql("te", s"m$t")}) f$t " +
        s"JOIN nt$t ON nt$t.l_returnflag = f$t.l_returnflag"
    }.mkString("\nUNION ALL\n")
    s"""WITH $ridgeBaseSql,
       |te AS (SELECT * FROM b WHERE fold = $evalFold),
       |$poolCtes
       |$unions
       |ORDER BY train_folds, l_returnflag""".stripMargin
  }

  /** q51's DuckDB twin: same integer grid/bandwidth/kernel sums, the
    * left join re-entering empty-support points, and
    * [[graft.operators.Relational.KdeDensityExpr]] verbatim.
    */
  private def q51OracleSql: String = {
    val pMax = graft.operators.Relational.KdePoints - 1
    s"""WITH b AS (SELECT CAST(floor(l_extendedprice) AS BIGINT) AS v FROM lineitem),
       |st AS (SELECT min(v) AS lo, max(v) AS hi, CAST(count(*) AS BIGINT) AS n FROM b),
       |pts AS (SELECT CAST(g.i AS BIGINT) AS i,
       |          lo + ((hi - lo) * g.i) // $pMax AS p,
       |          greatest((hi - lo) // 8, 1) AS h, n
       |        FROM st, generate_series(0, $pMax) AS g(i)),
       |sums AS (SELECT i, CAST(count(*) AS BIGINT) AS n_in,
       |           CAST(sum(h * h - (v - p) * (v - p)) AS BIGINT) AS s
       |         FROM b, pts WHERE abs(v - p) < h GROUP BY i)
       |SELECT i, point, h, n_in, s,
       |  ${graft.operators.Relational.KdeDensityExpr} AS density_gticks
       |FROM (
       |  SELECT pts.i, pts.p AS point, pts.h, pts.n,
       |    coalesce(n_in, 0) AS n_in, coalesce(s, 0) AS s
       |  FROM pts LEFT JOIN sums ON pts.i = sums.i) f
       |ORDER BY i""".stripMargin
  }

  /** q50's DuckDB twin: [[graft.operators.Relational.logregRounds]]
    * unrolled — per round k one aggregate CTE s{k} over feats × the
    * 1-row weight CTE w{k} (margin, hard sigmoid, residual and
    * gradient sums all exact longs), then w{k+1} as the clamped
    * truncating-div update. Round-k output rows read straight off
    * s{k} (the scan that evaluates model k also carries its
    * weights).
    */
  private def q50OracleSql: String = {
    val iters = graft.operators.Relational.LogregIters
    val clamp = graft.operators.Relational.LogregClamp
    val m24 = (0 to 3).map(j => s"w$j * f$j").mkString(" + ")
    def scanCte(k: Int): String = {
      val gs = (0 to 3).map(j => s"CAST(sum(r26 * f$j) AS BIGINT) AS g$j")
        .mkString(", ")
      val ws = (0 to 3).map(j => s"max(w$j) AS w$j").mkString(", ")
      s"""s$k AS (
         |  SELECT count(*) AS n,
         |    CAST(sum(CASE WHEN (CASE WHEN m24 >= 0 THEN 1 ELSE 0 END) = y
         |                  THEN 1 ELSE 0 END) AS BIGINT) AS correct,
         |    $gs, $ws
         |  FROM (
         |    SELECT y, f0, f1, f2, f3, w0, w1, w2, w3, m24,
         |      least(greatest(m24 + 33554432, 0), 67108864) - y * 67108864 AS r26
         |    FROM (SELECT feats.*, w$k.*, $m24 AS m24 FROM feats, w$k) b) c)""".stripMargin
    }
    def updCte(k: Int): String = {
      val ws = (0 to 3).map(j =>
        s"least(greatest(w$j - (g$j * 4) // (greatest(n, 1) * 67108864), " +
          s"-$clamp), $clamp) AS w$j").mkString(", ")
      s"w${k + 1} AS (SELECT $ws FROM s$k)"
    }
    val w0 = "w0 AS (SELECT " +
      (0 to 3).map(j => s"CAST(0 AS BIGINT) AS w$j").mkString(", ") + ")"
    val ctes = (w0 +: (0 to iters).flatMap(k =>
      scanCte(k) +: (if (k < iters) Seq(updCte(k)) else Nil))).mkString(",\n")
    val rounds = (0 to iters).map { k =>
      val ws = (0 to 3).map(j => s"w$j AS w${j}_ticks").mkString(", ")
      s"SELECT CAST($k AS BIGINT) AS round, n, correct, $ws FROM s$k"
    }.mkString("\nUNION ALL\n")
    s"""WITH feats AS (
       |  SELECT CAST(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS BIGINT) AS y,
       |    CAST(4096 AS BIGINT) AS f0,
       |    CAST(l_quantity AS BIGINT) * 64 AS f1,
       |    CAST(floor(l_discount * 4096.0 + 0.5) AS BIGINT) AS f2,
       |    CAST(floor(l_tax * 4096.0 + 0.5) AS BIGINT) AS f3
       |  FROM lineitem),
       |$ctes
       |$rounds
       |ORDER BY round""".stripMargin
  }

  /** q63's DuckDB twin: the q50 GD unroll ONCE PER CLASS (suffixed
    * CTE chains, per-class y derived inline from the shared flag
    * column), the three final weight vectors cross-joined into one
    * row, then the scoring scan with
    * [[graft.operators.Relational.ovrArgmaxSql]] interpolated
    * verbatim — one argmax definition, two engines.
    */
  private def q63OracleSql: String = {
    val iters = graft.operators.Relational.LogregIters
    val clamp = graft.operators.Relational.LogregClamp
    val classes = graft.operators.Relational.OvrClasses
    val m24 = (0 to 3).map(j => s"w$j * f$j").mkString(" + ")
    def scanCte(c: String, k: Int): String = {
      val gs = (0 to 3).map(j => s"CAST(sum(r26 * f$j) AS BIGINT) AS g$j")
        .mkString(", ")
      val ws = (0 to 3).map(j => s"max(w$j) AS w$j").mkString(", ")
      s"""s${k}_$c AS (
         |  SELECT count(*) AS n, $gs, $ws
         |  FROM (
         |    SELECT f0, f1, f2, f3, w0, w1, w2, w3,
         |      least(greatest(m24 + 33554432, 0), 67108864) - y * 67108864 AS r26
         |    FROM (SELECT feats.*,
         |            CAST(CASE WHEN flag = '$c' THEN 1 ELSE 0 END AS BIGINT) AS y,
         |            w${k}_$c.*, $m24 AS m24
         |          FROM feats, w${k}_$c) b) c2)""".stripMargin
    }
    def updCte(c: String, k: Int): String = {
      val ws = (0 to 3).map(j =>
        s"least(greatest(w$j - (g$j * 4) // (greatest(n, 1) * 67108864), " +
          s"-$clamp), $clamp) AS w$j").mkString(", ")
      s"w${k + 1}_$c AS (SELECT $ws FROM s${k}_$c)"
    }
    val chains = classes.flatMap { c =>
      val w0 = s"w0_$c AS (SELECT " +
        (0 to 3).map(j => s"CAST(0 AS BIGINT) AS w$j").mkString(", ") + ")"
      w0 +: (0 to iters).flatMap(k =>
        scanCte(c, k) +: (if (k < iters) Seq(updCte(c, k)) else Nil))
    }
    val fw = "fw AS (SELECT " + classes.flatMap(c =>
        (0 to 3).map(j => s"s${iters}_$c.w$j AS w_${c}_$j")).mkString(", ") +
      " FROM " + classes.map(c => s"s${iters}_$c").mkString(", ") + ")"
    val margins = classes.map(c =>
      (0 to 3).map(j => s"w_${c}_$j * f$j").mkString(" + ") + s" AS m_$c")
      .mkString(", ")
    s"""WITH feats AS (
       |  SELECT l_returnflag AS flag,
       |    CAST(4096 AS BIGINT) AS f0,
       |    CAST(l_quantity AS BIGINT) * 64 AS f1,
       |    CAST(floor(l_discount * 4096.0 + 0.5) AS BIGINT) AS f2,
       |    CAST(floor(l_tax * 4096.0 + 0.5) AS BIGINT) AS f3
       |  FROM lineitem),
       |${chains.mkString(",\n")},
       |$fw,
       |sc AS (SELECT flag, $margins FROM feats, fw)
       |SELECT flag AS actual,
       |  ${graft.operators.Relational.ovrArgmaxSql} AS predicted,
       |  CAST(count(*) AS BIGINT) AS n
       |FROM sc GROUP BY 1, 2
       |ORDER BY actual, predicted""".stripMargin
  }

  /** q64's DuckDB twin: [[graft.operators.Relational.poissonRounds]]
    * unrolled — the warm-start aggregate, then per round the
    * [[graft.operators.Relational.poisStages]] link pipeline (the
    * SAME stage strings rendered with `//`) nested as selects, and
    * the trust-region update with the halving step ladder.
    */
  private def q64OracleSql: String = {
    val R = graft.operators.Relational
    val iters = R.PoisIters
    val clamp = R.PoisClamp
    val stages = R.poisStages("//")
    def scanCte(k: Int): String = {
      val inner = stages.foldLeft(
        s"SELECT feats.*, pw$k.* FROM feats, pw$k") {
        case (acc, (c, e)) => s"SELECT *, $e AS $c FROM ($acc) a_$c"
      }
      val gs = (0 to 2).map(j => s"CAST(sum(r24 * f$j) AS BIGINT) AS g$j")
        .mkString(", ")
      val ws = (0 to 2).map(j => s"max(w$j) AS w$j").mkString(", ")
      s"""s$k AS (
         |  SELECT count(*) AS n,
         |    CAST(sum(r24) AS BIGINT) AS bias24,
         |    CAST(sum(abs(r24)) AS BIGINT) AS sae24,
         |    $gs, $ws
         |  FROM ($inner) z)""".stripMargin
    }
    def updCte(k: Int): String = {
      val step = math.max(1024L >> k, 1L)
      val ws = (0 to 2).map(j =>
        s"least(greatest(w$j - least(greatest(" +
          s"g$j // (greatest(n, 1) * 67108864), -$step), $step), " +
          s"-$clamp), $clamp) AS w$j").mkString(", ")
      s"pw${k + 1} AS (SELECT $ws FROM s$k)"
    }
    val ctes = (Seq(
      "ini AS (SELECT count(*) AS n, CAST(sum(y) AS BIGINT) AS sy FROM feats)",
      "ini2 AS (SELECT (sy * 16777216) // n AS ybar24 FROM ini)",
      s"ini3 AS (SELECT ybar24, ${R.poisKbarCase} AS kb FROM ini2)",
      s"pw0 AS (SELECT CAST(${R.poisInitW0("//")} AS BIGINT) AS w0, " +
        "CAST(0 AS BIGINT) AS w1, CAST(0 AS BIGINT) AS w2 FROM ini3)") ++
      (0 to iters).flatMap(k =>
        scanCte(k) +: (if (k < iters) Seq(updCte(k)) else Nil))).mkString(",\n")
    val rounds = (0 to iters).map { k =>
      val ws = (0 to 2).map(j => s"w$j AS w${j}_ticks").mkString(", ")
      s"SELECT CAST($k AS BIGINT) AS round, n, bias24, sae24, $ws FROM s$k"
    }.mkString("\nUNION ALL\n")
    s"""WITH feats AS (
       |  SELECT CAST(l_quantity AS BIGINT) AS y,
       |    CAST(4096 AS BIGINT) AS f0,
       |    CAST(floor(l_discount * 4096.0 + 0.5) AS BIGINT) AS f1,
       |    CAST(floor(l_tax * 4096.0 + 0.5) AS BIGINT) AS f2
       |  FROM lineitem),
       |$ctes
       |$rounds
       |ORDER BY round""".stripMargin
  }

  /** q57's DuckDB twin: [[graft.operators.Relational.lassoRounds]]
    * unrolled — the q50 CTE shape with the squared-error residual
    * and the integer soft-threshold prox update.
    */
  private def q57OracleSql: String = {
    val iters = graft.operators.Relational.LassoIters
    val clamp = graft.operators.Relational.LassoClamp
    val t = graft.operators.Relational.LassoTTicks
    val m24 = (0 to 3).map(j => s"w$j * f$j").mkString(" + ")
    def scanCte(k: Int): String = {
      val gs = (0 to 3).map(j => s"CAST(sum(r24 * f$j) AS BIGINT) AS g$j")
        .mkString(", ")
      val ws = (0 to 3).map(j => s"max(w$j) AS w$j").mkString(", ")
      s"""s$k AS (
         |  SELECT count(*) AS n,
         |    CAST(sum((r24 // 4096) * (r24 // 4096)) AS BIGINT) AS sse12,
         |    $gs, $ws
         |  FROM (SELECT feats.*, w$k.*, $m24 - y12 * 4096 AS r24
         |        FROM feats, w$k) b)""".stripMargin
    }
    def updCte(k: Int): String = {
      val ws = (0 to 3).map { j =>
        val z = s"(w$j - g$j // (4 * greatest(n, 1) * 16777216))"
        s"least(greatest(CASE WHEN $z > $t THEN $z - $t " +
          s"WHEN $z < -$t THEN $z + $t ELSE 0 END, -$clamp), $clamp) AS w$j"
      }.mkString(", ")
      s"w${k + 1} AS (SELECT $ws FROM s$k)"
    }
    val w0 = "w0 AS (SELECT " +
      (0 to 3).map(j => s"CAST(0 AS BIGINT) AS w$j").mkString(", ") + ")"
    val ctes = (w0 +: (0 to iters).flatMap(k =>
      scanCte(k) +: (if (k < iters) Seq(updCte(k)) else Nil))).mkString(",\n")
    val rounds = (0 to iters).map { k =>
      val ws = (0 to 3).map(j => s"w$j AS w${j}_ticks").mkString(", ")
      val nnz = (0 to 3).map(j => s"CASE WHEN w$j <> 0 THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"SELECT CAST($k AS BIGINT) AS round, n, " +
        s"CAST($nnz AS BIGINT) AS nnz, sse12, $ws FROM s$k"
    }.mkString("\nUNION ALL\n")
    s"""WITH feats AS (
       |  SELECT CAST(floor(l_extendedprice + 0.5) AS BIGINT) AS y12,
       |    CAST(4096 AS BIGINT) AS f0,
       |    CAST(l_quantity AS BIGINT) * 64 AS f1,
       |    CAST(floor(l_discount * 4096.0 + 0.5) AS BIGINT) AS f2,
       |    CAST(floor(l_tax * 4096.0 + 0.5) AS BIGINT) AS f3
       |  FROM lineitem),
       |$ctes
       |$rounds
       |ORDER BY round""".stripMargin
  }

  /** q62 oracle: the pinball-subgradient rounds unrolled — the q57
    * CTE shape with the tau4 dimension carried through every frame
    * (3-row model state cross-joined onto the feats scan, GROUP BY
    * tau4), the integer pinball CASE, and the halved-step update.
    */
  private def q62OracleSql: String = {
    val iters = graft.operators.Relational.QrIters
    val clamp = graft.operators.Relational.QrClamp
    val baseStep = graft.operators.Relational.QrStep
    val m24 = (0 to 3).map(j => s"w$j * f$j").mkString(" + ")
    def scanCte(k: Int): String = {
      val gs = (0 to 3)
        .map(j => s"CAST(sum((ind * 4 - tau4) * f$j) AS BIGINT) AS g$j")
        .mkString(", ")
      val ws = (0 to 3).map(j => s"max(w$j) AS w$j").mkString(", ")
      s"""s$k AS (
         |  SELECT tau4, count(*) AS n,
         |    CAST(sum(ind) AS BIGINT) AS n_over,
         |    CAST(sum(CASE WHEN r24 >= 0 THEN (4 - tau4) * r24
         |             ELSE tau4 * -r24 END) AS BIGINT) AS pin24,
         |    $gs, $ws
         |  FROM (SELECT b.*, CASE WHEN r24 >= 0 THEN 1 ELSE 0 END AS ind
         |        FROM (SELECT feats.*, wr.*, $m24 - y12 * 4096 AS r24
         |              FROM feats, w$k wr) b) c
         |  GROUP BY tau4)""".stripMargin
    }
    def updCte(k: Int): String = {
      val step = math.max(baseStep >> k, 1L)
      val ws = (0 to 3).map { j =>
        s"least(greatest(w$j - (g$j * $step) // " +
          s"(4 * greatest(n, 1) * 4096), -$clamp), $clamp) AS w$j"
      }.mkString(", ")
      s"w${k + 1} AS (SELECT tau4, $ws FROM s$k)"
    }
    val w0 = "w0 AS (SELECT CAST(t.tau4 AS BIGINT) AS tau4, " +
      "(SELECT CAST(sum(y12) AS BIGINT) // count(*) FROM feats) AS w0, " +
      (1 to 3).map(j => s"CAST(0 AS BIGINT) AS w$j").mkString(", ") +
      " FROM (VALUES (1), (2), (3)) t(tau4))"
    val ctes = (w0 +: (0 to iters).flatMap(k =>
      scanCte(k) +: (if (k < iters) Seq(updCte(k)) else Nil))).mkString(",\n")
    val rounds = (0 to iters).map { k =>
      val ws = (0 to 3).map(j => s"w$j AS w${j}_ticks").mkString(", ")
      s"SELECT CAST($k AS BIGINT) AS round, tau4, n, n_over, " +
        s"pin24 // (4 * 4096) AS pin12, $ws FROM s$k"
    }.mkString("\nUNION ALL\n")
    s"""WITH feats AS (
       |  SELECT CAST(floor(l_extendedprice + 0.5) AS BIGINT) AS y12,
       |    CAST(4096 AS BIGINT) AS f0,
       |    CAST(l_quantity AS BIGINT) * 64 AS f1,
       |    CAST(floor(l_discount * 4096.0 + 0.5) AS BIGINT) AS f2,
       |    CAST(floor(l_tax * 4096.0 + 0.5) AS BIGINT) AS f3
       |  FROM lineitem),
       |$ctes
       |$rounds
       |ORDER BY round, tau4""".stripMargin
  }

  /** q65 oracle: the clamped-gradient Huber rounds unrolled — the
    * q57 CTE shape with the q62 moment warm start, the
    * least/greatest residual clamp, and the exact integer Huber
    * objective (quantize-before-square inside the threshold, the
    * 2δ|r|−δ² linear arm outside).
    */
  private def q65OracleSql: String = {
    val iters = graft.operators.Relational.HuberIters
    val clamp = graft.operators.Relational.HuberClamp
    val d24 = graft.operators.Relational.HuberDelta24
    val d12 = d24 / 4096L
    val m24 = (0 to 3).map(j => s"w$j * f$j").mkString(" + ")
    def scanCte(k: Int): String = {
      val gs = (0 to 3).map(j => s"CAST(sum(cr * f$j) AS BIGINT) AS g$j")
        .mkString(", ")
      val ws = (0 to 3).map(j => s"max(w$j) AS w$j").mkString(", ")
      s"""s$k AS (
         |  SELECT count(*) AS n,
         |    CAST(sum(CASE WHEN abs(r24) > $d24 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_outliers,
         |    CAST(sum(CASE WHEN abs(r24) <= $d24
         |             THEN (r24 // 4096) * (r24 // 4096)
         |             ELSE ${2L * d12} * abs(r24 // 4096) - ${d12 * d12}
         |             END) AS BIGINT) AS hub12,
         |    $gs, $ws
         |  FROM (SELECT b.*, least(greatest(r24, -$d24), $d24) AS cr
         |        FROM (SELECT feats.*, wr.*, $m24 - y12 * 4096 AS r24
         |              FROM feats, w$k wr) b) c)""".stripMargin
    }
    def updCte(k: Int): String = {
      val ws = (0 to 3).map { j =>
        s"least(greatest(w$j - g$j // (4 * greatest(n, 1) * 16777216), " +
          s"-$clamp), $clamp) AS w$j"
      }.mkString(", ")
      s"w${k + 1} AS (SELECT $ws FROM s$k)"
    }
    val w0 = "w0 AS (SELECT " +
      "(SELECT CAST(sum(y12) AS BIGINT) // count(*) FROM feats) AS w0, " +
      (1 to 3).map(j => s"CAST(0 AS BIGINT) AS w$j").mkString(", ") + ")"
    val ctes = (w0 +: (0 to iters).flatMap(k =>
      scanCte(k) +: (if (k < iters) Seq(updCte(k)) else Nil))).mkString(",\n")
    val rounds = (0 to iters).map { k =>
      val ws = (0 to 3).map(j => s"w$j AS w${j}_ticks").mkString(", ")
      s"SELECT CAST($k AS BIGINT) AS round, n, n_outliers, hub12, $ws FROM s$k"
    }.mkString("\nUNION ALL\n")
    s"""WITH feats AS (
       |  SELECT CAST(floor(l_extendedprice + 0.5) AS BIGINT) AS y12,
       |    CAST(4096 AS BIGINT) AS f0,
       |    CAST(l_quantity AS BIGINT) * 64 AS f1,
       |    CAST(floor(l_discount * 4096.0 + 0.5) AS BIGINT) AS f2,
       |    CAST(floor(l_tax * 4096.0 + 0.5) AS BIGINT) AS f3
       |  FROM lineitem),
       |$ctes
       |$rounds
       |ORDER BY round""".stripMargin
  }

  /** q66 oracle: the exact-integer ReLU backprop rounds unrolled —
    * the q57 CTE shape widened to the 21-column network state (W2
    * row + flattened W1), the ReLU forward as greatest(·, 0), the
    * indicator backward as a CASE, and the literal W1 init matrix
    * interpolated from the SAME [[graft.operators.Relational
    * .mlpW1Init]] the engine uses.
    */
  private def q66OracleSql: String = {
    val H = graft.operators.Relational.MlpHidden
    val iters = graft.operators.Relational.MlpIters
    val clamp = graft.operators.Relational.MlpClamp
    val rc = graft.operators.Relational.MlpResidClamp24
    val wCols = Seq("w2_0") ++ (1 to H).map(h => s"w2_$h") ++
      (for (h <- 0 until H; j <- 0 to 3) yield s"w1_${h}_$j")
    def scanCte(k: Int): String = {
      val as = (0 until H).map(h =>
        (0 to 3).map(j => s"w1_${h}_$j * f$j").mkString(" + "))
      val aDefs = as.zipWithIndex
        .map { case (e, h) => s"$e AS a_$h" }.mkString(",\n    ")
      val hDefs = (0 until H)
        .map(h => s"greatest(a_$h, 0) // 4096 AS h12_${h + 1}")
        .mkString(", ")
      val yhat = (0 to H).map(h => s"w2_$h * h12_$h").mkString(" + ")
      val g2 = (0 to H)
        .map(h => s"CAST(sum(cr12 * h12_$h) AS BIGINT) AS g2_$h")
        .mkString(", ")
      val g1 = (for (h <- 0 until H; j <- 0 to 3) yield
        s"CAST(sum(cr12 * w2_${h + 1} * " +
          s"(CASE WHEN a_$h > 0 THEN 1 ELSE 0 END) * f$j) AS BIGINT)" +
          s" AS g1_${h}_$j").mkString(", ")
      val ws = wCols.map(w => s"max($w) AS $w").mkString(", ")
      s"""s$k AS (
         |  SELECT count(*) AS n,
         |    CAST(sum(abs(cr12)) AS BIGINT) AS sae12,
         |    $g2, $g1, $ws
         |  FROM (
         |    SELECT c.*,
         |      least(greatest(($yhat) - y12 * 4096, -$rc), $rc) // 4096 AS cr12
         |    FROM (
         |      SELECT b.*, 4096 AS h12_0, $hDefs
         |      FROM (SELECT feats.*, wr.*,
         |        $aDefs
         |        FROM feats, w$k wr) b) c) d)""".stripMargin
    }
    def updCte(k: Int): String = {
      val u2 = (0 to H).map(h =>
        s"least(greatest(w2_$h - g2_$h // (4 * greatest(n, 1) * 4096), " +
          s"-$clamp), $clamp) AS w2_$h").mkString(", ")
      val u1 = (for (h <- 0 until H; j <- 0 to 3) yield
        s"least(greatest(w1_${h}_$j - g1_${h}_$j // " +
          s"(4 * greatest(n, 1) * 1048576), -$clamp), $clamp)" +
          s" AS w1_${h}_$j").mkString(", ")
      s"w${k + 1} AS (SELECT $u2, $u1 FROM s$k)"
    }
    val w1Init = (for (h <- 0 until H; j <- 0 to 3) yield
      s"CAST(${graft.operators.Relational.mlpW1Init(h, j)} AS BIGINT)" +
        s" AS w1_${h}_$j").mkString(", ")
    val w0 = "w0 AS (SELECT " +
      "(SELECT CAST(sum(y12) AS BIGINT) // count(*) FROM feats) AS w2_0, " +
      (1 to H).map(h =>
        s"CAST(${graft.operators.Relational.mlpW2Init(h)} AS BIGINT)" +
          s" AS w2_$h").mkString(", ") +
      s", $w1Init)"
    val ctes = (w0 +: (0 to iters).flatMap(k =>
      scanCte(k) +: (if (k < iters) Seq(updCte(k)) else Nil))).mkString(",\n")
    val rounds = (0 to iters).map { k =>
      val ws = wCols.map(w => s"$w AS ${w}_ticks").mkString(", ")
      s"SELECT CAST($k AS BIGINT) AS round, n, sae12, $ws FROM s$k"
    }.mkString("\nUNION ALL\n")
    s"""WITH feats AS (
       |  SELECT CAST(floor(l_extendedprice + 0.5) AS BIGINT) AS y12,
       |    CAST(4096 AS BIGINT) AS f0,
       |    CAST(l_quantity AS BIGINT) * 64 AS f1,
       |    CAST(floor(l_discount * 4096.0 + 0.5) AS BIGINT) AS f2,
       |    CAST(floor(l_tax * 4096.0 + 0.5) AS BIGINT) AS f3
       |  FROM lineitem),
       |$ctes
       |$rounds
       |ORDER BY round""".stripMargin
  }

  /** q56 oracle: the hinge-loss rounds unrolled — the q50 CTE shape
    * with the violation indicator and the Pegasos-style update.
    */
  private def q56OracleSql: String = {
    val iters = graft.operators.Relational.SvmIters
    val clamp = graft.operators.Relational.SvmClamp
    val m24 = (0 to 3).map(j => s"w$j * f$j").mkString(" + ")
    def scanCte(k: Int): String = {
      val hs = (0 to 3).map(j => s"CAST(sum(viol * ys * f$j) AS BIGINT) AS h$j")
        .mkString(", ")
      val ws = (0 to 3).map(j => s"max(w$j) AS w$j").mkString(", ")
      s"""s$k AS (
         |  SELECT count(*) AS n,
         |    CAST(sum(CASE WHEN (CASE WHEN m24 >= 0 THEN 1 ELSE 0 END) = y
         |                  THEN 1 ELSE 0 END) AS BIGINT) AS correct,
         |    CAST(sum(viol) AS BIGINT) AS violations, $hs, $ws
         |  FROM (
         |    SELECT y, ys, f0, f1, f2, f3, w0, w1, w2, w3, m24,
         |      CASE WHEN ys * m24 < 16777216 THEN 1 ELSE 0 END AS viol
         |    FROM (SELECT feats.*, w$k.*, $m24 AS m24 FROM feats, w$k) b) c)""".stripMargin
    }
    def updCte(k: Int): String = {
      val ws = (0 to 3).map(j =>
        s"least(greatest(w$j + h$j // (4 * greatest(n, 1)) - w$j // 256, " +
          s"-$clamp), $clamp) AS w$j").mkString(", ")
      s"w${k + 1} AS (SELECT $ws FROM s$k)"
    }
    val w0 = "w0 AS (SELECT " +
      (0 to 3).map(j => s"CAST(0 AS BIGINT) AS w$j").mkString(", ") + ")"
    val ctes = (w0 +: (0 to iters).flatMap(k =>
      scanCte(k) +: (if (k < iters) Seq(updCte(k)) else Nil))).mkString(",\n")
    val rounds = (0 to iters).map { k =>
      val ws = (0 to 3).map(j => s"w$j AS w${j}_ticks").mkString(", ")
      s"SELECT CAST($k AS BIGINT) AS round, n, correct, violations, $ws FROM s$k"
    }.mkString("\nUNION ALL\n")
    s"""WITH feats AS (
       |  SELECT CAST(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS BIGINT) AS y,
       |    CAST(CASE WHEN l_returnflag = 'R' THEN 1 ELSE -1 END AS BIGINT) AS ys,
       |    CAST(4096 AS BIGINT) AS f0,
       |    CAST(l_quantity AS BIGINT) * 64 AS f1,
       |    CAST(floor(l_discount * 4096.0 + 0.5) AS BIGINT) AS f2,
       |    CAST(floor(l_tax * 4096.0 + 0.5) AS BIGINT) AS f3
       |  FROM lineitem),
       |$ctes
       |$rounds
       |ORDER BY round""".stripMargin
  }

  private def g01OracleSql(iters: Int, scale: Long): String = {
    val rounds = (1 to iters).map { k =>
      val prev = if (k == 1) "r0" else s"i${k - 1}"
      s"""c$k AS (
         |  SELECT e.dst AS id, CAST(sum(r.r // d.odeg) AS BIGINT) AS s
         |  FROM e JOIN $prev r ON r.id = e.src JOIN deg d ON d.src = e.src
         |  GROUP BY e.dst),
         |i$k AS (
         |  SELECT n.id, (SELECT base FROM p) + COALESCE((85 * c$k.s) // 100, 0) AS r
         |  FROM n LEFT JOIN c$k ON c$k.id = n.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS (
       |  SELECT DISTINCT o.o_custkey * 2 AS a, l.l_suppkey * 2 + 1 AS b
       |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
       |e AS (
       |  SELECT a AS src, b AS dst FROM e0
       |  UNION ALL
       |  SELECT b AS src, a AS dst FROM e0),
       |deg AS (SELECT src, count(*) AS odeg FROM e GROUP BY src),
       |n AS (SELECT DISTINCT src AS id FROM e),
       |p AS (SELECT $scale // count(*) AS r0,
       |             (($scale // count(*)) * 15) // 100 AS base FROM n),
       |r0 AS (SELECT id, (SELECT r0 FROM p) AS r FROM n),
       |$rounds
       |SELECT CASE WHEN id % 2 = 0 THEN 'c' ELSE 's' END AS node_type,
       |       id // 2 AS entity_key, CAST(r AS BIGINT) AS rank_ticks
       |FROM i$iters ORDER BY node_type, entity_key""".stripMargin
  }

  /** g02 oracle: unrolls EXACTLY [[graft.operators.Graph.HitsIters]]
    * integer-tick HITS rounds — long sums (cast back to BIGINT: DuckDB
    * widens sum to HUGEINT), L∞ normalization by floor division.
    */
  private def g02OracleSql(iters: Int, scale: Long): String = {
    val rounds = (1 to iters).map { k =>
      val prevH = if (k == 1) "h0" else s"h${k - 1}"
      s"""ar$k AS MATERIALIZED (SELECT e.s, CAST(sum(h.h) AS BIGINT) AS a
         |  FROM e JOIN $prevH h ON h.c = e.c GROUP BY e.s),
         |a$k AS MATERIALIZED (
         |  SELECT s, (a * $scale) // (SELECT max(a) FROM ar$k) AS a FROM ar$k),
         |hr$k AS MATERIALIZED (SELECT e.c, CAST(sum(a.a) AS BIGINT) AS h
         |  FROM e JOIN a$k a ON a.s = e.s GROUP BY e.c),
         |h$k AS MATERIALIZED (
         |  SELECT c, (h * $scale) // (SELECT max(h) FROM hr$k) AS h FROM hr$k)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (
       |  SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
       |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
       |h0 AS (SELECT DISTINCT c, $scale AS h FROM e),
       |$rounds
       |SELECT 'c' AS node_type, c AS entity_key, h AS score_ticks FROM h$iters
       |UNION ALL
       |SELECT 's' AS node_type, s AS entity_key, a AS score_ticks FROM a$iters
       |ORDER BY node_type, entity_key""".stripMargin
  }

  /** g03 oracle: g01's unrolled rounds with the teleport confined to
    * the seed (smallest customer node). Per-round sum cast back to
    * BIGINT — the HUGEINT-widening guard, same as [[g01OracleSql]].
    */
  private def g03OracleSql(iters: Int, scale: Long): String = {
    val teleport = scale * 15 / 100
    val rounds = (1 to iters).map { k =>
      val prev = if (k == 1) "r0" else s"i${k - 1}"
      s"""c$k AS (
         |  SELECT e.dst AS id, CAST(sum(r.r // d.odeg) AS BIGINT) AS s
         |  FROM e JOIN $prev r ON r.id = e.src JOIN deg d ON d.src = e.src
         |  GROUP BY e.dst),
         |i$k AS (
         |  SELECT n.id,
         |    CASE WHEN n.id = (SELECT seed FROM sd) THEN $teleport ELSE 0 END
         |      + COALESCE((85 * c$k.s) // 100, 0) AS r
         |  FROM n LEFT JOIN c$k ON c$k.id = n.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS (
       |  SELECT DISTINCT o.o_custkey * 2 AS a, l.l_suppkey * 2 + 1 AS b
       |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
       |e AS (
       |  SELECT a AS src, b AS dst FROM e0
       |  UNION ALL
       |  SELECT b AS src, a AS dst FROM e0),
       |deg AS (SELECT src, count(*) AS odeg FROM e GROUP BY src),
       |n AS (SELECT DISTINCT src AS id FROM e),
       |sd AS (SELECT min(id) AS seed FROM n WHERE id % 2 = 0),
       |r0 AS (SELECT id,
       |  CASE WHEN id = (SELECT seed FROM sd) THEN $scale ELSE 0 END AS r FROM n),
       |$rounds
       |SELECT CASE WHEN id % 2 = 0 THEN 'c' ELSE 's' END AS node_type,
       |       id // 2 AS entity_key, CAST(r AS BIGINT) AS rank_ticks
       |FROM i$iters ORDER BY node_type, entity_key""".stripMargin
  }

  /** Shared oracle prelude for the trade-graph family: mirrored edge
    * set + node set, identical to g01's CTEs.
    */
  /** g12 oracle: unrolls EXACTLY [[graft.operators.Graph.PicIters]]
    * row-normalized tick matvec rounds (sums cast back to BIGINT —
    * the HUGEINT guard) and [[graft.operators.Graph.PicKmeansIters]]
    * 1-D 2-means rounds with the same empty-cluster fallback.
    */
  private def g12OracleSql(iters: Int, kIters: Int): String = {
    val rounds = (1 to iters).map { k =>
      val prev = if (k == 1) "pv0" else s"pv${k - 1}"
      s"""ps$k AS MATERIALIZED (
         |  SELECT e.src AS id, (CAST(sum(p.v) AS BIGINT) * 4096) // d.odeg AS u
         |  FROM e JOIN $prev p ON p.id = e.dst JOIN pdeg d ON d.src = e.src
         |  GROUP BY e.src, d.odeg),
         |pv$k AS MATERIALIZED (
         |  SELECT id, (u * 4096) // (SELECT greatest(max(u), 1) FROM ps$k) AS v
         |  FROM ps$k)""".stripMargin
    }.mkString(",\n")
    val km = (1 to kIters).map { k =>
      val prev = if (k == 1) "cs0" else s"cs${k - 1}"
      s"""up$k AS MATERIALIZED (
         |  SELECT CASE WHEN abs(v - (SELECT c0 FROM $prev))
         |              <= abs(v - (SELECT c1 FROM $prev)) THEN 0 ELSE 1 END AS cl,
         |    CAST(sum(v) AS BIGINT) AS sv, CAST(count(*) AS BIGINT) AS n
         |  FROM pv$iters GROUP BY 1),
         |cs$k AS MATERIALIZED (
         |  SELECT coalesce((SELECT sv // n FROM up$k WHERE cl = 0),
         |                  (SELECT c0 FROM $prev)) AS c0,
         |         coalesce((SELECT sv // n FROM up$k WHERE cl = 1),
         |                  (SELECT c1 FROM $prev)) AS c1)""".stripMargin
    }.mkString(",\n")
    s"""WITH $gEdgeCtes,
       |pdeg AS MATERIALIZED (SELECT src, CAST(count(*) AS BIGINT) AS odeg
       |  FROM e GROUP BY src),
       |pv0 AS MATERIALIZED (
       |  SELECT src AS id, (odeg * 4096) // (SELECT max(odeg) FROM pdeg) AS v
       |  FROM pdeg),
       |$rounds,
       |cs0 AS MATERIALIZED (SELECT min(v) AS c0, max(v) AS c1 FROM pv$iters),
       |$km
       |SELECT CASE WHEN id % 2 = 0 THEN 'c' ELSE 's' END AS node_type,
       |  id // 2 AS entity_key, v AS v_ticks,
       |  CAST(CASE WHEN abs(v - (SELECT c0 FROM cs$kIters))
       |            <= abs(v - (SELECT c1 FROM cs$kIters)) THEN 0 ELSE 1 END
       |       AS BIGINT) AS cluster
       |FROM pv$iters
       |ORDER BY node_type, entity_key""".stripMargin
  }

  private val gEdgeCtes =
    """e0 AS MATERIALIZED (
      |  SELECT DISTINCT o.o_custkey * 2 AS a, l.l_suppkey * 2 + 1 AS b
      |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
      |e AS MATERIALIZED (
      |  SELECT a AS src, b AS dst FROM e0
      |  UNION ALL
      |  SELECT b AS src, a AS dst FROM e0),
      |n AS (SELECT DISTINCT src AS id FROM e)""".stripMargin

  /** g04 oracle: the same per-vertex top-k sparsification + degree-
    * ordered wedge join as [[graft.operators.Graph.g04TriangleCount]]
    * — counts are BIGINT end to end (count(*), no sum widening).
    */
  /** Shared CTE prefix for the g04/g07 oracles: the sparsified
    * undirected co-purchase graph `und` (a < b) — mirrors
    * [[graft.operators.Graph.coPurchaseUnd]] exactly.
    */
  private def undCtes(k: Int): String =
    s"""tp AS MATERIALIZED (
       |  SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
       |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
       |cc AS MATERIALIZED (
       |  SELECT x.s AS s1, y.s AS s2, count(*) AS n
       |  FROM tp x JOIN tp y ON x.c = y.c AND x.s < y.s
       |  GROUP BY 1, 2),
       |dir AS (SELECT s1 AS u, s2 AS v, n FROM cc
       |        UNION ALL SELECT s2, s1, n FROM cc),
       |und AS MATERIALIZED (
       |  SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b FROM (
       |    SELECT u, v, row_number() OVER (
       |      PARTITION BY u ORDER BY n DESC, v) AS rn FROM dir)
       |  WHERE rn <= $k)""".stripMargin

  private def g04OracleSql(k: Int, rankBase: Long): String =
    s"""WITH ${undCtes(k)},
       |deg AS MATERIALIZED (
       |  SELECT v, count(*) AS d FROM (
       |    SELECT a AS v FROM und UNION ALL SELECT b FROM und) GROUP BY v),
       |rk AS MATERIALIZED (SELECT v, d * $rankBase + v AS r FROM deg),
       |ore AS MATERIALIZED (
       |  SELECT CASE WHEN ra.r < rb.r THEN und.a ELSE und.b END AS src,
       |         CASE WHEN ra.r < rb.r THEN und.b ELSE und.a END AS dst,
       |         greatest(ra.r, rb.r) AS rdst
       |  FROM und JOIN rk ra ON ra.v = und.a JOIN rk rb ON rb.v = und.b),
       |tri AS MATERIALIZED (
       |  SELECT e1.src AS x, e1.dst AS y, e2.dst AS z
       |  FROM ore e1
       |  JOIN ore e2 ON e1.src = e2.src AND e1.rdst < e2.rdst
       |  JOIN ore e3 ON e3.src = e1.dst AND e3.dst = e2.dst),
       |tc AS (SELECT v, count(*) AS t FROM (
       |  SELECT x AS v FROM tri UNION ALL SELECT y FROM tri
       |  UNION ALL SELECT z FROM tri) GROUP BY v)
       |SELECT deg.v AS supp_key, deg.d AS degree,
       |       COALESCE(tc.t, CAST(0 AS BIGINT)) AS tri_cnt
       |FROM deg LEFT JOIN tc ON tc.v = deg.v
       |ORDER BY supp_key""".stripMargin

  /** g08 oracle: the shared `und` prefix + g04's degree-ordered wedge
    * join collapsed to a global triangle count, wedge total Σ C(d,2),
    * degree aggregates, and Pearson assortativity over both edge
    * orientations from exact integer moment sums (CAST back from
    * HUGEINT) with one final double division — NULL-guarded on zero
    * variance in both engines. HUGEINT only ever feeds double
    * divisions or guarded casts, never output columns.
    */
  private def g08OracleSql(k: Int, rankBase: Long): String =
    s"""WITH ${undCtes(k)},
       |deg AS MATERIALIZED (
       |  SELECT v, count(*) AS d FROM (
       |    SELECT a AS v FROM und UNION ALL SELECT b FROM und) GROUP BY v),
       |rk AS MATERIALIZED (SELECT v, d * $rankBase + v AS r FROM deg),
       |ore AS MATERIALIZED (
       |  SELECT CASE WHEN ra.r < rb.r THEN und.a ELSE und.b END AS src,
       |         CASE WHEN ra.r < rb.r THEN und.b ELSE und.a END AS dst,
       |         greatest(ra.r, rb.r) AS rdst
       |  FROM und JOIN rk ra ON ra.v = und.a JOIN rk rb ON rb.v = und.b),
       |tri AS (
       |  SELECT count(*) AS n_triangles
       |  FROM ore e1
       |  JOIN ore e2 ON e1.src = e2.src AND e1.rdst < e2.rdst
       |  JOIN ore e3 ON e3.src = e1.dst AND e3.dst = e2.dst),
       |da AS (SELECT CAST(count(*) AS BIGINT) AS n_vertices,
       |         CAST(max(d) AS BIGINT) AS max_degree,
       |         CAST(sum(d) AS BIGINT) AS sum_d,
       |         sum(d * (d - 1) // 2) AS wedges FROM deg),
       |ea AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM und),
       |nb AS (SELECT a, b FROM und UNION ALL SELECT b, a FROM und),
       |asr AS (
       |  SELECT CAST(count(*) AS BIGINT) AS np,
       |    CAST(sum(dga.d) AS BIGINT) AS sx, CAST(sum(dgb.d) AS BIGINT) AS sy,
       |    CAST(sum(dga.d * dgb.d) AS BIGINT) AS sxy,
       |    CAST(sum(dga.d * dga.d) AS BIGINT) AS sxx,
       |    CAST(sum(dgb.d * dgb.d) AS BIGINT) AS syy
       |  FROM nb JOIN deg dga ON dga.v = nb.a JOIN deg dgb ON dgb.v = nb.b),
       |a2 AS (
       |  SELECT np * sxy - sx * sy AS covn,
       |         np * sxx - sx * sx AS vxn,
       |         np * syy - sy * sy AS vyn
       |  FROM asr)
       |SELECT da.n_vertices, ea.n_edges, da.max_degree,
       |  CASE WHEN da.n_vertices = 0 THEN NULL
       |       ELSE round(CAST(da.sum_d AS DOUBLE) / da.n_vertices, 4)
       |  END AS mean_degree,
       |  CASE WHEN da.wedges = 0 THEN NULL
       |       ELSE round(CAST(tri.n_triangles AS DOUBLE) * 3.0 /
       |                  CAST(da.wedges AS DOUBLE), 4)
       |  END AS global_cc,
       |  CASE WHEN a2.vxn = 0 OR a2.vyn = 0 THEN NULL
       |       ELSE round(CAST(a2.covn AS DOUBLE) /
       |                  sqrt(CAST(a2.vxn AS DOUBLE) * CAST(a2.vyn AS DOUBLE)), 4)
       |  END AS assortativity
       |FROM da, ea, tri, a2""".stripMargin

  /** g07 oracle: the shared `und` prefix, then neighbor lists, the
    * wedge-join candidate count, the adjacency anti-join, and the
    * Jaccard projection — counts CAST to BIGINT (no HUGEINT sums),
    * ranking on the raw count with a (a, b) tiebreak.
    */
  private def g07OracleSql(undK: Int, k: Int): String =
    s"""WITH ${undCtes(undK)},
       |nb AS MATERIALIZED (
       |  SELECT a AS v, b AS nbr FROM und UNION ALL SELECT b, a FROM und),
       |dg AS MATERIALIZED (SELECT v, count(*) AS d FROM nb GROUP BY v),
       |cand AS MATERIALIZED (
       |  SELECT x.v AS a, y.v AS b, count(*) AS cn
       |  FROM nb x JOIN nb y ON x.nbr = y.nbr AND x.v < y.v
       |  GROUP BY 1, 2),
       |nonadj AS (
       |  SELECT c.a, c.b, c.cn FROM cand c
       |  LEFT JOIN und u ON u.a = c.a AND u.b = c.b
       |  WHERE u.a IS NULL)
       |SELECT n.a AS supp_a, n.b AS supp_b,
       |  CAST(n.cn AS BIGINT) AS common_cnt,
       |  round(CAST(n.cn AS DOUBLE) / (da.d + db.d - n.cn), 4) AS jaccard
       |FROM nonadj n
       |JOIN dg da ON da.v = n.a
       |JOIN dg db ON db.v = n.b
       |ORDER BY common_cnt DESC, supp_a, supp_b
       |LIMIT $k""".stripMargin

  /** g05 oracle: unrolls EXACTLY
    * [[graft.operators.Graph.LabelPropIters]] synchronous rounds —
    * per round a (dst, label) count, then min label among the max
    * count (the same argmax the engine's struct-max computes). Labels
    * are node ids (longs); no sums, so no HUGEINT hazard.
    */
  /** g09 oracle: the same bounded h-index iteration as
    * [[graft.operators.Graph.corenessRounds]], unrolled — H-index per
    * round via row_number over neighbor coreness descending +
    * max(least(c, rn)), tie-order invariant, BIGINT end to end.
    */
  private def g09OracleSql(iters: Int): String = {
    val rounds = (1 to iters).map { kk =>
      val prev = if (kk == 1) "c0" else s"c${kk - 1}"
      s"""r$kk AS MATERIALIZED (
         |  SELECT e.src AS id, p.c AS c,
         |    row_number() OVER (PARTITION BY e.src ORDER BY p.c DESC) AS rn
         |  FROM e JOIN $prev p ON p.id = e.dst),
         |c$kk AS MATERIALIZED (
         |  SELECT id, max(least(c, rn)) AS c FROM r$kk GROUP BY id)""".stripMargin
    }.mkString(",\n")
    s"""WITH $gEdgeCtes,
       |c0 AS MATERIALIZED (
       |  SELECT src AS id, count(*) AS c FROM e GROUP BY src),
       |$rounds
       |SELECT CASE WHEN id % 2 = 0 THEN 'c' ELSE 's' END AS node_type,
       |       id // 2 AS entity_key, c AS coreness
       |FROM c$iters ORDER BY node_type, entity_key""".stripMargin
  }

  /** g10 oracle: the walk unrolled hop by hop — ranked neighbor list
    * (row_number over dst ascending), md5₄₈ draw mod degree per
    * (walk, step), one join per hop.
    */
  /** The g10 walk corpus as CTEs ending in `wa(walk_id, step, node)`
    * — shared by the g10 and g11 oracles.
    */
  private def g10WalkCtes(len: Int): String = {
    val hops = (1 to len).map { t =>
      val prev = s"w${t - 1}"
      s"""w$t AS MATERIALIZED (
         |  SELECT p.walk_id, $t AS step, nb.dst AS node
         |  FROM $prev p
         |  JOIN dg ON dg.src = p.node
         |  JOIN nb ON nb.src = p.node AND nb.r = CAST(
         |    ('0x' || substr(md5('walk:' || CAST(p.walk_id AS VARCHAR) || ':$t'),
         |       1, 12))::UBIGINT % dg.deg AS BIGINT))""".stripMargin
    }.mkString(",\n")
    val union = (0 to len).map(t => s"SELECT * FROM w$t").mkString(" UNION ALL ")
    s"""$gEdgeCtes,
       |nb AS MATERIALIZED (
       |  SELECT src, dst,
       |    CAST(row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS BIGINT) AS r
       |  FROM e),
       |dg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
       |w0 AS (SELECT id AS walk_id, 0 AS step, id AS node FROM n),
       |$hops,
       |wa AS ($union)""".stripMargin
  }

  private def g10OracleSql(len: Int): String =
    s"""WITH ${g10WalkCtes(len)}
       |SELECT walk_id, CAST(step AS INTEGER) AS step,
       |       CASE WHEN node % 2 = 0 THEN 'c' ELSE 's' END AS node_type,
       |       node // 2 AS entity_key
       |FROM wa ORDER BY walk_id, step""".stripMargin

  /** The g11 scored-pair CTE chain ending in
    * `sc(a, b, cnt, ppmi_ticks)` — shared by the g11 and s16 oracles.
    */
  private def g11PairCtes(len: Int, window: Int): String =
    s"""${g10WalkCtes(len)},
       |pr AS MATERIALIZED (
       |  SELECT x.node AS a, y.node AS b, CAST(count(*) AS BIGINT) AS cnt
       |  FROM wa x JOIN wa y ON x.walk_id = y.walk_id
       |    AND x.step <> y.step AND abs(x.step - y.step) <= $window
       |  GROUP BY 1, 2),
       |tt AS (SELECT CAST(sum(cnt) AS BIGINT) AS t FROM pr),
       |ma AS (SELECT a, CAST(sum(cnt) AS BIGINT) AS ca FROM pr GROUP BY a),
       |mb AS (SELECT b, CAST(sum(cnt) AS BIGINT) AS cb FROM pr GROUP BY b),
       |sc AS MATERIALIZED (
       |  SELECT pr.a, pr.b, pr.cnt,
       |    CAST(floor(greatest(CAST(0.0 AS DOUBLE),
       |        log2((pr.cnt * tt.t) / CAST(ma.ca * mb.cb AS DOUBLE)))
       |      * 1048576.0 + 0.5) AS BIGINT) AS ppmi_ticks
       |  FROM pr JOIN ma ON pr.a = ma.a JOIN mb ON pr.b = mb.b, tt
       |  WHERE pr.cnt >= 2)""".stripMargin

  /** g11: skip-gram pairs within the window on the shared walk CTEs,
    * partial-agg'd counts and marginals, one log2 per distinct pair.
    */
  private def g11OracleSql(len: Int, window: Int): String =
    s"""WITH ${g11PairCtes(len, window)}
       |SELECT CASE WHEN a % 2 = 0 THEN 'c' ELSE 's' END AS a_type,
       |       a // 2 AS a_key,
       |       CASE WHEN b % 2 = 0 THEN 'c' ELSE 's' END AS b_type,
       |       b // 2 AS b_key, cnt, ppmi_ticks
       |FROM sc WHERE ppmi_ticks > 0
       |ORDER BY a_type, a_key, b_type, b_key""".stripMargin

  /** The g05 label-propagation round chain as CTEs (l0 → l{iters}) —
    * shared verbatim by the g05 and g13 oracles so both score the
    * SAME partition.
    */
  private def g05LabelCtes(iters: Int): String = {
    val rounds = (1 to iters).map { kk =>
      val prev = if (kk == 1) "l0" else s"l${kk - 1}"
      s"""nb$kk AS MATERIALIZED (
         |  SELECT e.dst AS id, l.lab AS lab, count(*) AS c
         |  FROM e JOIN $prev l ON l.id = e.src
         |  GROUP BY 1, 2),
         |mx$kk AS MATERIALIZED (SELECT id, max(c) AS mc FROM nb$kk GROUP BY id),
         |l$kk AS MATERIALIZED (
         |  SELECT nb.id, min(nb.lab) AS lab
         |  FROM nb$kk nb JOIN mx$kk m ON m.id = nb.id AND nb.c = m.mc
         |  GROUP BY nb.id)""".stripMargin
    }.mkString(",\n")
    s"""l0 AS (SELECT id, id AS lab FROM n),
       |$rounds""".stripMargin
  }

  /** g15 oracle: the bounded min-label chain unrolled EXACTLY
    * [[graft.operators.Graph.CcIters]] rounds (each round a min over
    * self ∪ neighbor labels — BIGINT min, no widening), then the
    * component sizes joined back.
    */
  private def g15OracleSql(iters: Int): String = {
    val rounds = (1 to iters).map { kk =>
      val prev = if (kk == 1) "c0" else s"c${kk - 1}"
      s"""c$kk AS MATERIALIZED (
         |  SELECT x.id, min(x.lab) AS lab FROM (
         |    SELECT id, lab FROM $prev
         |    UNION ALL
         |    SELECT e.dst AS id, l.lab FROM e JOIN $prev l ON l.id = e.src) x
         |  GROUP BY x.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH $gEdgeCtes,
       |c0 AS MATERIALIZED (SELECT id, id AS lab FROM n),
       |$rounds,
       |sz AS (SELECT lab, CAST(count(*) AS BIGINT) AS component_size
       |       FROM c$iters GROUP BY lab)
       |SELECT CASE WHEN c.id % 2 = 0 THEN 'c' ELSE 's' END AS node_type,
       |       c.id // 2 AS entity_key,
       |       CASE WHEN c.lab % 2 = 0 THEN 'c' ELSE 's' END AS comp_type,
       |       c.lab // 2 AS comp_key, sz.component_size
       |FROM c$iters c JOIN sz USING (lab)
       |ORDER BY node_type, entity_key""".stripMargin
  }

  private def g05OracleSql(iters: Int): String =
    s"""WITH $gEdgeCtes,
       |${g05LabelCtes(iters)}
       |SELECT CASE WHEN id % 2 = 0 THEN 'c' ELSE 's' END AS node_type,
       |       id // 2 AS entity_key,
       |       CASE WHEN lab % 2 = 0 THEN 'c' ELSE 's' END AS label_type,
       |       lab // 2 AS label_key
       |FROM l$iters ORDER BY node_type, entity_key""".stripMargin

  /** g13 oracle: the g05 label chain scored for modularity — exact
    * BIGINT numerators (sums CAST back down; DuckDB sum() widens to
    * HUGEINT, the round-7 g01 lesson).
    */
  private def g13OracleSql(iters: Int): String =
    s"""WITH $gEdgeCtes,
       |${g05LabelCtes(iters)},
       |lb AS MATERIALIZED (SELECT id, lab FROM l$iters),
       |ec AS (SELECT CAST(count(*) AS BIGINT) AS ee FROM e),
       |intra AS (
       |  SELECT a.lab AS lab, CAST(count(*) AS BIGINT) AS ie
       |  FROM e JOIN lb a ON a.id = e.src JOIN lb b ON b.id = e.dst
       |  WHERE a.lab = b.lab GROUP BY 1),
       |dg AS (
       |  SELECT lb.lab, CAST(count(*) AS BIGINT) AS nodes,
       |         CAST(sum(dd.d) AS BIGINT) AS degree_sum
       |  FROM (SELECT src AS id, count(*) AS d FROM e GROUP BY 1) dd
       |  JOIN lb ON lb.id = dd.id GROUP BY 1)
       |SELECT CASE WHEN dg.lab % 2 = 0 THEN 'c' ELSE 's' END AS label_type,
       |       dg.lab // 2 AS label_key, dg.nodes, dg.degree_sum,
       |       COALESCE(intra.ie, CAST(0 AS BIGINT)) AS intra_edges,
       |       COALESCE(intra.ie, CAST(0 AS BIGINT)) * (SELECT ee FROM ec)
       |         - dg.degree_sum * dg.degree_sum AS q_num
       |FROM dg LEFT JOIN intra ON dg.lab = intra.lab
       |ORDER BY label_type, label_key""".stripMargin

  /** g06 oracle: bounded BFS as a recursive CTE (edge CTEs
    * MATERIALIZED — the HITS multi-reference lesson); the `d < iters`
    * guard replicates the engine's fixed round count exactly, and
    * min(BIGINT) does not widen.
    */
  private def g06OracleSql(seeds: Int, iters: Int): String =
    s"""WITH RECURSIVE $gEdgeCtes,
       |sd AS (SELECT id FROM n WHERE id % 2 = 0 ORDER BY id LIMIT $seeds),
       |r(id, d) AS (
       |  SELECT id, CAST(0 AS BIGINT) FROM sd
       |  UNION
       |  SELECT e.dst, r.d + 1 FROM r JOIN e ON e.src = r.id
       |  WHERE r.d < $iters)
       |SELECT CASE WHEN id % 2 = 0 THEN 'c' ELSE 's' END AS node_type,
       |       id // 2 AS entity_key, min(d) AS hops
       |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** The shared per-landmark BFS CTE chain (ends in the recursive
    * `r(lm, id, d)` reach set) — one definition backs g16's report
    * and g17's closeness aggregation, mirroring the engine-side
    * shared [[graft.operators.Graph.tradeLandmarkDists]] memo.
    */
  private def g16Ctes(seeds: Int, iters: Int): String =
    s"""$gEdgeCtes,
       |sd AS (SELECT id FROM n WHERE id % 2 = 0 ORDER BY id LIMIT $seeds),
       |r(lm, id, d) AS (
       |  SELECT id, id, CAST(0 AS BIGINT) FROM sd
       |  UNION
       |  SELECT r.lm, e.dst, r.d + 1 FROM r JOIN e ON e.src = r.id
       |  WHERE r.d < $iters)""".stripMargin

  /** g16 oracle: the g06 recursion with the landmark id carried
    * through — per-(landmark, node) min instead of min over seeds.
    */
  private def g16OracleSql(seeds: Int, iters: Int): String =
    s"""WITH RECURSIVE ${g16Ctes(seeds, iters)}
       |SELECT CASE WHEN id % 2 = 0 THEN 'c' ELSE 's' END AS node_type,
       |       id // 2 AS entity_key,
       |       CASE WHEN lm % 2 = 0 THEN 'c' ELSE 's' END AS landmark_type,
       |       lm // 2 AS landmark_key, min(d) AS hops
       |FROM r GROUP BY 1, 2, 3, 4 ORDER BY 1, 2, 3, 4""".stripMargin

  /** g17 oracle: the g16 chain's minimal distances aggregated into
    * the closeness/harmonic estimates — d ≥ 1 filter, exact integer
    * tick divisions (`//` ≡ Spark `div` on the all-positive terms).
    */
  private def g17OracleSql(seeds: Int, iters: Int): String =
    s"""WITH RECURSIVE ${g16Ctes(seeds, iters)},
       |m AS (SELECT lm, id, min(d) AS d FROM r GROUP BY 1, 2)
       |SELECT CASE WHEN id % 2 = 0 THEN 'c' ELSE 's' END AS node_type,
       |       id // 2 AS entity_key,
       |       count(*) AS n_landmarks,
       |       CAST(sum(d) AS BIGINT) AS sum_hops,
       |       (count(*) * 1048576) // CAST(sum(d) AS BIGINT) AS close_ticks,
       |       CAST(sum(1048576 // d) AS BIGINT) AS harm_ticks
       |FROM m WHERE d >= 1
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** g14 oracle: the seeded bounded-Brandes passes unrolled — forward
    * levels with exact σ sums and anti-join distance filters, then
    * the backward tick accumulation with the same `//` truncation.
    */
  private def g14OracleSql(seeds: Int, iters: Int, scale: Long): String = {
    val fwd = (1 to iters).map { t =>
      val prior = (0 until t).map(p =>
        s"NOT EXISTS (SELECT 1 FROM f$p p WHERE p.seed = c.seed AND p.v = c.v)")
        .mkString(" AND ")
      s"""c$t AS (SELECT f.seed, e.dst AS v, CAST(sum(f.sig) AS BIGINT) AS sig
         |  FROM f${t - 1} f JOIN e ON e.src = f.v GROUP BY 1, 2),
         |f$t AS MATERIALIZED (SELECT c.seed, c.v, c.sig FROM c$t c
         |  WHERE $prior)""".stripMargin
    }.mkString(",\n")
    val bwd = ((iters - 1) to 1 by -1).map { t =>
      s"""ct$t AS (
         |  SELECT f.seed, f.v,
         |    CAST(sum((f.sig * ($scale + d.del)) // w.sig) AS BIGINT) AS s
         |  FROM f$t f JOIN e ON e.src = f.v
         |  JOIN f${t + 1} w ON w.seed = f.seed AND w.v = e.dst
         |  JOIN d${t + 1} d ON d.seed = w.seed AND d.v = w.v
         |  GROUP BY 1, 2),
         |d$t AS MATERIALIZED (
         |  SELECT f.seed, f.v, COALESCE(ct$t.s, CAST(0 AS BIGINT)) AS del
         |  FROM f$t f LEFT JOIN ct$t
         |    ON ct$t.seed = f.seed AND ct$t.v = f.v)""".stripMargin
    }.mkString(",\n")
    val unions = (1 to iters).map(t => s"SELECT seed, v, del FROM d$t")
      .mkString("\n  UNION ALL\n  ")
    s"""WITH $gEdgeCtes,
       |sd AS (SELECT id FROM n WHERE id % 2 = 0 ORDER BY id LIMIT $seeds),
       |f0 AS MATERIALIZED (
       |  SELECT id AS seed, id AS v, CAST(1 AS BIGINT) AS sig FROM sd),
       |$fwd,
       |d$iters AS (SELECT seed, v, CAST(0 AS BIGINT) AS del FROM f$iters),
       |$bwd
       |SELECT CASE WHEN v % 2 = 0 THEN 'c' ELSE 's' END AS node_type,
       |       v // 2 AS entity_key, CAST(sum(del) AS BIGINT) AS bc_ticks
       |FROM ($unions)
       |GROUP BY 1, 2
       |ORDER BY node_type, entity_key""".stripMargin
  }

  /** s09 oracle: unrolls EXACTLY [[graft.operators.Similarity.MmrK]]
    * greedy MMR selections over the top-`pool` pool. All-integer
    * score arithmetic (`7·rel_t − 3·max_sim_t`, λ = 0.7 scaled by
    * 10 — deliberately NO division: integer div truncates toward
    * zero in Spark but floors in DuckDB on negative scores); cosine
    * ticks are `floor(cos · 2^20 + 0.5)` cast BIGINT, the s08
    * contract. Ties to the smaller vec_id at every argmax.
    */
  private def s09OracleSql(k: Int, pool: Int): String = {
    val steps = (1 to k).map { i =>
      val prev = s"sel${i - 1}"
      s"""c$i AS (
         |  SELECT p.vec_id, p.rel_t,
         |    (SELECT max(s.sim_t) FROM sims s WHERE s.a = p.vec_id
         |       AND s.b IN (SELECT id FROM $prev)) AS ms
         |  FROM pool p WHERE p.vec_id NOT IN (SELECT id FROM $prev)),
         |pick$i AS (
         |  SELECT vec_id, rel_t, 7 * rel_t - 3 * COALESCE(ms, 0) AS mmr_t
         |  FROM c$i ORDER BY mmr_t DESC, vec_id LIMIT 1),
         |sel$i AS (SELECT * FROM $prev UNION ALL
         |  SELECT vec_id AS id, CAST($i AS BIGINT) AS rank, rel_t, mmr_t
         |  FROM pick$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH mq AS (SELECT min(vec_id) AS qid FROM embeddings),
       |qq AS (SELECT embedding AS qv FROM embeddings
       |       WHERE vec_id = (SELECT qid FROM mq)),
       |rel AS MATERIALIZED (
       |  SELECT e.vec_id, e.embedding,
       |    CAST(floor(${cosSql("e.embedding", "q.qv")} * 1048576.0 + 0.5)
       |      AS BIGINT) AS rel_t
       |  FROM embeddings e CROSS JOIN qq q
       |  WHERE e.vec_id <> (SELECT qid FROM mq)),
       |pool AS MATERIALIZED (
       |  SELECT vec_id, embedding, rel_t FROM (
       |    SELECT vec_id, embedding, rel_t,
       |      row_number() OVER (ORDER BY rel_t DESC, vec_id) AS rn
       |    FROM rel) WHERE rn <= $pool),
       |sims AS MATERIALIZED (
       |  SELECT a.vec_id AS a, b.vec_id AS b,
       |    CAST(floor(${cosSql("a.embedding", "b.embedding")} * 1048576.0 + 0.5)
       |      AS BIGINT) AS sim_t
       |  FROM pool a JOIN pool b ON a.vec_id <> b.vec_id),
       |sel0 AS (SELECT CAST(NULL AS BIGINT) AS id, CAST(NULL AS BIGINT) AS rank,
       |  CAST(NULL AS BIGINT) AS rel_t, CAST(NULL AS BIGINT) AS mmr_t
       |  WHERE false),
       |$steps
       |SELECT rank, id AS vec_id, rel_t AS rel_ticks, mmr_t AS mmr_ticks
       |FROM sel$k ORDER BY rank""".stripMargin
  }

  /** The q53/q54 shared grid-CDF replication of
    * [[graft.operators.Events.tickCdf]]: per-(type, tick) counts on
    * the q52 1024-tick grid, completed to the common grid with
    * per-type running cumulatives. count(*) is BIGINT; sum() is CAST
    * back down (the HUGEINT lesson).
    */
  private val tickCdfOracleCtes: String =
    """ct AS MATERIALIZED (
      |  SELECT event_type AS t, CAST(floor(value * 1024.0) AS BIGINT) AS tick,
      |    CAST(count(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |grid AS (SELECT DISTINCT tick FROM ct),
      |ty AS (SELECT t, CAST(sum(c) AS BIGINT) AS n FROM ct GROUP BY 1),
      |cd AS MATERIALIZED (
      |  SELECT g.tick, ty.t, ty.n,
      |    COALESCE(ct.c, CAST(0 AS BIGINT)) AS c,
      |    CAST(sum(COALESCE(ct.c, 0)) OVER (PARTITION BY ty.t ORDER BY g.tick
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      |  FROM grid g CROSS JOIN ty
      |  LEFT JOIN ct ON ct.t = ty.t AND ct.tick = g.tick)""".stripMargin

  /** q31's session-assembly replication (CTEs e → f → g: typed
    * events, 30-min-gap flags, running session ids) — shared by the
    * q31 oracle and j04's session side.
    */
  private val sessionizeOracleCtes: String =
    """e AS (SELECT event_id, user_id, value, CAST(ts AS TIMESTAMP) AS ts FROM events),
      |f AS (SELECT *, CASE WHEN prev_us IS NULL
      |                     OR epoch_us(ts) - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_sess
      |      FROM (SELECT *, lag(epoch_us(ts)) OVER
      |              (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us FROM e)),
      |g AS (SELECT *, CAST(sum(new_sess) OVER
      |        (PARTITION BY user_id ORDER BY ts, event_id
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |      FROM f)""".stripMargin

  /** SQ8 oracle CTEs shared by s10/s11: the int8 grid (per-dim
    * min/max over the corpus), the quantize-dequantize mapping
    * (floor(+0.5) round-half-up — the INT cast sees an already-
    * integral double, so DuckDB's rounding cast and Spark's
    * truncating cast agree; double→float is round-to-nearest-even in
    * both engines), and the quantized pairwise cosine `p`.
    */
  private val sq8OracleCtes: String =
    """dims AS (
      |  SELECT ix.i AS i, min(CAST(e.embedding[ix.i] AS DOUBLE)) AS mn,
      |         max(CAST(e.embedding[ix.i] AS DOUBLE)) AS mx
      |  FROM embeddings e, (SELECT unnest(range(1, 65)) AS i) ix
      |  GROUP BY ix.i),
      |mm AS (SELECT list(mn ORDER BY i) AS mins, list(mx ORDER BY i) AS maxs FROM dims),
      |dqq AS (
      |  SELECT e.vec_id,
      |    list_transform(range(1, 65), i ->
      |      CAST(CASE WHEN mm.maxs[i] = mm.mins[i] THEN mm.mins[i]
      |        ELSE mm.mins[i] + least(255, greatest(0,
      |          CAST(floor((CAST(e.embedding[i] AS DOUBLE) - mm.mins[i]) * 255.0 /
      |                     (mm.maxs[i] - mm.mins[i]) + 0.5) AS INTEGER)))
      |          * (mm.maxs[i] - mm.mins[i]) / 255.0
      |      END AS FLOAT)) AS dq
      |  FROM embeddings e, mm),
      |q AS (SELECT vec_id AS query_id, dq AS qv FROM dqq WHERE vec_id < 5),
      |p AS (SELECT q.query_id, d.vec_id,
      |        list_sum(list_transform(range(1, 65),
      |          i -> CAST(q.qv[i] AS DOUBLE) * CAST(d.dq[i] AS DOUBLE))) AS dot,
      |        sqrt(list_sum(list_transform(range(1, 65),
      |          i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))) AS nq,
      |        sqrt(list_sum(list_transform(range(1, 65),
      |          i -> CAST(d.dq[i] AS DOUBLE) * CAST(d.dq[i] AS DOUBLE)))) AS nv
      |      FROM dqq d CROSS JOIN q
      |      WHERE d.vec_id <> q.query_id)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "s09_mmr_select" -> s09OracleSql(
      graft.operators.Similarity.MmrK, graft.operators.Similarity.MmrPool),
    "g04_triangles" -> g04OracleSql(
      graft.operators.Graph.TriTopK, graft.operators.Graph.RankBase),
    "g08_graph_profile" -> g08OracleSql(
      graft.operators.Graph.TriTopK, graft.operators.Graph.RankBase),
    "g07_linkpred" -> g07OracleSql(
      graft.operators.Graph.TriTopK, graft.operators.Graph.LinkTopK),
    "g05_labelprop" -> g05OracleSql(
      graft.operators.Graph.LabelPropIters),
    "g15_components" -> g15OracleSql(
      graft.operators.Graph.CcIters),
    // g19 oracle: an INDEPENDENT formulation — recursive-CTE
    // reachability closure + mutual-pair minimum (scc(v) = min of v
    // and every u with v⇝u AND u⇝v) — so the gate cross-checks the
    // engine's coloring algorithm, not a re-rendering of it. DuckDB
    // quirk honored: under WITH RECURSIVE a plain UNION in ANY CTE
    // loses its dedup, so the non-recursive CTEs dedup via
    // DISTINCT-over-UNION-ALL subqueries only.
    "g19_scc" ->
      s"""WITH RECURSIVE p AS (
         |  SELECT o.o_custkey * 2 AS a, l.l_suppkey * 2 + 1 AS b,
         |         count(*) AS cnt
         |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         |  GROUP BY 1, 2),
         |e AS (
         |  SELECT a AS src, b AS dst FROM p
         |  UNION ALL
         |  SELECT b, a FROM p WHERE cnt >= ${graft.operators.Graph.SccBackMinCount}),
         |nodes AS (SELECT DISTINCT id FROM
         |  (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
         |reach(s, d) AS (
         |  SELECT src, dst FROM e
         |  UNION
         |  SELECT r.s, e2.dst FROM reach r JOIN e e2 ON r.d = e2.src),
         |mut AS (
         |  SELECT a.s AS v, min(a.d) AS mn
         |  FROM reach a JOIN reach b ON a.s = b.d AND a.d = b.s
         |  GROUP BY a.s),
         |lab AS (
         |  SELECT n.id, least(n.id, coalesce(m.mn, n.id)) AS scc
         |  FROM nodes n LEFT JOIN mut m ON m.v = n.id),
         |sz AS (SELECT scc, CAST(count(*) AS BIGINT) AS scc_size
         |       FROM lab GROUP BY scc)
         |SELECT CASE WHEN l.id % 2 = 0 THEN 'c' ELSE 's' END AS node_type,
         |  l.id // 2 AS entity_key,
         |  CASE WHEN l.scc % 2 = 0 THEN 'c' ELSE 's' END AS scc_type,
         |  l.scc // 2 AS scc_key, sz.scc_size
         |FROM lab l JOIN sz USING (scc)
         |ORDER BY node_type, entity_key""".stripMargin,
    "g13_modularity" -> g13OracleSql(
      graft.operators.Graph.LabelPropIters),
    "g14_betweenness" -> g14OracleSql(
      graft.operators.Graph.SsspSeeds, graft.operators.Graph.BetwIters,
      graft.operators.Graph.BetwScale),
    "g09_kcore" -> g09OracleSql(
      graft.operators.Graph.KcoreIters),
    "g10_random_walks" -> g10OracleSql(graft.operators.Graph.WalkLen),
    "g11_walk_cooccurrence" -> g11OracleSql(graft.operators.Graph.WalkLen,
      graft.operators.Graph.SkipWindow),
    "g12_power_iter_clustering" -> g12OracleSql(
      graft.operators.Graph.PicIters, graft.operators.Graph.PicKmeansIters),
    // s16: g11's pair CTEs feeding the shared ALS rounds chain — the
    // DeepWalk composition verified end-to-end in one statement.
    "s16_walk_embeddings" -> Recommend.s16OracleSql(
      g11PairCtes(graft.operators.Graph.WalkLen,
        graft.operators.Graph.SkipWindow)),
    "g16_landmark_paths" -> g16OracleSql(
      graft.operators.Graph.SsspSeeds, graft.operators.Graph.SsspIters),
    "g17_closeness" -> g17OracleSql(
      graft.operators.Graph.SsspSeeds, graft.operators.Graph.SsspIters),
    // g18: degree join over the shared edge CTEs, six exact long
    // moments, the interpolated AssortTreeSql.
    "g18_assortativity" ->
      s"""WITH $gEdgeCtes,
         |dg AS MATERIALIZED (
         |  SELECT src AS id, CAST(count(*) AS BIGINT) AS d
         |  FROM e GROUP BY src),
         |pe AS (SELECT dx.d AS x, dy.d AS y
         |  FROM e JOIN dg dx ON dx.id = e.src JOIN dg dy ON dy.id = e.dst),
         |ag AS (SELECT CAST(count(*) AS BIGINT) AS m_edges,
         |  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |  CAST(sum(x * x) AS BIGINT) AS sxx,
         |  CAST(sum(y * y) AS BIGINT) AS syy,
         |  CAST(sum(x * y) AS BIGINT) AS sxy FROM pe)
         |SELECT m_edges, sx, sy, sxx, syy, sxy,
         |  ${graft.operators.Graph.AssortTreeSql} AS r_ticks
         |FROM ag""".stripMargin,
    "g06_sssp" -> g06OracleSql(
      graft.operators.Graph.SsspSeeds, graft.operators.Graph.SsspIters),
    "g03_ppr" -> g03OracleSql(
      graft.operators.Graph.PageRankIters, graft.operators.Graph.RankScale),
    "g01_pagerank" -> g01OracleSql(
      graft.operators.Graph.PageRankIters, graft.operators.Graph.RankScale),
    "g02_hits" -> g02OracleSql(
      graft.operators.Graph.HitsIters, graft.operators.Graph.HitsScale),
    "d19_span_dedup" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[ \n\t\r]+'), t -> t <> '') AS t
        |  FROM documents),
        |wn AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, greatest(len(t) - 7, 0) + 1),
        |      i -> ('0x' || substr(md5(array_to_string(t[i:i+7], ' ')), 1, 12))::UBIGINT)) AS wh
        |  FROM tk),
        |rep AS (
        |  SELECT wh FROM (
        |    SELECT wh, count(*) AS nd
        |    FROM (SELECT DISTINCT wh, doc_id FROM wn) GROUP BY wh)
        |  WHERE nd >= 2),
        |tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows FROM wn GROUP BY doc_id),
        |dup AS (SELECT wn.doc_id, CAST(count(*) AS BIGINT) AS n_dup_windows
        |        FROM wn JOIN rep USING (wh) GROUP BY wn.doc_id)
        |SELECT d.doc_id,
        |  COALESCE(tot.n_windows, 0) AS n_windows,
        |  COALESCE(dup.n_dup_windows, 0) AS n_dup_windows,
        |  CASE WHEN COALESCE(tot.n_windows, 0) > 0
        |       THEN round(COALESCE(dup.n_dup_windows, 0) / CAST(tot.n_windows AS DOUBLE), 4)
        |       ELSE 0.0 END AS dup_fraction
        |FROM documents d
        |LEFT JOIN tot ON tot.doc_id = d.doc_id
        |LEFT JOIN dup ON dup.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "t14_tfidf" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[ \n\t\r]+'), t -> t <> '') AS t
        |  FROM documents),
        |tok AS (SELECT doc_id, unnest(t) AS token FROM tk),
        |tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
        |       FROM tok GROUP BY doc_id, token),
        |dfr AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY token),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |sc AS (SELECT tf.doc_id, tf.token, tf.tf,
        |         round(tf.tf * (round(ln((n.n_docs + 1.0) / (dfr.df + 1.0)), 4) + 1.0), 4) AS tfidf
        |       FROM tf JOIN dfr ON dfr.token = tf.token, n),
        |r AS (SELECT doc_id, token, tf, tfidf,
        |        CAST(row_number() OVER (PARTITION BY doc_id
        |                                ORDER BY tfidf DESC, token) AS BIGINT) AS rank
        |      FROM sc)
        |SELECT doc_id, token, tf, tfidf, rank FROM r
        |WHERE rank <= 5 ORDER BY doc_id, rank""".stripMargin,
    "s04_kmeans" -> s04OracleSql(graft.operators.Similarity.KmeansIters),
    "s23_silhouette" -> s23OracleSql(graft.operators.Similarity.KmeansIters),
    "s30_silhouette_exact" -> s30OracleSql(graft.operators.Similarity.KmeansIters),
    "s31_dimsum_sampled" -> graft.operators.Similarity.s31OracleSql,
    "s21_bisecting_kmeans" -> s21OracleSql(
      graft.operators.Similarity.BisectSplits,
      graft.operators.Similarity.BisectLloyd),
    "s22_tfidf_search" -> graft.operators.Similarity.s22OracleSql(
      graft.operators.TextAnalysis.htfOracleCtes),
    "s14_pq_ann" -> s14OracleSql(
      graft.operators.Similarity.PqIters, graft.operators.Similarity.PqM,
      graft.operators.Similarity.PqSubDim, graft.operators.Similarity.PqK,
      graft.operators.Similarity.PqTick),
    "s17_pca" -> graft.operators.Similarity.pcaOracleSql,
    "s18_pca_ann" -> graft.operators.Similarity.s18OracleSql,
    // s34: the pca chain on the uncentered Gram + sigma/projection.
    "s34_svd" -> graft.operators.Similarity.svdOracleSql,
    "s19_corr_matrix" -> graft.operators.Similarity.s19OracleSql,
    // s26: grid-CDF midranks, centered rank Gram, the s19 tree.
    "s26_spearman" -> graft.operators.Similarity.s26OracleSql,
    // s27: hard-EM rounds unrolled, model-entry log trees shared.
    "s27_gmm" -> graft.operators.Similarity.s27OracleSql,
    "s35_gmm_soft" -> graft.operators.Similarity.s35OracleSql,
    // s29: uncentered moment scan + the shared cosine tree.
    "s29_col_similarity" -> graft.operators.Similarity.s29OracleSql,
    "d11_dedup_semantic" -> d11OracleSql(
      graft.operators.Similarity.KmeansIters, graft.operators.Similarity.SemBar,
      graft.operators.Similarity.SemProbes),
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base_price,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        | round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        | round(avg(l_quantity), 4) AS avg_qty,
        | round(avg(l_extendedprice), 4) AS avg_price,
        | round(avg(l_discount), 4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_project" ->
      """SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1997-02-01 00:00:00'
        |  AND l_quantity < 4
        |ORDER BY l_orderkey, l_partkey, l_quantity, l_extendedprice""".stripMargin,
    "q03_join_agg_topk" ->
      """SELECT l_orderkey, o_orderdate,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q04_semijoin" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q05_multiway_join" ->
      """SELECT n_name,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,
    "q06_selective_agg" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q07_antijoin" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
        |ORDER BY c_custkey""".stripMargin,
    "q08_window_rank" ->
      """SELECT s_suppkey, s_name, s_nationkey, s_acctbal,
        | rank() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC) AS bal_rank
        |FROM supplier
        |ORDER BY s_nationkey, bal_rank, s_suppkey""".stripMargin,
    "q09_window_running" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        | round(sum(o_totalprice) OVER (
        |   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
        |FROM orders
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "q10_distinct_agg" ->
      """SELECT l_returnflag,
        | count(DISTINCT l_partkey) AS n_parts,
        | count(DISTINCT l_suppkey) AS n_supps,
        | count(*) AS n_rows
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q11_group_having" ->
      """SELECT l_partkey, round(sum(l_quantity), 2) AS total_qty
        |FROM lineitem
        |GROUP BY l_partkey
        |HAVING sum(l_quantity) > 450
        |ORDER BY l_partkey""".stripMargin,
    "q12_case_agg" ->
      """SELECT o_orderpriority,
        | count(CASE WHEN o_totalprice > 200000 THEN 1 END) AS high_count,
        | count(CASE WHEN o_totalprice <= 200000 THEN 1 END) AS low_count
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q13_outerjoin_dist" ->
      """SELECT c_count, count(*) AS custdist
        |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
        |      FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |      GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q14_union_agg" ->
      """SELECT src, round(sum(bal), 2) AS total_bal, count(*) AS n
        |FROM (SELECT 'customer' AS src, c_acctbal AS bal FROM customer
        |      UNION ALL
        |      SELECT 'supplier' AS src, s_acctbal AS bal FROM supplier)
        |GROUP BY src
        |ORDER BY src""".stripMargin,
    "q15_intersect" ->
      """SELECT 'both' AS tag, nkey
        |FROM (SELECT c_nationkey AS nkey FROM customer
        |      INTERSECT
        |      SELECT s_nationkey AS nkey FROM supplier)
        |UNION ALL
        |SELECT 'cust_only' AS tag, nkey
        |FROM (SELECT c_nationkey AS nkey FROM customer
        |      EXCEPT
        |      SELECT s_nationkey AS nkey FROM supplier)
        |ORDER BY tag, nkey""".stripMargin,
    "q16_scalar_subquery" ->
      """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#1'
        |  AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
        |                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin,
    "q17_in_subquery" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate,
        | round(o_totalprice, 2) AS total
        |FROM customer
        |JOIN orders ON o_custkey = c_custkey
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
        |                     GROUP BY l_orderkey HAVING sum(l_quantity) > 150)
        |ORDER BY total DESC, o_orderkey""".stripMargin,
    "q18_rollup" ->
      """SELECT n_name, c_mktsegment,
        | round(sum(c_acctbal), 2) AS total_bal, count(*) AS n_cust
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP(n_name, c_mktsegment)
        |ORDER BY n_name NULLS FIRST, c_mktsegment NULLS FIRST""".stripMargin,
    "q19_string_funcs" ->
      """SELECT p_partkey,
        | upper(p_name) AS name_u,
        | substr(p_name, 1, 6) AS name6,
        | length(p_name) AS name_len,
        | regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowel,
        | concat(p_brand, '/', p_type) AS brand_type
        |FROM part
        |WHERE p_name LIKE 'red%' OR p_type LIKE '%ECONOMY%'
        |ORDER BY p_partkey""".stripMargin,
    "q20_date_funcs" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
        | year(o_orderdate) AS order_year,
        | month(o_orderdate) AS order_mon,
        | count(*) AS n_orders,
        | round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY 1, 2, 3
        |ORDER BY order_month""".stripMargin,
    "q21_topk_pergroup" ->
      """SELECT o_orderpriority, o_orderkey, total, rn
        |FROM (SELECT o_orderpriority, o_orderkey,
        |       round(o_totalprice, 2) AS total,
        |       row_number() OVER (PARTITION BY o_orderpriority
        |                          ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |      FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_orderpriority, rn""".stripMargin,
    "q22_pivot" ->
      """SELECT o_orderpriority,
        | count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS "F",
        | count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS "O",
        | count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS "P"
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q23_join_skew_salt" ->
      """SELECT o_orderstatus, count(*) AS n,
        | round(sum(l_extendedprice), 2) AS total
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    "q24_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        | round(sum(l_quantity), 2) AS qty
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q25_percentile" ->
      """SELECT o_orderpriority,
        | round(quantile_cont(o_totalprice, 0.25), 2) AS p25,
        | round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
        | round(quantile_cont(o_totalprice, 0.75), 2) AS p75
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q26_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  round(sum(l_extendedprice), 2) AS total
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
        |                        (l_returnflag, l_linestatus))
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q27_ntile_window" ->
      """WITH q AS (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    ntile(4) OVER (PARTITION BY o_orderpriority
        |                   ORDER BY o_totalprice, o_orderkey) AS quartile
        |  FROM orders)
        |SELECT o_orderpriority, quartile, count(*) AS n,
        |  round(min(o_totalprice), 2) AS min_price,
        |  round(max(o_totalprice), 2) AS max_price
        |FROM q
        |GROUP BY o_orderpriority, quartile
        |ORDER BY o_orderpriority, quartile""".stripMargin,
    "q28_setops_all" ->
      """WITH surplus AS (
        |  SELECT nkey, count(*) AS n_surplus
        |  FROM (SELECT c_nationkey AS nkey FROM customer
        |        EXCEPT ALL
        |        SELECT s_nationkey AS nkey FROM supplier)
        |  GROUP BY nkey),
        |common AS (
        |  SELECT nkey, count(*) AS n_common
        |  FROM (SELECT c_nationkey AS nkey FROM customer
        |        INTERSECT ALL
        |        SELECT s_nationkey AS nkey FROM supplier)
        |  GROUP BY nkey)
        |SELECT coalesce(s.nkey, c.nkey) AS nkey,
        |  CAST(coalesce(s.n_surplus, 0) AS BIGINT) AS n_surplus,
        |  CAST(coalesce(c.n_common, 0) AS BIGINT) AS n_common
        |FROM surplus s FULL OUTER JOIN common c ON s.nkey = c.nkey
        |ORDER BY nkey""".stripMargin,
    "q29_range_window" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  round(sum(o_totalprice) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate
        |    RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW), 2) AS spend_30d
        |FROM orders
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    // q34 oracle checks exact columns by hash and the approx columns
    // by their error-bound contract (booleans) — sketch outputs are
    // engine-specific by construction.
    "q34_approx_agg" ->
      """SELECT o_orderpriority,
        |  count(DISTINCT o_custkey) AS exact_custs,
        |  TRUE AS approx_distinct_ok,
        |  round(quantile_cont(o_totalprice, 0.5), 2) AS p50_exact,
        |  TRUE AS approx_p50_ok
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q35_window_suite" ->
      """SELECT s_suppkey, s_nationkey,
        |  round(s_acctbal, 2) AS bal,
        |  dense_rank() OVER win AS drank,
        |  round(percent_rank() OVER win, 4) AS prank,
        |  round(cume_dist() OVER win, 4) AS cdist,
        |  round(lag(s_acctbal, 1) OVER win, 2) AS prev_bal,
        |  round(lead(s_acctbal, 1) OVER win, 2) AS next_bal
        |FROM supplier
        |WINDOW win AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
        |ORDER BY s_nationkey, drank, s_suppkey""".stripMargin,
    "q37_lateral" ->
      """SELECT o.o_orderkey, o.o_orderpriority,
        |  l.n_items, round(l.max_price, 2) AS max_price
        |FROM orders o,
        |LATERAL (SELECT count(*) AS n_items, max(l_extendedprice) AS max_price
        |         FROM lineitem WHERE l_orderkey = o.o_orderkey) l
        |WHERE o.o_totalprice > 400000
        |ORDER BY o.o_orderkey""".stripMargin,
    // q36: unpivot-of-pivot keeps zero-count combinations — the
    // oracle materializes priority × {F,O,P} and left-joins counts.
    "q36_unpivot" ->
      """WITH g AS (SELECT o_orderpriority, o_orderstatus, count(*) AS n
        |           FROM orders GROUP BY 1, 2),
        |pr AS (SELECT DISTINCT o_orderpriority FROM orders),
        |st(o_orderstatus) AS (VALUES ('F'), ('O'), ('P'))
        |SELECT pr.o_orderpriority, st.o_orderstatus,
        |  CAST(coalesce(g.n, 0) AS BIGINT) AS n
        |FROM pr CROSS JOIN st
        |LEFT JOIN g USING (o_orderpriority, o_orderstatus)
        |ORDER BY o_orderpriority, o_orderstatus""".stripMargin,
    "q30_event_window_agg" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS win_start, event_type,
        | count(*) AS n, round(sum(value), 2) AS total_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY win_start, event_type""".stripMargin,
    // q67: the engine's tick recurrence unrolled as a recursive CTE;
    // epoch_us comparisons mirror Spark's microsecond timestamp read
    // (events.ts is nanosecond parquet). Non-recursive CTEs under
    // WITH RECURSIVE avoid bare UNION (the DuckDB dedup quirk).
    "q67_kaplan_meier" ->
      """WITH RECURSIVE s0 AS (
        |  SELECT user_id, min(ts) AS t0 FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |p0 AS (
        |  SELECT e.user_id, min(e.ts) AS tp
        |  FROM events e JOIN s0 ON s0.user_id = e.user_id
        |  WHERE e.event_type = 'purchase'
        |    AND epoch_us(e.ts) >= epoch_us(s0.t0)
        |  GROUP BY 1),
        |subj AS (
        |  SELECT CAST(s0.user_id % 4 AS BIGINT) AS cohort,
        |    CASE WHEN tp IS NOT NULL AND
        |      date_diff('day', CAST(t0 AS DATE), CAST(tp AS DATE)) + 1 <= 8
        |      THEN CAST(date_diff('day', CAST(t0 AS DATE), CAST(tp AS DATE))
        |           + 1 AS BIGINT)
        |      ELSE CAST(8 AS BIGINT) END AS t_obs,
        |    CASE WHEN tp IS NOT NULL AND
        |      date_diff('day', CAST(t0 AS DATE), CAST(tp AS DATE)) + 1 <= 8
        |      THEN 1 ELSE 0 END AS is_event
        |  FROM s0 LEFT JOIN p0 ON p0.user_id = s0.user_id),
        |grid AS (
        |  SELECT cohort, CAST(a.t AS BIGINT) AS t
        |  FROM (SELECT DISTINCT cohort FROM subj),
        |       UNNEST(generate_series(1, 8)) AS a(t)),
        |cnt AS (
        |  SELECT cohort, t_obs AS t, CAST(sum(is_event) AS BIGINT) AS d,
        |    CAST(sum(1 - is_event) AS BIGINT) AS c
        |  FROM subj GROUP BY 1, 2),
        |dense AS (
        |  SELECT g.cohort, g.t, coalesce(d, 0) AS d, coalesce(c, 0) AS c
        |  FROM grid g LEFT JOIN cnt ON cnt.cohort = g.cohort AND cnt.t = g.t),
        |km AS (
        |  SELECT cohort, t, d, c,
        |    CAST(sum(d + c) OVER (PARTITION BY cohort ORDER BY t DESC)
        |         AS BIGINT) AS n
        |  FROM dense),
        |rec AS (
        |  SELECT cohort, CAST(0 AS BIGINT) AS t, CAST(16777216 AS BIGINT) AS s
        |  FROM (SELECT DISTINCT cohort FROM km)
        |  UNION ALL
        |  SELECT r.cohort, k.t,
        |    (r.s * (16777216 - (k.d * 16777216) // greatest(k.n, 1)))
        |      // 16777216
        |  FROM rec r JOIN km k ON k.cohort = r.cohort AND k.t = r.t + 1
        |  WHERE r.t < 8)
        |SELECT km.cohort AS cohort, km.t AS t, km.n AS n_risk,
        |  km.d AS d_events, km.c AS c_censored, rec.s AS surv_ticks
        |FROM km JOIN rec ON rec.cohort = km.cohort AND rec.t = km.t
        |ORDER BY 1, 2""".stripMargin,
    // q68 oracle: the EXACT censoring table (per-cohort subject /
    // event / censor counts + t_obs sum, from the same subjects
    // derivation as q67) checks by hash; the transcendental Weibull
    // fit checks by its boolean contracts — ascent trace, strict
    // improvement over the moment start, KM-band goodness of fit —
    // which the oracle pins TRUE (the q34 posture).
    "q68_aft_weibull" ->
      """WITH s0 AS (
        |  SELECT user_id, min(ts) AS t0 FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |p0 AS (
        |  SELECT e.user_id, min(e.ts) AS tp
        |  FROM events e JOIN s0 ON s0.user_id = e.user_id
        |  WHERE e.event_type = 'purchase'
        |    AND epoch_us(e.ts) >= epoch_us(s0.t0)
        |  GROUP BY 1),
        |subj AS (
        |  SELECT CAST(s0.user_id % 4 AS BIGINT) AS cohort,
        |    CASE WHEN tp IS NOT NULL AND
        |      date_diff('day', CAST(t0 AS DATE), CAST(tp AS DATE)) + 1 <= 8
        |      THEN CAST(date_diff('day', CAST(t0 AS DATE), CAST(tp AS DATE))
        |           + 1 AS BIGINT)
        |      ELSE CAST(8 AS BIGINT) END AS t_obs,
        |    CASE WHEN tp IS NOT NULL AND
        |      date_diff('day', CAST(t0 AS DATE), CAST(tp AS DATE)) + 1 <= 8
        |      THEN 1 ELSE 0 END AS is_event
        |  FROM s0 LEFT JOIN p0 ON p0.user_id = s0.user_id)
        |SELECT cohort,
        |  CAST(count(*) AS BIGINT) AS n_subj,
        |  CAST(sum(is_event) AS BIGINT) AS d_events,
        |  CAST(sum(1 - is_event) AS BIGINT) AS c_censored,
        |  CAST(sum(t_obs) AS BIGINT) AS t_sum,
        |  TRUE AS ll_ascent_ok,
        |  TRUE AS fit_improved_ok,
        |  TRUE AS km_band_ok
        |FROM subj GROUP BY 1
        |ORDER BY 1""".stripMargin,
    "q41_retention_cohorts" ->
      """WITH w AS (
        |  SELECT user_id,
        |    CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS week
        |  FROM events),
        |f AS (SELECT user_id, min(week) AS cohort_week FROM w GROUP BY user_id)
        |SELECT f.cohort_week,
        |  CAST(date_diff('day', f.cohort_week, w.week) // 7 AS INT) AS week_offset,
        |  CAST(count(DISTINCT w.user_id) AS BIGINT) AS n_users
        |FROM w JOIN f ON w.user_id = f.user_id
        |GROUP BY 1, 2
        |ORDER BY cohort_week, week_offset""".stripMargin,
    // q48: the oracle recomputes the view from the FULL table while
    // the engine runs split-then-merge — a hash match IS the proof of
    // the monoid merge contract (merge(state(base), state(delta)) ==
    // state(full)).
    "q48_incremental_agg" ->
      """SELECT user_id, event_type,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(floor(value * 1048576.0 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS value_ticks,
        |  max(ts) AS last_ts
        |FROM events
        |GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin,
    "q43_gaps_islands" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |isl AS (
        |  SELECT user_id, day,
        |    day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day) AS INTEGER)
        |      AS anchor
        |  FROM days),
        |g AS (
        |  SELECT user_id, anchor, count(*) AS len, min(day) AS start_day
        |  FROM isl GROUP BY user_id, anchor),
        |agg AS (
        |  SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
        |    CAST(count(*) AS BIGINT) AS n_streaks,
        |    CAST(max(len) AS BIGINT) AS longest_streak
        |  FROM g GROUP BY user_id),
        |best AS (
        |  SELECT user_id, start_day AS longest_start FROM (
        |    SELECT user_id, start_day,
        |      row_number() OVER (PARTITION BY user_id
        |                         ORDER BY len DESC, start_day) AS rn
        |    FROM g) WHERE rn = 1)
        |SELECT a.user_id, a.n_active_days, a.n_streaks, a.longest_streak,
        |  b.longest_start
        |FROM agg a JOIN best b ON a.user_id = b.user_id
        |ORDER BY a.user_id""".stripMargin,
    "q44_histogram" ->
      """WITH b AS (
        |  SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders),
        |x AS (
        |  SELECT o_totalprice,
        |    CASE WHEN hi > lo
        |         THEN least(19, CAST(floor((o_totalprice - lo) / (hi - lo) * 20)
        |                        AS INTEGER))
        |         ELSE 0 END AS bin
        |  FROM orders, b),
        |g AS (
        |  SELECT bin, CAST(count(*) AS BIGINT) AS n,
        |    round(sum(o_totalprice), 2) AS bin_total
        |  FROM x GROUP BY bin)
        |SELECT bin, n, bin_total,
        |  round(n / CAST((SELECT sum(n) FROM g) AS DOUBLE), 4) AS share
        |FROM g ORDER BY bin""".stripMargin,
    "q45_mode_per_group" ->
      """WITH c AS (
        |  SELECT c_mktsegment, o_orderpriority, count(*) AS cnt
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |a AS (
        |  SELECT c_mktsegment, CAST(sum(cnt) AS BIGINT) AS n_orders,
        |    CAST(max(cnt) AS BIGINT) AS mode_n
        |  FROM c GROUP BY 1),
        |m AS (
        |  SELECT c_mktsegment, o_orderpriority AS mode_priority FROM (
        |    SELECT c_mktsegment, o_orderpriority,
        |      row_number() OVER (PARTITION BY c_mktsegment
        |                         ORDER BY cnt DESC, o_orderpriority) AS rn
        |    FROM c) WHERE rn = 1)
        |SELECT a.c_mktsegment, a.n_orders, m.mode_priority, a.mode_n,
        |  round(a.mode_n / CAST(a.n_orders AS DOUBLE), 4) AS mode_share
        |FROM a JOIN m ON a.c_mktsegment = m.c_mktsegment
        |ORDER BY a.c_mktsegment""".stripMargin,
    "q47_zorder_key" ->
      s"""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
         |  (${zSpreadSql("l_partkey")} |
         |   (${zSpreadSql("l_suppkey")} << 1)) AS z_key
         |FROM lineitem
         |ORDER BY z_key, l_orderkey, l_linenumber""".stripMargin,
    // q49: the shared solveSteps chain (s13's bit-parity contract)
    // over one grouped Gram aggregation; features/target put on
    // dyadic grids first so the sums are exact and order-independent.
    "q49_ridge_regression" -> q49OracleSql,
    // q50: the logregRounds scans unrolled as CTE pairs — all-long
    // margins/hard-sigmoid/gradients (no transcendental), // where
    // div runs (truncation toward zero agrees on negatives — the
    // s15 contract), every aggregate CAST back to BIGINT (the
    // HUGEINT hash guard).
    "q50_logistic_regression" -> q50OracleSql,
    "q57_lasso" -> q57OracleSql,
    // q62: the pinball-subgradient rounds unrolled with the tau4
    // dimension — integer pinball CASE, halved steps, mean init.
    "q62_quantile_reg" -> q62OracleSql,
    "q65_huber" -> q65OracleSql,
    "q66_relu_mlp" -> q66OracleSql,
    // q69: the contract-checked sigmoid MLP — the oracle recomputes
    // the exact per-class feature-moment grid the fit consumes and
    // pins the four fit booleans TRUE (the q68/s35 posture; the
    // transcendental sigmoid itself has no cross-engine surrogate).
    "q69_mlp_sigmoid" ->
      """SELECT CAST(CASE WHEN l_quantity >= 25.0 THEN 1 ELSE 0 END
        |    AS BIGINT) AS label,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(l_quantity AS BIGINT) * 64) AS BIGINT) AS f1_sum,
        |  CAST(sum(CAST(floor(l_discount * 4096.0 + 0.5) AS BIGINT))
        |    AS BIGINT) AS f2_sum,
        |  CAST(sum(CAST(floor(l_tax * 4096.0 + 0.5) AS BIGINT))
        |    AS BIGINT) AS f3_sum,
        |  TRUE AS loss_monotone_ok,
        |  TRUE AS loss_improved_ok,
        |  TRUE AS posterior_norm_ok,
        |  TRUE AS separation_ok
        |FROM lineitem
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,
    "q63_one_vs_rest" -> q63OracleSql,
    "q64_poisson_glm" -> q64OracleSql,
    "q56_linear_svm" -> q56OracleSql,
    // q51: integer Epanechnikov kernel sums against the broadcast
    // evaluation grid; the density normalizer is the ONE shared
    // double tree (KdeDensityExpr interpolated verbatim).
    "q51_kde" -> q51OracleSql,
    // q52: the trailing ROWS frame's exact long moments and the
    // denominator-cleared z² > 9 integer comparison — identical
    // window framing both engines, ties broken by event_id.
    "q52_rolling_anomaly" ->
      s"""WITH e AS (SELECT event_id, user_id, value, CAST(ts AS TIMESTAMP) AS ts
         |           FROM events),
         |b AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
         |        CAST(floor(value * 1024.0) AS BIGINT) AS v_ticks FROM e),
         |w AS (SELECT *,
         |        CAST(count(*) OVER win AS BIGINT) AS w_n,
         |        CAST(coalesce(sum(v_ticks) OVER win, 0) AS BIGINT) AS w_sum,
         |        CAST(coalesce(sum(v_ticks * v_ticks) OVER win, 0) AS BIGINT) AS w_sumsq
         |      FROM b
         |      WINDOW win AS (PARTITION BY user_id ORDER BY ts_us, event_id
         |        ROWS BETWEEN ${graft.operators.Events.AnomWindow} PRECEDING
         |          AND 1 PRECEDING))
         |SELECT user_id, ts_us, event_id, v_ticks, w_n, w_sum, w_sumsq
         |FROM w
         |WHERE w_n >= ${graft.operators.Events.AnomMinN}
         |  AND (w_n * v_ticks - w_sum) * (w_n * v_ticks - w_sum) >
         |      9 * (w_n * w_sumsq - w_sum * w_sum)
         |ORDER BY user_id, ts_us, event_id""".stripMargin,
    // q53/q54: the shared tick-grid CDF CTEs (the q52 1024-tick
    // quantization), then the exact-integer KS max / doubled
    // rank-sum — sums CAST back from DuckDB's HUGEINT widening.
    "q53_ks_test" ->
      s"""WITH $tickCdfOracleCtes
         |SELECT type_a, type_b, n_a, n_b, d_num, d_ticks,
         |  round(${graft.functions.PValues.qksSql("lam")}, 4) AS p_value
         |FROM (
         |SELECT *, ${graft.functions.PValues.ksLambdaSql("ne", "dks")} AS lam
         |FROM (
         |SELECT type_a, type_b, n_a, n_b, d_num,
         |  (d_num * ${graft.operators.Events.KsScale}) // (n_a * n_b) AS d_ticks,
         |  CAST(d_num AS DOUBLE) / CAST(n_a * n_b AS DOUBLE) AS dks,
         |  CAST(n_a * n_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE) AS ne
         |FROM (
         |  SELECT a.t AS type_a, b.t AS type_b, a.n AS n_a, b.n AS n_b,
         |    CAST(max(abs(b.n * a.cum - a.n * b.cum)) AS BIGINT) AS d_num
         |  FROM cd a JOIN cd b ON a.tick = b.tick AND a.t < b.t
         |  GROUP BY 1, 2, 3, 4)))
         |ORDER BY type_a, type_b""".stripMargin,
    // q58: one-sample KS vs the discrete uniform — per grid tick the
    // post-jump and segment-end deviations, max'd per type.
    "q58_ks_uniform" ->
      s"""WITH $tickCdfOracleCtes,
         |bd AS (SELECT min(tick) AS lo, max(tick) AS hi FROM cd)
         |SELECT t, n, lo, hi, d_num, d_ticks,
         |  round(${graft.functions.PValues.qksSql("lam")}, 4) AS p_value
         |FROM (
         |SELECT *, ${graft.functions.PValues.ksLambdaSql(
             "CAST(n AS DOUBLE)", "dks")} AS lam
         |FROM (
         |SELECT t, n, lo, hi, d_num,
         |  (d_num * ${graft.operators.Events.KsScale}) // (n * (hi - lo + 1))
         |    AS d_ticks,
         |  CAST(d_num AS DOUBLE) / CAST(n * (hi - lo + 1) AS DOUBLE) AS dks
         |FROM (
         |  SELECT cd.t, cd.n, bd.lo, bd.hi,
         |    CAST(max(greatest(
         |      abs(cd.cum * (bd.hi - bd.lo + 1) - (cd.tick - bd.lo + 1) * cd.n),
         |      abs((cd.cum - cd.c) * (bd.hi - bd.lo + 1)
         |        - (cd.tick - bd.lo) * cd.n))) AS BIGINT) AS d_num
         |  FROM cd, bd GROUP BY 1, 2, 3, 4) x))
         |ORDER BY t""".stripMargin,
    "q54_rank_sum" ->
      s"""WITH $tickCdfOracleCtes
         |SELECT type_a, type_b, n_a, n_b, u2_a,
         |  round(${graft.operators.Events.rankSumPSql}, 4) AS p_value
         |FROM (
         |SELECT *, ${graft.operators.Events.rankSumAbsZSql} AS absz
         |FROM (
         |SELECT *, ${graft.operators.Events.rankSumVar2Sql} AS var2
         |FROM (
         |SELECT type_a, type_b, n_a, n_b, tie3,
         |  r2_a - n_a * (n_a + 1) AS u2_a
         |FROM (
         |  SELECT a.t AS type_a, b.t AS type_b, a.n AS n_a, b.n AS n_b,
         |    CAST(sum(a.c * (2 * ((a.cum - a.c) + (b.cum - b.c))
         |                    + a.c + b.c + 1)) AS BIGINT) AS r2_a,
         |    CAST(sum((a.c + b.c) * (a.c + b.c) * (a.c + b.c)
         |             - (a.c + b.c)) AS BIGINT) AS tie3
         |  FROM cd a JOIN cd b ON a.tick = b.tick AND a.t < b.t
         |  GROUP BY 1, 2, 3, 4))))
         |ORDER BY type_a, type_b""".stripMargin,
    // q59: Student + Welch t on exact integer tick moments — the
    // division-cleared Student integers verbatim, the Welch ratios as
    // single exactly-rounded IEEE divides of exact values.
    "q59_t_test" ->
      s"""WITH ct AS MATERIALIZED (
         |  SELECT event_type AS t, CAST(floor(value * 1024.0) AS BIGINT) AS tick,
         |    CAST(count(*) AS BIGINT) AS c
         |  FROM events GROUP BY 1, 2),
         |mom AS (SELECT t, CAST(sum(c) AS BIGINT) AS n,
         |    CAST(sum(c * tick) AS BIGINT) AS s1,
         |    CAST(sum(c * tick * tick) AS BIGINT) AS s2
         |  FROM ct GROUP BY 1),
         |pr AS (SELECT a.t AS type_a, b.t AS type_b, a.n AS n_a, b.n AS n_b,
         |    a.s1 AS s1a, a.s2 AS s2a, b.s1 AS s1b, b.s2 AS s2b
         |  FROM mom a JOIN mom b ON a.t < b.t),
         |z AS (SELECT type_a, type_b, n_a, n_b,
         |    n_b * s1a - n_a * s1b AS dm_num,
         |    CAST(n_a AS DECIMAL(38,0)) * s2a
         |      - CAST(s1a AS DECIMAL(38,0)) * s1a AS ssd_a,
         |    CAST(n_b AS DECIMAL(38,0)) * s2b
         |      - CAST(s1b AS DECIMAL(38,0)) * s1b AS ssd_b
         |  FROM pr),
         |y AS (SELECT *,
         |    CAST(dm_num AS DECIMAL(38,0)) * dm_num * (n_a + n_b - 2) AS t2s_num,
         |    (n_b * ssd_a + n_a * ssd_b) * (n_a + n_b) AS t2s_den,
         |    CASE WHEN n_a > 1 THEN CAST(ssd_a AS DOUBLE)
         |      / CAST(n_a * n_a * (n_a - 1) AS DOUBLE) ELSE 0.0 END AS va,
         |    CASE WHEN n_b > 1 THEN CAST(ssd_b AS DOUBLE)
         |      / CAST(n_b * n_b * (n_b - 1) AS DOUBLE) ELSE 0.0 END AS vb,
         |    CAST(dm_num AS DOUBLE) / CAST(n_a * n_b AS DOUBLE) AS dm
         |  FROM z),
         |w AS (SELECT *,
         |    CASE WHEN n_a > 1 THEN va * va / CAST(n_a - 1 AS DOUBLE)
         |      ELSE 0.0 END AS wa,
         |    CASE WHEN n_b > 1 THEN vb * vb / CAST(n_b - 1 AS DOUBLE)
         |      ELSE 0.0 END AS wb
         |  FROM y),
         |r AS (SELECT type_a, type_b, n_a, n_b, dm_num, t2s_num, t2s_den,
         |  CASE WHEN t2s_den > 0 THEN CAST(floor(CAST(t2s_num AS DOUBLE)
         |    / CAST(t2s_den AS DOUBLE) * 1048576.0 + 0.5) AS BIGINT)
         |    ELSE CAST(0 AS BIGINT) END AS t2s_ticks,
         |  CASE WHEN va + vb > 0 THEN CAST(floor(dm * dm / (va + vb)
         |    * 1048576.0 + 0.5) AS BIGINT)
         |    ELSE CAST(0 AS BIGINT) END AS t2w_ticks,
         |  CASE WHEN wa + wb > 0 THEN CAST(floor((va + vb) * (va + vb)
         |    / (wa + wb) * 1048576.0 + 0.5) AS BIGINT)
         |    ELSE CAST(0 AS BIGINT) END AS dof_ticks,
         |  round(${graft.operators.Events.tTestPStudentSql}, 4) AS p_student,
         |  round(${graft.operators.Events.tTestPWelchSql}, 4) AS p_welch
         |FROM w)
         |SELECT type_a, type_b, n_a, n_b, dm_num,
         |  CAST(t2s_num AS VARCHAR) AS t2s_num,
         |  CAST(t2s_den AS VARCHAR) AS t2s_den,
         |  t2s_ticks, t2w_ticks, dof_ticks, p_student, p_welch
         |FROM r ORDER BY type_a, type_b""".stripMargin,
    // q60: exact raw power sums + the shared moment->ticks tree
    // (q60TreeSql interpolated verbatim — one definition, two engines)
    "q60_skew_kurtosis" ->
      s"""WITH m AS (
         |  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(v) AS BIGINT) AS s1,
         |    CAST(sum(v * v) AS BIGINT) AS s2,
         |    CAST(sum(CAST(v * v * v AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s3,
         |    CAST(sum(CAST(v * v AS DECIMAL(38,0)) * (v * v))
         |      AS DECIMAL(38,0)) AS s4
         |  FROM (SELECT l_returnflag,
         |          CAST(floor(l_extendedprice + 0.5) AS BIGINT) AS v
         |        FROM lineitem)
         |  GROUP BY 1)
         |, r AS (SELECT l_returnflag, n, s1, s2, s3, s4,
         |  ${graft.operators.Relational.q60TreeSql("skew")} AS skew_ticks,
         |  ${graft.operators.Relational.q60TreeSql("kurt")} AS kurt_ticks
         |FROM m)
         |SELECT l_returnflag, n, s1, s2,
         |  CAST(s3 AS VARCHAR) AS s3, CAST(s4 AS VARCHAR) AS s4,
         |  skew_ticks, kurt_ticks
         |FROM r ORDER BY l_returnflag""".stripMargin,
    // q61: every Spark HOF member twinned to its DuckDB list
    // function; the indexed dot via the shared range-subscript form.
    "q61_hof_suite" ->
      s"""WITH b AS MATERIALIZED (
         |  SELECT vec_id, embedding,
         |    list_transform(embedding, x ->
         |      CAST(floor(CAST(x AS DOUBLE) * 1024.0 + 0.5) AS BIGINT)) AS q,
         |    list_filter(embedding, x -> CAST(x AS DOUBLE) > 0.0) AS pos
         |  FROM embeddings),
         |c AS (SELECT vec_id, embedding, q, pos,
         |    list_reverse(list_sort(q)) AS srt
         |  FROM b)
         |SELECT vec_id,
         |  CAST(len(pos) AS BIGINT) AS n_pos,
         |  CASE WHEN len(pos) > 0 THEN
         |    CAST(floor(list_sum(list_transform(pos, x -> CAST(x AS DOUBLE)))
         |      * 1024.0 + 0.5) AS BIGINT)
         |  ELSE CAST(0 AS BIGINT) END AS pos_ticks,
         |  CAST(len(list_filter(embedding, x -> CAST(x AS DOUBLE) > 0.3)) > 0
         |    AS BOOLEAN) AS has_big,
         |  srt[1] AS t1, srt[2] AS t2, srt[3] AS t3,
         |  CAST(list_sum(list_transform(range(1, 65),
         |    i -> q[i] * q[65 - i])) AS BIGINT) AS palin_dot,
         |  CAST(list_sum(list_transform(range(1, 65),
         |    i -> i * q[i])) AS BIGINT) AS idx_dot
         |FROM c ORDER BY vec_id""".stripMargin,
    // q55: the minimax closed form of isotonic regression on the
    // bounded month grid — truncated segment means, then min/max.
    "q55_isotonic" ->
      s"""WITH bins AS MATERIALIZED (
         |  SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS b,
         |    CAST(count(*) AS BIGINT) AS c,
         |    CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
         |      AS BIGINT) AS s
         |  FROM orders GROUP BY 1),
         |pre AS MATERIALIZED (
         |  SELECT b, c, s,
         |    CAST(sum(c) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING
         |      AND CURRENT ROW) AS BIGINT) AS cc,
         |    CAST(sum(s) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING
         |      AND CURRENT ROW) AS BIGINT) AS cs
         |  FROM bins),
         |segs AS MATERIALIZED (
         |  SELECT pj.b AS j, pk.b AS k,
         |    ((pk.cs - (pj.cs - pj.s)) * ${graft.operators.Relational.IsoFitScale})
         |      // (pk.cc - (pj.cc - pj.c)) AS m
         |  FROM pre pj JOIN pre pk ON pj.b <= pk.b),
         |inner_min AS (
         |  SELECT i.b AS i, sg.j, min(sg.m) AS mn
         |  FROM segs sg JOIN bins i ON sg.j <= i.b AND sg.k >= i.b
         |  GROUP BY 1, 2),
         |f AS (SELECT i, CAST(max(mn) AS BIGINT) AS fit_sticks
         |      FROM inner_min GROUP BY 1)
         |SELECT bins.b AS bin, bins.c AS n_orders,
         |  (bins.s * ${graft.operators.Relational.IsoFitScale}) // bins.c
         |    AS mean_sticks,
         |  f.fit_sticks
         |FROM bins JOIN f ON bins.b = f.i
         |ORDER BY bin""".stripMargin,
    // f01/f02: generated next to the derived-sigma basket CTEs both
    // keys share — all-positive integer ticks, // where div runs.
    "f01_freq_itemsets" -> graft.operators.Itemsets.f01OracleSql,
    "f02_assoc_rules" -> graft.operators.Itemsets.f02OracleSql,
    "f03_itemsets_l3" -> graft.operators.Itemsets.f03OracleSql,
    "f04_seq_patterns" -> graft.operators.Itemsets.f04OracleSql,
    "f05_itemsets_depth" -> graft.operators.Itemsets.f05OracleSql,
    "q46_referential_audit" ->
      """WITH rel AS (
        |  SELECT 'lineitem->orders' AS relationship,
        |    (SELECT count(*) FROM lineitem) AS n_child,
        |    (SELECT count(*) FROM lineitem l
        |       WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                         WHERE o.o_orderkey = l.l_orderkey)) AS n_orphan_child,
        |    (SELECT count(*) FROM orders) AS n_parent,
        |    (SELECT count(*) FROM orders o
        |       WHERE NOT EXISTS (SELECT 1 FROM lineitem l
        |                         WHERE l.l_orderkey = o.o_orderkey)) AS n_childless_parent
        |  UNION ALL
        |  SELECT 'orders->customer',
        |    (SELECT count(*) FROM orders),
        |    (SELECT count(*) FROM orders o
        |       WHERE NOT EXISTS (SELECT 1 FROM customer c
        |                         WHERE c.c_custkey = o.o_custkey)),
        |    (SELECT count(*) FROM customer),
        |    (SELECT count(*) FROM customer c
        |       WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                         WHERE o.o_custkey = c.c_custkey))
        |  UNION ALL
        |  SELECT 'customer->nation',
        |    (SELECT count(*) FROM customer),
        |    (SELECT count(*) FROM customer c
        |       WHERE NOT EXISTS (SELECT 1 FROM nation n
        |                         WHERE n.n_nationkey = c.c_nationkey)),
        |    (SELECT count(*) FROM nation),
        |    (SELECT count(*) FROM nation n
        |       WHERE NOT EXISTS (SELECT 1 FROM customer c
        |                         WHERE c.c_nationkey = n.n_nationkey))
        |  UNION ALL
        |  SELECT 'events->customer',
        |    (SELECT count(*) FROM events),
        |    (SELECT count(*) FROM events e
        |       WHERE NOT EXISTS (SELECT 1 FROM customer c
        |                         WHERE c.c_custkey = e.user_id)),
        |    (SELECT count(*) FROM customer),
        |    (SELECT count(*) FROM customer c
        |       WHERE NOT EXISTS (SELECT 1 FROM events e
        |                         WHERE e.user_id = c.c_custkey)))
        |SELECT relationship, n_child, n_orphan_child, n_parent, n_childless_parent
        |FROM rel ORDER BY relationship""".stripMargin,
    "q31_sessionize" ->
      ("WITH " + sessionizeOracleCtes + """
        |SELECT user_id, session_id, min(ts) AS session_start, max(ts) AS session_end,
        | count(*) AS n_events, round(sum(value), 2) AS session_value
        |FROM g
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin),
    // j04: q31's session CTEs, the hour histogram with the same
    // integer 1.2×-mean predicate (no division, no HUGEINT — counts
    // CAST early), then the direct overlap join — the oracle needs no
    // banding, which is exactly what makes it a check OF the banding.
    "j04_overlap_join" ->
      ("WITH " + sessionizeOracleCtes + """,
        |sess AS (SELECT user_id, session_id,
        |           epoch_us(min(ts)) AS s_us, epoch_us(max(ts)) AS e_us
        |         FROM g GROUP BY user_id, session_id),
        |hrs AS (SELECT epoch_us(date_trunc('hour', ts)) AS ws_us,
        |          CAST(count(*) AS BIGINT) AS n_ev
        |        FROM e GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS nw,
        |          CAST(sum(n_ev) AS BIGINT) AS ne FROM hrs),
        |hot AS (SELECT ws_us, n_ev FROM hrs, tot WHERE n_ev * 5 * nw >= ne * 6)
        |SELECT s.user_id, s.session_id, h.ws_us AS win_start_us,
        |  least(s.e_us, h.ws_us + 3600000000) - greatest(s.s_us, h.ws_us) AS overlap_us,
        |  h.n_ev AS win_events
        |FROM sess s JOIN hot h
        |  ON h.ws_us <= s.e_us AND s.s_us < h.ws_us + 3600000000
        |ORDER BY user_id, session_id, win_start_us""".stripMargin),
    "q32_event_funnel" ->
      """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |s AS (SELECT user_id, min(ts) AS signup_ts FROM e
        |      WHERE event_type = 'signup' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS click_ts FROM e
        |      JOIN s USING (user_id)
        |      WHERE e.event_type = 'click' AND e.ts > s.signup_ts GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS purchase_ts FROM e
        |      JOIN c USING (user_id)
        |      WHERE e.event_type = 'purchase' AND e.ts > c.click_ts GROUP BY 1)
        |SELECT (SELECT count(*) FROM s) AS n_signup,
        |       (SELECT count(*) FROM c) AS n_click_after,
        |       (SELECT count(*) FROM p) AS n_purchase_after""".stripMargin,
    "q33_json_extract" ->
      """SELECT event_type, count(*) AS n,
        | round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
        | count(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_distinct_k
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "d01_dedup_exact" ->
      """SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents
        |GROUP BY md5(text)
        |ORDER BY text_hash""".stripMargin,
    // d02/d04 oracles are ALL-PAIRS ground truth: the LSH banding's
    // per-pair candidate probability at the verify threshold makes
    // recall 1 on any corpus whose near-dup pairs sit above it (the
    // banding thresholds 0.71/0.42 sit well under the observed
    // minimum true-pair similarity ~0.89), so candidates-then-verify
    // equals the exact result.
    "d02_dedup_minhash" ->
      ("WITH " + minhashTruthOracleCtes + """
        |SELECT doc_a, doc_b, round(jac, 4) AS jaccard
        |FROM j WHERE jac >= 0.7
        |ORDER BY doc_a, doc_b""".stripMargin),
    // d22: the same truth pairs; the affine-family signature rebuilt
    // natively (one md5 base per shingle, k multiply-adds mod 2^48)
    "d22_minhash_estimate" ->
      ("WITH " + minhashTruthOracleCtes + s""",
        |selx AS MATERIALIZED (
        |  SELECT DISTINCT doc_id FROM (
        |    SELECT doc_a AS doc_id FROM j WHERE jac >= 0.7
        |    UNION ALL SELECT doc_b FROM j WHERE jac >= 0.7)),
        |hb AS MATERIALIZED (
        |  SELECT sh.doc_id,
        |    list_transform(s, g ->
        |      CAST(('0x' || substr(md5(g), 1, 12))::UBIGINT AS BIGINT)) AS hs
        |  FROM sh JOIN selx ON selx.doc_id = sh.doc_id),
        |sg AS MATERIALIZED (
        |  SELECT doc_id,
        |    list_transform(range(0, ${graft.operators.Dedup.EstPerms}), i ->
        |      coalesce(list_min(list_transform(hs, h ->
        |        (CAST(2 * i + 1 AS BIGINT) * h
        |         + CAST(1099511628211 AS BIGINT) * CAST(i AS BIGINT))
        |        % CAST(281474976710656 AS BIGINT))),
        |      CAST(i AS BIGINT))) AS sig
        |  FROM hb),
        |sel AS (SELECT doc_a, doc_b, jac FROM j WHERE jac >= 0.7),
        |est AS (
        |  SELECT sel.doc_a, sel.doc_b,
        |    CAST(floor(sel.jac * 1048576.0 + 0.5) AS BIGINT) AS exact_jac_ticks,
        |    (CAST(len(list_filter(range(1, ${graft.operators.Dedup.EstPerms} + 1),
        |        i -> a.sig[i] = b.sig[i])) AS BIGINT) * 1048576)
        |      // ${graft.operators.Dedup.EstPerms} AS est_jac_ticks
        |  FROM sel JOIN sg a ON a.doc_id = sel.doc_a
        |  JOIN sg b ON b.doc_id = sel.doc_b)
        |SELECT doc_a, doc_b, exact_jac_ticks, est_jac_ticks,
        |  abs(est_jac_ticks - exact_jac_ticks) AS err_ticks,
        |  abs(est_jac_ticks - exact_jac_ticks)
        |    <= ${graft.operators.Dedup.EstBoundTicks} AS within_bound
        |FROM est ORDER BY doc_a, doc_b""".stripMargin),
    // d18 = the d02 truth's shared shingles ranked by corpus rarity
    "d18_match_forensics" ->
      ("WITH " + minhashTruthOracleCtes + """,
        |sel AS (SELECT doc_a, doc_b FROM j WHERE jac >= 0.7),
        |dfq AS (
        |  SELECT shg, count(*) AS df
        |  FROM (SELECT unnest(s) AS shg FROM sh) GROUP BY shg),
        |shd AS (
        |  SELECT sel.doc_a, sel.doc_b, unnest(list_intersect(a.s, b.s)) AS shg
        |  FROM sel
        |  JOIN sh a ON a.doc_id = sel.doc_a
        |  JOIN sh b ON b.doc_id = sel.doc_b),
        |r AS (
        |  SELECT doc_a, doc_b, shg, df,
        |    row_number() OVER (PARTITION BY doc_a, doc_b ORDER BY df, shg) AS rank
        |  FROM (SELECT shd.doc_a, shd.doc_b, shd.shg, dfq.df
        |        FROM shd JOIN dfq ON shd.shg = dfq.shg))
        |SELECT doc_a, doc_b, CAST(rank AS BIGINT) AS rank,
        |  shg AS shingle, CAST(df AS BIGINT) AS df
        |FROM r WHERE rank <= 3
        |ORDER BY doc_a, doc_b, rank""".stripMargin),
    // d10 oracle: all-pairs TRUTH restricted to delta × corpus — the
    // same independent ground truth as d02's, which the LSH banding
    // (identical 16×8 / 0.71 s-curve) must reproduce at ≥ 0.7.
    "d10_dedup_incremental" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |         list_filter(regexp_split_to_array(text, '[ \n\t\r]+'), t -> t <> '') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |         list_distinct(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
        |           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
        |  FROM tk),
        |p AS (
        |  SELECT n.doc_id AS new_id, c.doc_id AS corpus_id,
        |         len(list_intersect(n.s, c.s)) AS i, len(n.s) AS na, len(c.s) AS nb
        |  FROM sh n JOIN sh c ON n.doc_id % 10 = 7 AND c.doc_id % 10 <> 7),
        |j AS (
        |  SELECT new_id, corpus_id,
        |         CASE WHEN na = 0 AND nb = 0 THEN 1.0
        |              WHEN na = 0 OR nb = 0 THEN 0.0
        |              ELSE i / CAST(na + nb - i AS DOUBLE) END AS jac
        |  FROM p)
        |SELECT new_id, corpus_id, round(jac, 4) AS jaccard
        |FROM j WHERE jac >= 0.7
        |ORDER BY new_id, corpus_id""".stripMargin,
    // d03 oracle recomputes the EXACT simhash signatures (md5 token
    // hashes, two 32-bit halves) and takes all pairs at hamming <= 3;
    // 4x16-bit banding has recall 1 there by pigeonhole, so the Spark
    // result equals all-pairs truth.
    "d03_dedup_simhash" ->
      """WITH tk AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(text, '[ \n\t\r]+'), t -> t <> '') AS t
        |  FROM documents),
        |tok AS (SELECT doc_id, unnest(t) AS w FROM tk),
        |th AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5(w), 1, 8))::UBIGINT::BIGINT AS hi,
        |    ('0x' || substr(md5(w), 9, 8))::UBIGINT::BIGINT AS lo
        |  FROM tok),
        |bits AS (
        |  SELECT doc_id, j.j AS j,
        |    sum(CASE WHEN j.j < 32
        |         THEN CASE WHEN ((lo >> j.j) & 1) = 1 THEN 1 ELSE -1 END
        |         ELSE CASE WHEN ((hi >> (j.j - 32)) & 1) = 1 THEN 1 ELSE -1 END END) AS c
        |  FROM th, range(64) j(j)
        |  GROUP BY doc_id, j.j),
        |sig0 AS (
        |  SELECT doc_id,
        |    sum(CASE WHEN c > 0 AND j < 32 THEN (1::BIGINT << j) ELSE 0 END) AS slo,
        |    sum(CASE WHEN c > 0 AND j >= 32 THEN (1::BIGINT << (j - 32)) ELSE 0 END) AS shi
        |  FROM bits GROUP BY doc_id),
        |sig AS (
        |  SELECT tk.doc_id,
        |    CAST(coalesce(slo, 0) AS BIGINT) AS slo, CAST(coalesce(shi, 0) AS BIGINT) AS shi
        |  FROM tk LEFT JOIN sig0 ON tk.doc_id = sig0.doc_id)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(bit_count(xor(a.slo, b.slo)) + bit_count(xor(a.shi, b.shi)) AS BIGINT) AS hamming
        |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.slo, b.slo)) + bit_count(xor(a.shi, b.shi)) <= 3
        |ORDER BY doc_a, doc_b""".stripMargin,
    "d04_dedup_ngram" ->
      ("WITH " + ngramTruthOracleCtes + """
        |SELECT doc_a, doc_b, round(jac, 4) AS jaccard2
        |FROM j WHERE jac >= 0.5
        |ORDER BY doc_a, doc_b""".stripMargin),
    // d16 = d04's truth bucketed into deciles of the ROUNDED score
    "d16_dedup_sweep" ->
      ("WITH " + ngramTruthOracleCtes + """,
        |sel AS (SELECT round(jac, 4) AS jaccard2 FROM j WHERE jac >= 0.5)
        |SELECT least(9, CAST(floor(jaccard2 * 10) AS INTEGER)) AS decile,
        |  CAST(count(*) AS BIGINT) AS n_pairs,
        |  round(min(jaccard2), 4) AS min_jac,
        |  round(max(jaccard2), 4) AS max_jac
        |FROM sel GROUP BY 1
        |ORDER BY decile""".stripMargin),
    // d05/s02 oracles replicate the md5-derived hyperplane banding
    // exactly (same weights, same sign bits, same band buckets), so
    // the LSH candidate set — not just the verify step — is checked.
    "d05_dedup_embedding" ->
      """WITH pl AS (
        |  SELECT p.p AS p, j.j AS j,
        |    ((('0x' || substr(md5('42:' || CAST(p.p AS VARCHAR) || ':' || CAST(j.j AS VARCHAR)), 1, 12))::UBIGINT
        |      / 281474976710656.0) * 2.0 - 1.0) AS w
        |  FROM range(48) p(p), range(64) j(j)),
        |pw AS (SELECT p, list(w ORDER BY j) AS ws FROM pl GROUP BY p),
        |sb AS (
        |  SELECT e.vec_id, pw.p,
        |    CASE WHEN list_sum(list_transform(range(1, 65),
        |           j -> ws[j] * CAST(e.embedding[j] AS DOUBLE))) >= 0 THEN 1 ELSE 0 END AS bit
        |  FROM embeddings e, pw),
        |bands AS (
        |  SELECT vec_id, p // 4 AS band_id, sum(bit * (1 << (p % 4))) AS band_val
        |  FROM sb GROUP BY vec_id, p // 4),
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
        |  FROM bands a JOIN bands b
        |    ON a.band_id = b.band_id AND a.band_val = b.band_val AND a.vec_id < b.vec_id),
        |sc AS (
        |  SELECT c.va, c.vb,
        |    list_sum(list_transform(range(1, 65),
        |      i -> CAST(x.embedding[i] AS DOUBLE) * CAST(y.embedding[i] AS DOUBLE))) /
        |    (sqrt(list_sum(list_transform(range(1, 65),
        |      i -> CAST(x.embedding[i] AS DOUBLE) * CAST(x.embedding[i] AS DOUBLE)))) *
        |     sqrt(list_sum(list_transform(range(1, 65),
        |      i -> CAST(y.embedding[i] AS DOUBLE) * CAST(y.embedding[i] AS DOUBLE))))) AS cos_raw
        |  FROM cand c
        |  JOIN embeddings x ON x.vec_id = c.va
        |  JOIN embeddings y ON y.vec_id = c.vb)
        |SELECT va AS vec_a, vb AS vec_b, round(cos_raw, 4) AS cos
        |FROM sc WHERE cos_raw >= 0.4
        |ORDER BY vec_a, vec_b""".stripMargin,
    "s01_ann_bruteforce" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
        |p AS (SELECT query_id, vec_id,
        |        list_sum(list_transform(range(1, len(qv) + 1),
        |          i -> CAST(qv[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))) AS dot,
        |        sqrt(list_sum(list_transform(range(1, len(qv) + 1),
        |          i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)))) AS nq,
        |        sqrt(list_sum(list_transform(range(1, len(embedding) + 1),
        |          i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS nv
        |      FROM embeddings CROSS JOIN q
        |      WHERE vec_id <> query_id),
        |r AS (SELECT query_id, vec_id, dot / (nq * nv) AS cos_raw,
        |        row_number() OVER (PARTITION BY query_id
        |                           ORDER BY dot / (nq * nv) DESC, vec_id) AS rank
        |      FROM p)
        |SELECT query_id, vec_id AS neighbor_id, round(cos_raw, 4) AS cos, rank
        |FROM r
        |WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin,
    // s12: the shared banding CTEs (unreferenced probe CTEs are not
    // evaluated by DuckDB), bucket sizes, then the size histogram —
    // band_val's HUGEINT sum is a group key only, never an output.
    "s12_ann_index_stats" ->
      ("WITH " + annProbeOracleCtes + """,
        |bk AS (SELECT band_id, band_val, CAST(count(*) AS BIGINT) AS sz
        |       FROM bands GROUP BY 1, 2)
        |SELECT sz AS bucket_size, CAST(count(*) AS BIGINT) AS n_buckets,
        |  CAST(sz * count(*) AS BIGINT) AS n_vectors
        |FROM bk
        |GROUP BY sz
        |ORDER BY bucket_size""".stripMargin),
    // s13: generated in Recommend next to the solveSteps both engines
    // share — the bit-parity contract lives in one file.
    "s13_als_recommend" -> Recommend.alsOracleSql,
    "s24_implicit_als" -> Recommend.implicitOracleSql,
    // s25: the s13 rounds chain + per-customer ranked tick dots.
    "s25_recommend_topk" -> Recommend.recTopkOracleSql,
    // s28: the batch-GD SVD++ rounds unrolled, staged truncating divs.
    "s28_svdpp" -> Recommend.svdppOracleSql,
    // s32: exact integer dots/norms, the s19 cosine tree, bounded
    // top-M/top-K total orders, NOT EXISTS seen filter.
    "s32_item_knn" -> Recommend.itemKnnOracleSql,
    // s15: s13's shared rounds chain over the bias-debiased residual
    // ratings — the integer bias stages are plain CTEs.
    "s15_biased_mf" -> Recommend.biasedOracleSql,
    // s10: the shared SQ8 CTEs, then s01's ranking over the
    // dequantized vectors. 64-dim like the other ANN oracles.
    "s10_ann_int8" ->
      ("WITH " + sq8OracleCtes + """,
        |r AS (SELECT query_id, vec_id, dot / (nq * nv) AS cos_raw,
        |        row_number() OVER (PARTITION BY query_id
        |                           ORDER BY dot / (nq * nv) DESC, vec_id) AS rank
        |      FROM p)
        |SELECT query_id, vec_id AS neighbor_id, round(cos_raw, 4) AS cos, rank
        |FROM r
        |WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin),
    // s11: the same SQ8 CTEs rank a 50-candidate pool per query
    // (quantized scores, the engine's top-k tie rule: score desc,
    // id asc), then EXACT float cosine reranks pool members only.
    "s11_ann_rerank" ->
      ("WITH " + sq8OracleCtes + """,
        |pool AS (
        |  SELECT query_id, vec_id FROM (
        |    SELECT query_id, vec_id,
        |      row_number() OVER (PARTITION BY query_id
        |                         ORDER BY dot / (nq * nv) DESC, vec_id) AS rk
        |    FROM p)
        |  WHERE rk <= 50),
        |qe AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
        |x AS (SELECT pool.query_id, pool.vec_id,
        |        list_sum(list_transform(range(1, 65),
        |          i -> CAST(qe.qv[i] AS DOUBLE) * CAST(v.embedding[i] AS DOUBLE))) AS dot2,
        |        sqrt(list_sum(list_transform(range(1, 65),
        |          i -> CAST(qe.qv[i] AS DOUBLE) * CAST(qe.qv[i] AS DOUBLE)))) AS nq2,
        |        sqrt(list_sum(list_transform(range(1, 65),
        |          i -> CAST(v.embedding[i] AS DOUBLE) * CAST(v.embedding[i] AS DOUBLE)))) AS nv2
        |      FROM pool
        |      JOIN embeddings v ON v.vec_id = pool.vec_id
        |      JOIN qe ON qe.query_id = pool.query_id),
        |r AS (SELECT query_id, vec_id, dot2 / (nq2 * nv2) AS cos_raw,
        |        row_number() OVER (PARTITION BY query_id
        |                           ORDER BY dot2 / (nq2 * nv2) DESC, vec_id) AS rank
        |      FROM x)
        |SELECT query_id, vec_id AS neighbor_id, round(cos_raw, 4) AS cos, rank
        |FROM r
        |WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin),
    "s02_ann_lsh" ->
      ("WITH " + annProbeOracleCtes + """,
        |r AS (
        |  SELECT query_id, vec_id, cos_raw,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY cos_raw DESC, vec_id) AS rank
        |  FROM sc)
        |SELECT query_id, vec_id AS neighbor_id, round(cos_raw, 4) AS cos, rank
        |FROM r
        |WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin),
    // s08: same md5 probe block, cosines quantized to 2^-20 ticks —
    // long sums are order-independent, so mean/min/max hash-compare
    "s08_diversity_stats" ->
      s"""WITH pr AS (
        |  SELECT vec_id AS probe_id, embedding AS pv FROM (
        |    SELECT vec_id, embedding,
        |      md5('s08:' || CAST(vec_id AS VARCHAR)) AS k
        |    FROM embeddings ORDER BY k, vec_id LIMIT 32)),
        |sc AS (
        |  SELECT ${cosSql("e.embedding", "p.pv")} AS c
        |  FROM embeddings e CROSS JOIN pr p
        |  WHERE e.vec_id <> p.probe_id),
        |q AS (SELECT CAST(floor(c * 1048576.0 + 0.5) AS BIGINT) AS qc FROM sc)
        |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |  round(sum(qc) / (1048576.0 * count(*)), 4) AS mean_cos,
        |  round(min(qc) / 1048576.0, 4) AS min_cos,
        |  round(max(qc) / 1048576.0, 4) AS max_cos,
        |  CAST(count(*) FILTER (qc >= 524288) AS BIGINT) AS n_above_half
        |FROM q""".stripMargin,
    // s07 = the same probe replication with a radius tail: the
    // banded candidate set and every cosine are hash-compared, so
    // the oracle checks candidate generation, not just scoring
    "s07_radius_search" ->
      ("WITH " + annProbeOracleCtes + """
        |SELECT query_id, vec_id AS neighbor_id, round(cos_raw, 4) AS cos
        |FROM sc
        |WHERE cos_raw >= 0.3
        |ORDER BY query_id, neighbor_id""".stripMargin),
    // s05 oracle = the s02 replication with query set := the whole
    // corpus (both directions of each bucket pair) and rank <= 3;
    // the CTE chain is shared with s06 (which classifies over it)
    "s05_knn_join" ->
      ("WITH " + knnGraphOracleCtes + """
        |SELECT query_id, vec_id AS neighbor_id, round(cos_raw, 4) AS cos, rank
        |FROM r
        |WHERE rank <= 3
        |ORDER BY query_id, rank""".stripMargin),
    // s20: the seed graph's CTEs + the unrolled NN-descent rounds —
    // reverse cap, two-hop, exact rescore, bounded re-rank.
    "s20_nn_descent" -> s20OracleSql(3,
      graft.operators.Similarity.GraphDegree,
      graft.operators.Similarity.NnDescentRounds),
    // s33: the shared s20 graph chain + the beam-search hops
    // unrolled — fixed entries, expand ∪ beam, exact rescore,
    // bounded cut per hop.
    "s33_graph_ann" -> s33OracleSql(3,
      graft.operators.Similarity.GraphDegree,
      graft.operators.Similarity.NnDescentRounds,
      graft.operators.Similarity.BeamWidth,
      graft.operators.Similarity.BeamHops),
    // s06: cosine-weighted 3-NN vote over the s05 graph; weights are
    // integer 1/10000 ticks of the 4dp cosines so the per-label sums
    // are order-independent and bit-equal cross-engine
    "s06_knn_classify" ->
      ("WITH " + knnGraphOracleCtes + """,
        |k AS (SELECT query_id, vec_id AS neighbor_id, round(cos_raw, 4) AS cos
        |      FROM r WHERE rank <= 3),
        |lv AS (SELECT k.query_id, e.label AS n_label,
        |         CAST(floor(k.cos * 10000 + 0.5) AS BIGINT) AS w
        |       FROM k JOIN embeddings e ON e.vec_id = k.neighbor_id),
        |v AS (SELECT query_id, n_label, sum(w) AS wsum, count(*) AS nv
        |      FROM lv GROUP BY query_id, n_label),
        |best AS (SELECT query_id, n_label,
        |           row_number() OVER (PARTITION BY query_id
        |                              ORDER BY wsum DESC, n_label) AS rn
        |         FROM v),
        |tot AS (SELECT query_id, CAST(sum(nv) AS BIGINT) AS n_votes
        |        FROM v GROUP BY query_id)
        |SELECT b.query_id AS vec_id, b.n_label AS predicted_label, t.n_votes,
        |  e.label AS true_label, (b.n_label = e.label) AS correct
        |FROM best b
        |JOIN tot t ON t.query_id = b.query_id
        |JOIN embeddings e ON e.vec_id = b.query_id
        |WHERE b.rn = 1
        |ORDER BY vec_id""".stripMargin),
    "q42_window_extras" ->
      """WITH b AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice, o_orderstatus,
        |    row_number() OVER w AS rn,
        |    count(*) OVER (PARTITION BY o_custkey) AS n_orders,
        |    first_value(o_totalprice) OVER wf AS first_price,
        |    nth_value(o_totalprice, 2) OVER wf AS second_price,
        |    last_value(o_totalprice) OVER wf AS last_price,
        |    last_value(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END IGNORE NULLS)
        |      OVER wr AS last_final_price
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |    wf AS (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
        |    wr AS (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT o_custkey, CAST(n_orders AS BIGINT) AS n_orders,
        |  round(first_price, 2) AS first_price,
        |  round(second_price, 2) AS second_price,
        |  round(last_price, 2) AS last_price,
        |  round(last_final_price, 2) AS last_final_price
        |FROM b WHERE rn = n_orders
        |ORDER BY o_custkey""".stripMargin,
    // s03 oracle replicates the IVF index exactly: same md5-sampled
    // seeds, one Lloyd round with the SAME fixed-point cell means
    // (floor(x*1024+0.5) long sums — order-independent, so exact in
    // both engines), same argmax cell assignment (ties to smaller
    // cid), same 8-cell probe (NProbe = 8), same final ranking.
    "s03_ann_ivf" -> s03OracleSql,
    "t01_langid" ->
      """WITH tk AS (
        |  SELECT doc_id, lang AS labeled_lang,
        |    list_filter(regexp_split_to_array(lower(text), '\s+'), t -> t <> '') AS t
        |  FROM documents),
        |sc AS (
        |  SELECT doc_id, labeled_lang,
        |    [
        |      {'score': CAST(len(list_filter(t, x -> list_contains(['the','and','of','to','in','is','that','for','with','on'], x))) AS DOUBLE)
        |                / CAST(greatest(len(t), 1) AS DOUBLE), 'lang': 'en'},
        |      {'score': CAST(len(list_filter(t, x -> list_contains(['el','la','de','que','y','en','los','del','las','por'], x))) AS DOUBLE)
        |                / CAST(greatest(len(t), 1) AS DOUBLE), 'lang': 'es'},
        |      {'score': CAST(len(list_filter(t, x -> list_contains(['le','la','de','et','les','des','en','un','du','une'], x))) AS DOUBLE)
        |                / CAST(greatest(len(t), 1) AS DOUBLE), 'lang': 'fr'},
        |      {'score': CAST(len(list_filter(t, x -> list_contains(['der','die','und','das','von','zu','mit','den','ist','im'], x))) AS DOUBLE)
        |                / CAST(greatest(len(t), 1) AS DOUBLE), 'lang': 'de'},
        |      {'score': CAST(len(list_filter(t, x -> list_contains(['il','di','che','la','e','per','un','del','con','le'], x))) AS DOUBLE)
        |                / CAST(greatest(len(t), 1) AS DOUBLE), 'lang': 'it'}
        |    ] AS scores
        |  FROM tk),
        |b AS (SELECT doc_id, labeled_lang, list_max(scores) AS best FROM sc)
        |SELECT doc_id, best.lang AS pred_lang, round(best.score, 4) AS confidence, labeled_lang
        |FROM b
        |ORDER BY doc_id""".stripMargin,
    "t02_quality_score" -> (qualityScoreOracleBody + "\nORDER BY doc_id"),
    // α=0.5 temperature sampling: rate ticks floor(65536·sqrt(nmin/n))
    // — kept_i ∝ n_i^α, smallest source kept whole; IEEE sqrt and
    // floor are correctly rounded in both engines, and the keep
    // compare is integer — bit-reproducible
    "p07_mix_temperature" ->
      """WITH s AS (SELECT source, count(*) AS n_source FROM documents GROUP BY source),
        |m AS (SELECT min(n_source) AS nmin FROM s),
        |r AS (SELECT source, n_source,
        |        CAST(floor(65536.0 * sqrt(nmin / CAST(n_source AS DOUBLE))) AS BIGINT)
        |          AS rate_ticks
        |      FROM s, m)
        |SELECT d.doc_id, d.source, CAST(r.n_source AS BIGINT) AS n_source, r.rate_ticks,
        |  (('0x' || substr(md5('p07:' || CAST(d.doc_id AS VARCHAR)), 1, 4))::UBIGINT
        |    < r.rate_ticks) AS kept
        |FROM documents d JOIN r ON d.source = r.source
        |ORDER BY d.doc_id""".stripMargin,
    // p09: epochs from the same sqrt rate family as p07, UPsampling
    // (max/n_i, clamped at 4 epochs in 1/256 ticks); the copy list
    // materializes via generate_series == Spark's sequence(1, n)
    "p09_epoch_repeats" ->
      """WITH s AS (SELECT source, count(*) AS n_source FROM documents GROUP BY source),
        |m AS (SELECT max(n_source) AS nmax FROM s),
        |r AS (SELECT source,
        |        least(1024, CAST(floor(256.0 * sqrt(nmax / CAST(n_source AS DOUBLE)))
        |          AS BIGINT)) AS e_ticks
        |      FROM s, m),
        |d AS (
        |  SELECT doc_id, d.source, e_ticks,
        |    e_ticks // 256 +
        |      CASE WHEN ('0x' || substr(md5('p09:' || CAST(doc_id AS VARCHAR)), 1, 4))::UBIGINT % 256
        |                < e_ticks % 256 THEN 1 ELSE 0 END AS n_copies
        |  FROM documents d JOIN r ON d.source = r.source)
        |SELECT doc_id, source, e_ticks, unnest(generate_series(1, n_copies)) AS copy
        |FROM d
        |ORDER BY doc_id, copy""".stripMargin,
    // p10 reuses the t02 replication for scores and token counts;
    // the greedy-by-rank keep rule (kept iff running total fits) is
    // replicated with the identical (quality DESC, doc_id) ordering
    "p10_token_budget" ->
      ("WITH q AS (" + qualityScoreOracleBody + "),\n" +
        """s AS (SELECT q.doc_id, q.n_tokens, q.quality_score, d.source
          |      FROM q JOIN documents d ON q.doc_id = d.doc_id),
          |b AS (SELECT source, CAST(floor(sum(n_tokens) * 0.4) AS BIGINT) AS budget
          |      FROM s GROUP BY source),
          |r AS (SELECT s.*, b.budget,
          |        sum(s.n_tokens) OVER (PARTITION BY s.source
          |          ORDER BY s.quality_score DESC, s.doc_id
          |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_tokens
          |      FROM s JOIN b ON s.source = b.source)
          |SELECT doc_id, source, n_tokens, quality_score,
          |  CAST(running_tokens AS BIGINT) AS running_tokens, budget,
          |  running_tokens <= budget AS kept
          |FROM r ORDER BY doc_id""".stripMargin),
    // t13: lift from long counts divided as doubles in the same op
    // order; ranking on the ROUNDED lift (ties lexicographic)
    "t13_distinctive_tokens" ->
      """WITH tk AS (
        |  SELECT source,
        |    unnest(list_filter(regexp_split_to_array(lower(text), '[ \n\t\r]+'),
        |           t -> t <> '')) AS token
        |  FROM documents),
        |st AS (SELECT source, token, count(*) AS c_st FROM tk GROUP BY 1, 2),
        |ps AS (SELECT source, sum(c_st) AS t_s FROM st GROUP BY source),
        |pt AS (SELECT token, sum(c_st) AS c_t FROM st GROUP BY token),
        |tt AS (SELECT sum(c_t) AS t_all FROM pt),
        |l AS (
        |  SELECT st.source, st.token, st.c_st,
        |    round((CAST(st.c_st AS DOUBLE) / CAST(ps.t_s AS DOUBLE)) /
        |          (CAST(pt.c_t AS DOUBLE) / CAST(tt.t_all AS DOUBLE)), 4) AS lift
        |  FROM st
        |  JOIN ps ON st.source = ps.source
        |  JOIN pt ON st.token = pt.token
        |  CROSS JOIN tt
        |  WHERE st.c_st >= 5),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY source
        |    ORDER BY lift DESC, token) AS rank
        |  FROM l)
        |SELECT source, CAST(rank AS BIGINT) AS rank, token,
        |  CAST(c_st AS BIGINT) AS n_in_source, lift
        |FROM r WHERE rank <= 5
        |ORDER BY source, rank""".stripMargin,
    // p11: identical salted-md5 order in both engines; the oracle's
    // single window IS the formulation distributedRank replaces
    "p11_corpus_shuffle" ->
      """SELECT doc_id, source,
        |  md5('p11:' || CAST(doc_id AS VARCHAR)) AS shuffle_key,
        |  row_number() OVER (
        |    ORDER BY md5('p11:' || CAST(doc_id AS VARCHAR)), doc_id) AS shuffle_pos
        |FROM documents
        |ORDER BY shuffle_pos""".stripMargin,
    // p06 stratifies on t02's score: the same replication feeds the
    // quartile cutpoints (quantile_cont == Spark's exact percentile,
    // parity established by q25) and the md5 keep rule (p01's pattern,
    // 'p06:'-salted)
    // p12: p06's quartile CTEs + a (stratum, source)-partitioned
    // within-rank + the global schedule rank — md5 hex orders
    // identically in both engines (p11's contract)
    "p12_curriculum" ->
      ("WITH q AS (" + qualityScoreOracleBody + "),\n" +
        """c AS (SELECT quantile_cont(quality_score, 0.25) AS c1,
          |            quantile_cont(quality_score, 0.5)  AS c2,
          |            quantile_cont(quality_score, 0.75) AS c3 FROM q),
          |s AS (SELECT q.doc_id, d.source,
          |  CASE WHEN quality_score < c1 THEN 0
          |       WHEN quality_score < c2 THEN 1
          |       WHEN quality_score < c3 THEN 2 ELSE 3 END AS stratum,
          |  md5('p12:' || CAST(q.doc_id AS VARCHAR)) AS k
          |  FROM q JOIN documents d ON d.doc_id = q.doc_id, c),
          |r AS (SELECT doc_id, source, stratum,
          |  row_number() OVER (PARTITION BY stratum, source
          |                     ORDER BY k, doc_id) AS rr
          |  FROM s)
          |SELECT doc_id, stratum, source,
          |  row_number() OVER (ORDER BY stratum, rr, source, doc_id) AS seq
          |FROM r
          |ORDER BY seq""".stripMargin),
    "p06_stratified_sample" ->
      ("WITH q AS (" + qualityScoreOracleBody + "),\n" +
        """c AS (SELECT quantile_cont(quality_score, 0.25) AS c1,
          |            quantile_cont(quality_score, 0.5)  AS c2,
          |            quantile_cont(quality_score, 0.75) AS c3 FROM q),
          |s AS (SELECT doc_id, quality_score,
          |  CASE WHEN quality_score < c1 THEN 0
          |       WHEN quality_score < c2 THEN 1
          |       WHEN quality_score < c3 THEN 2 ELSE 3 END AS stratum,
          |  ('0x' || substr(md5('p06:' || CAST(doc_id AS VARCHAR)), 1, 4))::UBIGINT % 100 AS bucket
          |  FROM q, c)
          |SELECT doc_id, quality_score, stratum,
          |  bucket < [10, 25, 50, 100][stratum + 1] AS kept
          |FROM s
          |ORDER BY doc_id""".stripMargin),
    "t03_token_count" ->
      """SELECT source,
        | count(*) AS n_docs,
        | CAST(sum(len(string_split(trim(text), ' '))) AS BIGINT) AS ws_tokens,
        | CAST(sum(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]'))) AS BIGINT) AS bpe_tokens,
        | round(avg(len(string_split(trim(text), ' '))), 4) AS avg_ws_tokens
        |FROM documents
        |GROUP BY source
        |ORDER BY source""".stripMargin,
    // the exact top-20 hash-compares; sketch_ok is a contract column
    // (oracle-side literal true), q34's sketch-check pattern
    "t10_topk_sketch" ->
      """WITH tok AS (
        |  SELECT unnest(list_filter(regexp_split_to_array(lower(text), '[ \n\t\r]+'),
        |                t -> t <> '')) AS token
        |  FROM documents),
        |e AS (SELECT token, count(*) AS tf FROM tok GROUP BY token),
        |w AS (SELECT token, tf FROM e ORDER BY tf DESC, token LIMIT 20)
        |SELECT token, CAST(tf AS BIGINT) AS tf, true AS sketch_ok
        |FROM w
        |ORDER BY tf DESC, token""".stripMargin,
    // t11: PMI from long counts divided as doubles in the SAME op
    // order as Spark; ranking on the ROUNDED score so a log2 ULP
    // can't reorder the top-k
    "t11_collocations" ->
      """WITH tk AS (
        |  SELECT list_filter(regexp_split_to_array(lower(text), '[ \n\t\r]+'),
        |                     t -> t <> '') AS t
        |  FROM documents),
        |u AS (SELECT unnest(t) AS w FROM tk),
        |uni AS (SELECT w, count(*) AS cu FROM u GROUP BY w),
        |ut AS (SELECT sum(cu) AS t_uni FROM uni),
        |bg AS (
        |  SELECT unnest(list_transform(range(1, greatest(len(t) - 1, 0) + 1),
        |    i -> t[i] || ' ' || t[i+1])) AS bigram
        |  FROM tk),
        |bi AS (SELECT bigram, count(*) AS n_pair FROM bg GROUP BY bigram),
        |bt AS (SELECT sum(n_pair) AS t_bi FROM bi),
        |j AS (
        |  SELECT b.bigram, b.n_pair,
        |    round(log2((CAST(b.n_pair AS DOUBLE) / CAST(bt.t_bi AS DOUBLE)) /
        |      ((CAST(ux.cu AS DOUBLE) / CAST(ut.t_uni AS DOUBLE)) *
        |       (CAST(uy.cu AS DOUBLE) / CAST(ut.t_uni AS DOUBLE)))), 4) AS pmi
        |  FROM bi b
        |  CROSS JOIN ut CROSS JOIN bt
        |  JOIN uni ux ON ux.w = string_split(b.bigram, ' ')[1]
        |  JOIN uni uy ON uy.w = string_split(b.bigram, ' ')[2]
        |  WHERE b.n_pair >= 10)
        |SELECT bigram, n_pair, pmi FROM j
        |ORDER BY pmi DESC, bigram LIMIT 30""".stripMargin,
    // t12: identical point set (ties lexicographic), 4dp rounding
    // absorbs cross-engine sum reassociation (q40's contract)
    "t12_zipf_fit" ->
      """WITH tok AS (
        |  SELECT unnest(list_filter(regexp_split_to_array(lower(text), '[ \n\t\r]+'),
        |                t -> t <> '')) AS token
        |  FROM documents),
        |tf AS (SELECT token, count(*) AS tf FROM tok GROUP BY token),
        |top AS (SELECT token, tf FROM tf ORDER BY tf DESC, token LIMIT 1000),
        |rk AS (SELECT tf, row_number() OVER (ORDER BY tf DESC, token) AS rank FROM top),
        |l AS (SELECT log2(rank) AS lx, log2(tf) AS ly FROM rk)
        |SELECT CAST(count(*) AS BIGINT) AS n_tokens,
        |  round(regr_slope(ly, lx), 4) AS slope,
        |  round(regr_intercept(ly, lx), 4) AS intercept,
        |  round(regr_r2(ly, lx), 4) AS r2
        |FROM l""".stripMargin,
    // d17 = the d02 all-pairs truth rolled up to source pairs
    "d17_cross_source_dups" ->
      ("WITH " + minhashTruthOracleCtes + """,
        |sel AS (SELECT doc_a, doc_b FROM j WHERE jac >= 0.7)
        |SELECT least(da.source, db.source) AS source_a,
        |  greatest(da.source, db.source) AS source_b,
        |  CAST(count(*) AS BIGINT) AS n_shared_pairs
        |FROM sel
        |JOIN documents da ON da.doc_id = sel.doc_a
        |JOIN documents db ON db.doc_id = sel.doc_b
        |GROUP BY 1, 2
        |ORDER BY source_a, source_b""".stripMargin),
    "d06_contamination" -> contaminationOracleSql,
    // d13: same FULL 32-word windows (floor — short tails excluded),
    // same single-space split as d08/p02 (consecutive-space empties
    // kept identically in both engines)
    "d13_chunk_dedup" ->
      """WITH tk AS (
        |  SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
        |ch0 AS (
        |  SELECT doc_id,
        |    list_transform(range(CAST(floor(len(t) / 32.0) AS BIGINT)),
        |      i -> md5(array_to_string(t[(i*32+1):(i*32+32)], ' '))) AS hashes
        |  FROM tk),
        |ch AS (SELECT doc_id, unnest(hashes) AS chunk_hash FROM ch0)
        |SELECT chunk_hash,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS n_occurrences,
        |  min(doc_id) AS first_doc
        |FROM ch
        |GROUP BY chunk_hash
        |HAVING count(DISTINCT doc_id) >= 2
        |ORDER BY chunk_hash""".stripMargin,
    // d15's oracle is the brute-force all-pairs 3-gram-shingle-set
    // Jaccard truth (d04's shape at n=3/0.7): prefix filtering claims
    // recall 1 by theorem, so the oracle must NOT replicate the
    // candidate scheme — any pair the prefix join missed fails the
    // hash compare.
    "d15_dedup_prefix" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(text, '[ \n\t\r]+'), t -> t <> '') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
        |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
        |  FROM tk),
        |ne AS (SELECT * FROM sh WHERE len(s) > 0),
        |p AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    len(list_intersect(a.s, b.s)) AS i, len(a.s) AS na, len(b.s) AS nb
        |  FROM ne a JOIN ne b ON a.doc_id < b.doc_id),
        |j AS (
        |  SELECT doc_a, doc_b, i / CAST(na + nb - i AS DOUBLE) AS jac FROM p)
        |SELECT doc_a, doc_b, round(jac, 4) AS jaccard3
        |FROM j WHERE jac >= 0.7
        |ORDER BY doc_a, doc_b""".stripMargin,
    // p08 = d06's contamination verdict x p01's md5 split, fused
    "p08_decontaminated_split" ->
      ("WITH c AS (" + contaminationOracleSql + "),\n" +
        """p AS (
          |  SELECT doc_id,
          |    CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::UBIGINT % 100 < 90
          |           THEN 'train'
          |         WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::UBIGINT % 100 < 95
          |           THEN 'val'
          |         ELSE 'test' END AS split
          |  FROM documents)
          |SELECT c.doc_id, p.split, c.contaminated,
          |  (p.split = 'train' AND NOT c.contaminated) AS included
          |FROM c JOIN p ON c.doc_id = p.doc_id
          |ORDER BY c.doc_id""".stripMargin),
    // d12 is d06 with a bloom PREFILTER — blooms have no false
    // negatives and the exact verify removes false positives, so the
    // result (and therefore the oracle) is identical by construction.
    "d12_contamination_bloom" -> contaminationOracleSql,
    "q38_latest_per_key" ->
      """WITH r AS (
        |  SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice, o_orderstatus,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn,
        |    count(*) OVER (PARTITION BY o_custkey) AS n_orders
        |  FROM orders)
        |SELECT o_custkey, o_orderdate AS latest_date, o_orderkey AS latest_orderkey,
        |  round(o_totalprice, 2) AS latest_price, o_orderstatus AS latest_status,
        |  CAST(n_orders AS BIGINT) AS n_orders
        |FROM r WHERE rn = 1
        |ORDER BY o_custkey""".stripMargin,
    // d09 oracle replicates the candidate rule exactly (rare-shingle
    // inverted index, df in [2,20]) and verifies containment on the
    // same word-3-gram shingle sets the kernel builds.
    "d09_dedup_containment" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(text, '[ \n\t\r]+'), t -> t <> '') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
        |    THEN list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
        |    ELSE [] END) AS s
        |  FROM tk),
        |inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |rare AS (SELECT g FROM inv GROUP BY g HAVING count(*) BETWEEN 2 AND 20),
        |ri AS (SELECT doc_id, g FROM inv WHERE g IN (SELECT g FROM rare)),
        |cand AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM ri a JOIN ri b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2 HAVING count(*) >= 3),
        |sc AS (
        |  SELECT c.doc_a, c.doc_b,
        |    CASE WHEN len(sa.s) = 0 THEN 0.0
        |         ELSE len(list_intersect(sa.s, sb.s))::DOUBLE / len(sa.s) END AS ab,
        |    CASE WHEN len(sb.s) = 0 THEN 0.0
        |         ELSE len(list_intersect(sa.s, sb.s))::DOUBLE / len(sb.s) END AS ba
        |  FROM cand c
        |  JOIN sh sa ON sa.doc_id = c.doc_a
        |  JOIN sh sb ON sb.doc_id = c.doc_b)
        |SELECT contained_id, container_id, containment FROM (
        |  SELECT doc_a AS contained_id, doc_b AS container_id,
        |    round(ab, 4) AS containment FROM sc WHERE ab >= 0.8
        |  UNION ALL
        |  SELECT doc_b, doc_a, round(ba, 4) FROM sc WHERE ba >= 0.8)
        |ORDER BY contained_id, container_id""".stripMargin,
    // t08 oracle rebuilds the entropy sum in ASCENDING char order
    // (list(... ORDER BY c) + list_sum = the kernel's byte loop);
    // ASCII-only parity like t04 (substr chars vs kernel bytes).
    "t08_entropy" ->
      """WITH ch AS (
        |  SELECT doc_id,
        |    list_transform(range(1, length(text) + 1),
        |      i -> substr(text, CAST(i AS INTEGER), 1)) AS cs
        |  FROM documents),
        |e AS (SELECT doc_id, unnest(cs) AS c FROM ch),
        |cnt AS (SELECT doc_id, c, count(*) AS k FROM e GROUP BY doc_id, c),
        |s AS (
        |  SELECT doc_id,
        |    list_sum(list_transform(list(CAST(k AS DOUBLE) ORDER BY c),
        |      x -> x * ln(x))) AS sl
        |  FROM cnt GROUP BY doc_id)
        |SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n_chars,
        |  round(CASE WHEN length(d.text) = 0 THEN 0.0
        |        ELSE ln(CAST(length(d.text) AS DOUBLE)) - s.sl / length(d.text)
        |        END, 4) AS entropy,
        |  (CASE WHEN length(d.text) = 0 THEN 0.0
        |        ELSE ln(CAST(length(d.text) AS DOUBLE)) - s.sl / length(d.text)
        |        END) < 2.0 AS low_entropy
        |FROM documents d LEFT JOIN s ON s.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    // t04 oracle replicates winnowing EXACTLY in SQL: FNV-1a 64 +
    // splitmix64 with wrap-around arithmetic emulated in UHUGEINT
    // (multiply then mod 2^64), rightmost-min window selection via
    // (value ASC, index DESC) row_number, consecutive-dedup = index
    // distinct (selections are monotone), two's-complement back to
    // the JVM long. ASCII-ONLY parity: the oracle grams via substr
    // (characters) and hashes via ord (code points) while the Spark
    // kernel walks UTF-8 BYTES — identical only while every char is
    // one byte, which holds for the synthetic corpus. A non-ASCII
    // corpus needs byte-based grams here (encode(text) + per-byte
    // access) to match the kernel.
    "t04_fingerprint" ->
      """WITH g AS (
        |  SELECT doc_id,
        |    list_transform(range(1, greatest(length(text) - 8 + 1, 0) + 1), i ->
        |      substr(text, CAST(i AS INTEGER), 8)) AS grams
        |  FROM documents),
        |h0 AS (
        |  SELECT doc_id, generate_subscripts(grams, 1) AS i, unnest(grams) AS gram
        |  FROM g),
        |h1 AS (
        |  SELECT doc_id, i,
        |    list_reduce(
        |      list_prepend(CAST(14695981039346656037 AS UBIGINT),
        |        list_transform(range(1, 9), j -> CAST(ord(substr(gram, CAST(j AS INTEGER), 1)) AS UBIGINT))),
        |      (h, c) -> CAST((CAST(xor(h, c) AS UHUGEINT) * 1099511628211) % 18446744073709551616 AS UBIGINT)
        |    ) AS f
        |  FROM h0),
        |h2 AS (
        |  SELECT doc_id, i,
        |    CAST((CAST(f AS UHUGEINT) + 11400714819323198485) % 18446744073709551616 AS UBIGINT) AS z1
        |  FROM h1),
        |h3 AS (
        |  SELECT doc_id, i,
        |    CAST((CAST(xor(z1, z1 >> 30) AS UHUGEINT) * 13787848793156543929) % 18446744073709551616 AS UBIGINT) AS z2
        |  FROM h2),
        |h4 AS (
        |  SELECT doc_id, i,
        |    CAST((CAST(xor(z2, z2 >> 27) AS UHUGEINT) * 10723151780598845931) % 18446744073709551616 AS UBIGINT) AS z3
        |  FROM h3),
        |hh AS (
        |  SELECT doc_id, i,
        |    CAST(CASE WHEN xor(z3, z3 >> 31) >= 9223372036854775808
        |         THEN CAST(xor(z3, z3 >> 31) AS HUGEINT) - 18446744073709551616
        |         ELSE CAST(xor(z3, z3 >> 31) AS HUGEINT) END AS BIGINT) AS v
        |  FROM h4),
        |n AS (SELECT doc_id, count(*) AS ng FROM hh GROUP BY doc_id),
        |selA AS (
        |  SELECT hh.doc_id, hh.v
        |  FROM hh JOIN n USING (doc_id)
        |  WHERE n.ng <= 4
        |  QUALIFY row_number() OVER (PARTITION BY hh.doc_id ORDER BY hh.v ASC, hh.i DESC) = 1),
        |winB AS (
        |  SELECT a.doc_id, a.i AS win, b.i, b.v
        |  FROM hh a JOIN n USING (doc_id)
        |  JOIN hh b ON b.doc_id = a.doc_id AND b.i BETWEEN a.i AND a.i + 3
        |  WHERE n.ng > 4 AND a.i <= n.ng - 3),
        |selB0 AS (
        |  SELECT doc_id, win, i, v
        |  FROM winB
        |  QUALIFY row_number() OVER (PARTITION BY doc_id, win ORDER BY v ASC, i DESC) = 1),
        |selB AS (SELECT DISTINCT doc_id, i, v FROM selB0),
        |sel AS (SELECT doc_id, v FROM selA UNION ALL SELECT doc_id, v FROM selB),
        |fp AS (
        |  SELECT doc_id, count(*) AS n_fp, min(v) AS fp_min, max(v) AS fp_max
        |  FROM sel GROUP BY doc_id),
        |dv AS (SELECT DISTINCT doc_id, v FROM sel),
        |shared AS (SELECT v FROM dv GROUP BY v HAVING count(*) > 1),
        |sh AS (SELECT DISTINCT doc_id FROM dv WHERE v IN (SELECT v FROM shared))
        |SELECT d.doc_id,
        |  CAST(coalesce(fp.n_fp, 0) AS INTEGER) AS n_fp,
        |  fp.fp_min, fp.fp_max,
        |  coalesce(sh.doc_id IS NOT NULL, FALSE) AS shares_fp
        |FROM documents d
        |LEFT JOIN fp ON fp.doc_id = d.doc_id
        |LEFT JOIN sh ON sh.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "t05_repetition" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(text, '[ \n\t\r]+'), t -> t <> '') AS t
        |  FROM documents),
        |gr AS (
        |  SELECT doc_id, CASE WHEN len(t) >= 2
        |    THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
        |    ELSE [] END AS g
        |  FROM tk),
        |e AS (SELECT doc_id, unnest(g) AS gram FROM gr),
        |c AS (SELECT doc_id, gram, count(*) AS n FROM e GROUP BY doc_id, gram),
        |top AS (
        |  SELECT doc_id, gram, n,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, gram ASC) AS rn
        |  FROM c)
        |SELECT g.doc_id, CAST(len(g.g) AS BIGINT) AS n_2g, t.gram AS top_gram,
        |  CAST(t.n AS BIGINT) AS top_n,
        |  round(t.n / CAST(len(g.g) AS DOUBLE), 4) AS rep_ratio
        |FROM gr g JOIN top t ON g.doc_id = t.doc_id AND t.rn = 1
        |WHERE len(g.g) > 0
        |ORDER BY g.doc_id""".stripMargin,
    // d07 oracle: the d02 all-pairs edge set (see that comment), then
    // true connected components via a recursive CTE — min reachable
    // node per doc — so the Spark iterative hash-to-min result is
    // checked against exact transitive closure. The CTE chain is
    // shared by d07/d08/d14.
    "d07_dedup_clusters" ->
      ("WITH RECURSIVE " + closureOracleCtes + """
        |SELECT l.doc_id, l.cluster_id, CAST(s.cluster_size AS BIGINT) AS cluster_size
        |FROM lab l JOIN sz s USING (cluster_id)
        |ORDER BY l.doc_id""".stripMargin),
    // d20: d07's closure + tick weights (2^20 // size, positive
    // floor-div) + the 20-bit md5-prefix draw (5 hex chars = 2^20
    // buckets exactly); singletons always kept by construction.
    "d20_soft_dedup" ->
      ("WITH RECURSIVE " + closureOracleCtes + """
        |SELECT l.doc_id, l.cluster_id, CAST(s.cluster_size AS BIGINT) AS cluster_size,
        |  CAST(1048576 // s.cluster_size AS BIGINT) AS weight_ticks,
        |  CAST(('0x' || substr(md5('softdedup:' || CAST(l.doc_id AS VARCHAR)), 1, 5))::UBIGINT AS BIGINT)
        |    < 1048576 // s.cluster_size AS kept
        |FROM lab l JOIN sz s USING (cluster_id)
        |ORDER BY l.doc_id""".stripMargin),
    // d21: the d02 all-pairs truth at the planner-tuned 0.35 bar; the
    // hard-coded 32/4 columns pin minhashBandingFor(0.35)'s choice —
    // a planner change that moves the split fails the hash gate.
    "d21_dedup_tuned" ->
      ("WITH " + minhashTruthOracleCtes + """
        |SELECT doc_a, doc_b, round(jac, 4) AS jaccard,
        |  CAST(32 AS BIGINT) AS lsh_bands, CAST(4 AS BIGINT) AS lsh_rows
        |FROM j WHERE jac >= 0.35
        |ORDER BY doc_a, doc_b""".stripMargin),
    // d08 oracle: d07's transitive closure, survivors only, joined
    // back for payload stats.
    "d08_dedup_apply" ->
      ("WITH RECURSIVE " + closureOracleCtes + """
        |SELECT d.doc_id, d.source,
        |  CAST(len(string_split(trim(d.text), ' ')) AS BIGINT) AS n_tokens,
        |  CAST(s.cluster_size AS BIGINT) AS n_merged
        |FROM lab l JOIN sz s USING (cluster_id)
        |JOIN documents d ON d.doc_id = l.doc_id
        |WHERE l.doc_id = l.cluster_id
        |ORDER BY d.doc_id""".stripMargin),
    // d14: the closure's cluster-size distribution
    "d14_dedup_report" ->
      ("WITH RECURSIVE " + closureOracleCtes + """
        |SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
        |  CAST(count(*) AS BIGINT) AS n_clusters,
        |  CAST(cluster_size * count(*) AS BIGINT) AS n_docs
        |FROM sz
        |GROUP BY cluster_size
        |ORDER BY cluster_size""".stripMargin),
    "p03_mix_sample" ->
      """WITH r(source, rate_pct) AS (VALUES ('src0', 0), ('src1', 50), ('src2', 25)),
        |d AS (
        |  SELECT doc_id, d.source,
        |    coalesce(r.rate_pct, 100) AS rate_pct,
        |    CAST(('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 4))::UBIGINT % 100
        |         AS BIGINT) AS bucket
        |  FROM documents d LEFT JOIN r USING (source))
        |SELECT source, count(*) AS n_total,
        |  CAST(sum(CASE WHEN bucket < rate_pct THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  round(sum(CASE WHEN bucket < rate_pct THEN 1 ELSE 0 END)
        |        / CAST(count(*) AS DOUBLE), 4) AS kept_frac
        |FROM d
        |GROUP BY source
        |ORDER BY source""".stripMargin,
    "j01_asof_join" ->
      """WITH u AS (
        |  SELECT o_custkey AS user_id, o_orderdate AS t, 0 AS is_event,
        |         NULL::BIGINT AS event_id, o_orderkey,
        |         o_orderdate AS od, o_totalprice AS tp
        |  FROM orders
        |  UNION ALL
        |  SELECT user_id, CAST(ts AS TIMESTAMP), 1, event_id, NULL, NULL, NULL
        |  FROM events),
        |w AS (
        |  SELECT *,
        |    last_value(o_orderkey IGNORE NULLS) OVER win AS m_orderkey,
        |    last_value(od IGNORE NULLS) OVER win AS m_orderdate,
        |    last_value(tp IGNORE NULLS) OVER win AS m_totalprice
        |  FROM u
        |  WINDOW win AS (PARTITION BY user_id
        |                 ORDER BY t, is_event, coalesce(o_orderkey, 0)
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_id, user_id, t AS ts, m_orderkey AS last_orderkey,
        |  m_orderdate AS last_orderdate, round(m_totalprice, 2) AS last_totalprice
        |FROM w WHERE is_event = 1
        |ORDER BY event_id""".stripMargin,
    "j02_range_join" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |                  event_type, value FROM events),
        |c AS (SELECT event_id AS click_id, user_id, ts AS click_ts
        |      FROM e WHERE event_type = 'click'),
        |p AS (SELECT user_id, ts AS p_ts, value FROM e
        |      WHERE event_type = 'purchase')
        |SELECT c.click_id, c.user_id, c.click_ts,
        |  count(p.p_ts) AS n_purchases,
        |  coalesce(round(sum(p.value), 2), 0.0) AS total_value
        |FROM c LEFT JOIN p
        |  ON p.user_id = c.user_id AND p.p_ts >= c.click_ts
        |     AND p.p_ts < c.click_ts + INTERVAL 24 HOUR
        |GROUP BY 1, 2, 3
        |ORDER BY click_id""".stripMargin,
    // j03's oracle is the brute-force per-event argmin over ALL the
    // user's orders (independent of the window construction); the
    // composite ORDER BY encodes the same tie rules: nearest µs
    // distance, before beats after, before side largest orderkey,
    // after side smallest
    "j03_nearest_join" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |o AS (SELECT o_custkey, o_orderkey,
        |             CAST(o_orderdate AS TIMESTAMP) AS ot FROM orders),
        |j AS (
        |  SELECT e.event_id, o.o_orderkey, o.ot,
        |    abs(epoch_us(e.ts) - epoch_us(o.ot)) AS ad,
        |    CASE WHEN o.ot <= e.ts THEN 0 ELSE 1 END AS af
        |  FROM e JOIN o ON e.user_id = o.o_custkey),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_id
        |    ORDER BY ad, af,
        |      CASE WHEN af = 0 THEN -o_orderkey ELSE o_orderkey END) AS rn
        |  FROM j)
        |SELECT e.event_id, e.user_id, e.ts,
        |  r.o_orderkey AS nearest_orderkey, r.ot AS nearest_orderdate,
        |  CASE WHEN r.event_id IS NULL THEN 'none'
        |       WHEN r.af = 0 THEN 'before' ELSE 'after' END AS direction,
        |  r.ad AS delta_us
        |FROM e LEFT JOIN (SELECT * FROM r WHERE rn = 1) r
        |  ON e.event_id = r.event_id
        |ORDER BY e.event_id""".stripMargin,
    "t06_redact_ids" ->
      """SELECT entity, key, name,
        |  regexp_replace(name, '[0-9]', 'X', 'g') AS redacted,
        |  CAST(length(name) - length(regexp_replace(name, '[0-9]', '', 'g')) AS BIGINT)
        |    AS n_id_chars,
        |  (length(name) - length(regexp_replace(name, '[0-9]', '', 'g'))) > 0 AS has_id
        |FROM (SELECT 'customer' AS entity, c_custkey AS key, c_name AS name FROM customer
        |      UNION ALL
        |      SELECT 'supplier' AS entity, s_suppkey AS key, s_name AS name FROM supplier)
        |ORDER BY entity, key""".stripMargin,
    // t15: t09's tick contract over conditional bigram probabilities
    // — the model CTE joins each bigram to its FIRST word's unigram
    // count (t11's string_split access), add-one smoothed
    "t15_bigram_bits" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[ \n\t\r]+'), t -> t <> '') AS t
        |  FROM documents),
        |tok AS (SELECT doc_id, unnest(t) AS w FROM tk),
        |uni AS (SELECT w, count(*) AS cu FROM tok GROUP BY w),
        |vs AS (SELECT count(*) AS v_size FROM uni),
        |bg AS (
        |  SELECT doc_id, unnest(list_transform(range(1, greatest(len(t) - 1, 0) + 1),
        |    i -> t[i] || ' ' || t[i+1])) AS bigram
        |  FROM tk),
        |bi AS (SELECT bigram, count(*) AS cb FROM bg GROUP BY bigram),
        |mdl AS (
        |  SELECT b.bigram,
        |    CAST(floor(-log2((b.cb + 1.0) / (u.cu + vs.v_size)) * 1048576.0 + 0.5) AS BIGINT) AS q
        |  FROM bi b
        |  JOIN uni u ON u.w = string_split(b.bigram, ' ')[1]
        |  CROSS JOIN vs),
        |pd AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS nb, CAST(sum(q) AS BIGINT) AS sq
        |  FROM bg JOIN mdl USING (bigram) GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CAST(coalesce(pd.nb, 0) AS BIGINT) AS n_bigrams,
        |  CASE WHEN pd.nb > 0
        |       THEN round(CAST(pd.sq AS DOUBLE) / (1048576.0 * pd.nb), 4)
        |       ELSE NULL END AS bigram_bits
        |FROM documents d LEFT JOIN pd ON pd.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "t09_surprisal" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[ \n\t\r]+'), t -> t <> '') AS t
        |  FROM documents),
        |tok AS (SELECT doc_id, unnest(t) AS token FROM tk),
        |ag AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
        |tot AS (SELECT sum(cnt) AS t_total, count(*) AS v_size FROM ag),
        |mdl AS (
        |  SELECT token,
        |    CAST(floor(-log2((cnt + 1.0) / (t_total + v_size)) * 1048576.0 + 0.5) AS BIGINT) AS q
        |  FROM ag, tot),
        |pd AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens, CAST(sum(q) AS BIGINT) AS sq
        |  FROM tok JOIN mdl USING (token) GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CAST(coalesce(pd.n_tokens, 0) AS BIGINT) AS n_tokens,
        |  CASE WHEN pd.n_tokens > 0
        |       THEN round(CAST(pd.sq AS DOUBLE) / (1048576.0 * pd.n_tokens), 4)
        |       ELSE NULL END AS surprisal_bits
        |FROM documents d LEFT JOIN pd ON pd.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    // t16: the t09 tick contract over per-source KL terms — every sum
    // CAST to BIGINT (the g01/g03 HUGEINT lesson), one log2 per
    // distinct (source, token) from integer counts.
    "t16_source_kl" ->
      """WITH tk AS (
        |  SELECT source,
        |    list_filter(regexp_split_to_array(lower(text), '[ \n\t\r]+'), t -> t <> '') AS t
        |  FROM documents),
        |tok AS (SELECT source, unnest(t) AS w FROM tk),
        |st AS (SELECT source, w, count(*) AS c_sw FROM tok GROUP BY 1, 2),
        |cw AS (SELECT w, CAST(sum(c_sw) AS BIGINT) AS c_w FROM st GROUP BY w),
        |ps AS (SELECT source, CAST(sum(c_sw) AS BIGINT) AS n_s,
        |         CAST(count(*) AS BIGINT) AS src_vocab
        |       FROM st GROUP BY source),
        |tt AS (SELECT CAST(sum(c_w) AS BIGINT) AS n FROM cw),
        |tks AS (
        |  SELECT st.source,
        |    CAST(floor((CAST(st.c_sw AS DOUBLE) / ps.n_s) *
        |      log2((CAST(st.c_sw AS DOUBLE) * tt.n) /
        |           (CAST(cw.c_w AS DOUBLE) * ps.n_s)) *
        |      1048576.0 + 0.5) AS BIGINT) AS q
        |  FROM st JOIN cw USING (w) JOIN ps USING (source) CROSS JOIN tt),
        |sq AS (SELECT source, CAST(sum(q) AS BIGINT) AS sq FROM tks GROUP BY source)
        |SELECT ps.source, ps.n_s AS n_tokens, ps.src_vocab,
        |  round(CAST(sq.sq AS DOUBLE) / 1048576.0, 4) AS kl_bits
        |FROM ps JOIN sq USING (source)
        |ORDER BY ps.source""".stripMargin,
    // t17: same filtered tokenizer as t15/t16; positions via the
    // zipped unnest(range)/unnest(list) pair; integer word scores
    // (deg·2^20)//freq (positive, so DuckDB's flooring // equals
    // Spark's truncating div) and CAST-guarded long sums (the g01
    // HUGEINT lesson). grp differs by a constant 1 from Spark's
    // 0-based positions — group identity, not value, carries.
    "t17_keyphrases" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[ \n\t\r]+'), x -> x <> '') AS t
        |  FROM documents),
        |tok AS (SELECT doc_id, unnest(range(1, len(t) + 1)) AS pos, unnest(t) AS token
        |        FROM tk),
        |ns AS (
        |  SELECT doc_id, pos, token,
        |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        |  FROM tok
        |  WHERE token NOT IN ('the','and','of','to','in','is','that','for','with','on','a')),
        |pl AS (SELECT doc_id, grp, CAST(count(*) AS BIGINT) AS plen
        |       FROM ns GROUP BY doc_id, grp),
        |ws AS (
        |  SELECT ns.token,
        |    (CAST(sum(pl.plen) AS BIGINT) * 1048576) // CAST(count(*) AS BIGINT) AS w
        |  FROM ns JOIN pl ON pl.doc_id = ns.doc_id AND pl.grp = ns.grp
        |  GROUP BY ns.token),
        |ph AS (
        |  SELECT ns.doc_id, ns.grp,
        |    string_agg(ns.token, ' ' ORDER BY ns.pos) AS phrase,
        |    CAST(sum(ws.w) AS BIGINT) AS score
        |  FROM ns JOIN ws ON ws.token = ns.token
        |  GROUP BY ns.doc_id, ns.grp
        |  HAVING count(*) <= 4)
        |SELECT phrase, CAST(count(*) AS BIGINT) AS n_occ, max(score) AS score_ticks
        |FROM ph
        |GROUP BY phrase
        |ORDER BY score_ticks DESC, phrase
        |LIMIT 30""".stripMargin,
    // t18: machine-generated like s13's — the same tokenization as
    // t07's oracle, then BpeRounds unrolled CTE rounds sharing the
    // engine's single-pass `replace` merge-application contract (see
    // TextAnalysis.t18BpeMerges's doc).
    "t18_bpe_merges" -> TextAnalysis.bpeOracleSql,
    // t19: the t09 tick contract per (class, distinct token) — one
    // log2 per model entry, long sums, argmin by (nll, class).
    "t19_naive_bayes" -> TextAnalysis.nbOracleSql,
    // p15: t19's oracle nested as the preds CTE, then three counts
    // and single-division metrics.
    "p15_eval_report" -> Pipeline.p15OracleSql(TextAnalysis.nbOracleSql),
    // p16: StringIndexer rank on the tiny distinct-source frame, the
    // fixed Bucketizer splits, and the z-score from the same exact
    // (n, S, Q) moments — DECIMAL(38,0) variance term, double only at
    // the final sqrt/divide (identical exact-int inputs both engines).
    "p16_feature_encode" ->
      """WITH f AS (SELECT source, count(*) AS c FROM documents GROUP BY source),
        |ix AS (SELECT source,
        |         CAST(row_number() OVER (ORDER BY c DESC, source) - 1 AS BIGINT)
        |           AS source_index
        |       FROM f),
        |ns AS (SELECT CAST(count(*) AS BIGINT) AS n_sources FROM f),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |              CAST(sum(n_chars) AS BIGINT) AS s,
        |              CAST(sum(n_chars * n_chars) AS DECIMAL(38,0)) AS q
        |       FROM documents)
        |SELECT d.doc_id, d.source, ix.source_index, ns.n_sources,
        |  CAST(CASE WHEN d.n_chars < 200 THEN 0
        |            WHEN d.n_chars < 400 THEN 1
        |            WHEN d.n_chars < 800 THEN 2
        |            ELSE 3 END AS BIGINT) AS len_bucket,
        |  CASE WHEN CAST(st.n AS DECIMAL(38,0)) * st.q
        |            - CAST(st.s AS DECIMAL(38,0)) * st.s > 0 THEN
        |    CAST(floor(CAST(d.n_chars * st.n - st.s AS DOUBLE) * 1024.0
        |      / sqrt(CAST(CAST(st.n AS DECIMAL(38,0)) * st.q
        |             - CAST(st.s AS DECIMAL(38,0)) * st.s AS DOUBLE)) + 0.5)
        |      AS BIGINT)
        |  ELSE CAST(0 AS BIGINT) END AS len_z_ticks
        |FROM documents d JOIN ix USING (source), ns, st
        |ORDER BY d.doc_id""".stripMargin,
    // t20: binned Gini split search — integer bins, tick Gini,
    // (cost, feature, bin) argmin.
    "t20_decision_stump" -> TextAnalysis.stumpOracleSql,
    // t21: the shared trainer CTEs + encode join + per-source rollup.
    "t21_bpe_encode" -> TextAnalysis.bpeEncodeOracleSql,
    "t22_decision_tree" -> TextAnalysis.treeOracleSql,
    "t33_deep_tree" -> TextAnalysis.deepTreeOracleSql,
    "t25_random_forest" -> TextAnalysis.forestOracleSql,
    "t34_rf_regression" -> TextAnalysis.regForestOracleSql,
    "t26_boosted_stumps" -> TextAnalysis.boostOracleSql,
    "t27_chi2_contingency" -> TextAnalysis.chi2OracleSql,
    "t29_chi2_select" -> TextAnalysis.t29OracleSql,
    "t30_hashing_tf" -> TextAnalysis.t30OracleSql,
    "t31_gbt_stumps" -> TextAnalysis.gbtOracleSql,
    "p17_roc_auc" -> Pipeline.p17OracleSql(
      TextAnalysis.stumpBaseCtes, graft.operators.Pipeline.RocBins),
    // p18: the q49 ridge model scored back over its own on-grid
    // feature frame — exact dyadic predictions quantized to integer
    // grids before squaring, all ratios truncating non-negative
    // divisions (// ≡ div).
    "p18_regression_eval" -> p18OracleSql,
    // p19: the s25 rk chain + hit joins + literal NDCG tick tables.
    "p19_ranking_eval" -> Pipeline.p19OracleSql(Recommend.recTopkCtes),
    // p28: the p19 chain under the p01 md5-bucket user sample.
    "p28_ranking_eval_sampled" ->
      Pipeline.p28OracleSql(Recommend.recTopkCtes),
    // p20: pure md5 bit-slice arithmetic, identical both engines.
    "p20_random_features" -> Pipeline.p20OracleSql,
    // p21: exact type-1 grid quantiles, integer split rule.
    "p21_quantile_bins" -> Pipeline.p21OracleSql,
    // p22: per-fold ridge solves + the shared p18 metric chain.
    "p22_cross_validation" -> p22OracleSql,
    "p29_param_sweep" -> p29OracleSql,
    // p24: nested-pool ridge solves + the shared p18 metric chain
    // over the fixed held-out fold.
    "p24_data_scaling" -> p24OracleSql,
    // p23: explode + sum-square join-back + the shared sqrt tree.
    "p23_vector_transforms" -> Pipeline.p23OracleSql,
    "p25_feature_scalers" -> Pipeline.p25OracleSql,
    "p26_feature_expand" -> Pipeline.p26OracleSql,
    "p27_multilabel" -> Pipeline.p27OracleSql,
    "t23_topics" -> Recommend.topicsOracleSql,
    "t24_topic_terms" -> Recommend.topicTermsOracleSql,
    // t32: the shared topic chain + the SpGEMM fold-in join.
    "t32_topic_infer" -> Recommend.topicInferOracleSql,
    // t35: the contract-checked MAP-LDA — the oracle recomputes the
    // exact md5 theta-seed grid over the top-V vocabulary and pins
    // the EM/Dirichlet booleans TRUE (the q68/s35 posture).
    "t35_lda_map" -> Recommend.ldaOracleSql,
    // t28: positional-equi-join skip-gram pairs, g11's PPMI scoring
    // text, the s16 coarsening, the shared alternating-solve chain.
    "t28_word_vectors" -> Recommend.wordVectorsOracleSql,
    "q39_recursive_cal" ->
      """WITH RECURSIVE cal(month) AS (
        |  SELECT CAST(date_trunc('month', (SELECT min(o_orderdate) FROM orders)) AS DATE)
        |  UNION ALL
        |  SELECT CAST(month + INTERVAL 1 MONTH AS DATE) FROM cal
        |  WHERE month < CAST(date_trunc('month', (SELECT max(o_orderdate) FROM orders)) AS DATE))
        |SELECT cal.month,
        |  CAST(count(o.o_orderkey) AS BIGINT) AS n_orders,
        |  round(coalesce(sum(o.o_totalprice), 0.0), 2) AS total_price
        |FROM cal LEFT JOIN orders o
        |  ON CAST(date_trunc('month', o.o_orderdate) AS DATE) = cal.month
        |GROUP BY cal.month
        |ORDER BY cal.month""".stripMargin,
    "q40_stats_suite" ->
      """SELECT l_returnflag,
        |  CAST(count(*) AS BIGINT) AS n,
        |  round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
        |  round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_s,
        |  round(covar_pop(l_quantity, l_extendedprice), 4) AS covar_p,
        |  round(stddev_samp(l_extendedprice), 4) AS stddev_price,
        |  round(var_samp(l_extendedprice), 4) AS var_price,
        |  round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        |  round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
        |  round(regr_r2(l_extendedprice, l_quantity), 4) AS r2
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "t07_vocab" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[ \n\t\r]+'), t -> t <> '') AS t
        |  FROM documents),
        |tok AS (SELECT doc_id, unnest(t) AS token FROM tk),
        |ag AS (SELECT token, CAST(count(*) AS BIGINT) AS tf,
        |         CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        |       FROM tok GROUP BY token),
        |n AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT token, tf, df, round(ln((n.n_docs + 1.0) / (df + 1.0)), 4) AS idf
        |FROM ag, n
        |ORDER BY df DESC, token
        |LIMIT 100""".stripMargin,
    "p01_split_assign" ->
      """SELECT doc_id, source,
        |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::UBIGINT % 100
        |       AS BIGINT) AS bucket,
        |  CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::UBIGINT % 100 < 90
        |         THEN 'train'
        |       WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::UBIGINT % 100 < 95
        |         THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "p02_pack_chunks" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 8 AS shard,
        |    CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |w AS (
        |  SELECT *, CAST(coalesce(sum(n_tokens) OVER (
        |      PARTITION BY shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |    AS start_offset
        |  FROM d)
        |SELECT doc_id, shard, n_tokens, start_offset,
        |  start_offset // 2048 AS chunk_id,
        |  n_tokens > 0 AND (start_offset + n_tokens - 1) // 2048 <> start_offset // 2048
        |    AS spans_boundary
        |FROM w
        |ORDER BY doc_id""".stripMargin,
    // p04 oracle composes the t02 quality formula, the t08 entropy
    // (same ORDER BY c float-sum contract), and d01's min-id
    // survivor rule — the curation filter end to end.
    "p04_curate" ->
      """WITH q AS (
        |  SELECT doc_id,
        |    len(string_split(text, ' ')) AS n_tokens,
        |    round(len(list_filter(string_split(text, ' '),
        |            t -> t IN ('the','and','of','to','in','is','that','for','with','on')))::DOUBLE
        |          / len(string_split(text, ' ')), 4) AS stopword_ratio,
        |    round(len(list_distinct(string_split(text, ' ')))::DOUBLE
        |          / len(string_split(text, ' ')), 4) AS distinct_ratio
        |  FROM documents),
        |qs AS (
        |  SELECT doc_id, n_tokens,
        |    round(least(1.0, n_tokens / 100.0) * 0.4
        |          + stopword_ratio * 0.3 + distinct_ratio * 0.3, 5) AS quality_score
        |  FROM q),
        |ch AS (
        |  SELECT doc_id, list_transform(range(1, length(text) + 1),
        |      i -> substr(text, CAST(i AS INTEGER), 1)) AS cs
        |  FROM documents),
        |e AS (SELECT doc_id, unnest(cs) AS c FROM ch),
        |cnt AS (SELECT doc_id, c, count(*) AS k FROM e GROUP BY doc_id, c),
        |s AS (SELECT doc_id,
        |    list_sum(list_transform(list(CAST(k AS DOUBLE) ORDER BY c),
        |      x -> x * ln(x))) AS sl
        |  FROM cnt GROUP BY doc_id),
        |h AS (
        |  SELECT d.doc_id,
        |    CASE WHEN length(d.text) = 0 THEN 0.0
        |         ELSE ln(CAST(length(d.text) AS DOUBLE)) - s.sl / length(d.text)
        |    END AS hv
        |  FROM documents d LEFT JOIN s ON s.doc_id = d.doc_id),
        |k AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text))
        |SELECT qs.doc_id, qs.n_tokens, qs.quality_score, round(h.hv, 4) AS entropy
        |FROM qs JOIN h ON h.doc_id = qs.doc_id
        |WHERE qs.doc_id IN (SELECT doc_id FROM k)
        |  AND qs.quality_score >= 0.35 AND NOT (h.hv < 2.0)
        |ORDER BY qs.doc_id""".stripMargin,
    // p05: both engines profile the STRINGIFIED value (so numeric
    // columns compare their decimal rendering) and count distincts on
    // md5 digests — exactly what the Spark side shuffles.
    "p05_profile" ->
      """WITH m AS (
        |  SELECT 'doc_id' AS col_name, CAST(doc_id AS VARCHAR) AS val FROM documents
        |  UNION ALL SELECT 'text', text FROM documents
        |  UNION ALL SELECT 'lang', lang FROM documents
        |  UNION ALL SELECT 'source', source FROM documents
        |  UNION ALL SELECT 'n_chars', CAST(n_chars AS VARCHAR) FROM documents)
        |SELECT col_name,
        |  count(*) AS n_rows,
        |  CAST(sum(CASE WHEN val IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |  CAST(count(DISTINCT md5(val)) AS BIGINT) AS n_distinct,
        |  CAST(min(length(val)) AS BIGINT) AS min_len,
        |  CAST(max(length(val)) AS BIGINT) AS max_len,
        |  round(avg(CAST(length(val) AS DOUBLE)), 2) AS avg_len
        |FROM m
        |GROUP BY col_name
        |ORDER BY col_name""".stripMargin,
    "m01_binary_meta" ->
      """SELECT doc_id,
        | CASE WHEN doc_id % 3 = 0 THEN 'image/png'
        |      WHEN doc_id % 3 = 1 THEN 'image/jpeg'
        |      ELSE 'audio/wav' END AS mime,
        | CAST(4 + octet_length(encode(text)) AS BIGINT) AS byte_len,
        | md5(text) AS content_hash
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    // p14: same filtered tokenizer, the integer chunk geometry
    // (ceil via (n-s+st-1)//st on positives), regular starts zipped
    // with their ordinal + the right-aligned final start appended.
    "p14_chunk_overlap" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(regexp_split_to_array(lower(text), '[ \n\t\r]+'),
        |         x -> x <> '')) AS BIGINT) AS n
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, n,
        |    CASE WHEN n > 128 THEN (n - 128 + 95) // 96 ELSE 0 END AS nf
        |  FROM tk),
        |st AS (
        |  SELECT doc_id, n,
        |    list_transform(range(0, nf), k -> k * 96) || [greatest(n - 128, 0)] AS starts
        |  FROM g),
        |ch AS (
        |  SELECT doc_id, n,
        |    unnest(range(0, len(starts))) AS chunk_id,
        |    unnest(starts) AS start_tok
        |  FROM st)
        |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
        |  CAST(start_tok AS BIGINT) AS start_tok,
        |  CAST(least(start_tok + 128, n) AS BIGINT) AS end_tok,
        |  CAST(least(start_tok + 128, n) - start_tok AS BIGINT) AS n_tok
        |FROM ch
        |ORDER BY doc_id, chunk_id""".stripMargin,
    // p13: one flags CTE, the survivor-ranked dedup stage computed
    // over stage-3 survivors only (a prefix group can span documents
    // with different upstream flags), sums CAST back from HUGEINT.
    "p13_yield_report" ->
      """WITH base AS (
        |  SELECT doc_id, lang, text, n_chars,
        |    list_filter(regexp_split_to_array(lower(text), '[ \n\t\r]+'), x -> x <> '') AS tk
        |  FROM documents),
        |b2 AS (SELECT *, CAST(len(tk) AS BIGINT) AS n_tokens,
        |         lang = 'en' AS s2, n_chars >= 100 AS s3 FROM base),
        |surv AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY md5(substr(text, 1, 80))
        |                       ORDER BY doc_id) = 1 AS s4,
        |    10 * len(list_distinct(tk)) >= 3 * len(tk) AS s5
        |  FROM b2 WHERE s2 AND s3),
        |ab AS (SELECT CAST(count(*) AS BIGINT) AS d1, CAST(sum(n_tokens) AS BIGINT) AS t1,
        |         CAST(sum(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT) AS d2,
        |         CAST(sum(CASE WHEN s2 THEN n_tokens ELSE 0 END) AS BIGINT) AS t2,
        |         CAST(sum(CASE WHEN s2 AND s3 THEN 1 ELSE 0 END) AS BIGINT) AS d3,
        |         CAST(sum(CASE WHEN s2 AND s3 THEN n_tokens ELSE 0 END) AS BIGINT) AS t3
        |       FROM b2),
        |asv AS (SELECT CAST(sum(CASE WHEN s4 THEN 1 ELSE 0 END) AS BIGINT) AS d4,
        |          CAST(sum(CASE WHEN s4 THEN n_tokens ELSE 0 END) AS BIGINT) AS t4,
        |          CAST(sum(CASE WHEN s4 AND s5 THEN 1 ELSE 0 END) AS BIGINT) AS d5,
        |          CAST(sum(CASE WHEN s4 AND s5 THEN n_tokens ELSE 0 END) AS BIGINT) AS t5
        |        FROM surv),
        |agg AS (SELECT * FROM ab, asv)
        |SELECT * FROM (
        |  SELECT 1 AS stage_id, 'raw' AS stage, d1 AS n_docs, t1 AS n_tokens,
        |         round(CAST(d1 AS DOUBLE) * 100.0 / d1, 2) AS pct_docs FROM agg
        |  UNION ALL SELECT 2, 'lang_en', d2, t2, round(CAST(d2 AS DOUBLE) * 100.0 / d1, 2) FROM agg
        |  UNION ALL SELECT 3, 'min_length', d3, t3, round(CAST(d3 AS DOUBLE) * 100.0 / d1, 2) FROM agg
        |  UNION ALL SELECT 4, 'prefix_dedup', d4, t4, round(CAST(d4 AS DOUBLE) * 100.0 / d1, 2) FROM agg
        |  UNION ALL SELECT 5, 'diversity', d5, t5, round(CAST(d5 AS DOUBLE) * 100.0 / d1, 2) FROM agg)
        |ORDER BY stage_id""".stripMargin,
    // m05: the oracle recomputes the expected integrity verdicts
    // arithmetically (the corruption pattern is a pure function of
    // doc_id, the blob a pure function of text), so the engine's
    // ACTUAL byte checks — magic sniff, blob length — are what the
    // hash compare validates.
    "m05_integrity" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 'image/png'
        |         WHEN doc_id % 3 = 1 THEN 'image/jpeg'
        |         ELSE 'audio/wav' END AS true_mime,
        |    CAST(4 + octet_length(encode(text)) AS BIGINT) AS true_len
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 3 THEN 'image/png' ELSE true_mime END AS declared_mime,
        |    true_mime AS sniffed_mime,
        |    true_len + CASE WHEN doc_id % 11 = 5 THEN 17 ELSE 0 END AS declared_len,
        |    true_len AS actual_len
        |  FROM b)
        |SELECT doc_id, declared_mime, sniffed_mime,
        |  CAST(declared_len AS BIGINT) AS declared_len, actual_len,
        |  CASE WHEN declared_mime = sniffed_mime AND declared_len = actual_len THEN 'ok'
        |       WHEN declared_mime <> sniffed_mime AND declared_len <> actual_len THEN 'mime+len'
        |       WHEN declared_mime <> sniffed_mime THEN 'mime_mismatch'
        |       ELSE 'len_mismatch' END AS status
        |FROM m
        |ORDER BY doc_id""".stripMargin,
    "m04_sample_assembly" ->
      """WITH meta AS (
        |  SELECT doc_id, source,
        |    CASE WHEN doc_id % 3 = 0 THEN 'image/png'
        |         WHEN doc_id % 3 = 1 THEN 'image/jpeg'
        |         ELSE 'audio/wav' END AS mime,
        |    CAST(4 + octet_length(encode(text)) AS BIGINT) AS byte_len,
        |    md5(text) AS content_hash,
        |    CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |b AS (
        |  SELECT m.*, e.label AS embed_label,
        |    ('0x' || substr(md5(CAST(m.doc_id AS VARCHAR)), 1, 4))::UBIGINT % 100 AS bucket
        |  FROM meta m JOIN embeddings e ON e.vec_id = m.doc_id
        |  WHERE m.mime LIKE 'image/%')
        |SELECT doc_id, mime, byte_len, content_hash, n_tokens, source, embed_label,
        |  CASE WHEN bucket < 90 THEN 'train'
        |       WHEN bucket < 95 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM b
        |ORDER BY doc_id""".stripMargin,
    // m02 oracle: the engine encodes planted pixels into REAL PNG/BMP
    // containers and decodes them with ImageIO; the oracle recomputes
    // the decoded statistics ARITHMETICALLY (dims and per-channel
    // pixel values are a pure function of doc_id and both formats are
    // lossless), so a broken encoder, decoder, or channel-order bug
    // hash-fails the gate. DuckDB cannot (and should not) run a codec.
    "m02_image_decode" ->
      """WITH img AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 'image/png'
        |         ELSE 'image/bmp' END AS mime,
        |    CASE WHEN doc_id % 3 = 0 AND doc_id % 2 = 0 THEN 4 ELSE 3 END AS nch,
        |    8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h
        |  FROM documents WHERE doc_id % 3 < 2),
        |xs AS (SELECT doc_id, mime, nch, w, h, unnest(range(0, w)) AS x FROM img),
        |px AS (SELECT doc_id, mime, nch, w, h, x, unnest(range(0, h)) AS y FROM xs),
        |ag AS (
        |  SELECT doc_id, any_value(mime) AS mime, any_value(nch) AS nch,
        |    any_value(w) AS w, any_value(h) AS h,
        |    CAST(sum((doc_id * 31 + x * 7 + y * 13) % 256) AS BIGINT) AS sr,
        |    CAST(sum((doc_id * 17 + x * 11 + y * 5) % 256) AS BIGINT) AS sg,
        |    CAST(sum((doc_id * 13 + x * 3 + y * 19) % 256) AS BIGINT) AS sb
        |  FROM px GROUP BY doc_id)
        |SELECT doc_id, mime, CAST(w AS BIGINT) AS width,
        |  CAST(h AS BIGINT) AS height, CAST(nch AS BIGINT) AS n_channels,
        |  (sr * 4096) // (w * h) AS mean_r_ticks,
        |  (sg * 4096) // (w * h) AS mean_g_ticks,
        |  (sb * 4096) // (w * h) AS mean_b_ticks
        |FROM ag
        |ORDER BY doc_id""".stripMargin,
    // m07 oracle: the m02 recipe for the audio modality — the engine
    // encodes planted 16-bit PCM into REAL WAV containers and decodes
    // them with javax.sound; the oracle recomputes the decoded header
    // fields and exact sample sums ARITHMETICALLY (WAV PCM is
    // lossless). Sums, not means — no division enters the contract.
    "m07_audio_decode" ->
      """WITH au AS (
        |  SELECT doc_id,
        |    CASE (doc_id % 9) // 3 WHEN 0 THEN 8000 WHEN 1 THEN 11025
        |         ELSE 16000 END AS sample_rate,
        |    1 + doc_id % 2 AS channels,
        |    64 + doc_id % 65 AS n_frames
        |  FROM documents WHERE doc_id % 3 = 2),
        |fr AS (SELECT doc_id, sample_rate, channels, n_frames,
        |         unnest(range(0, n_frames)) AS i FROM au),
        |sm AS (
        |  SELECT doc_id, any_value(sample_rate) AS sample_rate,
        |    any_value(channels) AS channels, any_value(n_frames) AS n_frames,
        |    CAST(sum((doc_id * 7919 + i * 31) % 65536 - 32768) AS BIGINT)
        |      AS sum_ch0,
        |    CAST(sum(CASE WHEN channels = 2
        |             THEN (doc_id * 7919 + 104729 + i * 31) % 65536 - 32768
        |             ELSE 0 END) AS BIGINT) AS sum_ch1
        |  FROM fr GROUP BY doc_id)
        |SELECT doc_id, 'audio/wav' AS mime,
        |  CAST(sample_rate AS BIGINT) AS sample_rate,
        |  CAST(channels AS BIGINT) AS channels,
        |  CAST(n_frames AS BIGINT) AS n_frames, sum_ch0, sum_ch1
        |FROM sm
        |ORDER BY doc_id""".stripMargin,
    // m06: the oracle replicates the frame-set Jaccard pipeline from
    // the m03 frame CTE with a direct digest self-join and the SAME
    // integer threshold predicate; the engine's MediaBucketCap is
    // deliberately absent (it must not bind at test SFs — spec'd).
    "m06_media_neardup" ->
      """WITH p AS (
        |  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
        |  FROM documents
        |  WHERE doc_id % 3 = 2 AND octet_length(encode(text)) > 16),
        |u AS (
        |  SELECT doc_id, hx, unnest(range(n // 16)) AS f
        |  FROM p),
        |fr AS (
        |  SELECT DISTINCT doc_id,
        |    md5(substr(hx, CAST(f * 32 + 1 AS BIGINT), 32)) AS d
        |  FROM u),
        |nf AS (SELECT doc_id, count(*) AS nf FROM fr GROUP BY doc_id),
        |sh AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared_frames
        |  FROM fr a JOIN fr b ON a.d = b.d AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b, x.nf AS frames_a, y.nf AS frames_b, shared_frames,
        |  round(CAST(shared_frames AS DOUBLE) /
        |        (x.nf + y.nf - shared_frames), 4) AS jaccard
        |FROM sh JOIN nf x ON x.doc_id = doc_a JOIN nf y ON y.doc_id = doc_b
        |WHERE 10 * shared_frames >= 3 * (x.nf + y.nf - shared_frames)
        |ORDER BY doc_a, doc_b""".stripMargin,
    // m03 oracle: the engine encodes planted grayscale frames into a
    // REAL animated-GIF container and decodes every sampled frame
    // with ImageIO; the oracle recomputes the decoded statistics
    // ARITHMETICALLY (frame count, dims, and every pixel are a pure
    // function of doc_id, and GIF on an explicit 256-gray palette is
    // lossless) — the m02/m07 recipe for the multi-frame modality.
    "m03_frame_sample" ->
      """WITH v AS (
        |  SELECT doc_id, 3 + doc_id % 5 AS nf, 8 + doc_id % 6 AS w,
        |    6 + doc_id % 5 AS h
        |  FROM documents WHERE doc_id % 3 = 2),
        |f AS (SELECT doc_id, nf, w, h, unnest(range(0, nf)) AS fi FROM v),
        |sf AS (SELECT * FROM f WHERE fi % 2 = 0),
        |xs AS (SELECT doc_id, nf, w, h, fi, unnest(range(0, w)) AS x FROM sf),
        |px AS (SELECT doc_id, nf, w, h, fi, x, unnest(range(0, h)) AS y FROM xs)
        |SELECT doc_id, 'image/gif' AS mime, CAST(fi AS INTEGER) AS frame_idx,
        |  CAST(nf AS BIGINT) AS n_frames, CAST(w AS BIGINT) AS width,
        |  CAST(h AS BIGINT) AS height,
        |  CAST(sum((doc_id * 31 + fi * 97 + x * 7 + y * 13) % 256) AS BIGINT)
        |    AS pixel_sum
        |FROM px GROUP BY doc_id, fi, nf, w, h
        |ORDER BY doc_id, frame_idx""".stripMargin,
  )
}
