package graft

import org.apache.spark.sql.SparkSession

import graft.core.{Engine, LibraryDefinition, StreamRecord}

/** Benchmark main — driver contract: one JSON line on stdout with
  * per-query wall seconds over SPARK_GRAFT_SF_DIR. Headline queries
  * cover the scan/agg, join, window, dedup, and similarity paths. */
object Bench {
  val headline: Seq[String] = Seq(
    "q01_trigger_count",
    "q03_lookup_enrich",
    "q04_cross_shard_sum",
    "q06_stream_window",
    "q10_window_rank",
    "q18_pricing_summary",
    "q19_revenue_by_nation",
    "q23_text_quality",
    "q26_dedup_exact",
    "q27_dedup_minhash_lsh",
    "q28_dedup_simhash",
    "q32_knn_brute_force",
  )

  /** Timed but excluded from the headline total (keeps the r1-baseline
    * comparison stable): representative round-5 additions — transitive
    * dedup clustering, regex PII redaction, TF-IDF, bloom-routed
    * incremental dedup, batch sessionization, and clustered semantic
    * dedup (k-means fit included in its timing). */
  val extras: Seq[String] = Seq(
    // round 16 (r8): the two remaining §2.5 parity-contract members the
    // timed set lacked — the pushed prefix predicate (scan-shaped) and
    // the per-user MAX rollup (one user-keyed partial agg)
    "q02_prefix_filter",
    "q05_checkpoint_order",
    "q57_dedup_components",
    "q58_pii_redact",
    "q63_tfidf",
    "q69_incremental_dedup",
    "q74_sessionize",
    "q75_semantic_dedup",
    // round 6: bigram-LM scoring (corpus-keyed join, vocab-sized
    // model) and the cross-source trigram overlap matrix
    "q79_bigram_nll",
    "q80_source_overlap",
    // round 7: exact duplicate-span removal (the corpus-token digest
    // shuffle) and the KMV bottom-k distinct sketch
    "q86_exact_substring",
    "q87_kmv_distinct",
    // round 8: containment under the document-frequency ceiling, and
    // the three persisted-index ANN serving paths — each index builds
    // once on the first of the 3 timed runs, so the reported median IS
    // the steady-state query cost (the build-once/query-many contract)
    "q77_containment",
    "q89_knn_ivf_index",
    "q91_knn_pq",
    "q93_knn_ivfpq",
    // round 8: the new curation trio (normalization impact, FIM
    // splits, per-source quotas — scan-shaped, cheap)
    "q98_normalize",
    "q99_fim_split",
    "q100_source_quota",
    // round 9: the component-composition pair (cluster-consistent
    // splits and soft-dedup weights — both ride q57's clustering
    // lineage), perplexity tertiles, winsorized stats, and the
    // safetensors MLP serving path
    "q101_safe_split",
    "q102_nll_buckets",
    "q103_soft_dedup",
    "q104_winsorize",
    "q104x_winsorize_cents",
    "q47x_percentiles_exact",
    "q105_mlp_score",
    // round 9: embedding audits (per-dim stats, SQ8 reconstruction
    // error), the Jaccard-band threshold curve, curriculum sharding
    "q106_embedding_stats",
    "q107_sq8_error",
    "q108_jaccard_bands",
    "q109_curriculum",
    // round 10: delta-maintained datasheet, the retrieval pair (BM25
    // and its RRF fusion with the dense leg), df-stopword strip, DSIR
    // weights, and the temperature mixture (scan-shaped)
    "q110_incremental_stats",
    "q112_bm25",
    "q113_stopword_strip",
    "q114_importance_weights",
    "q115_temperature_mix",
    "q116_hybrid_rrf",
    // round 10: rule gate, epoch shuffle, rejection sampling,
    // truncation audit, PCA spectrum (scan-shaped except the PCA's
    // one covariance pass)
    "q117_gopher_rules",
    "q118_epoch_shuffle",
    "q119_rejection_sample",
    "q120_matryoshka",
    "q121_pca_variance",
    "q122_padding_waste",
    "q123_fertility",
    "q124_char_entropy",
    // round 6: global sentence dedup, diversity/mixed-language audits,
    // keep-best survivor selection, vocab coverage curve
    "q125_sentence_dedup",
    "q126_bigram_diversity",
    "q127_lang_segments",
    "q128_dedup_keep_best",
    "q129_vocab_coverage",
    // round 6: event analytics (trailing-window anomaly z-scores,
    // ordered funnel, cohort retention)
    "q130_anomaly_hours",
    "q131_funnel",
    "q132_cohort_retention",
    // round 7: exact quantiles by iterative threshold refinement (the
    // multi-job driver-paced selection loop) and their funnel-latency
    // composition
    "q148_exact_quantiles",
    "q149_conversion_latency",
    // round 7: incremental IVF maintenance (build base + append batch
    // on the first timed run; steady state is the audit aggregation)
    "q150_ivf_append",
    // round 7: the new analytics batch — PPS sampling (per-source
    // window walk), collocation lift (bigram-vocab joins + top-k),
    // Z-order bucket map (bit-arithmetic scan), session paths
    // (user-keyed window trio with throttle + autocorr), Gini
    // (source-keyed rank walk), co-occurrence (user-keyed pair join),
    // cents reconciliation (orderkey-keyed join)
    "q151_pps_sample",
    "q152_trend_ols",
    "q153_collocation_lift",
    "q154_zorder_layout",
    "q155_session_paths",
    "q156_event_throttle",
    "q157_daily_autocorr",
    "q159_contingency_residuals",
    "q160_gini_concentration",
    "q161_type_cooccurrence",
    "q162_totalprice_audit",
    // round 7: the graph family (15-round integer power iteration;
    // adjacency-intersection triangle census; degree histogram +
    // assortativity) and the robust-stats/sequence pair
    "q163_copurchase_rank",
    "q164_mad_outliers",
    "q165_event_trigrams",
    "q166_triangle_census",
    "q168_degree_histogram",
    "q169_degree_assortativity",
    "q171_bfs_hops",
    "q172_peak_window",
    "q173_item_cf",
    "q174_weekday_seasonality",
    "q175_hazard_table",
    "q176_mann_kendall",
    "q177_cusum_changepoint",
    // round 7 (cont.): rank/robust/dependence statistics (grouped-rank
    // windows, calendar-bounded pair joins, cell folds), LOCF
    // densification (in-plan day spine), the Page online detector, and
    // k-core (h-index fixpoint rounds — the iterative graph member)
    "q178_unpivot",
    "q179_spearman",
    "q180_locf_gapfill",
    "q181_theil_sen",
    "q182_fano_factor",
    "q183_mutual_info",
    // q184_kcore is gate-checked but NOT timed: the sf0.1 co-purchase
    // graph is adversarially dense for coreness (random TPC-H baskets
    // → 1.2M weight-1 edges, an 84-core of 17.7k nodes) and the exact
    // h-index fixpoint needs 38 synchronous sweeps ≈ 35 s — a
    // data-shape cost, not a plan defect (see BENCH_NOTES)
    "q185_page_cusum",
    "q187_window_funnel",
    "q188_ewma_spikes",
    // round 14 (cont.): the point-in-time SCD2 consumer, banded PSI
    // drift, and the retrieval-quality audit (one corpus scan vs a
    // broadcast query set, then 100-row arithmetic)
    "q189_temporal_join",
    "q190_psi_drift",
    "q191_ndcg",
    // round 14 (cont.): the ANN recall curve (one brute ground-truth
    // pass + four partition-pruned probed scans)
    "q192_ann_recall",
    // round 15: the engagement/experimentation batch — HLL daily
    // sketch rollup (register-array shuffles), bitmask algebra,
    // exposure z cells, exact moments, rolling median, compaction
    // plan, last-touch attribution (all rollup/window-shaped)
    "q193_hll_rollup",
    "q194_activity_bitmask",
    "q195_exposure_conversion",
    "q196_higher_moments",
    "q197_rolling_median",
    "q198_compaction_plan",
    "q199_last_touch",
    // round 15 (cont.): delta-join view maintenance (three join terms
    // vs the direct recompute), rolling distinct (7x contribution
    // explode over the day-deduped frame), join-consistent sampling
    "q201_delta_view",
    "q202_rolling_distinct",
    "q203_join_sample",
    // round 15 (cont.): the ordered-set/collect verbs (explicit-tie
    // mode, sorted-slice listagg) and retraction-aware maintenance
    "q204_mode",
    "q205_listagg",
    "q206_retraction_view",
    // round 15 (cont.): FD profiling (six countDistinct-per-LHS
    // edges) and the CUPED experiment readout (one user rollup +
    // scalar algebra)
    "q207_fd_audit",
    "q208_cuped",
    // round 15 (cont.): the recognized TPC-H probe shapes — pushed
    // date/segment filters, broadcast dims, TakeOrdered cuts
    "q209_shipping_priority",
    "q210_returned_items",
    "q211_promo_share",
    // round 15 (cont.): the unigram tokenizer pair — substring-explode
    // vocab learning (TakeOrdered cut) and codegen'd Viterbi encoding
    // over distinct words
    "q212_unigram_vocab",
    "q213_unigram_segment",
    // round 15 (cont.): the disc quantile verb and the interpolating
    // gap fill (rank window / spine-join shapes)
    "q215_percentile_disc",
    "q216_interpolate",
    // round 15 (cont.): weekly growth accounting + DAU/WAU stickiness
    // (user-window + calendar rollup shapes)
    "q217_growth_accounting",
    "q218_stickiness",
    // round 15 (cont.): ratio-to-report + in-group rank (one region
    // window over a nation-sized rollup)
    "q219_region_share",
    // round 15 (cont.): the weighted quantile verb (one source-keyed
    // window walk)
    "q220_weighted_median",
    // round 15 (cont.): numeric-profiling verbs (fixed-width bins;
    // per-table all-column dedup counts)
    "q221_equiwidth_hist",
    "q222_duplicate_rows",
    // round 15 (cont.): one-scan pairwise Pearson matrix
    "q223_corr_matrix",
    // round 16 (r8): the composed RAG retrieval pipeline (chunk-BM25
    // leg + persisted IVF-PQ leg + RRF + NDCG audit; the index builds
    // on the first timed run — the median is the steady state)
    "q225_rag_pipeline",
    // round 16 (r8): the remaining TPC-H join shapes — the Q5 cycle
    // join, the Q21 eager-aggregation rewrite, the Q2 packed argmin —
    // and the eval/statistics trio (value-domain rollups + windows)
    "q226_local_supplier_volume",
    "q227_waiting_suppliers",
    "q228_min_cost_supplier",
    "q229_mann_whitney",
    "q230_calibration",
    "q231_pr_curve",
    // round 17 (r8): the classifier-eval completion (rank-identity
    // AUC), the k-group and parametric test pair (value-domain
    // rollups), and the remaining TPC-H shapes — correlated-AVG
    // (Q17), left-join distribution (Q13), HAVING-vs-global (Q11),
    // anti-join dormancy (Q22), eager-agg IN (Q18), nested semi (Q20)
    "q232_roc_auc",
    "q233_kruskal_wallis",
    "q234_welch_t",
    "q235_small_qty_revenue",
    "q236_cust_order_distribution",
    "q237_important_stock",
    "q238_dormant_high_value",
    "q239_large_volume_customer",
    "q240_excess_shippers",
    // round 17 (r8): greedy WordPiece corpus segmentation (distinct
    // words + codegen'd MaxMatch; vocab learn included in the timing).
    // q242_streaming_cms stays untimed like every replay-harness
    // streaming parity (q214/q224): their cost is the harness, not
    // the operator.
    "q241_wordpiece_segment",
    // round 17 (r8): the global independence test over the q159 cells
    // and the k-group variance decomposition (rollup-shaped)
    "q243_chi_square",
    "q244_anova_f",
    // round 18 (r8): effect sizes / agreement / variance homogeneity
    // (rollup-shaped), the lag families (calendar-bounded daily
    // rollups), and capped-wedge link prediction (the graph family's
    // sixth member). q245_streaming_kmv stays untimed like every
    // replay-harness streaming parity.
    "q246_cramers_v",
    "q247_cohen_kappa",
    "q248_levene",
    "q249_cross_correlation",
    "q250_seasonal_error",
    "q251_link_prediction",
    // round 18 (r8): hash-bit replication CI (one-pass conditional
    // aggregates), LPA communities (5 vote rounds on the weighted
    // backbone), hard-negative mining (q32's kernel + label filter),
    // and the pairwise JSD grid. q245_streaming_kmv stays untimed.
    "q252_subsample_ci",
    "q253_label_propagation",
    "q254_hard_negatives",
    "q255_jsd_matrix",
    // round 18 (r8): sketch set algebra (the exact audit leg is the
    // timed cost), held-out LM eval (explode + vocab join), RFM cube
    // (user rollup + bounded cumsums), class-balance audit (rollup)
    "q256_kmv_set_algebra",
    "q257_heldout_perplexity",
    "q258_rfm_segments",
    "q259_class_balance",
    // round 18 (r8): CV nearest-centroid (one posexplode rollup +
    // broadcast centroids), Dunning-LLR collocations (q153's plan,
    // different score), weekly PSI timeline (q190's device × weeks)
    "q260_cv_centroid",
    "q261_collocation_llr",
    "q262_psi_timeline",
    // round 18 (r8): conversion z-test (user rollup) and weekly rank
    // movers (rollup + per-week window). q265_streaming_bloom stays
    // untimed like every replay-harness streaming parity.
    "q263_two_proportion",
    "q264_rank_movers",
    // round 18 (r8): IVF-served hard negatives (build-once/query-many,
    // the q89/q93 contract) and the A-Res weighted sample (one scan +
    // TakeOrdered)
    "q266_hard_negatives_ivf",
    "q267_weighted_sample",
    // round 18 (r8): the SLO percentile timeline (value-domain
    // cumsums), top-k with ties (broadcast threshold, no catalog
    // rank), and the tolerance as-of (one keyed window)
    "q268_percentile_timeline",
    "q269_topk_ties",
    "q270_asof_tolerance",
    // round 18 (r8): the binning artifact and the tail-sensitive
    // distribution test (both value-domain rollup shapes), plus the
    // effect-size readout (q234's rollup, different final scalars)
    "q271_equidepth_edges",
    "q272_anderson_darling",
    "q273_cohens_d",
    "q274_edit_distance_pairs",
    "q275_benford_audit",
    "q276_concurrency_sweep",
    "q277_decile_lift",
    "q278_kendall_tau",
    "q279_runs_test",
    "q280_jaro_winkler_pairs",
    "q282_k_anonymity",
    "q283_er_golden_record",
    "q284_rank_stability",
    "q285_blocking_audit",
    // round 20 (r10) continuation: the nine TPC-H completion shapes
    // (classic scan/join/rollup plans — cheap, but timed so a plan
    // regression in the showcase set shows up in the bench trail),
    // the three paired/ordered classical tests, and the q298 batch
    // fold (the streaming side stays untimed like every replay parity)
    "q286_priority_waiting",
    "q287_forecast_revenue",
    "q288_volume_shipping",
    "q289_market_share",
    "q290_product_profit",
    "q291_shipmode_priority",
    "q292_top_supplier",
    "q293_part_supplier",
    "q294_discounted_revenue",
    "q295_wilcoxon_signed_rank",
    "q296_mcnemar",
    "q297_cochran_armitage",
    "q298b_ewma_batch",
    // round 20 (r10) continuation 2: the k-sample paired/ordered
    // family (Friedman + Page on complete-block ranks, Cochran's Q on
    // the user rollup, Jonckheere-Terpstra on the value-domain device)
    "q299_friedman",
    "q300_cochran_q",
    "q301_jonckheere_terpstra",
    "q302_page_trend",
    // round 20 (r10) continuation 2: log-rank over the q175 KM subjects
    "q303_log_rank",
    // round 20 (r10) continuation 3: the model-diagnostics batch —
    // stratified contingency (CMH), effect size (Cliff's delta),
    // normality (Jarque-Bera), serial dependence (Ljung-Box + von
    // Neumann), proper scoring (Brier decomposition); the q310
    // streaming side stays untimed like every replay parity
    "q304_cmh",
    "q305_cliffs_delta",
    "q306_jarque_bera",
    "q307_ljung_box",
    "q308_von_neumann",
    "q309_brier_decomposition",
    // round 20 (r10) continuation 4: the corpus-law fits (Zipf over
    // the vocab rollup, Heaps over the first-seen rollup) and the
    // OR-homogeneity gate on q304's cells
    "q311_zipf",
    "q312_heaps",
    "q313_woolf",
    // the multiclass eval harness (one scan + class-sized math); the
    // q314 streaming side stays untimed like every replay parity
    "q315_lang_confusion",
    // the formal outlier test (two map-side rollup passes) and the
    // reliability coefficient (custkey pivot rollup)
    "q316_grubbs",
    "q317_cronbach",
    // the forecast backtest (calendar-bounded) and the length-
    // distribution distance matrix (sources x buckets cells)
    "q318_mase",
    "q319_hellinger",
    // round 21 (r10) continuation 5: the agreement pair (multi-rater
    // nominal, ordinal weighted) and the residual serial-correlation
    // diagnostic — all bounded-cell rollups
    "q320_fleiss_kappa",
    "q321_weighted_kappa",
    "q322_durbin_watson",
    // the nonparametric changepoint (calendar-bounded walks) and the
    // categorical-assortativity modularity (backbone + 25-cell rollup)
    "q323_pettitt",
    "q324_brand_modularity",
    // the readability and exact-diversity scans (one codegen'd pass
    // each, source-sized rollups)
    "q325_flesch",
    "q326_simpson",
    // the Holt trend monitor's batch fold (the q327 streaming side
    // stays untimed like every replay parity)
    "q327b_holt_batch",
    // the confounder-removal correlation rollup and the calibration
    // test (one scan + value-domain cuts each)
    "q328_partial_corr",
    "q329_hosmer_lemeshow",
    // the RCB ANOVA (q299's rollups, parametric), the quintile
    // symmetry fold, and the concordance coefficient
    "q330_two_way_anova",
    "q331_bowker_symmetry",
    "q332_kendall_w",
    // the calibration metric (score-domain bins), the burstiness and
    // keyness rollups (vocab-sized windows per source)
    "q333_calibration_error",
    "q334_term_burstiness",
    "q335_keyness",
    // the stump (score-domain cumulatives + TakeOrdered argmin), the
    // gamma fit (one rollup), and the attribution join (user-keyed)
    "q336_decision_stump",
    "q337_gamma_mom",
    "q338_linear_attribution",
    // the concentration rollup, the balance table, and the two
    // experiment-health reads (all user-/supplier-aggregate-sized)
    "q339_hhi_concentration",
    "q340_covariate_balance",
    "q341_wilson_interval",
    "q342_srm_check",
    // the PAVA fold (domain-bounded single task) and the stratified
    // adjustment (customer rollup + value-domain cuts)
    "q343_isotonic_calibration",
    "q344_stratified_effect",
    // the SPRT enrollment walk (offset device) and the ratio-metric
    // CI rollup (the q345 streaming side stays untimed like every
    // replay parity)
    "q346_sprt",
    "q347_ratio_metric_ci",
    // the two calendar-bounded series reads and the basket rules
    // (the q163/q253-audited pair device + TakeOrdered)
    "q348_seasonal_strength",
    "q349_acf_table",
    "q350_association_rules",
    // the IR metric pair (q191's scan), the cluster-purity audit
    // (q103's components), and the allocation design rollup
    "q351_mrr_map",
    "q352_cluster_purity",
    "q353_neyman_allocation",
    // the seasonal trend test (within-weekday bounded pairs), the
    // rank post-hoc (q233's rollup), and the richness spectrum
    "q354_seasonal_mk",
    "q355_dunn_posthoc",
    "q356_lexical_richness",
    // the cohort LTV curve (q132's join + bounded windows) and the
    // ABC split (partkey rollup + offset-device cumulative)
    "q357_cohort_ltv",
    "q358_abc_classification",
    // round 22 (r11): the two-sample family (one shared value-domain
    // ECDF machinery), the HL dollar-grid shift, the bipartite HITS
    // rounds, the DCT-hash near-dup, the corpus-cleanup audits, the
    // streaming KS parity, and the bucket-boundary DP
    "q359_ks_test",
    "q360_cvm_test",
    "q361_kuiper_test",
    "q362_mood_median",
    "q363_brunner_munzel",
    "q364_hodges_lehmann",
    "q365_hits",
    "q366_image_phash_near_dup",
    "q367_blocklist_audit",
    "q368_mojibake_audit",
    "q369_streaming_ks",
    "q370_bucket_boundaries",
    "q371_yuen_trimmed",
    // round 12: the three oracle-carrying streaming additions (replay
    // device) and the byte-level BPE pair (GPT-2 pre-tokenizer)
    "q372_streaming_transitions",
    "q373_streaming_moments",
    "q374_streaming_distinct",
    "q375_byte_bpe_merges",
    "q376_byte_bpe_encode",
  )

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JIT/codegen path once so measured numbers are steady-state
    SparkEntry.entry(spark).count()
    // Load canary (VERDICT r8 #2): re-time the same cheap pinned query
    // at suite start, middle, and end. A loaded host inflates the
    // canary the same way it inflates real queries, so a >2× spread
    // marks the whole run load-suspect IN-BAND — the three rounds of
    // driver-vs-quiet-box bench ambiguity become machine-readable.
    def canaryTime(): Option[Double] = median3 {
      SparkEntry.queries("q01_trigger_count")(spark, sfDir)
        .queryExecution.toRdd.foreach(_ => ())
    }
    canaryTime() // discarded: JIT/codegen warm-up of the canary path
    // itself, so canary0 measures the box, not compilation (an
    // unwarmed first sample read 2.2× on a QUIET box — exactly the
    // false positive the canary exists to rule out)
    val canary0 = canaryTime()
    val results: Seq[(String, Option[Double])] = headline.map { name =>
      val fn = SparkEntry.queries(name)
      // full materialization: toRdd.foreach evaluates every output
      // column of the optimized plan on the executors (count() would
      // let Catalyst prune every unreferenced projection). MEDIAN of 3
      // runs per query: single-shot numbers made round-over-round
      // wobbles unadjudicable (noise vs regression).
      name -> median3 {
        fn(spark, sfDir).queryExecution.toRdd.foreach(_ => ())
      }
    }
    // round-5 operators, timed but EXCLUDED from the headline total so
    // cross-round totals stay comparable to the r1 baseline's 12 queries
    val extraResults: Seq[(String, Option[Double])] = extras.map { name =>
      val fn = SparkEntry.queries(name)
      name -> median3 {
        fn(spark, sfDir).queryExecution.toRdd.foreach(_ => ())
      }
    } :+ {
      // the q86 ENGINE path: xxhash64 window digests (8-byte shuffle
      // keys) — the gate query keeps md5 for DuckDB oracle bit-parity,
      // so the swap's measured win is tracked here as its own entry
      "q86_exact_substring_xx" -> median3 {
        graft.operators.Dedup.exactSubstringClean(
            graft.operators.Tables.documents(spark, sfDir),
            "doc_id", "text", 20, windowDigest = "xxhash64")
          .queryExecution.toRdd.foreach(_ => ())
      }
    }
    val canary1 = canaryTime() // middle: after headline+extras, before stream/engine
    val stream = streamBench(spark, sfDir)
    val engine = engineBench(spark)
    val canary2 = canaryTime()
    val canaries = Seq(canary0, canary1, canary2).flatten
    val canaryJson = canaries.map(v => f"$v%.3f").mkString("[", ",", "]")
    val loadSuspect = Bench.loadSuspectOpt(Seq(canary0, canary1, canary2))
    val loadSuspectJson = loadSuspect.map(_.toString).getOrElse("null")
    val qs = (results ++ extraResults ++ stream ++ engine).map {
      case (k, Some(v)) => "\"" + k + f"""":$v%.3f"""
      case (k, None) => "\"" + k + "\":null" // failed query: never report a timing
    }.mkString("{", ",", "}")
    val total = results.flatMap(_._2).sum
    // second total beside the stable 12-query r1 headline: the full
    // timed relational/pipeline suite (headline + extras; stream/engine
    // microbenches excluded — they time ingest loops, not queries).
    // Round-over-round comparisons of THIS number must account for
    // query-count growth; `n_timed` rides along so that's mechanical.
    val fullSuite = (results ++ extraResults).flatMap(_._2).sum
    val nTimed = (results ++ extraResults).size
    val json = f"""{"metric":"total","value":$total%.3f,"unit":"sec","value_full_suite":$fullSuite%.3f,"n_timed":$nTimed%d,"canary":$canaryJson%s,"load_suspect":$loadSuspectJson%s,"queries":$qs,"sf":"$sfDir"}"""
    println(json)
    // r13 (VERDICT r12 #2): the full contract line above outgrew the
    // driver's captured-output tail (~2.2 KB) around 8 KB of per-query
    // entries, so 12/12 rounds parsed as null and the canary /
    // load_suspect fields never reached a PERF artifact. Emit a SECOND,
    // compact totals line (same fields minus the per-query map) AFTER
    // the full line — it fits any tail capture. Additive only: the full
    // contract line and the bench_out.json self-persist are unchanged.
    val compact = f"""{"metric":"total","value":$total%.3f,"unit":"sec","value_full_suite":$fullSuite%.3f,"n_timed":$nTimed%d,"canary":$canaryJson%s,"load_suspect":$loadSuspectJson%s,"sf":"$sfDir"}"""
    println(compact)
    // self-persist beside stdout (VERDICT r9 #5): the driver's bench
    // harness truncated the stdout tail in r8/r9 ("parsed": null), so
    // the canary fields never reached the artifact — the file copy is
    // the machine-readable record whatever the capture does
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not persist $outPath: $e") }
    spark.stop()
  }

  /** The load-canary verdict (VERDICT r8 #2): load vs warm-up have
    * opposite signatures — JIT/code-cache warm-up can only inflate the
    * FIRST sample (monotone decrease; measured 0.28/0.14/0.12 on a
    * quiet box even after one warm-up pass), while host load inflates
    * LATER samples. So only the post-start samples can raise the flag
    * (> 2× the minimum over all samples); BenchCanarySpec pins the
    * quiet/warm-up/mid-run-load/end-load shapes. */
  private[graft] def loadSuspect(canaries: Seq[Double]): Boolean =
    canaries.size >= 2 &&
      canaries.tail.max > 2.0 * math.max(canaries.min, 1e-9)

  /** Position-aware wrapper (ADVICE r9): the warm-up exemption belongs
    * to the FIRST canary only — if canary0 itself failed, a later
    * sample would silently inherit the exemption and a mid-run load
    * spike could hide. A missing canary0 (or no later sample at all)
    * makes the verdict INDETERMINATE (None → `"load_suspect": null`),
    * never a silent false. */
  private[graft] def loadSuspectOpt(samples: Seq[Option[Double]]): Option[Boolean] =
    samples match {
      case Some(_) +: later if later.flatten.nonEmpty =>
        Some(loadSuspect(samples.flatten))
      case _ => None
    }

  /** Median wall-seconds over 3 runs of `body`; None if any run fails
    * (a flaky query must never report a timing). */
  private def median3(body: => Unit): Option[Double] = {
    val times = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      try { body; Some((System.nanoTime() - t0) / 1e9) }
      catch { case _: Throwable => None }
    }
    if (times.exists(_.isEmpty)) None
    else Some(times.flatten.sorted.apply(1))
  }

  /** Engine command-surface throughput, mirroring the reference's
    * remaining benchmark families (BASELINE.md): the fcall trio
    * (`rg_fcall_simple` = trivial sync call, `rg_fcall_redis_cmd` =
    * sync call wrapping a state read, `rg_fcall_async` = async call)
    * and the keyspace-notification pair (`rg_keyspace_baseline` = raw
    * SETs with no trigger vs `rg_keyspace_sync` = the same SETs firing
    * a sync trigger) — every trigger number paired with its no-trigger
    * baseline so the reported quantity is dispatch overhead, exactly
    * the reference's CI structure. N = 100k invocations per variant,
    * engine setup outside the timings, median of 3. */
  private def engineBench(spark: SparkSession, n: Int = 100000): Seq[(String, Option[Double])] = {
    import graft.core._
    import graft.core.RespValue._
    def bench(label: String)(setup: Engine => Unit)(op: (Engine, Int) => Unit): (String, Option[Double]) = {
      val e = new Engine(spark)
      try {
        setup(e)
        s"${label}_$n" -> median3 {
          var i = 0
          while (i < n) { op(e, i); i += 1 }
        }
      } finally e.close()
    }
    val counted = new java.util.concurrent.atomic.LongAdder
    Seq(
      bench("fcall_sync_simple") { e =>
        e.load(LibraryDefinition("b", code = _.registerFunction("one", (_, _) => RespLong(1))))
      } { (e, _) => e.call("b", "one") },
      bench("fcall_sync_state_cmd") { e =>
        e.state.set("k:1", "v")
        e.load(LibraryDefinition("b", code = _.registerFunction("rd", (ctx, _) =>
          ctx.get("k:1").map(RespString).getOrElse(RespNull))))
      } { (e, _) => e.call("b", "rd") },
      // async is PIPELINED (all n futures in flight, then drained) —
      // serial await would measure per-call latency where the
      // reference's memtier measures throughput under 32 connections
      {
        val e = new Engine(spark, executionThreads = 4)
        try {
          e.load(LibraryDefinition("b", code = _.registerAsyncFunction("aone", (_, _) => RespLong(1))))
          s"fcall_async_simple_$n" -> median3 {
            val fs = (0 until n).map(_ => e.callAsync("b", "aone"))
            fs.foreach(f => scala.concurrent.Await.result(f,
              scala.concurrent.duration.Duration(120, "s")))
          }
        } finally e.close()
      },
      bench("keyspace_set_baseline") { _ => () } { (e, i) => e.state.set(s"kv:$i", "v") },
      bench("keyspace_set_trigger") { e =>
        e.load(LibraryDefinition("b", code = _.registerKeySpaceTrigger("t", "kv:",
          (_, _) => { counted.increment(); () })))
      } { (e, i) => e.state.set(s"kv:$i", "v") })
  }

  /** Stream-trigger ingest bench, mirroring the reference's paired
    * workloads (`tests/benchmarks/rg_stream_baseline.yml` = ingest with
    * no trigger vs `rg_stream_process_empty_sync.yml` = empty-callback
    * trigger): the reported quantity is trigger overhead over raw
    * ingest of the same records. Three variants over the events table
    * as StreamRecords (stream key = user bucket, id = event sequence):
    * baseline (no consumers), driver-side delivery (chunked
    * toLocalIterator control plane), executor-side delivery
    * (flatMapGroups data plane, acks-only to driver). */
  private def streamBench(spark: SparkSession, sfDir: String): Seq[(String, Option[Double])] = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val records = spark.read.parquet(s"$sfDir/events.parquet")
      .select(concat(lit("bench:"), pmod(col("user_id"), lit(64))).as("stream"),
        col("event_id").cast("long").as("idMs"), lit(0L).as("idSeq"),
        map(lit("t"), col("event_type")).as("fields"),
        array().cast("array<struct<_1:binary,_2:binary>>").as("fieldsRaw"))
      .as[StreamRecord]
      .cache()
    val n = records.count() // materialize the cache outside the timings
    // land the records once so the trigger variants read an identical
    // file stream (writeStream needs a streaming source)
    val srcDir = java.nio.file.Files.createTempDirectory("bench-stream-src").toString
    records.write.mode("overwrite").parquet(srcDir)
    def streamSrc = spark.readStream.schema(StreamRecord.schema)
      .parquet(srcDir).as[StreamRecord]

    // baseline: same shuffle+sort shape as the driver control plane, no
    // trigger attached — the reference's no-trigger ingest
    val baseline = median3 {
      records.repartition(col("stream"))
        .sortWithinPartitions("stream", "idMs", "idSeq")
        .queryExecution.toRdd.foreach(_ => ())
    }
    val driver = median3 {
      val e = new Engine(spark)
      e.load(LibraryDefinition("bench", code = { b =>
        b.registerStreamTrigger("t", "bench:", (_, _) => ())
      }))
      val ckpt = java.nio.file.Files.createTempDirectory("bench-drv").toString
      val q = e.streams.attach(streamSrc, ckpt)
      q.processAllAvailable(); q.stop(); e.close()
    }
    val dist = median3 {
      val e = new Engine(spark)
      e.load(LibraryDefinition("bench", code = { b =>
        b.registerStreamTrigger("t", "bench:", (_, _) => ())
      }))
      val ckpt = java.nio.file.Files.createTempDirectory("bench-dist").toString
      val q = e.streams.attachDistributed(streamSrc, ckpt, "bench", "t")(_ => ())
      q.processAllAvailable(); q.stop(); e.close()
    }
    // GraftLog XADD ingest pair (the reference's measured hot path,
    // `tests/benchmarks/rg_stream_baseline.yml`): driver-side
    // single-writer append vs executor-written distributed segments.
    // Same records, same segment granularity (32), so the number is the
    // write-path parallelism, not a format difference.
    val collected = records.collect() // outside the timed driver path
    val segments = 32
    val chunk = math.max(1, (collected.length + segments - 1) / segments)
    val logDriver = median3 {
      val dir = java.nio.file.Files.createTempDirectory("bench-glog-drv").toString + "/log"
      val log = new graft.sources.GraftLog(dir, spark.sparkContext.hadoopConfiguration)
      collected.grouped(chunk).foreach(c => log.append(c.toSeq))
    }
    val logDist = median3 {
      val dir = java.nio.file.Files.createTempDirectory("bench-glog-dist").toString + "/log"
      val log = new graft.sources.GraftLog(dir, spark.sparkContext.hadoopConfiguration)
      log.appendDistributed(records.repartition(segments))
    }
    records.unpersist()
    Seq(s"stream_ingest_baseline_${n}" -> baseline,
      "stream_trigger_driver" -> driver,
      "stream_trigger_distributed" -> dist,
      "graftlog_append_driver" -> logDriver,
      "graftlog_append_distributed" -> logDist)
  }
}
