package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.cdc._
import graft.queries.Analytics

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  import ChangeEvents.{changelog => cl, withChangelogSql => o}

  // fixed demo parameters for the oracle-checked query entries
  private val tableRules   = Seq("db0.%", "db1.t1")
  // A95: ordered polarity rules — leading exclusion prepends the
  // implicit accept-all; db1.t1 is RE-included after the t1 exclusion;
  // db0.t0 is re-included after the db0.% exclusion
  private val polarityRules = Seq("!%.t1", "db1.t1", "!db0.%", "db0.t0")
  private val ignoreOps    = Seq("D")
  private val nParts       = 16
  private val dispatchCols = Seq("event_type", "props")
  private val minTs        = 100L
  private val syncStep     = 100L
  // A76 changefeed configs: two live filter sets + one matching nothing
  // (the NewMaxWatermark empty-changefeed arm)
  private val watermarkCfs = Seq(
    "cf-a" -> Seq("db0.%"),
    "cf-b" -> Seq("db1.t1", "db1.t2"),
    "cf-empty" -> Seq("db9.%"))
  // A78 fleet: every NeedBlockGC arm — blocking states, failed with a
  // non-GC error (blocks), failed BY GC (doesn't), finished (doesn't),
  // plus the empty-changefeed MaxWatermark passthrough
  private val gcFleet = Seq(
    Barrier.CfState("cf-a", Seq("db0.%"), "normal", None),
    Barrier.CfState("cf-b", Seq("db1.t1", "db1.t2"), "stopped", None),
    Barrier.CfState("cf-empty", Seq("db9.%"), "pending", None),
    Barrier.CfState("cf-warn", Seq("db1.t0"), "warning", None),
    Barrier.CfState("cf-fail", Seq("db0.t1"), "failed",
      Some("CDC:ErrExecDDLFailed")),
    Barrier.CfState("cf-gcfail", Seq("db0.%"), "failed",
      Some("CDC:ErrGCTTLExceeded")),
    Barrier.CfState("cf-fin", Seq("db1.%"), "finished", None))
  // A91 fleet: every backoff arm — clean advance, idle (no matching
  // tables, checkpoint never moves), transient errors cleared by a
  // checkpoint advance, a 7-error run reaching the 600s interval cap,
  // a stuck feed that exceeds MaxElapsedTime (failed) then gets a cli
  // Resume and re-enters retry, and a fast-fail error code
  private val backoffFleet = Seq(
    ChangefeedBackoff.BackoffCf("cf-ok", Seq("db0.%")),
    ChangefeedBackoff.BackoffCf("cf-idle", Seq("db9.%")),
    ChangefeedBackoff.BackoffCf("cf-warn", Seq("db1.%"),
      errFrom = 2, errTo = 4),
    ChangefeedBackoff.BackoffCf("cf-backoff", Seq("db0.t1"),
      errFrom = 5, errTo = 11),
    ChangefeedBackoff.BackoffCf("cf-stuck", Seq("db1.t1"),
      errFrom = 1, errTo = 99, resumeTick = 15),
    ChangefeedBackoff.BackoffCf("cf-fastfail", Seq("db0.t2"),
      fastfailTick = 6))
  private val topicRules   = Seq(
    Seq("db0.%") -> "cdc_{schema}_{table}",   // dynamic expression rule
    Seq("db1.t1") -> "db1-special",           // hard-coded topic rule
    Seq("db1.t0") -> "persistent://public/default/{schema}-{table}", // pulsar-style
    Seq("db1.t2") -> "")                      // empty rule -> default topic
  private val defaultTopic  = "changefeed-default"
  private val claimMaxBytes = 180
  // claim-check threshold with the compression model on: the ~2.5x
  // modeled ratio pulls canal payloads to 61-80 bytes; 75 exercises
  // both branches
  private val compressMaxBytes = 75
  // regex-only demo rule (type-ignore stays empty so the frame is
  // non-empty even at sf0.001 where only v0 CREATE DDLs exist;
  // A18 already demos the type-taxonomy path)
  private val ddlIgnoreTypes = Seq.empty[String]
  private val ddlIgnoreSql   = Seq("ADD COLUMN v(1|3) ")
  // column-selector rules: db0.* encodes values only (props masked),
  // db1.t1 encodes props only, everything else passes untouched
  private val colSelRules = Seq(
    Seq("db0.%") -> Seq("*value*", "pk"),
    Seq("db1.t1") -> Seq("props"))
  // end-to-end changefeed demo: filter chain + routed topics +
  // debezium values in one declarative config
  private val changefeedCfg = cdc.Changefeed.Config(
    tableRules = Seq("db0.%", "db1.t1"),
    ignoreOps = Seq("D"),
    ignoreTsAtOrBelow = Some(50L),
    topicRules = topicRules,
    defaultTopic = defaultTopic,
    protocol = cdc.Changefeed.Protocol.Debezium)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Materialize.snapshot(cl(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A-series: CDC core
    "cdc_changelog_build" -> ((s, d) => cl(s, d)),
    "cdc_event_sort" -> ((s, d) => Materialize.eventSort(cl(s, d))),
    "cdc_table_filter" -> ((s, d) => Filters.tableFilter(cl(s, d), tableRules)),
    "cdc_table_filter_polarity" -> ((s, d) =>
      Filters.tableFilterPolarity(cl(s, d), polarityRules)),
    "cdc_event_type_filter" -> ((s, d) => Filters.eventTypeFilter(cl(s, d), ignoreOps)),
    "cdc_expr_filter" -> ((s, d) => Filters.exprFilter(cl(s, d),
      col("after_value") > 150.0 && col("event_type") === "purchase")),
    "cdc_ts_filter" -> ((s, d) => Filters.tsFilter(cl(s, d), minTs)),
    "cdc_column_selector" -> ((s, d) => cl(s, d)
      .select("schema_name", "table_name", "pk", "commit_ts", "op", "after_value")),
    "cdc_dispatch_table" -> ((s, d) => Dispatchers.byTable(cl(s, d), nParts)),
    "cdc_dispatch_index_value" -> ((s, d) => Dispatchers.byIndexValue(cl(s, d), nParts)),
    "cdc_dispatch_columns" -> ((s, d) => Dispatchers.byColumns(cl(s, d), dispatchCols, nParts)),
    "cdc_dispatch_ts" -> ((s, d) => Dispatchers.byTs(cl(s, d), nParts)),
    "cdc_snapshot_materialize" -> ((s, d) => Materialize.snapshot(cl(s, d))),
    "cdc_safe_mode_upsert" -> ((s, d) => Materialize.safeModeUpsert(cl(s, d))),
    "cdc_resolved_ts" -> ((s, d) => Materialize.resolvedTs(cl(s, d))),
    "cdc_span_frontier" -> ((s, d) => Materialize.spanFrontier(cl(s, d))),
    "cdc_ddl_barrier" -> ((s, d) => Barrier.ddlBarrier(cl(s, d), syncStep)),
    "cdc_watermark_agg" -> ((s, d) =>
      Barrier.watermarkAgg(cl(s, d), watermarkCfs, syncStep)),
    "cdc_scan_tasks" -> ((s, d) => EventService.scanTasks(cl(s, d))),
    "cdc_event_seq_check" -> ((s, d) => EventService.seqCheck(cl(s, d))),
    "cdc_log_candidates" -> ((s, d) => EventService.logCandidates(cl(s, d))),
    "cdc_scan_emit" -> ((s, d) => EventService.scanEmit(cl(s, d))),
    "cdc_kv_key_codec" -> ((s, d) => EventService.kvKeyCodec(cl(s, d))),
    "cdc_raw_key_filter" -> ((s, d) => EventService.rawKeyFilter(cl(s, d))),
    "cdc_gc_safepoint" -> ((s, d) =>
      Barrier.gcSafepoint(cl(s, d), gcFleet, syncStep)),
    "cdc_sched_basic" -> ((s, d) => Scheduler.basicSchedule(cl(s, d))),
    "cdc_sched_balance" -> ((s, d) => Scheduler.groupBalance(cl(s, d))),
    "cdc_hot_span" -> ((s, d) => Scheduler.hotSpans(cl(s, d))),
    "cdc_span_split_bytes" -> ((s, d) => Scheduler.spanSplitBytes(cl(s, d))),
    "cdc_span_split_regions" -> ((s, d) => Scheduler.spanSplitRegions(cl(s, d))),
    // write threshold 1660 lands the sf0.01 fleet across all three
    // chooser verdicts (write/region/none) — the claim-check precedent
    // of demo params picked to exercise every branch
    "cdc_span_split_choose" -> ((s, d) =>
      Scheduler.spanSplitChoose(cl(s, d), threshold = 1660L)),
    "cdc_changefeed_backoff" -> ((s, d) =>
      ChangefeedBackoff.backoff(cl(s, d), backoffFleet)),
    "cdc_operator_move" -> ((s, d) => OperatorLifecycle.operatorMove(cl(s, d))),
    "cdc_operator_addstop" -> ((s, d) => OperatorLifecycle.operatorAddStop(cl(s, d))),
    "cdc_range_lock" -> ((s, d) => RangeLock.rangeLockStats(cl(s, d))),
    "cdc_region_init" -> ((s, d) => RegionInit.regionInit(cl(s, d))),
    "cdc_mem_backpressure" -> ((s, d) => Backpressure.memBackpressure(cl(s, d))),
    "cdc_event_queue_drain" -> ((s, d) => DynStreamQueue.queueDrain(cl(s, d))),
    "cdc_schema_gc" -> ((s, d) => SchemaStore.schemaGc(s, d)),
    "cdc_eventstore_key" -> ((s, d) => EventService.eventstoreKey(cl(s, d))),
    "cdc_changefeed_overview" -> ((s, d) =>
      Barrier.changefeedOverview(cl(s, d), gcFleet, syncStep)),
    "cdc_dispatcher_block" -> ((s, d) => DispatcherBlock.dispatcherBlock(cl(s, d))),
    "cdc_span_coverage" -> ((s, d) => Coverage.spanCoverage(cl(s, d))),
    "cdc_txn_match" -> ((s, d) => TxnMatcher.matched(cl(s, d))),
    "cdc_gc_trim" -> ((s, d) => Materialize.gcTrim(cl(s, d))),
    "cdc_table_progress" -> ((s, d) => Materialize.tableProgress(cl(s, d))),
    "cdc_dispatcher_checkpoint" -> ((s, d) => Materialize.dispatcherCheckpoint(cl(s, d))),
    "cdc_txn_group" -> ((s, d) => Materialize.txnGroup(cl(s, d))),
    "cdc_syncpoint" -> ((s, d) => Materialize.syncpoint(s, cl(s, d), syncStep)),
    "cdc_schema_asof" -> ((s, d) => SchemaStore.eventsWithSchema(cl(s, d))),
    "cdc_ddl_events" -> ((s, d) => SchemaStore.ddlEvents(cl(s, d), Seq("ALTER"))),
    "cdc_table_lifecycle" -> ((s, d) => SchemaStore.tableLifecycle(s, d)),
    "cdc_event_physical" -> ((s, d) => SchemaStore.eventPhysicalTable(s, d)),
    "cdc_schema_snapshot" -> ((s, d) => SchemaStore.schemaSnapshot(s, d)),
    "codec_canal_json" -> ((s, d) => Codecs.canalJson(cl(s, d))),
    "codec_open_protocol" -> ((s, d) => Codecs.openProtocol(cl(s, d))),
    "codec_debezium" -> ((s, d) => Codecs.debezium(cl(s, d))),
    "codec_debezium_envelope" -> ((s, d) => Codecs.debeziumEnvelope(cl(s, d))),
    "codec_debezium_envelope_decode" -> ((s, d) => Codecs.debeziumEnvelopeDecode(cl(s, d))),
    "codec_csv" -> ((s, d) => Codecs.csv(cl(s, d))),
    "codec_avro_schema" -> ((s, d) => Codecs.avroRecord(cl(s, d))),
    "sink_storage_layout" -> ((s, d) => Codecs.storageLayout(cl(s, d))),
    "sink_kafka_messages" -> ((s, d) => Codecs.kafkaMessages(cl(s, d), nParts)),
    "cdc_dispatch_key" -> ((s, d) => Dispatchers.byKey(cl(s, d), "route-key-1")),
    "sink_topic_router" -> ((s, d) => Routing.route(cl(s, d), topicRules, defaultTopic)),
    "sink_ddl_routing" -> ((s, d) =>
      Routing.ddlRouting(cl(s, d), topicRules, defaultTopic, "open", nParts)),
    "sink_claim_check" -> ((s, d) => Sinks.claimCheck(cl(s, d), nParts, claimMaxBytes)),
    "sink_mysql_stmts" -> ((s, d) => Sinks.mysqlStmts(cl(s, d), maxTxnRow = 2)),
    "sink_txn_atomicity" -> ((s, d) => Sinks.txnAtomicity(cl(s, d), maxTxnRow = 8)),
    "cdc_ddl_filter_rich" -> ((s, d) => Filters.ddlSqlEventFilter(
      SchemaStore.ddlEvents(cl(s, d), Nil), ddlIgnoreTypes, ddlIgnoreSql)),
    "codec_simple" -> ((s, d) => SimpleProtocol.messages(cl(s, d))),
    "codec_simple_avro" -> ((s, d) => SimpleAvro.messages(cl(s, d))),
    "codec_simple_avro_decode" -> ((s, d) => SimpleAvro.decode(cl(s, d))),
    "sink_mysql_ddl" -> ((s, d) => MysqlDdl.frame(cl(s, d))),
    "sink_syncpoint_stmts" -> ((s, d) => MysqlDdl.syncpointStmts(cl(s, d), syncStep)),
    "sink_startts_resume" -> ((s, d) => MysqlDdl.startTs(cl(s, d))),
    "sink_blackhole" -> ((s, d) => Sinks.blackhole(cl(s, d))),
    "codec_craft" -> ((s, d) => Craft.frame(cl(s, d))),
    "codec_craft_resolved" -> ((s, d) => Craft.resolvedFrame(cl(s, d))),
    "codec_avro_binary" -> ((s, d) => AvroBinary.messages(cl(s, d))),
    "codec_avro_decode" -> ((s, d) => AvroBinary.decode(AvroBinary.messages(cl(s, d)))),
    "codec_simple_decode" -> ((s, d) => SimpleProtocol.decode(cl(s, d))),
    "codec_checksum" -> ((s, d) => Checksum.verify(cl(s, d))),
    "codec_craft_decode" -> ((s, d) => Craft.decode(Craft.frame(cl(s, d)))),
    "sink_compression" -> ((s, d) => Sinks.compressedClaimCheck(cl(s, d), nParts, compressMaxBytes)),
    "sink_batch_frame" -> ((s, d) => Sinks.batchFrame(cl(s, d), nParts, maxBatch = 4)),
    "sink_batch_bytes" -> ((s, d) =>
      Sinks.batchFrameBytes(cl(s, d), nParts, maxBatch = 6, maxBytes = 300L)),
    "sink_batch_flush" -> ((s, d) =>
      Sinks.batchFrameFlush(cl(s, d), nParts, maxBatch = 6, flushInterval = 300L)),
    "codec_canal_decode" -> ((s, d) => Codecs.canalJsonDecode(cl(s, d))),
    "codec_canal_envelope" -> ((s, d) => Codecs.canalEnvelope(cl(s, d))),
    "codec_canal_envelope_decode" -> ((s, d) => Codecs.canalEnvelopeDecode(cl(s, d))),
    "codec_open_wire" -> ((s, d) => OpenWire.messages(cl(s, d), nParts, maxBatch = 4)),
    "codec_open_wire_bytes" -> ((s, d) =>
      OpenWire.messagesByteCapped(cl(s, d), nParts, maxBatch = 6, maxBytes = 900L)),
    "codec_open_wire_decode" -> ((s, d) =>
      OpenWire.decode(OpenWire.messages(cl(s, d), nParts, maxBatch = 4))),
    "sink_handle_key_only" -> ((s, d) =>
      Sinks.handleKeyOnly(cl(s, d), nParts, compressMaxBytes)),
    "codec_csv_decode" -> ((s, d) => Codecs.csvDecode(Codecs.csv(cl(s, d)))),
    "codec_open_decode" -> ((s, d) => Codecs.openProtocolDecode(cl(s, d))),
    "codec_debezium_decode" -> ((s, d) => Codecs.debeziumDecode(cl(s, d))),
    "changefeed_pipeline" -> ((s, d) => Changefeed.kafka(cl(s, d), changefeedCfg)),
    "cdc_column_selector_rules" -> ((s, d) => ColumnSelector.select(cl(s, d), colSelRules)),
    // B-series: analytics
    "q1_agg" -> ((s, d) => Analytics.q1Agg(s, d)),
    "q3_join_topn" -> ((s, d) => Analytics.q3JoinTopN(s, d)),
    "q5_multijoin" -> ((s, d) => Analytics.q5MultiJoin(s, d)),
    "q_semi_join" -> ((s, d) => Analytics.qSemiJoin(s, d)),
    "q_anti_join" -> ((s, d) => Analytics.qAntiJoin(s, d)),
    "q_window_topn" -> ((s, d) => Analytics.qWindowTopN(s, d)),
    "q_window_running" -> ((s, d) => Analytics.qWindowRunning(s, d)),
    "q_rollup" -> ((s, d) => Analytics.qRollup(s, d)),
    "q_conditional_agg" -> ((s, d) => Analytics.qConditionalAgg(s, d)),
    "q_distinct_agg" -> ((s, d) => Analytics.qDistinctAgg(s, d)),
    "q_scalar_subquery" -> ((s, d) => Analytics.qScalarSubquery(s, d)),
    "q_time_bucket" -> ((s, d) => Analytics.qTimeBucket(s, d)),
    "q_approx_quantile" -> ((s, d) => Analytics.qApproxQuantile(s, d)),
    "q_sessionize" -> ((s, d) => Analytics.qSessionize(s, d)),
    // C-series: LLM-data-pipeline ops
    "dedup_exact" -> ((s, d) => ops.Dedup.exact(s, d)),
    "dedup_minhash_lsh" -> ((s, d) => ops.Dedup.minhashLsh(s, d)),
    "dedup_simhash" -> ((s, d) => ops.Dedup.simhash(s, d)),
    "dedup_ngram_jaccard" -> ((s, d) => ops.Dedup.ngramJaccard(s, d)),
    "neardup_cosine" -> ((s, d) => ops.Similarity.cosinePairs(s, d)),
    "ann_topk_bruteforce" -> ((s, d) => ops.Similarity.annTopK(s, d)),
    "ann_lsh_bucketed" -> ((s, d) => ops.Similarity.annLshBucketed(s, d)),
    "ann_ivf" -> ((s, d) => ops.Similarity.annIvf(s, d)),
    "dedup_semantic" -> ((s, d) => ops.Similarity.dedupSemantic(s, d)),
    "knn_graph" -> ((s, d) => ops.Similarity.knnGraph(s, d)),
    "cluster_label_tfidf" -> ((s, d) => ops.Similarity.clusterLabelTfidf(s, d)),
    "pq_encode" -> ((s, d) => ops.Similarity.pqEncode(s, d)),
    "pq_adc_topk" -> ((s, d) => ops.Similarity.pqAdcTopK(s, d)),
    "dedup_lines" -> ((s, d) => ops.Dedup.dedupLines(s, d)),
    "text_vocab_coverage" -> ((s, d) => ops.TextAnalysis.vocabCoverage(s, d)),
    "text_unigram_surprisal" -> ((s, d) => ops.TextAnalysis.unigramSurprisal(s, d)),
    "text_bigram_surprisal" -> ((s, d) => ops.TextAnalysis.bigramSurprisal(s, d)),
    "doc_token_offsets" -> ((s, d) => ops.TextAnalysis.tokenOffsets(s, d)),
    "perplexity_bucket" -> ((s, d) => ops.TextAnalysis.perplexityBucket(s, d)),
    "quality_model_filter" -> ((s, d) => ops.TextAnalysis.qualityModelFilter(s, d)),
    "source_mix_weights" -> ((s, d) => ops.Corpus.sourceMixWeights(s, d)),
    "mix_epoch_plan" -> ((s, d) => ops.Corpus.mixEpochPlan(s, d)),
    "bpe_pair_merge" -> ((s, d) => ops.Corpus.bpePairMerge(s, d)),
    "embedding_quantize" -> ((s, d) => ops.Similarity.embeddingQuantize(s, d)),
    "embedding_random_projection" -> ((s, d) => ops.Similarity.randomProjection(s, d)),
    "text_langid" -> ((s, d) => ops.TextAnalysis.langId(s, d)),
    "text_quality_score" -> ((s, d) => ops.TextAnalysis.qualityScore(s, d)),
    "text_token_count" -> ((s, d) => ops.TextAnalysis.tokenCount(s, d)),
    "text_fingerprint" -> ((s, d) => ops.TextAnalysis.fingerprint(s, d)),
    "multimodal_meta" -> ((s, d) => ops.Multimodal.features(s, d)),
    "multimodal_frame_sample" -> ((s, d) => ops.Multimodal.frameSamples(s, d)),
    "multimodal_phash_dedup" -> ((s, d) => ops.Multimodal.phashDedup(s, d)),
    "text_repetition" -> ((s, d) => ops.Corpus.textRepetition(s, d)),
    "doc_tfidf" -> ((s, d) => ops.Corpus.docTfidf(s, d)),
    "doc_chunk" -> ((s, d) => ops.Retrieval.docChunk(s, d)),
    "text_winnowing" -> ((s, d) => ops.Retrieval.winnowing(s, d)),
    "decontaminate_winnow" -> ((s, d) => ops.Retrieval.decontaminateWinnow(s, d)),
    "dedup_containment" -> ((s, d) => ops.Retrieval.dedupContainment(s, d)),
    "dedup_edit_distance" -> ((s, d) => ops.Retrieval.dedupEditDistance(s, d)),
    "ann_matryoshka_topk" -> ((s, d) => ops.Similarity.annMatryoshkaTopK(s, d)),
    "embedding_dim_stats" -> ((s, d) => ops.Similarity.embeddingDimStats(s, d)),
    "corpus_drift" -> ((s, d) => ops.Corpus.corpusDrift(s, d)),
    "bm25_topk" -> ((s, d) => ops.Retrieval.bm25TopK(s, d)),
    "hybrid_rrf_topk" -> ((s, d) => ops.Retrieval.hybridRrfTopK(s, d)),
    "data_split" -> ((s, d) => ops.Corpus.dataSplit(s, d)),
    "dedup_clusters" -> ((s, d) => ops.Curation.dedupClusters(s, d)),
    "dedup_keep_best" -> ((s, d) => ops.Curation.dedupKeepBest(s, d)),
    "dedup_bloom" -> ((s, d) => ops.Dedup.dedupBloom(s, d)),
    "contamination_ngram" -> ((s, d) => ops.Curation.contamination(s, d)),
    "stratified_sample" -> ((s, d) => ops.Curation.stratifiedSample(s, d)),
    "pii_redact" -> ((s, d) => ops.Curation.piiRedact(s, d)),
    "quality_filter_bank" -> ((s, d) => ops.Curation.qualityFilterBank(s, d)),
    "corpus_manifest" -> ((s, d) => ops.Curation.corpusManifest(s, d)),
    "curation_funnel" -> ((s, d) => ops.Curation.curationFunnel(s, d)),
    "seq_pack" -> ((s, d) => ops.Corpus.seqPack(s, d)),
    "seq_length_histogram" -> ((s, d) => ops.Corpus.seqLengthHistogram(s, d)),
    "corpus_stats" -> ((s, d) => ops.Corpus.corpusStats(s, d)),
    "q_funnel" -> ((s, d) => Analytics.qFunnel(s, d)),
    "q_retention" -> ((s, d) => Analytics.qRetention(s, d)),
    "q_asof_join" -> ((s, d) => Analytics.qAsofJoin(s, d)),
    "q_range_join" -> ((s, d) => Analytics.qRangeJoin(s, d)),
    "q_salted_skew_join" -> ((s, d) => Analytics.qSaltedSkewJoin(s, d)),
    "q_window_ranks" -> ((s, d) => Analytics.qWindowRanks(s, d)),
    "q_corr_agg_subquery" -> ((s, d) => Analytics.qCorrAggSubquery(s, d)),
    "q_pivot" -> ((s, d) => Analytics.qPivot(s, d)),
    "q_unpivot" -> ((s, d) => Analytics.qUnpivot(s, d)),
    "q_full_outer" -> ((s, d) => Analytics.qFullOuter(s, d)),
    "q_approx_distinct" -> ((s, d) => Analytics.qApproxDistinct(s, d)),
    "q_share_of_total" -> ((s, d) => Analytics.qShareOfTotal(s, d)),
    "q_grouping_sets" -> ((s, d) => Analytics.qGroupingSets(s, d)),
    "q_median_mode" -> ((s, d) => Analytics.qMedianMode(s, d)),
    "q_set_ops" -> ((s, d) => Analytics.qSetOps(s, d)),
    "q_gaps_islands" -> ((s, d) => Analytics.qGapsIslands(s, d)),
    "q_rolling_distinct" -> ((s, d) => Analytics.qRollingDistinct(s, d)),
    "q_concurrency_gauge" -> ((s, d) => Analytics.qConcurrencyGauge(s, d)),
    "q_range_frame" -> ((s, d) => Analytics.qRangeFrame(s, d)),
    "q_json_extract" -> ((s, d) => Analytics.qJsonExtract(s, d)),
    "q_cube" -> ((s, d) => Analytics.qCube(s, d)),
    "q_first_last" -> ((s, d) => Analytics.qFirstLast(s, d)),
    "q_percentile_exact" -> ((s, d) => Analytics.qPercentileExact(s, d)),
    "q_string_agg" -> ((s, d) => Analytics.qStringAgg(s, d)),
    "q_ntile_cume" -> ((s, d) => Analytics.qNtileCume(s, d)),
    "ngram_heavy_hitters" -> ((s, d) => ops.Corpus.ngramHeavyHitters(s, d)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "cdc_changelog_build" -> ChangeEvents.changelogSql,
    "cdc_event_sort" -> o(Materialize.eventSortSql),
    "cdc_table_filter" -> o(
      s"SELECT * FROM changelog WHERE ${Filters.tableFilterSql(tableRules)}"),
    "cdc_table_filter_polarity" -> o(
      Filters.tableFilterPolaritySql(polarityRules)),
    "cdc_event_type_filter" -> o(
      s"SELECT * FROM changelog WHERE op NOT IN ('D')"),
    "cdc_expr_filter" -> o(
      "SELECT * FROM changelog WHERE NOT COALESCE(after_value > 150.0 AND event_type = 'purchase', FALSE)"),
    "cdc_ts_filter" -> o(s"SELECT * FROM changelog WHERE commit_ts > $minTs"),
    "cdc_column_selector" -> o(
      "SELECT schema_name, table_name, pk, commit_ts, op, after_value FROM changelog"),
    "cdc_dispatch_table" -> o(Dispatchers.byTableSql(nParts)),
    "cdc_dispatch_index_value" -> o(Dispatchers.byIndexValueSql(nParts)),
    "cdc_dispatch_columns" -> o(Dispatchers.byColumnsSql(dispatchCols, nParts)),
    "cdc_dispatch_ts" -> o(Dispatchers.byTsSql(nParts)),
    "cdc_snapshot_materialize" -> o(Materialize.snapshotSql),
    "cdc_safe_mode_upsert" -> o(Materialize.safeModeUpsertSql),
    "cdc_resolved_ts" -> o(Materialize.resolvedTsSql),
    "cdc_span_frontier" -> o(Materialize.spanFrontierSql()),
    "cdc_ddl_barrier" -> o(Barrier.ddlBarrierSql(syncStep)),
    "cdc_watermark_agg" -> o(Barrier.watermarkAggSql(watermarkCfs, syncStep)),
    "cdc_scan_tasks" -> o(EventService.scanTasksSql()),
    "cdc_event_seq_check" -> o(EventService.seqCheckSql()),
    "cdc_log_candidates" -> o(EventService.logCandidatesSql()),
    "cdc_scan_emit" -> o(EventService.scanEmitSql()),
    "cdc_kv_key_codec" -> o(EventService.kvKeyCodecSql()),
    "cdc_raw_key_filter" -> o(EventService.rawKeyFilterSql),
    "cdc_gc_safepoint" -> o(Barrier.gcSafepointSql(gcFleet, syncStep)),
    "cdc_sched_basic" -> o(Scheduler.basicScheduleSql()),
    "cdc_sched_balance" -> o(Scheduler.groupBalanceSql()),
    "cdc_hot_span" -> o(Scheduler.hotSpansSql()),
    "cdc_span_split_bytes" -> o(Scheduler.spanSplitBytesSql()),
    "cdc_span_split_regions" -> o(Scheduler.spanSplitRegionsSql()),
    "cdc_span_split_choose" -> o(Scheduler.spanSplitChooseSql(threshold = 1660L)),
    "cdc_changefeed_backoff" -> o(ChangefeedBackoff.backoffSql(backoffFleet)),
    "cdc_operator_move" -> o(OperatorLifecycle.operatorMoveSql()),
    "cdc_operator_addstop" -> o(OperatorLifecycle.operatorAddStopSql()),
    "cdc_range_lock" -> o(RangeLock.rangeLockStatsSql()),
    "cdc_region_init" -> o(RegionInit.regionInitSql),
    "cdc_mem_backpressure" -> o(Backpressure.memBackpressureSql()),
    "cdc_event_queue_drain" -> o(DynStreamQueue.queueDrainSql()),
    "cdc_schema_gc" -> o(SchemaStore.schemaGcSql),
    "cdc_eventstore_key" -> o(EventService.eventstoreKeySql()),
    "cdc_changefeed_overview" ->
      o(Barrier.changefeedOverviewSql(gcFleet, syncStep)),
    "cdc_dispatcher_block" -> o(DispatcherBlock.dispatcherBlockSql()),
    "cdc_span_coverage" -> o(Coverage.spanCoverageSql()),
    "cdc_txn_match" -> o(TxnMatcher.matchedSql),
    "cdc_gc_trim" -> o(Materialize.gcTrimSql()),
    "cdc_table_progress" -> o(Materialize.tableProgressSql()),
    "cdc_dispatcher_checkpoint" -> o(Materialize.dispatcherCheckpointSql()),
    "cdc_txn_group" -> o(Materialize.txnGroupSql),
    "cdc_syncpoint" -> o(Materialize.syncpointSql(syncStep)),
    "cdc_schema_asof" -> o(SchemaStore.eventsWithSchemaSql),
    "cdc_ddl_events" -> o(SchemaStore.ddlEventsSql(Seq("ALTER"))),
    "cdc_table_lifecycle" -> o(SchemaStore.tableLifecycleSql),
    "cdc_event_physical" -> o(SchemaStore.eventPhysicalTableSql),
    "cdc_schema_snapshot" -> o(SchemaStore.schemaSnapshotSql()),
    "codec_canal_json" -> o(Codecs.canalJsonSql),
    "codec_open_protocol" -> o(Codecs.openProtocolSql),
    "codec_debezium" -> o(Codecs.debeziumSql),
    "codec_debezium_envelope" -> o(Codecs.debeziumEnvelopeSql),
    "codec_debezium_envelope_decode" -> o(Codecs.debeziumEnvelopeDecodeSql),
    "codec_csv" -> o(Codecs.csvSql),
    "codec_avro_schema" -> o(Codecs.avroRecordSql),
    "sink_storage_layout" -> o(Codecs.storageLayoutSql),
    "sink_kafka_messages" -> o(Codecs.kafkaMessagesSql(nParts)),
    "cdc_dispatch_key" -> o(Dispatchers.byKeySql("route-key-1")),
    "sink_topic_router" -> o(Routing.routeSql(topicRules, defaultTopic)),
    "sink_ddl_routing" ->
      o(Routing.ddlRoutingSql(topicRules, defaultTopic, "open", nParts)),
    "sink_claim_check" -> o(Sinks.claimCheckSql(nParts, claimMaxBytes)),
    "sink_mysql_stmts" -> o(Sinks.mysqlStmtsSql(maxTxnRow = 2)),
    "sink_txn_atomicity" -> o(Sinks.txnAtomicitySql(maxTxnRow = 8)),
    "cdc_ddl_filter_rich" -> o(Filters.ddlSqlEventFilterSql(
      SchemaStore.ddlEventsSql(Nil), ddlIgnoreTypes, ddlIgnoreSql)),
    "codec_simple" -> o(SimpleProtocol.messagesSql),
    "codec_simple_avro" -> o(SimpleAvro.messagesSql),
    "codec_simple_avro_decode" -> o(SimpleAvro.decodeSql),
    "sink_mysql_ddl" -> o(MysqlDdl.frameSql()),
    "sink_syncpoint_stmts" -> o(MysqlDdl.syncpointStmtsSql(syncStep)),
    "sink_startts_resume" -> o(MysqlDdl.startTsSql()),
    "sink_blackhole" -> o(Sinks.blackholeSql),
    "codec_craft" -> o(Craft.frameSql),
    "codec_craft_resolved" -> o(Craft.resolvedFrameSql),
    "codec_avro_binary" -> o(AvroBinary.messagesSql()),
    "codec_avro_decode" -> o(AvroBinary.decodeSql()),
    "codec_simple_decode" -> o(SimpleProtocol.decodeSql),
    "codec_checksum" -> o(Checksum.verifySql),
    "codec_craft_decode" -> o(Craft.decodeSql),
    "sink_compression" -> o(Sinks.compressedClaimCheckSql(nParts, compressMaxBytes)),
    "sink_batch_frame" -> o(Sinks.batchFrameSql(nParts, maxBatch = 4)),
    "sink_batch_bytes" -> o(Sinks.batchFrameBytesSql(nParts, maxBatch = 6, maxBytes = 300L)),
    "sink_batch_flush" ->
      o(Sinks.batchFrameFlushSql(nParts, maxBatch = 6, flushInterval = 300L)),
    "codec_canal_decode" -> o(Codecs.canalJsonDecodeSql),
    "codec_canal_envelope" -> o(Codecs.canalEnvelopeSql),
    "codec_canal_envelope_decode" -> o(Codecs.canalEnvelopeDecodeSql),
    "codec_open_wire" -> o(OpenWire.messagesSql(nParts, maxBatch = 4)),
    "codec_open_wire_bytes" ->
      o(OpenWire.messagesByteCappedSql(nParts, maxBatch = 6, maxBytes = 900L)),
    "codec_open_wire_decode" -> o(OpenWire.decodeSql(nParts, maxBatch = 4)),
    "sink_handle_key_only" -> o(Sinks.handleKeyOnlySql(nParts, compressMaxBytes)),
    "codec_csv_decode" -> o(Codecs.csvDecodeSql),
    "codec_open_decode" -> o(Codecs.openProtocolDecodeSql),
    "codec_debezium_decode" -> o(Codecs.debeziumDecodeSql),
    "changefeed_pipeline" -> o(Changefeed.kafkaDebeziumSql(changefeedCfg)),
    "cdc_column_selector_rules" -> o(ColumnSelector.selectSql(colSelRules)),
    "q1_agg" -> Analytics.q1AggSql,
    "q3_join_topn" -> Analytics.q3JoinTopNSql,
    "q5_multijoin" -> Analytics.q5MultiJoinSql,
    "q_semi_join" -> Analytics.qSemiJoinSql,
    "q_anti_join" -> Analytics.qAntiJoinSql,
    "q_window_topn" -> Analytics.qWindowTopNSql,
    "q_window_running" -> Analytics.qWindowRunningSql,
    "q_rollup" -> Analytics.qRollupSql,
    "q_conditional_agg" -> Analytics.qConditionalAggSql,
    "q_distinct_agg" -> Analytics.qDistinctAggSql,
    "q_scalar_subquery" -> Analytics.qScalarSubquerySql,
    "q_time_bucket" -> Analytics.qTimeBucketSql,
    "q_approx_quantile" -> Analytics.qApproxQuantileSql,
    "q_sessionize" -> Analytics.qSessionizeSql,
    // C-series — every operator is oracle-checked: the LSH/signature
    // pipelines use engine-portable hashing (md5-based hash60 +
    // arithmetic permutations + literal hyperplanes), so even the
    // approximate operators have exact generated DuckDB oracles.
    "dedup_exact" -> ops.Dedup.exactSql,
    "dedup_simhash" -> ops.Dedup.simhashSql(),
    "dedup_minhash_lsh" -> ops.Dedup.minhashLshSql(),
    "dedup_ngram_jaccard" -> ops.Dedup.ngramJaccardSql(),
    "neardup_cosine" -> ops.Similarity.cosinePairsSql(),
    "ann_topk_bruteforce" -> ops.Similarity.annTopKSql(),
    "ann_lsh_bucketed" -> ops.Similarity.annLshBucketedSql(),
    "ann_ivf" -> ops.Similarity.annIvfSql(),
    "dedup_semantic" -> ops.Similarity.dedupSemanticSql(),
    "knn_graph" -> ops.Similarity.knnGraphSql(),
    "cluster_label_tfidf" -> ops.Similarity.clusterLabelTfidfSql(),
    "pq_encode" -> ops.Similarity.pqEncodeSql(),
    "pq_adc_topk" -> ops.Similarity.pqAdcTopKSql(),
    "dedup_lines" -> ops.Dedup.dedupLinesSql(),
    "text_vocab_coverage" -> ops.TextAnalysis.vocabCoverageSql(),
    "text_unigram_surprisal" -> ops.TextAnalysis.unigramSurprisalSql,
    "text_bigram_surprisal" -> ops.TextAnalysis.bigramSurprisalSql,
    "doc_token_offsets" -> ops.TextAnalysis.tokenOffsetsSql,
    "perplexity_bucket" -> ops.TextAnalysis.perplexityBucketSql,
    "quality_model_filter" -> ops.TextAnalysis.qualityModelFilterSql(),
    "source_mix_weights" -> ops.Corpus.sourceMixWeightsSql,
    "mix_epoch_plan" -> ops.Corpus.mixEpochPlanSql(),
    "bpe_pair_merge" -> ops.Corpus.bpePairMergeSql(),
    "embedding_quantize" -> ops.Similarity.embeddingQuantizeSql(),
    "embedding_random_projection" -> ops.Similarity.randomProjectionSql(),
    "text_langid" -> ops.TextAnalysis.langIdSql,
    "text_quality_score" -> ops.TextAnalysis.qualityScoreSql,
    "text_token_count" -> ops.TextAnalysis.tokenCountSql,
    "text_fingerprint" -> ops.TextAnalysis.fingerprintSql,
    "multimodal_meta" -> ops.Multimodal.featuresSql,
    "multimodal_frame_sample" -> ops.Multimodal.frameSamplesSql(),
    "multimodal_phash_dedup" -> ops.Multimodal.phashDedupSql(),
    "text_repetition" -> ops.Corpus.textRepetitionSql,
    "doc_tfidf" -> ops.Corpus.docTfidfSql(),
    "doc_chunk" -> ops.Retrieval.docChunkSql(),
    "text_winnowing" -> ops.Retrieval.winnowingSql(),
    "decontaminate_winnow" -> ops.Retrieval.decontaminateWinnowSql(),
    "dedup_containment" -> ops.Retrieval.dedupContainmentSql(),
    "dedup_edit_distance" -> ops.Retrieval.dedupEditDistanceSql(),
    "ann_matryoshka_topk" -> ops.Similarity.annMatryoshkaTopKSql(),
    "embedding_dim_stats" -> ops.Similarity.embeddingDimStatsSql(),
    "corpus_drift" -> ops.Corpus.corpusDriftSql(),
    "bm25_topk" -> ops.Retrieval.bm25TopKSql(),
    "hybrid_rrf_topk" -> ops.Retrieval.hybridRrfTopKSql(),
    "data_split" -> ops.Corpus.dataSplitSql(),
    "dedup_clusters" -> ops.Curation.dedupClustersSql(),
    "dedup_keep_best" -> ops.Curation.dedupKeepBestSql(),
    "dedup_bloom" -> ops.Dedup.dedupBloomSql(),
    "contamination_ngram" -> ops.Curation.contaminationSql,
    "stratified_sample" -> ops.Curation.stratifiedSampleSql(),
    "pii_redact" -> ops.Curation.piiRedactSql,
    "quality_filter_bank" -> ops.Curation.qualityFilterBankSql(),
    "corpus_manifest" -> ops.Curation.corpusManifestSql,
    "curation_funnel" -> ops.Curation.curationFunnelSql(),
    "seq_pack" -> ops.Corpus.seqPackSql(),
    "seq_length_histogram" -> ops.Corpus.seqLengthHistogramSql,
    "corpus_stats" -> ops.Corpus.corpusStatsSql,
    "q_funnel" -> Analytics.qFunnelSql,
    "q_retention" -> Analytics.qRetentionSql,
    "q_asof_join" -> Analytics.qAsofJoinSql,
    "q_range_join" -> Analytics.qRangeJoinSql,
    "q_salted_skew_join" -> Analytics.qSaltedSkewJoinSql(),
    "q_window_ranks" -> Analytics.qWindowRanksSql,
    "q_corr_agg_subquery" -> Analytics.qCorrAggSubquerySql,
    "q_pivot" -> Analytics.qPivotSql,
    "q_unpivot" -> Analytics.qUnpivotSql,
    "q_full_outer" -> Analytics.qFullOuterSql,
    "q_approx_distinct" -> Analytics.qApproxDistinctSql,
    "q_share_of_total" -> Analytics.qShareOfTotalSql,
    "q_grouping_sets" -> Analytics.qGroupingSetsSql,
    "q_median_mode" -> Analytics.qMedianModeSql,
    "q_set_ops" -> Analytics.qSetOpsSql,
    "q_gaps_islands" -> Analytics.qGapsIslandsSql,
    "q_rolling_distinct" -> Analytics.qRollingDistinctSql(),
    "q_concurrency_gauge" -> Analytics.qConcurrencyGaugeSql(),
    "q_range_frame" -> Analytics.qRangeFrameSql(),
    "q_json_extract" -> Analytics.qJsonExtractSql,
    "q_cube" -> Analytics.qCubeSql,
    "q_first_last" -> Analytics.qFirstLastSql,
    "q_percentile_exact" -> Analytics.qPercentileExactSql,
    "q_string_agg" -> Analytics.qStringAggSql,
    "q_ntile_cume" -> Analytics.qNtileCumeSql,
    "ngram_heavy_hitters" -> ops.Corpus.ngramHeavyHittersSql(),
  )
}
