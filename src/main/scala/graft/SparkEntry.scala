package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is exposed as a named query
  * over the driver's parquet tables, with a DuckDB oracle in [[OracleSql]].
  * Column names and numeric expression shapes are kept identical between the
  * Spark plan and the oracle SQL (hash-compare parity; see OracleSql docs).
  */
object SparkEntry {

  private val ev = TranscriptCols.events

  /** Shared scenario for the three as-of variants: every event ← latest
    * purchase at-or-before it. */
  private def asofVariant(s: SparkSession, dir: String,
      f: (DataFrame, DataFrame, String, String, String, Seq[String], String) => DataFrame): DataFrame = {
    val events = Pipelines.table(s, dir, "events")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    f(events.select(col("user_id"), col("event_id"), col("ts")), purchases,
      "user_id", "ts", "event_id", Seq("event_id", "value"), "asof_")
      .select(col("user_id"), col("event_id"), col("asof_event_id"), col("asof_value"))
  }

  /** Scored entities for the metrics operators: conversion_potential as the
    * score, purchase_yn as the label. */
  private def scored(s: SparkSession, dir: String): DataFrame =
    Pipelines.entityFeatures(s, dir)
      .select(col("user_id"), col("purchase_yn").as("y"), col("conversion_potential").as("score"))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full hierarchical point-in-time feature pipeline (T1→T4 + layers). */
  def entry(spark: SparkSession): DataFrame =
    Pipelines.entityFeatures(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // — hierarchical pipeline stages (reference T1..T4 + engineered layers) —
    "q_calendar_slots" -> ((s, dir) => Pipelines.slots(s, dir)),
    "q_slot_clean" -> ((s, dir) => Pipelines.slotsCleaned(s, dir)),
    "q_entity_stats" -> ((s, dir) => Pipelines.entityStats(s, dir)),
    "q_entity" -> ((s, dir) => Pipelines.entity(s, dir)),
    "q_entity_features" -> ((s, dir) => Pipelines.entityFeatures(s, dir)),

    // — windowed / point-in-time operators (north rule) —
    "q_sessionize" -> ((s, dir) =>
      Sessionize.sessions(Pipelines.table(s, dir, "events"), ev, gapSeconds = 1800L)),
    "q_running_stats" -> ((s, dir) => {
      val c = Pipelines.table(s, dir, "events")
        .withColumn("value_c", round(col("value") * 100).cast("long"))
      RunningStats.pointInTime(c, entity = Seq("user_id"), ev, valueCols = Seq("value_c"))
        .select(col("user_id"), col("event_id"), col("run_cnt"),
          col("value_c_run_min"), col("value_c_run_max"), col("value_c_run_avg"))
    }),
    "q_lag_lead" -> ((s, dir) =>
      LagLead.withLagLead(Pipelines.table(s, dir, "events"), ev)
        .select(col("user_id"), col("event_id"), col("prev_role"), col("next_role"),
          col("dt_prev_us"), col("dt_next_us"), col("turn_rank"))),
    "q_asof_join" -> ((s, dir) => {
      val events = Pipelines.table(s, dir, "events")
      val purchases = events.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      AsOfJoin.merged(
        left = events.select(col("user_id"), col("event_id"), col("ts")),
        right = purchases, key = "user_id", ts = "ts", rightSeq = "event_id",
        payload = Seq("event_id", "value"))
        .select(col("user_id"), col("event_id"),
          col("asof_event_id"), col("asof_value"))
    }),
    "q_sliding_stats" -> ((s, dir) => {
      // sliding (last-3-rows) per-entity stats — the bounded-frame window
      // family (tumbling/session are covered elsewhere); partitioned by
      // entity, so it scales like any keyed window
      val e = Pipelines.table(s, dir, "events")
        .withColumn("value_c", round(col("value") * 100).cast("long"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(-2, org.apache.spark.sql.expressions.Window.currentRow)
      e.select(col("user_id"), col("event_id"),
        count(lit(1)).over(w).as("win_n"),
        min(col("value_c")).over(w).as("win_min"),
        max(col("value_c")).over(w).as("win_max"),
        (sum(col("value_c")).over(w).cast("double") /
          count(lit(1)).over(w).cast("double")).as("win_avg"))
    }),
    "q_topk_per_group" -> ((s, dir) => {
      // per-group top-k (rank window partitioned by the group — never global)
      val e = Pipelines.table(s, dir, "events")
        .withColumn("value_c", round(col("value") * 100).cast("long"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("value_c").desc, col("event_id"))
      e.select(col("user_id"), col("event_id"), col("value_c"),
        row_number().over(w).as("rk"))
        .filter(col("rk") <= 3)
    }),
    "q_tumbling_hour" -> ((s, dir) =>
      Windowize.withTumblingWindow(Pipelines.table(s, dir, "events"), ev, seconds = 3600L)
        .groupBy(col("user_id"), col("window_start"))
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_purchases"))),

    // — flagship: full PIT backfill (windowize → states → layers → as-of) —
    "q_pit_backfill" -> ((s, dir) =>
      PitPipeline.anchorFeatures(Pipelines.table(s, dir, "events"),
        ev, Pipelines.quartet, Pipelines.binding, widthSec = 3600L).drop("ts")),

    // — as-of variant equivalence (same oracle as q_asof_join) —
    "q_asof_windowed" -> ((s, dir) =>
      asofVariant(s, dir, AsOfJoin.windowed(_, _, _, _, _, _, _))),
    "q_asof_bcast" -> ((s, dir) =>
      asofVariant(s, dir, AsOfJoin.broadcastIndex(_, _, _, _, _, _, _))),
    "q_asof_scalable" -> ((s, dir) =>
      asofVariant(s, dir, AsOfJoin.mergedScalable(_, _, _, _, _, _, _))),
    "q_asof_planned" -> ((s, dir) =>
      asofVariant(s, dir, graft.plans.AsOfPlan.asOfJoin(_, _, _, _, _, _, _))),

    // — statistical cleaning / screening / encoding —
    "q_iqr_clip" -> ((s, dir) =>
      StatOps.iqrClip(Pipelines.slots(s, dir), Pipelines.quartet.map(q => s"${q}_count"))),
    "q_variance_screen" -> ((s, dir) =>
      StatOps.varianceScreen(Pipelines.entity(s, dir), Pipelines.quartet.map(q => s"${q}_count"))),
    "q_label_encode" -> ((s, dir) =>
      CategoricalOps.labelEncode(Pipelines.table(s, dir, "events"), "event_type")
        .select(col("event_id"), col("event_type"), col("event_type_code"))),
    "q_interactions" -> ((s, dir) => {
      val cols = Pipelines.quartet.map(q => s"${q}_avg") ++ Pipelines.quartet.map(q => s"${q}_count")
      val withInter = StatOps.pairwiseInteractions(Pipelines.entity(s, dir), cols)
      val interNames = for { i <- cols.indices; j <- (i + 1) until cols.size }
        yield s"${cols(i)}_x_${cols(j)}"
      withInter.select((col("user_id") +: interNames.map(col)).toIndexedSeq: _*)
    }),
    "q_stratified_folds" -> ((s, dir) =>
      CategoricalOps.stratifiedFolds(Pipelines.entity(s, dir), "user_id", "purchase_yn", 5)
        .select(col("user_id"), col("purchase_yn"), col("fold"))),
    "q_ts_parse" -> ((s, dir) => {
      val e = Pipelines.table(s, dir, "events")
      val us = graft.ops.micros(col("ts"))
      val v = when(col("event_id") % 2 === 0, ScalarOps.epochSeconds(col("ts")))
        .otherwise(((us - pmod(us, lit(1000L))) / lit(1000L)).cast("long"))
      val bj = ScalarOps.toShanghaiHour(ScalarOps.parseEpoch(v))
      e.select(col("event_id"), bj.as("bj_hour"),
        Windowize.dayType(bj).as("day_type"),
        Windowize.timePeriod(bj).as("time_period"))
    }),
    "q_salted_agg" -> ((s, dir) => {
      // explicit skew path under the correctness gate: two-phase salted
      // aggregation == plain GROUP BY for algebraic aggs (exact cent sums)
      val e = Pipelines.table(s, dir, "events")
        .withColumn("value_c", round(col("value") * 100).cast("long"))
        .withColumn("value_c_min", col("value_c"))
        .withColumn("value_c_max", col("value_c"))
      Skew.saltedAggregate(e, keys = Seq("user_id"), saltSrc = "event_id", salts = 16,
        aggs = Seq(Skew.countAll("n"), Skew.sumL("value_c"),
          Skew.minL("value_c_min"), Skew.maxL("value_c_max")))
    }),
    "q_standard_scale" -> ((s, dir) =>
      StatOps.standardScaleMoments(
        Pipelines.table(s, dir, "events")
          .withColumn("value_c", round(col("value") * 100).cast("long")),
        "event_id", "value_c")),
    "q_json_extract" -> ((s, dir) =>
      // semi-structured props: JSON path extraction (codegen'd
      // get_json_object) + grain rollup — the metadata-column pattern a
      // training-data pipeline uses for provenance/quality fields
      Pipelines.table(s, dir, "events")
        .select(col("user_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("k_sum"), max(col("k")).as("k_max"))),
    "q_top_entities" -> ((s, dir) =>
      Pipelines.entity(s, dir)
        .select(col("user_id"),
          (col("view_count") + col("click_count") + col("signup_count") + col("purchase_count"))
            .as("total_activity"))
        .orderBy(col("total_activity").desc, col("user_id")).limit(20)),

    // — relational join surface over the TPC-H-ish tables —
    "q_scan_agg" -> ((s, dir) =>
      Relational.scanAgg(Pipelines.table(s, dir, "lineitem"), "1998-09-01 00:00:00")),
    "q_join_broadcast" -> ((s, dir) =>
      Relational.revenueByNation(Pipelines.table(s, dir, "orders"),
        Pipelines.table(s, dir, "customer"), Pipelines.table(s, dir, "nation"))),
    "q_join_fact" -> ((s, dir) =>
      Relational.revenueByPriority(Pipelines.table(s, dir, "lineitem"),
        Pipelines.table(s, dir, "orders"))),
    "q_join_semi" -> ((s, dir) =>
      Relational.ordersWithBigItems(Pipelines.table(s, dir, "orders"),
        Pipelines.table(s, dir, "lineitem"), minQty = 45.0)),
    "q_join_anti" -> ((s, dir) =>
      Relational.customersWithoutPriority(Pipelines.table(s, dir, "customer"),
        Pipelines.table(s, dir, "orders"), "1-URGENT")),
    "q_rollup" -> ((s, dir) =>
      // every grain of the per-entity/per-type hierarchy from ONE pass
      Relational.hierarchicalRollup(Pipelines.table(s, dir, "events"))),
    "q_unpivot" -> ((s, dir) =>
      // wide -> long melt of the entity count columns (Expand, map-only —
      // not the per-column UNION ALL rescan an SQL engine would run)
      PivotCounts.melt(Pipelines.entity(s, dir), Seq("user_id"),
        Pipelines.quartet.map(q => s"${q}_count"), "metric", "value")),
    "q_range_join" -> ((s, dir) => {
      // temporal-context band join: events within ±30 min of a same-user
      // purchase, via the bin-replicated equi-join (never |L_k|×|R_k|)
      val events = Pipelines.table(s, dir, "events")
      RangeJoin.bandCounts(events,
        events.filter(col("event_type") === "purchase"),
        key = "user_id", ts = "ts", leftSeq = "event_id", rightSeq = "event_id",
        widthSec = 1800L)
    }),

    // — evaluation-framework metrics over scored entities —
    "q_confusion" -> ((s, dir) => {
      val sc = scored(s, dir)
      Metrics.confusion(sc.withColumn("pred",
        when(col("score") >= 0.5, 1).otherwise(0)), "y", "pred")
    }),
    "q_binary_metrics" -> ((s, dir) => Metrics.binaryMetrics(scored(s, dir), "y", "score", 0.5)),
    "q_auc_roc" -> ((s, dir) => Metrics.aucRoc(scored(s, dir), "y", "score")),
    "q_pr_curve" -> ((s, dir) => Metrics.prCurve(scored(s, dir), "y", "score")),
    "q_auc_pr" -> ((s, dir) => Metrics.averagePrecision(scored(s, dir), "y", "score")),
    "q_calibration" -> ((s, dir) => Metrics.calibrationBins(scored(s, dir), "y", "score")),
    "q_threshold_scan" -> ((s, dir) =>
      Metrics.thresholdScan(scored(s, dir), "y", "score", (1 to 99).map(i => (i + 0.0) / 100.0))),
    "q_impute" -> ((s, dir) => {
      val e = Pipelines.table(s, dir, "events").select(col("event_id"),
        when(col("event_id") % 7 === 0, lit(null)).otherwise(col("value")).as("value_n"),
        when(col("event_id") % 11 === 0, lit(null)).otherwise(col("event_type")).as("event_type_n"))
      Impute.modeFill(Impute.medianFill(e, Seq("value_n")), Seq("event_type_n"))
    }),

    // — text hashing / language-id —
    "q_fingerprint" -> ((s, dir) =>
      TextAnalysis.withFingerprint(Pipelines.table(s, dir, "documents"))
        .select(col("doc_id"), col("fingerprint"))),
    "q_simhash" -> ((s, dir) =>
      Dedup.withSimHash(Pipelines.table(s, dir, "documents"))
        .select(col("doc_id"), col("simhash"))),
    "q_lang_id" -> ((s, dir) =>
      TextAnalysis.withLangId(Pipelines.table(s, dir, "documents"))
        .select(col("doc_id"), col("lang_pred"))),
    "q_minhash_sig" -> ((s, dir) =>
      // native one-pass signature (12 permutations share one string scan);
      // native array→string join keeps the projection in codegen
      Pipelines.table(s, dir, "documents")
        .select(col("doc_id"),
          graft.functions.TextExprs.long_array_join(
            Dedup.minHashSig(col("text"), 3, 12), "_").as("sig"))),
    "q_lsh_pairs" -> ((s, dir) =>
      Dedup.minHashLshPairs(Pipelines.table(s, dir, "documents"), "doc_id", "text",
        shingleK = 3, numHashes = 12, bands = 4)),

    // — training-data pipeline operators (documents / embeddings) —
    "q_binary_meta" -> ((s, dir) => {
      // opaque-binary metadata pattern (the multimodal plumbing, minus
      // codecs): utf-8 bytes stand in for media blobs — byte length, header
      // bytes, and a "frame" slice at a fixed offset, all hex-rendered
      val bin = encode(col("text"), "UTF-8")
      Pipelines.table(s, dir, "documents").select(
        col("doc_id"),
        length(bin).as("n_bytes"),
        substring(hex(bin), 1, 16).as("head_hex"),
        substring(hex(bin), 33, 16).as("frame_hex"))
    }),
    "q_dedup_exact" -> ((s, dir) =>
      Dedup.exact(Pipelines.table(s, dir, "documents"), "doc_id", "text")),
    "q_jaccard_verify" -> ((s, dir) => {
      // the full candidate-then-verify dedup pipeline: banded LSH recall
      // pass, then exact token-set Jaccard precision pass on candidates only
      val docs = Pipelines.table(s, dir, "documents")
      val pairs = Dedup.minHashLshPairs(docs, "doc_id", "text",
        shingleK = 3, numHashes = 12, bands = 4)
      Dedup.ngramJaccard(docs, pairs, "doc_id", "text", n = 1)
    }),
    "q_dedup_clusters" -> ((s, dir) =>
      // terminal dedup deliverable: LSH recall -> exact-Jaccard precision ->
      // connected components; survivor = row with doc_id == cluster_id
      Dedup.clusters(Pipelines.table(s, dir, "documents"), "doc_id", "text",
        shingleK = 3, numHashes = 12, bands = 4, jaccardThreshold = 0.6)),
    "q_doc_quality" -> ((s, dir) =>
      TextAnalysis.qualityFiltered(Pipelines.table(s, dir, "documents"))
        .select(col("doc_id"), col("quality_score"), col("n_tokens"))),
    "q_corpus_curation" -> ((s, dir) =>
      // the composed terminal deliverable: quality gate -> dedup among the
      // clean set -> one survivor per component + deterministic shard
      Curation.curate(Pipelines.table(s, dir, "documents"), "doc_id", "text",
        nShards = 8)),
    "q_token_stats" -> ((s, dir) =>
      TextAnalysis.withTokenStats(Pipelines.table(s, dir, "documents"))
        .select(col("doc_id"), col("n_tokens"), col("n_chars_seen"), col("n_stopwords"),
          col("stopword_ratio"), col("avg_token_len"))),
    // — corpus shaping: caps / sampling / repetition / packing (CorpusOps) —
    "q_group_cap" -> ((s, dir) =>
      // per-group document cap (the per-domain/per-language cap of a web
      // curation run); skew-aware: only over-cap groups enter the window
      CorpusOps.capPerGroup(Pipelines.table(s, dir, "documents"),
        "doc_id", "lang", cap = 100)),
    "q_sample_stratified" -> ((s, dir) =>
      // deterministic rate sampling per stratum: downsample the dominant
      // language (en → 10%), halve zh, keep the rest — map-only on the scan
      CorpusOps.stratifiedSample(Pipelines.table(s, dir, "documents"),
        "doc_id", "lang", rates = Seq("zh" -> 500, "en" -> 100), defaultPermille = 1000)
        .select(col("doc_id"), col("lang"))),
    "q_repetition" -> ((s, dir) =>
      CorpusOps.repetitionStats(Pipelines.table(s, dir, "documents"), "doc_id", "text")),
    "q_pack_sequences" -> ((s, dir) =>
      CorpusOps.packSequences(Pipelines.table(s, dir, "documents"),
        "doc_id", "text", budget = 2048L, nShards = 8)),
    "q_embed_similar" -> ((s, dir) =>
      Similarity.nearDupPairs(Pipelines.table(s, dir, "embeddings"),
        "vec_id", "embedding", blockCol = "label", threshold = 0.4)),
    "q_similarity_topk" -> ((s, dir) => {
      val emb = Pipelines.table(s, dir, "embeddings")
      Similarity.bruteForceTopK(
        emb.filter(col("vec_id") =!= 0), "vec_id", "embedding",
        queryDf = emb.filter(col("vec_id") === 0), k = 10)
    }),
    "q_ann_lsh" -> ((s, dir) => {
      val emb = Pipelines.table(s, dir, "embeddings")
      Similarity.lshTopK(
        emb.filter(col("vec_id") =!= 0), "vec_id", "embedding",
        queryDf = emb.filter(col("vec_id") === 0), k = 10, bits = 4, seed = 42L)
    }),
    "q_ann_ivf" -> ((s, dir) => {
      val emb = Pipelines.table(s, dir, "embeddings")
      Similarity.ivfTopK(
        emb.filter(col("vec_id") =!= 0), "vec_id", "embedding",
        queryDf = emb.filter(col("vec_id") === 0), k = 10, nlist = 16, nprobe = 4)
    }),
    "q_ann_batch" -> ((s, dir) => {
      // per-query top-k for a query BATCH via the bounded-heap aggregate
      val emb = Pipelines.table(s, dir, "embeddings")
      Similarity.bruteForceTopKBatch(
        emb.filter(col("vec_id") >= 3), "vec_id", "embedding",
        queryDf = emb.filter(col("vec_id") < 3)
          .select(col("vec_id").as("qid"), col("embedding")),
        qidCol = "qid", k = 5)
    }),
    "q_ann_ivf_batch" -> ((s, dir) => {
      val emb = Pipelines.table(s, dir, "embeddings")
      Similarity.ivfTopKBatch(
        emb.filter(col("vec_id") >= 3), "vec_id", "embedding",
        queryDf = emb.filter(col("vec_id") < 3)
          .select(col("vec_id").as("qid"), col("embedding")),
        qidCol = "qid", k = 5, nlist = 16, nprobe = 4)
    }),
    "q_ann_lsh_batch" -> ((s, dir) => {
      val emb = Pipelines.table(s, dir, "embeddings")
      Similarity.lshTopKBatch(
        emb.filter(col("vec_id") >= 3), "vec_id", "embedding",
        queryDf = emb.filter(col("vec_id") < 3)
          .select(col("vec_id").as("qid"), col("embedding")),
        qidCol = "qid", k = 5, bits = 4, seed = 42L)
    }),

    // — model-artifact export, now VALUE-oracled: QuantLR's quantized-GD
    //   trainer produces bit-identical coefficients in Spark and DuckDB
    //   (the round-3 no_oracle row; solver-trained LR stays in ml.Models
    //   for the sklearn-analog evaluation runs) —
    "q_feature_importance" -> ((s, dir) => {
      // slot grain: purchase_yn keeps both classes at every SF (entity-grain
      // saturates to all-1 once every user has bought something)
      graft.ml.QuantLR.featureImportance(Pipelines.slots(s, dir),
        Seq("view_count", "click_count", "signup_count"), "purchase_yn", topK = 3)
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_calendar_slots" -> OracleSql.qCalendarSlots,
    "q_slot_clean" -> OracleSql.qSlotClean,
    "q_entity_stats" -> OracleSql.qEntityStats,
    "q_entity" -> OracleSql.qEntity,
    "q_entity_features" -> OracleSql.qEntityFeatures,
    "q_sessionize" -> OracleSql.qSessionize,
    "q_running_stats" -> OracleSql.qRunningStats,
    "q_lag_lead" -> OracleSql.qLagLead,
    "q_asof_join" -> OracleSql.qAsofJoin,
    "q_tumbling_hour" -> OracleSql.qTumblingHour,
    "q_sliding_stats" -> OracleSql.qSlidingStats,
    "q_topk_per_group" -> OracleSql.qTopkPerGroup,
    "q_pit_backfill" -> OracleSql.qPitBackfill,
    "q_asof_windowed" -> OracleSql.qAsofJoin,
    "q_asof_bcast" -> OracleSql.qAsofJoin,
    "q_asof_scalable" -> OracleSql.qAsofJoin,
    "q_asof_planned" -> OracleSql.qAsofJoin,
    "q_iqr_clip" -> OracleSql.qIqrClip,
    "q_variance_screen" -> OracleSql.qVarianceScreen,
    "q_label_encode" -> OracleSql.qLabelEncode,
    "q_stratified_folds" -> OracleSql.qStratifiedFolds,
    "q_interactions" -> OracleSql.qInteractions,
    "q_ts_parse" -> OracleSql.qTsParse,
    "q_top_entities" -> OracleSql.qTopEntities,
    "q_json_extract" -> OracleSql.qJsonExtract,
    "q_standard_scale" -> OracleSql.qStandardScale,
    "q_salted_agg" -> OracleSql.qSaltedAgg,
    "q_scan_agg" -> OracleSql.qScanAgg,
    "q_join_broadcast" -> OracleSql.qJoinBroadcast,
    "q_join_fact" -> OracleSql.qJoinFact,
    "q_join_semi" -> OracleSql.qJoinSemi,
    "q_join_anti" -> OracleSql.qJoinAnti,
    "q_confusion" -> OracleSql.qConfusion,
    "q_binary_metrics" -> OracleSql.qBinaryMetrics,
    "q_auc_roc" -> OracleSql.qAucRoc,
    "q_pr_curve" -> OracleSql.qPrCurve,
    "q_auc_pr" -> OracleSql.qAucPr,
    "q_calibration" -> OracleSql.qCalibration,
    "q_threshold_scan" -> OracleSql.qThresholdScan,
    "q_impute" -> OracleSql.qImpute,
    "q_fingerprint" -> OracleSql.qFingerprint,
    "q_simhash" -> OracleSql.qSimHash,
    "q_lang_id" -> OracleSql.qLangId,
    "q_minhash_sig" -> OracleSql.qMinHashSig,
    "q_lsh_pairs" -> OracleSql.qLshPairs,
    "q_dedup_exact" -> OracleSql.qDedupExact,
    "q_dedup_clusters" -> OracleSql.qDedupClusters,
    "q_jaccard_verify" -> OracleSql.qJaccardVerify,
    "q_binary_meta" -> OracleSql.qBinaryMeta,
    "q_token_stats" -> OracleSql.qTokenStats,
    "q_doc_quality" -> OracleSql.qDocQuality,
    "q_similarity_topk" -> OracleSql.qSimilarityTopk,
    "q_ann_lsh" -> OracleSql.qAnnLsh,
    "q_ann_ivf" -> OracleSql.qAnnIvf,
    "q_embed_similar" -> OracleSql.qEmbedSimilar,
    "q_feature_importance" -> OracleSql.qFeatureImportance,
    "q_corpus_curation" -> OracleSql.qCorpusCuration,
    "q_ann_batch" -> OracleSql.qAnnBatch,
    "q_ann_ivf_batch" -> OracleSql.qAnnIvfBatch,
    "q_ann_lsh_batch" -> OracleSql.qAnnLshBatch,
    "q_group_cap" -> OracleSql.qGroupCap,
    "q_sample_stratified" -> OracleSql.qSampleStratified,
    "q_repetition" -> OracleSql.qRepetition,
    "q_pack_sequences" -> OracleSql.qPackSequences,
    "q_rollup" -> OracleSql.qRollup,
    "q_range_join" -> OracleSql.qRangeJoin,
    "q_unpivot" -> OracleSql.qUnpivot
  )
}
