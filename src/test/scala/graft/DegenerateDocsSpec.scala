package graft

import org.apache.spark.sql.functions._

/** Degenerate-row robustness: real 100 TB corpora contain NULL text
  * (failed extraction), empty strings, whitespace-only docs, and
  * single-token stubs. The sf test data contains none of these, so the
  * oracle gate never exercises them — this spec pins the contract
  * directly: every documents-table operator must MATERIALIZE (no
  * throw) and be rerun-deterministic on such a corpus. Semantic
  * choices (e.g. d10 classifying NULL text via a coalesce'd digest)
  * are pinned by their own suites; here the bar is "no operator
  * crashes or flip-flops when the garbage arrives".
  */
class DegenerateDocsSpec extends SparkSpecBase {

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-degen").toString
    Seq(
      (0L, Option.empty[String]),          // NULL text
      (1L, Some("")),                      // empty
      (2L, Some("   \t  ")),               // whitespace only
      (3L, Some("solo")),                  // single token
      (4L, Some("a a a a a a a a a a")),   // pure repetition
      (5L, Option.empty[String]),          // second NULL (pair behavior)
      (6L, Some("the quick brown fox jumps over the lazy dog repeatedly")),
      (7L, Some("the quick brown fox jumps over the lazy dog repeatedly")))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", concat(lit("src"), col("doc_id") % 3))
      .withColumn("n_chars",
        length(coalesce(col("text"), lit(""))).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  // the documents-only surface (embeddings/events/TPC ops don't read text)
  private val docOps = Seq(
    "d01_dedup_exact", "d02_dedup_fingerprint", "d03_dedup_minhash_lsh",
    "d04_dedup_simhash", "d05_ngram_jaccard", "d07_winnow_fingerprint",
    "d08_dedup_groups", "d10_incremental_dedup", "d11_dedup_survivors",
    "t01_token_count", "t02_quality_score", "t03_lang_id", "t04_ngram_freq",
    "t05_bpe_tokens", "t06_token_entropy", "t07_token_familiarity",
    "x01_hash_sample", "x02_stratified_sample", "x03_tfidf", "x04_redact",
    "x05_chunk_pack", "x06_corpus_pipeline", "p01_decontaminate",
    "p02_seq_pack", "p03_domain_mix", "p04_repetition_score",
    "p05_source_overlap", "p06_prep_pipeline", "p06b_prep_pipeline_cached",
    "p07_token_budget", "p08_contamination_attribution",
    "p09_leakage_safe_split", "p10_quality_sample", "m01_binary_meta",
    "m02_feature_extract", "m03_frame_sample", "m04_resize_stub",
    "t08_bigram_lm", "d13_span_dedup", "p12_mix_waterfill",
    "x07_shard_balance", "t09_lexical_diversity", "t10_readability",
    "d14_prefix_dedup", "p14_snapshot_diff", "x08_shard_manifest",
    "p13_curriculum", "m05_chunk_dedup", "t11_keyword_extract",
    "p15_oversample", "x09_data_profile", "p16_length_histogram",
    "t12_zipf_audit", "d15_soft_dedup_weights", "d16_containment_join",
    "d17_bloom_incremental", "p17_datasheet", "p18_kfold_split",
    "x10_compaction_plan", "m06_blob_entropy", "d18_detector_eval",
    "m07_magic_sniff", "p20_filter_ablation", "t14_code_detect",
    "x13_pii_report", "p21_alpha_sampling", "t15_vocab_growth",
    "p22_epoch_plan", "t16_charset_audit", "m08_blob_containment",
    "d19_threshold_sweep", "t17_source_novelty",
    "d20_minhash_calibration", "t18_learned_stopwords",
    "p23_boilerplate_strip", "t19_truncation_loss", "x16_profile_drift",
    "t20_compression_ratio", "d21_multisource_dups", "p24_pack_efficiency",
    "t21_length_outliers", "x19_kanonymity", "m09_payload_profile",
    "p25_perplexity_gate", "t22_encoding_audit", "x20_layout_pruning",
    "d22_dup_inflation", "p26_stratified_sample", "x21_lineage_card",
    "p27_dedup_mix", "t23_casing_profile", "x22_redaction_audit",
    "t24_burstiness", "x23_equidepth_bins", "t25_pmi_collocations",
    "t26_source_divergence", "p28_ipf_reweight", "t27_heldout_perplexity",
    "m10_format_dedup_profile", "x24_sample_bias")

  test("every documents operator materializes and reruns identically on degenerate rows") {
    val failures = docOps.flatMap { name =>
      try {
        val first = run(name, dir).collect().map(_.toString).sorted.toSeq
        val second = run(name, dir).collect().map(_.toString).sorted.toSeq
        if (first == second) None
        else Some(s"$name: rerun differs (${first.size} vs ${second.size} rows)")
      } catch {
        case e: Throwable =>
          Some(s"$name threw: ${e.getClass.getSimpleName} ${e.getMessage}")
      }
    }
    graft.operators.HotCache.releaseAll()
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("the exact-dup pair (docs 6,7) survives the garbage around it") {
    // degenerate neighbors must not poison genuine dedup: 6 and 7 are
    // exact copies and d01/d08 must still pair them
    val d01 = run("d01_dedup_exact", dir).collect()
      .map(_.getAs[Long]("keep_id")).toSet
    assert(!(d01.contains(6L) && d01.contains(7L)),
      s"d01 kept both exact copies: $d01")
    val groups = run("d08_dedup_groups", dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("group_rep")).toMap
    assert(groups.get(6L).isDefined && groups(6L) == groups(7L),
      s"d08 failed to group the exact pair: $groups")
  }
}
