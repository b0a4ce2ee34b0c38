package graft

import org.apache.spark.sql.SparkSession

/** Plan inspector: prints `explain("formatted")` for the named queries (or a
  * headline set) so the physical shapes can be audited — broadcast joins
  * where a side is small, TakeOrderedAndProject for top-k, PushedFilters /
  * ReadSchema pruning at the parquet scans, WholeStageCodegen spans around
  * the expression-heavy operators.
  *
  * Usage: runMain graft.Plans [sfDir] [query ...]
  */
object Plans {
  private val Headline = Seq(
    "q01_pricing_agg", "q02_nation_revenue", "q05_top_orders",
    "q06_segment_filter", "q11_token_stats", "q13_upsert_batches",
    "q20_cosine_topk", "q23_chunk_pypdf", "q25_minhash_sig",
    "q30_ann_brute", "q31_lsh_buckets", "q32_ivf_ann",
    "q39_neardup_lsh", "q49_asof", "q52_ann_multiprobe",
    "q56_sql_dedup", "q58_hash_split", "q60_decontaminate",
    "q65_sessionize", "q66_bm25", "q68_paragraph_dedup",
    "q71_tfidf_keywords", "q72_event_anomaly",
    "q85_span_dedup", "q87_bloom_decontaminate", "q90_edit_distance",
    "q91_countmin", "q92_interval_join", "q93_importance_weights",
    "q94_scd2_versions", "q95_pipeline_e2e", "q101_retrieval_eval",
    "q103_topk_per_group", "q105_semantic_dedup", "q106_zorder_layout",
    "q107_bigram_lm", "q108_dup_pagerank", "q110_bpe_encode",
    "q113_phrase_search", "q114_padded_batches", "q115_containment",
    "q117_funnel", "q118_dedup_survivors", "q119_token_shards",
    "q121_point_in_time", "q124_keyed_interval",
    "q131_span_dedup_apply", "q132_salted_join", "q143_knn_cluster_purity",
    "q147_dup_triangles", "q150_clean_pipeline", "q157_ewma_hourly",
    "q158_ivf_probe_sweep", "q159_exact_quantiles", "q160_join_estimate")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else Headline
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      println(s"\n========== $name ==========")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
