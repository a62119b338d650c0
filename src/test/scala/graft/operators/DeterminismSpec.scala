package graft.operators

import graft.{SparkEntry, SparkSpec}

/** Re-running a query must produce the identical result — ordering
  * bugs are the reference's own #1 historical correctness hazard
  * (BENCHMARK-REPORT.md §3), and the oracle gate hashes values, so any
  * nondeterministic limit/tie would flap. Sample the query families
  * that involve ties, windows, driver-side stages, or iteration.
  */
class DeterminismSpec extends SparkSpec {

  private val sampled = Seq(
    "q_topk", "q_window_latest", "q_knn_cosine", "q_knn_batch",
    "q_dedup_minhash_lsh", "q_consolidate_merge", "q_rrf_fusion",
    "q_feedback_rerank", "q_mmr_rerank", "q_ann_ivf_probe",
    "q_compress_topthird", "q_token_budget",
    "q_entity_detect", "q_graph_paths", "q_crossencoder_rerank",
    // Contract queries with ties, windows, or driver-side greedy loops.
    "q_prompt_projection", "q_cross_verify", "q_per_type_scores",
    // Round-5 additions: in-query BPE training (vocab job + driver
    // merge loop) and the mapPartitions media paths (image decode,
    // WAV synthesize + header parse).
    "q_token_budget_bpe", "q_multimodal_decode", "q_audio_roundtrip",
    // Round-6 pipeline-prep additions: gram-join decontamination and
    // windowed sequence packing (hash sampling is partition-invariant
    // by construction, covered in PipelinePrepSpec).
    "q_decontaminate", "q_pack_sequences", "q_boilerplate_strip",
    // Mixture resampling explodes hash-fractional copies; the split
    // assignment is pure-hash (both must re-run bit-identical).
    "q_mixture_resample", "q_train_split",
    // Round-8 additions: iterative Lloyd training (rounded argmin +
    // rounded centroid updates must re-run bit-identical), the
    // selection pack's windows/thresholds, and the layout audit.
    "q_kmeans_train", "q_dsir_select", "q_semantic_dedup",
    "q_dedup_canonical", "q_zorder_layout",
    // Round-8 second wave: driver-side bloom bitmap build, ln-keyed
    // two-stage windows, cell-probed windows + struct-argmax, and the
    // LSH-pair estimator joins.
    "q_decontaminate_bloom", "q_weighted_sample",
    "q_decontaminate_semantic", "q_minhash_estimate",
    // This session's additions with ties, training loops, shortlists,
    // or compiled kernels: sketch probes, PQ/IVF-PQ shortlist re-ranks,
    // BPE/GD/PageRank iteration, winnow pair generation, KN backoff.
    "q_cms_topk", "q_hll_cardinality", "q_quantile_hist",
    "q_ann_pq", "q_ann_ivfpq", "q_random_projection",
    "q_bpe_train", "q_bpe_compression", "q_logreg_train",
    "q_entity_pagerank", "q_pmi_collocations", "q_dedup_winnow",
    "q_image_phash", "q_gopher_rep", "q_lm_kneser_ney", "q_funnel")

  sampled.foreach { name =>
    test(s"$name is identical across two runs") {
      val fn = SparkEntry.queries(name)
      val a = fn(spark, Sf).collect().toSeq
      val b = fn(spark, Sf).collect().toSeq
      assert(a == b, s"$name differed between runs")
    }
  }
}
