"""Pin the driver-check window (VERDICT r3 item 8).

The round driver oracle-checks only the FIRST 50 entries of
``queries()``; a careless registry edit can silently evict coverage
(exactly what round 3's reordering did to the training-data block).
This test freezes the window so any change to the first 50 slots is a
deliberate, reviewed edit of BOTH files.
"""

from __future__ import annotations

import __spark_entry__ as entry_mod
from crawler_spark import contract

# Round-4 rotation: 28 never-driver-checked oracle-backed queries, the 3
# oracles upgraded from rows-only in r3, the fixed q_rollup, the 7
# never-checked rows-only multimodal queries, then 11 previously-green
# regression canaries spanning every subsystem.
DRIVER_WINDOW = [
    "q_histogram", "q_corpus_filter", "q_chunk_dedup", "q_boilerplate",
    "q_pii_scrub", "q_source_quality", "q_trap_detect", "q_mirror_hosts",
    "q_recrawl_schedule", "q_domain_cap", "q_crawl_budget", "q_decontaminate",
    "q_outlink_extract", "q_weighted_sample", "q_inverted_index",
    "q_cluster_canonical", "q_percentiles", "q_heavy_hitters", "q_bigram_topk",
    "q_repetition_ratio", "q_lm_score", "q_substring_dedup", "q_tfidf_topk",
    "q_train_split", "q_stratified_sample", "q_dup_clusters",
    "q_neardup_dedup", "q_incremental_neardup", "q_minhash_neardup",
    "q_simhash_neardup", "q_rolling_fingerprint", "q_rollup", "q_image_psnr",
    "q_pair_quality", "q_image_quality_gate", "q_image_phash_neardup",
    "q_image_phash_clusters", "q_audio_features", "q_frame_sample",
    "q_crawl_round", "q_anti_join_dedup", "q_cuckoo_dedup", "q_order_by",
    "q_host_budget_topk", "q_time_rollup", "q_metrics_counts",
    "q_ngram_jaccard", "q_embedding_topk", "q_sessionize", "q_pivot",
]


def test_window_is_pinned():
    assert list(contract.QUERIES)[:50] == DRIVER_WINDOW


def test_entry_module_preserves_order():
    assert list(entry_mod.queries())[:50] == DRIVER_WINDOW


def test_every_oracle_key_is_registered():
    missing = set(contract.ORACLES) - set(contract.QUERIES)
    assert not missing, f"oracles without a registered query: {sorted(missing)}"


def test_window_queries_exist_and_mostly_oracle_backed():
    # 43 of the 50 window slots are oracle-backed; the 7 rows-only
    # multimodal queries are the declared exceptions.
    rows_only = {n for n in DRIVER_WINDOW if n not in contract.ORACLES}
    assert rows_only == {
        "q_image_psnr", "q_pair_quality", "q_image_quality_gate",
        "q_image_phash_neardup", "q_image_phash_clusters",
        "q_audio_features", "q_frame_sample",
    }
