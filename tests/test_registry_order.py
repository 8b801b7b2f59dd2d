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

# Round-5 rotation (VERDICT r4 item 1): q_video_demux (only query with
# zero driver rows ever) first, then the canon queries whose
# library+oracle were edited in r4 outside the r4 window, then
# q_frame_sample/q_audio_features (code/corpus edited in r5), then the
# whole remaining pass-r3 block as regression canaries.  The 5 entries
# left out (q_extract_number, q_substring_before, q_json_envelope,
# q_safe_cast, q_run_stamp) have r3 driver evidence and code verifiably
# untouched since (empty `git log -L` over 087fb30..HEAD).
DRIVER_WINDOW = [
    "q_video_demux", "q_url_canon_full", "q_url_canon", "q_surt_index",
    "q_sitemap_extract", "q_snapshot_diff", "q_frame_sample",
    "q_audio_features", "q_extract_office", "q_schema_last", "q_page_url",
    "q_html_strip", "q_robots_gate", "q_robots_rfc_gate", "q_json_decode",
    "q_partitioned_write", "q_frontier_expand", "q_max_page", "q_equi_join",
    "q_broadcast_join", "q_group_collect", "q_union_all", "q_filter_nonempty",
    "q_crawl_delay_schedule", "q_pacing_schedule", "q_redirect_resolve",
    "q_pagerank_hosts", "q_authority_order", "q_anchor_text",
    "q_content_sniff", "q_distinct_urls", "q_distinct_urls_approx",
    "q_asof_join", "q_interval_join", "q_shard_pack", "q_salted_join",
    "q_window_dedup", "q_semi_join", "q_lag_delta", "q_dedup_exact",
    "q_fingerprint", "q_token_count", "q_quality_score", "q_lang_id",
    "q_shingle_stats", "q_knn_per_vec", "q_embedding_lsh_topk",
    "q_embedding_neardup", "q_knn_ivf", "q_image_decode_meta",
]


def test_window_is_pinned():
    assert list(contract.QUERIES)[:50] == DRIVER_WINDOW


def test_entry_module_preserves_order():
    assert list(entry_mod.queries())[:50] == DRIVER_WINDOW


def test_every_oracle_key_is_registered():
    missing = set(contract.ORACLES) - set(contract.QUERIES)
    assert not missing, f"oracles without a registered query: {sorted(missing)}"


def test_window_queries_exist_and_mostly_oracle_backed():
    # 42 of the 50 window slots are oracle-backed; the 8 rows-only
    # queries (multimodal + declared no-oracle-by-design) are the
    # exceptions.
    rows_only = {n for n in DRIVER_WINDOW if n not in contract.ORACLES}
    assert rows_only == {
        "q_video_demux", "q_frame_sample", "q_audio_features",
        "q_partitioned_write", "q_distinct_urls_approx",
        "q_embedding_lsh_topk", "q_knn_ivf", "q_image_decode_meta",
    }
