"""Benchmark harness: runs the headline query suite at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}}.

Each query is materialized with a ``noop``-format write: every output column
is fully computed (a bare ``count()`` would let Catalyst prune projection-only
work out of the timed region) but nothing is collected to the driver or
written to disk.  The cache is cleared between queries so each timing is
cold-cache and independent of suite order.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from spark_spotify.registry import QUERIES  # noqa: E402
from spark_spotify.session import get_spark  # noqa: E402

BENCH_QUERIES = [
    "etl_silver_clean",
    "etl_fact_star",
    "etl_daily_stats",
    "ana_heatmap",
    "ana_period_ratio",
    "ana_loyalty",
    "ana_sankey",
    "ana_sessionize",
    "rel_pricing_summary",
    "rel_star_revenue",
    "rel_top_parts",
    "rel_customer_setops",
    "text_stats",
    "text_dedup_exact",
    "sim_ann_cosine_topk",
    "sim_ann_lsh_topk",
    "op_merge_upsert",
    "op_asof_purchase",
    "ana_behavior_radar",
    "ana_value_percentiles",
    "dedup_minhash_near_dups",
    "dedup_simhash_near_dups",
    "dedup_ngram_jaccard",
    "ana_monthly_discovery",
    "ana_audio_daily_stats",
    "ana_genre_explode",
    "ana_today_listening",
    "ana_top_artists_month",
    "dedup_emb_cosine",
    "text_fingerprint",
    "text_token_regex",
    "mm_media_decode",
    "mm_media_resize",
    "mm_frame_sample",
    "stream_hourly_rollup",
    "stream_sessions",
    "stream_dedup",
    "ana_treemap_norm",
    "agg_rollup_revenue",
    "agg_decayed_popularity",
    "op_salted_segment_value",
    "ana_segment_split",
    "sim_ann_ivf_topk",
    "sim_label_cohesion",
    "agg_approx_distinct",
    "curate_split_assign",
    "curate_stratified_sample",
    "curate_ngram_topk",
    "rel_value_range_join",
    "ana_rolling_value_7d",
    "ana_gap_fill",
    "ana_ab_test",
    "dedup_cluster_assign",
    "stream_user_profile",
    "ana_props_json",
    "etl_scd2_user_state",
    "rel_click_purchase_full",
    "agg_grouping_sets_sales",
    "ana_user_value_deciles",
    "curate_keep_canonical",
    "op_bucketed_join",
    "stream_merge_sink",
    "stream_merge_mor",
    "stream_drift_monitor",
    "stream_txn_sink",
    "stream_mor_delete",
    "sim_ann_cosine_pandas",
    "text_pii_scan",
    "text_pii_redact",
    "text_repetition",
    "curate_decontaminate",
    "sim_quantize_int8",
    "curate_chunk_windows",
    "curate_pack_bins",
    "ana_funnel",
    "text_quality_gate",
    "curate_domain_mix",
    "etl_quality_report",
    "ana_retention_cohorts",
    "ana_anomaly_zscore",
    "mm_audio_energy",
    "text_vocab_build",
    "text_unigram_logprob",
    "rel_local_supplier_volume",
    "ana_day_code_profile",
    "text_char_entropy",
    "rel_small_qty_revenue",
    "sim_pq_audit",
    "ana_nullable_dim_profile",
    "sim_kmeans_step",
    "sim_kmeans_train",
    "sim_hard_negatives",
    "text_bm25_topk",
    "dedup_incremental",
    "ana_pivot_day_period",
    "ana_top_users",
    "ana_weekly_delta",
    "dedup_doc_verdict",
    "dedup_minhash_signature",
    "etl_date_dim",
    "etl_event_type_dim",
    "etl_incremental_pipeline",
    "etl_watermark",
    "rel_customers_big_order",
    "rel_customers_no_urgent",
    "rel_segment_orders",
    "rel_segment_stats",
    "text_lang_id",
    "text_lang_profile",
    "curate_release_manifest",
    "sim_ann_batch_topk",
    "agg_cube_sales",
    "text_tfidf_topk",
    "stream_enrich_join",
    "stream_sliding_rollup",
    "stream_click_purchase",
    "stream_click_attribution",
    "op_partitioned_prune",
    "ana_unpivot_metrics",
    "ana_value_histogram",
    "curate_mix_epochs",
    "text_bigram_logprob",
    "text_collocation_pmi",
    "mm_payload_dedup",
    "sim_ann_lsh_multiprobe",
    "etl_snapshot_diff",
    "ana_pivot_first_reindex",
    "stream_late_data",
    "dedup_semantic",
    "text_quality_lr",
    "curate_global_shuffle",
    "sim_recall_audit",
    "op_bloom_prune_join",
    "agg_approx_percentile",
    "etl_time_travel",
    "text_bpe_merge_step",
    "ana_json_malformed_audit",
    "sim_ann_ivfpq_topk",
    "etl_compact",
    "mm_phash_neardup",
    "etl_schema_evolution",
    "sim_pandas_exact_agreement",
    "stream_dlq",
    "etl_row_delete",
    "etl_partition_delete",
    "etl_delete_vectors",
    "etl_merge_evolve",
    "etl_type_widening",
    "etl_bloom_skipping",
    "etl_bloom_maintenance",
    "etl_in_list_skipping",
    "etl_cdf_mor_delete",
    "etl_row_tracking",
    "etl_merge_cow",
    "etl_merge_mor",
    "etl_merge_not_by_source",
    "etl_merge_full",
    "etl_schema_drop",
    "etl_time_travel_ts",
    "etl_partition_evolution",
    "etl_profile_columns",
    "etl_profile_drift",
    "agg_heavy_hitters",
    "agg_exact_median",
    "graph_triangle_count",
    "graph_label_propagation",
    "graph_khop_reach",
    "agg_exact_quartiles",
    "op_asof_join",
    "etl_vacuum",
    "etl_schema_rename",
    "etl_wap_publish",
    "etl_cluster_layout",
    "etl_history",
    "agg_hll_rollup",
    "etl_expectations",
    "agg_hll_rolling_7d",
    "sim_ann_prefilter_topk",
    "etl_zorder_layout",
    "graph_pagerank_step",
    "graph_pagerank_iter",
    "mm_media_release",
    "etl_change_feed_rows",
    "etl_cdf_row_lineage",
    "etl_cdf_apply",
    "etl_agg_incremental",
    "etl_mv_delta_apply",
    "etl_cdc_merge_apply",
    "op_partition_overwrite",
    "src_csv_ingest_audit",
    "stream_resume",
    "etl_data_skipping",
    "etl_restore",
    "etl_constraints",
    "agg_kmv_set_ops",
    "dedup_paragraph",
    "dedup_substring",
    "text_bpe_train",
    "text_bpe_tokenize",
    "text_unigram_train",
    "text_unigram_tokenize",
    "stream_cdf_follow",
    "rel_nation_trade_flows",
    "etl_generated_columns",
    "etl_optimize_small_files",
    "etl_optimize_where",
    "etl_txn_multi_table",
    "op_dpp_join",
    "etl_clone",
    "curate_pack_bpe",
    "sim_ann_maintained",
    "dedup_incremental_maintained",
    "etl_optimize_zorder",
    "stream_cdf_row_follow",
    "mm_real_decode",
    "sim_ann_maintained_delete",
    "sim_ann_partition_prune",
    "stream_ann_maintain",
    "dedup_band_lookup",
    "sim_ann_index_optimize",
    "sim_ann_ivf_multiprobe",
    "rel_ship_priority",
    "rel_big_order_customers",
    "curate_dataset_card",
    "curate_k_anonymity",
    "ana_resample_ohlc",
    "sim_matryoshka_audit",
    "etl_refs",
    "etl_clone_deep",
    "rel_late_shippers",
    "rel_top_supplier_share",
    "sim_ann_pq_maintained",
    "dedup_index_delete",
    "stream_expectations",
    "agg_count_min",
    "etl_zorder_incremental",
    "sim_ann_maintained_scaled",
    "sim_ann_retrain",
    "stream_ann_retrain_swap",
    "rel_customer_order_histogram",
    "rel_idle_rich_customers",
    "rel_disjunctive_revenue",
    "rel_min_price_supplier",
    "rel_sole_late_shipper",
    "sim_ann_drift_monitor",
    "sim_bq_hamming",
    "sim_rrf_fusion",
    "stream_auto_optimize",
    "rel_returned_item_customers",
    "rel_promo_revenue_share",
    "rel_nation_market_share",
    "curate_sample_maintained",
    "mm_jpeg_roundtrip",
    "mm_avi_demux",
    "mm_mjpeg_decode",
    "rel_small_order_revenue",
    "rel_surplus_suppliers",
    "rel_part_type_profit",
    "rel_top_value_parts",
    "rel_priority_shipflag",
    "rel_supplier_count_by_part",
    "stream_ann_auto_retrain",
]


def _calibrate(spark) -> float:
    """Fixed ambient-load probe: one data-independent JVM job (a pure
    CPU sum over a generated range, no IO, no shuffle reduction beyond
    one scalar) timed best-of-2.  The host shows 2-4x external load
    swings (two r8 records measured the SAME suite 395 s vs 319 s, 20
    minutes apart, zero commits between); this row makes every record
    self-normalizing — divide a query's timing by the record's own
    calibration to compare across records taken under different ambient
    load."""
    import time as _t

    best = float("inf")
    for _ in range(2):
        t0 = _t.perf_counter()
        spark.range(0, 400_000_000, 1, 32).selectExpr(
            "sum(id * 3 + 7) as s"
        ).collect()
        best = min(best, _t.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0  # non-standard dir name (e.g. the 10x scale probe)
    spark = get_spark("spark_spotify_bench")

    # JVM/codegen warmup outside the timed region
    QUERIES["etl_watermark"](spark, sf_dir).collect()
    loadavg_pre = list(os.getloadavg())
    calib_pre = _calibrate(spark)

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        # best-of-2: the min discards external machine noise (this host
        # shows 2-4x load swings from outside the VM) and reports the
        # steady-state plan cost; run 1 still pays codegen so a query whose
        # ONLY cost is compile can't hide
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            # isolate queries from each other: unpersist everything, drop
            # the memory-sink views streaming queries register (they pin
            # their results in driver memory), and pay GC debt OUTSIDE the
            # timed region so one query's garbage never bills the next
            spark.catalog.clearCache()
            for tbl in spark.catalog.listTables():
                if tbl.isTemporary:
                    spark.catalog.dropTempView(tbl.name)
            # Python gc BEFORE JVM gc: py4j handles on dropped DataFrames
            # pin their JVM plans (and any localCheckpoint blocks) until
            # the Python side collects, so System.gc alone frees nothing
            import gc

            gc.collect()
            spark.sparkContext._jvm.System.gc()
        timings[name] = round(best, 3)

    calib_post = _calibrate(spark)
    loadavg_post = list(os.getloadavg())

    # serve-only timings for the maintained-index family: construction
    # (the multi-commit warehouse drill) runs UNTIMED in the factory;
    # only the serving query over the maintained artifacts is timed —
    # the split SCALE.md argues in prose, recorded as data per record
    from spark_spotify.analytics.maintained import (
        SERVE_ALIASES,
        serve_factories,
    )

    by_factory: dict[str, float] = {}
    for key, factory in serve_factories().items():
        serve, cleanup = factory(spark, sf_dir)
        try:
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                serve().write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            by_factory[key] = round(best, 3)
        finally:
            cleanup()
        spark.catalog.clearCache()
    serve_only = {
        name: by_factory[key] for name, key in SERVE_ALIASES.items()
    }

    total = round(sum(timings.values()), 3)
    # One JSON line, compact separators, flushed, and NOTHING printed to
    # stdout after it: round 9's record was lost to the driver's tail
    # capture truncating the head of a ~12 KB line — compact separators
    # shave ~25% off the line, and keeping it the LAST stdout bytes
    # guarantees a tail capture of any size preserves its tail-end (the
    # sf/calibration blocks) while the full line is what the driver
    # parses when the buffer is big enough (VERDICT r10 #4).
    print(
        json.dumps(
            {
                "metric": "suite_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "calibration": {
                    "job_sec_pre": calib_pre,
                    "job_sec_post": calib_post,
                    "loadavg_pre": [round(x, 2) for x in loadavg_pre],
                    "loadavg_post": [round(x, 2) for x in loadavg_post],
                },
                "serve_only": serve_only,
            },
            separators=(",", ":"),
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
