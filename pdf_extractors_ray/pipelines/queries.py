"""Driver-facing query registry.

``REGISTRY`` maps query name → (callable(sf_dir) → Dataset, oracle SQL or
None). SQL-checked entries run against the DuckDB views the driver
registers over the same parquet tables; column names match exactly.
Transcript-extraction entries have no SQL equivalent (ordered stateful
folds) → rows-only checks, verified instead by the engine-vs-oracle pytest
gate (tests/test_engine_vs_oracle.py).
"""

from __future__ import annotations

from ..ops import dedup, events, relational, similarity, surrogate
from ..ops import multimodal as mm
from ..ops import text as tx
from ..sources.transcripts import boxes_path_for_sf, transcripts_path_for_sf
from . import extract


def _salted_invoice_query(sf_dir: str):
    from ..stages.salted import extract_invoice_salted

    return extract_invoice_salted(transcripts_path_for_sf(sf_dir))


def _salted_catalog_query(sf_dir: str):
    from ..stages.salted_catalog import extract_catalog_salted

    return extract_catalog_salted(transcripts_path_for_sf(sf_dir))


def _partitioned_metrics_query(sf_dir: str):
    """Headline production path at this sf: single-pass all-family
    checkpointed extraction; returns the per-partition lineage metrics."""
    import os

    from ..state.lineage import partitioned_extract_all_tasks

    path = transcripts_path_for_sf(sf_dir)
    out_root = path.rstrip("/") + "_extracted"
    return partitioned_extract_all_tasks(path, out_root, n_parts=32)


def _box_query(family: str):
    """Detector-path query over the raw-box fixture corpus (S8/M40/M41)."""

    def run(sf_dir: str):
        path = boxes_path_for_sf(sf_dir)
        return extract.EXTRACTORS[family](path)

    run.__name__ = f"extract_{family}"
    return run


def _transcript_query(family: str):
    def run(sf_dir: str):
        path = transcripts_path_for_sf(sf_dir)
        return extract.EXTRACTORS[family](path)

    run.__name__ = f"extract_{family}"
    return run


# name → (fn, oracle_sql | None)
REGISTRY: dict[str, tuple] = {
    # relational core (SQL-checked)
    "q1_pricing_summary": (relational.q1_pricing_summary, relational.Q1_SQL),
    "q3_segment_topk": (relational.q3_segment_topk, relational.Q3_SQL),
    "q5_nation_revenue": (relational.q5_nation_revenue, relational.Q5_SQL),
    "q6_filtered_revenue": (relational.q6_filtered_revenue, relational.Q6_SQL),
    "orders_priority_count": (relational.orders_priority_count, relational.ORDERS_PRIORITY_SQL),
    "orders_topk_per_customer": (relational.orders_topk_per_customer, relational.ORDERS_TOPK_SQL),
    "events_distinct_users": (relational.events_distinct_users, relational.EVENTS_DISTINCT_SQL),
    "orders_by_month": (relational.orders_by_month, relational.ORDERS_BY_MONTH_SQL),
    "customer_topk_balance": (relational.customer_topk_balance, relational.CUSTOMER_TOPK_SQL),
    "supplier_per_nation": (relational.supplier_per_nation, relational.SUPPLIER_PER_NATION_SQL),
    # event streams (SQL-checked)
    "events_hourly": (events.events_hourly, events.EVENTS_HOURLY_SQL),
    "events_sessionize": (events.events_sessionize, events.EVENTS_SESSIONIZE_SQL),
    "events_props_k": (events.events_props_k, events.EVENTS_PROPS_K_SQL),
    "events_running_total": (events.events_running_total, events.EVENTS_RUNNING_SQL),
    "events_sliding": (events.events_sliding, events.EVENTS_SLIDING_SQL),
    # text analysis (SQL-checked where expressible)
    "docs_token_stats": (tx.docs_token_stats, tx.DOCS_TOKEN_STATS_SQL),
    "docs_quality": (tx.docs_quality, tx.DOCS_QUALITY_SQL),
    "docs_fingerprint": (tx.docs_fingerprint, tx.DOCS_FINGERPRINT_SQL),
    "docs_keyword": (tx.docs_keyword, tx.DOCS_KEYWORD_SQL),
    "docs_bpe_tokens": (tx.docs_bpe_tokens, tx.DOCS_BPE_TOKENS_SQL),
    "docs_langid": (tx.docs_langid, None),
    # dedup suite
    "docs_exact_dedup": (dedup.exact_dedup, dedup.EXACT_DEDUP_SQL),
    "docs_minhash_lsh": (dedup.minhash_lsh_pairs, None),
    "docs_simhash": (dedup.simhash_docs, None),
    "docs_simhash_pairs": (dedup.simhash_pairs, None),
    "docs_ngram_jaccard": (dedup.ngram_jaccard_groups, None),
    "docs_dup_clusters": (dedup.dup_clusters, None),
    # similarity search
    "emb_knn_bruteforce": (similarity.knn_bruteforce, similarity.KNN_SQL),
    "emb_ann_lsh": (similarity.ann_lsh, None),
    "emb_ivf_knn": (similarity.ivf_knn, None),
    "emb_dup_pairs": (similarity.emb_dup_pairs, similarity.EMB_DUP_PAIRS_SQL),
    # multimodal plumbing (stubbed decode kernel)
    "media_features": (mm.media_features, None),
    "media_thumbnails": (mm.media_thumbnails, None),
    "media_frames": (mm.media_frames, None),
    # extraction-kernel surrogates (SQL-checked): the per-turn extraction
    # kernels pinned to DuckDB over rendered inputs (ops/surrogate.py)
    "extract_kernel_invoice_bank": (surrogate.extract_kernel_invoice_bank, surrogate.EXTRACT_KERNEL_INVOICE_SQL),
    "extract_kernel_boilerplate": (surrogate.extract_kernel_boilerplate, surrogate.EXTRACT_KERNEL_BOILERPLATE_SQL),
    "extract_kernel_oilcodes": (surrogate.extract_kernel_oilcodes, surrogate.EXTRACT_KERNEL_OILCODES_SQL),
    "extract_kernel_household_key": (surrogate.extract_kernel_household_key, surrogate.EXTRACT_KERNEL_HOUSEHOLD_KEY_SQL),
    "extract_kernel_broken_flag": (surrogate.extract_kernel_broken_flag, surrogate.EXTRACT_KERNEL_BROKEN_FLAG_SQL),
    "extract_kernel_member_coders": (surrogate.extract_kernel_member_coders, surrogate.EXTRACT_KERNEL_MEMBER_CODERS_SQL),
    # transcript extraction families (rows-only; oracle = pytest gate)
    "extract_catalog": (_transcript_query("catalog"), None),
    "extract_layout_broadcast": (_transcript_query("layout_broadcast"), None),
    "extract_invoice": (_transcript_query("invoice"), None),
    "extract_invoice_salted": (_salted_invoice_query, None),
    "extract_catalog_salted": (_salted_catalog_query, None),
    "extract_layout": (_transcript_query("layout"), None),
    "extract_table": (_transcript_query("table"), None),
    "extract_grid": (_transcript_query("grid"), None),
    "extract_census_households": (_transcript_query("census_households"), None),
    "extract_census_summary": (_transcript_query("census_summary"), None),
    "extract_census_persons": (_transcript_query("census_persons"), None),
    # detector paths from RAW word boxes (S8/M40/M41; rows-only — the
    # oracle is the pytest engine-vs-oracle + reference differentials)
    "extract_layout_detected": (_box_query("layout_detected"), None),
    "extract_table_detected": (_box_query("table_detected"), None),
    "extract_grid_detected": (_box_query("grid_detected"), None),
    "extract_grid_crops": (_box_query("grid_crops"), None),
    "extract_all_partitioned_metrics": (_partitioned_metrics_query, None),
}


def queries() -> dict:
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
