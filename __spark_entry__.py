"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes the implemented operator inventory (SURVEY.md §2 +
the LLM-pipeline operators); ``oracle_sql()`` the matching DuckDB SQL.
EVERY declared query has an oracle entry — the engine-specific hash
families (xxhash64 minhash / simhash / fingerprints, LSH ANN) gained
exact cross-engine oracles in round 2 by pinning a shared hash spec on
both sides.  ``tools/check_oracles.py`` replays the full surface
(row count + column set + order-insensitive value hash per query)
against any sf dir; the committed ``ORACLE_FULL.txt`` is its latest
all-query run.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from powa_archivist_spark.pipeline.queries import PIPELINE_QUERIES  # noqa: E402
from powa_archivist_spark.queries import CORE_QUERIES  # noqa: E402

# The driver's hard correctness gate replays the FIRST 50 entries of
# ``queries()`` (dict insertion order).  Order the registry so that window
# carries a representative cross-section of BOTH layers: ~20 LLM-pipeline
# operators (dedup/ANN/corpus — first-class scope per SURVEY §2.12) and
# ~30 core operators.  The remaining 40 queries follow and stay enforced
# by tests/test_oracle_full.py (full 90-query value-hash replay in pytest).
_GATE_ORDER = [
    # --- core: flagship + snapshot lifecycle + versioned layout ---
    "q01_pricing_summary",
    "q03_top_orders",
    "q05_nation_volume",
    "events_rollup",
    "events_pack_unpack",
    "events_minmax_sketch",
    "constvalues_topk",
    "snapshot_lifecycle_unpack",
    "qualstats_snapshot_topk",
    "wait_sampling_snapshot_resolved",
    "versioned_layout_read",
    "catalog_layout_read",
    "dim_merge_classify",
    # --- core: join family ---
    "events_asof_click",
    "events_interval_join",
    "union_dictionary_join",
    "orders_semi_join",
    "customers_anti_join",
    "latest_order_pick",
    "guaranteed_row_join",
    "events_mru_last_seen",
    # --- core: window / filter / array ---
    "events_diff",
    "events_rate",
    "events_topk_per_group",
    "container_array_ops",
    "events_sessionize",
    # --- pipeline: dedup ---
    "dedup_exact",
    "dedup_jaccard_pairs",
    "dedup_keep_list",
    "dedup_components",
    "dedup_minhash_lsh",
    "dedup_simhash",
    # --- pipeline: similarity / ANN ---
    "knn_cosine_topk",
    "knn_cosine_lsh",
    "knn_cosine_lsh_multiprobe",
    "knn_ivf_topk",
    "emb_near_dup_blocked",
    "emb_semantic_dedup",
    "multimodal_binary_near_dup",
    # --- pipeline: corpus / text ---
    "corpus_dataset_split",
    "corpus_decontam",
    "corpus_pack_sequences",
    "corpus_stratified_sample",
    "text_quality",
    "text_repetition",
    "doc_fingerprints",
    "stream_near_dup_ledger",
    # --- round-6 additions: composition + bloom + index maintenance ---
    "corpus_curation_e2e",
    "corpus_bloom_decontam",
    "ann_index_upsert",
]

_MERGED = {**CORE_QUERIES, **PIPELINE_QUERIES}
_ALL = {name: _MERGED[name] for name in _GATE_ORDER}
_ALL.update({name: spec for name, spec in _MERGED.items() if name not in _ALL})
assert len(_ALL) == len(_MERGED), "gate order references unknown query names"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from powa_archivist_spark.queries import q01_pricing_summary

    return q01_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _oracle) in _ALL.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: oracle for name, (_fn, oracle) in _ALL.items() if oracle is not None
    }
