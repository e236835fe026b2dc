"""Query registry — the engine's declared surface (SURVEY.md §2.C).

Each entry pairs a PySpark plan builder ``(spark, sf_dir) -> DataFrame``
with an ANSI-SQL oracle string DuckDB runs on the same parquet fixtures.
Column names are aliased identically on both sides (the driver's compare
sorts columns by name before hashing).

Determinism rules applied throughout (see ``queries/`` modules):
* every ORDER BY carries a unique tie-break column (the reference leaves
  ties nondeterministic — SURVEY.md §2.B last row);
* floating-point results of arithmetic are ``round``-ed the same way on
  both sides (raw stored doubles pass through unrounded — same bits);
* timestamps are emitted as formatted strings, dates, or extracted ints,
  never raw, to dodge session-timezone representation drift.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query; ``oracle=None`` → driver runs a rows-only check
    (reserved for genuinely non-SQL-expressible ops)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Importing the query modules populates the registry.
from kafka_stream_sorter_spark.queries import (  # noqa: E402,F401
    files_io,
    llm,
    relational,
    sorts,
    streaming,
    tpch,
)

# ---------------------------------------------------------------------------
# Registration-order priority.
#
# External harnesses iterate ``queries()`` in insertion order and check only
# a prefix of it (every round so far: the first 50). Round-4 rotation, by
# attestation age and code churn (r3 verdict, next-round item 2):
# (a) the one never-green query — udf_grouped_regression, whose float-
# determinism fix (REGR_X_ORIGIN_US shift) lands this round — plus its
# pandas twin, which shares the changed x-axis; (b) every query whose only
# driver green predates the r2 timestamp-normalizer rewrite (r1-only
# attestations, 27 incl. the two multimodal queries whose decode became a
# real PNG codec this round); (c) r3-green queries whose CODE changed this
# round (stream_topk read-side dedup, file round-trips' per-session scratch
# path); (d) fill to 50 with the oldest remaining greens (r2-only), in
# registry order. r2-only queries that don't fit (csv_wire_roundtrip, the
# stream_* state ops, 19 TPC-H shapes) are pre-staged right after the
# marker for the r5 rotation — after r5, nothing is older than two rounds.
_PRIORITY: list[str] = [
    # (a) regression pair — the never-green query and its changed twin
    "udf_grouped_regression",
    "udf_grouped_regression_pandas",
    # (b) r1-only attestations (27) — multimodal first (code changed r4)
    "multimodal_meta",
    "multimodal_resize",
    "multimodal_byte_hist",
    "multimodal_frames",
    "dedup_jaccard",
    "dedup_ngram_jaccard",
    "dedup_minhash_sig",
    "dedup_minhash_lsh",
    "dedup_minhash_groups",
    "dedup_simhash",
    "dedup_connected_groups",
    "dedup_embedding",
    "ann_bruteforce",
    "ann_vectorized",
    "ann_ivf_blocked",
    "ann_lsh_hyperplane",
    "ann_knn_join",
    "text_tokens",
    "text_quality",
    "text_langid",
    "text_bpe_tokens",
    "text_token_freq",
    "text_repetition",
    "text_pii_scrub",
    "text_chunk_windows",
    "doc_fingerprint",
    "pipeline_quality_dedup_split",
    # (c) r3-green but code changed in r4
    "stream_topk",  # at-least-once candidate dedup (ADVICE r3)
    "csv_file_roundtrip",  # per-session scratch dir (ADVICE r3)
    "jsonl_file_roundtrip",  # per-session scratch dir (ADVICE r3)
    # (c') SCHEMA changed late in r4 (window/session bounds -> epoch ints,
    # sorted drain ts -> ts_us, per the timestamp-emission rule; plus the
    # DRAIN_WATERMARK widening) — changed code outranks unchanged r2 greens
    "stream_window_tumbling",
    "stream_window_sliding",
    "stream_session_window",
    "stream_sorted_drain",
    # (d) oldest remaining greens (r2-only), registry order (18)
    "dedup_exact",
    "window_analytic",
    "agg_quantiles",
    "agg_approx_distinct",
    "agg_grouping_sets",
    "join_left_outer",
    "join_full_outer",
    "join_null_safe",
    "sort_numeric",
    "sort_lexicographic",
    "sort_low_cardinality",
    "keyed_fanout",
    "topk",
    "sort_multikey_nulls",
    # --- first 50 ends here (driver prefix boundary) ---
    # r2-only greens that didn't fit — the head of the r5 rotation
    "sample_hash_split",
    "sample_stratified",
    "window_rank",
    "set_except",
    "csv_wire_roundtrip",
    "stream_dedup_keys",
    "stream_stateful_user_stats",
    "stream_static_join",
    "stream_cdc_upsert",
    "tpch_q2_min_price",
    "tpch_q4_exists",
    "tpch_q5_region",
    "tpch_q7_volume",
    "tpch_q8_market_share",
    "tpch_q9_profit",
    "tpch_q10_returns",
    "tpch_q11_value_parts",
    "tpch_q12_late_priority",
    "tpch_q13_custdist",
    "tpch_q14_promo",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_cnt",
    "tpch_q17_small_qty",
    "tpch_q18_large_orders",
    "tpch_q19_disjunctive",
    "tpch_q20_excess_share",
    "tpch_q21_waiting",
    "tpch_q22_idle_balance",
]


def _reorder() -> None:
    missing = [n for n in _PRIORITY if n not in QUERIES]
    if missing:
        raise ValueError(f"_PRIORITY names unknown queries: {missing}")
    prio = set(_PRIORITY)
    order = _PRIORITY + [n for n in QUERIES if n not in prio]
    for n in order:
        QUERIES[n] = QUERIES.pop(n)
        if n in ORACLES:
            ORACLES[n] = ORACLES.pop(n)


_reorder()
