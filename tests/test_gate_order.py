"""Pins the driver-gate registration window.

The driver's CORRECTNESS gate records exactly the first 50 registered
queries (observed in rounds 1-2).  These tests fail if a future edit
re-introduces the round-2 regression where inserting a query mid-registry
silently pushed SURVEY-critical rows out of the gated window.
"""

from lapis_silo_spark.driver_queries import (
    GATE_WINDOW,
    ORACLES,
    QUERIES,
    _GATE_ORDER,
)


def test_gate_order_is_the_registry_prefix():
    assert list(QUERIES)[:GATE_WINDOW] == _GATE_ORDER
    assert len(_GATE_ORDER) == GATE_WINDOW


def test_gated_window_covers_survey_core():
    gated = set(list(QUERIES)[:GATE_WINDOW])
    # genomic_reconstruct_full is the round-8 SCALE row (4,000-nt store,
    # ~31 s at sf0.01) — deliberately registered past the driver's 50-slot
    # window so it doesn't burn gate time; it is value-gated in the
    # full-registry artifacts (CORRECTNESS_LOCAL/SF1_r08) at both scales.
    genomic = {
        n for n in QUERIES
        if n.startswith("genomic_") and n != "genomic_reconstruct_full"
    }
    assert genomic and genomic <= gated
    for name in (
        "asof_prior_click",
        "range_join_clicks_5m",
        "events_sessionize_30m",
        "window_running_total",
        "window_rank_topn",
        "agg_superset_stats",
        "set_intersect_except",
        "rollup_counts",
        "streaming_windowed_counts",
        "text_bm25_topk",
        "pack_sequences_chunks",
        "sample_stratified_hash",
        "quality_quantile_filter",
        "dedup_minhash_clusters",
    ):
        assert name in gated, name


#: SURVEY §2.1 operator class → registry rows that exercise it. A class is
#: driver-gated as long as AT LEAST ONE of its rows sits inside the 50-slot
#: window, so a future displacement (a new headline row taking a slot, as
#: join_full's and orderby_randomize's did) cannot silently drop a whole
#: operator family from the hard gate (round-9 VERDICT #7).
OPERATOR_CLASS_ROWS = {
    "TableScanNode": {"filter_equals_groupby_count", "project_columns"},
    "FilterNode": {"filter_equals_groupby_count", "filter_between_date",
                   "filter_in_set", "filter_like_regex",
                   "filter_negation_keeps_nulls"},
    # Pipeline.project: groupby_null_keys projects the mapped key,
    # orderby_limit_offset projects (o_orderkey, price)
    "ProjectNode": {"project_columns", "groupby_null_keys",
                    "orderby_limit_offset"},
    "MapNode": {"map_at_isoweek", "genomic_cooccurrence_groupby",
                "groupby_null_keys"},
    "AggregateNode": {"groupby_null_keys", "filter_equals_groupby_count"},
    "CountFilterNode": {"count_filter_total"},
    "BitmapAggregationNode": {"genomic_cooccurrence_groupby"},
    "OrderByNode": {"orderby_limit_offset", "orderby_randomize"},
    "OrderByWithLimitNode": {"orderby_limit_offset"},
    "FetchNode": {"orderby_limit_offset"},
    "JoinNode": {"join_inner", "join_left_anti", "join_left", "join_right",
                 "join_full", "join_left_semi", "join_right_semi",
                 "join_right_anti"},
    "UnionAllNode": {"union_all"},
    "SchemaNode": {"schema_introspection"},
    "MutationsNode": {"genomic_mutations_stats", "genomic_adapted_mutations"},
    "InsertionsNode": {"genomic_insertions_stats"},
    "MostRecentCommonAncestorNode": {"genomic_mrca"},
    "PhyloSubtreeNode": {"genomic_phylo_subtree"},
}


def test_gated_window_covers_every_operator_class():
    gated = set(list(QUERIES)[:GATE_WINDOW])
    for cls, rows in OPERATOR_CLASS_ROWS.items():
        # every mapped row must still exist, so this table can't rot
        missing = rows - set(QUERIES)
        assert not missing, f"{cls}: unknown registry rows {missing}"
        assert rows & gated, (
            f"operator class {cls} has NO representative inside the "
            f"{GATE_WINDOW}-slot driver gate window (its rows {sorted(rows)} "
            f"were all displaced) — promote one back into _GATE_ORDER"
        )


def test_gated_window_is_fully_oracled():
    """Every gated slot carries a value-level oracle — no rows-only entries
    burning a gated slot (the xxhash fast path sits past the window)."""
    for name in list(QUERIES)[:GATE_WINDOW]:
        assert name in ORACLES, f"gated query {name} has no oracle"
    assert "dedup_minhash_lsh_pairs_fast" not in list(QUERIES)[:GATE_WINDOW]


def test_oracle_registry_order_matches_queries():
    query_pos = {n: i for i, n in enumerate(QUERIES)}
    oracle_names = list(ORACLES)
    assert oracle_names == sorted(oracle_names, key=query_pos.__getitem__)
