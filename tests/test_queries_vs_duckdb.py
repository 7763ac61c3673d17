"""Driver-style correctness gate, run locally: every SQL-backed queries()
entry must match its DuckDB oracle on row count, column names, and values
(order-insensitive), at sf0.001 for speed (the driver runs sf0.01)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def catalog(ray_session):
    from split_ner_ray.queries import QUERIES

    return QUERIES


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


SQL_BACKED = [
    "q1_pricing_summary", "top_orders_revenue", "nation_customer_stats",
    "brand_revenue_topk", "order_priority_count", "events_hourly",
    "events_sessions", "events_props_sum", "doc_token_counts", "doc_quality",
    "doc_pattern_hist", "doc_langid", "dedup_exact_docs", "ann_topk_cosine",
    "doc_word_types", "doc_lang_confusion", "doc_vocab_topk",
    "doc_stats_by_lang", "part_topk_per_brand", "events_type_users",
    "doc_hash_sample", "doc_mined_op_contexts", "dedup_cosine_docs",
    "supplier_stats_by_nation",
    # round 3
    "doc_jaccard_sampled_pairs", "ann_ivf_exhaustive",
    "customer_order_counts", "events_value_stats",
    "events_last_order", "orders_events_7d", "events_sliding_hour",
    "events_distinct_users_kmv", "events_type_freq_mg",
    "events_value_quantiles", "events_latest_by_user",
    "customer_events_full_outer", "events_running_user",
    "doc_rollup_lang_source", "doc_sample_per_lang",
    # round 3, session 2
    "orders_bloom_semi", "customers_no_orders_bloom", "doc_tfidf_topk",
    "doc_bpe_tokens", "events_value_variance", "docs_curation_funnel",
    "doc_bigrams_topk", "events_value_histogram", "doc_lang_source_pivot",
    "events_funnel_view_purchase", "part_name_fuzzy_pairs",
    "doc_shuffle_head", "events_weekly_retention",
    "emb_group_centroid_sums",
    # round 4
    "doc_line_dedup", "doc_repetition", "doc_contamination",
    "ann_join_exhaustive", "doc_pack_sequences", "events_debounced",
    # round 5: HLL register-parity oracles (md5 kernel), LM scoring, PII,
    # BM25 lexical retrieval
    "events_hll_users", "events_hll_users_by_type",
    "doc_lm_score", "doc_pii_redacted", "doc_bm25_topk",
    "doc_weighted_sample",
]


@pytest.mark.parametrize("name", SQL_BACKED)
def test_query_matches_oracle(catalog, con, name):
    fn, sql = catalog[name]
    assert sql is not None
    got = _norm(pd.DataFrame(fn(SF_DIR)))
    want = _norm(con.sql(sql).df())
    assert list(got.columns) == list(want.columns), (got.columns, want.columns)
    assert len(got) == len(want), (len(got), len(want))
    for c in got.columns:
        g, w = got[c], want[c]
        if g.dtype != w.dtype:
            g = g.astype(str)
            w = w.astype(str)
        assert g.tolist() == w.tolist(), f"column {c} differs: {g.head()} vs {w.head()}"


ROWS_ONLY = [
    "ann_ivf_cosine", "ann_ivf_index_cosine", "kg_parity_metrics",
    "kg_span_f1",
]

DOCS_SQL_BACKED = [
    "dedup_minhash_docs", "dedup_simhash_docs", "doc_fingerprints",
    "dedup_cosine_lsh_docs", "dedup_delta_vs_corpus",
]

KG_AUX_SQL_BACKED = [
    "kg_intrinsic_patterns", "kg_pred_patterns", "mention_embeddings",
]


@pytest.mark.parametrize("name", KG_AUX_SQL_BACKED)
def test_kg_aux_query_matches_materialized_oracle(catalog, con, name):
    """Mining + mention-norm entries vs DuckDB over the materialized
    transcripts-derived serial oracles (oracle.materialized_kg_aux_path)."""
    import os

    from split_ner_ray.oracle import materialized_kg_aux_path

    fn, sql = catalog[name]
    assert sql is not None
    d = materialized_kg_aux_path(SF_DIR)
    resolved = sql.format(
        intrinsic=os.path.join(d, "intrinsic_patterns.parquet"),
        predgaps=os.path.join(d, "pred_patterns.parquet"),
        mnorms=os.path.join(d, "mention_norms.parquet"),
    )
    got = _norm(pd.DataFrame(fn(SF_DIR)))
    want = _norm(con.sql(resolved).df())
    assert list(got.columns) == list(want.columns), (got.columns, want.columns)
    assert len(got) == len(want), (len(got), len(want))
    for c in got.columns:
        assert got[c].tolist() == want[c].tolist(), f"column {c} differs"


@pytest.mark.parametrize("name", DOCS_SQL_BACKED)
def test_docs_query_matches_materialized_oracle(catalog, con, name):
    """Near-dup / fingerprint entries vs DuckDB over the MATERIALIZED
    serial documents-table oracles (oracle_docs.materialized_docs_path) —
    the compare the driver runs after oracle_sql_catalog resolves the
    {minhash}/{simhash}/{fps} placeholders, here at sf0.001."""
    import os

    from split_ner_ray.oracle_docs import materialized_docs_path

    fn, sql = catalog[name]
    assert sql is not None
    d = materialized_docs_path(SF_DIR)
    resolved = sql.format(
        minhash=os.path.join(d, "minhash_clusters.parquet"),
        simhash=os.path.join(d, "simhash_pairs.parquet"),
        fps=os.path.join(d, "fingerprints.parquet"),
        cosine=os.path.join(d, "cosine_lsh_pairs.parquet"),
        delta=os.path.join(d, "delta_pairs.parquet"),
    )
    got = _norm(pd.DataFrame(fn(SF_DIR)))
    want = _norm(con.sql(resolved).df())
    assert list(got.columns) == list(want.columns), (got.columns, want.columns)
    assert len(got) == len(want), (len(got), len(want))
    for c in got.columns:
        assert str(got[c].dtype) == str(want[c].dtype), (c, got[c].dtype, want[c].dtype)
        assert got[c].tolist() == want[c].tolist(), f"column {c} differs"

KG_SQL_BACKED = [
    "kg_triples", "kg_nodes", "kg_mentions",
    "kg_triples_by_pred", "kg_nodes_by_etype", "kg_node_degrees",
    "kg_entity_cooc", "kg_triangles",
]


@pytest.mark.parametrize("name", KG_SQL_BACKED)
def test_kg_query_matches_materialized_oracle(catalog, con, name):
    """The flagship KG entries vs DuckDB over the MATERIALIZED serial
    oracle (oracle.materialized_kg_path) — the exact compare the driver
    runs after oracle_sql_catalog resolves the {triples}/{nodes}/{mentions}
    placeholders, here at sf0.001 for speed."""
    import os

    from split_ner_ray.oracle import materialized_kg_path

    fn, sql = catalog[name]
    assert sql is not None
    d = materialized_kg_path(SF_DIR)
    resolved = sql.format(
        triples=os.path.join(d, "triples.parquet"),
        nodes=os.path.join(d, "nodes.parquet"),
        mentions=os.path.join(d, "mentions.parquet"),
    )
    got = _norm(pd.DataFrame(fn(SF_DIR)))
    want = _norm(con.sql(resolved).df())
    assert list(got.columns) == list(want.columns), (got.columns, want.columns)
    assert len(got) == len(want), (len(got), len(want))
    for c in got.columns:
        assert str(got[c].dtype) == str(want[c].dtype), (c, got[c].dtype, want[c].dtype)
        assert got[c].tolist() == want[c].tolist(), f"column {c} differs"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(catalog, name):
    fn, sql = catalog[name]
    assert sql is None
    out = pd.DataFrame(fn(SF_DIR))
    assert out is not None
    if name == "kg_parity_metrics":
        row = out.iloc[0]
        assert row["precision_pct"] == 10000 and row["recall_pct"] == 10000
    if name == "kg_span_f1":
        assert out.iloc[0]["micro_f1_pct"] == 10000
    if name.startswith("kg_"):
        assert len(out) > 0
    if name.startswith("ann_"):
        # the deterministic quality claim the driver row carries:
        # per-qid integer hit counts vs the exact top-k, bounded here.
        # Denominator = EVERY query asked, so a qid that returns zero
        # rows counts as a total miss instead of vanishing
        from split_ner_ray.queries import ANN_QUERY_IDS

        per_qid = out.groupby("qid")["recall_hits"].first()
        recall = per_qid.sum() / (len(ANN_QUERY_IDS) * 5)
        assert recall >= 0.95, f"recall@5 {recall} below bound"


def test_transcripts_tool_stats_matches_sql(catalog, con):
    """The transcripts-table query vs its read_parquet SQL template,
    resolved against the local sf (the driver resolves sf0.01 via
    oracle_sql_catalog)."""
    import os

    from split_ner_ray.queries import TRANSCRIPTS_TOOL_SQL_TEMPLATE
    from split_ner_ray.synth import transcripts_path

    fn, sql = catalog["transcripts_tool_stats"]
    assert "{glob}" in sql
    got = _norm(pd.DataFrame(fn(SF_DIR)))
    glob = os.path.join(transcripts_path(SF_DIR), "*.parquet")
    want = _norm(con.sql(TRANSCRIPTS_TOOL_SQL_TEMPLATE.format(glob=glob)).df())
    assert list(got.columns) == list(want.columns)
    for c in got.columns:
        assert got[c].tolist() == want[c].tolist()


def test_oracle_sql_catalog_resolves_templates(ray_session):
    from split_ner_ray.queries import oracle_sql_catalog

    cat = oracle_sql_catalog()
    assert "{glob}" not in cat["transcripts_tool_stats"]
    assert "read_parquet" in cat["transcripts_tool_stats"]
    assert "sf0.01" in cat["transcripts_tool_stats"]


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    ds = e.entry()
    df = ds.to_pandas()
    assert len(df) > 0
    assert set(df.columns) >= {"subj_id", "pred", "obj_id", "support"}


def test_kg_pagerank_matches_materialized_oracle(catalog, con):
    """Distributed triple build + iterative integer PageRank vs the
    dict-based serial oracle (oracle.materialized_kg_graph_path)."""
    import os

    from split_ner_ray.oracle import materialized_kg_graph_path

    fn, sql = catalog["kg_pagerank"]
    d = materialized_kg_graph_path(SF_DIR)
    resolved = sql.format(pagerank=os.path.join(d, "pagerank.parquet"))
    got = _norm(pd.DataFrame(fn(SF_DIR)))
    want = _norm(con.sql(resolved).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want), (len(got), len(want))
    for c in got.columns:
        assert str(got[c].dtype) == str(want[c].dtype), (c, got[c].dtype)
        assert got[c].tolist() == want[c].tolist(), f"column {c} differs"
