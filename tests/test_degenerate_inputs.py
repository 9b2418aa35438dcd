"""Degenerate-input robustness sweep over the ENTIRE query registry.

Spark 4 runs ANSI mode ON: double/0 and integer DIV 0 THROW, while
DuckDB yields NULL/NaN/inf for the same input — so an unguarded
denominator is a crash on one engine and a silent parity break on the
other (the recurring ADVICE hazard class: the MRL zero-norm guard, the
mixture-reweight src_tokens guard, the OLS x-variance guard all fixed
single instances of it).  The sf-level testdata never exercises these
paths: every document is non-empty multi-token text and every
embedding has positive norm.

This module closes the class instead of the instances: it rebuilds a
scale-slice directory whose documents table contains the degenerate
shapes real 100 TB crawls are full of —

  * completely empty text,
  * a single-token document,
  * symbols-only text (zero alphanumeric chars),
  * a duplicated one-liner pair (exercises dedup paths at df >= 2),

and whose embeddings table contains an all-zero vector (norm 0) next
to normal vectors — then runs EVERY registered query against it and
asserts none of them throws.  Correct degenerate OUTPUT semantics are
pinned per-op by the golden tests; this sweep only bans crashes and is
the regression net for every future operator.
"""

from __future__ import annotations

import shutil

import pytest

from bigdata_gamedb_etl_spark.registry import all_queries
from bigdata_gamedb_etl_spark.sources.catalog import TABLE_SCHEMAS

SRC_SF_DIR = "/root/testdata/sf0.001"

DEGENERATE_DOCS = [
    # (doc_id, text, lang, source, n_chars)
    (1, "", "en", "degenerate", 0),
    (2, "solo", "en", "degenerate", 4),
    (3, "@#$% !!** ~~", "en", "degenerate", 12),
    (4, "the same short line", "en", "dup_pair", 19),
    (5, "the same short line", "en", "dup_pair", 19),
    (
        6,
        "a perfectly ordinary document with enough tokens to shingle "
        "and enough variety to rank words by frequency in every op",
        "en",
        "normal",
        119,
    ),
]

EMB_DIM = 64

DEGENERATE_EMBS = [
    # vec_id 0 must stay a usable query vector (sim_cosine_topk &
    # friends anchor on QUERY_VEC_ID = 0)
    (0, [0.1 * (i % 7 + 1) for i in range(EMB_DIM)], 1),
    (1, [0.0] * EMB_DIM, 1),  # zero norm — the MRL/NaN hazard shape
    (2, [0.2] * EMB_DIM, 2),
    (3, [(-0.1) ** (i % 2) for i in range(EMB_DIM)], 2),
]


@pytest.fixture(scope="session")
def degenerate_sf_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("degenerate_sf")
    for name in TABLE_SCHEMAS:
        if name in ("documents", "embeddings"):
            continue
        shutil.copy(
            f"{SRC_SF_DIR}/{name}.parquet", str(d / f"{name}.parquet")
        )
    spark.createDataFrame(
        DEGENERATE_DOCS, TABLE_SCHEMAS["documents"]
    ).coalesce(1).write.mode("overwrite").parquet(
        str(d / "documents.parquet")
    )
    spark.createDataFrame(
        DEGENERATE_EMBS, TABLE_SCHEMAS["embeddings"]
    ).coalesce(1).write.mode("overwrite").parquet(
        str(d / "embeddings.parquet")
    )
    return str(d)


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_query_survives_degenerate_corpus(name, spark, degenerate_sf_dir):
    df = all_queries()[name](spark, degenerate_sf_dir)
    df.collect()  # any ANSI DIVIDE_BY_ZERO / INVALID_ARRAY_INDEX throws here


# ---------------------------------------------------------------------------
# Degenerate EVENTS feed: the ingestion surface where nulls are the
# norm, not the exception — null ts (unparseable timestamps), null
# user/event ids, unknown types, null values, malformed JSON props,
# and a duplicated event_id.  The DQ operators HANDLE these shapes by
# design (dq_event_conformity counts them); this sweep asserts that
# every OTHER operator at least survives them.

from datetime import datetime as _dt  # noqa: E402

DEGENERATE_EVENTS = [
    # (event_id, ts, user_id, event_type, value, props)
    (1, None, 7, "click", 1.0, '{"k": 1}'),
    (2, _dt(2024, 1, 1, 0, 0, 1), None, "click", None, "not json"),
    (3, _dt(2024, 1, 1, 0, 0, 2), 7, None, -1.5, None),
    (None, _dt(2024, 1, 1, 0, 0, 3), 8, "mystery_type", 0.0, "{}"),
    (5, _dt(2024, 1, 1, 0, 0, 4), 8, "purchase", 9.99, '{"k": 2}'),
    (5, _dt(2024, 1, 1, 0, 0, 5), 9, "view", 0.0, '{"k": 3}'),
    (6, _dt(2024, 1, 2, 12, 0, 0), 9, "error", 3.5, '{"k": 4}'),
]


@pytest.fixture(scope="session")
def degenerate_events_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("degenerate_events")
    for name in TABLE_SCHEMAS:
        if name == "events":
            continue
        shutil.copy(
            f"{SRC_SF_DIR}/{name}.parquet", str(d / f"{name}.parquet")
        )
    spark.createDataFrame(
        DEGENERATE_EVENTS, TABLE_SCHEMAS["events"]
    ).coalesce(1).write.mode("overwrite").parquet(
        str(d / "events.parquet")
    )
    return str(d)


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_query_survives_degenerate_events(
    name, spark, degenerate_events_dir
):
    # the FULL registry, not a static source-scan filter: a first cut
    # matched 'events' in the function source and silently skipped
    # queries that reach the table through module-level constants
    # (dq_key_skew_profile via _SKEW_KEYS) or same-module delegation
    # (dq_quarantine_mart); queries that never touch events re-run on
    # their sf0.001 copies — redundant but cheap, and the sweep can
    # never under-match again.
    all_queries()[name](spark, degenerate_events_dir).collect()


def test_zero_norm_vector_never_reaches_a_cosine_topk(
    spark, degenerate_sf_dir
):
    """The sharper form of the sweep's no-crash bar for the sim
    family: vec_id=1 (the all-zero embedding) must be ABSENT from
    every cosine-ranked result — an unfiltered zero vector scores
    0/0 = NaN, and NaN sorts greatest in DESC order, so its presence
    would mean it silently occupies a top-k slot."""
    from bigdata_gamedb_etl_spark.operators import similarity as sim

    for q in (
        sim.sim_cosine_topk,
        sim.sim_ann_lsh_topk,
        sim.sim_knn_top1,
        sim.sim_sq8_topk,
        sim.sim_pq_topk,
        sim.sim_ivf_topk,
        sim.sim_ivf_multiprobe_topk,
    ):
        ids = {r["vec_id"] for r in q(spark, degenerate_sf_dir).collect()}
        assert 1 not in ids, f"{q.__name__} ranked the zero-norm vector"


@pytest.fixture(scope="session")
def zero_query_sf_dir(spark, tmp_path_factory):
    """Same corpus, but the ANCHOR vector (vec_id = QUERY_VEC_ID = 0)
    is itself all-zero — the query side of every cosine op vanishes
    behind the _emb_cosine filter."""
    d = tmp_path_factory.mktemp("zero_query_sf")
    for name in TABLE_SCHEMAS:
        if name in ("documents", "embeddings"):
            continue
        shutil.copy(
            f"{SRC_SF_DIR}/{name}.parquet", str(d / f"{name}.parquet")
        )
    spark.createDataFrame(
        DEGENERATE_DOCS, TABLE_SCHEMAS["documents"]
    ).coalesce(1).write.mode("overwrite").parquet(
        str(d / "documents.parquet")
    )
    embs = [(0, [0.0] * EMB_DIM, 1)] + [
        (i, e, lbl) for i, e, lbl in DEGENERATE_EMBS[2:]
    ]
    spark.createDataFrame(
        embs, TABLE_SCHEMAS["embeddings"]
    ).coalesce(1).write.mode("overwrite").parquet(
        str(d / "embeddings.parquet")
    )
    return str(d)


def test_zero_norm_query_vector_yields_empty_topk(
    spark, zero_query_sf_dir
):
    """When the anchor vector itself has zero norm, cosine against it
    is undefined for EVERY candidate: the query-anchored ops must
    return an empty result with their normal schema (ivf/pq previously
    crashed on .first() returning None) rather than throw or rank by
    NaN."""
    from bigdata_gamedb_etl_spark.operators import similarity as sim

    for q in (
        sim.sim_cosine_topk,
        sim.sim_ann_lsh_topk,
        sim.sim_sq8_topk,
        sim.sim_pq_topk,
        sim.sim_ivf_topk,
        sim.sim_ivf_multiprobe_topk,
    ):
        rows = q(spark, zero_query_sf_dir).collect()
        assert rows == [], f"{q.__name__} returned rows for a zero query"
