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
