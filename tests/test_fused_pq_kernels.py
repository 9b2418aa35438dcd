"""r15 fused-kernel equivalence pins (guide §4).

The PQ/IVF family's serving and fit hot paths were fused into single
Arrow kernels in r15:

  _pq_round_sums      ≡ _pq_assign(_pq_subspaces(·)) → groupBy(j, code)
  _rpq_round_sums     ≡ _rpq_assign(_rpq_subspaces(·)) → groupBy(cell, j, code)
  _pq_adc_sum         ≡ encode → broadcast-LUT join → groupBy(vec_id).sum
  _rpq_adc_sum        ≡ residual join → encode → LUT join → sum → offset join

The un-fused forms stay in the module as the executable SPEC (the
hypothesis property test drives _rpq_assign's GEMM against plain-Python
argmin); these tests prove each fused kernel returns EXACTLY the same
integers as its spec composition on the real corpus, so the oracle-
parity guarantee transfers to the fused plans.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_gamedb_etl_spark.operators import similarity as sim


def _uq_and_cents(spark, sf_dir):
    uq = sim._pq_unit_quantized(spark, sf_dir).localCheckpoint(eager=True)
    cents = sim._pq_int_fit(uq.where(sim._int_train_gate()))
    assert cents, "empty PQ codebook on the test corpus"
    return uq, cents


def test_pq_round_sums_match_explode_aggregate(spark, sf_dir):
    uq, cents = _uq_and_cents(spark, sf_dir)
    train = uq.where(sim._int_train_gate())
    fused = {
        (r["j"], r["code"]): ([r[f"s{d}"] for d in range(sim.PQ_SUBDIM)],
                              r["n"])
        for r in sim._pq_round_sums(train, cents).collect()
    }
    spec = {
        (r["j"], r["code"]): ([r[f"s{d}"] for d in range(sim.PQ_SUBDIM)],
                              r["n"])
        for r in sim._pq_assign(sim._pq_subspaces(train), cents)
        .groupBy("j", "code")
        .agg(*sim._dim_sum_aggs("sub", sim.PQ_SUBDIM))
        .collect()
    }
    assert fused == spec


def test_rpq_round_sums_match_explode_aggregate(spark, sf_dir):
    eq = sim._int_quantized(spark, sf_dir)
    coarse = sim._int_lloyd_fit(
        eq.where(sim._int_train_gate()).select("vec_id", "e")
    )
    assert coarse
    assigned = sim._int_assign(eq, coarse).localCheckpoint(eager=True)
    uq = sim._pq_unit_quantized(spark, sf_dir).localCheckpoint(eager=True)
    res_train = sim._rpq_residuals(
        uq.where(sim._int_train_gate()), assigned, sim._unit_centroids(coarse)
    ).localCheckpoint(eager=True)
    rcents = sim._rpq_int_fit(res_train)
    assert rcents
    fused = {
        (r["cell"], r["j"], r["code"]): (
            [r[f"s{d}"] for d in range(sim.PQ_SUBDIM)], r["n"]
        )
        for r in sim._rpq_round_sums(res_train, rcents).collect()
    }
    spec = {
        (r["cell"], r["j"], r["code"]): (
            [r[f"s{d}"] for d in range(sim.PQ_SUBDIM)], r["n"]
        )
        for r in sim._rpq_assign(sim._rpq_subspaces(res_train), rcents)
        .groupBy("cell", "j", "code")
        .agg(*sim._dim_sum_aggs("sub", sim.PQ_SUBDIM))
        .collect()
    }
    assert fused == spec


def test_pq_adc_sum_matches_lut_join(spark, sf_dir):
    uq, cents = _uq_and_cents(spark, sf_dir)
    q = uq.where(F.col("vec_id") == sim.QUERY_VEC_ID).first()
    assert q is not None
    qu = [int(v) for v in q["u"]]
    lut = {
        (j, code): sum(
            a * b
            for a, b in zip(
                qu[j * sim.PQ_SUBDIM : (j + 1) * sim.PQ_SUBDIM], c
            )
        )
        for (j, code), c in cents.items()
    }
    adc = sim._pq_adc_sum(cents, lut)
    fused = {
        r["vec_id"]: r["s"]
        for r in uq.select("vec_id", adc("u").alias("s")).collect()
    }
    lut_df = spark.createDataFrame(
        [(j, c, p) for (j, c), p in sorted(lut.items())],
        "j int, code int, pdot bigint",
    )
    spec = {
        r["vec_id"]: r["s"]
        for r in sim._pq_assign(sim._pq_subspaces(uq), cents)
        .join(F.broadcast(lut_df), ["j", "code"])
        .groupBy("vec_id")
        .agg(F.sum("pdot").alias("s"))
        .collect()
    }
    assert fused == spec


def test_rpq_adc_sum_matches_join_chain(spark, sf_dir):
    eq = sim._int_quantized(spark, sf_dir)
    coarse = sim._int_lloyd_fit(
        eq.where(sim._int_train_gate()).select("vec_id", "e")
    )
    assert coarse
    assigned = sim._int_assign(eq, coarse).localCheckpoint(eager=True)
    cunit = sim._unit_centroids(coarse)
    uq = sim._pq_unit_quantized(spark, sf_dir).localCheckpoint(eager=True)
    res_train = sim._rpq_residuals(
        uq.where(sim._int_train_gate()), assigned, cunit
    )
    rcents = sim._rpq_int_fit(res_train)
    assert rcents
    qrow = (
        assigned.where(F.col("vec_id") == sim.QUERY_VEC_ID)
        .select("e")
        .first()
    )
    assert qrow is not None
    qu = sim._unit_quantize_py([int(v) for v in qrow["e"]])
    assert qu is not None
    lut = {
        (cell, j, code): sum(
            a * b
            for a, b in zip(
                qu[j * sim.PQ_SUBDIM : (j + 1) * sim.PQ_SUBDIM], c
            )
        )
        for (cell, j, code), c in rcents.items()
    }
    off = {
        cell: sum(a * b for a, b in zip(qu, cu))
        for cell, cu in cunit.items()
    }
    covered = {cell for cell, _, _ in rcents}
    cand = assigned.where(
        F.col("cell").isin(sorted(covered))
    ).select("vec_id", "cell")
    radc = sim._rpq_adc_sum(rcents, lut, cunit, off)
    fused = {
        r["vec_id"]: r["t"]
        for r in uq.join(cand, "vec_id")
        .select("vec_id", radc("cell", "u").alias("t"))
        .collect()
    }
    lut_df = spark.createDataFrame(
        [(c, j, k, p) for (c, j, k), p in sorted(lut.items())],
        "cell int, j int, code int, pdot bigint",
    )
    off_df = spark.createDataFrame(
        sorted(off.items()), "cell int, odot bigint"
    )
    enc = sim._rpq_assign(
        sim._rpq_subspaces(
            sim._rpq_residuals(
                uq.join(cand.select("vec_id"), "vec_id"), assigned, cunit
            )
        ),
        rcents,
    )
    spec = {
        r["vec_id"]: r["t"]
        for r in enc.join(F.broadcast(lut_df), ["cell", "j", "code"])
        .groupBy("vec_id", "cell")
        .agg(F.sum("pdot").alias("s"))
        .join(F.broadcast(off_df), "cell")
        .select("vec_id", (F.col("odot") + F.col("s")).alias("t"))
        .collect()
    }
    assert fused == spec
