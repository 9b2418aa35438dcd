"""Mergeable sketch aggregates — the approximate-query machinery a
100 TB pipeline uses instead of exact re-shuffles, covering the
classic trio: distinct count (HLL), frequency / heavy hitters
(count-min + approx_top_k), and quantiles (decimal-log histogram).

Two check tiers.  The NATIVE tiers (`hll_sketch_agg` per-type +
two-level union rollup, `approx_top_k`) are rows-only by design —
Datasketches estimates are implementation-defined, so no independent
engine can reproduce them; accuracy is asserted against exact counts
with each sketch's error bound in tests.  The HAND-ROLLED tiers
(count-min on the md5 mulmod permutation family since r11, the
scaled-BIGINT-register HLL, and the integer-binned quantile
histogram) are deterministic constructions both engines compute
bit-for-bit and carry full DuckDB oracles.

Why sketches and not approx_count_distinct: the sketch column is a
MERGEABLE partial — built per partition / per day / per source, then
stored, shipped, and merged later without touching raw data again.
That two-level shape (sketch once, merge many) is the hypertable /
incremental-rollup pattern; a plain approx_count_distinct forces a
full rescan per question.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import table
from ._rounding import _fr
from .dedup import _T31, _perm_formula

HLL_LGK = 14  # 2^14 buckets → ~1% relative standard error


def sketch_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct users per event type from an HLL sketch
    column (one pass, partials combine map-side like any aggregate)."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(HLL_LGK))
            ).alias("approx_users"),
            F.count("*").alias("event_count"),
        )
        .orderBy("event_type")
    )


def sketch_daily_merge_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level sketch merge: per-day HLL partials (what an
    incremental pipeline would persist alongside each day's partition),
    then hll_union_agg merges them into the whole-corpus distinct-user
    estimate WITHOUT rescanning events.  The merged estimate must agree
    with a direct one-pass sketch — asserted in tests."""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(F.date_trunc("DAY", "ts").alias("day")).agg(
        F.hll_sketch_agg("user_id", F.lit(HLL_LGK)).alias("day_sketch")
    )
    return daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("day_sketch")).alias(
            "approx_total_users"
        ),
        F.count("*").alias("days_merged"),
    )


# --------------------------------------------------------------------------
# Count-min sketch over the token stream — the mergeable heavy-hitter
# structure a 100 TB pipeline uses instead of an exact token-grain
# groupBy.  Entirely built-in DataFrame ops: the sketch IS a
# (row, bucket) -> count table of CM_DEPTH × CM_WIDTH cells, built with
# ONE shuffle whose key cardinality is d×w (map-side combine collapses
# each partition to ≤ d×w partial cells regardless of corpus size), and
# merged across corpora/days by element-wise sum — the same
# partial/merge shape as the HLL rollup above.
CM_DEPTH = 4
CM_WIDTH = 8192
#: candidate generation: deterministic 5% sample of token OCCURRENCES
#: (hash-gated on (doc_id, position) — no RNG).  With a fixed hash this
#: is not a probabilistic guarantee (a token whose every (doc_id, pos)
#: occurrence hashed to a nonzero residue would be missed), but a token
#: frequent enough to matter has so many occurrences that missing all
#: of them is vanishingly unlikely in practice — coverage of the exact
#: top-K is asserted empirically in tests/test_llm_pipeline.py, not
#: proved.
CM_SAMPLE_MOD = 20
CM_TOP_K = 20
#: permutation-constant index base for the CM depth rows — offset past
#: the minhash family's k ∈ [0, 32) so the two sketches never share a
#: hash function (independence across sketches costs nothing and
#: removes a correlated-failure class).
CM_PERM_BASE = 100

_CM_TOKS = "filter(split(text, ' '), t -> t <> '')"
_CM_TOKS_DUCK = "list_filter(string_split(text, ' '), t -> t <> '')"


def _cm_cell(j: int, div: str) -> str:
    """Row-j CM bucket over the 60-bit base hash presented as hh1/hh0:
    one mulmod permutation (dedup._perm_formula — the r10 minhash
    family, exact in BIGINT on both engines) folded to CM_WIDTH."""
    return f"(({_perm_formula(CM_PERM_BASE + j, div)}) % {CM_WIDTH})"


def _cm_hashed(col: str, div: str) -> str:
    """Shared hex-parse text: top 60 bits of md5(col) as a BIGINT."""
    if div == "DIV":  # Spark spelling
        return f"CAST(conv(substring(md5({col}), 1, 15), 16, 10) AS BIGINT)"
    return f"CAST('0x' || substr(md5({col}), 1, 15) AS BIGINT)"


def sketch_cm_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K heavy-hitter tokens with count-min-estimated counts.

    Three stages, none of which shuffles at token grain:
      1. build: one md5 per token occurrence (top 60 bits → hh1/hh0),
         CM_DEPTH mulmod permutations folded to CM_WIDTH, groupBy the
         d×w cell id — bounded-cardinality hash-agg (the sketch);
      2. candidates: hash-gated occurrence sample → distinct tokens;
      3. probe: candidates × depth joined against the broadcast-sized
         sketch, min across rows = the CM estimate (always ≥ truth,
         overcount ≤ ~2N/w with d independent rows).
    Deterministic end-to-end AND engine-reproducible: r11 rebased the
    cell hash from xxhash64 (Spark-only — kept this query rows-only
    through r10) onto the md5 mulmod permutation family that
    oracle-backed the minhash surface in r10 (dedup._perm_formula,
    property-tested over the full 60-bit domain), so the DuckDB oracle
    now computes the identical sketch cell-for-cell.  The CM bounds
    (est ≥ exact, overcount ≤ ~N/w per row) remain asserted against
    exact counts in tests/test_llm_pipeline.py."""
    d = table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.posexplode(F.expr(_CM_TOKS)).alias("pos", "token")
    )
    occ = tok.select(
        "doc_id",
        "pos",
        "token",
        F.expr(_cm_hashed("token", "DIV")).alias("h"),
    ).select(
        "doc_id",
        "pos",
        "token",
        F.expr(f"h DIV {_T31}").alias("hh1"),
        (F.col("h") % _T31).alias("hh0"),
    )
    cells = occ.select(
        F.posexplode(
            F.array(*[F.expr(_cm_cell(j, "DIV")) for j in range(CM_DEPTH)])
        ).alias("j", "bucket")
    )
    counters = cells.groupBy("j", "bucket").agg(F.count("*").alias("c"))

    gate = F.expr(_cm_hashed("concat_ws(':', doc_id, pos)", "DIV"))
    candidates = (
        occ.where(gate % CM_SAMPLE_MOD == 0).select("token").distinct()
    )
    probe = candidates.select(
        "token", F.expr(_cm_hashed("token", "DIV")).alias("h")
    ).select(
        "token",
        F.expr(f"h DIV {_T31}").alias("hh1"),
        (F.col("h") % _T31).alias("hh0"),
    ).select(
        "token",
        F.posexplode(
            F.array(*[F.expr(_cm_cell(j, "DIV")) for j in range(CM_DEPTH)])
        ).alias("j", "bucket"),
    )
    return (
        probe.join(F.broadcast(counters), ["j", "bucket"])
        .groupBy("token")
        .agg(F.min("c").alias("est_count"))
        .orderBy(F.col("est_count").desc(), "token")
        .limit(CM_TOP_K)
    )


def _cm_oracle() -> str:
    """DuckDB twin of sketch_cm_heavy_hitters — the same mulmod cell
    formulas ('//' division), the same md5 occurrence gate, the same
    min-across-depth probe."""
    cell_case = " ".join(
        f"WHEN {j} THEN {_cm_cell(j, '//')}" for j in range(CM_DEPTH)
    )
    return f"""
WITH t AS (SELECT doc_id, {_CM_TOKS_DUCK} AS ts FROM documents),
occ0 AS (
  SELECT doc_id, u.pos AS pos, u.tok AS token
  FROM (SELECT doc_id,
               UNNEST(list_transform(range(1, len(ts) + 1),
                 i -> struct_pack(pos := i - 1, tok := ts[i]))) AS u
        FROM t)
),
occ AS (
  SELECT doc_id, pos, token,
         {_cm_hashed('token', '//')} // {_T31} AS hh1,
         {_cm_hashed('token', '//')} % {_T31} AS hh0
  FROM occ0
),
depth AS (SELECT UNNEST(range(0, {CM_DEPTH})) AS j),
cells AS (
  SELECT j, CASE j {cell_case} END AS bucket FROM occ CROSS JOIN depth
),
counters AS (SELECT j, bucket, COUNT(*) AS c FROM cells GROUP BY j, bucket),
cand AS (
  SELECT DISTINCT token FROM occ
  WHERE {_cm_hashed("CAST(doc_id AS VARCHAR) || ':' || CAST(pos AS VARCHAR)", '//')}
        % {CM_SAMPLE_MOD} = 0
),
ch AS (
  SELECT token,
         {_cm_hashed('token', '//')} // {_T31} AS hh1,
         {_cm_hashed('token', '//')} % {_T31} AS hh0
  FROM cand
),
probe AS (
  SELECT token, j, CASE j {cell_case} END AS bucket FROM ch CROSS JOIN depth
),
est AS (
  SELECT token, MIN(c) AS est_count
  FROM probe JOIN counters USING (j, bucket)
  GROUP BY token
)
SELECT token, est_count FROM est
ORDER BY est_count DESC, token
LIMIT {CM_TOP_K}
"""


# --------------------------------------------------------------------------
# Built-in sketch top-k: per-language top tokens via approx_top_k
# (Spark 4's native frequent-items aggregate).  Complements the
# hand-rolled count-min above: same heavy-hitter question, answered by
# the engine-provided mergeable sketch — partial aggregation per
# partition, sketch merge at the reducer, so the shuffle carries
# ≤ maxItemsTracked entries per partition regardless of token volume.
# Rows-only checked (tie-breaks inside the sketch are unspecified);
# tests/test_temporal_sketches.py asserts every reported count equals
# the exact count whenever per-lang vocabulary fits maxItemsTracked
# (the sketch is exact below that cardinality).
APPROX_TOPK_K = 5


def sketch_approx_topk_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    tok = d.select("lang", F.explode(F.expr(_CM_TOKS)).alias("token"))
    topk = tok.groupBy("lang").agg(
        F.expr(f"approx_top_k(token, {APPROX_TOPK_K})").alias("tk")
    )
    return (
        topk.select("lang", F.posexplode("tk").alias("rank", "entry"))
        .select(
            "lang",
            (F.col("rank") + 1).cast("int").alias("rank"),
            F.col("entry.item").alias("token"),
            F.col("entry.count").alias("est_count"),
        )
        .orderBy("lang", "rank")
    )


# --------------------------------------------------------------------------
# Oracle-checked HyperLogLog: the same two-level partial/merge shape as
# sketch_daily_merge_total, but over OUR register construction — top 60
# md5 bits split into a 12-bit register index and a 48-bit tail whose
# leading-zero rank is the register value — so both engines compute the
# sketch bit-for-bit.  The native Datasketches queries above stay (and
# stay rows-only: their estimate is implementation-defined); this one
# proves the sketch algebra itself against an independent engine.
#
# Exactness discipline: the register sum Σ 2^(-M_j) is the one place a
# float could diverge (addition order), so it is carried SCALED by
# 2^49 as a BIGINT — every term 2^(49-rank) is an exact integer, the
# sum is order-free, and the worst case (4096 empty registers ·
# 2^49) = 2^61 sits inside signed-64.  Only the final estimate touches
# doubles, and it is emitted as a whole-user BIGINT.
HLL_P = 12
HLL_M = 1 << HLL_P          # 4096 registers
_HLL_TAIL_BITS = 60 - HLL_P  # 48-bit tail; rank ∈ [1, 49]
#: α_m · m² for m = 4096 (Flajolet et al. 2007 bias constant) — a
#: Python-computed literal so both engines parse the identical double.
_HLL_ALPHA_M2 = 0.7213 / (1.0 + 1.079 / HLL_M) * HLL_M * HLL_M

#: Linear-counting estimates floor(m·ln(m/v) + 0.5) precomputed in
#: Python for every possible v_zero ∈ [1, m] (r12, ADVICE): the LC
#: branch was the ONE non-integer-exact computation in the
#: oracle-checked surface — Spark's Math.log and DuckDB's ln() are not
#: guaranteed correctly rounded, so a 1-ulp divergence could flip the
#: rounded estimate.  The estimate is a pure function of v_zero, so
#: both engines now read the SAME integer literals (Spark via
#: element_at over the literal array since r13 — the r12 broadcast-
#: join form cost an extra exchange — DuckDB via a list_extract over
#: the same array) and no engine libm ever runs.  The remaining double
#: arithmetic (the raw branch's mul/div and its <= 2.5m gate) is
#: IEEE-mandated correctly rounded, hence engine-exact.
_HLL_LC_USERS = [
    int(math.floor(HLL_M * math.log(HLL_M / v) + 0.5))
    for v in range(1, HLL_M + 1)
]


def _hll_rank_case() -> str:
    """Shared CASE text: rank = 1 + leading-zeros of the 48-bit tail
    `tail` = 49 - bit_length(tail), via 48 explicit threshold WHENs
    (no log2 — float-free and engine-agreed)."""
    whens = " ".join(
        f"WHEN tail >= {1 << (b - 1)} THEN {_HLL_TAIL_BITS + 1 - b}"
        for b in range(_HLL_TAIL_BITS, 0, -1)
    )
    return f"CASE {whens} ELSE {_HLL_TAIL_BITS + 1} END"


def sketch_hll_mulmod_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type approximate distinct users from a hand-rolled,
    engine-reproducible HLL, built as per-day partials and merged by
    register-wise max — the persistable incremental-rollup shape.

    Stages (all built-in ops, one corpus scan):
      1. hash: one md5 per event row → (register, rank);
      2. daily partials: max rank per (type, day, register) — what a
         production pipeline would PERSIST next to each day partition;
      3. merge: max across days per (type, register) — never re-reads
         raw events;
      4. estimate: scaled-BIGINT register sum → α_m·m²·2^49/S, with
         the standard linear-counting branch when E ≤ 2.5m and empty
         registers exist.
    Output carries the exact sketch state (v_zero, s_scaled) alongside
    the rounded estimate, so the oracle check covers the sketch
    bit-for-bit, not just the final number."""
    e = table(spark, sf_dir, "events")
    hashed = e.select(
        "event_type",
        F.date_trunc("DAY", "ts").alias("day"),
        F.expr(_cm_hashed("CAST(user_id AS STRING)", "DIV")).alias("h"),
    ).select(
        "event_type",
        "day",
        (F.col("h") % HLL_M).alias("reg"),
        F.expr(f"h DIV {HLL_M}").alias("tail"),
    )
    daily = (
        hashed.withColumn("rank", F.expr(_hll_rank_case()))
        .groupBy("event_type", "day", "reg")
        .agg(F.max("rank").alias("r"))
    )
    merged = daily.groupBy("event_type", "reg").agg(F.max("r").alias("r"))
    state = merged.groupBy("event_type").agg(
        (F.lit(HLL_M) - F.count("*")).alias("v_zero"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_TAIL_BITS + 1} - r)"))
        .alias("s_present"),
    )
    days = daily.select("event_type", "day").distinct().groupBy(
        "event_type"
    ).agg(F.count("*").alias("days_merged"))
    est_raw = F.lit(_HLL_ALPHA_M2) * F.lit(float(1 << (_HLL_TAIL_BITS + 1))) / F.col("s_scaled")
    # linear counting via the shared Python-literal lookup (see
    # _HLL_LC_USERS) — element_at over the literal array, the exact
    # mirror of the oracle's list_extract, no engine log().  r13: this
    # replaces the r12 broadcast-join form — same integers, same
    # results (verified row-identical), but the join added a broadcast
    # exchange + an extra stage that cost ~2x on this sub-second query
    # (quiet best-of-3 1.73 vs 0.89 s at sf0.1); the array literal is
    # a foldable constant evaluated only on the ~|event_type| state
    # rows.  The v_zero > 0 CASE guard precedes element_at, so the
    # ANSI out-of-bounds throw on index 0 is unreachable (CASE
    # branches evaluate lazily), and v_zero <= m-1 < len(array) since
    # a state row exists only when >= 1 register is present.
    lc_arr = "array({})".format(
        ", ".join(f"{u}L" for u in _HLL_LC_USERS)
    )
    users = F.when(
        (est_raw <= 2.5 * HLL_M) & (F.col("v_zero") > 0),
        F.expr(f"element_at({lc_arr}, CAST(v_zero AS INT))"),
    ).otherwise(F.floor(est_raw + F.lit(0.5)).cast("long"))
    return (
        state.withColumn(
            "s_scaled",
            F.col("s_present")
            + F.col("v_zero") * F.lit(1 << (_HLL_TAIL_BITS + 1)),
        )
        .join(days, "event_type")
        .select(
            "event_type",
            "days_merged",
            "v_zero",
            "s_scaled",
            users.alias("approx_users"),
        )
        .orderBy("event_type")
    )


def _hll_oracle() -> str:
    """DuckDB twin — same md5 parse, same rank CASE, same scaled-BIGINT
    register sum, same linear-counting branch."""
    shift = _HLL_TAIL_BITS + 1
    return f"""
WITH hashed AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         {_cm_hashed("CAST(user_id AS VARCHAR)", '//')} % {HLL_M} AS reg,
         {_cm_hashed("CAST(user_id AS VARCHAR)", '//')} // {HLL_M} AS tail
  FROM events
),
daily AS (
  SELECT event_type, day, reg, MAX({_hll_rank_case()}) AS r
  FROM hashed GROUP BY event_type, day, reg
),
merged AS (
  SELECT event_type, reg, MAX(r) AS r FROM daily GROUP BY event_type, reg
),
state AS (
  SELECT event_type,
         {HLL_M} - COUNT(*) AS v_zero,
         SUM((CAST(1 AS BIGINT) << ({shift} - r))) AS s_present
  FROM merged GROUP BY event_type
),
days AS (
  SELECT event_type, COUNT(*) AS days_merged
  FROM (SELECT DISTINCT event_type, day FROM daily) GROUP BY event_type
),
full_state AS (
  SELECT s.event_type, d.days_merged, s.v_zero,
         CAST(s.s_present + s.v_zero * (CAST(1 AS BIGINT) << {shift})
              AS BIGINT) AS s_scaled
  FROM state s JOIN days d USING (event_type)
)
SELECT event_type, days_merged, v_zero, s_scaled,
       CASE WHEN CAST({_HLL_ALPHA_M2!r} AS DOUBLE) * {float(1 << shift)!r}
                   / s_scaled <= 2.5 * {HLL_M}
              AND v_zero > 0
            THEN list_extract([{", ".join(map(str, _HLL_LC_USERS))}],
                              CAST(v_zero AS INTEGER))
            ELSE CAST(floor(CAST({_HLL_ALPHA_M2!r} AS DOUBLE)
                            * {float(1 << shift)!r} / s_scaled + 0.5)
                      AS BIGINT)
       END AS approx_users
FROM full_state
ORDER BY event_type
"""


# --------------------------------------------------------------------------
# Mergeable QUANTILE sketch — completing the classic sketch trio
# (distinct count = HLL above, frequency = count-min above, quantiles
# = here).  The construction is a decimal-log histogram: a value's bin
# is (digit count, leading two digits) of its exact cent amount, so
# every bin spans a relative range of 1/lead2 ≤ 10% (lead2 ∈ 10..99)
# and the whole sketch is a few hundred integer counters regardless
# of data volume.  Everything
# is integer/string arithmetic on the exact fixed-point cents — no
# log(), no float binning — so both engines place every row in the
# same bin and the sketch state is engine-exact (the same discipline
# as the HLL's scaled-BIGINT register sum).
#
# Mergeable shape: per-month partial bin counts (what a pipeline
# would persist per partition), merged by plain addition; quantile
# answers read the merged cumulative curve.  Guarantee: the true
# q-quantile lies INSIDE the reported bin (cum-count bracketing is
# exact), so est error ≤ the bin's relative width — asserted against
# exact percentiles in tests/test_temporal_sketches.py.
QUANTILE_QS = (50, 90, 99)


def sketch_logbin_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P50/P90/P99 of lineitem extended price from a merged decimal-log
    histogram: (q_pct, bin_lo_cents, bin_hi_cents, est_value, n_rows,
    months_merged)."""
    li = table(spark, sf_dir, "lineitem")
    binned = li.select(
        F.date_trunc("MONTH", "l_shipdate").alias("month"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("c"),
    ).select(
        "month",
        F.length(F.col("c").cast("string")).alias("d"),
        F.substring(F.col("c").cast("string"), 1, 2)
        .cast("long")
        .alias("lead2"),
    )
    partial = binned.groupBy("month", "d", "lead2").agg(
        F.count("*").alias("cnt")
    )
    merged = partial.groupBy("d", "lead2").agg(F.sum("cnt").alias("cnt"))
    # the windows below run over the MERGED sketch (≤ ~15·90 bins), so
    # the single-partition global window is bounded — the w12 pattern
    w = Window.orderBy("d", "lead2").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = merged.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "n_rows", F.sum("cnt").over(Window.partitionBy())
    )
    qs = spark.range(1).select(
        F.explode(F.array(*[F.lit(q) for q in QUANTILE_QS])).alias("q_pct")
    )
    # smallest bin whose cumulative count reaches q·n — exact integers
    hit = cum.crossJoin(F.broadcast(qs)).where(
        F.col("cum") * 100 >= F.col("q_pct") * F.col("n_rows")
    )
    best = hit.groupBy("q_pct").agg(
        F.min(F.struct("d", "lead2")).alias("b"),
        F.first("n_rows").alias("n_rows"),
    )
    pow10 = F.expr(
        "CAST(pow(10, greatest(b.d - 2, 0)) AS BIGINT)"
    )  # exact: d ≤ 15 digits of cents
    lo = F.col("b.lead2") * pow10
    hi = (F.col("b.lead2") + 1) * pow10 - 1
    months_df = partial.select("month").distinct().agg(
        F.count("*").alias("months_merged")
    )
    return (
        best.crossJoin(F.broadcast(months_df))
        .select(
            "q_pct",
            lo.alias("bin_lo_cents"),
            hi.alias("bin_hi_cents"),
            _fr((lo + hi + 1) / F.lit(2.0) / F.lit(100.0), 4).alias(
                "est_value"
            ),
            "n_rows",
            "months_merged",
        )
        .orderBy("q_pct")
    )


SKETCH_LOGBIN_ORACLE = f"""
WITH binned AS (
  SELECT date_trunc('month', l_shipdate) AS month,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS c
  FROM lineitem
),
keyed AS (
  SELECT month, length(CAST(c AS VARCHAR)) AS d,
         CAST(substr(CAST(c AS VARCHAR), 1, 2) AS BIGINT) AS lead2
  FROM binned
),
partial AS (
  SELECT month, d, lead2, COUNT(*) AS cnt FROM keyed GROUP BY month, d, lead2
),
merged AS (
  SELECT d, lead2, CAST(SUM(cnt) AS BIGINT) AS cnt
  FROM partial GROUP BY d, lead2
),
cum AS (
  SELECT d, lead2, cnt,
         SUM(cnt) OVER (ORDER BY d, lead2 ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(cnt) OVER () AS n_rows
  FROM merged
),
qs AS (SELECT UNNEST([{", ".join(str(q) for q in QUANTILE_QS)}]) AS q_pct),
hit AS (
  SELECT q_pct, d, lead2, n_rows FROM cum CROSS JOIN qs
  WHERE cum * 100 >= q_pct * n_rows
),
best AS (
  SELECT q_pct,
         MIN(struct_pack(d := d, lead2 := lead2)) AS b,
         CAST(ANY_VALUE(n_rows) AS BIGINT) AS n_rows
  FROM hit GROUP BY q_pct
),
months AS (
  SELECT COUNT(*) AS months_merged
  FROM (SELECT DISTINCT month FROM partial)
),
shaped AS (
  SELECT q_pct,
         b.lead2 * CAST(pow(10, greatest(b.d - 2, 0)) AS BIGINT)
           AS bin_lo_cents,
         (b.lead2 + 1) * CAST(pow(10, greatest(b.d - 2, 0)) AS BIGINT) - 1
           AS bin_hi_cents,
         n_rows
  FROM best
)
SELECT q_pct, bin_lo_cents, bin_hi_cents,
       floor((bin_lo_cents + bin_hi_cents + 1) / 2.0 / 100.0
             * 10000.0 + 0.5) / 10000.0 AS est_value,
       n_rows, months_merged
FROM shaped CROSS JOIN months
ORDER BY q_pct
"""


QUERIES = {
    "sketch_users_per_type": sketch_users_per_type,
    "sketch_daily_merge_total": sketch_daily_merge_total,
    "sketch_cm_heavy_hitters": sketch_cm_heavy_hitters,
    "sketch_approx_topk_tokens": sketch_approx_topk_tokens,
    "sketch_hll_mulmod_merge": sketch_hll_mulmod_merge,
    "sketch_logbin_quantiles": sketch_logbin_quantiles,
}

ORACLE: dict[str, str] = {
    # sketch_users_per_type / sketch_daily_merge_total /
    # sketch_approx_topk_tokens stay rows-only BY DESIGN: Datasketches
    # HLL and approx_top_k estimates are implementation-defined, so no
    # independent engine can reproduce them; accuracy is asserted vs
    # exact counts in tests instead.  The two below are the r11 flips:
    # deterministic md5-mulmod constructions both engines compute
    # bit-for-bit.
    "sketch_cm_heavy_hitters": _cm_oracle(),
    "sketch_hll_mulmod_merge": _hll_oracle(),
    "sketch_logbin_quantiles": SKETCH_LOGBIN_ORACLE,
}
