"""PNG figure sink — the engine-side twin of the reference's matplotlib
blocks (S9, `spark_eda.py:335-459,523-562,624-659,703-741`: 5 figures
of up to 4 panels, each plotting a small aggregate).

Figures are inherently driver-side artifacts: the reference collects
each aggregate and hands it to matplotlib; this sink collects the SAME
small aggregates (bounded-cardinality chart grains — years, months,
bins — never fact tables) and renders a minimalist raster bar chart
(bars, axes, gridlines; no text labels) encoded as a valid PNG with
only the standard library (zlib + struct).  Deployments that ship
matplotlib can swap `render_bar_chart` for a full renderer — the sink
CONTRACT the engine provides is: aggregate DataFrame → PNG file, with
the per-figure query surface already green under the oracle gate.

Scale note: the `.collect()` here is the one place the engine pulls
rows to the driver by design — the inputs are chart grains whose
cardinality is bounded by construction (≤ a few hundred rows); the
cap below makes that bound explicit rather than hoped-for.
"""

from __future__ import annotations

import os
import struct
import zlib

from pyspark.sql import DataFrame, SparkSession

#: refuse to render a "chart" of unbounded cardinality — a figure with
#: more bars than pixels is a query bug, not a plot.
MAX_BARS = 512

# 8-bit RGB palette (background, axis, gridline, bar fill)
_BG = (255, 255, 255)
_AXIS = (40, 40, 40)
_GRID = (220, 220, 220)
_BAR = (66, 133, 244)


def write_png(path: str, rows: list[bytes]) -> None:
    """Encode raster `rows` (each ``width*3`` RGB bytes) as a PNG.
    Pure stdlib: IHDR/IDAT/IEND chunks, filter 0 scanlines, zlib."""
    height = len(rows)
    width = len(rows[0]) // 3

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + r for r in rows)
    with open(path, "wb") as fh:
        fh.write(b"\x89PNG\r\n\x1a\n")
        fh.write(chunk(b"IHDR", ihdr))
        fh.write(chunk(b"IDAT", zlib.compress(raw, 9)))
        fh.write(chunk(b"IEND", b""))


def render_bar_chart(
    values: list[float], width: int = 320, height: int = 200
) -> list[bytes]:
    """Raster rows for a bar chart of `values`: white canvas, left and
    bottom axes, three horizontal gridlines, equal-width bars scaled to
    the max value.  Negative-free semantics (chart grains here are
    counts/revenues); values are clipped at 0."""
    if not values:
        raise ValueError("no rows to plot")
    if len(values) > MAX_BARS:
        raise ValueError(
            f"{len(values)} bars exceeds MAX_BARS={MAX_BARS}: figure "
            "inputs must be bounded chart grains, not fact tables"
        )
    vals = [max(0.0, float(v)) for v in values]
    vmax = max(vals) or 1.0
    margin = 10
    plot_w, plot_h = width - 2 * margin, height - 2 * margin
    n = len(vals)
    slot = plot_w // n
    bar_w = max(1, (slot * 3) // 4)

    # paint into a mutable per-pixel grid, then pack rows
    grid = [[_BG] * width for _ in range(height)]
    for gy in (0.25, 0.5, 0.75):
        y = margin + int(plot_h * (1 - gy))
        for x in range(margin, width - margin):
            grid[y][x] = _GRID
    for i, v in enumerate(vals):
        bar_h = int(round(plot_h * v / vmax))
        x0 = margin + i * slot + (slot - bar_w) // 2
        for y in range(height - margin - bar_h, height - margin):
            for x in range(x0, min(x0 + bar_w, width - margin)):
                grid[y][x] = _BAR
    for y in range(margin, height - margin + 1):  # left axis
        grid[y][margin] = _AXIS
    for x in range(margin, width - margin):  # bottom axis
        grid[height - margin][x] = _AXIS
    return [b"".join(bytes(px) for px in row) for row in grid]


def save_bar_chart_png(
    df: DataFrame,
    value_col: str,
    path: str,
    order_col: str | None = None,
    width: int = 320,
    height: int = 200,
) -> int:
    """Render one bar per row of a SMALL aggregate DataFrame (ordered
    by `order_col` when given) and write a PNG.  Returns the bar
    count.  The collect is the figure contract's driver edge — inputs
    are bounded chart grains (see module docstring)."""
    if order_col is not None:
        df = df.orderBy(order_col)
    rows = df.select(value_col).collect()
    values = [r[0] if r[0] is not None else 0.0 for r in rows]
    write_png(path, render_bar_chart(values, width, height))
    return len(values)


def save_panel_grid_png(
    panels: list[list[float]],
    path: str,
    panel_width: int = 320,
    panel_height: int = 200,
    cols: int = 2,
) -> None:
    """Compose up to-4-panel figures (the reference's figure shape) by
    tiling individual bar charts into one raster."""
    import math

    n = len(panels)
    rows_n = math.ceil(n / cols)
    blank = [bytes(_BG) * panel_width] * panel_height
    rasters = [
        render_bar_chart(p, panel_width, panel_height) for p in panels
    ]
    rasters += [blank] * (rows_n * cols - n)
    out: list[bytes] = []
    for r in range(rows_n):
        for y in range(panel_height):
            out.append(
                b"".join(rasters[r * cols + c][y] for c in range(cols))
            )
    write_png(path, out)


def _completeness_chart_frame(spark: SparkSession, sf_dir: str):
    """The 12 least-complete audited columns as COMPLETENESS pct
    (100 − null rate; 0 for an empty table) — inverted so the healthy
    all-zero-nulls corpus still renders full bars instead of a blank
    chart."""
    from pyspark.sql import functions as F

    from ..operators.extended import dq_completeness_profile

    return (
        dq_completeness_profile(spark, sf_dir)
        .select(
            F.concat_ws(".", "table_name", "column_name").alias("col"),
            (100.0 - F.coalesce("null_pct", F.lit(100.0))).alias(
                "completeness_pct"
            ),
        )
        .orderBy("completeness_pct", "col")
        .limit(12)
    )


def _funnel_chart_frame(spark: SparkSession, sf_dir: str):
    from ..operators.dedup import dedup_survivorship_funnel

    return dedup_survivorship_funnel(spark, sf_dir).select("tier", "n_docs")


def save_reference_figures(
    spark: SparkSession, sf_dir: str, out_dir: str
) -> dict[str, str]:
    """The S9 surface end-to-end: render the engine twins of the
    reference's five figure blocks from the SAME oracle-green queries
    a driver would call, one PNG each.  Returns {figure: path}."""
    from ..operators.core import (
        a1_word_revenue,
        a3_year_trend,
        a9_month_distribution,
        a10_retailprice_histogram,
    )
    from ..operators.games import genre_revenue  # noqa: F401  (cited twin)
    from ..operators.windows import w1_pareto_supplier_share

    os.makedirs(out_dir, exist_ok=True)
    figures = {
        "year_trend": (a3_year_trend(spark, sf_dir), "order_count", "o_year"),
        "month_distribution": (
            a9_month_distribution(spark, sf_dir),
            "order_count",
            "o_month",
        ),
        "price_histogram": (
            a10_retailprice_histogram(spark, sf_dir),
            "part_count",
            "price_range",
        ),
        "word_revenue": (
            a1_word_revenue(spark, sf_dir).limit(15),
            "total_revenue",
            None,
        ),
        "supplier_pareto": (
            w1_pareto_supplier_share(spark, sf_dir).limit(20),
            "total_revenue",
            None,
        ),
        # round-6 DQ dashboards (beyond the reference's five blocks):
        # per-column null rates and the dedup survivorship funnel
        "dq_completeness": (
            _completeness_chart_frame(spark, sf_dir),
            "completeness_pct",
            None,
        ),
        "dedup_funnel": (
            _funnel_chart_frame(spark, sf_dir),
            "n_docs",
            "tier",
        ),
    }
    out: dict[str, str] = {}
    for name, (df, value_col, order_col) in figures.items():
        p = os.path.join(out_dir, f"{name}.png")
        save_bar_chart_png(df, value_col, p, order_col)
        out[name] = p
    return out
