"""PNG figure sink — the engine-side twin of the reference's matplotlib
blocks (S9, `spark_eda.py:335-459,523-562,624-659,703-741`: 5 figures
of up to 4 panels, each plotting a small aggregate).

Figures are inherently driver-side artifacts: the reference collects
each aggregate and hands it to matplotlib; this sink collects the SAME
small aggregates (bounded-cardinality chart grains — years, months,
bins — never fact tables) and renders minimalist raster charts in the
reference's four mark types — bar, line (trend panels), scatter
(sampled panel), and pie (share panel) — with axes and gridlines but
no text labels, encoded as a valid PNG with only the standard library
(zlib + struct).  Deployments that ship matplotlib can swap the
`render_*` functions for a full renderer — the sink
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

# 8-bit RGB palette (background, axis, gridline, bar fill).  Line,
# scatter, and pie marks use their own colors so the decode-back
# geometry tests can identify each mark unambiguously.
_BG = (255, 255, 255)
_AXIS = (40, 40, 40)
_GRID = (220, 220, 220)
_BAR = (66, 133, 244)
_LINE = (219, 68, 55)
_DOT = (15, 157, 88)
#: pie slice fills, cycled (adjacent slices never share a color for
#: reasonable slice counts)
_PIE = [
    (66, 133, 244),
    (219, 68, 55),
    (244, 180, 0),
    (15, 157, 88),
    (171, 71, 188),
    (0, 172, 193),
]


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


def _blank_canvas(width: int, height: int, margin: int):
    """White grid with three horizontal gridlines and left/bottom axes
    painted last by _finish_axes — shared chrome for bar/line/scatter."""
    grid = [[_BG] * width for _ in range(height)]
    plot_h = height - 2 * margin
    for gy in (0.25, 0.5, 0.75):
        y = margin + int(plot_h * (1 - gy))
        for x in range(margin, width - margin):
            grid[y][x] = _GRID
    return grid


def _finish_axes(grid, width: int, height: int, margin: int):
    for y in range(margin, height - margin + 1):  # left axis
        grid[y][margin] = _AXIS
    for x in range(margin, width - margin):  # bottom axis
        grid[height - margin][x] = _AXIS
    return [b"".join(bytes(px) for px in row) for row in grid]


def _check_cardinality(n: int, what: str) -> None:
    if n == 0:
        raise ValueError("no rows to plot")
    if n > MAX_BARS:
        raise ValueError(
            f"{n} {what} exceeds MAX_BARS={MAX_BARS}: figure inputs "
            "must be bounded chart grains, not fact tables"
        )


def render_line_chart(
    values: list[float], width: int = 320, height: int = 200
) -> list[bytes]:
    """Raster rows for a line chart: one vertex per value at the slot
    center (same x layout as the bar renderer), consecutive vertices
    joined by a 2-px-thick linearly-interpolated polyline.  Matches
    the reference's trend panels (spark_eda.py:368,707-731)."""
    _check_cardinality(len(values), "points")
    vals = [max(0.0, float(v)) for v in values]
    vmax = max(vals) or 1.0
    margin = 10
    plot_w, plot_h = width - 2 * margin, height - 2 * margin
    n = len(vals)
    slot = plot_w // n
    pts = [
        (
            margin + i * slot + slot // 2,
            margin + int(plot_h * (1 - v / vmax)),
        )
        for i, v in enumerate(vals)
    ]
    grid = _blank_canvas(width, height, margin)

    def stamp(x: int, y: int) -> None:
        for dy in (0, 1):
            for dx in (0, 1):
                yy, xx = y + dy, x + dx
                if margin <= xx < width - margin and 0 <= yy < height:
                    grid[yy][xx] = _LINE

    for (x0, y0), (x1, y1) in zip(pts, pts[1:]):
        steps = max(abs(x1 - x0), abs(y1 - y0), 1)
        for s in range(steps + 1):
            stamp(
                x0 + (x1 - x0) * s // steps,
                y0 + (y1 - y0) * s // steps,
            )
    if n == 1:
        stamp(*pts[0])
    return _finish_axes(grid, width, height, margin)


def render_scatter_chart(
    points: list[tuple[float, float]], width: int = 320, height: int = 200
) -> list[bytes]:
    """Raster rows for a scatter plot of (x, y) pairs: each point is a
    3×3 dot, axes normalized to the data's min/max range.  Matches the
    reference's sampled price-vs-owners panel (spark_eda.py:551,644)."""
    _check_cardinality(len(points), "points")
    xs = [float(x) for x, _ in points]
    ys = [max(0.0, float(y)) for _, y in points]
    xmin, xmax = min(xs), max(xs)
    ymax = max(ys) or 1.0
    xspan = (xmax - xmin) or 1.0
    margin = 10
    plot_w, plot_h = width - 2 * margin, height - 2 * margin
    grid = _blank_canvas(width, height, margin)
    for x, y in zip(xs, ys):
        cx = margin + int((plot_w - 1) * (x - xmin) / xspan)
        cy = margin + int((plot_h - 1) * (1 - y / ymax))
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                yy, xx = cy + dy, cx + dx
                if margin < xx < width - margin and 0 <= yy < height - margin:
                    grid[yy][xx] = _DOT
    return _finish_axes(grid, width, height, margin)


def render_pie_chart(
    values: list[float], width: int = 200, height: int = 200
) -> list[bytes]:
    """Raster rows for a pie chart: slices proportional to each value's
    share, filled clockwise from 12 o'clock with the cycled _PIE
    palette.  Matches the reference's share panel (spark_eda.py:653).
    Zero-total inputs render a single full slice (share undefined)."""
    import math

    _check_cardinality(len(values), "slices")
    vals = [max(0.0, float(v)) for v in values]
    total = sum(vals)
    if total <= 0:
        vals, total = [1.0], 1.0
    bounds = []
    acc = 0.0
    for v in vals:
        acc += v
        bounds.append(acc / total)
    margin = 10
    cx, cy = width / 2.0, height / 2.0
    radius = min(width, height) / 2.0 - margin
    grid = [[_BG] * width for _ in range(height)]
    for yy in range(height):
        for xx in range(width):
            dx, dy = xx + 0.5 - cx, yy + 0.5 - cy
            if dx * dx + dy * dy > radius * radius:
                continue
            # clockwise angle share from 12 o'clock in [0, 1)
            t = (math.atan2(dx, -dy)) / (2 * math.pi) % 1.0
            slice_i = next(
                i for i, b in enumerate(bounds) if t < b or b == bounds[-1]
            )
            grid[yy][xx] = _PIE[slice_i % len(_PIE)]
    return [b"".join(bytes(px) for px in row) for row in grid]


def save_chart_png(
    df: DataFrame,
    value_col: str,
    path: str,
    order_col: str | None = None,
    mark: str = "bar",
    x_col: str | None = None,
    width: int = 320,
    height: int = 200,
) -> int:
    """Render one mark per row of a SMALL aggregate DataFrame (ordered
    by `order_col` when given) and write a PNG.  `mark` selects the
    renderer: 'bar', 'line', 'pie' (value series), or 'scatter'
    (requires `x_col` for the abscissa).  Returns the row count.  The
    collect is the figure contract's driver edge — inputs are bounded
    chart grains (see module docstring)."""
    if order_col is not None:
        df = df.orderBy(order_col)
    if mark == "scatter":
        if x_col is None:
            raise ValueError("scatter mark requires x_col")
        rows = df.select(x_col, value_col).collect()
        pts = [
            (r[0], r[1])
            for r in rows
            if r[0] is not None and r[1] is not None
        ]
        write_png(path, render_scatter_chart(pts, width, height))
        return len(pts)
    rows = df.select(value_col).collect()
    values = [r[0] if r[0] is not None else 0.0 for r in rows]
    renderer = {
        "bar": render_bar_chart,
        "line": render_line_chart,
        "pie": render_pie_chart,
    }.get(mark)
    if renderer is None:
        raise ValueError(f"unknown mark {mark!r}")
    write_png(path, renderer(values, width, height))
    return len(values)


def save_bar_chart_png(
    df: DataFrame,
    value_col: str,
    path: str,
    order_col: str | None = None,
    width: int = 320,
    height: int = 200,
) -> int:
    """Bar-mark shortcut (the original S9 surface)."""
    return save_chart_png(
        df, value_col, path, order_col, "bar", None, width, height
    )


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
    a driver would call, one PNG each, each with the reference's MARK
    TYPE (r6 verdict item 5): trend panels are lines
    (spark_eda.py:368,707-731), the sampled price panel is a scatter
    (:551,644), the share panel is a pie (:653), histograms/rankings
    stay bars.  Returns {figure: path}."""
    from pyspark.sql import functions as F

    from ..operators.core import (
        a1_word_revenue,
        a3_year_trend,
        a9_month_distribution,
        a10_retailprice_histogram,
        o6_seeded_sample,
    )
    from ..operators.games import genre_revenue  # noqa: F401  (cited twin)
    from ..operators.windows import w1_pareto_supplier_share

    os.makedirs(out_dir, exist_ok=True)
    # (frame, value_col, order_col, mark, x_col)
    figures = {
        # spark_eda.py:368 — year trend is a LINE
        "year_trend": (
            a3_year_trend(spark, sf_dir), "order_count", "o_year",
            "line", None,
        ),
        "month_distribution": (
            a9_month_distribution(spark, sf_dir), "order_count", "o_month",
            "bar", None,
        ),
        "price_histogram": (
            a10_retailprice_histogram(spark, sf_dir), "part_count",
            "price_range", "bar", None,
        ),
        "word_revenue": (
            a1_word_revenue(spark, sf_dir).limit(15), "total_revenue",
            None, "bar", None,
        ),
        # spark_eda.py:707-731 — the cumulative-share panel is a LINE
        "supplier_pareto": (
            w1_pareto_supplier_share(spark, sf_dir).limit(20),
            "total_revenue", None, "line", None,
        ),
        # spark_eda.py:551 — sampled price scatter (seeded-sample twin;
        # line number within order as abscissa, price as ordinate)
        "price_sample_scatter": (
            o6_seeded_sample(spark, sf_dir)
            .limit(500)
            .select(
                (F.col("l_orderkey") % 1000).cast("double").alias("xkey"),
                F.col("l_extendedprice").cast("double").alias("price"),
            ),
            "price", None, "scatter", "xkey",
        ),
        # spark_eda.py:653 — revenue share PIE over the top words
        "revenue_share_pie": (
            a1_word_revenue(spark, sf_dir).limit(8), "total_revenue",
            None, "pie", None,
        ),
        # round-6 DQ dashboards (beyond the reference's five blocks):
        # per-column null rates and the dedup survivorship funnel
        "dq_completeness": (
            _completeness_chart_frame(spark, sf_dir),
            "completeness_pct", None, "bar", None,
        ),
        "dedup_funnel": (
            _funnel_chart_frame(spark, sf_dir), "n_docs", "tier",
            "bar", None,
        ),
    }
    out: dict[str, str] = {}
    for name, (df, value_col, order_col, mark, x_col) in figures.items():
        p = os.path.join(out_dir, f"{name}.png")
        save_chart_png(df, value_col, p, order_col, mark, x_col)
        out[name] = p
    return out
