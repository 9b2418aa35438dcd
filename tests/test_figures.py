"""PNG figure sink (S9): valid PNGs from aggregate DataFrames with a
pure-stdlib encoder; bar geometry checked by decoding the raster back.
"""

from __future__ import annotations

import struct
import zlib

import pytest

from bigdata_gamedb_etl_spark.sinks import figures as figs


def _decode_png(path):
    data = open(path, "rb").read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    pos, chunks = 8, {}
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        crc = struct.unpack_from(">I", data, pos + 8 + length)[0]
        assert crc == zlib.crc32(tag + payload) & 0xFFFFFFFF
        if tag == b"IDAT":
            idat += payload
        else:
            chunks[tag] = payload
        pos += 12 + length
    w, h, depth, ctype = struct.unpack_from(">IIBB", chunks[b"IHDR"])
    assert (depth, ctype) == (8, 2)
    raw = zlib.decompress(idat)
    stride = 1 + w * 3
    rows = []
    for y in range(h):
        line = raw[y * stride : (y + 1) * stride]
        assert line[0] == 0  # filter 0
        rows.append(line[1:])
    return w, h, rows


def _bar_heights(rows, w, h, margin=10):
    """Count bar-colored pixels per column, return per-column heights."""
    bar = bytes(figs._BAR)
    heights = [0] * w
    for row in rows:
        for x in range(w):
            if row[x * 3 : x * 3 + 3] == bar:
                heights[x] += 1
    return heights


def test_bar_chart_png_geometry(tmp_path):
    p = str(tmp_path / "chart.png")
    figs.write_png(p, figs.render_bar_chart([1.0, 3.0, 2.0], 120, 80))
    w, h, rows = _decode_png(p)
    assert (w, h) == (120, 80)
    heights = _bar_heights(rows, w, h)
    # three distinct bar groups; tallest in the middle, shortest first
    groups = []
    x = 0
    while x < w:
        if heights[x]:
            x2 = x
            while x2 < w and heights[x2]:
                x2 += 1
            groups.append(max(heights[x:x2]))
            x = x2
        else:
            x += 1
    assert len(groups) == 3
    assert groups[1] == max(groups)
    assert groups[0] == min(groups)
    # linear scaling: 3:1 ratio within rounding
    assert abs(groups[1] - 3 * groups[0]) <= 3


def test_bar_chart_rejects_unbounded_grain():
    with pytest.raises(ValueError):
        figs.render_bar_chart([1.0] * (figs.MAX_BARS + 1))
    with pytest.raises(ValueError):
        figs.render_line_chart([1.0] * (figs.MAX_BARS + 1))
    with pytest.raises(ValueError):
        figs.render_pie_chart([1.0] * (figs.MAX_BARS + 1))
    with pytest.raises(ValueError):
        figs.render_scatter_chart([(1.0, 1.0)] * (figs.MAX_BARS + 1))


def _color_pixels(rows, w, color):
    """(x, y) coordinates of pixels matching `color`."""
    key = bytes(color)
    return [
        (x, y)
        for y, row in enumerate(rows)
        for x in range(w)
        if row[x * 3 : x * 3 + 3] == key
    ]


def test_line_chart_png_geometry(tmp_path):
    """Decode-back: the polyline passes through each vertex (slot
    center x, value-scaled y) and spans the gaps between them."""
    p = str(tmp_path / "line.png")
    vals, W, H, margin = [1.0, 3.0, 2.0], 120, 80, 10
    figs.write_png(p, figs.render_line_chart(vals, W, H))
    w, h, rows = _decode_png(p)
    pix = _color_pixels(rows, w, figs._LINE)
    assert pix, "no line pixels rendered"
    plot_w, plot_h = W - 2 * margin, H - 2 * margin
    slot = plot_w // len(vals)
    vmax = max(vals)
    for i, v in enumerate(vals):
        vx = margin + i * slot + slot // 2
        vy = margin + int(plot_h * (1 - v / vmax))
        near = [(x, y) for x, y in pix if abs(x - vx) <= 2 and abs(y - vy) <= 2]
        assert near, f"vertex {i} missing at ({vx},{vy})"
    # continuity: every x column between first and last vertex has ink
    xs = {x for x, _ in pix}
    for x in range(margin + slot // 2, margin + 2 * slot + slot // 2):
        assert x in xs, f"line gap at x={x}"


def test_scatter_chart_png_geometry(tmp_path):
    """Decode-back: each (x, y) point lands as a dot at its normalized
    position; distinct points yield distinct dot clusters."""
    p = str(tmp_path / "scatter.png")
    pts, W, H, margin = [(0.0, 0.0), (5.0, 10.0), (10.0, 5.0)], 120, 80, 10
    figs.write_png(p, figs.render_scatter_chart(pts, W, H))
    w, h, rows = _decode_png(p)
    pix = _color_pixels(rows, w, figs._DOT)
    assert pix
    plot_w, plot_h = W - 2 * margin, H - 2 * margin
    for x, y in pts:
        cx = margin + int((plot_w - 1) * x / 10.0)
        cy = margin + int((plot_h - 1) * (1 - y / 10.0))
        near = [
            (px, py) for px, py in pix if abs(px - cx) <= 2 and abs(py - cy) <= 2
        ]
        assert near, f"point ({x},{y}) missing near ({cx},{cy})"
    # 3 distinct 3x3 dots => at most 27 dot pixels (clipping may trim)
    assert len(pix) <= 27


def test_pie_chart_png_geometry(tmp_path):
    """Decode-back: slice pixel counts are proportional to value
    shares (within rasterization tolerance) and slices use the cycled
    palette in order."""
    p = str(tmp_path / "pie.png")
    vals = [1.0, 1.0, 2.0]  # shares 25%, 25%, 50%
    figs.write_png(p, figs.render_pie_chart(vals, 200, 200))
    w, h, rows = _decode_png(p)
    counts = [
        len(_color_pixels(rows, w, figs._PIE[i])) for i in range(len(vals))
    ]
    total = sum(counts)
    assert total > 5000, "pie disc missing"
    shares = [c / total for c in counts]
    assert abs(shares[0] - 0.25) < 0.03
    assert abs(shares[1] - 0.25) < 0.03
    assert abs(shares[2] - 0.50) < 0.03


def test_panel_grid_composes(tmp_path):
    p = str(tmp_path / "panels.png")
    figs.save_panel_grid_png([[1, 2], [3, 4], [5, 6]], p, 60, 40, cols=2)
    w, h, _ = _decode_png(p)
    assert (w, h) == (120, 80)  # 2x2 grid with one blank slot


def test_reference_figures_end_to_end(spark, sf_dir, tmp_path):
    """The five reference figure blocks plus the round-6 DQ dashboards
    render from the oracle-green aggregate queries — the S9 sink
    surface end to end."""
    out = figs.save_reference_figures(spark, sf_dir, str(tmp_path))
    marks = {
        "year_trend": figs._LINE,
        "month_distribution": figs._BAR,
        "price_histogram": figs._BAR,
        "word_revenue": figs._BAR,
        "supplier_pareto": figs._LINE,
        "price_sample_scatter": figs._DOT,
        "revenue_share_pie": figs._PIE[0],
        "dq_completeness": figs._BAR,
        "dedup_funnel": figs._BAR,
    }
    assert set(out) == set(marks)
    for name, path in out.items():
        w, h, rows = _decode_png(path)
        assert (w, h) == (320, 200)
        assert _color_pixels(rows, w, marks[name]), (
            f"{path} has no {name} mark pixels"
        )
