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
    assert set(out) == {
        "year_trend",
        "month_distribution",
        "price_histogram",
        "word_revenue",
        "supplier_pareto",
        "dq_completeness",
        "dedup_funnel",
    }
    for path in out.values():
        w, h, rows = _decode_png(path)
        assert (w, h) == (320, 200)
        assert sum(_bar_heights(rows, w, h)) > 0, f"{path} has no bars"
