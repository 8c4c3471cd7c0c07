"""Dashboard figure rendering (reference nb cells 23/25): the PNGs build
from the aggregate queries, are structurally valid, and are deterministic
(committable artifacts that diff cleanly)."""

from __future__ import annotations

import struct
import zlib

from etl_power_bi_dashboard_spark.reporting import build_dashboard, render_bar_chart
from etl_power_bi_dashboard_spark.reporting.charts import Canvas

from .conftest import SF_DIR

EXPECTED = [
    "sales_by_month.png",
    "sales_by_category.png",
    "sales_by_state.png",
    "review_distribution.png",
    "dashboard.png",
]


def _read_ihdr(path) -> tuple[int, int]:
    data = path.read_bytes()
    assert data[:8] == b"\x89PNG\r\n\x1a\n", "bad PNG signature"
    assert data[12:16] == b"IHDR"
    w, h = struct.unpack(">II", data[16:24])
    # IDAT payload must decompress to h rows of (1 filter byte + 3w pixels)
    idat = b""
    off = 8
    while off < len(data):
        (ln,) = struct.unpack(">I", data[off : off + 4])
        tag = data[off + 4 : off + 8]
        if tag == b"IDAT":
            idat += data[off + 8 : off + 8 + ln]
        off += 12 + ln
    assert len(zlib.decompress(idat)) == h * (1 + 3 * w)
    return w, h


def test_dashboard_figures_build(spark, tmp_path):
    paths = build_dashboard(spark, SF_DIR, str(tmp_path))
    assert [p.rsplit("/", 1)[1] for p in paths] == EXPECTED
    dims = {}
    for name in EXPECTED:
        f = tmp_path / name
        assert f.stat().st_size > 500, f"{name} suspiciously small"
        dims[name] = _read_ihdr(f)
    # the composite is the 2x2 tiling of the four panels
    assert dims["dashboard.png"] == (
        dims["sales_by_month.png"][0] + dims["sales_by_category.png"][0],
        dims["sales_by_month.png"][1] + dims["review_distribution.png"][1],
    )


def test_render_is_deterministic(tmp_path):
    a = render_bar_chart(["A", "B", "C"], [3.0, 1.0, 2.0], "T", "X", "Y")
    b = render_bar_chart(["A", "B", "C"], [3.0, 1.0, 2.0], "T", "X", "Y")
    assert a.to_png() == b.to_png()


def test_canvas_text_and_bounds():
    c = Canvas(50, 20)
    before = bytes(c.buf)
    c.text(2, 2, "AB 19%")
    assert bytes(c.buf) != before
    # drawing fully out of bounds must not wrap or crash
    c2 = Canvas(10, 10)
    c2.rect(-5, -5, -1, -1, (0, 0, 0))
    c2.text(100, 100, "Z")


def test_raster_chart_handles_empty_data(tmp_path):
    """An empty aggregate must yield a titled placeholder chart, not a
    max()/ZeroDivision crash that kills the whole dashboard build."""
    from etl_power_bi_dashboard_spark.reporting.charts import render_bar_chart

    p = str(tmp_path / "empty.png")
    c = render_bar_chart([], [], "Nothing", "x", "y", p)
    assert c.w > 0 and len(c.buf) == c.w * c.h * 3
    assert (tmp_path / "empty.png").exists()


def test_canvas_blit_clamps_both_axes():
    """A blit overlapping the right edge must clip, not wrap into the
    next row or grow the buffer past w*h*3; negative offsets clip too."""
    from etl_power_bi_dashboard_spark.reporting.charts import Canvas

    big = Canvas(10, 10)
    small = Canvas(5, 5)
    small.rect(0, 0, 4, 4, (255, 0, 0))
    big.blit(small, 8, 8)
    assert len(big.buf) == 10 * 10 * 3
    # row 8: pixels 8..9 red; row 9's left edge keeps the background
    # (pre-fix, the overflow wrapped source pixels there)
    untouched = Canvas(10, 10)
    red = bytes([255, 0, 0])
    assert bytes(big.buf[(8 * 10 + 8) * 3 :][:3]) == red
    assert (
        bytes(big.buf[(9 * 10 + 0) * 3 :][:3])
        == bytes(untouched.buf[(9 * 10 + 0) * 3 :][:3])
    )
    big2 = Canvas(10, 10)
    big2.blit(small, -2, -2)  # negative offsets: top-left clipped
    assert len(big2.buf) == 10 * 10 * 3
    assert big2.buf[0] == 255  # (0,0) holds small's (2,2)
