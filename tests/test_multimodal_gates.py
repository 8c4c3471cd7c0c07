"""Round-12 verdict item 7: make the multimodal capability-gate status
visible in every suite run. The decode/resize/frame-sample stubs
(operators/multimodal.py) raise NotImplementedError for the real codec
because no imaging/av library ships in this container; if the
environment ever gains one, this test's skip reason / pass output says
so without any code change elsewhere."""

from __future__ import annotations

import importlib.util

import pytest

from etl_power_bi_dashboard_spark.operators import multimodal

_REAL_CODEC_LIBS = ("PIL", "av", "cv2", "soundfile", "torchvision")


def _active_libs() -> list[str]:
    return [m for m in _REAL_CODEC_LIBS if importlib.util.find_spec(m)]


def test_codec_gate_status_is_reported():
    """Always runs; states which real-codec libraries are importable
    and that the gates' behavior matches: fake codec works, real codec
    raises exactly when no library is active."""
    active = _active_libs()
    # fake-codec plumbing is always live
    assert multimodal.decode_image(b"abc", codec="fake") == b"abc"
    if not active:
        with pytest.raises(NotImplementedError):
            multimodal.decode_image(b"abc", codec="real")
        pytest.skip(
            "real codecs INACTIVE (none of %s importable); fake-codec "
            "plumbing verified" % (",".join(_REAL_CODEC_LIBS))
        )
    # a library appeared: the stubs are now upgradeable — fail loudly so
    # the real decode path gets wired instead of silently staying fake
    pytest.fail(
        f"real codec libraries now available: {active} — replace the "
        "multimodal stubs with real decode paths (plumbing is ready)"
    )
