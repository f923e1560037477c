"""Frame geometry unit tests (src/av.c:103-303 parity).

The fit maths previously returned the visible (w, h) pair as a
Rational, which silently reduced it by the gcd (702x576 -> 39x32);
these tests pin the un-reduced behaviour.
"""

import numpy as np

from hacktv_tpu.av.frame_ops import (FitConfig, FitSource,
                                     calculate_frame_size)
from hacktv_tpu.rational import Rational


def _cfg(**kw):
    kw.setdefault("width", 702)
    kw.setdefault("height", 576)
    kw.setdefault("display_aspect_ratios", (Rational(4, 3),))
    return FitConfig(**kw)


def test_stretch_is_not_gcd_reduced():
    w, h = calculate_frame_size(_cfg(fit_mode="stretch"),
                                Rational(702, 576), Rational(702, 576))
    assert (w, h) == (702, 576)


def test_fit_letterbox_16x9():
    # 16:9 source into a 4:3 display: full width, 3/4 height
    w, h = calculate_frame_size(_cfg(fit_mode="fit"),
                                Rational(1280, 720), Rational(16, 9))
    assert w == 702
    assert h == 576 * (4 * 9) // (3 * 16)


def test_fit_pillarbox():
    # narrow 1:1 source into 4:3: full height, 3/4 width
    w, h = calculate_frame_size(_cfg(fit_mode="fit"),
                                Rational(500, 500), Rational(1, 1))
    assert h == 576
    assert w == 702 * 3 // 4


def test_fadj_table_applies():
    # 704x576 DVD-style input gets the 704/702 horizontal adjustment
    w, h = calculate_frame_size(_cfg(fit_mode="stretch"),
                                Rational(704, 576), Rational(4, 3))
    assert (w, h) == (702, 576)


class _Solid:
    def __init__(self, w, h):
        self.width, self.height = w, h
        self.interlaced = 0
        self._rgb = np.full((h, w, 3), 200, np.uint8)

    def read_video(self, n):
        return self._rgb

    def read_audio(self, start, count):
        return np.zeros((count, 2), np.int16)

    def eof(self, n):
        return False


def test_fitsource_identity_at_active_size():
    src = _Solid(702, 576)
    fit = FitSource(src, _cfg(fit_mode="stretch"))
    out = fit.read_video(0)
    assert out.shape == (576, 702, 3)
    assert np.array_equal(out, src.read_video(0))


def test_fitsource_letterbox_borders():
    src = _Solid(1280, 720)   # 16:9 at PAR 1:1
    fit = FitSource(src, _cfg(fit_mode="fit"))
    out = fit.read_video(0)
    vh = 576 * (4 * 9) // (3 * 16)
    y0 = (576 - vh) // 2
    assert (out[:y0] == 0).all() and (out[y0 + vh:] == 0).all()
    assert (out[y0:y0 + vh] == 200).all()
