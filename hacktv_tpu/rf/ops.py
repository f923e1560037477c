"""Device-side RF chain operations.

Batch replacements for the reference's per-sample modulator processes:

  - FM video (src/video.c:2299-2335, 3452-3464): phase integral via a
    hierarchical column/line/frame cumsum with mod-2pi at every level so
    f32 holds full precision over multi-frame blocks; the carry across
    blocks is returned per frame for exact host accumulation
  - complex frequency offset rotation (src/video.c:3482-3515) with the
    exact rational offset/fs carrier
  - swap-IQ (src/video.c:3466-3480)

Quantisation mirrors the reference's (phase>>16)*level>>15 chains.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

TWO_PI = np.float32(2.0 * np.pi)


def _fmod2pi(x):
    return x - jnp.floor(x * np.float32(1.0 / (2.0 * np.pi))) * TWO_PI


@dataclass
class FMVideoStatics:
    kd: float            # rad per unit sample: 2*pi*deviation/(fs*32767)
    level_int: int       # round(32767 * fm_level * level)
    lines_per_frame: int
    num: int = 0         # deviation/(fs*32767) as a reduced fraction:
    den: int = 1         # phase/2pi advances by num/den per unit sample


def make_fm_video_statics(deviation: float, level: float, sample_rate: int,
                          lines_per_frame: int) -> FMVideoStatics:
    from fractions import Fraction
    fr = Fraction(deviation).limit_denominator(1 << 20) \
        / (sample_rate * 32767)
    if not (0 < fr.denominator < 2**31):
        raise ValueError("FM deviation/sample-rate ratio too irrational "
                         "for exact phase accumulation")
    return FMVideoStatics(
        kd=2.0 * np.pi * deviation / (sample_rate * 32767.0),
        level_int=int(round(32767 * level)),
        lines_per_frame=lines_per_frame,
        num=fr.numerator, den=fr.denominator)


def _addmod(a, b, den):
    """(a + b) mod den on uint32 lanes; a, b in [0, den), den < 2^31."""
    s = a + b
    return s - jnp.uint32(den) * (s >= jnp.uint32(den)).astype(jnp.uint32)


def fm_energy_dispersal_frame(ed: float, width: int,
                              lines: int) -> np.ndarray | None:
    """One frame of the FM energy-dispersal triangle, int16 [lines, width].

    The reference (src/video.c:2245-2257) runs a Bresenham counter at
    level*4*frequency/sample_rate per sample with frequency framelocked to
    sample_rate/(width*lines) (src/video.c:4573-4581), and offsets each
    composite sample by abs(counter - level*2) - level before the FM LUT
    (src/video.c:2301-2318).  counter(n) = floor(n*4L/P) mod 4L with
    P = width*lines, so the waveform is EXACTLY one frame long — a single
    static per-frame offset pattern covers the whole stream.
    """
    level = int(round(32767 * ed))
    if level == 0:
        return None
    P = width * lines
    n = np.arange(P, dtype=np.int64)
    c = (n * (4 * level)) // P % (4 * level)
    tri = np.abs(c - 2 * level) - level
    return tri.astype(np.int16).reshape(lines, width)


def fm_video_modulate(st: FMVideoStatics, x: jnp.ndarray, r0: jnp.ndarray,
                      tri=None):
    """FM-modulate the baseband block.

    x: [nlines, W] f32 (int16-scaled composite incl. audio subcarriers).
    r0: int32 scalar carry — the cumulative sum of all previous blocks'
    quantised samples, mod `den`.

    The phase integral of the int16 composite is computed EXACTLY: a
    line's sample sum fits int32, and the cross-line accumulation runs
    as a modular prefix scan (phase advances num/den turns per unit
    sample, so only the sum mod den matters).  An f32 cumsum here is
    not an option: its per-line rounding error is deterministic in the
    line content, so the near-identical lines of a field accumulate a
    coherent phase drift (~2.5e-4 rad/line for D-MAC) that the
    reference's int32 phase iteration does not have.  Within a line,
    f32 kd*cumsum is fine — the error resets at every line start.

    Returns (out_i, out_q, r_next).
    """
    B, W = x.shape
    kd = np.float32(st.kd)
    den = st.den

    # The reference modulates the int16-quantised composite
    # (src/video.c:3452-3464 feeds line->output); modulating the float
    # canvas instead leaves a sub-LSB mean offset that integrates into
    # an unbounded phase drift.  Quantise first.
    xq = jnp.round(jnp.clip(x, -32768, 32767)).astype(jnp.int32)
    if tri is not None:
        # energy dispersal: the reference's `sample += tri` is an int16
        # add that WRAPS (src/video.c:2303; sample is int16_t)
        xq = ((xq + tri + 0x8000) & 0xFFFF) - 0x8000
    col_cum = jnp.cumsum(xq, axis=1)                      # exact, inclusive
    T = col_cum[:, -1]                                    # line totals
    Tm = jnp.mod(T, den).astype(jnp.uint32)               # in [0, den)

    incl = jax.lax.associative_scan(lambda a, b: _addmod(a, b, den), Tm)
    r0u = jnp.mod(r0, den).astype(jnp.uint32)
    s_incl = _addmod(incl, r0u, den)
    # exclusive prefix: subtract the line's own total (mod den)
    s_excl = _addmod(s_incl, jnp.uint32(den) - Tm, den)

    # base angle = 2pi * ((num * S) mod den) / den, exact via static
    # double-and-add modular multiplication (all lanes < den < 2^31)
    acc = jnp.zeros_like(s_excl)
    a = s_excl
    n = st.num % den
    while n:
        if n & 1:
            acc = _addmod(acc, a, den)
        n >>= 1
        if n:
            a = _addmod(a, a, den)
    base = acc.astype(jnp.float32) * np.float32(2.0 * np.pi / den)

    # within-line deviation phase: exclusive cumsum in f32 (the sample's
    # own phase step applies before output, src/video.c:2320)
    phi = base[:, None] + kd * col_cum.astype(jnp.float32)
    ci = jnp.cos(phi)
    cq = jnp.sin(phi)
    lvl = np.float32(st.level_int)
    inv = np.float32(1.0 / 32768.0)

    out_i = jnp.floor(jnp.clip(jnp.floor(ci * 32768.0), -32768, 32767) * lvl * inv)
    out_q = jnp.floor(jnp.clip(jnp.floor(cq * 32768.0), -32768, 32767) * lvl * inv)
    return out_i, out_q, s_incl[-1].astype(jnp.int32)


@dataclass
class OffsetStatics:
    cos_x: jnp.ndarray   # [W] rotation table at col+1 (phase advances
    sin_x: jnp.ndarray   # before the first output sample)
    # the reference's first 32767 samples rotate by a tiny int32
    # phasor whose b = phase >> 16 factors are in {-2..0}; emulated
    # exactly per sample and laid out as whole lines
    intro_bi: np.ndarray = None   # [intro_rows, W] int8
    intro_bq: np.ndarray = None


_INT32_MAX = 2**31 - 1
_INTRO = 32767           # samples before the first phase renormalisation
_offset_const_cache: dict = {}


def _offset_consts(offset_hz: int, sample_rate: int):
    """The reference's offset rotator is an int32 phase recurrence
    (src/video.c:3482-3515) whose accumulator starts at magnitude
    INT16_MAX — not INT32_MAX (src/video.c:4596-4598) — so `phase >> 16`
    is in {-1, 0} and the rotated output is ~zero for the first 32767
    samples, until the amplitude-correction branch renormalises the
    phasor to full scale.  From then on the recurrence is a clean
    rotation by the *quantised* delta angle.  Returns
    (datan, ra0): the per-sample angle step atan2(lround(sin d * 2^31-1),
    lround(cos d * 2^31-1)) and the exact phase angle at the first
    renormalisation, obtained by emulating the 32767 truncated cint32
    multiplies with exact integers."""
    key = (int(offset_hz), int(sample_rate))
    hit = _offset_const_cache.get(key)
    if hit is not None:
        return hit
    d = 2.0 * math.pi / sample_rate * offset_hz
    di = int(math.floor(math.cos(d) * _INT32_MAX + 0.5))
    dq_ = math.sin(d) * _INT32_MAX
    dq = int(math.floor(dq_ + 0.5)) if dq_ >= 0 else -int(
        math.floor(-dq_ + 0.5))
    datan = math.atan2(dq, di)
    pi_, pq = 32767, 0
    for _ in range(_INTRO):
        pi_, pq = ((pi_ * di - pq * dq) >> 31), ((pi_ * dq + pq * di) >> 31)
    ra0 = math.atan2(pq, pi_)
    _offset_const_cache[key] = (datan, ra0)
    return datan, ra0


def make_offset_statics(offset_hz: int, sample_rate: int,
                        width: int) -> OffsetStatics:
    datan, _ = _offset_consts(offset_hz, sample_rate)
    x = np.arange(1, width + 1, dtype=np.float64)
    ang = np.mod(x * datan, 2.0 * np.pi)
    # exact intro: run the reference's truncated-cint32 recurrence for
    # the pre-renormalisation span (src/video.c:3482-3515); sample n
    # uses the phasor after n+1 multiplies (sample 32767 is the first
    # renormalised one)
    d = 2.0 * math.pi / sample_rate * offset_hz
    di = int(math.floor(math.cos(d) * _INT32_MAX + 0.5))
    dq_ = math.sin(d) * _INT32_MAX
    dq = int(math.floor(dq_ + 0.5)) if dq_ >= 0 else -int(
        math.floor(-dq_ + 0.5))
    rows = -(-_INTRO // width)
    bi = np.zeros(rows * width, dtype=np.int8)
    bq = np.zeros(rows * width, dtype=np.int8)
    pi_, pq = 32767, 0
    for n in range(_INTRO):
        pi_, pq = ((pi_ * di - pq * dq) >> 31), ((pi_ * dq + pq * di) >> 31)
        bi[n] = pi_ >> 16
        bq[n] = pq >> 16
    return OffsetStatics(
        cos_x=np.cos(ang).astype(np.float32),
        sin_x=np.sin(ang).astype(np.float32),
        intro_bi=bi.reshape(rows, width),
        intro_bq=bq.reshape(rows, width))


def offset_rotation(offset_hz: int, sample_rate: int, k0: int, width: int,
                    nlines: int):
    """Per-line rotation state (host, float64-exact): base-angle cos/sin
    and the per-line count of leading output samples the reference zeroes
    (absolute sample index < 32767, before its first phase renorm)."""
    datan, ra0 = _offset_consts(offset_hz, sample_rate)
    n_line = np.maximum(np.arange(k0, k0 + nlines, dtype=np.int64), 0) * width
    # sample n (>= 32767) is rotated by ra0 + (n - 32766) * datan; the
    # column table contributes (col+1) * datan, so the line base is
    # ra0 + (n_line - 32767) * datan.
    ang = np.mod(ra0 + (n_line.astype(np.float64) - _INTRO) * datan,
                 2.0 * np.pi)
    nz = np.clip(_INTRO - n_line, 0, width).astype(np.int32)
    return (np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32),
            nz)


def offset_rotate(st: OffsetStatics, out_i, out_q, c0, s0, nz,
                  k_rows=None):
    """Complex rotate by the offset carrier, with the reference's
    quantisation: b = phase >> 16 (~cos*32768), (a*b) >> 15.  Samples
    before the reference's first phase renormalisation (per-line
    leading count `nz`) use the emulated truncated-cint32 intro phasor
    (b factors in {-2..0}, src/video.c:3482-3515 + :4596-4598)."""
    cc = c0[:, None] * st.cos_x[None, :] - s0[:, None] * st.sin_x[None, :]
    cs = s0[:, None] * st.cos_x[None, :] + c0[:, None] * st.sin_x[None, :]

    bi = jnp.clip(jnp.floor(cc * 32768.0), -32768, 32767)
    bq = jnp.clip(jnp.floor(cs * 32768.0), -32768, 32767)
    if k_rows is not None and st.intro_bi is not None:
        ir = jnp.clip(k_rows, 0, st.intro_bi.shape[0] - 1)
        in_intro = (k_rows >= 0) & (k_rows < st.intro_bi.shape[0])
        sel = in_intro[:, None] & (
            jnp.arange(bi.shape[-1], dtype=jnp.int32)[None, :]
            < nz[:, None])
        bi = jnp.where(sel, jnp.asarray(st.intro_bi)[ir]
                       .astype(bi.dtype), bi)
        bq = jnp.where(sel, jnp.asarray(st.intro_bq)[ir]
                       .astype(bq.dtype), bq)
        keep = None
    else:
        keep = (jnp.arange(bi.shape[-1], dtype=jnp.int32)[None, :]
                >= nz[:, None])
    inv = np.float32(1.0 / 32768.0)
    ri = jnp.floor((out_i * bi - out_q * bq) * inv)
    rq = jnp.floor((out_i * bq + out_q * bi) * inv)
    if keep is not None:
        return jnp.where(keep, ri, 0.0), jnp.where(keep, rq, 0.0)
    return ri, rq
