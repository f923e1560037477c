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


def make_fm_video_statics(deviation: float, level: float, sample_rate: int,
                          lines_per_frame: int) -> FMVideoStatics:
    return FMVideoStatics(
        kd=2.0 * np.pi * deviation / (sample_rate * 32767.0),
        level_int=int(round(32767 * level)),
        lines_per_frame=lines_per_frame)


def fm_video_modulate(st: FMVideoStatics, x: jnp.ndarray, phi0: jnp.ndarray):
    """FM-modulate the baseband block.

    x: [nlines, W] f32 (int16-scaled composite incl. audio subcarriers).
    phi0: f32 scalar, phase at block start (mod 2pi).
    Returns (out_i, out_q, frame_totals) where frame_totals [F] are each
    frame's phase increment mod 2pi for the host-side carry.
    """
    B, W = x.shape
    F = B // st.lines_per_frame
    kd = np.float32(st.kd)

    # The reference modulates the int16-quantised composite
    # (src/video.c:3452-3464 feeds line->output); modulating the float
    # canvas instead leaves a sub-LSB mean offset that integrates into
    # an unbounded phase drift.  Quantise first.
    d = kd * jnp.round(jnp.clip(x, -32768, 32767))
    col_cum = jnp.cumsum(d, axis=1)                       # inclusive
    line_tot = _fmod2pi(col_cum[:, -1])
    lt = line_tot.reshape(F, st.lines_per_frame)
    line_base = jnp.cumsum(lt, axis=1) - lt               # exclusive
    frame_tot = _fmod2pi(line_base[:, -1] + lt[:, -1])
    frame_base = _fmod2pi(jnp.cumsum(frame_tot) - frame_tot)

    phi = (phi0 + frame_base[:, None].repeat(st.lines_per_frame, 1)
           .reshape(B, 1)
           + line_base.reshape(B, 1) + col_cum)
    ci = jnp.cos(phi)
    cq = jnp.sin(phi)
    lvl = np.float32(st.level_int)
    inv = np.float32(1.0 / 32768.0)
    
    out_i = jnp.floor(jnp.clip(jnp.floor(ci * 32768.0), -32768, 32767) * lvl * inv)
    out_q = jnp.floor(jnp.clip(jnp.floor(cq * 32768.0), -32768, 32767) * lvl * inv)
    return out_i, out_q, frame_tot


@dataclass
class OffsetStatics:
    cos_x: jnp.ndarray   # [W] rotation table at col+1 (phase advances
    sin_x: jnp.ndarray   # before the first output sample)


def make_offset_statics(offset_hz: int, sample_rate: int,
                        width: int) -> OffsetStatics:
    g = math.gcd(abs(int(offset_hz)), sample_rate)
    num, den = int(offset_hz) // g, sample_rate // g
    x = np.arange(1, width + 1, dtype=np.int64)
    ang = 2.0 * np.pi * ((x * num) % den) / den
    return OffsetStatics(
        cos_x=jnp.asarray(np.cos(ang).astype(np.float32)),
        sin_x=jnp.asarray(np.sin(ang).astype(np.float32)))


def offset_rotation(offset_hz: int, sample_rate: int, k0: int, width: int,
                    nlines: int):
    """Per-line rotation angles (host, exact)."""
    g = math.gcd(abs(int(offset_hz)), sample_rate)
    num, den = int(offset_hz) // g, sample_rate // g
    n_line = np.maximum(np.arange(k0, k0 + nlines, dtype=np.int64), 0) * width
    rot = (n_line % den) * num % den
    ang = 2.0 * np.pi * rot / den
    return (np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32))


def offset_rotate(st: OffsetStatics, out_i, out_q, c0, s0):
    """Complex rotate by the offset carrier, with the reference's
    quantisation: b = phase >> 16 (~cos*32768), (a*b) >> 15."""
    cc = c0[:, None] * st.cos_x[None, :] - s0[:, None] * st.sin_x[None, :]
    cs = s0[:, None] * st.cos_x[None, :] + c0[:, None] * st.sin_x[None, :]
    
    bi = jnp.clip(jnp.floor(cc * 32768.0), -32768, 32767)
    bq = jnp.clip(jnp.floor(cs * 32768.0), -32768, 32767)
    inv = np.float32(1.0 / 32768.0)
    ri = jnp.floor((out_i * bi - out_q * bq) * inv)
    rq = jnp.floor((out_i * bq + out_q * bi) * inv)
    return ri, rq
