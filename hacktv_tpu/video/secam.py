"""SECAM chrominance synthesis (batched).

Re-implementation of the reference's threaded SECAM line process
(src/video.c:3068-3233, init :4075-4162) as array ops:

  - line-alternating D'r/D'b selection with vertical averaging of the
    same component across adjacent active lines (cleared per field)
  - luma band-reject (+0.5 bypass) over the active segment
  - chroma low-pass FIR (per line) + first-order HF pre-emphasis IIR;
    the IIR state flows across SECAM lines in stream order, realised as
    a truncated impulse-response convolution with a tail carried from
    the previous line (and across blocks)
  - deviation clamps per component, anti-cloche "bell" complex gain
    evaluated analytically per sample, FM modulation with per-line phase
    reset (sign alternating every third line), envelope-windowed addition

Everything quantised like the reference's integer pipeline.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..config.standards import (SECAM_CB_FREQ, SECAM_CR_FREQ, SECAM_FM_DEV,
                                SECAM_FM_FREQ)
from ..ops import firdes
from ..ops.shapes import IRT1090, rc_window
from . import sequence

INT16_MAX = 32767
_IIR_TAIL = 320     # samples of IIR history carried between lines


@dataclass
class SecamStatics:
    width: int
    active_left: int
    active_width: int
    half_width: int
    col0: int               # active_left + vframe_x
    frame_w: int
    burst_left: int
    burst_len: int
    burst_win: jnp.ndarray      # [burst_len] int-valued envelope
    luma_taps: jnp.ndarray      # [51] band-reject + bypass (Q15)
    chroma_taps: jnp.ndarray    # [15] low-pass (Q15)
    iir_h: jnp.ndarray          # [_IIR_TAIL] truncated impulse response
    dmin: tuple                 # per dr
    dmax: tuple
    level_int: int              # FM level
    kd: float                   # rad/sample per unit
    w0: float                   # rad/sample at centre frequency
    u_black: float
    v_black: float


def make_statics(p, vframe_x: int, frame_w: int) -> SecamStatics:
    conf = p.conf
    level = p.level
    secam_level = (conf.white_level - conf.blanking_level) * level

    # luma filter: band reject around the subcarrier + 0.5 bypass,
    # renormalised (src/video.c:4100-4107)
    taps = firdes.band_reject(51, p.pixel_rate, SECAM_FM_FREQ - 1e6,
                              SECAM_FM_FREQ + 1e6, 1e6, 1.0)
    taps[51 // 2] += 0.5
    taps = taps / taps.sum()
    luma_taps = firdes.quantise_taps(taps).astype(np.float32)

    ctaps = firdes.low_pass(15, p.pixel_rate, 1.70e6, 0.50e6, 1.0)
    chroma_taps = firdes.quantise_taps(ctaps).astype(np.float32)

    # IIR b = {2.90456054, -2.80912108}, a = {1, -0.90456054}
    # (src/video.c:4087-4090): y[n] = b0 x[n] + b1 x[n-1] + 0.90456054 y[n-1]
    b0, b1, a1 = 2.90456054, -2.80912108, -0.90456054
    h = np.zeros(_IIR_TAIL)
    h[0] = b0
    if _IIR_TAIL > 1:
        h[1] = b1 - a1 * b0
    for i in range(2, _IIR_TAIL):
        h[i] = -a1 * h[i - 1]
    iir_h = h.astype(np.float32)

    # envelope (level 1.0, src/video.c:4139-4147)
    rise = conf.burst_rise * IRT1090
    burst_left = round(p.pixel_rate * (conf.burst_left - conf.burst_rise / 2))
    blen = math.ceil(p.pixel_rate * (conf.burst_width + rise))
    t = np.arange(blen) / p.pixel_rate
    win = np.round(rc_window(t, rise / 2, conf.burst_width, rise)
                   * INT16_MAX).astype(np.float32)

    dmin = (round((SECAM_CB_FREQ - SECAM_FM_FREQ - 350e3) / SECAM_FM_DEV
                  * INT16_MAX),
            round((SECAM_CR_FREQ - SECAM_FM_FREQ - 506e3) / SECAM_FM_DEV
                  * INT16_MAX))
    dmax = (round((SECAM_CB_FREQ - SECAM_FM_FREQ + 506e3) / SECAM_FM_DEV
                  * INT16_MAX),
            round((SECAM_CR_FREQ - SECAM_FM_FREQ + 350e3) / SECAM_FM_DEV
                  * INT16_MAX))

    # black-level chroma values (the yuv lookup for rgb=0): y=0 so
    # u = (0 + CB-FM)/DEV, v = (0 + CR-FM)/DEV (src/video.c:3949-3953)
    u_black = round(np.clip((SECAM_CB_FREQ - SECAM_FM_FREQ) / SECAM_FM_DEV,
                            -1, 1) * INT16_MAX)
    v_black = round(np.clip((SECAM_CR_FREQ - SECAM_FM_FREQ) / SECAM_FM_DEV,
                            -1, 1) * INT16_MAX)

    return SecamStatics(
        width=p.width, active_left=p.active_left,
        active_width=p.active_width, half_width=p.half_width,
        col0=p.active_left + vframe_x, frame_w=frame_w,
        burst_left=burst_left, burst_len=blen,
        burst_win=np.asarray(win),
        luma_taps=np.asarray(luma_taps),
        chroma_taps=np.asarray(chroma_taps),
        iir_h=np.asarray(iir_h),
        dmin=dmin, dmax=dmax,
        level_int=int(round(INT16_MAX * secam_level)),
        kd=2.0 * np.pi * SECAM_FM_DEV / (p.pixel_rate * INT16_MAX),
        w0=2.0 * np.pi * SECAM_FM_FREQ / p.pixel_rate,
        u_black=float(u_black), v_black=float(v_black))


def line_meta(p, k0: int, n: int, vframe_y: int, vframe_h: int) -> dict:
    """Host-side per-line SECAM metadata for stream lines [k0, k0+n)."""
    conf = p.conf
    dr = np.zeros(n, dtype=np.float32)
    active = np.zeros(n, dtype=bool)
    half_only = np.zeros(n, dtype=bool)
    vy = np.full(n, -1, dtype=np.int32)
    vy_prev = np.full(n, -1, dtype=np.int32)
    prev_has = np.zeros(n, dtype=bool)
    phase_pos = np.zeros(n, dtype=np.float32)   # +1 / -1 initial phase
    prev_row = np.full(n, -1, dtype=np.int32)   # index of prev secam row

    def line_of(k):
        return k % conf.lines + 1, 1 + k // conf.lines

    def active_of(k):
        line, frame = line_of(max(k, 0))
        code = sequence.line_sequence(conf.type, line)
        act = code[2] == 'a' or code[3] == 'a'
        v = sequence.active_video_line(conf.type, line)
        if v >= 0 and conf.interlaced:
            v += 1        # progressive source vs interlaced output
        v -= vframe_y
        if v < 0 or v >= vframe_h:
            v = -1
        return act, v, code, line, frame

    last_secam = -10**9
    # look back for the previous secam row before the block
    for k in range(max(k0 - 8, 0), k0):
        act, _, _, _, _ = active_of(k)
        if act:
            last_secam = k

    for j in range(n):
        k = max(k0 + j, 0)
        act, v, code, line, frame = active_of(k)
        dr[j] = ((frame * conf.lines) + line) & 1
        phase_pos[j] = 1.0 if ((frame * conf.lines) + line) % 3 == 0 else -1.0
        if act:
            active[j] = True
            half_only[j] = code[3] != 'a'
            vy[j] = v
            # previous active line of the same field (buffer cleared at
            # line 1 and hline)
            pact, pv, pcode, pline, pframe = active_of(k - 1)
            hline = (conf.lines + 1) // 2
            if pact and line not in (1, hline):
                vy_prev[j] = pv
                prev_has[j] = True
            prev_row[j] = last_secam - k0 if last_secam > -10**8 else -1
            last_secam = k
    return dict(dr=dr, active=active.astype(np.float32),
                half_only=half_only.astype(np.float32),
                vy=vy, vy_prev=vy_prev,
                prev_has=prev_has.astype(np.float32),
                phase_pos=phase_pos, prev_row=prev_row)


def _line_conv(taps, x):
    n = taps.shape[0]
    pad = n // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad)))
    out = jax.lax.conv_general_dilated(
        xp[:, None, :], taps[None, None, ::-1],
        window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"))[:, 0, :]
    return jnp.clip(jnp.floor(out), -32768, 32767)


def render(st: SecamStatics, out: jnp.ndarray,
           u_img: jnp.ndarray, v_img: jnp.ndarray,   # [H, frame_w] int-val
           meta: dict, tail_in: jnp.ndarray):
    """Add SECAM chroma to the luma block [B, W].  Returns (out, tail_out)
    where tail_out is the post-FIR chroma tail of the last SECAM row for
    the next block's IIR continuity."""
    B, W = out.shape
    H = u_img.shape[0]
    cols = jnp.arange(W, dtype=jnp.int32)[None, :]

    dr = meta["dr"][:, None]
    act = meta["active"][:, None]

    # out-of-bounds source rows read as black (the reference's null-frame
    # path uses the rgb=0 lookup, src/video.c:3139-3147)
    ub = jnp.full((1, u_img.shape[1]), st.u_black, u_img.dtype)
    vb = jnp.full((1, u_img.shape[1]), st.v_black, u_img.dtype)
    up = jnp.concatenate([u_img, ub]);  vp = jnp.concatenate([v_img, vb])
    vy = jnp.where(meta["vy"] >= 0, meta["vy"], H)
    vyp = jnp.where(meta["vy_prev"] >= 0, meta["vy_prev"], H)

    # component of this line and the previous line's same component
    cur = jnp.where(dr > 0, vp[vy], up[vy])       # [B, frame_w]
    prv = jnp.where(dr > 0, vp[vyp], up[vyp])
    prv = prv * meta["prev_has"][:, None]

    # average (C integer division truncates toward zero)
    avg = jnp.trunc((cur + prv) / 2.0)

    black = jnp.where(dr > 0, st.v_black, st.u_black)   # [B,1]
    pad_r = W - st.col0 - st.frame_w
    avg_full = jnp.pad(avg, ((0, 0), (st.col0, pad_r)))
    in_frame = (cols >= st.col0) & (cols < st.col0 + st.frame_w)
    chroma = jnp.where(in_frame, avg_full, black)

    # luma band-reject over the active segment (zero history at segment
    # start, real samples beyond its end — src/video.c:3206)
    seg = (cols >= st.active_left) & (cols < st.active_left + st.active_width)
    luma_masked = jnp.where(cols >= st.active_left, out, 0.0)
    luma_f = _line_conv(st.luma_taps, luma_masked)
    out = jnp.where(seg & (act > 0), luma_f, out)

    # chroma low-pass (per line, zero edges) + IIR over the secam-line
    # sequence with carried tails
    chroma = _line_conv(st.chroma_taps, chroma)

    prev_row = meta["prev_row"]
    tails = chroma[:, W - _IIR_TAIL:]
    prev_tail = jnp.where(
        (prev_row >= 0)[:, None],
        tails[jnp.clip(prev_row, 0, B - 1)],
        jnp.broadcast_to(tail_in, (B, _IIR_TAIL)))
    ext = jnp.concatenate([prev_tail, chroma], axis=1)
    h = st.iir_h
    n = h.shape[0]
    iir = jax.lax.conv_general_dilated(
        ext[:, None, :], h[None, None, ::-1],
        window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"))[:, 0, :]
    # VALID output m aligns with input index m-1 (y[m] = sum h[j] *
    # ext[m+n-1-j], chroma[i] = ext[n+i]); take columns 1..W
    iir = iir[:, 1:W + 1]
    chroma = jnp.clip(jnp.round(iir), -32768, 32767)

    # deviation clamps
    dmin = jnp.where(dr > 0, st.dmin[1], st.dmin[0])
    dmax = jnp.where(dr > 0, st.dmax[1], st.dmax[0])
    chroma = jnp.clip(chroma, dmin, dmax)

    # subcarrier span
    sl = st.burst_left
    sr = jnp.where(meta["half_only"][:, None] > 0, st.half_width,
                   sl + st.burst_len)
    span = (cols >= sl) & (cols < sr) & (act > 0)
    spanf = span.astype(jnp.float32)

    # FM phase: reset per line, cumsum within the span
    d = (np.float32(st.w0) + np.float32(st.kd) * chroma) * spanf
    theta = jnp.cumsum(d, axis=1)
    phase0 = jnp.where(meta["phase_pos"][:, None] > 0, 0.0, np.float32(np.pi))
    theta = theta + phase0

    # bell gain, evaluated analytically (src/video.c:2172-2185) and
    # rounded to the int16 grid like the LUT
    freq = np.float32(SECAM_FM_FREQ) + chroma * np.float32(
        SECAM_FM_DEV / INT16_MAX)
    f = freq * np.float32(1.0 / 4.286e6) - np.float32(4.286e6) / freq
    lq = 16.0 * f
    rq = 1.26 * f
    dd = 1.0 + rq * rq
    g_i = jnp.round(0.115 * (1.0 + lq * rq) / dd * INT16_MAX)
    g_q = jnp.round(0.115 * (lq - rq) / dd * INT16_MAX)

    # _fm_modulator_cgain: (((phase>>16)*level)>>15 * g) >> 15, real part
    lvl = np.float32(st.level_int)
    inv = np.float32(1.0 / 32768.0)
    
    ci = jnp.floor(jnp.clip(jnp.floor(jnp.cos(theta) * 32768.0),
                            -32768, 32767) * lvl * inv)
    cq = jnp.floor(jnp.clip(jnp.floor(jnp.sin(theta) * 32768.0),
                            -32768, 32767) * lvl * inv)
    mod = jnp.floor(ci * g_i * inv) - jnp.floor(cq * g_q * inv)

    # envelope window: (mod * win[x - burst_left]) >> 15
    win_full = jnp.zeros(W, dtype=jnp.float32)
    win_full = jax.lax.dynamic_update_slice(win_full, st.burst_win,
                                            (st.burst_left,))
    contrib = jnp.floor(mod * win_full[None, :] * inv) * spanf
    out = out + contrib

    # next block's tail: post-FIR chroma of the LAST secam row... the
    # convolution input tail, i.e. the pre-IIR chroma
    last = jnp.argmax(jnp.arange(B) * (meta["active"] > 0))
    tail_out = chroma_pre_tail(ext, last)
    return out, tail_out


def chroma_pre_tail(ext: jnp.ndarray, last_row):
    return ext[last_row, -_IIR_TAIL:]
