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
    # centre-frequency phase per in-span sample count, exact mod 2pi
    # (f32 cumsum of w0 would reach ~1700 rad with ~1e-3 rad round-off,
    # whose floor(cos) bias FM-video modes integrate into a phase ramp)
    w0_tab: np.ndarray = None   # f32 [width+1]
    # anti-cloche bell gain per chroma value, quantised exactly as the
    # reference's 65536-entry cint16 LUT (src/video.c:4122-4128)
    bell_i: np.ndarray = None   # int16 [65536], index chroma + 32768
    bell_q: np.ndarray = None
    _win_q: np.ndarray = None   # int16 [width]: burst window, zero tail
    fsync_level: int = 0        # field-ID sawtooth deviation
    pixel_rate: int = 0


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
        u_black=float(u_black), v_black=float(v_black),
        w0_tab=_w0_table(p.pixel_rate, p.width),
        bell_i=_bell_table(0), bell_q=_bell_table(1),
        _win_q=_win_int16(win, p.width),
        fsync_level=round(350e3 / SECAM_FM_DEV * INT16_MAX),
        pixel_rate=p.pixel_rate)


def _win_int16(win: np.ndarray, width: int) -> np.ndarray:
    wq = np.zeros(width, np.int16)
    n = min(len(win), width)
    wq[:n] = np.asarray(win[:n], np.int64).astype(np.int16)
    return wq


def _bell_table(comp: int) -> np.ndarray:
    """The reference's fm_secam_bell LUT entry `comp` for every int16
    chroma value (double math + lround, src/video.c:2172-2185,
    4122-4128)."""
    r = np.arange(-32768, 32768, dtype=np.float64)
    f = SECAM_FM_FREQ + r * SECAM_FM_DEV / INT16_MAX
    f0 = 4.286e6
    ff = f / f0 - f0 / f
    lq = 16.0 * ff
    rq = 1.26 * ff
    d = 1.0 + rq * rq
    g = (0.115 * (1.0 + lq * rq) / d if comp == 0
         else 0.115 * (lq - rq) / d)
    v = g * INT16_MAX
    q = np.where(v >= 0, np.floor(v + 0.5), -np.floor(-v + 0.5))
    return q.astype(np.int16)


def _w0_table(pixel_rate: int, width: int) -> np.ndarray:
    """Exact centre-frequency phase (mod 2pi) after c in-span samples."""
    from fractions import Fraction
    fr = Fraction(SECAM_FM_FREQ).limit_denominator(1 << 24) / pixel_rate
    c = np.arange(width + 1, dtype=np.int64)
    ang = 2.0 * np.pi * ((c * fr.numerator) % fr.denominator
                         ) / fr.denominator
    return ang.astype(np.float32)


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

    nfid = conf.secam_field_id_lines
    if conf.secam_field_id and not (1 <= nfid <= 9):
        nfid = 9        # src/video.c:4131-4137
    field_id = np.zeros(n, dtype=bool)

    for j in range(n):
        k = max(k0 + j, 0)
        act, v, code, line, frame = active_of(k)
        dr[j] = ((frame * conf.lines) + line) & 1
        phase_pos[j] = 1.0 if ((frame * conf.lines) + line) % 3 == 0 else -1.0
        if conf.secam_field_id and (7 <= line < 7 + nfid
                                    or 320 <= line < 320 + nfid):
            # field-identification "bottle" lines: full-span sawtooth
            # chroma, processed like active lines (src/video.c:3101-3136)
            field_id[j] = True
            active[j] = True
            half_only[j] = False
        elif act:
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
                phase_pos=phase_pos, prev_row=prev_row,
                field_id=field_id)


def _line_conv(taps, x):
    """Q15 FIR over each line, bit-exact vs the reference's fir_int16
    (src/fir.c:342-346): int32 accumulate of int16 x int16 products,
    arithmetic >>15.  An f32 convolution here leaves a content-dependent
    ~0.02-LSB mean bias (f32 partial sums round deterministically) that
    FM-video modes integrate into a phase ramp.  `taps` are the
    quantise_taps() floats (q15/32768); recover the integer taps."""
    n = taps.shape[0]
    pad = n // 2
    tq = jnp.round(taps * 32768.0).astype(jnp.int32)
    xp = jnp.pad(x.astype(jnp.int32), ((0, 0), (pad, pad)))
    out = jax.lax.conv_general_dilated(
        xp[:, None, :], tq[None, None, ::-1],
        window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.int32)[:, 0, :]
    return jnp.clip(out >> 15, -32768, 32767).astype(jnp.float32)


def chroma_block_host(st: SecamStatics, W: int, meta: dict,
                      u: np.ndarray, v: np.ndarray, k_first: int,
                      k_snapshot: int, state, cache: dict | None = None):
    """Host-exact SECAM chroma baseband for one block's rows.

    Replicates the reference bit-for-bit: vertical averaging with C
    truncation (src/video.c:3149-3196), Q15 chroma FIR with int32
    accumulate >>15 (src/fir.c:342-346), the order-1 HF-preemphasis IIR
    in float64 with stream-carried (ix, iy) state (src/fir.c:710-740 —
    a truncated-impulse-response f32 approximation flips the lround on
    ~1e-3 of samples, and a single early-line chroma LSB detunes the
    whole line's FM carrier), lround and the deviation clamps.

    Rows with stream index < 0 (block 0's leading halo) emit zeros and
    do not advance the IIR.  Returns (chroma int16-valued f32 [B, W],
    state_at_k_snapshot, state_out)."""
    import ctypes as C

    from .. import runtime
    lib = runtime.load()
    pp = lambda a: a.ctypes.data_as(C.c_void_p)

    B = len(meta["dr"])
    H = u.shape[0]
    fw = u.shape[1]
    tq = np.round(np.asarray(st.chroma_taps, np.float64) * 32768.0
                  ).astype(np.int64)
    nt = len(tq)
    pad = nt // 2
    b0, b1, a1 = 2.90456054, -2.80912108, -0.90456054

    ks = k_first + np.arange(B)
    rows = np.nonzero((meta["active"] > 0) & (ks >= 0))[0]
    n_act = len(rows)
    out = np.zeros((B, W), dtype=np.int16)
    if n_act == 0:
        return out, state, state

    # the pre-IIR stage (gather/average/FIR) depends only on the source
    # planes and the line-number phase (dr parity has a 2-frame period),
    # so it is cached for static sources; only the IIR (stream-carried
    # f64 state) runs per block
    ckey = None
    if cache is not None:
        ckey = (id(u), id(v), k_first % (2 * 625), B)
        hit = cache.get(ckey)
        if hit is not None:
            f, dr = hit[0], hit[1]
            return _chroma_iir_finish(st, meta, W, out, rows, ks, f, dr,
                                      k_snapshot, state)

    # gather + vertical average for all active rows at once (single
    # fancy-index into the stacked U/V planes, f32 exact for int16)
    dr = meta["dr"][rows] > 0
    blackv = np.where(dr, st.v_black, st.u_black).astype(np.float32)
    P = np.concatenate([
        np.asarray(u, np.float32),
        np.full((1, fw), st.u_black, np.float32),
        np.asarray(v, np.float32),
        np.full((1, fw), st.v_black, np.float32)])
    off = np.where(dr, H + 1, 0)
    vy = np.where((meta["vy"][rows] >= 0) & (meta["vy"][rows] < H),
                  meta["vy"][rows], H) + off
    vyp = np.where((meta["vy_prev"][rows] >= 0)
                   & (meta["vy_prev"][rows] < H),
                   meta["vy_prev"][rows], H) + off
    cur = P[vy]
    prv = P[vyp] * (meta["prev_has"][rows] > 0)[:, None].astype(
        np.float32)
    avg = np.trunc((cur + prv) * np.float32(0.5))

    lines = np.empty((n_act, W), np.int16)
    lines[:] = blackv[:, None].astype(np.int16)
    lines[:, st.col0:st.col0 + fw] = avg
    fid = meta["field_id"][rows]
    if fid.any():
        # field-ID sawtooth (src/video.c:3101-3136): level + dev*t with
        # t = clip((x - active_left)/rate/rw, 0, 1); C assignment to
        # int16 truncates toward zero
        x = np.arange(W, dtype=np.float64) - st.active_left
        for comp, rw in ((True, 15e-6), (False, 18e-6)):
            rsel = fid & (dr == comp)
            if not rsel.any():
                continue
            t = np.clip(x / st.pixel_rate / rw, 0.0, 1.0)
            level = st.v_black if comp else st.u_black
            dev = st.fsync_level if comp else -st.fsync_level
            lines[rsel] = np.trunc(level + dev * t).astype(np.int16)
    # Q15 FIR with zero edges + the order-1 IIR in the exact C operation
    # order: both in the native runtime (FIR threaded over rows; the
    # IIR is a serial f64 recurrence carried across the stream).
    import os
    taps_i32 = np.ascontiguousarray(tq.astype(np.int32))
    f = np.empty((n_act, W), np.int16)
    lib.rt_fir_block_i16(pp(lines), n_act, W, pp(taps_i32), nt, pp(f),
                         min(8, os.cpu_count() or 1))
    if ckey is not None:
        if len(cache) > 4:
            cache.clear()
        # keep refs to u/v so a freed plane's id is never reused while
        # the cache entry is alive
        cache[ckey] = (f, dr, u, v)
    return _chroma_iir_finish(st, meta, W, out, rows, ks, f, dr,
                              k_snapshot, state)


def _chroma_iir_finish(st, meta, W, out, rows, ks, f, dr, k_snapshot,
                       state):
    import ctypes as C

    from .. import runtime
    lib = runtime.load()
    pp = lambda a: a.ctypes.data_as(C.c_void_p)
    b0, b1, a1 = 2.90456054, -2.80912108, -0.90456054
    n_act = len(rows)
    iir_state = np.array(state, np.float64)
    yq = np.empty((n_act, W), np.int16)
    n_before = int(np.searchsorted(ks[rows], k_snapshot))
    if n_before:
        lib.rt_iir1_exact_i16(pp(f), n_before * W, b0, b1, a1,
                              pp(iir_state), pp(yq))
    snap = (float(iir_state[0]), float(iir_state[1]))
    if n_before < n_act:
        f2 = f.reshape(-1)[n_before * W:]
        y2 = yq.reshape(-1)[n_before * W:]
        lib.rt_iir1_exact_i16(pp(f2), (n_act - n_before) * W, b0, b1,
                              a1, pp(iir_state), pp(y2))
    dmin = np.where(dr, st.dmin[1], st.dmin[0]).astype(np.int16)
    dmax = np.where(dr, st.dmax[1], st.dmax[0]).astype(np.int16)
    np.clip(yq, dmin[:, None], dmax[:, None], out=yq)
    out[rows] = yq
    return out, snap, (float(iir_state[0]), float(iir_state[1]))


_IIR_B0, _IIR_B1, _IIR_A1 = 2.90456054, -2.80912108, -0.90456054
_IIR_R = -_IIR_A1                      # y[n] = b0 x[n] + c1 z[n-1]
_IIR_C1 = _IIR_B1 - _IIR_A1 * _IIR_B0  # z[n] = x[n] + r z[n-1]


def _fid_rows(st: SecamStatics, W: int) -> np.ndarray:
    """Static field-ID sawtooth rows [2, W] (f64-exact, the device
    path's replacement for the per-block host loop): row 0 = D'b
    (18 us ramp down), row 1 = D'r (15 us ramp up)
    (src/video.c:3101-3136)."""
    x = np.arange(W, dtype=np.float64) - st.active_left
    rows = np.empty((2, W), np.float32)
    for comp, rw in ((False, 18e-6), (True, 15e-6)):
        t = np.clip(x / st.pixel_rate / rw, 0.0, 1.0)
        level = st.v_black if comp else st.u_black
        dev = st.fsync_level if comp else -st.fsync_level
        rows[int(comp)] = np.trunc(level + dev * t).astype(np.float32)
    return rows


def _device_consts(st: SecamStatics, W: int) -> dict:
    """Host numpy closure constants for the device chroma program
    (kept out of SecamStatics so the host-exact path never builds
    them)."""
    c = getattr(st, "_dev_consts", None)
    if c is not None and c["W"] == W:
        return c
    sl = st.burst_left
    r_pow = np.power(np.float64(_IIR_R),
                     np.arange(1, W + 1, dtype=np.float64))
    r_pow[r_pow < 1e-38] = 0.0
    w0_col = np.zeros(W, np.float32)
    n = np.arange(sl, W) - sl + 1
    w0_col[sl:] = st.w0_tab[n]
    win_col = np.zeros(W, np.float32)
    win_col[sl:] = np.asarray(st._win_q[: W - sl], np.float32)
    c = dict(W=W, r_pow=r_pow.astype(np.float32), w0_col=w0_col,
             win_col=win_col, fid=_fid_rows(st, W))
    object.__setattr__(st, "_dev_consts", c)
    return c


def _slice_fir_int(x: jnp.ndarray, taps: np.ndarray) -> jnp.ndarray:
    """Q15 FIR over each row with zero edges, bit-exact vs
    rt_fir_block_i16 (int32 accumulate, arithmetic >>15, int16
    saturate), built from shifted slices (a single-feature lax.conv
    lowers to layout-copy pipelines on TPU — PERF.md)."""
    B, W = x.shape
    nt = len(taps)
    pad = nt // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad)))
    acc = jnp.zeros((B, W), jnp.int32)
    for t in range(nt):
        # out[i] = sum_k x[k] * taps[i + pad - k]  ->  slice offset
        acc = acc + np.int32(taps[nt - 1 - t]) * xp[:, t: t + W]
    return jnp.clip(acc >> 15, -32768, 32767)


def device_chroma_carrier(st: SecamStatics, W: int, meta: dict,
                          u: jnp.ndarray, v: jnp.ndarray, z_prev):
    """TPU-native SECAM chroma + FM carrier for one block of rows.

    The reference's serial stages are reformulated as parallel device
    programs (the round-3 verdict's top item — the host-exact path in
    chroma_block_host/carrier_addin_host remains the parity oracle):

      - vertical averaging / field-ID bottles: row gathers + static rows
      - chroma low-pass: exact int32 Q15 FIR (shifted slices)
      - HF pre-emphasis IIR (f64 serial in the reference,
        src/fir.c:710-740): y[n] = b0 x[n] + c1 z[n-1] with
        z[n] = x[n] + r z[n-1] — an order-1 linear recurrence computed
        as a log-depth doubling scan; the cross-line/cross-block carry
        is the single scalar z at the previous active line's end (r^W
        underflows to 0, so row ends are local)
      - FM carrier (int32 phasor LUT walk, src/video.c:2278-2297):
        closed form — phase = w0*(n+1) [exact mod-2pi table] +
        kd*cumsum(chroma) [exact int32], with the reference's
        >>16/>>15 floor chain emulated in f32
      - anti-cloche bell: evaluated analytically per sample (the
        reference's 65536-entry LUT is a pure function of the chroma
        value, src/video.c:2172-2185)

    Accuracy is ~1 LSB of chroma on rare round-boundary samples
    (f32 scan vs the reference's f64 IIR), far inside the 40 dB
    contract; FM-video SECAM modes keep the host-exact path where a
    sub-LSB composite bias would integrate into a phase ramp.

    Returns (carrier_add f32 [B, W], z_snap f32 scalar)."""
    dc = _device_consts(st, W)
    B = meta["dr"].shape[0]
    H = u.shape[0]
    fw = u.shape[1]
    dr = meta["dr"] > 0
    act = (meta["active"] > 0) & (meta["valid"] > 0)

    # ---- vertical average (trunc) --------------------------------------
    black_u = jnp.full((1, fw), st.u_black, jnp.float32)
    black_v = jnp.full((1, fw), st.v_black, jnp.float32)
    P = jnp.concatenate([u.astype(jnp.float32), black_u,
                         v.astype(jnp.float32), black_v])
    off = jnp.where(dr, H + 1, 0).astype(jnp.int32)
    vy = meta["vy"]
    vyp = meta["vy_prev"]
    vy_s = jnp.where((vy >= 0) & (vy < H), vy, H) + off
    vyp_s = jnp.where((vyp >= 0) & (vyp < H), vyp, H) + off
    cur = P[vy_s]
    prv = P[vyp_s] * (meta["prev_has"] > 0)[:, None]
    avg = jnp.trunc((cur + prv) * np.float32(0.5))

    blackv = jnp.where(dr, st.v_black, st.u_black).astype(jnp.float32)
    pad_r = W - st.col0 - fw
    if pad_r < 0:
        avg = avg[:, : fw + pad_r]
        pad_r = 0
    lines = jnp.pad(avg - blackv[:, None], ((0, 0), (st.col0, pad_r))) \
        + blackv[:, None]
    fid = meta["field_id"] > 0
    fid_rows = jnp.asarray(dc["fid"])
    lines = jnp.where(fid[:, None],
                      fid_rows[dr.astype(jnp.int32)], lines)

    # ---- chroma low-pass FIR (exact int32) -----------------------------
    tq = np.round(np.asarray(st.chroma_taps, np.float64) * 32768.0
                  ).astype(np.int32)
    x = _slice_fir_int(lines.astype(jnp.int32), tq).astype(jnp.float32)

    # ---- HF pre-emphasis IIR as a doubling scan ------------------------
    z = x
    shift, rr = 1, _IIR_R
    while shift < min(W, 1024) and rr > 1e-30:
        z = z + np.float32(rr) * jnp.pad(z, ((0, 0), (shift, 0)))[:, :W]
        rr *= rr
        shift *= 2
    z_end = z[:, -1]
    iir_prev = meta["iir_prev"]
    zp = jnp.where(iir_prev >= 0,
                   z_end[jnp.clip(iir_prev, 0, B - 1)],
                   jnp.float32(z_prev))
    r_pow = jnp.asarray(dc["r_pow"])
    zc = z + r_pow[None, :] * zp[:, None]
    z_nm1 = jnp.concatenate([zp[:, None], zc[:, :-1]], axis=1)
    y = np.float32(_IIR_B0) * x + np.float32(_IIR_C1) * z_nm1
    y = jnp.clip(y, -32768.0, 32767.0)
    y = jnp.where(y >= 0, jnp.floor(y + 0.5), -jnp.floor(0.5 - y))
    dmin = jnp.where(dr, st.dmin[1], st.dmin[0]).astype(jnp.float32)
    dmax = jnp.where(dr, st.dmax[1], st.dmax[0]).astype(jnp.float32)
    c = jnp.clip(y, dmin[:, None], dmax[:, None])

    snap = meta["snap_row"]
    z_snap = jnp.where(snap >= 0, z_end[jnp.clip(snap, 0, B - 1)],
                       jnp.float32(z_prev))

    # ---- FM carrier (closed-form phase) --------------------------------
    sl = st.burst_left
    cols = jnp.arange(W, dtype=jnp.int32)[None, :]
    sr = jnp.where(act,
                   jnp.where(meta["half_only"] > 0, st.half_width,
                             min(sl + st.burst_len, W)), 0)
    span = (cols >= sl) & (cols < sr[:, None])
    ci = c.astype(jnp.int32)
    S = jnp.cumsum(jnp.where(cols >= sl, ci, 0), axis=1)
    phase = jnp.asarray(dc["w0_col"])[None, :] \
        + np.float32(st.kd) * S.astype(jnp.float32)
    sign = jnp.where(meta["phase_pos"] > 0, 1.0, -1.0)[:, None]
    pi_ = jnp.minimum(jnp.floor(sign * jnp.cos(phase) * 32768.0),
                      32767.0)
    pq_ = jnp.minimum(jnp.floor(sign * jnp.sin(phase) * 32768.0),
                      32767.0)
    lvl = np.float32(st.level_int / 32768.0)
    vi = jnp.floor(pi_ * lvl)
    vq = jnp.floor(pq_ * lvl)
    # analytic anti-cloche bell, lround-quantised like the LUT
    f = np.float32(SECAM_FM_FREQ) \
        + c * np.float32(SECAM_FM_DEV / INT16_MAX)
    ff = f * np.float32(1.0 / 4.286e6) - np.float32(4.286e6) / f
    rq = np.float32(1.26) * ff
    den = np.float32(0.115) * INT16_MAX / (1.0 + rq * rq)
    gi_f = (1.0 + np.float32(16.0) * ff * rq) * den
    gq_f = (np.float32(16.0) * ff - rq) * den
    lround = lambda a: jnp.where(a >= 0, jnp.floor(a + 0.5),
                                 -jnp.floor(0.5 - a))
    gi = lround(gi_f)
    gq = lround(gq_f)
    inv15 = np.float32(1.0 / 32768.0)
    m = jnp.floor(vi * gi * inv15) - jnp.floor(vq * gq * inv15)
    o = jnp.floor(m * jnp.asarray(dc["win_col"])[None, :] * inv15)
    return jnp.where(span, o, 0.0), z_snap


def carrier_lut(st: SecamStatics, pixel_rate: int) -> np.ndarray:
    """The reference's per-chroma-value int32 phasor LUT
    (src/video.c:2234-2240 built for the SECAM cgain modulator)."""
    r = np.arange(-32768, 32768, dtype=np.float64)
    d = 2.0 * np.pi / pixel_rate * (SECAM_FM_FREQ
                                    + r * SECAM_FM_DEV / INT16_MAX)
    M = 2147483647.0
    q = lambda x: np.where(x >= 0, np.floor(x + 0.5),
                           -np.floor(-x + 0.5))
    lut = np.empty((65536, 2), np.int32)
    lut[:, 0] = q(np.cos(d) * M)
    lut[:, 1] = q(np.sin(d) * M)
    return np.ascontiguousarray(lut)


def carrier_addin_host(st: SecamStatics, W: int, meta: dict,
                       chroma: np.ndarray, lut: np.ndarray) -> np.ndarray:
    """Exact SECAM chroma carrier contribution [B, W] int16 via the
    native per-line int32 recurrence (rt_secam_carrier_exact)."""
    from .. import runtime
    lib = runtime.load()
    B = chroma.shape[0]
    sl = st.burst_left
    sr = np.where(meta["active"] > 0,
                  np.where(meta["half_only"] > 0, st.half_width,
                           sl + st.burst_len), 0).astype(np.int32)
    sign = np.where(meta["phase_pos"] > 0, 1, -1).astype(np.int8)
    bell = getattr(st, "_bell_iq", None)
    if bell is None:
        bell = np.ascontiguousarray(
            np.stack([st.bell_i, st.bell_q], axis=-1))
        object.__setattr__(st, "_bell_iq", bell)
    ch = np.ascontiguousarray(chroma, dtype=np.int16)
    out = np.empty((B, W), np.int16)
    import ctypes as C
    p = lambda a: a.ctypes.data_as(C.c_void_p)
    import os
    lib.rt_secam_carrier_exact(p(ch), B, W, sl, p(sr), p(sign), p(lut),
                               p(bell), st.level_int,
                               p(st._win_q), p(out),
                               min(8, os.cpu_count() or 1))
    return out


def render(st: SecamStatics, out: jnp.ndarray,
           carrier_add: jnp.ndarray,                # [B, W] int16 add-in
           meta: dict):
    """SECAM line processing on device: luma band-reject over the
    active segment, plus the host-exact chroma carrier add-in."""
    B, W = out.shape
    cols = jnp.arange(W, dtype=jnp.int32)[None, :]
    act = meta["active"][:, None]

    # luma band-reject over the active segment (zero history at segment
    # start, real samples beyond its end — src/video.c:3206)
    seg = (cols >= st.active_left) & (cols < st.active_left + st.active_width)
    luma_masked = jnp.where(cols >= st.active_left, out, 0.0)
    luma_f = _line_conv(st.luma_taps, luma_masked)
    out = jnp.where(seg & (act > 0), luma_f, out)

    return out + carrier_add.astype(jnp.float32)
