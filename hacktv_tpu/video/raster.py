"""Batched raster synthesis: whole blocks of scan lines as one array op.

This replaces the reference's line-at-a-time renderer
(src/video.c:2864-3066 `_vid_next_line_raster`) with a vectorised pipeline
over a [n_lines, width] batch:

  sync templates (gather) -> luma placement (where) -> chroma conv
  -> burst insert -> subcarrier mix (closed-form carrier phase)

The colour carrier is evaluated in closed form from the absolute sample
index using the exact rational pixel_rate/fsc = cl_num/cl_den — equivalent
to the reference's wrap-around carrier LUT (src/video.c:3961-3987,
2905-2910) with no sequential state.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..config.standards import ColourMode
from .params import VideoParams


@dataclass
class RasterStatics:
    """Device-resident constants for the jitted raster function."""
    width: int
    margin: int
    col0: int                  # active_left + vframe_x: first source column
    frame_w: int
    blanking: float
    black_y: float
    sync_main: jnp.ndarray     # [n_codes, width]
    sync_tail: jnp.ndarray     # [n_codes, margin]
    sync_head: np.ndarray      # [n_codes, width]: spill past line end
    chroma_taps: jnp.ndarray | None
    burst_left: int
    burst_u: jnp.ndarray | None
    burst_v: jnp.ndarray | None
    colour: bool
    # Colour carrier.  When the carrier cycle is a whole number of lines
    # (standard rates), the reference's int16 LUT (src/video.c:3961-3987)
    # collapses to one row per line-phase class: carrier_rows[P, W, 2] and
    # a per-line row index — bit-exact and one gather per line.  Otherwise
    # fall back to the angle-addition evaluation (cos0/sin0 per line +
    # per-column table).
    carrier_rows: tuple | None        # ([P, width] cos, [P, width] sin)
    carrier_cos: jnp.ndarray | None   # [width]
    carrier_sin: jnp.ndarray | None   # [width]
    # YUV conversion
    gamma: float
    rw: float
    gw: float
    bw: float
    eu: float
    ev: float
    y_scale: float             # (white - black) * level   (fractions)
    y_offset: float            # black * level
    uv_scale: float
    fsc_mode: str | None = None        # 'apollo' | 'cbs'
    fsc_tpl: np.ndarray | None = None  # [3, W] flag pulse templates


def make_statics(p: VideoParams, vframe_x: int = 0,
                 frame_w: int | None = None) -> RasterStatics:
    conf = p.conf
    colour = conf.colour_mode in (ColourMode.PAL, ColourMode.NTSC)
    ccos = csin = rows = None
    if colour and p.cl_num:
        import math as _m
        g = _m.gcd(p.width, p.cl_num)
        P = p.cl_num // g
        if P <= 4096:
            # exact LUT rows: line k starts at offset (k*W) mod cl_num,
            # always a multiple of g, so P distinct rows cover every
            # line.  The reference LUT entry is round(cos(d*c)*32767)
            # with d*c accumulating f64 drift over the UNWRAPPED index c
            # (the table is extended by one line rather than wrapped,
            # src/video.c:3961-3985) — reproduce that exactly, with C's
            # half-away-from-zero lround.
            # Separate cos/sin planes: interleaving the pair into a
            # minor dim of 2 forces an XLA layout copy of the whole
            # gathered block (T(2,128) -> T(8,128))
            off = (np.arange(P, dtype=np.int64)[:, None] * g
                   + np.arange(p.width, dtype=np.int64)[None, :]
                   ).astype(np.float64)
            d = 2.0 * np.pi * (p.cl_den / p.cl_num)
            lr = lambda a: np.where(a >= 0, np.floor(a + 0.5),
                                    np.ceil(a - 0.5))
            rows = (
                lr(np.cos(d * off) * 32767.0).astype(np.float32),
                lr(np.sin(d * off) * 32767.0).astype(np.float32))
        else:
            # angle(x) = 2*pi*((x*cl_den) mod cl_num)/cl_num, exact ints
            # evaluated in float64 on the host.
            x = np.arange(p.width, dtype=np.int64)
            v = (x * p.cl_den) % p.cl_num
            ang = 2.0 * np.pi * v / p.cl_num
            ccos = np.cos(ang).astype(np.float32)
            csin = np.sin(ang).astype(np.float32)
    fsc_mode = None
    fsc_tpl = None
    if conf.colour_mode in (ColourMode.APOLLO_FSC, ColourMode.CBS_FSC):
        # FSC ID flag pulses (src/video.c:4049-4072, 3043-3063)
        import math as _math
        from ..ops.shapes import IRT1090, rc_window
        fsc_mode = ("apollo" if conf.colour_mode == ColourMode.APOLLO_FSC
                    else "cbs")
        d = _math.trunc((conf.fsc_flag_level - conf.blanking_level)
                        * p.level * 32767)
        rise = conf.sync_rise * IRT1090 * p.pixel_rate
        x = np.arange(p.width, dtype=np.float64)
        left = conf.fsc_flag_left * p.pixel_rate
        wid = conf.fsc_flag_width * p.pixel_rate
        p1 = np.round(rc_window(x, left, wid, rise) * d)
        tpl = np.zeros((3, p.width), dtype=np.float32)
        tpl[1] = p1
        if fsc_mode == "cbs":
            p2 = np.round(rc_window(x, p.width / 2 + left, wid, rise) * d)
            tpl[2] = p2
        fsc_tpl = tpl
    return RasterStatics(
        width=p.width,
        margin=p.syncs.margin,
        col0=p.active_left + vframe_x,
        frame_w=frame_w if frame_w is not None else p.active_width,
        blanking=float(p.blanking_level),
        black_y=float(_black_y_level(p)),
        sync_main=np.asarray(p.syncs.main),
        sync_tail=np.asarray(p.syncs.left_tail),
        sync_head=np.asarray(p.syncs.right_head),
        chroma_taps=(np.asarray(p.chroma_taps)
                     if p.chroma_taps is not None else None),
        burst_left=p.burst_left,
        burst_u=np.asarray(p.burst_u) if p.burst_u is not None else None,
        burst_v=np.asarray(p.burst_v) if p.burst_v is not None else None,
        colour=colour,
        carrier_rows=rows,
        carrier_cos=ccos,
        carrier_sin=csin,
        gamma=p.gamma,
        rw=p.rw_co, gw=p.gw_co, bw=p.bw_co,
        eu=conf.eu_co, ev=conf.ev_co,
        y_scale=(conf.white_level - conf.black_level) * p.level,
        y_offset=conf.black_level * p.level,
        uv_scale=(conf.white_level - conf.black_level) * p.level,
        fsc_mode=fsc_mode,
        fsc_tpl=fsc_tpl,
    )


def _black_y_level(p: VideoParams) -> int:
    """yuv_level_lookup[0x000000].y: quantised black (src/video.c:3942-3956)."""
    conf = p.conf
    y = conf.black_level * p.level
    y = min(max(y, -1.0), 1.0)
    return int(round(y * 32767))


def rgb_to_yuv_host(p, rgb: np.ndarray, secam: bool = False):
    """RGB u8 [H, W, 3] -> quantised (Y, U, V) int16-valued f32 [H, W].

    Matches the reference's 16M-entry LUT build (src/video.c:3897-3959)
    bit-exactly: the conversion runs in float64 on the host (boundary
    rounding in f32 would systematically shift whole colour regions,
    which FM modes integrate into phase drift).  Cached per source frame
    by the encoder.
    """
    from ..config.standards import (SECAM_CB_FREQ, SECAM_CR_FREQ,
                                    SECAM_FM_DEV, SECAM_FM_FREQ)
    conf = p.conf
    glut = np.power(np.arange(256) / 255.0, 1.0 / p.gamma)
    r = glut[rgb[..., 0]]
    g = glut[rgb[..., 1]]
    b = glut[rgb[..., 2]]
    y = r * p.rw_co + g * p.gw_co + b * p.bw_co
    u = (b - y) * conf.eu_co
    v = (r - y) * conf.ev_co
    yl = (conf.black_level + y * (conf.white_level - conf.black_level)) \
        * p.level
    if not secam:
        scale = (conf.white_level - conf.black_level) * p.level
        ul = u * scale
        vl = v * scale
    else:
        ul = (u + (SECAM_CB_FREQ - SECAM_FM_FREQ)) / SECAM_FM_DEV
        vl = (v + (SECAM_CR_FREQ - SECAM_FM_FREQ)) / SECAM_FM_DEV
    q = lambda a: np.round(np.clip(a, -1.0, 1.0) * 32767.0
                           ).astype(np.float32)
    return q(yl), q(ul), q(vl)


_YUV_LUT_CACHE: dict = {}


def build_yuv_lut(p, secam: bool = False) -> np.ndarray:
    """The reference's full 16M-entry RGB -> (Y, U, V) lookup table
    (src/video.c:3897-3959), built bit-exactly THROUGH rgb_to_yuv_host
    so LUT[r<<16|g<<8|b] == the per-pixel conversion.  int16 [2^24, 3]
    (~96 MB, built once per encoder when a moving source needs the
    on-device conversion path)."""
    conf = p.conf
    key = (p.gamma, p.rw_co, p.gw_co, p.bw_co, conf.eu_co, conf.ev_co,
           conf.black_level, conf.white_level, p.level, bool(secam))
    hit = _YUV_LUT_CACHE.get(key)
    if hit is not None:
        return hit
    import hashlib
    import os
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/hacktv_tpu_xla"))
    tag = hashlib.sha256(repr(key).encode()).hexdigest()[:16]
    path = os.path.join(cache_dir, f"yuvlut_{tag}.npy")
    try:
        lut = np.load(path, mmap_mode=None)
        if lut.shape == (1 << 24, 3) and lut.dtype == np.int16:
            _YUV_LUT_CACHE[key] = lut
            return lut
    except Exception:
        pass
    lut = np.empty((1 << 24, 3), np.int16)
    chunk = 1 << 20
    for base in range(0, 1 << 24, chunk):
        idx = np.arange(base, base + chunk, dtype=np.uint32)
        rgb = np.empty((1, chunk, 3), np.uint8)
        rgb[0, :, 0] = idx >> 16
        rgb[0, :, 1] = (idx >> 8) & 0xFF
        rgb[0, :, 2] = idx & 0xFF
        y, u, v = rgb_to_yuv_host(p, rgb, secam)
        lut[base:base + chunk, 0] = y[0]
        lut[base:base + chunk, 1] = u[0]
        lut[base:base + chunk, 2] = v[0]
    if len(_YUV_LUT_CACHE) > 2:
        _YUV_LUT_CACHE.clear()
    _YUV_LUT_CACHE[key] = lut
    try:
        os.makedirs(cache_dir, exist_ok=True)
        np.save(path + ".tmp.npy", lut)
        os.replace(path + ".tmp.npy", path)
    except Exception:
        pass
    return lut


def yuv_convert_device(lut, rgb_u8):
    """On-device frame conversion: one gather from the 16M LUT
    (measured ~0.7 ms/frame on a v5e including the uint8 upload — the
    host f64 path costs tens of ms per frame and bound moving-video
    throughput).  rgb_u8 may be a single frame [H, W, 3] or a stacked
    block of frames [NF, H, W, 3]."""
    idx = ((rgb_u8[..., 0].astype(jnp.int32) << 16)
           | (rgb_u8[..., 1].astype(jnp.int32) << 8)
           | rgb_u8[..., 2].astype(jnp.int32))
    sh = idx.shape
    out = lut[idx.reshape(-1)].astype(jnp.float32).reshape(*sh, 3)
    return out[..., 0], out[..., 1], out[..., 2]


def stack_planes(y, u, v, black_y: float):
    """[NF, H, W] planes -> [(NF)(H+1), W] with each frame followed by
    its black/zero fallback row, so a single absolute row index
    f*(H+1) + vy (or +H for out-of-frame) gathers across the whole
    multi-frame block."""
    NF, H, W = y.shape
    yb = jnp.concatenate(
        [y, jnp.full((NF, 1, W), black_y, y.dtype)], axis=1)
    ub = jnp.concatenate([u, jnp.zeros((NF, 1, W), u.dtype)], axis=1)
    vb = jnp.concatenate([v, jnp.zeros((NF, 1, W), v.dtype)], axis=1)
    return (yb.reshape(NF * (H + 1), W), ub.reshape(NF * (H + 1), W),
            vb.reshape(NF * (H + 1), W))


def _chroma_filter(taps: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Per-line 'same' convolution with zero-padded line edges.

    Equivalent to the reference's per-line block FIR on the chrominance
    buffer (src/video.c:3017-3021, fir_int16_process_block).
    """
    n = taps.shape[0]
    W = x.shape[1]
    pad = n // 2
    xp = jnp.pad(x, ((0, 0), (pad, n - 1 - pad)))
    # unrolled shifted-slice FMA: XLA fuses the n reads into one VPU pass
    # (conv_general_dilated with a single feature dim lowers to a bf16
    # data-formatting pipeline that dominates the step)
    rt = taps[::-1]
    out = rt[0] * xp[:, 0:W]
    for k in range(1, n):
        out = out + rt[k] * xp[:, k:k + W]
    # the reference's integer FIR truncates the >>15 accumulator and
    # clamps to int16 (src/fir.c:347-348); FM modes integrate the
    # baseband so even sub-LSB bias matters
    return jnp.clip(jnp.floor(out), -32768, 32767)


def synth_block(st: RasterStatics,
                yuv,                    # (Y, U, V) f32 [H, frame_w] each
                base: jnp.ndarray,      # i32 [B]
                nxt: jnp.ndarray,       # i32 [B]
                burst: jnp.ndarray,     # f32 [B] 0/1
                vswitch: jnp.ndarray,   # f32 [B] +-1
                vy: jnp.ndarray,        # i32 [B]
                al: jnp.ndarray,        # i32 [B]
                ar: jnp.ndarray,        # i32 [B]
                cos0: jnp.ndarray,      # f32 [B] carrier phase at line start
                sin0: jnp.ndarray,      # f32 [B]
                lut_row: jnp.ndarray = None,   # i32 [B] carrier LUT row
                fsc: jnp.ndarray = None,       # i32 [B] FSC field channel
                fscf: jnp.ndarray = None,      # i32 [B] FSC flag selector
                prv: jnp.ndarray = None,       # i32 [B] previous line code
                split_chroma: bool = False,
                stacked_h: int = 0,
                ) -> jnp.ndarray:
    """Synthesise a block of lines -> f32 [B, width] (luma+chroma composite,
    int16-scaled). Lines are independent; the only cross-line term is the
    next line's leading sync tail.  With split_chroma (S-Video) the
    subcarrier is returned as a second [B, width] channel instead."""
    B = base.shape[0]
    W = st.width

    y_img, u_img, v_img = yuv
    H = y_img.shape[-2]

    # Row gather with black fallback
    black_row = jnp.full((1, y_img.shape[-1]), st.black_y,
                         dtype=y_img.dtype)
    zero_row = jnp.zeros((1, u_img.shape[-1]), dtype=u_img.dtype)
    if stacked_h:
        # multi-frame block: planes are [(NF)(H+1), W] with per-frame
        # fallback rows prebuilt, and vy is already an absolute index
        # (f_local*(H+1) + row, or + H for the fallback row)
        y_rows = y_img[vy]
        u_rows = u_img[vy]
        v_rows = v_img[vy]
        has_video = (vy % stacked_h) != (stacked_h - 1)
        return _synth_rows(st, y_rows, u_rows, v_rows, has_video, base,
                           nxt, burst, vswitch, al, ar, cos0, sin0,
                           lut_row, fscf, prv, split_chroma)
    vy_safe = jnp.where(vy >= 0, vy, H)
    if st.fsc_mode is not None:
        # field-sequential colour: y_img is [3, H, W] (one grey plane
        # per B/G/R field, src/video.c:2989-2994); fold the per-line
        # channel into the row gather
        planes = jnp.concatenate(
            [jnp.concatenate([y_img[c], black_row], axis=0)
             for c in range(3)], axis=0)
        y_rows = planes[fsc * (H + 1) + vy_safe]
    else:
        yp = jnp.concatenate([y_img, black_row], axis=0)
        y_rows = yp[vy_safe]    # [B, frame_w]
    up = jnp.concatenate([u_img, zero_row], axis=0)
    vp = jnp.concatenate([v_img, zero_row], axis=0)
    u_rows = up[vy_safe]
    v_rows = vp[vy_safe]
    return _synth_rows(st, y_rows, u_rows, v_rows, vy >= 0, base, nxt,
                       burst, vswitch, al, ar, cos0, sin0, lut_row,
                       fscf, prv, split_chroma)


def _synth_rows(st, y_rows, u_rows, v_rows, has_video_rows, base, nxt,
                burst, vswitch, al, ar, cos0, sin0, lut_row, fscf, prv,
                split_chroma):
    """Shared synthesis tail: source rows -> composite lines."""
    W = st.width

    # Place source columns into the line; at very low rates the active
    # region can round past the end of the line, so trim columns
    pad_r = W - st.col0 - st.frame_w
    if pad_r < 0:
        y_rows = y_rows[:, :st.frame_w + pad_r]
        u_rows = u_rows[:, :st.frame_w + pad_r]
        v_rows = v_rows[:, :st.frame_w + pad_r]
        pad_r = 0
    y_full = jnp.pad(y_rows, ((0, 0), (st.col0, pad_r)),
                     constant_values=st.black_y)
    u_full = jnp.pad(u_rows, ((0, 0), (st.col0, pad_r)))
    v_full = jnp.pad(v_rows, ((0, 0), (st.col0, pad_r)))

    cols = jnp.arange(W, dtype=jnp.int32)[None, :]
    active = (cols >= al[:, None]) & (cols < ar[:, None])
    in_frame = (cols >= st.col0) & (cols < st.col0 + st.frame_w)

    # Base line: blanking + syncs, plus next line's leading-pulse tail
    out = jnp.asarray(st.sync_main)[base]
    out = out.at[:, W - st.margin:].add(jnp.asarray(st.sync_tail)[nxt])
    if prv is not None and np.any(st.sync_head):
        # previous line's pulses spilling past its end (Baird 240)
        out = out + jnp.asarray(st.sync_head)[prv]

    out = jnp.where(active, y_full, out)

    if st.colour:
        has_video = in_frame & has_video_rows[:, None]
        uc = jnp.where(active & has_video, u_full, 0.0)
        vc = jnp.where(active & has_video, v_full, 0.0)
        if st.chroma_taps is not None:
            uc = _chroma_filter(st.chroma_taps, uc)
            vc = _chroma_filter(st.chroma_taps, vc)
        # Burst overwrite (src/video.c:3023-3029)
        if st.burst_u is not None:
            bl = st.burst_left
            bn = st.burst_u.shape[0]
            uc = uc.at[:, bl:bl + bn].set(st.burst_u[None, :])
            vc = vc.at[:, bl:bl + bn].set(st.burst_v[None, :])
        # Colour subcarrier: exact LUT row per line when available,
        # otherwise angle addition against the static per-column table.
        if st.carrier_rows is not None:
            cos_t = jnp.asarray(st.carrier_rows[0])[lut_row]
            sin_t = jnp.asarray(st.carrier_rows[1])[lut_row]
        else:
            cos_t = jnp.round((cos0[:, None] * st.carrier_cos
                               - sin0[:, None] * st.carrier_sin) * 32767.0)
            sin_t = jnp.round((sin0[:, None] * st.carrier_cos
                               + cos0[:, None] * st.carrier_sin) * 32767.0)
        # The reference's mix is integer: (lut.i*V*pal + lut.q*U) >> 15
        # (src/video.c:3031-3041).  The products reach ~2^30, beyond
        # f32's 24-bit mantissa — a float path floors +1 on ~1e-4 of
        # samples, and FM-video modes integrate that bias into a phase
        # ramp.  Do the multiply-accumulate-shift in int32 exactly.
        sub = ((cos_t.astype(jnp.int32)
                * (vc * vswitch[:, None]).astype(jnp.int32)
                + sin_t.astype(jnp.int32) * uc.astype(jnp.int32))
               >> 15).astype(jnp.float32)
        chroma_ch = jnp.where(burst[:, None] > 0, sub, 0.0)
        if split_chroma:
            # S-Video: the subcarrier goes to the second (C) channel
            # instead of adding to the composite (src/video.c:3032)
            pass
        else:
            out = out + chroma_ch
    else:
        chroma_ch = jnp.zeros_like(out)

    if st.fsc_mode is not None:
        # FSC ID flag pulses (src/video.c:3043-3063)
        out = out + jnp.asarray(st.fsc_tpl)[fscf]

    if split_chroma:
        return out, chroma_ch
    return out
