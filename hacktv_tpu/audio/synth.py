"""Device-side audio subcarrier synthesis.

Batched replacements for the reference's per-sample modulators
(src/video.c:3392-3443):

  - FM carrier: phase = carrier term (static per-column angle table +
    per-line rotation) + deviation term (piecewise-linear within the
    zero-order-hold segments provided by AudioChain); two transcendentals
    per sample, everything else FMA
  - NICAM DQPSK (src/nicam728.c:342-411): the 364 kbaud symbol grid
    repeats against the line grid with a small period P (e.g. 125 lines
    for 16 MS/s PAL), so the pulse shapes of the <=32 symbols overlapping
    each line form a static [P, NSLOT, W] tap tensor and synthesis is one
    batched matmul over per-line symbol amplitudes — MXU work instead of
    a scatter + megasample conv, which XLA cannot compile efficiently.

All quantisation follows the reference's integer arithmetic: carrier
values round to the int16 grid, products floor-divide by 2^15/2^16.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class FMStatics:
    level_int: int
    kd: float
    cos_x: jnp.ndarray     # [W] carrier angle table at col+1
    sin_x: jnp.ndarray
    nseg: int
    eps: float = 0.0       # deterministic tie-break phase lag
    lam: float = 0.0       # per-step int32 magnitude decay (sawtooth)
    # direct per-sample transcendentals instead of the piecewise
    # rotation chain: the chain's deep f32 FMA sequences can contract
    # differently between compilations (e.g. sharded vs single-device),
    # flipping floor() outcomes on ~0.05% of samples; the multichip
    # bit-exactness harness forces the shallow path on both sides
    direct: bool = False


def make_fm_statics(num: int, den: int, level_int: int, kd: float,
                    width: int, nseg: int, eps: float = 0.0,
                    lam: float = 0.0) -> FMStatics:
    # theta_c(n) = 2*pi*num*(n+1)/den; per-column part for n = line*W + col
    x = np.arange(1, width + 1, dtype=np.int64)
    ang = 2.0 * np.pi * ((x * num) % den) / den
    return FMStatics(level_int=level_int, kd=kd,
                     cos_x=np.cos(ang).astype(np.float32),
                     sin_x=np.sin(ang).astype(np.float32),
                     nseg=nseg, eps=eps, lam=lam)


def fm_add(st: FMStatics, out_i: jnp.ndarray, out_q: jnp.ndarray,
           seg_val: jnp.ndarray,   # f32 [B, NSEG]
           seg_base: jnp.ndarray,  # f32 [B, NSEG]
           seg_col: jnp.ndarray,   # i32 [B, NSEG]
           c0: jnp.ndarray,        # f32 [B]
           s0: jnp.ndarray,        # f32 [B]
           cyc0: jnp.ndarray,      # f32 [B] renorm-cycle position at col 0
           phi_extra=None,         # f32 [B, W] extra deviation phase
           ):
    """Add one FM carrier to the (I, Q) block [B, W].

    The per-column phase is piecewise affine over the hold segments.  It
    is evaluated as telescoped step functions with arithmetic masks —
    `select` feeding transcendentals triggers a pathological (minutes)
    Mosaic/XLA compile, mask-multiplies compile instantly.
    """
    B, W = out_i.shape
    colsf = jnp.arange(W, dtype=jnp.float32)[None, :]
    kd = np.float32(st.kd)

    # affine pieces: phi_j(col) = A_j + B_j*col with
    # A_j = base_j + kd*v_j*(1 - c_j), B_j = kd*v_j
    segA = seg_base + kd * seg_val * (1.0 - seg_col.astype(jnp.float32))
    segB = kd * seg_val

    A = jnp.broadcast_to(segA[:, 0][:, None], (B, W))
    Bc = jnp.broadcast_to(segB[:, 0][:, None], (B, W))
    for j in range(1, st.nseg):
        m = (colsf >= seg_col[:, j][:, None].astype(jnp.float32)
             ).astype(jnp.float32)
        A = A + m * (segA[:, j] - segA[:, j - 1])[:, None]
        Bc = Bc + m * (segB[:, j] - segB[:, j - 1])[:, None]

    if phi_extra is not None or st.direct or W % 128:
        # direct transcendentals: an arbitrary extra phase (A2 pilot)
        # breaks the piecewise-affine structure, and on widths that
        # don't tile the 128-lane register (e.g. NTSC's 858) the
        # piecewise path's [::K] slices lower to layout copies that
        # cost more than the saved transcendentals
        phi = A + Bc * colsf
        if phi_extra is not None:
            phi = phi + phi_extra
        cphi = jnp.cos(phi)
        sphi = jnp.sin(phi)
    else:
        # piecewise rotation: the phase is affine inside each hold
        # segment, so transcendentals are only needed at every K-th
        # column; the rest follow by chained angle-addition with the
        # per-column step rotation (cos/sin of the telescoped slope) —
        # the VPU transcendental budget was the flagship's roofline
        # bound (PERF.md).
        K = 4
        Wp = -(-W // K) * K
        pad = Wp - W
        segCB = jnp.cos(segB)          # per-segment step rotation
        segSB = jnp.sin(segB)
        CB = jnp.broadcast_to(segCB[:, 0][:, None], (B, W))
        SB = jnp.broadcast_to(segSB[:, 0][:, None], (B, W))
        for j in range(1, st.nseg):
            m = (colsf >= seg_col[:, j][:, None].astype(jnp.float32)
                 ).astype(jnp.float32)
            CB = CB + m * (segCB[:, j] - segCB[:, j - 1])[:, None]
            SB = SB + m * (segSB[:, j] - segSB[:, j - 1])[:, None]
        phi = A + Bc * colsf
        if pad:
            phi = jnp.pad(phi, ((0, 0), (0, pad)))
            CB = jnp.pad(CB, ((0, 0), (0, pad)))
            SB = jnp.pad(SB, ((0, 0), (0, pad)))
        c_cur = jnp.cos(phi[:, ::K])
        s_cur = jnp.sin(phi[:, ::K])
        pc = [c_cur]
        ps = [s_cur]
        for t in range(1, K):
            cb = CB[:, t::K]
            sb = SB[:, t::K]
            c_cur, s_cur = (c_cur * cb - s_cur * sb,
                            s_cur * cb + c_cur * sb)
            pc.append(c_cur)
            ps.append(s_cur)
        cphi = jnp.stack(pc, axis=2).reshape(B, Wp)[:, :W]
        sphi = jnp.stack(ps, axis=2).reshape(B, Wp)[:, :W]

    # carrier angle: theta_c = rot(line) + table(col); combine rotations
    cc = c0[:, None] * st.cos_x[None, :] - s0[:, None] * st.sin_x[None, :]
    cs = s0[:, None] * st.cos_x[None, :] + c0[:, None] * st.sin_x[None, :]

    # cos/sin(theta_c + phi)
    ci = cc * cphi - cs * sphi
    cq = cs * cphi + cc * sphi
    # tie-break rotation matching the reference's int-iteration phase lag
    if st.eps:
        e = np.float32(st.eps)
        ci, cq = ci - e * cq, cq + e * ci
    if st.lam:
        # int32 magnitude sawtooth between renormalisations
        cyc = cyc0[:, None] + colsf + 1.0
        cyc = cyc - 32767.0 * (cyc >= 32767.0).astype(jnp.float32)
        scale = 1.0 - np.float32(st.lam) * cyc
        ci = ci * scale
        cq = cq * scale

    # reference: ((phase.i >> 16) * level) >> 15 — two truncating shifts
    lvl = np.float32(st.level_int)
    inv = np.float32(1.0 / 32768.0)
    # phase.i>>16 yields at most 32767 (int32 phase magnitude
    # 2^31-1); floor(cos*32768) hits 32768 at the exact peaks, so clamp
    add_i = jnp.floor(jnp.clip(jnp.floor(ci * 32768.0), -32768, 32767) * lvl * inv)
    add_q = jnp.floor(jnp.clip(jnp.floor(cq * 32768.0), -32768, 32767) * lvl * inv)
    return out_i + add_i, out_q + add_q


def _class_windows(x, offq, offr, m_step: int, G: int, S: int):
    """[P, G, S] windows into the 1-D stream x: class c's window g starts
    at offq[c]*m_step + offr[c] + g*m_step (one dynamic_slice per class —
    gathers are pathologically slow on this target)."""
    P = offq.shape[0]
    s2 = x.reshape(-1, m_step)
    X = jnp.concatenate([s2[:-1], s2[1:, :S]], axis=1)
    return jnp.stack([
        jax.lax.dynamic_slice(X, (offq[c], offr[c]), (G, S))
        for c in range(P)])


def _cumsum_mod(x, M: int, bound: int):
    """Inclusive prefix sums mod M of int32 x with |values| < bound,
    exact in int32 via hierarchical row sums (M must be < 2^30)."""
    n = x.shape[0]
    C = int((2 ** 31 - 1) // max(bound, 1))
    if n <= C:
        return jnp.cumsum(x) % M
    C = min(C, 1024)
    R = -(-n // C)
    x2 = jnp.pad(x, (0, R * C - n)).reshape(R, C)
    within = jnp.cumsum(x2, axis=1)
    rows = within[:, -1] % M
    offs = _cumsum_mod(rows, M, M)
    offs_ex = jnp.concatenate([jnp.zeros(1, jnp.int32), offs[:-1]])
    return (((within % M) + offs_ex[:, None]) % M).reshape(-1)[:n]


def tile_tab(tab, B: int):
    """Tile a per-period table to B lines."""
    P = tab.shape[0]
    if P >= B:
        return tab[:B]
    reps = -(-B // P)
    return jnp.tile(tab, reps)[:B]


@dataclass
class FMWin:
    """Static config for on-device FM segment assembly: the zero-order
    hold segments (src/video.c:3273-3277) of all G lines of a line class
    form consecutive windows of the audio-rate held-value stream, and the
    deviation phase integral is an exact int32 prefix sum mod M (2*pi *
    deviation/(fs*32767) * X == 2*pi * (X mod M)/M when deviation divides
    fs*32767)."""
    P_a: int           # line-class period
    m_step: int        # audio pairs consumed per period
    nseg: int
    NH: int            # held-window length (multiple of m_step)
    M: int             # phase modulus (< 2^24 so f32(X) is exact)
    prod_bound: int    # max |held * len|
    lens_tiled: jnp.ndarray    # [NH + max_len_period] hold lengths
    Wmod: int          # width mod 32767 (for the renorm-cycle counter)


def held_device(carrier, pcm: jnp.ndarray, lim_hist: int) -> jnp.ndarray:
    """Post-limiter held FM samples from the raw PCM window, on device
    (mirrors AudioChain._held_values for the simple channels; the
    reference's per-sample audio pipeline, src/video.c:3280-3330)."""
    l = pcm[:, 0].astype(jnp.int32)
    r = pcm[:, 1].astype(jnp.int32)
    if carrier.channel == "mono":
        t = l + r
        x = jnp.where(t < 0, -((-t) // 2), t // 2)   # C trunc division
    elif carrier.channel == "left":
        x = l
    else:
        x = r
    out = (carrier.limiter.device_process(x)
           if carrier.limiter is not None else x)
    return out[lim_hist:].astype(jnp.int16)


def fm_prepare(fw: FMWin, st: FMStatics, B: int,
               held: jnp.ndarray,      # i16 [NH]
               xa: jnp.ndarray,        # i32 scalar: phase accum at i0
               lens_off: jnp.ndarray,  # i32 scalar: i0 mod len-period
               offq: jnp.ndarray,      # i32 [P_a]
               offr: jnp.ndarray,      # i32 [P_a]
               col0: jnp.ndarray,      # i32 [P_a, nseg]
               ctab: jnp.ndarray,      # f32 [P_r] carrier cos table
               stab: jnp.ndarray,      # f32 [P_r]
               cyc_base: jnp.ndarray,  # i32 scalar
               adv=None,               # i32 scalar: next block's i0 - i0
               ):
    """Assemble the per-line fm_add arguments on device from the compact
    per-block upload (the [B, nseg] f32 arrays dominated the H2D budget,
    and transfers serialise with compute on this runtime).  With `adv`,
    also returns the anchor for the next block (device-held path)."""
    P, S = fw.P_a, fw.nseg
    G = -(-B // P)
    h32 = held.astype(jnp.int32)
    lens = jax.lax.dynamic_slice(fw.lens_tiled, (lens_off,), (fw.NH,))
    prod = h32 * lens
    xincl = _cumsum_mod(prod, fw.M, fw.prod_bound)
    xa_next = None
    if adv is not None:
        xa_next = jnp.where(
            adv > 0,
            (xa + xincl[jnp.clip(adv - 1, 0, fw.NH - 1)]) % fw.M,
            xa).astype(jnp.int32)
    # exclusive prefix + anchor: phase BEFORE each hold period
    xc = jnp.concatenate([jnp.zeros(1, jnp.int32), xincl[:-1]])
    xc = (xc + xa) % fw.M

    vwin = _class_windows(h32, offq, offr, fw.m_step, G, S)
    bwin = _class_windows(xc, offq, offr, fw.m_step, G, S)
    seg_val = jnp.swapaxes(vwin, 0, 1).reshape(-1, S)[:B]
    seg_base_i = jnp.swapaxes(bwin, 0, 1).reshape(-1, S)[:B]
    seg_val = seg_val.astype(jnp.float32)
    seg_base = seg_base_i.astype(jnp.float32) * np.float32(
        2.0 * np.pi / fw.M)

    seg_col = jnp.broadcast_to(col0[None], (G, P, S)).reshape(-1, S)[:B]
    c0 = tile_tab(ctab, B)
    s0 = tile_tab(stab, B)
    b = jnp.arange(B, dtype=jnp.int32) % 32767
    cyc0 = ((cyc_base + b * fw.Wmod) % 32767).astype(jnp.float32)
    if adv is not None:
        return (seg_val, seg_base, seg_col, c0, s0, cyc0), xa_next
    return seg_val, seg_base, seg_col, c0, s0, cyc0


@dataclass
class A2Statics:
    """Static column tables for the A2 pilot chain (the ~54.7 kHz pilot
    AM-modulated by the 117.5/149.9 Hz mode tone, src/video.c:3404-3421)."""
    cos1_x: jnp.ndarray
    sin1_x: jnp.ndarray
    cos2_x: jnp.ndarray
    sin2_x: jnp.ndarray
    level2: int
    kd: float


def make_a2_statics(pilot: dict, kd: float, width: int) -> A2Statics:
    x = np.arange(1, width + 1, dtype=np.int64)
    a1 = 2.0 * np.pi * ((x * pilot["num1"]) % pilot["den1"]) / pilot["den1"]
    a2 = 2.0 * np.pi * ((x * pilot["num2"]) % pilot["den2"]) / pilot["den2"]
    return A2Statics(
        cos1_x=np.cos(a1).astype(np.float32),
        sin1_x=np.sin(a1).astype(np.float32),
        cos2_x=np.cos(a2).astype(np.float32),
        sin2_x=np.sin(a2).astype(np.float32),
        level2=pilot["level2"], kd=kd)


def a2_pilot_phase(st: A2Statics, c1, s1, c2, s2, base_phase):
    """Deviation-phase contribution of the A2 pilot: kd * running sum of
    the per-sample pilot value, with the cross-line carry in
    `base_phase`."""
    C1 = c1[:, None] * st.cos1_x[None, :] - s1[:, None] * st.sin1_x[None, :]
    C2 = c2[:, None] * st.cos2_x[None, :] - s2[:, None] * st.sin2_x[None, :]
    p1 = jnp.clip(jnp.floor(C1 * 32768.0), -32768, 32767)
    s1v = jnp.floor(jnp.floor(p1 * 0.5) * (32767.0 / 32768.0))
    u = jnp.floor((s1v + 32768.0) * 0.5)
    p2 = jnp.clip(jnp.floor(C2 * 32768.0), -32768, 32767)
    # u/2^15 is exact in f32, keeping the product below mantissa loss
    val = jnp.floor(jnp.floor(p2 * (u * (1.0 / 32768.0)))
                    * (st.level2 / 32768.0))
    return base_phase[:, None] + np.float32(st.kd) * jnp.cumsum(val, axis=1)


def am_add(st: FMStatics, out_i: jnp.ndarray, out_q: jnp.ndarray,
           seg_val: jnp.ndarray,   # f32 [B, NSEG] gain (s+32768)/2
           seg_col: jnp.ndarray,   # i32 [B, NSEG]
           c0: jnp.ndarray, s0: jnp.ndarray,
           cyc0: jnp.ndarray):
    """AM audio carrier (src/video.c:2359-2378): contribution
    ((((phase>>16) * s2) >> 15) * level) >> 15, half-modulation."""
    B, W = out_i.shape
    colsf = jnp.arange(W, dtype=jnp.float32)[None, :]
    val = jnp.broadcast_to(seg_val[:, 0][:, None], (B, W))
    for j in range(1, st.nseg):
        m = (colsf >= seg_col[:, j][:, None].astype(jnp.float32)
             ).astype(jnp.float32)
        val = val + m * (seg_val[:, j] - seg_val[:, j - 1])[:, None]

    cc = c0[:, None] * st.cos_x[None, :] - s0[:, None] * st.sin_x[None, :]
    cs = s0[:, None] * st.cos_x[None, :] + c0[:, None] * st.sin_x[None, :]
    if st.eps:
        e = np.float32(st.eps)
        cc, cs = cc - e * cs, cs + e * cc
    if st.lam:
        cyc = cyc0[:, None] + colsf + 1.0
        cyc = cyc - 32767.0 * (cyc >= 32767.0).astype(jnp.float32)
        scale = 1.0 - np.float32(st.lam) * cyc
        cc = cc * scale
        cs = cs * scale
    lvl = np.float32(st.level_int)
    inv = np.float32(1.0 / 32768.0)
    
    add_i = jnp.floor(jnp.floor(jnp.clip(jnp.floor(cc * 32768.0), -32768, 32767) * val * inv)
                      * lvl * inv)
    add_q = jnp.floor(jnp.floor(jnp.clip(jnp.floor(cs * 32768.0), -32768, 32767) * val * inv)
                      * lvl * inv)
    return out_i + add_i, out_q + add_q


# ---------------------------------------------------------------------------
@dataclass
class NicamStatics:
    pulse: jnp.ndarray      # [P, NSLOT, W] static per-class pulse matrices
    lut_i: jnp.ndarray      # [den] int16 carrier LUT, exactly the
    lut_q: jnp.ndarray      # reference's sin_cint16 table (common.c:209)
    den: int                # LUT length (carrier period in samples)
    period: int             # P lines
    nslot: int


def make_nicam_statics(taps: np.ndarray, num: int, den: int, width: int,
                       timing, ntaps_pad: int = 0) -> NicamStatics:
    """Build the per-class pulse tensor.

    `timing` is a nicam.SymbolTiming.  Class c represents absolute lines
    k == c (mod P); slot s holds the pulse of symbol kf(c)+s where kf(c)
    is the first symbol whose pulse reaches into the line.
    """
    ntaps = len(taps)
    span = timing.sps * timing.decimation - timing.dsl
    period = int(np.lcm(span, width) // width)
    syms_per_period = period * width // span * timing.decimation
    assert timing.start(syms_per_period) == period * width

    # slots: max symbols whose pulse [S, S+ntaps) intersects a line
    min_sp = timing.sps - 1
    nslot = int(np.ceil((width + ntaps - 1) / min_sp)) + 2

    # The pattern is computed one period in (line (c+P)*W) so that pulse
    # tails from the previous period are included; kf[c] is stored
    # relative to the first period and may be negative for the very first
    # lines of the stream (masked by the caller).
    pulse = np.zeros((period, nslot, width), dtype=np.float32)
    kf = np.zeros(period, dtype=np.int64)
    for c in range(period):
        line_start = (c + period) * width
        # first symbol with S_k + ntaps > line_start
        k = max(0, (line_start - ntaps) // timing.sps - 2)
        while int(timing.start(k)) + ntaps <= line_start:
            k += 1
        kf[c] = k - syms_per_period
        for s in range(nslot):
            off = int(timing.start(k + s)) - line_start
            if off >= width:
                break
            lo = max(0, off)
            hi = min(width, off + ntaps)
            pulse[c, s, lo:hi] = taps[lo - off: hi - off]

    # the reference's carrier LUT: round(cos(d*i)*32767) over one full
    # period, pointer wrapping at den (src/common.c:209-226,
    # src/nicam728.c:312, src/dance.c:412-416) — built identically so
    # the int32 mix below is bit-exact
    d = 2.0 * np.pi / den * num
    i = np.arange(den, dtype=np.float64)
    lr = lambda a: np.where(a >= 0, np.floor(a + 0.5), np.ceil(a - 0.5))
    st = NicamStatics(
        pulse=pulse,
        lut_i=lr(np.cos(d * i) * 32767.0).astype(np.int16),
        lut_q=lr(np.sin(d * i) * 32767.0).astype(np.int16),
        den=den,
        period=period, nslot=nslot)
    st.kf = kf           # host-side: first symbol per class
    st.syms_per_period = syms_per_period
    return st


def nicam_add(st: NicamStatics, out_i: jnp.ndarray, out_q: jnp.ndarray,
              signs_i: jnp.ndarray,  # f32 [L] per-symbol I signs (padded)
              signs_q: jnp.ndarray,  # f32 [L] per-symbol Q signs
              offq: jnp.ndarray,     # i32 [P] window row per line class
              offr: jnp.ndarray,     # i32 [P] window column per line class
              cc_off: jnp.ndarray,   # i32 [B] carrier LUT offset per line
              k0_mod,                # first line's class offset
              ):
    """Add the NICAM DQPSK burst to the (I, Q) block [B, W].

    The per-(line, slot) symbol amplitude assembly exploits the timing
    periodicity: lines of the same class c (k = c mod P) consume exactly
    syms_per_period symbols per period, so the amplitudes of all G lines
    of a class form a [G, NSLOT] window into the sign stream at stride
    spp — one dynamic_slice per class, producing the [P, G, S] matmul
    operand directly with no gather and no transpose.  The stream buffer
    is zero-prepadded by one period so pre-stream symbols read 0."""
    B, W = out_i.shape
    P, S = st.period, st.nslot
    spp = st.syms_per_period

    pulse = jnp.roll(st.pulse, -k0_mod, axis=0)
    G = -(-B // P)

    def matmul(signs):
        # batched over the line class c: [P, G, S] x [P, S, W] -> [P, G, W]
        r = jax.lax.dot_general(
            _class_windows(signs, offq, offr, spp, G, S), pulse,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        return jnp.swapaxes(r, 0, 1).reshape(-1, W)[:B]

    bb_i = matmul(signs_i)
    bb_q = matmul(signs_q)

    # exact reference mix (cint16_mula, src/common.h:69-78): the
    # baseband accumulators wrap to int16, the products are int32 and
    # the shift is arithmetic.  f32 products overflow the 24-bit
    # mantissa (|bb*cc| ~ 2^30) and their floors walk FM-video phase.
    idx = (cc_off[:, None]
           + jnp.arange(W, dtype=jnp.int32)[None, :]) % st.den
    cci = jnp.asarray(st.lut_i)[idx].astype(jnp.int32)
    ccq = jnp.asarray(st.lut_q)[idx].astype(jnp.int32)
    wrap = lambda b: ((b.astype(jnp.int32) + 0x8000) & 0xFFFF) - 0x8000
    bi = wrap(bb_i)
    bq = wrap(bb_q)
    out_i = out_i + ((bi * cci - bq * ccq) >> 15).astype(jnp.float32)
    out_q = out_q + ((bi * ccq + bq * cci) >> 15).astype(jnp.float32)
    return out_i, out_q
