"""Device-side NICAM-728 bit-domain encoder.

Exact int32 re-implementation of the frame encoder + DQPSK differential
stream (src/nicam728.c:36-249) as a jitted TPU program, fused into the
synthesis step.  The host CPU in this deployment is far too slow for the
per-block bit pipeline (2 cores; ~90 ms/block in vectorised numpy), and
every operation here — J.17 FIR, scale-factor search, companding, parity,
interleave, PRN, differential cumsum — is exact integer arithmetic that
XLA executes in int32 with no rounding concerns:

  - J.17 accumulator bound: sum|taps| * 32767 = 1.55e9 < 2^31
  - differential cumsum bound: 3 * n_syms(block) << 2^31

The host supplies only the raw PCM window for the block's frames and a
handful of scalars (anchor frame mod 16, differential state carry, output
placement offsets); everything downstream stays on device.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from . import nicam as nm


@dataclass
class NicamDevStatics:
    """Static configuration for the fused device encoder."""
    nf_max: int          # frames encoded per block call (padded, fixed)
    L: int               # sign-buffer length (multiple of spp)
    spp: int             # symbols per line-class period
    mode_bits: int       # (mode << 4) | (reserve << 3)
    taps: np.ndarray     # J17 taps (host ints, baked into the trace)
    perm: jnp.ndarray    # bit permutation [728] into (header ++ payload)
    prn: jnp.ndarray     # PRN whitening bytes int32 [91] (byte 0 = 0)


def make_dev_statics(nf_max: int, L: int, spp: int,
                     mode: int = nm.MODE_STEREO,
                     reserve: int = 1) -> NicamDevStatics:
    perm = np.empty(nm.NICAM_FRAME_BITS, dtype=np.int32)
    perm[:24] = np.arange(24)
    perm[24 + nm._ILEAVE] = 24 + np.arange(704)
    prn = np.concatenate([[0], nm._PRN.astype(np.int32)])
    return NicamDevStatics(
        nf_max=nf_max, L=L, spp=spp,
        mode_bits=((mode & 7) << 4) | ((reserve & 1) << 3),
        taps=nm.J17_TAPS.astype(np.int32),
        perm=perm,
        prn=prn)


def _j17(st: NicamDevStatics, x: jnp.ndarray) -> jnp.ndarray:
    """Causal J.17 FIR with int16 wrap (src/nicam728.c:147-162).
    x int32 [N]; out[n] = wrap16((sum_j x[n-82+j] * taps[j]) >> 15)."""
    ntaps = 83
    n = x.shape[0]
    xp = jnp.concatenate([jnp.zeros(ntaps - 1, jnp.int32), x])
    # taps as python constants: indexing a device tap array would plant
    # 83 dynamic-slices in the graph
    acc = int(st.taps[0]) * xp[0:n]
    for j in range(1, ntaps):
        acc = acc + int(st.taps[j]) * xp[j:j + n]
    acc = acc >> 15          # arithmetic shift, like the reference
    return ((acc + 0x8000) & 0xFFFF) - 0x8000


def _scale_factors(blocks: jnp.ndarray) -> jnp.ndarray:
    """[NF, 32] int32 -> [NF] scale index (see nicam.scale_factor_indices)."""
    s = jnp.where(blocks < 0, ~blocks, blocks)
    bl = jnp.zeros_like(s)
    v = s
    for shift in (8, 4, 2, 1):
        hit = v >= (1 << shift)
        bl = bl + jnp.where(hit, shift, 0)
        v = jnp.where(hit, v >> shift, v)
    bl = bl + (s > 0).astype(jnp.int32)
    need = jnp.clip(bl - 8, 1, 7)
    return jnp.max(need, axis=-1)


_SHIFT_T = np.array(nm._SHIFT, dtype=np.int32)
_FACTOR_T = np.array(nm._FACTOR, dtype=np.int32)
# interleave positions: sample x of the 64-slot frame reads
# concat(L, R)[x//2 + 32*(x&1)]
_ILEAVE2 = (np.arange(64) // 2 + 32 * (np.arange(64) & 1)).astype(np.int32)


def signs_device(st: NicamDevStatics, pcm: jnp.ndarray,
                 dsym_in: jnp.ndarray, famod16: jnp.ndarray,
                 base_off: jnp.ndarray, nkeep_syms: jnp.ndarray):
    """Encode nf_max NICAM frames from pcm [nf_max*32 + 82, 2] (int32,
    history-first) and return (signs_i [L], signs_q [L], dsym_out).

    The differential sign stream is placed into a zero buffer at
    base_off; dsym_out is the state after nkeep_syms symbols (the
    anchor hand-off to the next block)."""
    NF = st.nf_max
    hist = nm.J17_NTAPS - 1
    pcm = pcm.astype(jnp.int32)

    l = _j17(st, pcm[:, 0])[hist:].reshape(NF, 32)
    r = _j17(st, pcm[:, 1])[hist:].reshape(NF, 32)
    bl = _scale_factors(l)
    br = _scale_factors(r)

    # compand per channel, interleave L/R at the end with a static
    # gather — a stack/swapaxes interleave of a minor-dim-2 array costs
    # milliseconds of XLA data formatting on this shape
    def compand(ch, b):
        # table lookups as arithmetic: a [NF] gather from an 8-entry
        # table costs ~4ms on this target
        # _SHIFT = [2,2,2,2,3,4,5,6][b] == max(2, b-1)
        # _FACTOR = [0,1,2,4,3,5,6,7][b] == b with 3 and 4 swapped
        sh = jnp.maximum(2, b - 1)[:, None]
        fac = (b + (b == 3) - (b == 4))[:, None]
        v = jnp.right_shift(ch, sh) & 0x3FF
        # parity over the 6 MSBs
        t = (v >> 4) & 0x3F
        for s in (4, 2, 1):
            t = t ^ (t >> s)
        v = v | ((t & 1) << 10)
        # scale-factor signalling on the first 54 samples (pairs 0..26)
        p = jnp.arange(32, dtype=jnp.int32)
        sigb = jnp.right_shift(fac, (2 - (p % 3))[None, :]) & 1
        return v ^ jnp.where(p[None, :] < 27, sigb << 10, 0)

    v = jnp.concatenate([compand(l, bl), compand(r, br)],
                        axis=1)[:, _ILEAVE2]

    # header (FAW + control bits); c0 depends on frame index mod 16
    fnum = famod16 + jnp.arange(NF, dtype=jnp.int32)
    c0 = 1 - ((fnum >> 3) & 1)
    hdr = (nm.NICAM_FAW << 16) | ((c0 << 7) | st.mode_bits) << 8
    hdr_bits = jnp.right_shift(hdr[:, None],
                               (23 - jnp.arange(24, dtype=jnp.int32)
                                )[None, :]) & 1

    # payload bits, LSB first per 11-bit sample word
    bits = jnp.right_shift(v[:, :, None],
                           jnp.arange(11, dtype=jnp.int32)[None, None, :]
                           ) & 1
    full = jnp.concatenate([hdr_bits, bits.reshape(NF, 704)], axis=1)
    frame_bits = full[:, st.perm]           # static interleave

    # pack to bytes + PRN whitening (bytes 1..90)
    w = (1 << (7 - jnp.arange(8, dtype=jnp.int32)))[None, None, :]
    by = jnp.sum(frame_bits.reshape(NF, 91, 8) * w, axis=-1)
    by = by ^ st.prn[None, :]

    # 2-bit symbols, USB first; STEP mapping 0,3,1,2 by bit arithmetic
    sh4 = (6 - 2 * jnp.arange(4, dtype=jnp.int32))[None, None, :]
    pairs = (jnp.right_shift(by[:, :, None], sh4) & 3).reshape(-1)
    b0 = pairs & 1
    b1 = pairs >> 1
    steps = 3 * b0 + b1 - 2 * b0 * b1
    dsym = (dsym_in + jnp.cumsum(steps)) & 3
    sym = dsym ^ (dsym >> 1)                # SYMS gray mapping

    sig_i = jnp.where(sym & 1, 1.0, -1.0).astype(jnp.float32)
    sig_q = jnp.where(sym & 2, 1.0, -1.0).astype(jnp.float32)

    dsym_out = jax.lax.dynamic_index_in_dim(
        dsym, jnp.maximum(nkeep_syms - 1, 0), keepdims=False)
    dsym_out = jnp.where(nkeep_syms > 0, dsym_out, dsym_in)

    zeros = jnp.zeros(st.L, jnp.float32)
    signs_i = jax.lax.dynamic_update_slice(zeros, sig_i, (base_off,))
    signs_q = jax.lax.dynamic_update_slice(zeros, sig_q, (base_off,))
    return signs_i, signs_q, dsym_out
