"""Rational polyphase int16 resampler (src/fir.c:263-428).

Bit-exact re-derivation of the reference's `fir_int16_resampler_init` +
`fir_int16_process` streaming semantics, restated in closed form so a
whole block resamples as one batched device op:

  output m (0-based, stream-absolute) reads the A most recent inputs
  after i(m) = floor(m*M / L) + 1 inputs have been consumed, with the
  polyphase bank row d(m) = (m*M) mod L:

      y[m] = clamp( ( sum_y  x[i(m) - A + y] * T[d(m), y] ) >> 15 )

  (x[<0] = 0: the reference starts with a zeroed window).  Both i(m)
  and d(m) are periodic in m with period L/gcd(L, M), so a block's
  outputs decompose into per-class strided windows over the input — the
  same dynamic-slice scheme the NICAM/FM device assembly uses.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from . import firdes


@dataclass
class Resampler:
    L: int                 # interpolation
    M: int                 # decimation
    A: int                 # ataps (window length)
    T: np.ndarray          # [L, A] int16 polyphase bank

    @classmethod
    def create(cls, out_rate, in_rate) -> "Resampler":
        """out_rate/in_rate as (num, den) tuples or ints
        (src/fir.c:392-428)."""
        on, od = out_rate if isinstance(out_rate, tuple) else (int(out_rate), 1)
        inn, ind = in_rate if isinstance(in_rate, tuple) else (int(in_rate), 1)
        num, den = on * ind, inn * od
        g = math.gcd(num, den)
        L, M = num // g, den // g

        ntaps = (21 * L) | 1
        if L > M:
            taps = firdes.low_pass(ntaps, L, 0.45, 0.1, L)
        else:
            taps = firdes.low_pass(ntaps, L, 0.45 * L / M, 0.1 * L / M, L)
        return cls(L=L, M=M, A=-(-ntaps // L),
                   T=_polyphase_bank(taps, ntaps, L))

    def output_size(self, samples: int) -> int:
        """Max outputs from `samples` inputs (src/fir.c:381-386)."""
        return (samples * self.L + self.M - 1) // self.M

    def n_outputs_exact(self, n_in: int) -> int:
        """Outputs produced by the stream after exactly n_in inputs have
        been consumed from the start: #{m : i(m) <= n_in} =
        ceil((n_in*L - ... )/M); derived from i(m) = floor(mM/L)+1."""
        if n_in <= 0:
            return 0
        return (n_in * self.L - 1) // self.M + 1

    # -- numpy streaming reference (exact) ------------------------------
    def resample_block(self, x: np.ndarray, m0: int = 0,
                       n_out: int | None = None) -> np.ndarray:
        """Outputs [m0, m0+n_out) of the stream whose inputs are x
        (x[0] = stream input 0; callers pass enough leading context:
        window A reaches back to input i(m0) - A)."""
        if n_out is None:
            n_out = self.n_outputs_exact(len(x)) - self.n_outputs_exact(
                0 if m0 == 0 else 0)
            n_out -= m0
        m = m0 + np.arange(n_out, dtype=np.int64)
        i = (m * self.M) // self.L + 1
        d = (m * self.M) % self.L
        idx = i[:, None] - self.A + np.arange(self.A)[None, :]
        xx = np.concatenate([np.zeros(self.A, np.int64),
                             np.asarray(x, np.int64)])
        win = xx[np.clip(idx + self.A, 0, len(xx) - 1)]
        win[idx + self.A >= len(xx)] = 0
        acc = np.sum(win * self.T[d].astype(np.int64), axis=1)
        return np.clip(acc >> 15, -32768, 32767).astype(np.int16)


class StreamResampler:
    """Stateful host-side streaming wrapper with the reference's
    fir_int16 feed/process semantics (src/fir.c:298-352): feed chunks
    of int16 inputs, receive every output whose window is complete.
    Used for the sink audio side-channels (32 kHz -> rate/64 HackDAC,
    S/PDIF bitstream -> DAC rate; src/rf_hackrf.c:456-472,
    src/rf_fl2k.c:192-248)."""

    def __init__(self, rs: Resampler):
        self.rs = rs
        self._hist = np.zeros(rs.A, np.int64)   # last A inputs fed
        self.n_in = 0
        self.m = 0

    def process(self, x: np.ndarray) -> np.ndarray:
        rs = self.rs
        x = np.asarray(x, np.int64).reshape(-1)
        n1 = self.n_in + len(x)
        m1 = rs.n_outputs_exact(n1)
        n_out = m1 - self.m
        if n_out <= 0:
            self._hist = np.concatenate([self._hist, x])[-rs.A:]
            self.n_in = n1
            return np.zeros(0, np.int16)
        m = self.m + np.arange(n_out, dtype=np.int64)
        i = (m * rs.M) // rs.L + 1
        d = (m * rs.M) % rs.L
        # window inputs [i-A, i); buffer = hist (inputs n_in-A .. n_in)
        # + new chunk
        buf = np.concatenate([self._hist, x])
        base = self.n_in - rs.A                  # abs index of buf[0]
        idx = i[:, None] - rs.A + np.arange(rs.A)[None, :] - base
        win = buf[np.clip(idx, 0, len(buf) - 1)]
        win[idx < 0] = 0                         # pre-stream zeros
        acc = np.sum(win * rs.T[d].astype(np.int64), axis=1)
        self._hist = buf[-rs.A:]
        self.n_in = n1
        self.m = m1
        return np.clip(acc >> 15, -32768, 32767).astype(np.int16)


def _polyphase_bank(taps: np.ndarray, ntaps: int, L: int) -> np.ndarray:
    """Tap placement of fir_int16_init (src/fir.c:276-287): itaps laid
    out as [L, A] rows applied window-oldest-first."""
    A = -(-ntaps // L)
    flat = np.zeros(L * A, dtype=np.int64)
    j = L * A - A
    for i in range(ntaps - 1, -1, -1):
        flat[j] = int(np.round(taps[i] * 32767.0))
        j -= A
        if j < 0:
            j += L * A + 1
    return flat.reshape(L, A)


@dataclass
class BlockResampleStatics:
    """Per-encoder constants for the in-step block resample: with the
    block geometry aligned (W_out * M == W_px * L and L | block outputs)
    the per-class window offsets and polyphase rows are identical for
    every block, so the whole resample is a static slice + windows +
    per-class int32 matvec."""
    rs: Resampler
    x_lo: int            # static slice start into the pixel-domain flat
    x_len: int
    n_out: int
    stride: int
    G: int
    offq: np.ndarray     # [P] python-int window offsets
    offr: np.ndarray
    Td: np.ndarray       # [P, A] int32


def make_block_statics(rs: Resampler, w_px: int, w_out: int,
                       nlines: int, halo_lines: int = 1
                       ) -> BlockResampleStatics:
    """Resample statics for blocks of `nlines` lines with one leading
    and `halo_lines` trailing halo lines in both domains.  The flat
    pixel-domain input is assumed to start at line k0-1."""
    L, M, A = rs.L, rs.M, rs.A
    if w_out * M != w_px * L:
        raise ValueError(
            f"pixel/sample widths {w_px}/{w_out} are not in the exact "
            f"rational ratio {M}/{L}; block resampling needs aligned "
            "line widths")
    n_out = (nlines + 1 + halo_lines) * w_out     # incl. halo lines
    if (nlines * w_out) % L:
        raise ValueError("block output size must be a multiple of the "
                         "interpolation factor for stable phase")
    P = L // math.gcd(L, M)
    stride = P * M // L
    G = -(-n_out // P)

    # The reference's vresampler line window delays its output by one
    # line, and vid_next_line swallows that warm-up line
    # (src/video.c:4941-4947): stream output sample g corresponds to
    # polyphase output m = g + w_out.  Block b's leading halo line
    # (stream line k0-1) therefore starts at m = k0 * w_out; with
    # x[0] = pixel input (k0-1)*w_px and the alignment conditions the
    # per-class offsets below are identical for every block (computed
    # here for b = 0).
    m = np.arange(P, dtype=np.int64)
    iP = (m * M) // L + 1
    dP = (m * M) % L
    base = 1 - A
    start0 = iP - A - base
    assert start0.min() >= 0
    x_lo = int(base - (-w_px))      # index into flat starting at -w_px
    rows = -(-(int(start0.max()) + (G - 1) * stride + A) // stride) + 1
    x_len = rows * stride
    return BlockResampleStatics(
        rs=rs, x_lo=x_lo, x_len=x_len, n_out=n_out, stride=stride, G=G,
        offq=(start0 // stride).astype(np.int64),
        offr=(start0 % stride).astype(np.int64),
        Td=rs.T[dP].astype(np.int32))


def device_resample_block(st: BlockResampleStatics, flat):
    """flat: f32 pixel-domain stream starting at line k0-1 (integer
    valued).  Returns int32-valued f32 [st.n_out] starting at output
    line k0-1."""
    import jax
    import jax.numpy as jnp

    x = jnp.clip(jnp.round(flat), -32768, 32767).astype(jnp.int32)
    x = x[st.x_lo: st.x_lo + st.x_len]
    pad = st.x_len - x.shape[0]
    if pad > 0:
        x = jnp.concatenate([x, jnp.zeros(pad, jnp.int32)])
    A = st.rs.A
    if A <= st.stride:
        s2 = x.reshape(-1, st.stride)
        X = jnp.concatenate([s2[:-1], s2[1:, :A]], axis=1)
        wins = jnp.stack([
            jax.lax.dynamic_slice(X, (int(st.offq[c]), int(st.offr[c])),
                                  (st.G, A))
            for c in range(len(st.offq))])           # [P, G, A]
        acc = jax.lax.dot_general(
            wins, jnp.asarray(st.Td)[:, :, None],
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)[..., 0]
    else:
        # windows overlap across rows (decimating resample with a small
        # interpolation factor, e.g. L/M = 1/2): per-tap strided
        # slice-accumulate instead of the row-window matmul
        x = jnp.concatenate([x, jnp.zeros(st.stride + A, jnp.int32)])
        cols = []
        for c in range(len(st.offq)):
            b0 = int(st.offq[c]) * st.stride + int(st.offr[c])
            acc_c = jnp.zeros((st.G,), jnp.int32)
            for a in range(A):
                seg = jax.lax.dynamic_slice(x, (b0 + a,),
                                            (st.G * st.stride,))
                acc_c = acc_c + (seg.reshape(st.G, st.stride)[:, 0]
                                 * jnp.int32(int(st.Td[c, a])))
            cols.append(acc_c)
        acc = jnp.stack(cols)                        # [P, G]
    y = jnp.swapaxes(acc, 0, 1).reshape(-1)[:st.n_out]
    y = jnp.clip(y >> 15, -32768, 32767)
    return y.astype(jnp.float32)
