"""Look-ahead soft limiter, vectorised and bit-exact.

Re-derivation of the reference limiter (src/fir.c:748-871) as a batch
algorithm at the 32 kHz audio rate:

  - "variable" path filtered by the pre-emphasis FIR, "fixed" path by the
    flat FIR then hard-limited; var = v - f
  - the circular att/var/fix buffers implement a 20-sample output delay
    with detection at the window centre; in batch form the attack envelope
    is a max-dilation of per-sample attack impulses with the raised-cosine
    shape, centred on the over-level sample
  - all integer roundings ( >>15 arithmetic shifts, C truncating division)
    are reproduced exactly

The cost is O(N * width) numpy work at 32 kHz — negligible next to the
sample-rate synthesis on the device.
"""

from __future__ import annotations

import numpy as np

INT16_MAX = 32767


def _fir_int32(x: np.ndarray, taps: np.ndarray) -> np.ndarray:
    """Causal int32 FIR with Q15 taps: out[n] = (sum taps[k]*x[n-k]) >> 15
    (src/fir.c:623-694).  x int array, zero history."""
    q = np.round(taps * 32767.0)
    # exact in f64: |acc| <= sum|q| * max|x| << 2^53, and acc/2^15 is an
    # exact f64 (power-of-two divide), so floor() == the >>15 arithmetic
    # shift of the integer accumulator.  |out| <= sum|q|*32767 >> 15 <
    # 2^22 for the unity-gain J.17/flat tap sets, so the reference's
    # int32 clamp can never engage.
    acc = np.convolve(x.astype(np.float64), q)[:len(x)]
    return np.floor(acc * (1.0 / 32768.0)).astype(np.int64)


class Limiter:
    """Stateless-over-history limiter: call with the full audio history
    window; outputs align 1:1 with inputs (the reference's 20-sample
    internal delay is reproduced)."""

    def __init__(self, level: int = INT16_MAX, width: int = 21,
                 vtaps: np.ndarray | None = None,
                 ftaps: np.ndarray | None = None):
        self.level = level
        self.width = width | 1
        w = self.width
        self.vtaps = vtaps
        self.ftaps = ftaps
        i = np.arange(w)
        self.shape = np.round(
            (1.0 - np.cos(2.0 * np.pi / (w + 1) * (i + 1))) * 0.5 * INT16_MAX
        ).astype(np.int64)

    def process(self, x: np.ndarray) -> np.ndarray:
        """x: int16-valued array (the limiter is fed vin == fin by the
        reference, src/video.c:3320-3322).  Returns int16-valued int64."""
        x = np.asarray(x, dtype=np.int64)
        n = len(x)
        w = self.width
        half = w // 2
        lvl = self.level

        v = _fir_int32(x, self.vtaps) if self.vtaps is not None else x.copy()
        f = _fir_int32(x, self.ftaps) if self.ftaps is not None else x.copy()
        f = np.clip(f, -lvl, lvl)
        var = v - f

        # Attack impulse per over-level sample (detection at window centre)
        a = np.abs(v)
        over = a > lvl

        # Envelope: att[t] = max_d att_imp[d] * shape[t - d + half] >> 15,
        # a max-dilation — w shifted whole-array maxima (np.maximum.at
        # over the per-impulse index lists is quadratic when a loud
        # source keeps every sample over level).  Skipped entirely when
        # nothing is over level (the common case for in-range sources):
        # att == 0 everywhere and the dilation is w wasted passes.
        if not over.any():
            out = f + ((var * np.int64(INT16_MAX)) >> 15)
        else:
            absvar = np.abs(var)
            # guarded: where over, |var| > 0 (v > lvl while f clipped
            # to lvl)
            denom = np.where(absvar == 0, 1, absvar)
            att_imp = np.where(
                over,
                INT16_MAX - (lvl + absvar - a) * INT16_MAX // denom,
                0,
            )
            att2 = np.zeros(n + w, dtype=np.int64)
            for j in range(w):
                contrib = (att_imp * self.shape[j]) >> 15
                np.maximum(att2[j:j + n], contrib, out=att2[j:j + n])
            att = att2[half:half + n]
            out = f + ((var * (INT16_MAX - att)) >> 15)
        out = np.clip(out, -lvl, lvl)

        # 20-sample (width-1) output delay with zero fill, matching the
        # reference's circular-buffer latency
        d = w - 1
        return np.concatenate([np.zeros(d, dtype=np.int64), out[:n - d]])
