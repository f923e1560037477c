"""SiS (Sound-in-Syncs, "dcsis") encoder (src/sis.c).

NICAM-728 frame bits are sent as 4-level "quits" inside the horizontal
sync of every line: the sync floor is blanked with a raised-cosine window
and 23-25 two-bit symbols are added as paired large/small cosine pulses.
The per-line burst length alternates 48/44 bits (rate adaptation
accumulator, src/sis.c:173-178), and a new NICAM frame is encoded from
the most recent 32-pair audio buffer whenever the bit counter wraps.

Host side simulates the per-line bit stream (tiny); the device blends the
blank window and adds the quit pulses as a basis matmul.
"""

from __future__ import annotations

import numpy as np

from . import vbidata

from ..audio import nicam
from ..ops.shapes import rc_window

# grey-code tables (src/sis.c:167)
_GC = ((3, 0, 2, 1), (0, 3, 1, 2))
_GC_ARR = np.array(_GC, dtype=np.uint8)


def _cos_bell(x: np.ndarray) -> np.ndarray:
    """(1+cos(pi x))/2 inside |x|<1 (src/sis.c:26-30)."""
    return np.where(np.abs(x) < 1.0, (1.0 + np.cos(np.pi * x)) / 2, 0.0)


class _SiSState:
    """Sequential per-line burst generator.  Iteration 0 is the pipeline
    warm-up line the reference's sis process sees before stream line 0
    (its window trails the raster by one slot, src/video.c:4675-4688)."""

    def __init__(self, chain, audio_lag_lines: int, width: int):
        self.chain = chain
        self.lag = audio_lag_lines
        self.W = width
        self.re = 0
        self.fnum = 0
        self.hist = np.zeros((nicam.J17_NTAPS - 1, 2), dtype=np.int64)
        self.cur_buf = -1          # last consumed audio buffer index
        self._bits: dict[int, np.ndarray] = {}
        self._next_j = 0

        # First iteration state matches the reference exactly: the
        # symbol queue starts with one zeroed frame (the reference's
        # zeroed frame bytes with frame_bit = 0).
        self._symq = np.zeros(nicam.NICAM_FRAME_BITS // 2, dtype=np.uint8)
        self._symq_pos = 0
        self._sim = (0, 0, 0)      # (line J, re, cumulative bits)
        self._sim_e = 0            # encode events simulated so far

    def _visible_buffer(self, k: int) -> int:
        """Index (1-based) of the latest 32-pair buffer delivered before
        the sis process runs on stream line k: the audio process trails by
        `lag` lines, so events in lines <= k-lag-1 are visible."""
        limit = (k - self.lag) * self.W
        if limit <= 0:
            return 0
        # hold_start(32m-1) < limit  =>  ceil(S*32m/A)-1 < limit
        A, S = self.chain.A, self.chain.S
        m = (A * limit + S - 1) // (32 * S)
        while self.chain.hold_start(32 * m - 1) < limit:
            m += 1
        while m > 0 and self.chain.hold_start(32 * m - 1) >= limit:
            m -= 1
        return m

    def _trigger_lines(self, count: int) -> list:
        """Iterate indices j at which the next `count` frame encodes
        fire: replays the 48/44-bit line schedule from stream start, so
        encode event e fires in the line consuming absolute bit
        728*(e+1) (frame 0 is the initial zero frame)."""
        out = []
        J, re, cum = self._sim
        target = nicam.NICAM_FRAME_BITS * (self._sim_e + 1)
        while len(out) < count:
            re += 44
            nb = 50
            if re >= 125:
                nb, re = 46, re - 125
            cum += nb - 2
            if cum > target:
                out.append(J)
                self._sim_e += 1
                target += nicam.NICAM_FRAME_BITS
            J += 1
        self._sim = (J, re, cum)
        return out

    def _refill_syms(self):
        """Batch-encode the next 16 NICAM frames into the symbol queue:
        the J.17 stream over the concatenated consumption-order buffers
        is exactly the sequential per-frame encode with carried
        history."""
        ks = self._trigger_lines(16)
        bufs = []
        for J in ks:
            m = self._visible_buffer(max(J - 1, 0))
            bufs.append(np.zeros((32, 2), dtype=np.int64) if m <= 0
                        else self.chain._pcm(32 * (m - 1), 32))
        pcm = np.concatenate([self.hist] + bufs)
        frames = np.asarray(nicam.encode_frames(
            pcm, self.fnum, nicam.MODE_STEREO, reserve=0), dtype=np.uint8)
        self.hist = pcm[-(nicam.J17_NTAPS - 1):]
        self.fnum += len(ks)
        syms = ((frames[:, :, None] >> np.array([6, 4, 2, 0])) & 3
                ).astype(np.uint8).reshape(-1)
        self._symq = np.concatenate([self._symq[self._symq_pos:], syms])
        self._symq_pos = 0

    def _take_syms(self, count: int) -> np.ndarray:
        while len(self._symq) - self._symq_pos < count:
            self._refill_syms()
        s = self._symq[self._symq_pos:self._symq_pos + count]
        self._symq_pos += count
        return s

    def _fill_through(self, j_hi: int):
        """Vectorised run of iterations self._next_j .. j_hi: the 48/44
        line schedule is re_i = (re0 + 44 i) mod 125 (shortened line iff
        the previous residue is >= 81), symbols come off the queue in
        order, and all rows scatter in one pass."""
        j0 = self._next_j
        n = j_hi - j0 + 1
        if n <= 0:
            return
        i = np.arange(n, dtype=np.int64)
        rprev = (self.re + 44 * i) % 125
        nb = np.where(rprev >= 81, 46, 50)
        self.re = int((self.re + 44 * n) % 125)
        counts = (nb - 2) // 2
        syms = self._take_syms(int(counts.sum()))
        starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
        T = len(syms)
        line_id = np.repeat(i, counts)
        pos = np.arange(T, dtype=np.int64) - np.repeat(starts, counts)
        syms = _GC_ARR[((2 + 2 * pos) & 4) >> 2, syms]
        B = np.zeros((n, 50), dtype=np.float32)
        off = 50 - nb
        B[i, off] = 1.0                          # 0xC0 run-in
        B[i, off + 1] = 1.0
        col = off[line_id] + 2 + 2 * pos
        B[line_id, col] = syms >> 1
        B[line_id, col + 1] = syms & 1
        for t in range(n):
            k = j0 + t - 1
            if k >= 0:
                self._bits[k] = B[t]
        # prune behind the fill *start*: everything at or past j0 - 1
        # may still be read by the caller's gather loop
        for old in [x for x in self._bits if x < j0 - 1301]:
            del self._bits[old]
        self._next_j = j_hi + 1

    def bits_for_line(self, k: int) -> np.ndarray:
        if self._next_j <= k + 1:
            self._fill_through(k + 1)
        return self._bits[k]


class SiS:
    """Batched SiS line process."""

    lookahead = 1

    def __init__(self, params, mode: str, chain, audio_lag_lines: int):
        if mode != "dcsis":
            raise ValueError(f"sis: unrecognised mode {mode!r}")
        p = params
        if p.conf.lines != 625:
            raise ValueError("sis: requires a 625-line mode")
        self.p = p
        self.state = _SiSState(chain, audio_lag_lines, p.width)

        # Quit pulse basis: 25 symbol positions x 2 levels (src/sis.c:32-75)
        level = int(p.white_level - p.black_level)
        levels = (int((level // 2) / 0.75), int((level // 4) / 0.75))
        bw = p.width / 382.0
        offset = bw * 3.32
        basis = np.zeros((50, p.width), dtype=np.float32)
        x = np.arange(p.width, dtype=np.float64)
        for e in range(50):
            t = -bw * (e // 2) - offset
            basis[e] = np.round(_cos_bell((t + x) / bw) * levels[e & 1])
        self.basis = basis

        # Blank window (src/sis.c:125-146)
        left, rise, width_s = 0.2e-6, 80e-9, 4.56e-6
        pr = p.pixel_rate
        self.blank_left = int(np.floor(pr * (left - rise / 2)))
        self.blank_width = int(np.ceil(pr * (width_s + rise)))
        i = np.arange(self.blank_left, self.blank_left + self.blank_width)
        self.blank_win = np.round(
            rc_window(i / pr, left, width_s, rise) * 32767.0
        ).astype(np.float32)
        self.blank_level = float(p.sync_level)

    def block_arrays(self, k0: int, nlines: int, claimed=None) -> dict:
        bits = np.zeros((nlines, 50), dtype=np.float32)
        self.state.bits_for_line(k0 + nlines - 1)   # one batched fill
        for i in range(nlines):
            k = k0 + i
            if k < 0:
                continue
            bits[i] = self.state.bits_for_line(k)
        return {"bits": bits}

    def apply(self, out, arrays, lut=None):
        import jax.numpy as jnp
        L, N = self.blank_left, self.blank_width
        win = jnp.asarray(self.blank_win)[None, :]
        region = out[:, L:L + N]
        # (v*(32767-win) + blank*win) >> 15, rearranged to keep the f32
        # products small (src/sis.c:203-208)
        blended = region + jnp.floor(
            (win * (self.blank_level - region) - region) * (1.0 / 32768.0))
        out = out.at[:, L:L + N].set(blended)
        return out + vbidata.render(arrays["bits"], self.basis)
