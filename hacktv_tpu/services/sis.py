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
        self.frame_bit = nicam.NICAM_FRAME_BITS  # forces encode on first use
        self.frame = np.zeros(nicam.NICAM_FRAME_BYTES, dtype=np.uint8)
        self.fnum = 0
        self.hist = np.zeros((nicam.J17_NTAPS - 1, 2), dtype=np.int64)
        self.cur_buf = -1          # last consumed audio buffer index
        self._bits: dict[int, np.ndarray] = {}
        self._next_j = 0

        # First iteration state matches the reference exactly: frame
        # bytes start zeroed and frame_bit = 0, so symbols come from the
        # zero frame until 728 bits have been consumed.
        self.frame_bit = 0

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

    def _encode_next_frame(self, k: int):
        m = self._visible_buffer(k)
        if m <= 0:
            buf = np.zeros((32, 2), dtype=np.int64)
        else:
            buf = self.chain._pcm(32 * (m - 1), 32)
        pcm = np.concatenate([self.hist, buf])
        self.frame = nicam.encode_frames(pcm, self.fnum,
                                         nicam.MODE_STEREO, reserve=0)[0]
        self.hist = pcm[-(nicam.J17_NTAPS - 1):]
        self.fnum += 1
        self.frame_bit = 0

    def _iterate(self, j: int):
        """One sis_render call; j=0 is warm-up, j>=1 is stream line j-1."""
        k = j - 1
        nb = 50
        self.re += 44
        if self.re >= 125:
            nb -= 4
            self.re -= 125
        vbi = np.zeros(7, dtype=np.uint8)
        vbi[0] = 0xC0
        for x in range(2, nb, 2):
            if self.frame_bit >= nicam.NICAM_FRAME_BITS:
                self._encode_next_frame(max(k, 0))
            fb = self.frame_bit
            sym = (int(self.frame[fb >> 3]) >> (6 - (fb & 7))) & 3
            sym = _GC[1 if x & 4 else 0][sym]
            vbi[x >> 3] |= sym << (6 - (x & 7))
            self.frame_bit += 2
        # expand into the 50-entry basis-bit vector (MSB first, the burst
        # right-aligned by the render offset 50-nb, src/sis.c:211)
        bits = np.zeros(50, dtype=np.float32)
        bvec = np.unpackbits(vbi)[:nb]
        bits[50 - nb:50] = bvec
        if k >= 0:
            self._bits[k] = bits
            if len(self._bits) > 2600:
                for old in [x for x in self._bits if x < k - 1300]:
                    del self._bits[old]
        self._next_j = j + 1

    def bits_for_line(self, k: int) -> np.ndarray:
        while self._next_j <= k + 1:
            self._iterate(self._next_j)
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
