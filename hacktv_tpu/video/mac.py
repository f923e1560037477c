"""D/D2-MAC encoder: host bit-domain mux + batched TPU waveform synthesis.

Architecture (vs the reference's per-line mac_next_line, src/mac.c:1622-1873):
the serial bit domain — packet multiplex, frame sync, PRBS whitening,
audio coding (SURVEY.md §2.6) — runs on the host as a sequential state
machine (`MacMux`) that emits per-line duobinary *symbol* vectors and
scrambling cut points; the waveform is then synthesised on device as a
batch of whole frames: duobinary pulse shaping becomes three basis
matmuls on the MXU (own line + spill into the previous/next line),
luma/chroma time multiplex becomes masked row gathers, and the
single/double-cut rotations become per-line modular gathers.
"""

from __future__ import annotations

import math
from fractions import Fraction

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.mac_audio import MacAudioEnc
from ..config.standards import MacMode, Modulation, OutputType, VidConfig, \
    get_mode
from ..ops import mac_bits as mb
from ..ops.shapes import rrc

INT16_MAX = 32767
MAC_CLOCK_RATE = 20_250_000
AUDIO_RATE = 32_000
NICAM_AUDIO_LEN = 32   # NICAM_AUDIO_RATE/1000 (src/nicam728.h:37)
MAC_QUEUE_LEN = 12

HIGHEST = jax.lax.Precision.HIGHEST


def _lround(x):
    x = np.asarray(x, dtype=np.float64)
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)
                    ).astype(np.int64)


# ----------------------------------------------------------------------
# Duobinary basis (src/mac.c:153-191, 205-253)

def duobinary_bases(mode_d: bool, width: int, level: float):
    """Per-bit pulse-shape rows split by destination line.

    Returns (Bm, B0, Bp) float32 [nbits, width]: contribution of line
    j's symbols to lines j-1, j, j+1 (the reference renders across a
    3-line window, negative tap offsets landing at the end of the
    previous line, src/mac.c:227-232).
    """
    bits = 1296 if mode_d else 648
    sps = width / bits
    offset = width / 1296 * (-1 if mode_d else -3)
    ntaps = int(sps * 16) | 1
    htaps = ntaps // 2

    Bm = np.zeros((bits, width), dtype=np.float64)
    B0 = np.zeros((bits, width), dtype=np.float64)
    Bp = np.zeros((bits, width), dtype=np.float64)
    xs = np.arange(ntaps)
    for i in range(bits):
        pos0 = int(_lround(offset + sps * i))
        err = offset + sps * i - pos0
        start = pos0 - htaps
        vals = _lround(rrc((xs - htaps - err) / sps, 0, 1) * level)
        p = start + xs
        prev = p < 0
        cur = (p >= 0) & (p < width)
        nxt = p >= width
        Bm[i, p[prev] + width] = vals[prev]
        B0[i, p[cur]] = vals[cur]
        Bp[i, p[nxt] - width] = vals[nxt]
    return (np.asarray(Bm, dtype=np.float32),
            np.asarray(B0, dtype=np.float32),
            np.asarray(Bp, dtype=np.float32))


# ----------------------------------------------------------------------
# Host YUV conversion with the MAC chroma clamp (src/video.c:3920-3958)

def mac_yuv_host(conf: VidConfig, rgb: np.ndarray, level: float):
    gamma = conf.gamma if conf.gamma > 0 else 1.0
    rw = conf.rw_co if conf.rw_co > 0 else 0.299
    gw = conf.gw_co if conf.gw_co > 0 else 0.587
    bw = conf.bw_co if conf.bw_co > 0 else 0.114
    f = rgb.astype(np.float64) / 255.0
    if gamma != 1.0:
        f = np.power(f, 1.0 / gamma)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = r * rw + g * gw + b * bw
    u = (b - y) * conf.eu_co
    v = (r - y) * conf.ev_co
    d = np.maximum(np.abs(u), np.abs(v))
    scale = np.where(d > 0.5, 0.5 / np.maximum(d, 1e-12), 1.0)
    u *= scale
    v *= scale
    wb = conf.white_level - conf.black_level
    y = (conf.black_level + y * wb) * level
    u *= wb * level
    v *= wb * level
    q = lambda a: _lround(np.clip(a, -1, 1) * INT16_MAX)
    return q(y), q(u), q(v)


# ----------------------------------------------------------------------
# The sequential bit-domain multiplex

class MacMux:
    """Replays the reference's per-line packet multiplex deterministically
    (golden build: audio lineprocess synchronous, trailing the raster by
    2 lines — see tools/make_golden.sh).

    `ensure(k)` advances through stream line k; `line_bits[k]` /
    `line_sym[k]` / `scramble[k]` are then available for all lines ≤ k-1
    (a line's scramble is decided one iteration later).
    """

    def __init__(self, conf: VidConfig, width: int, sample_rate: int,
                 source, vsam: int, scramble_audio: bool = False,
                 timestamp: int = 1_200_000_000, aspect_43: int = 1,
                 eurocrypt=None, volume: float = 1.0, teletext=None):
        self.conf = conf
        self.mode_d = conf.mac_mode == MacMode.D
        self.nbits = 1296 if self.mode_d else 648
        self.W = width
        self.S = sample_rate
        self.source = source
        self.vsam = vsam
        self.volume_int = int(volume * 256 + 0.5)

        self.prbs15 = mb.prbs15()
        self.teletext = teletext    # optional MacTeletext feed
        self.seeds = mb.line_prbs_seeds(self.mode_d)
        self.udt = mb.build_udt(timestamp)
        self.l625 = mb.Line625State(self.mode_d)
        self.aspect_43 = aspect_43
        self.ratio = 0 if aspect_43 else 1

        self.cw = mb.PRBS_CW_FA
        self.prbs1 = mb.CaPrbs1()
        self.prbs2 = mb.CaPrbs2()
        self.eurocrypt = eurocrypt  # optional Eurocrypt instance

        # packet queues: per subframe list of (addr, cont, payload, scr)
        self.queues = [[], []]
        self.dummy_continuity = [0, 0]
        # per-subframe encoded packet bit stream: appended on demand by
        # the queue simulation, consumed sequentially (pos/len); the
        # per-line bit assembly is deferred and batched (_materialize)
        self._stream = [[], []]
        self._slen = [0, 0]       # appended bits
        self._spos = [0, 0]       # consumed bits
        self._sbase = [0, 0]      # absolute offset of _stream[c][0]
        self._pb = 0           # batch base line (set per ensure window)
        self._pn = 0           # rows pending materialisation
        self._ppos = np.zeros((0, 2), dtype=np.int64)
        self._plen = np.zeros((0, 2), dtype=np.int64)
        self._pfull_rows: dict[int, np.ndarray] = {}
        self._ptt_rows: dict[int, tuple] = {}
        self._dummy_cache: dict[tuple, np.ndarray] = {}
        nsub = 2 if self.mode_d else 1
        self._wh_all = np.stack([
            self.prbs15.seq(int(self.seeds[l]), 99 * nsub)
            for l in range(mb.MAC_LINES)])
        self._hs = np.stack([
            mb.rbits_msb((~mb.MAC_LSW) & 0x3F, 6),
            mb.rbits_msb(mb.MAC_LSW, 6)]).astype(np.uint8)

        self.audio = MacAudioEnc(
            high_quality=conf.mac_audio_quality,
            stereo=conf.mac_audio_stereo,
            protection=conf.mac_audio_protection,
            linear=not conf.mac_audio_companded,
            scramble=scramble_audio,
            conditional=eurocrypt is not None)
        if self.mode_d:
            # BSB receivers expect audio at address 128 (src/mac.c:930-935)
            self.audio.address = 128
        self.audio_pairs = 0   # pairs consumed so far
        self._audio_pkts: dict[int, list] = {}
        self._audio_m = 0      # chunks batch-encoded so far
        self.nicam_buf_pairs = 0
        self.audio_lag = 1     # lines the audio process trails macraster

        self.polarity = -1
        self.k = 0             # next iteration (stream line index)
        self.pol_start: dict[int, int] = {}
        self.line_bits: dict[int, np.ndarray] = {}
        # per line: (apply, xc_colour_or_single, xc_luma)
        self.scramble: dict[int, tuple] = {}

    # -- packet queue ---------------------------------------------------
    def _write_packet(self, subframe, address, continuity, payload, scr):
        q = self.queues[subframe]
        if len(q) == MAC_QUEUE_LEN:
            return False
        q.append((address, continuity, payload, scr))
        return True

    def _read_packet(self, subframe):
        q = self.queues[subframe]
        if not q:
            addr = 0x3FF
            cont = self.dummy_continuity[subframe]
            self.dummy_continuity[subframe] += 1
            return (addr, cont, None, False)
        return q.pop(0)

    # -- audio timeline ---------------------------------------------------
    def _audio_pairs_through_line(self, j: int) -> int:
        """Pairs consumed once audio-line j is processed
        (src/video.c:3273-3277 accumulator)."""
        if j < 0:
            return 0
        return (j + 1) * self.W * AUDIO_RATE // self.S

    def _pcm(self, start: int, count: int) -> np.ndarray:
        raw = self.source.read_audio(start, count)
        v = (raw.astype(np.int64) * self.volume_int + 128) >> 8
        return np.clip(v, -32768, 32767)

    def _audio_line(self, j: int):
        """Audio lineprocess for stream line j: push packets on each
        completed 728-pair block (src/video.c:3352-3377)."""
        c0 = self._audio_pairs_through_line(j - 1)
        c1 = self._audio_pairs_through_line(j)
        first_chunk = c0 // NICAM_AUDIO_LEN
        last_chunk = c1 // NICAM_AUDIO_LEN
        for m in range(first_chunk, last_chunk):
            pkts = self._audio_pkts.pop(m, None)
            if pkts is None:
                pkts = self.audio.write_audio(
                    self._pcm(m * NICAM_AUDIO_LEN, NICAM_AUDIO_LEN))
            for addr, cont, payload, scr in pkts:
                self._write_packet(0, addr, cont, payload, scr)

    def _prefetch_audio(self, k_through: int):
        """Batch-encode every 728-pair chunk whose packets will be
        pushed while iterating through stream line k_through; exact
        (write_audio_batch replays the per-chunk schedule) and much
        cheaper than per-chunk calls."""
        j_hi = k_through - self.audio_lag
        if j_hi < 0:
            return
        m_hi = self._audio_pairs_through_line(j_hi) // NICAM_AUDIO_LEN
        m0 = self._audio_m
        if m_hi <= m0:
            return
        pcm = self._pcm(m0 * NICAM_AUDIO_LEN,
                        (m_hi - m0) * NICAM_AUDIO_LEN)
        chunks = [pcm[i * NICAM_AUDIO_LEN:(i + 1) * NICAM_AUDIO_LEN]
                  for i in range(m_hi - m0)]
        for m, o in zip(range(m0, m_hi),
                        self.audio.write_audio_batch(chunks)):
            self._audio_pkts[m] = o
        self._audio_m = m_hi

    # -- line content -----------------------------------------------------
    def _sim_data_line(self, row: int, line: int):
        """Queue simulation for a regular line (src/mac.c:1375-1439):
        packets are pulled/encoded into the per-subframe bit stream on
        demand; only the consumed (pos, len) range per subframe is
        recorded (into the batch arrays at index `row`) — the per-line
        bit assembly happens batched in _materialize."""
        sr5 = 0
        for c in range(2 if self.mode_d else 1):
            pos = self._spos[c]
            i = 0
            while i < 99:
                if self._spos[c] == self._slen[c]:
                    if line == 623:
                        break
                    addr, cont, payload, scr = self._read_packet(c)
                    if c == 0:
                        sr5 = self.prbs1.update()
                    if payload is None:
                        # dummy packets: only (addr, continuity) vary —
                        # 4 distinct bit patterns, cache them
                        key = (addr, cont & 3)
                        arr = self._dummy_cache.get(key)
                        if arr is None:
                            arr = mb.encode_packet_fast(
                                addr, cont, None, False, 0)
                            self._dummy_cache[key] = arr
                    else:
                        arr = mb.encode_packet_fast(
                            addr, cont, payload, scr, sr5)
                    self._stream[c].append(arr)
                    self._slen[c] += mb.MAC_PACKET_BITS
                take = self._slen[c] - self._spos[c]
                if take > 99 - i:
                    take = 99 - i
                self._spos[c] += take
                i += take
            self._ppos[row, c] = pos
            self._plen[row, c] = i

    def _line_625(self, frame: int, line: int) -> np.ndarray:
        out = np.zeros(self.nbits, dtype=np.uint8)
        x = 0
        if self.mode_d:
            out[0] = 1
            x = 1
        out[x:x + 6] = mb.hsync_word_bits(frame, line)
        x += 6
        cri = mb.MAC_CRI if frame & 1 else (~mb.MAC_CRI) & 0xFFFFFFFF
        fsw = mb.MAC_FSW if frame & 1 else \
            (~mb.MAC_FSW) & 0xFFFFFFFFFFFFFFFF
        out[x:x + 32] = mb.rbits_msb(cri, 32)
        x += 32
        out[x:x + 64] = mb.rbits_msb(fsw, 64)
        x += 64
        il = self.l625.content_bits(frame, self.udt, self.conf.chid,
                                    self.vsam, self.aspect_43)
        if not self.mode_d:
            out[x:x + len(il)] = il
        else:
            g = self.prbs15
            n = len(il)
            rem = self.nbits - (x + 2 * n)
            wh = g.seq(int(self.seeds[line - 1]), 96 + 2 * n + rem)[96:]
            # per source bit: one PRBS bit is discarded, the source bit
            # is written, then a PRBS bit (src/mac.c:411-423, 1536-1551)
            out[x:x + 2 * n:2] = il
            out[x + 1:x + 2 * n:2] = wh[1:2 * n:2]
            x += 2 * n
            out[x:] = wh[2 * n:]
        return out

    def _line_624(self, frame: int, line: int) -> np.ndarray:
        out = np.zeros(self.nbits, dtype=np.uint8)
        x = 0
        if self.mode_d:
            out[0] = 1
            x = 1
        out[x:x + 6] = mb.hsync_word_bits(frame, line)
        x += 6
        body = mb.line_624_bits(self.mode_d)
        out[x:x + len(body)] = body
        return out

    # -- main advance -------------------------------------------------------
    def ensure(self, k_through: int):
        """Run iterations up to and including stream line k_through."""
        self._prefetch_audio(k_through)
        n = k_through - self.k + 1
        if n > 0:
            # per-batch arrays: lines simulate into row k - _pb
            nsub = 2 if self.mode_d else 1
            self._pb = self.k
            self._pn = n
            self._ppos = np.zeros((n, nsub), dtype=np.int64)
            self._plen = np.zeros((n, nsub), dtype=np.int64)
            self._pfull_rows = {}
            self._ptt_rows = {}
        while self.k <= k_through:
            self._iterate()
        self._materialize()

    def _materialize(self):
        """Batch-assemble the bit rows of all newly simulated lines:
        static heads + sequential packet-stream slices XOR the per-line
        PRBS whitening (src/mac.c:1375-1439), teletext overlays, and
        the running duobinary start polarity."""
        n = self._pn
        if n <= 0:
            return
        base = self._pb
        nsub = 2 if self.mode_d else 1
        x0 = 7 if self.mode_d else 6
        Bits = np.zeros((n, self.nbits), dtype=np.uint8)

        full_rows = self._pfull_rows
        for i, payload in full_rows.items():
            Bits[i] = payload
        if len(full_rows) < n:
            kk = base + np.arange(n, dtype=np.int64)
            if full_rows:
                dmask = np.ones(n, dtype=bool)
                dmask[list(full_rows)] = False
                drows = np.nonzero(dmask)[0]
            else:
                drows = np.arange(n, dtype=np.int64)
            dframes = 1 + kk[drows] // mb.MAC_LINES
            dlines = kk[drows] % mb.MAC_LINES + 1
            dpos = self._ppos[drows]   # [nd, nsub]
            dlen = self._plen[drows]
            nd = len(drows)
            D = np.zeros((nd, self.nbits), dtype=np.uint8)
            if self.mode_d:
                D[:, 0] = 1
                D[:, x0 + 99 * nsub] = 1              # spare bit
            hs = ((dframes + dlines) & 1) ^ (dlines == 623)
            D[:, x0 - 6:x0] = self._hs[hs]
            WH = self._wh_all[dlines - 1]              # [nd, 99*nsub]
            j99 = np.arange(99)
            for c in range(nsub):
                stream = (np.concatenate(self._stream[c])
                          if self._stream[c] else np.zeros(1, np.uint8))
                idx = dpos[:, c, None] - self._sbase[c] + j99
                valid = j99 < dlen[:, c, None]
                np.minimum(idx, len(stream) - 1, out=idx)
                vals = stream[idx]
                whc = WH[:, 99 * c:99 * (c + 1)]
                D[:, x0 + 99 * c:x0 + 99 * (c + 1)] = \
                    np.where(valid, vals ^ whc, whc)
            Bits[drows] = D
        # teletext overlays (a handful of lines per frame)
        for i, (line, v) in self._ptt_rows.items():
            if not self.mode_d:
                Bits[i, 116:116 + 360] = v
            else:
                pr = self.prbs15.seq(int(self.seeds[line - 1]),
                                     360 + 344)
                Bits[i, 230:230 + 720:2] = v
                Bits[i, 231:230 + 720:2] = pr[:360]
                Bits[i, 950:950 + 344] = pr[360:]
        # running start polarity (flips on every 0 bit, src/mac.c:193):
        # a line flips the carry iff its zero-bit count is odd
        sums = Bits.sum(axis=1, dtype=np.int64)
        sign = np.where((self.nbits - sums) & 1, -1, 1)
        pol = self.polarity * np.concatenate(
            [[1], np.cumprod(sign)])
        self.pol_start.update(zip(range(base, base + n),
                                  pol[:-1].tolist()))
        self.line_bits.update(zip(range(base, base + n), Bits))
        self.polarity = int(pol[-1])
        self._pn = 0
        # drop fully consumed packet chunks
        for c in range(nsub):
            st = self._stream[c]
            while st and self._sbase[c] + mb.MAC_PACKET_BITS \
                    <= self._spos[c]:
                st.pop(0)
                self._sbase[c] += mb.MAC_PACKET_BITS

    def _iterate(self):
        k = self.k
        frame = 1 + k // mb.MAC_LINES
        line = k % mb.MAC_LINES + 1

        if line == 1:
            if self.eurocrypt is not None:
                self.eurocrypt.next_frame(self, frame)
            self.prbs1.reset(self.cw, frame - 1)
            if (frame & 3) == 0:
                pkt = mb.si_dg0_packet(self.audio.address)
                self._write_packet(0, 0x000, 0, pkt, False)
                if self.mode_d:
                    self._write_packet(1, 0x000, 0, pkt, False)
            elif (frame & 3) == 1:
                ec = None
                if self.eurocrypt is not None:
                    ec = self.eurocrypt.si_info()
                pkt = mb.si_dg3_packet(self.audio.address, self.vsam,
                                       self.ratio,
                                       self.teletext is not None, ec)
                self._write_packet(0, 0x000, 0, pkt, False)
            # UDT refresh every 25 frames is a no-op with pinned time

        row = k - self._pb
        if line == 625:
            self._pfull_rows[row] = self._line_625(frame, line)
        elif line == 624:
            self._pfull_rows[row] = self._line_624(frame, line)
        else:
            self._sim_data_line(row, line)

        # teletext packets on lines 1-22 / 313-334 (src/mac.c:1556-1602)
        if self.teletext is not None and \
                (1 <= line <= 22 or 313 <= line <= 334):
            v = self.teletext.next_vbi_bits(frame, line)
            if v is not None:
                self._ptt_rows[row] = (line, v)

        # vision scrambling decision for the *previous* line
        # (src/mac.c:1836-1864: applied to lines[0] with the current
        # line's luma validity)
        if (self.vsam & 1) == 0:
            prev_line = (k - 1) % mb.MAC_LINES + 1 if k >= 1 else 0
            if prev_line == 1:
                prev_frame = 1 + (k - 1) // mb.MAC_LINES
                self.prbs2.reset(self.cw, prev_frame - 1)
            prbs = self.prbs2.update()
            y_valid = (24 <= line <= 310) or (336 <= line <= 622)
            self.scramble[k - 1] = (y_valid,
                                    282 + ((prbs & 0xFF00) >> 8),
                                    682 + ((prbs & 0x00FF) << 1))
        else:
            self.scramble[k - 1] = (False, 282, 682)

        # audio lineprocess trails by 1 line (golden build: synchronous,
        # window = macraster's lines[0]); the pixel->sample vresampler
        # is registered between macraster and audio (src/video.c:4361,
        # :4561) with a 2-line window, adding two more lines when present
        if k >= self.audio_lag:
            self._audio_line(k - self.audio_lag)

        self.k += 1

    def bits_block(self, k_lo: int, k_hi: int):
        """Packed line bits + start polarity for stream lines
        [k_lo, k_hi); missing lines are zero rows (their symbols expand
        to zero regardless of polarity).  The duobinary symbol
        expansion itself runs on device (mac_symbols)."""
        n = k_hi - k_lo
        packed = np.zeros((n, (self.nbits + 7) // 8), dtype=np.uint8)
        pol0 = np.zeros(n, dtype=np.int8)
        rows = [j for j in range(n)
                if self.line_bits.get(k_lo + j) is not None]
        if rows:
            bits = np.stack([self.line_bits[k_lo + j] for j in rows])
            packed[rows] = np.packbits(bits, axis=1, bitorder="little")
            pol0[rows] = [self.pol_start[k_lo + j] for j in rows]
        return packed, pol0

    def prune(self, below_k: int):
        for d in (self.pol_start, self.line_bits, self.scramble):
            for key in [x for x in d if x < below_k]:
                del d[key]


# ----------------------------------------------------------------------
# Encoder

class MacEncoder:
    """Block encoder for D/D2-MAC modes with the same device API as
    `Encoder` (encode_block_device); blocks must be encoded sequentially
    (the packet multiplex is a stream)."""

    @staticmethod
    def active_geometry(conf, sample_rate: int, pixel_rate: int = 0
                        ) -> tuple[int, int]:
        """(active_width, active_lines) for source fitting, without
        constructing an encoder (src/video.c:3843-3853 geometry)."""
        P = int(pixel_rate) or int(sample_rate)
        line_dur = conf.frame_rate.den / (conf.frame_rate.num * conf.lines)
        W = round(P * line_dur)
        aw = min(math.ceil(P * conf.active_width), W) & ~1
        return aw, conf.active_lines

    def __init__(self, mode: str | VidConfig, sample_rate: int,
                 pixel_rate: int = 0, source=None,
                 frames_per_block: int = 1,
                 scramble_video: int = 0, scramble_audio: bool = False,
                 eurocrypt=None, timestamp: int = 1_200_000_000,
                 teletext: str | None = None, teletext_clock=None,
                 devices=None):
        conf = get_mode(mode) if isinstance(mode, str) else mode
        assert conf.mac_mode is not None
        self.conf = conf
        self.S = int(sample_rate)
        self.P = int(pixel_rate) or self.S
        self.frames_per_block = frames_per_block

        line_dur = conf.frame_rate.den / (conf.frame_rate.num * conf.lines)
        self.width = W = round(self.P * line_dur)
        # levels (src/video.c:3855-3881)
        slevel = 1.0 if conf.modulation == Modulation.FM else conf.level
        self.level = conf.video_level * slevel
        q = lambda l: int(round(l * self.level * INT16_MAX))
        self.white_level = q(conf.white_level)
        self.black_level = q(conf.black_level)
        self.blanking_level = q(conf.blanking_level)

        self.active_left = round(self.P * conf.active_left)
        aw = min(math.ceil(self.P * conf.active_width), W)
        self.active_width = aw & ~1   # (src/mac.c:963)
        self.chrominance_width = self.active_width // 2
        r = lambda x: round(self.P * (x / MAC_CLOCK_RATE))
        self.chrominance_left = r(233.0)
        self.white_ref_left = r(371.0)
        self.black_ref_left = r(533.0)
        self.black_ref_right = r(695.0)
        self.video_scale = _lround(np.arange(mb.MAC_WIDTH) * W /
                                   mb.MAC_WIDTH).astype(np.int32)

        if source is None:
            from ..av.testcard import TestCardSource
            source = TestCardSource(self.active_width, conf.active_lines)
        self.source = source
        self.vframe_x = (self.active_width - source.width) // 2
        self.vframe_y = (conf.active_lines - source.height) // 2

        # VSAM (src/mac.c:889-918); Eurocrypt without an explicit cut
        # mode defaults to single-cut (src/hacktv.c:1332-1336)
        if eurocrypt is not None and scramble_video == 0:
            scramble_video = 1
        vsam = 4 if eurocrypt is not None else 0
        vsam |= {0: 1, 1: 2, 2: 0}[scramble_video]
        self.vsam = vsam

        # aspect ratio threshold (src/mac.c:893-897): PAR 1:1 test card
        thr = Fraction(14, 9) / Fraction(self.active_width,
                                         conf.active_lines)
        par = getattr(source, "pixel_aspect_ratio", Fraction(1, 1))
        self.aspect_43 = 1 if par <= thr else 0

        tt = None
        if teletext:
            from ..services.teletext import MacTeletext
            tt = MacTeletext(teletext, conf.lines,
                             round(float(conf.frame_rate)),
                             clock=teletext_clock)

        # pixel-rate -> sample-rate rational resample of the synthesized
        # stream (src/video.c:3627-3651 registers the vresampler between
        # the MAC raster and the FM modulator)
        self.resampler = None
        self.out_width = W
        if self.P != self.S:
            from ..ops import resampler as rs_mod
            self.out_width = round(self.S * line_dur)
            rs = rs_mod.Resampler.create(self.S, self.P)
            self.resampler = rs_mod.make_block_statics(
                rs, W, self.out_width,
                frames_per_block * mb.MAC_LINES, halo_lines=1)

        # the audio lineprocess runs on *output* lines (post-resampler,
        # src/video.c:3273-3277), so pair timing uses the output width
        self.mux = MacMux(conf, self.out_width, self.S, source, vsam,
                          scramble_audio=scramble_audio,
                          timestamp=timestamp,
                          aspect_43=self.aspect_43, eurocrypt=eurocrypt,
                          volume=conf.volume, teletext=tt)
        if self.resampler is not None:
            # the vresampler's 2-line window shifts every later process
            # (incl. audio) two lines back (src/video.c:4675-4688)
            self.mux.audio_lag = 3

        duo_level = (self.white_level - self.black_level) * 0.4
        self.Bm, self.B0, self.Bp = duobinary_bases(
            conf.mac_mode == MacMode.D, W, duo_level)

        # black padding level: the LUT value of RGB 0 (not 0)
        yb, _, _ = mac_yuv_host(conf, np.zeros((1, 1, 3), np.uint8),
                                self.level)
        self.y_black = float(yb[0, 0])
        # per-frame source planes are uploaded in _device_planes (the
        # reference renders the *current* frame every line,
        # src/mac.c:1758-1834 + frame advance src/video.c:4873-4903)
        self._plane_cache = None
        self._plane_shape = None
        self._device_planes(0)

        self.complex_out = conf.output_type == OutputType.COMPLEX
        self.fm_video_statics = None
        if conf.modulation == Modulation.FM:
            from ..rf import ops as rf_ops
            self.fm_video_statics = rf_ops.make_fm_video_statics(
                conf.fm_deviation, conf.fm_level * conf.level,
                self.S, conf.lines)
            self._fm_r = {0: jnp.int32(0)}

        self._meta = None
        # mesh execution: partition the block's line axis (same scheme
        # as Encoder(devices=...); the duobinary basis matmuls and the
        # scramble gathers shard row-wise)
        self.mesh = None
        if devices is not None:
            from jax.sharding import (Mesh, NamedSharding,
                                      PartitionSpec as P)
            darr = np.asarray(list(devices))
            nl = frames_per_block * mb.MAC_LINES
            if nl % len(darr):
                raise ValueError(
                    f"block of {nl} lines does not divide over "
                    f"{len(darr)} devices; adjust frames_per_block")
            self.mesh = Mesh(darr, ("t",))
            shard = NamedSharding(self.mesh, P("t", None))
            rep = NamedSharding(self.mesh, P())
            outs = ((shard, rep) if self.fm_video_statics is not None
                    else shard)
            self._step = jax.jit(self._step_impl, out_shardings=outs)
        else:
            self._step = jax.jit(self._step_impl)
        self._next_block = 0

    # ------------------------------------------------------------------
    def _device_planes(self, frame_no: int):
        """Upload the source frame's luma/chroma int16 planes, once per
        distinct frame object (test card reads return the same array)."""
        rgb = self.source.read_video(frame_no)
        if self._plane_cache is not None and self._plane_cache[0] is rgb:
            return self._plane_cache[1]
        y, u, v = mac_yuv_host(self.conf, rgb, self.level)
        pad_y = np.full((1, y.shape[1]), self.y_black, dtype=np.float32)
        y_img = np.concatenate([y.astype(np.float32), pad_y])
        u2 = u[:, ::2].astype(np.float32)
        v2 = v[:, ::2].astype(np.float32)
        zpad = np.zeros((1, u2.shape[1]), dtype=np.float32)
        u_img = np.concatenate([u2, zpad])
        v_img = np.concatenate([v2, zpad])
        shape = (y_img.shape, u_img.shape)
        if self._plane_shape is None:
            self._plane_shape = shape
        elif shape != self._plane_shape:
            raise ValueError("source frame size changed mid-stream")
        dev = tuple(jax.device_put(jnp.asarray(a))
                    for a in (y_img, u_img, v_img))
        self._plane_cache = (rgb, dev)
        return dev

    # ------------------------------------------------------------------
    def _line_meta(self):
        """Per-line (line-number periodic) metadata for one block."""
        if self._meta is not None:
            return self._meta
        n = self.frames_per_block * mb.MAC_LINES
        # with the pixel->sample resampler the step synthesizes one halo
        # row each side of the block (rows j = -1 .. n)
        halo = 1 if self.resampler is not None else 0
        conf = self.conf
        H = conf.active_lines
        lines = np.arange(-halo, n + halo) % mb.MAC_LINES + 1

        def luma_y(l):
            if 24 <= l <= 310:
                y = (l - 24) * 2 + 2
            elif 336 <= l <= 622:
                y = (l - 336) * 2 + 1
            else:
                return -1
            if conf.interlaced and \
                    getattr(self.source, "interlaced", 0) == 2:
                y += 1
            return y if 0 <= y < H else -1

        ys = np.array([luma_y(int(l)) for l in lines], dtype=np.int64)
        vy = ys - self.vframe_y
        vy[(vy < 0) | (vy >= self.source.height) | (ys < 0)] = -1
        # vy of the NEXT line (chroma transmitted one line early)
        l_next = np.arange(-halo + 1, n + halo + 1) % mb.MAC_LINES + 1
        ys_n = np.array([luma_y(int(l)) for l in l_next], dtype=np.int64)
        vy_n = ys_n - self.vframe_y
        vy_n[(vy_n < 0) | (vy_n >= self.source.height) | (ys_n < 0)] = -1

        meta = dict(
            vy=jnp.asarray(np.where(vy < 0, self.source.height, vy)
                           .astype(np.int32)),
            # the luma overwrite happens whenever the LINE is in luma
            # range (out-of-frame rows render black, src/mac.c:1781-1813)
            luma_mask=jnp.asarray((ys >= 0).astype(np.float32)),
            vy_next=jnp.asarray(np.where(vy_n < 0, self.source.height,
                                         vy_n).astype(np.int32)),
            vy_next_valid=jnp.asarray((vy_n >= 0).astype(np.float32)),
            chroma_u=jnp.asarray((lines % 2 == 1).astype(np.float32)),
            black_ref=jnp.asarray(np.isin(lines, (23, 335))
                                  .astype(np.float32)),
            refs_624=jnp.asarray((lines == 624).astype(np.float32)),
        )
        self._meta = meta
        return meta

    # ------------------------------------------------------------------
    def _step_impl(self, packed, pol0, planes, meta, scr_apply, xc1,
                   xc2, fm_r0, first):
        y_img, u_img, v_img = planes
        n = self.frames_per_block * mb.MAC_LINES
        nrows = n + (2 if self.resampler is not None else 0)
        W = self.width
        # unpack line bits and expand duobinary symbols on device
        # (polarity flips on every 0 bit, src/mac.c:193-203)
        bits = ((packed[:, :, None] >> jnp.arange(8, dtype=jnp.uint8))
                & 1).reshape(packed.shape[0], -1)[:, :self.mux.nbits]
        bits = bits.astype(jnp.int32)
        zeros = 1 - bits
        flips = jnp.cumsum(zeros, axis=1)
        p0 = pol0.astype(jnp.int32)[:, None]
        pol_before = jnp.where((flips - zeros) & 1, -p0, p0)
        sym = (bits * pol_before).astype(jnp.float32)
        # duobinary laid down before this line's overwrites: own bits +
        # the previous line's forward spill.  The NEXT line's backward
        # spill (Bm) is rendered one call later in the reference
        # (src/mac.c:227-232), i.e. after this line's luma/reference
        # overwrites — added below, post-overwrite.
        duo = (
            jnp.matmul(sym[1:nrows + 1], self.B0, precision=HIGHEST) +
            jnp.matmul(sym[0:nrows], self.Bp, precision=HIGHEST))
        canvas = jnp.float32(self.blanking_level) + duo
        canvas = jnp.clip(canvas, -32768, 32767)

        al, aw = self.active_left, self.active_width
        # luma rows (vy==height row is the black-pad row)
        lum = y_img[meta["vy"]]
        if self.vframe_x > 0 or lum.shape[1] < aw:
            pad_l = self.vframe_x
            pad_r = aw - pad_l - lum.shape[1]
            lum = jnp.pad(lum, ((0, 0), (pad_l, pad_r)),
                          constant_values=self.y_black)
        act = canvas[:, al:al + aw]
        act = jnp.where(meta["luma_mask"][:, None] > 0, lum, act)
        act = jnp.where(meta["black_ref"][:, None] > 0,
                        jnp.float32(self.black_level), act)
        canvas = canvas.at[:, al:al + aw].set(act)

        # line 624 reference areas
        x = jnp.arange(W)
        white_cols = ((x >= self.white_ref_left) &
                      (x < self.black_ref_left))
        black_cols = ((x >= self.black_ref_left) &
                      (x < self.black_ref_right))
        m624 = meta["refs_624"][:, None] > 0
        canvas = jnp.where(m624 & white_cols[None, :],
                           jnp.float32(self.white_level), canvas)
        canvas = jnp.where(m624 & black_cols[None, :],
                           jnp.float32(self.black_level), canvas)

        # the next line's backward duobinary spill, post-overwrite
        canvas = canvas + jnp.matmul(sym[2:nrows + 2], self.Bm,
                                     precision=HIGHEST)

        # chrominance, one line ahead of its luma (src/mac.c:1815-1834)
        crow = jnp.where(meta["chroma_u"][:, None] > 0,
                         u_img[meta["vy_next"]],
                         v_img[meta["vy_next"]])
        crow = crow * meta["vy_next_valid"][:, None]
        cl, cw = self.chrominance_left, int(u_img.shape[1])
        cx0 = self.vframe_x // 2
        canvas = canvas.at[:, cl + cx0:cl + cx0 + cw].add(crow)

        # vision scrambling rotations (src/mac.c:1604-1620, 1836-1864)
        if (self.vsam & 1) == 0:
            sc = self.video_scale
            if (self.vsam & 2) == 0:
                segs = [(229, 580, xc1), (586, 1285, xc2)]
            else:
                segs = [(230, 1285, xc1)]
            for x1, x2, xc in segs:
                s1 = int(sc[x1])
                s2 = int(sc[x2])
                w1 = int(sc[x1 - 2])
                w2 = int(sc[x2 + 2])
                span = s2 - s1 + 1
                xc0 = jnp.asarray(self.video_scale)[xc - 2]
                idx = s1 + (xc0[:, None] - s1 + x[None, :] - w1) % span
                gathered = jnp.take_along_axis(canvas, idx, axis=1)
                seg = (x >= w1) & (x <= w2)
                canvas = jnp.where(seg[None, :] &
                                   (scr_apply[:, None] > 0),
                                   gathered, canvas)

        if self.resampler is not None:
            # pixel -> sample rate polyphase resample (block 0's leading
            # halo row is zeroed: the reference's FIR window starts
            # zero-filled, src/fir.c:263-313)
            from ..ops import resampler as rs_mod
            canvas = canvas.at[0].multiply(first)
            y = rs_mod.device_resample_block(self.resampler,
                                             canvas.reshape(-1))
            wo = self.out_width
            canvas = y[wo:wo * (n + 1)].reshape(n, wo)

        # packed int32 I/Q (see Encoder._step_impl: flat int16
        # interleaves force degenerate T(1,128) layouts)
        def pack(i, q):
            ii = jnp.clip(jnp.round(i), -32768, 32767).astype(jnp.int32)
            qq = jnp.clip(jnp.round(q), -32768, 32767).astype(jnp.int32)
            return (ii & 0xFFFF) | (qq << 16)

        if self.fm_video_statics is not None:
            from ..rf import ops as rf_ops
            out_i, out_q, fm_carry = rf_ops.fm_video_modulate(
                self.fm_video_statics, canvas, fm_r0)
            return pack(out_i, out_q), fm_carry
        if self.complex_out:
            return pack(canvas, jnp.zeros_like(canvas))
        return jnp.clip(jnp.round(canvas), -32768, 32767
                        ).astype(jnp.int16)

    # ------------------------------------------------------------------
    def encode_block_device(self, block_no: int):
        if block_no != self._next_block:
            raise RuntimeError("MAC blocks must be encoded sequentially")
        self._next_block += 1
        n = self.frames_per_block * mb.MAC_LINES
        halo = 1 if self.resampler is not None else 0
        nrows = n + 2 * halo
        k0 = block_no * n
        self.mux.ensure(k0 + n + halo)

        packed, pol0 = self.mux.bits_block(k0 - 1 - halo,
                                           k0 + n + 1 + halo)
        scr = [self.mux.scramble.get(k0 + j, (False, 282, 682))
               for j in range(-halo, n + halo)]
        scr_apply = np.array([1.0 if s[0] else 0.0 for s in scr],
                             dtype=np.float32)
        xc1 = np.array([s[1] for s in scr], dtype=np.int32)
        xc2 = np.array([s[2] for s in scr], dtype=np.int32)
        self.mux.prune(k0 + n - 2)

        planes = self._device_planes(block_no * self.frames_per_block)
        meta = self._line_meta()
        fm_r0 = (self._fm_r[block_no]
                 if self.fm_video_statics is not None else jnp.int32(0))
        first = jnp.float32(0.0 if block_no == 0 else 1.0)
        out = self._step(jnp.asarray(packed), jnp.asarray(pol0),
                         planes, meta,
                         jnp.asarray(scr_apply), jnp.asarray(xc1),
                         jnp.asarray(xc2), fm_r0, first)
        if self.fm_video_statics is not None:
            out, fm_carry = out
            # carry stays a device scalar: no host sync, the next
            # block's dispatch chains on it asynchronously
            self._fm_r[block_no + 1] = fm_carry
            self._fm_r.pop(block_no - 2, None)
        return out

    def encode_block(self, block_no: int) -> np.ndarray:
        """Host int16 samples: [n] for real-baseband modes, interleaved
        [n, 2] I/Q for complex/FM modes."""
        return self.collect_block(block_no,
                                  self.encode_block_device(block_no))

    def collect_block(self, block_no: int, dev) -> np.ndarray:
        a = np.asarray(dev)
        if a.dtype == np.int32:
            return a.reshape(-1).view(np.int16).reshape(-1, 2)
        return a.reshape(-1)

    def block_audio_pcm(self, block_no: int):
        """32 kHz int16 stereo pairs consumed during this block — the
        sink audio side-channel (src/video.c:3306-3310)."""
        n = self.frames_per_block * mb.MAC_LINES
        k0 = block_no * n
        p0 = self.mux._audio_pairs_through_line(k0 - 1)
        p1 = self.mux._audio_pairs_through_line(k0 + n - 1)
        return self.mux._pcm(p0, p1 - p0).astype(np.int16)

    @property
    def frame_samples(self) -> int:
        """Output samples per frame (at sample_rate, post-resampler)."""
        return self.out_width * self.conf.lines
