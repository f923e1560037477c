"""Top-level encoder: source frames -> device block synthesis -> int16 IQ.

Architectural inversion of the reference's sample-serial line loop
(src/hacktv.c:1579-1587, src/video.c:4867-4952): a block of whole frames
(plus one halo line each side for filter continuity) is synthesised as a
single fused jitted array program.  The stream-line counter `k` is the
only "state": k=0 is the first rendered line, (frame 1, line 1) — the
reference starts bline=1/bframe=1 (src/video.c:4166) and every rendered
line is output, with zero filter history at the stream start.

Dispatch through the TPU runtime has a ~1.5 ms floor per call, so
`frames_per_block` frames are synthesised per call to amortise it.
"""

from __future__ import annotations

import functools
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from .config.standards import OutputType, VidConfig, get_mode
from .video.params import VideoParams
from .video import raster
from .av.testcard import TestCardSource

_META_KEYS = ("base", "nxt", "prv", "burst", "vswitch", "vy", "al",
              "ar", "fsc", "fscf")


class Encoder:
    def __init__(self, mode: str | VidConfig, sample_rate: int,
                 pixel_rate: int = 0, source=None,
                 frames_per_block: int = 1, wss: str | None = None,
                 teletext: str | None = None, vfilter: bool = False,
                 offset: int = 0, swap_iq: bool = False,
                 vits: bool = False, vitc: bool = False,
                 cc608: bool = False, acp: bool = False,
                 videocrypt: str | None = None,
                 videocrypt2: str | None = None,
                 videocrypts: str | None = None,
                 syster: str | None = None,
                 systercnr: str | None = None,
                 syster_key_table: int = 0,
                 d11: str | None = None,
                 systeraudio: bool = False,
                 a2stereo: bool = False,
                 sis: str | None = None,
                 passthru: str | None = None,
                 teletext_clock=None,
                 raw_bb_file: str | None = None,
                 raw_bb_blanking: int = 0,
                 raw_bb_white: int = 0x300,
                 secam_exact: bool | None = None,
                 fm_direct_trig: bool = False,
                 devices=None):
        conf = get_mode(mode) if isinstance(mode, str) else mode
        if vfilter or offset or swap_iq:
            from dataclasses import replace as _replace
            conf = _replace(conf,
                            vfilter=conf.vfilter or vfilter,
                            offset=conf.offset or int(offset),
                            swap_iq=conf.swap_iq or swap_iq)
        self.conf = conf
        self.params = VideoParams.create(conf, sample_rate, pixel_rate)
        self.frames_per_block = frames_per_block
        p = self.params

        # Rational pixel->sample video resampler (src/fir.c:392-428,
        # src/video.c:3627-3651): synthesis runs at pixel_rate; the
        # stream is polyphase-resampled to sample_rate before the video
        # filter and audio stages.
        self.resampler = None
        self.out_params = p
        if pixel_rate and int(pixel_rate) != int(sample_rate):
            from .ops import resampler as rs_mod
            self.out_params = VideoParams.create(conf, sample_rate, 0)
            rs = rs_mod.Resampler.create(int(sample_rate),
                                         int(pixel_rate))
            nlines0 = frames_per_block * conf.lines
            self.resampler = rs_mod.make_block_statics(
                rs, p.width, self.out_params.width, nlines0,
                halo_lines=1)

        # Vertical-scan modes (Baird 30, NBTV) request the frame with
        # swapped dimensions and rotate it to scan order
        # (src/hacktv.c:1520-1526, src/video.c:4881-4893)
        rotated = (conf.frame_orientation & 3) in (1, 3)
        if source is None:
            if rotated:
                source = TestCardSource(conf.active_lines, p.active_width)
            else:
                source = TestCardSource(p.active_width, conf.active_lines)
        if conf.frame_orientation:
            source = _OrientedSource(source, conf.frame_orientation)
        self.source = source

        # Frame geometry: the test card is generated at the active
        # resolution so there is no crop/offset (src/hacktv.c:1502-1526).
        self.vframe_x = (p.active_width - source.width) // 2
        self.vframe_y = (conf.active_lines - source.height) // 2

        self.statics = raster.make_statics(p, self.vframe_x, source.width)

        # VBI data services, in the reference's registration order
        # (src/video.c:4215-4359): vits, wss, [scramblers], acp, vitc,
        # cc608, sis, teletext
        from .config.standards import ColourMode as _CM
        self.services = []
        if vits:
            from .services.vits import VITS as _VITS
            self.services.append(_VITS(p, conf.colour_mode == _CM.PAL))
        if wss:
            from .services.wss import WSS
            self.services.append(WSS(p, wss))
        if videocrypt or videocrypt2:
            from .services.videocrypt import Videocrypt as _VC
            self.services.append(_VC(p, videocrypt, videocrypt2))
        if videocrypts:
            from .services.videocrypts import VideocryptS as _VCS
            self.services.append(_VCS(p, videocrypts))
        if syster:
            from .services.syster import Syster as _NG
            self.services.append(_NG(p, syster, cnr=bool(systercnr),
                                     key_table=syster_key_table))
        elif systercnr:
            from .services.syster import SysterCNR as _SCNR
            self.services.append(_SCNR(p, systercnr,
                                       key_table=syster_key_table))
        if d11:
            from .services.syster import D11 as _D11
            self.services.append(_D11(p, d11))
        if acp:
            from .services.acp import ACP as _ACP
            self.services.append(_ACP(p))
        if vitc:
            from .services.vitc import VITC as _VITC
            self.services.append(_VITC(p))
        if cc608:
            from .services.cc608 import CC608 as _CC
            self.services.append(_CC(p, source=self.source))
        if sis:
            from .audio.chain import AudioChain as _AC
            from .services.sis import SiS as _SIS
            # The sis process consumes audio through a chain of its own:
            # the audio lineprocess trails it by 1 line plus the threaded
            # vfilter window (src/video.c:4675-4688).
            lag = 1
            nt = (len(p.vfilter_ctaps) if p.vfilter_ctaps is not None else
                  len(p.vfilter_taps) if p.vfilter_taps is not None else 0)
            if nt:
                lag += 1 + (nt // 2 + p.width - 1) // p.width
            sis_chain = _AC(self.conf, p.sample_rate, p.width, self.source,
                            systeraudio=systeraudio)
            self.services.append(_SIS(p, sis, sis_chain, lag))
        if teletext:
            from .services.teletext import Teletext
            self.services.append(Teletext(p, teletext,
                                          clock=teletext_clock))

        # Scramblers that read lines ahead (syster shuffle: up to 344)
        # extend the bottom halo of each synthesised block.
        self.halo_after = max([1] + [getattr(s, "lookahead", 1)
                                     for s in self.services])

        # S-Video interleaves luma/chroma like a complex stream
        # (src/video.c:3032: chroma written to the second channel)
        self.complex_out = (conf.output_type == OutputType.COMPLEX
                            or conf.s_video)
        if conf.s_video and self.resampler is not None:
            raise NotImplementedError(
                "--pixelrate with --s-video is not supported")
        self._fm_direct = fm_direct_trig
        self._init_audio(systeraudio=systeraudio, a2stereo=a2stereo)

        # FM video modulation (src/video.c:4564-4585).  The reference's
        # int32 phase recurrence truncation-walks by a content-dependent
        # ~1e-8 rad/sample that a closed form cannot reproduce, so the
        # host-exact serial kernel runs the modulator when possible
        # (satellite FM modes are far below the device's throughput
        # ceiling anyway); the device closed form remains for FM
        # combined with the post-FM device stages (swap/offset/passthru).
        from .config.standards import Modulation
        from .rf import ops as rf_ops
        self.fm_video_statics = None
        self.fm_video_exact = None
        self._fm_ed_frame = None
        if conf.modulation == Modulation.FM:
            use_host = (not conf.swap_iq and not conf.offset
                        and passthru is None)
            if use_host:
                from . import runtime
                try:
                    self.fm_video_exact = runtime.FmCarrierExact(
                        0.0, conf.fm_deviation, p.sample_rate,
                        int(round(32767 * conf.fm_level * conf.level)))
                except Exception:
                    pass
            if self.fm_video_exact is None:
                self.fm_video_statics = rf_ops.make_fm_video_statics(
                    conf.fm_deviation, conf.fm_level * conf.level,
                    p.sample_rate, conf.lines)
                # device scalar from the start: the carry stays on
                # device (no host sync), stable packed-args spec
                self._fm_r: dict[int, object] = {0: jnp.int32(0)}
            # frame-locked triangular energy dispersal
            # (src/video.c:4573-4581): exactly one frame long, so one
            # static [lines, W] offset pattern covers every block
            self._fm_ed_frame = rf_ops.fm_energy_dispersal_frame(
                conf.fm_energy_dispersal, self.out_params.width,
                conf.lines) if conf.fm_energy_dispersal else None

        # complex frequency offset (src/video.c:4592-4605)
        self.offset_statics = None
        if conf.offset:
            self.offset_statics = rf_ops.make_offset_statics(
                conf.offset, p.sample_rate, self.out_params.width)

        # SECAM chroma (src/video.c:3068-3233)
        from .config.standards import ColourMode
        from .video import secam as secam_mod
        self.secam_statics = None
        self.secam_device = False
        if conf.colour_mode == ColourMode.SECAM:
            self.secam_statics = secam_mod.make_statics(
                p, self.vframe_x, self.source.width)
            # TPU-native chroma path by default; the host-exact path
            # stays as the parity oracle (secam_exact=True) and as the
            # default for FM-video modes, where the device path's rare
            # 1-LSB round flips would integrate into the outer FM phase
            if secam_exact is None:
                secam_exact = (self.fm_video_statics is not None
                               or self.fm_video_exact is not None)
            self.secam_device = not secam_exact
            from collections import OrderedDict
            self._secam_meta_cache: OrderedDict = OrderedDict()
            if self.secam_device:
                # cross-block IIR carry: z at the last active line's end
                # (a single f32 scalar; see secam.device_chroma_carrier)
                self._secam_z = {0: jnp.float32(0.0)}
            else:
                # stream-carried float64 IIR state per block (the
                # reference carries (ix, iy) doubles across the whole
                # stream, src/fir.c:710-740)
                self._secam_iir = {0: (0.0, 0.0)}
                self._secam_lut = secam_mod.carrier_lut(
                    self.secam_statics, p.pixel_rate)

        # Raw baseband replay input (src/video.c:2406-2445): replaces the
        # raster; the int16 sample file loops and is rescaled to the
        # mode's blanking..white range with C integer division.
        self.raw_bb = None
        if raw_bb_file is not None:
            self.raw_bb = _RawBBReader(raw_bb_file, p.width,
                                       raw_bb_blanking, raw_bb_white,
                                       p.blanking_level, p.white_level)

        # Passthru: external int16 IQ stream added just before output
        # (src/video.c:3517-3541); stops adding at EOF.
        self.passthru = None
        if passthru is not None:
            self.passthru = _PassthruReader(passthru)

        # Reference output-ring size (src/video.c:3578, 4641-4688): at
        # startup the un-rendered next slots keep width 0 for one ring
        # cycle, so vbidata truncates the forward sync spill of the
        # first (olines - 1) lines there (material for Baird 240, whose
        # mid-line vsync spills half a line forward).
        _SVC_NLINES = {"VITS": 1, "WSS": 1, "Videocrypt": 2,
                       "VideocryptS": 126, "Syster": 345,
                       "SysterCNR": 2, "D11": 2, "ACP": 1, "VITC": 1,
                       "CC608": 1, "SiS": 1, "Teletext": 1}
        from .config.standards import ColourMode as _CM2
        procs = [(1 if raw_bb_file else 3, False)]
        if conf.colour_mode == _CM2.SECAM:
            procs.append((1, True))
        for s in self.services:
            procs.append((_SVC_NLINES.get(type(s).__name__, 1), False))
        if self.resampler is not None:
            procs.append((2, True))
        if p.vfilter_taps is not None or p.vfilter_ctaps is not None:
            procs.append((2, True))
        procs.append((1, True))                  # audio (always, :4561)
        if self.fm_video_statics is not None \
                or self.fm_video_exact is not None:
            procs.append((1, True))
        if conf.swap_iq:
            procs.append((1, False))
        if conf.offset:
            procs.append((1, True))
        if self.passthru is not None:
            procs.append((1, False))
        procs.append((1, False))                 # output
        olines = 0
        prev_thread = True
        for i, (nl, th) in enumerate(procs):
            olines += nl - (0 if (i == 0 or th or prev_thread) else 1)
            prev_thread = th
        self._spill_warmup = olines - 1

        # Multi-device execution: contiguous line ranges of the output
        # block are partitioned over a 1-D mesh (the output timeline is
        # this framework's "long sequence"; SURVEY.md section 2.10).
        # GSPMD propagates the output partitioning backwards through the
        # step — per-line synthesis shards cleanly, the stream
        # convolutions get halo exchanges, and the modular phase /
        # NICAM prefix scans become cross-device scans.  The per-device
        # compute share is asserted by __graft_entry__.dryrun_multichip
        # via compiled FLOP analysis.
        self.mesh = None
        if devices is not None:
            from jax.sharding import (Mesh, NamedSharding,
                                      PartitionSpec as P)
            darr = np.asarray(list(devices))
            nlines_total = frames_per_block * conf.lines
            if nlines_total % len(darr):
                raise ValueError(
                    f"block of {nlines_total} lines does not divide "
                    f"over {len(darr)} devices; adjust frames_per_block")
            self.mesh = Mesh(darr, ("t",))
            n_aux = sum(x is not None for x in (
                self.fm_video_statics, self.nicam_statics)) \
                + (1 if self.secam_device else 0) \
                + (1 if self.fm_dev_held else 0)
            shard = NamedSharding(self.mesh, P("t", None))
            rep = NamedSharding(self.mesh, P())
            outs = (shard,) + (rep,) * n_aux if n_aux else shard
            # replicate every INPUT: backward propagation from the
            # sharded output alone scattered the small [nlines]-vector
            # math across shards and paid ~2800 tiny latency-bound
            # collectives per block (r4 verdict #3); with replicated
            # inputs GSPMD shards only the [nlines, W] row chain and
            # the halo exchange collapses to ~8 permutes/block at a
            # ~1.4x per-device FLOP overhead on the small ops
            self._step = jax.jit(self._step_impl, in_shardings=rep,
                                 out_shardings=outs)
        else:
            self._step = jax.jit(self._step_impl)
        from collections import OrderedDict
        self._meta_cache: OrderedDict = OrderedDict()
        # moving-source on-device YUV conversion (static per encoder:
        # the step trace branches on it)
        self._dev_convert = self._use_dev_convert()
        # multi-frame blocks for moving sources: upload fpb+2 raw u8
        # frames per block (leading halo frame + trailing lookahead),
        # convert in-step and gather with absolute stacked row indices.
        # SECAM keeps its own chroma meta (single-frame blocks only).
        from .config.standards import ColourMode as _CMX
        self._multi_frame = (self._dev_convert and frames_per_block > 1
                             and self.conf.colour_mode != _CMX.SECAM)
        self._nf = frames_per_block + 2
        self._frame_cache: dict = {}
        self._rgb_cache: tuple | None = None
        self._fpb_warned = False
        self._yuv_lut = None
        self._conv_jit = None
        self._arg_spec = None
        self._arg_treedef = None

    def _init_audio(self, systeraudio: bool = False,
                    a2stereo: bool = False):
        """Audio subcarriers (FM mono, NICAM) — added after the video
        filter, before any FM video modulation (src/video.c:4561)."""
        from .audio.chain import AudioChain
        from .audio import synth as audio_synth

        p = self.out_params
        self.audio = AudioChain(self.conf, p.sample_rate, p.width,
                                self.source, systeraudio=systeraudio,
                                a2stereo=a2stereo)
        nlines = self.frames_per_block * p.lines
        self.fm_statics = None
        self.nicam_statics = None
        self.am_statics = None
        self.fm_exact = None
        self.fm_win = None
        self.fm_dev_held = False
        from .config.standards import Modulation as _Mod
        fm_video = self.conf.modulation == _Mod.FM
        if self.audio.fm_mono is not None and fm_video:
            # FM-video (satellite) modes integrate the audio carrier's
            # sub-LSB truncation bias into a phase ramp, so the carrier
            # must reproduce the reference's int32 recurrence exactly —
            # serial, so it runs in the native runtime on the host
            # (src/video.c:2218-2276; see rt_fm_carrier_exact)
            from . import runtime
            c = self.audio.fm_mono
            self.fm_exact = runtime.FmCarrierExact(
                c.frequency, c.deviation, p.sample_rate, c.level_int)
        elif self.audio.fm_mono is not None:
            c = self.audio.fm_mono
            self.fm_statics = audio_synth.make_fm_statics(
                c.num, c.den, c.level_int, c.kd, p.width, self.audio.nseg,
                c.eps)
            self.fm_statics.direct = self._fm_direct
            # device-side segment assembly (H2D transfers serialise with
            # compute on this runtime; the [B, nseg] f32 uploads dominated)
            self.fm_win = self.audio.fm_win_config(c, nlines)
            # device-side channel mix + limiter + held values for the
            # simple channels (the host limiter FIRs were the flagship's
            # remaining serial bound); the int32 phase anchor becomes a
            # device scalar chained block to block
            self.fm_dev_held = (self.fm_win is not None
                                and c.channel in ("mono", "left", "right")
                                and not c.a2_scale)
            if self.fm_dev_held:
                self._fm_xa: dict = {0: [None, jnp.int32(0)]}
                self._fm_xa_started = False
        if self.audio.am_mono is not None:
            c = self.audio.am_mono
            self.am_statics = audio_synth.make_fm_statics(
                c.num, c.den, c.level_int, 0.0, p.width, self.audio.nseg,
                c.eps)
        if self.audio.nicam is not None:
            nt = self.audio.nicam
            self.nicam_statics = audio_synth.make_nicam_statics(
                nt["taps"], nt["num"], nt["den"], p.width, nt["timing"])
            # device-side frame encoder (the 2-core host cannot sustain
            # the bit pipeline at >100x realtime)
            from .audio import nicam_dev
            from .audio import nicam as _nm
            st = self.nicam_statics
            spp = st.syms_per_period
            G = -(-nlines // st.period)
            L = (G + 4) * spp
            nf_max = (G * spp + st.nslot) // _nm.NICAM_FRAME_SYMS + 12
            assert spp + nf_max * _nm.NICAM_FRAME_SYMS <= L
            self.nicam_dev_statics = nicam_dev.make_dev_statics(
                nf_max, L, spp)
            import functools as _ft
            self.nicam_dev_fn = jax.jit(_ft.partial(
                nicam_dev.signs_device, self.nicam_dev_statics))
            self._nicam_zero = jnp.int32(0)
        self.dance_statics = None
        if self.audio.dance is not None:
            dt = self.audio.dance
            self.dance_statics = audio_synth.make_nicam_statics(
                dt["taps"], dt["num"], dt["den"], p.width, dt["timing"])
        self.fm_right_statics = None
        self.a2_statics = None
        if self.audio.fm_right is not None:
            c = self.audio.fm_right
            self.fm_right_statics = audio_synth.make_fm_statics(
                c.num, c.den, c.level_int, c.kd, p.width, self.audio.nseg,
                c.eps)
            self.fm_right_win = self.audio.fm_win_config(c, nlines)
            self.a2_statics = audio_synth.make_a2_statics(
                self.audio.a2_pilot, c.kd, p.width)
        self.has_audio = (self.fm_statics is not None or
                          self.nicam_statics is not None or
                          self.dance_statics is not None or
                          self.am_statics is not None or
                          self.fm_right_statics is not None)

    # ------------------------------------------------------------------
    def _block_meta(self, block_no: int):
        """Device metadata for stream lines [k0-1, k0+n+1) where k0 is the
        first line of block `block_no` and n = frames_per_block*lines."""
        p = self.params
        nlines = self.frames_per_block * p.lines
        k0 = block_no * nlines
        cyc = self._carrier_cycle_lines()
        fsc3 = ((1 + k0 // p.conf.lines) % 3
                if self.statics.fsc_mode is not None else 0)
        key = (block_no % 2 if p.conf.lines % 2 else 0,
               k0 % cyc if cyc else 0, block_no == 0, fsc3)
        hit = self._meta_cache.get(key)
        if hit is not None:
            self._meta_cache.move_to_end(key)
            return hit
        # LRU eviction: clearing wholesale caused thrash on long fpb=1
        # streams whose key cycle exceeds the cap (line_meta costs ms)
        while len(self._meta_cache) > 256:
            self._meta_cache.popitem(last=False)
        meta = p.line_meta(k0 - 1, nlines + 1 + self.halo_after,
                           vframe_interlaced=self.source.interlaced,
                           vframe_x=self.vframe_x, vframe_y=self.vframe_y,
                           vframe_w=self.source.width,
                           vframe_h=self.source.height,
                           spill_warmup=self._spill_warmup)
        if self._multi_frame:
            # absolute stacked row index: f_local*(H+1) + row (+H for
            # the per-frame fallback row); the per-line frame offset
            # pattern is periodic under the same cache key
            L = p.conf.lines
            H = self.source.height
            ks = np.maximum(
                k0 - 1 + np.arange(len(meta["vy"]), dtype=np.int64), 0)
            first_f = max((k0 - 1) // L, 0)
            f_local = np.clip(ks // L - first_f, 0, self._nf - 1)
            vy0 = meta["vy"]
            meta = dict(meta)
            meta["vy"] = np.where(
                vy0 >= 0, f_local * (H + 1) + vy0,
                f_local * (H + 1) + H).astype(np.int32)
        dev = {k: jnp.asarray(meta[k]) for k in _META_KEYS}
        dev["cos0"] = jnp.asarray(meta["cos0"].astype(np.float32))
        dev["sin0"] = jnp.asarray(meta["sin0"].astype(np.float32))
        dev["lut_row"] = jnp.asarray(meta["lut_row"])
        self._meta_cache[key] = dev
        return dev

    def _carrier_cycle_lines(self) -> int:
        import math
        p = self.params
        if not p.cl_num:
            return 1
        g = math.gcd(p.width, p.cl_num)
        return p.cl_num // g

    def _shard_hint(self, arr):
        """Pin a block intermediate to line-partitioned layout on the
        mesh.  The halo-extended arrays ([nlines + 2, W] for a 5000-line
        block) are not evenly divisible by the device count, and without
        the constraint GSPMD falls back to the largest even divisor
        (2-way for 5002 rows); the explicit constraint makes XLA pad the
        last shard instead, keeping the whole raster 1/N per device."""
        if self.mesh is None:
            return arr
        from jax.sharding import NamedSharding, PartitionSpec as P
        spec = P("t") if arr.ndim == 1 else P("t",
                                              *([None] * (arr.ndim - 1)))
        return jax.lax.with_sharding_constraint(
            arr, NamedSharding(self.mesh, spec))

    def _device_rgb(self, block_no: int):
        """Bit-exact host YUV conversion (f64, matching the reference's
        LUT build), uploaded once per distinct source frame."""
        from .config.standards import ColourMode
        if self._multi_frame:
            # frames are read per block window in ascending order (the
            # ffmpeg pipe decodes monotonically)
            if self._rgb_cache is not None \
                    and self._rgb_cache[0] == ("blk", block_no):
                return self._rgb_cache[1]
            if self._yuv_lut is None:
                self._yuv_lut = jax.device_put(jnp.asarray(
                    raster.build_yuv_lut(self.params)))
            stack = np.stack([self._read_frame(block_no, j)
                              for j in range(self._nf)])
            dev = (self._yuv_lut, jnp.asarray(stack))
            self._rgb_cache = (("blk", block_no), dev)
            return dev
        rgb = self.source.read_video(block_no * self.frames_per_block)
        if self._rgb_cache is not None and self._rgb_cache[0] is rgb:
            return self._rgb_cache[1]
        if (self.frames_per_block > 1 and self._rgb_cache is not None
                and not self._fpb_warned):
            # one frame's planes cover the whole block: a moving source
            # with frames_per_block > 1 repeats the block's first frame
            self._fpb_warned = True
            import sys
            print("hacktv_tpu: warning: frames_per_block="
                  f"{self.frames_per_block} with a non-static source "
                  "repeats each block's first frame; use "
                  "--frames-per-block 1 for moving video",
                  file=sys.stderr)
        secam = self.conf.colour_mode == ColourMode.SECAM
        if self.statics.fsc_mode is not None:
            # field-sequential colour: one grey plane per channel,
            # ordered by the fsc value 0=B, 1=G, 2=R (the reference
            # replicates the selected byte, src/video.c:2989-2994)
            planes = []
            for ch in (2, 1, 0):
                grey = np.repeat(rgb[..., ch:ch + 1], 3, axis=-1)
                planes.append(raster.rgb_to_yuv_host(self.params,
                                                     grey)[0])
            y = np.stack(planes)
            u = np.zeros_like(planes[0])
            v = np.zeros_like(planes[0])
        elif self._dev_convert:
            # moving source: convert ON DEVICE inside the step via the
            # reference's 16M-entry LUT (built once, bit-exact through
            # rgb_to_yuv_host; the host f64 path costs tens of ms per
            # frame and bound moving-video throughput)
            if self._yuv_lut is None:
                self._yuv_lut = jax.device_put(jnp.asarray(
                    raster.build_yuv_lut(self.params, secam)))
            dev = (self._yuv_lut,
                   jnp.asarray(np.ascontiguousarray(rgb)))
            self._rgb_cache = (rgb, dev)
            return dev
        else:
            y, u, v = raster.rgb_to_yuv_host(self.params, rgb, secam)
        dev = tuple(jax.device_put(jnp.asarray(a)) for a in (y, u, v))
        self._rgb_cache = (rgb, dev)
        if secam:
            self._rgb_host_uv = (u, v)
        return dev

    def _read_frame(self, block_no: int, j: int) -> np.ndarray:
        """Frame first_f + j of block block_no, from the block-window
        cache (sources like the ffmpeg pipe decode monotonically and
        reuse their frame buffer, so frames are copied on first read)."""
        L = self.conf.lines
        k0 = block_no * self.frames_per_block * L
        first_f = max((k0 - 1) // L, 0)
        f = first_f + j
        hit = self._frame_cache.get(f)
        if hit is None:
            hit = np.array(self.source.read_video(f), copy=True)
            self._frame_cache[f] = hit
            for old_f in [x for x in self._frame_cache if x < first_f]:
                del self._frame_cache[old_f]
        return hit

    def _use_dev_convert(self) -> bool:
        """Device LUT conversion applies to moving (non-stateless)
        sources; the SECAM host-exact oracle needs the host u/v
        planes, FSC modes restack planes, and the static test card
        converts once anyway."""
        from .config.standards import ColourMode
        if getattr(self.source, "stateless", False):
            return False
        if self.statics.fsc_mode is not None or self.raw_bb is not None:
            return False
        if self.conf.colour_mode == ColourMode.SECAM \
                and not self.secam_device:
            return False
        return True

    # ------------------------------------------------------------------
    def _step_impl(self, rgb, base, nxt, burst, vswitch, vy, al, ar,
                   cos0, sin0, lut_row, fsc, fscf, prv, first_mask,
                   arg_dev, arg_bufs):
        """Fused synthesis + output filter + audio + int16 quantisation
        for one block of frames (plus halo lines)."""
        from .audio import synth as audio_synth

        audio_args = self._unpack_args(arg_dev, arg_bufs)

        stacked_h = 0
        if self._dev_convert:
            y_c, u_c, v_c = raster.yuv_convert_device(*rgb)
            if self._multi_frame:
                rgb = raster.stack_planes(y_c, u_c, v_c,
                                          self.statics.black_y)
                stacked_h = self.source.height + 1
            else:
                rgb = (y_c, u_c, v_c)

        p = self.params
        W = p.width
        nlines = self.frames_per_block * p.lines
        n = nlines * W

        s_video = self.conf.s_video
        cblock = None
        if self.raw_bb is not None:
            block = audio_args["rawbb"]
        elif s_video:
            # S-Video: luma and chroma on separate channels
            # (src/video.c:3032, 3219)
            block, cblock = raster.synth_block(
                self.statics, rgb, base, nxt, burst, vswitch, vy, al,
                ar, cos0, sin0, lut_row, fsc, fscf, prv,
                split_chroma=True, stacked_h=stacked_h)
        else:
            block = raster.synth_block(self.statics, rgb, base, nxt,
                                       burst, vswitch, vy, al, ar, cos0,
                                       sin0, lut_row, fsc, fscf, prv,
                                       stacked_h=stacked_h)
        block = self._shard_hint(block)
        secam_tail = None
        if self.secam_statics is not None:
            from .video import secam as secam_mod
            if self.secam_device:
                carrier_add, secam_tail = secam_mod.device_chroma_carrier(
                    self.secam_statics, self.out_params.width,
                    audio_args["secam"], rgb[1], rgb[2],
                    audio_args["secam_z0"])
            else:
                carrier_add = audio_args["secam_add"]
            if s_video:
                # no luma band-reject; the carrier rides the C channel
                # (src/video.c:3206, 3219)
                cblock = cblock + carrier_add.astype(jnp.float32)
            else:
                block = secam_mod.render(
                    self.secam_statics, block, carrier_add,
                    audio_args["secam"])
        if self.services:
            if self.statics.carrier_rows is not None:
                lut = (jnp.asarray(self.statics.carrier_rows[0])[lut_row],
                       jnp.asarray(self.statics.carrier_rows[1])[lut_row])
            elif self.statics.carrier_cos is not None:
                # carrier period too long for exact LUT rows: per-line
                # angle addition against the static column table, the
                # same approximation the raster's subcarrier mix uses
                cc = jnp.asarray(self.statics.carrier_cos)
                cs = jnp.asarray(self.statics.carrier_sin)
                lut = (jnp.round((cos0[:, None] * cc
                                  - sin0[:, None] * cs) * 32767.0),
                       jnp.round((sin0[:, None] * cc
                                  + cos0[:, None] * cs) * 32767.0))
            else:
                lut = None
            for svc, arr in zip(self.services,
                                audio_args.get("services", ())):
                block = svc.apply(block, arr, lut)
        block = block.at[0].multiply(first_mask)
        block = self._shard_hint(block)
        if cblock is not None:
            cblock = cblock.at[0].multiply(first_mask)
        x = block.reshape(-1)

        if self.resampler is not None:
            # pixel -> sample rate polyphase resample of the stream
            # (incl. one halo line each side for the filter context);
            # downstream stages run at the output width
            from .ops import resampler as rs_mod
            x = rs_mod.device_resample_block(self.resampler, x)
            p = self.out_params
            W = p.width
            n = nlines * W

        def pallas_stream(taps_r, taps_i=None):
            # one VMEM-staged pass over the stream for ALL taps (the
            # VSB scomplex filter is 102 shifted-slice FMAs otherwise)
            from .ops import pallas_fir
            ntaps = len(taps_r)
            half = ntaps // 2
            xs = x[W - half: W - half + n + ntaps - 1]
            return pallas_fir.stream_fir(xs, taps_r, taps_i, n)

        yq = None
        if p.vfilter_ctaps is not None:
            # VSB: real -> complex filter (src/fir.c:529-615 "scomplex")
            yf, yqf = pallas_stream(
                np.ascontiguousarray(p.vfilter_ctaps.real),
                np.ascontiguousarray(p.vfilter_ctaps.imag))
            y = yf.reshape(nlines, W)
            yq = yqf.reshape(nlines, W)
        elif p.vfilter_taps is not None:
            y = pallas_stream(p.vfilter_taps).reshape(nlines, W)
        else:
            y = x[W: W + n].reshape(nlines, W)
        if cblock is not None:
            # S-Video C channel, through the same LP filter when
            # enabled (the reference's vfilter runs 2 channels,
            # src/video.c:4366)
            xl = x
            x = cblock.reshape(-1)
            if p.vfilter_taps is not None:
                yq = pallas_stream(p.vfilter_taps).reshape(nlines, W)
            else:
                yq = x[W: W + n].reshape(nlines, W)
            x = xl

        if not self.has_audio and not self.complex_out \
                and cblock is None:
            if self.passthru is not None:
                y = y + audio_args["passthru"][..., 0]
            yi = jnp.clip(jnp.round(y), -32768, 32767).astype(jnp.int16)
            return (yi, secam_tail) if secam_tail is not None else yi

        out_i = y
        out_q = yq if yq is not None else jnp.zeros_like(out_i)

        def fm_args(d, fw, st_):
            if fw is not None:
                return audio_synth.fm_prepare(
                    fw, st_, nlines, d["held"], d["xa"], d["lens_off"],
                    d["offq"], d["offr"], d["col0"], d["ctab"],
                    d["stab"], d["cyc_base"])
            return (d["seg_val"], d["seg_base"], d["seg_col"], d["c0"],
                    d["s0"], d["cyc0"])

        fm_xa_next = None
        if self.fm_statics is not None:
            d = audio_args["fm_mono"]
            if self.fm_dev_held:
                from .audio.chain import _LIM_HIST
                held = audio_synth.held_device(self.audio.fm_mono,
                                               d["pcm"], _LIM_HIST)
                fmargs, fm_xa_next = audio_synth.fm_prepare(
                    self.fm_win, self.fm_statics, nlines, held,
                    d["xa"], d["lens_off"], d["offq"], d["offr"],
                    d["col0"], d["ctab"], d["stab"], d["cyc_base"],
                    adv=d["adv"])
            else:
                fmargs = fm_args(d, self.fm_win, self.fm_statics)
            out_i, out_q = audio_synth.fm_add(
                self.fm_statics, out_i, out_q, *fmargs)
        if self.fm_exact is not None:
            # host-exact audio carrier for FM-video modes, packed
            # (i & 0xFFFF) | (q << 16) per sample
            fx = audio_args["fm_exact"]
            out_i = out_i + (((fx & 0xFFFF) ^ 0x8000) - 0x8000
                             ).astype(jnp.float32)
            out_q = out_q + (fx >> 16).astype(jnp.float32)
        if self.fm_right_statics is not None:
            pp = audio_args["a2_pilot"]
            phi_extra = audio_synth.a2_pilot_phase(
                self.a2_statics, pp["c1"], pp["s1"], pp["c2"], pp["s2"],
                pp["base_phase"])
            out_i, out_q = audio_synth.fm_add(
                self.fm_right_statics, out_i, out_q,
                *fm_args(audio_args["fm_right"], self.fm_right_win,
                         self.fm_right_statics), phi_extra)
        if self.am_statics is not None:
            am = audio_args["am_mono"]
            out_i, out_q = audio_synth.am_add(
                self.am_statics, out_i, out_q, am["seg_val"],
                am["seg_col"], am["c0"], am["s0"], am["cyc0"])
        nicam_dsym = None
        if self.nicam_statics is not None:
            from .audio import nicam_dev as _nd
            nc = audio_args["nicam"]
            signs_i, signs_q, nicam_dsym = _nd.signs_device(
                self.nicam_dev_statics, nc["pcm"], nc["dsym_in"],
                nc["meta"][0], nc["meta"][1], nc["meta"][2])
            out_i, out_q = audio_synth.nicam_add(
                self.nicam_statics, out_i, out_q, signs_i,
                signs_q, nc["offq"], nc["offr"], nc["cc_off"],
                audio_args["nicam_k0mod"])
        if self.dance_statics is not None:
            dc = audio_args["dance"]
            out_i, out_q = audio_synth.nicam_add(
                self.dance_statics, out_i, out_q, dc["signs_i"],
                dc["signs_q"], dc["offq"], dc["offr"], dc["cc_off"],
                audio_args["dance_k0mod"])

        fm_carry = None
        if self.fm_video_statics is not None:
            from .rf import ops as rf_ops
            tri = None
            if self._fm_ed_frame is not None:
                tri = jnp.asarray(np.tile(
                    self._fm_ed_frame.astype(np.int32),
                    (self.frames_per_block, 1)))
            out_i, out_q, fm_carry = rf_ops.fm_video_modulate(
                self.fm_video_statics, out_i, audio_args["fm_r0"], tri)

        if self.conf.swap_iq:
            out_i, out_q = out_q, out_i

        if self.offset_statics is not None:
            from .rf import ops as rf_ops
            out_i, out_q = rf_ops.offset_rotate(
                self.offset_statics, out_i, out_q,
                audio_args["off_c0"], audio_args["off_s0"],
                audio_args["off_nz"], audio_args["off_k"])

        # int16 IQ pairs packed as little-endian int32 (I low, Q high):
        # a flat [n, 2] int16 interleave forces XLA into T(1,128)-tiled
        # copies + a 1/128-lane-efficiency store pass; the packed [B, W]
        # int32 store fuses into the preceding elementwise chain.  Hosts
        # recover interleaved int16 with .view(np.int16).
        # int16 WRAP, not saturate: every reference mix into the line
        # buffer is a C `int16_t +=` (services, audio carriers,
        # src/video.c:3261-3450), so an over-range sum wraps.  In-range
        # content (everything the reference's level plan produces, bar
        # the SiS warm-up spill line) is unaffected.
        wrap = lambda v: ((v + 0x8000) & 0xFFFF) - 0x8000
        ii = wrap(jnp.round(out_i).astype(jnp.int32))
        qq = wrap(jnp.round(out_q).astype(jnp.int32))

        if self.passthru is not None:
            # the reference adds the passthru stream with plain int16
            # `+=` — overflow WRAPS, it does not saturate
            # (src/video.c:3517-3541); two full-scale channels exceed
            # int16 regularly, so wrap semantics are part of the output.
            pt = audio_args["passthru"].astype(jnp.int32)
            ii = wrap(ii + pt[..., 0])
            qq = wrap(qq + pt[..., 1])
        iq = (ii & 0xFFFF) | (qq << 16)
        aux = tuple(a for a in (fm_carry, fm_xa_next, secam_tail,
                                nicam_dsym)
                    if a is not None)
        return (iq, *aux) if aux else iq

    # ------------------------------------------------------------------
    # Argument transport: every host->device RPC through the runtime has
    # a ~0.5 ms floor, so the per-block numpy leaves of the audio-args
    # pytree are packed into THREE buffers (f32/i32/i16) uploaded as
    # single puts; _step_impl unpacks them with static slices.
    _PACK_CODES = {
        np.dtype(np.float32): ("f32", None),
        np.dtype(np.float64): ("f32", None),
        np.dtype(np.int32): ("i32", None),
        np.dtype(np.int64): ("i32", None),
        np.dtype(np.int16): ("i16", None),
        np.dtype(np.uint8): ("i16", "uint8"),
        np.dtype(np.bool_): ("i16", "bool"),
    }
    _PACK_NP = {"f32": np.float32, "i32": np.int32, "i16": np.int16}

    def _pack_args(self, args):
        leaves, treedef = jax.tree_util.tree_flatten(args)
        parts = {"f32": [], "i32": [], "i16": []}
        spec = []
        dev = []
        for lf in leaves:
            if isinstance(lf, np.ndarray):
                code, restore = self._PACK_CODES[lf.dtype]
                spec.append((code, lf.shape, restore))
                parts[code].append(
                    lf.ravel().astype(self._PACK_NP[code], copy=False))
            elif isinstance(lf, (bool, int, np.integer)):
                spec.append(("i32", (), None))
                parts["i32"].append(np.array([lf], dtype=np.int32))
            elif isinstance(lf, float):
                spec.append(("f32", (), None))
                parts["f32"].append(np.array([lf], dtype=np.float32))
            else:
                spec.append(("dev", None, None))
                dev.append(lf)
        if self._arg_spec is None:
            self._arg_spec = spec
            self._arg_treedef = treedef
        elif spec != self._arg_spec or treedef != self._arg_treedef:
            raise RuntimeError("audio-args structure changed between "
                               "blocks (would retrace)")
        bufs = tuple(
            np.concatenate(parts[c]) if parts[c]
            else np.zeros(0, self._PACK_NP[c])
            for c in ("f32", "i32", "i16"))
        return tuple(dev), bufs

    def _unpack_args(self, dev, bufs):
        """Traced: rebuild the audio-args pytree from the packed
        buffers."""
        offs = {"f32": 0, "i32": 0, "i16": 0}
        bufd = {"f32": bufs[0], "i32": bufs[1], "i16": bufs[2]}
        di = iter(dev)
        leaves = []
        for code, shape, restore in self._arg_spec:
            if code == "dev":
                leaves.append(next(di))
                continue
            n = int(np.prod(shape)) if shape else 1
            a = bufd[code][offs[code]: offs[code] + n]   # static slice
            offs[code] += n
            a = a.reshape(shape)
            if restore == "bool":
                a = a.astype(jnp.bool_)
            elif restore == "uint8":
                a = a.astype(jnp.uint8)
            leaves.append(a)
        return jax.tree_util.tree_unflatten(self._arg_treedef, leaves)

    def _audio_args(self, block_no: int) -> dict:
        """Host audio-rate computation -> per-block argument pytree
        (numpy leaves are packed for transport; jax.Array leaves pass
        through)."""
        p = self.params
        nlines = self.frames_per_block * p.lines
        k0 = block_no * nlines
        # With the video filter enabled the audio process consumes the
        # filter's one-line-delayed stream, so the audio timeline runs one
        # line ahead of the output line it lands on (see the reference's
        # line-window layout, src/video.c:4675-4688).  The vresampler
        # adds one more line of window lag (and its warm-up line is
        # swallowed, so the audio stream starts one line early).
        a_k0 = k0 + (1 if self.conf.vfilter else 0) \
            + (1 if self.resampler is not None else 0)
        args = {}
        if self.raw_bb is not None:
            args["rawbb"] = self.raw_bb.block(
                k0 - 1, nlines + 1 + self.halo_after)
        if self.passthru is not None:
            args["passthru"] = self.passthru.block(
                k0, nlines, self.out_params.width)
        if self.services:
            claimed = np.zeros(nlines + 1 + self.halo_after, dtype=bool)
            args["services"] = tuple(
                dict(svc.block_arrays(k0 - 1,
                                      nlines + 1 + self.halo_after,
                                      claimed))
                for svc in self.services)
        if self.fm_statics is not None:
            if self.fm_dev_held:
                if not self._fm_xa_started \
                        and block_no not in self._fm_xa:
                    # first encoded block may start mid-stream (the
                    # multichip tests encode block 1 directly): seed
                    # the anchor with the host-exact pre-span sum
                    i0b = self.audio.fm_dev_i0(a_k0, self.fm_win)
                    self._fm_xa[block_no] = [i0b, jnp.int32(
                        self.audio.fm_dev_seed_xa(
                            self.audio.fm_mono, i0b, self.fm_win))]
                self._fm_xa_started = True
                if block_no not in self._fm_xa \
                        or self._fm_xa[block_no][1] is None:
                    raise RuntimeError(
                        "FM blocks must be encoded sequentially (no "
                        f"device phase anchor for block {block_no})")
                exp_i0, xa = self._fm_xa[block_no]
                dct, i0, i0n = self.audio.fm_compact_block_dev(
                    self.audio.fm_mono, a_k0, nlines, self.fm_win, xa)
                if exp_i0 is not None and exp_i0 != i0:
                    raise RuntimeError(
                        "FM device anchor mismatch (expected i0 "
                        f"{exp_i0}, got {i0})")
                self._fm_xa[block_no + 1] = [i0n, None]
                self._fm_xa.pop(block_no - 2, None)
                args["fm_mono"] = dct
            else:
                args["fm_mono"] = (
                    self.audio.fm_compact_block(self.audio.fm_mono, a_k0,
                                                nlines, self.fm_win)
                    if self.fm_win is not None else
                    self.audio.fm_block(self.audio.fm_mono, a_k0,
                                        nlines))
        if self.fm_exact is not None:
            W = self.out_params.width
            n0, n1 = a_k0 * W, (a_k0 + nlines) * W
            fx = self.fm_exact
            if n0 < fx.n:
                fx.reset()
            if fx.n < n0:   # skipped warm-up samples: advance silently
                gap = self.audio.fm_exact_stream(self.audio.fm_mono,
                                                 fx.n, n0)
                fx.process(gap, fx.n, emit=False)
            stream = self.audio.fm_exact_stream(self.audio.fm_mono,
                                                n0, n1)
            args["fm_exact"] = fx.process(stream, n0).reshape(nlines, W)
        if self.fm_right_statics is not None:
            args["fm_right"] = (
                self.audio.fm_compact_block(self.audio.fm_right, a_k0,
                                            nlines, self.fm_right_win)
                if self.fm_right_win is not None else
                self.audio.fm_block(self.audio.fm_right, a_k0, nlines))
            args["a2_pilot"] = self.audio.pilot_block(a_k0, nlines)
        if self.am_statics is not None:
            args["am_mono"] = self.audio.am_block(self.audio.am_mono,
                                                  a_k0, nlines)
        if self.nicam_statics is not None:
            nc = self.audio.nicam_device_block(
                a_k0, nlines, self.nicam_statics, self.nicam_dev_statics,
                self.nicam_dev_fn)
            if isinstance(nc["dsym_in"], (int, np.integer)):
                nc["dsym_in"] = self._nicam_zero
            args["nicam"] = nc
            # static per trace; constant when nlines % period == 0
            args["nicam_k0mod"] = a_k0 % self.nicam_statics.period
        if self.dance_statics is not None:
            args["dance"] = self.audio.dance_block(a_k0, nlines,
                                                   self.dance_statics)
            args["dance_k0mod"] = a_k0 % self.dance_statics.period
        if self.fm_video_statics is not None:
            if block_no not in self._fm_r:
                raise RuntimeError(
                    "FM-modulated blocks must be encoded sequentially "
                    f"(no phase carry for block {block_no})")
            args["fm_r0"] = self._fm_r[block_no]
        if self.secam_statics is not None:
            from .video import secam as secam_mod
            # the per-line metadata is periodic in the stream line with
            # period 6 frames (dr parity: 2, carrier phase sign: 3);
            # block 0 is special (clamped pre-stream rows)
            key = k0 % (6 * self.conf.lines) if k0 > 0 else -1
            sm = self._secam_meta_cache.get(key)
            if sm is not None:
                self._secam_meta_cache.move_to_end(key)
            if sm is None:
                nm = secam_mod.line_meta(p, k0 - 1,
                                         nlines + 1 + self.halo_after,
                                         self.vframe_y, self.source.height)
                B = len(nm["dr"])
                ks = (k0 - 1) + np.arange(B)
                nm["valid"] = (ks >= 0).astype(np.float32)
                # serial IIR chain over active rows (incl. field-ID
                # bottles) in stream order, and the row whose end-state
                # seeds the next block (stream line k0 + nlines - 1)
                iir_prev = np.full(B, -1, np.int32)
                snap_row = -1
                last = -1
                for j in range(B):
                    if nm["active"][j] > 0 and ks[j] >= 0:
                        iir_prev[j] = last
                        last = j
                        if j < nlines:
                            snap_row = j
                nm["iir_prev"] = iir_prev
                nm["snap_row"] = np.int32(snap_row)
                sm = (nm, {k: jnp.asarray(v) for k, v in nm.items()})
                while len(self._secam_meta_cache) > 64:
                    self._secam_meta_cache.popitem(last=False)
                self._secam_meta_cache[key] = sm
            nm, jm = sm
            args["secam"] = jm
            if self.secam_device:
                if block_no not in self._secam_z:
                    raise RuntimeError(
                        "SECAM blocks must be encoded sequentially "
                        f"(no IIR carry for block {block_no})")
                args["secam_z0"] = self._secam_z[block_no]
            else:
                if block_no not in self._secam_iir:
                    raise RuntimeError(
                        "SECAM blocks must be encoded sequentially "
                        f"(no IIR state for block {block_no})")
                self._device_rgb(block_no)   # refresh host u/v planes
                u, v = self._rgb_host_uv
                if not hasattr(self, "_secam_host_cache"):
                    self._secam_host_cache = {}
                chroma, snap, _ = secam_mod.chroma_block_host(
                    self.secam_statics, self.out_params.width, nm, u, v,
                    k0 - 1, k0 + nlines - 1, self._secam_iir[block_no],
                    cache=self._secam_host_cache)
                self._secam_iir[block_no + 1] = snap
                self._secam_iir.pop(block_no - 2, None)
                args["secam_add"] = secam_mod.carrier_addin_host(
                    self.secam_statics, self.out_params.width, nm,
                    chroma, self._secam_lut)
        if self.offset_statics is not None:
            from .rf import ops as rf_ops
            c0, s0, nz = rf_ops.offset_rotation(
                self.conf.offset, self.params.sample_rate, k0,
                self.out_params.width, nlines)
            args["off_c0"] = c0
            args["off_s0"] = s0
            args["off_nz"] = nz
            args["off_k"] = np.maximum(
                np.arange(k0, k0 + nlines), 0).astype(np.int32)
        return args

    def encode_block_device(self, block_no: int):
        """Synthesise one block of frames_per_block frames; returns a
        device array: int16 [nlines, W] for real output modes, or packed
        int32 [nlines, W] (I in the low half-word, Q in the high) for
        complex/audio modes — see encode_block for the host int16 view."""
        rgb = self._device_rgb(block_no)
        m = self._block_meta(block_no)
        first = jnp.float32(0.0 if block_no == 0 else 1.0)
        audio_args = self._audio_args(block_no)
        dev, bufs = self._pack_args(audio_args)
        out = self._step(rgb, m["base"], m["nxt"], m["burst"],
                         m["vswitch"], m["vy"], m["al"], m["ar"],
                         m["cos0"], m["sin0"], m["lut_row"], m["fsc"],
                         m["fscf"], m["prv"], first, dev, bufs)
        if isinstance(out, tuple):
            out, *aux = out
            if self.fm_video_statics is not None:
                # carry stays a device scalar: no host sync, and the
                # next block's dispatch chains on it asynchronously
                self._fm_r[block_no + 1] = aux.pop(0)
                self._fm_r.pop(block_no - 2, None)   # keep it bounded
            if self.fm_dev_held:
                self._fm_xa[block_no + 1][1] = aux.pop(0)
            if self.secam_device:
                self._secam_z[block_no + 1] = aux.pop(0)
                self._secam_z.pop(block_no - 2, None)
            if self.nicam_statics is not None:
                self.audio.nicam_dev_dsym(aux.pop(0))
        return out

    def _secam_uv(self, rgb):
        """SECAM-scaled chroma lookups (src/video.c:3944-3953): u/v are
        FM frequency offsets in deviation units."""
        from .config.standards import (SECAM_CB_FREQ, SECAM_CR_FREQ,
                                       SECAM_FM_DEV, SECAM_FM_FREQ)
        st = self.statics
        f = rgb.astype(jnp.float32) * (1.0 / 255.0)
        if st.gamma != 1.0:
            f = jnp.power(jnp.maximum(f, 1e-9), 1.0 / st.gamma)
        r, g, b = f[..., 0], f[..., 1], f[..., 2]
        y = r * st.rw + g * st.gw + b * st.bw
        u = (b - y) * st.eu
        v = (r - y) * st.ev
        u = (u + (SECAM_CB_FREQ - SECAM_FM_FREQ)) / SECAM_FM_DEV
        v = (v + (SECAM_CR_FREQ - SECAM_FM_FREQ)) / SECAM_FM_DEV
        q = lambda a: jnp.round(jnp.clip(a, -1.0, 1.0) * 32767.0)
        return q(u), q(v)

    # ------------------------------------------------------------------
    # Stream checkpoint/resume (beyond the reference, SURVEY §5: the
    # cross-block carries — FM phases, IIR/scan carries, CA counters,
    # service schedulers, audio anchors — are all explicit state).
    def checkpoint(self, next_block: int) -> bytes:
        """Serialise the stream state so a FRESH Encoder constructed
        with the same arguments can `load_checkpoint` and continue at
        `next_block` bit-identically.  Requires blocks [0, next_block)
        to have been encoded and an index-addressable (stateless)
        source."""
        import copy
        import pickle
        if self.passthru is not None:
            raise NotImplementedError(
                "checkpoint with --passthru is not supported")
        if not getattr(self.source, "stateless", False):
            raise NotImplementedError(
                "checkpoint requires an index-addressable source")
        b = int(next_block)
        st: dict = {"version": 1, "next_block": b}
        if self.fm_video_statics is not None:
            st["fm_r"] = np.asarray(self._fm_r[b])
        if self.fm_dev_held:
            exp, xa = self._fm_xa[b]
            if xa is None:
                raise RuntimeError("encode block "
                                   f"{b - 1} before checkpointing")
            st["fm_xa"] = (exp, np.asarray(xa))
        if self.secam_statics is not None:
            if self.secam_device:
                st["secam_z"] = np.asarray(self._secam_z[b])
            else:
                st["secam_iir"] = self._secam_iir[b]
        for nm in ("fm_exact", "fm_video_exact"):
            fx = getattr(self, nm, None)
            if fx is not None:
                st[nm] = (fx._state.copy(), fx.n)
        st["audio"] = self.audio.state_dict()
        svc = []
        for s in self.services:
            if hasattr(s, "ckpt_state"):
                svc.append(("m", s.ckpt_state()))
            else:
                attrs = getattr(s, "_CKPT_ATTRS", ())
                if getattr(s, "raw", None) is not None:
                    raise NotImplementedError(
                        "checkpoint with a raw: packet stream")
                svc.append(("a", {a: copy.deepcopy(getattr(s, a))
                                  for a in attrs}))
        st["services"] = svc
        return pickle.dumps(st)

    def load_checkpoint(self, blob: bytes) -> int:
        """Restore checkpoint() state into this (freshly constructed,
        identically configured) encoder; returns the block number to
        encode next."""
        import pickle
        st = pickle.loads(blob)
        b = st["next_block"]
        if "fm_r" in st:
            self._fm_r = {b: jnp.asarray(st["fm_r"])}
        if "fm_xa" in st:
            exp, xa = st["fm_xa"]
            self._fm_xa = {b: [exp, jnp.asarray(xa)]}
            self._fm_xa_started = True
        if "secam_z" in st:
            self._secam_z = {b: jnp.asarray(st["secam_z"])}
        if "secam_iir" in st:
            self._secam_iir = {b: st["secam_iir"]}
        for nm in ("fm_exact", "fm_video_exact"):
            if nm in st:
                fx = getattr(self, nm)
                state, n = st[nm]
                fx._state[:] = state
                fx.n = n
        self.audio.load_state(st["audio"])
        for s, (kind, data) in zip(self.services, st["services"]):
            if kind == "m":
                s.ckpt_load(data)
            else:
                for a, v in data.items():
                    setattr(s, a, v)
        return b

    @property
    def frame_samples(self) -> int:
        """Output samples per frame (at sample_rate, post-resampler)."""
        return self.out_params.frame_samples

    def encode_block(self, block_no: int) -> np.ndarray:
        """Host int16 samples for one block: [n] for real output modes,
        interleaved [n, 2] I/Q for complex/audio modes."""
        return self.collect_block(block_no,
                                  self.encode_block_device(block_no))

    def collect_block(self, block_no: int, dev) -> np.ndarray:
        """Device handle -> host int16 samples.  Splitting dispatch
        (encode_block_device) from collection lets a caller overlap the
        D2H copy of block b with the device compute of block b+1."""
        a = np.asarray(dev)
        if self.fm_video_exact is not None:
            # device produced the pre-FM composite; run the reference's
            # exact int32 FM recurrence on the host (frequency 0)
            comp = a.reshape(-1).view(np.int16)[0::2]
            n = self.frames_per_block * self.conf.lines * \
                self.out_params.width
            if self._fm_ed_frame is not None:
                # frame-locked triangle added with int16 WRAP semantics
                # (src/video.c:2303) before the FM recurrence
                t = np.tile(self._fm_ed_frame.reshape(-1),
                            self.frames_per_block)
                comp = (((comp.astype(np.int32) + t + 0x8000) & 0xFFFF)
                        - 0x8000).astype(np.int16)
            fx = self.fm_video_exact
            n0 = block_no * n
            if n0 < fx.n:
                fx.reset()
            if fx.n < n0:
                raise RuntimeError("FM blocks must be encoded "
                                   "sequentially")
            iq = fx.process(np.ascontiguousarray(comp), n0)
            return iq.view(np.int16).reshape(-1, 2)
        if a.dtype == np.int32:
            return a.reshape(-1).view(np.int16).reshape(-1, 2)
        return a.reshape(-1)

    def block_audio_pcm(self, block_no: int):
        """32 kHz int16 stereo pairs consumed during this block
        (volume-scaled, post-Syster-inversion) — the sink audio
        side-channel tap the reference feeds from the audio process
        (src/video.c:3306-3310, consumed by HackDAC/FL2K sinks).
        None for modes without audio."""
        if not self.has_audio:
            return None
        a = self.audio
        n = self.frames_per_block * self.conf.lines * \
            self.out_params.width
        p0 = block_no * n * a.A // a.S
        p1 = (block_no + 1) * n * a.A // a.S
        return a._pcm(p0, p1 - p0).astype(np.int16)

    def encode_frame(self, frame_no: int) -> np.ndarray:
        """Single-frame convenience API (frames_per_block must be 1)."""
        assert self.frames_per_block == 1
        return self.encode_block(frame_no)

    # back-compat aliases
    _encode_frame_dev = encode_block_device
    encode_frame_device = encode_block_device

    def iter_frames(self, n_frames: int) -> Iterator[np.ndarray]:
        assert self.frames_per_block == 1
        for f in range(n_frames):
            yield self.encode_frame(f)


class _OrientedSource:
    """Apply the mode's frame orientation (rotate 90/180/270 + flips)
    at frame read, like the reference (src/video.c:4881-4885)."""

    def __init__(self, inner, orientation: int):
        self.inner = inner
        self.stateless = getattr(inner, "stateless", False)
        self.orientation = orientation
        w, h = inner.width, inner.height
        if (orientation & 3) in (1, 3):
            w, h = h, w
        self.width, self.height = w, h
        self.interlaced = getattr(inner, "interlaced", 0)
        self._cache: tuple | None = None

    def read_video(self, frame_no: int) -> np.ndarray:
        rgb = self.inner.read_video(frame_no)
        if self._cache is not None and self._cache[0] is rgb:
            return self._cache[1]
        from .av import frame_ops
        out = frame_ops.rotate(rgb, self.orientation & 3)
        if self.orientation & 4:
            out = frame_ops.hflip(out)
        if self.orientation & 8:
            out = frame_ops.vflip(out)
        out = np.ascontiguousarray(out)
        self._cache = (rgb, out)
        return out

    def read_audio(self, start: int, count: int) -> np.ndarray:
        return self.inner.read_audio(start, count)

    def read_cc608(self, frame_no: int):
        f = getattr(self.inner, "read_cc608", None)
        return f(frame_no) if f is not None else (0, 0)

    def eof(self, frame_no: int) -> bool:
        f = getattr(self.inner, "eof", None)
        return bool(f(frame_no)) if f is not None else False

    def close(self) -> None:
        if hasattr(self.inner, "close"):
            self.inner.close()


class _RawBBReader:
    """Looping int16 raw-baseband line source (src/video.c:2406-2445).

    Absolute sample n of the stream maps to file sample n mod T — the
    reference freads and rewinds at EOF with no line alignment, so the
    file cycles at sample granularity."""

    def __init__(self, path: str, width: int, rbb_blanking: int,
                 rbb_white: int, blanking_level: int, white_level: int):
        self.data = np.fromfile(path, dtype=np.int16)
        if len(self.data) == 0:
            raise ValueError(f"{path}: empty raw baseband file")
        self.W = width
        self.num = white_level - blanking_level
        self.den = rbb_white - rbb_blanking
        self.rbb_blanking = rbb_blanking
        self.blanking_level = blanking_level

    def block(self, k0: int, nlines: int) -> np.ndarray:
        n0 = max(k0, 0) * self.W
        idx = (n0 + np.arange(nlines * self.W, dtype=np.int64)) \
            % len(self.data)
        raw = self.data[idx].astype(np.int64)
        # C integer division truncates toward zero
        num = (raw - self.rbb_blanking) * self.num
        q = np.sign(num) * (np.abs(num) // abs(self.den)) * np.sign(self.den)
        out = self.blanking_level + q
        # int16 assignment wraps
        out = ((out + 0x8000) & 0xFFFF) - 0x8000
        block = out.reshape(nlines, self.W).astype(np.float32)
        if k0 < 0:
            block[:-k0] = block[0]   # halo before stream start: line 0
        return block


class _PassthruReader:
    """Sequential int16 IQ add-stream (src/video.c:3517-3541): zeros
    after EOF (the reference stops adding)."""

    def __init__(self, path: str):
        self.f = open(path, "rb")
        self.eof = False

    def block(self, k0: int, nlines: int, width: int) -> np.ndarray:
        n = nlines * width
        out = np.zeros((n, 2), dtype=np.float32)
        if not self.eof:
            raw = np.frombuffer(self.f.read(n * 4), dtype=np.int16)
            if len(raw) < n * 2:
                self.eof = True
                # a partial final line is dropped, like the reference's
                # short fread (src/video.c:3529-3532)
                raw = raw[: (len(raw) // (width * 2)) * width * 2]
            out[: len(raw) // 2] = raw.reshape(-1, 2)
        return out.reshape(nlines, width, 2)
