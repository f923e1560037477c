"""Top-level encoder: source frames -> device block synthesis -> int16 IQ.

Architectural inversion of the reference's sample-serial line loop
(src/hacktv.c:1579-1587, src/video.c:4867-4952): a whole frame of scan
lines (plus one halo line each side for filter continuity) is synthesised
as a single jitted array program.  The stream-line counter `k` is the only
"state": k=0 is the warm-up line the reference renders and drops, k>=1 maps
to (frame, line) = ((k-1)//lines, (k-1)%lines+1).
"""

from __future__ import annotations

import functools
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config.standards import (ColourMode, Modulation, OutputType, VidConfig,
                               get_mode)
from .video.params import VideoParams
from .video import raster
from .av.testcard import TestCardSource


class Encoder:
    def __init__(self, mode: str | VidConfig, sample_rate: int,
                 pixel_rate: int = 0, source=None):
        conf = get_mode(mode) if isinstance(mode, str) else mode
        self.conf = conf
        self.params = VideoParams.create(conf, sample_rate, pixel_rate)
        p = self.params

        if source is None:
            source = TestCardSource(p.active_width, conf.active_lines)
        self.source = source

        # Frame geometry: test card is generated at the active resolution so
        # there is no crop/offset (src/hacktv.c:1502-1526).
        self.vframe_x = (p.active_width - source.width) // 2
        self.vframe_y = (conf.active_lines - source.height) // 2

        self.statics = raster.make_statics(p, self.vframe_x, source.width)

        self._synth = jax.jit(functools.partial(raster.synth_block,
                                                self.statics))
        self._finish = jax.jit(self._finish_impl)

        # cache per-frame metadata (depends only on frame parity and k
        # modulo carrier cycle; recomputed per frame for now — cheap)
        self._meta_cache: dict = {}

    # ------------------------------------------------------------------
    def _frame_meta(self, frame_no: int):
        """Line metadata for stream lines [k0-1, k0+lines+1) where k0 is the
        first line of `frame_no` (0-based; the reference's frame counter
        starts at 1, handled inside line_meta)."""
        p = self.params
        k0 = frame_no * p.lines
        key = None
        # Metadata is periodic: burst/vswitch depend on frame parity; the
        # carrier phase ph0 on k modulo its cycle in lines.
        cyc = self._carrier_cycle_lines()
        key = (frame_no & 1, k0 % cyc if cyc else 0, frame_no == 0)
        if key in self._meta_cache:
            return self._meta_cache[key]
        meta = p.line_meta(k0 - 1, p.lines + 2,
                           vframe_interlaced=self.source.interlaced,
                           vframe_x=self.vframe_x, vframe_y=self.vframe_y,
                           vframe_w=self.source.width,
                           vframe_h=self.source.height)
        dev = dict(
            base=jnp.asarray(meta["base"]),
            nxt=jnp.asarray(meta["nxt"]),
            burst=jnp.asarray(meta["burst"]),
            vswitch=jnp.asarray(meta["vswitch"]),
            vy=jnp.asarray(meta["vy"]),
            al=jnp.asarray(meta["al"]),
            ar=jnp.asarray(meta["ar"]),
            ph0=jnp.asarray(meta["ph0"].astype(np.int32)),
        )
        self._meta_cache[key] = dev
        return dev

    def _carrier_cycle_lines(self) -> int:
        p = self.params
        if not p.cl_num:
            return 1
        # ph0 repeats when k*width mod cl_num cycles
        import math
        g = math.gcd(p.width, p.cl_num)
        return p.cl_num // g

    # ------------------------------------------------------------------
    def _finish_impl(self, block: jnp.ndarray,
                     first_mask: jnp.ndarray) -> jnp.ndarray:
        """Apply the output video filter over the continuous sample stream
        and quantise to int16.  `block` is [lines+2, width]; the first and
        last lines are halo.  `first_mask` is 0.0 for the first frame of the
        stream (whose leading halo is zero history), else 1.0."""
        p = self.params
        W = p.width
        n = p.lines * W
        block = block.at[0].multiply(first_mask)
        x = block.reshape(-1)

        if p.vfilter_taps is not None:
            ntaps = p.vfilter_taps.shape[0]
            half = ntaps // 2
            xs = x[W - half: W - half + n + ntaps - 1]
            kern = jnp.asarray(p.vfilter_taps[::-1].copy())
            y = jax.lax.conv_general_dilated(
                xs[None, None, :], kern[None, None, :],
                window_strides=(1,), padding="VALID",
                dimension_numbers=("NCH", "OIH", "NCH"))[0, 0]
        else:
            y = x[W: W + n]

        i16 = jnp.clip(jnp.round(y), -32768, 32767).astype(jnp.int16)
        return i16

    # ------------------------------------------------------------------
    def encode_frame(self, frame_no: int) -> np.ndarray:
        """Synthesise one full frame -> int16 [frame_samples] (I channel).

        Complex modes are handled by later stages; for now this covers the
        unmodulated (real) baseband path.
        """
        return np.asarray(self._encode_frame_dev(frame_no))

    def iter_frames(self, n_frames: int) -> Iterator[np.ndarray]:
        for f in range(n_frames):
            yield self.encode_frame(f)

    # device-side variant (no host transfer) — also used for benchmarking
    def _encode_frame_dev(self, frame_no: int):
        rgb = jnp.asarray(self.source.read_video(frame_no))
        meta = self._frame_meta(frame_no)
        block = self._synth(rgb, meta["base"], meta["nxt"], meta["burst"],
                            meta["vswitch"], meta["vy"], meta["al"],
                            meta["ar"], meta["ph0"])
        first = jnp.float32(0.0 if frame_no == 0 else 1.0)
        return self._finish(block, first)

    encode_frame_device = _encode_frame_dev
