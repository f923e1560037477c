"""hacktv_tpu — TPU-native analogue television signal synthesizer.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of
fsphil/hacktv: PAL/NTSC/SECAM/MAC raster synthesis, VBI data services,
audio subcarriers, conditional-access scramblers and the RF chain, computed
as batched whole-frame array programs instead of a sample-serial loop.
"""

import os as _os

import jax as _jax

# Persistent compilation cache: TPU compiles of the fused synth graphs are
# expensive (tens of seconds); cache them across processes.
if not _os.environ.get("HACKTV_TPU_NO_COMPILE_CACHE"):
    _cache = _os.environ.get("JAX_COMPILATION_CACHE_DIR",
                             _os.path.expanduser("~/.cache/hacktv_tpu_xla"))
    try:
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

from .config import REGISTRY, VidConfig, get_mode, list_modes  # noqa: F401
from .encoder import Encoder  # noqa: F401
from .rational import Rational  # noqa: F401


def create_encoder(mode, sample_rate, **kwargs):
    """Factory returning the right encoder class for a mode: `MacEncoder`
    for D/D2-MAC (packet-multiplex raster), `Encoder` otherwise."""
    conf = get_mode(mode) if isinstance(mode, str) else mode
    if conf.mac_mode is not None:
        from .video.mac import MacEncoder
        mac_kw = {k: v for k, v in kwargs.items()
                  if k in ("pixel_rate", "source", "frames_per_block",
                           "scramble_video", "scramble_audio", "eurocrypt",
                           "timestamp")}
        return MacEncoder(conf, sample_rate, **mac_kw)
    return Encoder(conf, sample_rate, **kwargs)


__version__ = "0.1.0"
