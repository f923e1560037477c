"""hacktv_tpu — TPU-native analogue television signal synthesizer.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of
fsphil/hacktv: PAL/NTSC/SECAM/MAC raster synthesis, VBI data services,
audio subcarriers, conditional-access scramblers and the RF chain, computed
as batched whole-frame array programs instead of a sample-serial loop.
"""

from .config import REGISTRY, VidConfig, get_mode, list_modes  # noqa: F401
from .encoder import Encoder  # noqa: F401
from .rational import Rational  # noqa: F401

__version__ = "0.1.0"
