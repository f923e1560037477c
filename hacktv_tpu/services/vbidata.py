"""Batched VBI symbol rendering.

The reference pre-computes per-symbol pulse-shaped sample runs and adds
them per set bit (src/vbidata.c).  Here each service's symbol set becomes
a dense basis matrix [n_symbols, width(+margins)] and rendering a block of
lines is one matmul: waveform = bits @ basis — MXU work, no per-bit logic.

Basis values are integer-rounded exactly like the reference LUTs, so the
waveforms match bit-for-bit (up to the final f32 sum, which is exact for
these magnitudes).
"""

from __future__ import annotations

import math

import numpy as np

from ..ops.shapes import raised_cosine, rc_window


def basis_rc(nsymbols: int, width: int, level: int, bwidth: float,
             beta: float, offset: float, margin: int = 0) -> np.ndarray:
    """Raised-cosine symbol basis (src/vbidata.c:83-121 `_vbidata_init`).

    Row b covers samples [-margin, width): symbol b's pulse is the
    raised-cosine centred at `offset + bwidth*b`, sampled at integers and
    rounded.  `margin` extends rows to the left for pulses that spill into
    the previous line.
    """
    rows = np.zeros((nsymbols, margin + width), dtype=np.float32)
    x = np.arange(-margin, width, dtype=np.float64)
    for b in range(nsymbols):
        t = -bwidth * b - offset
        rows[b] = np.round(raised_cosine((t + x) / bwidth, beta, 1.0) * level)
    return rows


def basis_step(nsymbols: int, width: int, level: int, swidth: float,
               rise: float, offset: float, margin: int = 0) -> np.ndarray:
    """Flat-top symbol basis with integrated-raised-cosine edges
    (src/vbidata.c:143-165 `_vbidata_init_step`)."""
    rows = np.zeros((nsymbols, margin + width), dtype=np.float32)
    x = np.arange(-margin, width, dtype=np.float64)
    for b in range(nsymbols):
        rows[b] = np.round(
            rc_window(x, offset + swidth * b, swidth, rise) * level)
    return rows


def bytes_to_bits(data: bytes | np.ndarray, nbits: int,
                  lsb_first: bool = True) -> np.ndarray:
    """Unpack bytes into a float32 bit vector of length nbits."""
    arr = np.frombuffer(bytes(data), dtype=np.uint8) \
        if isinstance(data, (bytes, bytearray)) else np.asarray(data, np.uint8)
    bits = np.unpackbits(arr, bitorder="little" if lsb_first else "big")
    return bits[:nbits].astype(np.float32)


def render(bits, basis):
    """bits [B, n] @ basis [n, W] at full f32 precision.  TPU matmuls
    default to bfloat16 inputs, which rounds the integer-valued pulse
    sums by up to ~2^6 — force the HIGHEST precision path."""
    import jax
    import jax.numpy as jnp
    return jnp.matmul(bits, jnp.asarray(basis),
                      precision=jax.lax.Precision.HIGHEST)


def device_unpack_bits(packed, nbits: int):
    """uint8 [B, nbytes] (LSB-first) -> f32 [B, nbits] on device.  Bit
    rows travel host->device packed (a [B, 360] f32 teletext block is
    28 MB/block; packed it is under 1 MB)."""
    import jax.numpy as jnp
    bits = ((packed[:, :, None] >> jnp.arange(8, dtype=jnp.uint8)) & 1)
    return bits.reshape(packed.shape[0], -1)[:, :nbits] \
        .astype(jnp.float32)
