"""Pallas TPU kernel for the stream FIR (video output filter).

The encoder's `stream_conv` evaluates a cross-line FIR over the flat
sample stream as ntaps shifted-slice FMAs (src/fir.c:529-615 — the VSB
"scomplex" filter is 51 complex taps, i.e. 102 passes).  XLA fuses the
chain but still walks HBM once per few taps; this kernel stages each
chunk of the stream in VMEM once and runs all taps (both complex
components) from registers — one HBM read + one write per chunk.

The stream is processed in lane-aligned flat chunks of C samples
(chunk boundaries need not align to line boundaries); each grid step
sees its chunk plus an (ntaps-1)-sample halo row built host-side by a
pure reshape/slice of the padded stream.  f32 accumulation order is
fixed by the kernel (tap order), identical across compilations.

Falls back to interpret mode off-TPU so the CPU test suite covers the
same arithmetic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_C = 2048              # chunk: multiple of the 128-lane register;
                       # small enough that the ntaps shifted VMEM
                       # windows fit scoped vmem (each unaligned
                       # lane shift materialises a copy)


def _kernel_cplx(x_ref, h_ref, yi_ref, yq_ref, *, taps_r, taps_i, C):
    xx = jnp.concatenate([x_ref[...], h_ref[...]], axis=1)
    nt = len(taps_r)
    acc_i = np.float32(taps_r[nt - 1]) * xx[:, 0:C]
    acc_q = np.float32(taps_i[nt - 1]) * xx[:, 0:C]
    for t in range(1, nt):
        w = xx[:, t:t + C]
        acc_i = acc_i + np.float32(taps_r[nt - 1 - t]) * w
        acc_q = acc_q + np.float32(taps_i[nt - 1 - t]) * w
    yi_ref[...] = acc_i
    yq_ref[...] = acc_q


def _kernel_real(x_ref, h_ref, y_ref, *, taps_r, C):
    xx = jnp.concatenate([x_ref[...], h_ref[...]], axis=1)
    nt = len(taps_r)
    acc = np.float32(taps_r[nt - 1]) * xx[:, 0:C]
    for t in range(1, nt):
        acc = acc + np.float32(taps_r[nt - 1 - t]) * xx[:, t:t + C]
    y_ref[...] = acc


@functools.partial(jax.jit, static_argnames=("n", "nt", "call"))
def _run(xs, n, nt, call):
    return call(xs)


def stream_fir(xs: jnp.ndarray, taps_r: np.ndarray,
               taps_i: np.ndarray | None, n: int):
    """FIR over the flat stream: out[k] = sum_t taps[nt-1-t] *
    xs[k + t] for k in [0, n) (xs has n + nt - 1 samples, the same
    alignment as the encoder's shifted-slice stream_conv).  Returns y
    (and yq when taps_i is given)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nt = len(taps_r)
    assert nt - 1 <= _C
    # Mosaic blocks need 8 sublanes: tile 8 chunks per grid step
    R = -(-(-(-n // _C)) // 8) * 8
    xp = jnp.pad(xs, (0, (R + 1) * _C - xs.shape[0]))
    x2 = xp[: R * _C].reshape(R, _C)
    halo = xp[_C: (R + 1) * _C].reshape(R, _C)[:, : nt - 1]
    hpad = -(nt - 1) % 128
    if hpad:
        halo = jnp.pad(halo, ((0, 0), (0, hpad)))

    interp = jax.default_backend() != "tpu"
    spec_x = pl.BlockSpec((8, _C), lambda i: (i, 0))
    spec_h = pl.BlockSpec((8, halo.shape[1]), lambda i: (i, 0))
    out_spec = pl.BlockSpec((8, _C), lambda i: (i, 0))
    if taps_i is not None:
        kern = functools.partial(
            _kernel_cplx, taps_r=np.asarray(taps_r, np.float32),
            taps_i=np.asarray(taps_i, np.float32), C=_C)
        yi, yq = pl.pallas_call(
            kern,
            grid=(R // 8,),
            in_specs=[spec_x, spec_h],
            out_specs=[out_spec, out_spec],
            out_shape=[jax.ShapeDtypeStruct((R, _C), jnp.float32)] * 2,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=interp,
        )(x2, halo)
        return yi.reshape(-1)[:n], yq.reshape(-1)[:n]
    kern = functools.partial(
        _kernel_real, taps_r=np.asarray(taps_r, np.float32), C=_C)
    y = pl.pallas_call(
        kern,
        grid=(R // 8,),
        in_specs=[spec_x, spec_h],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((R, _C), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interp,
    )(x2, halo)
    return y.reshape(-1)[:n]
