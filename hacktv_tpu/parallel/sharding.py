"""Multi-device sharding of the synthesis pipeline.

The output IQ timeline is the "long sequence" of this framework: it is
sharded as contiguous time blocks (one or more frames per device) over a
1-D device mesh.  Per-line synthesis is embarrassingly parallel; the only
cross-block coupling is FIR/resampler state, handled by overlap-save halo
exchange with `lax.ppermute` over ICI — the TPU-native replacement for the
reference's sequential FIR ring buffers (src/fir.c:263-390).

The reference has no distributed layer at all (SURVEY.md section 2.10);
this module is new capability.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_time_mesh(devices=None, axis: str = "t") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def halo_filter(x: jnp.ndarray, taps: jnp.ndarray, mesh: Mesh,
                axis: str = "t") -> jnp.ndarray:
    """Centred FIR over a time-sharded stream with halo exchange.

    `x`: [n_blocks, block_len] — block i is the i-th contiguous time slice
    of the stream; sharded over `axis`.  Devices exchange `half` edge
    samples with both neighbours via ppermute so the stitched result is
    identical to filtering the concatenated stream (zero history at the
    stream ends).
    """
    ntaps = taps.shape[0]
    half = ntaps // 2
    kern = taps[::-1]

    def block_fn(xb):
        # xb: [blocks_per_dev, block_len] local shard
        n = jax.lax.axis_size(axis)
        i = jax.lax.axis_index(axis)
        flat = xb.reshape(-1)

        # halo to send: my first `half` samples go to the left neighbour
        # (they are its lookahead); my last `half` to the right neighbour.
        left_edge = flat[:half]
        right_edge = flat[-half:]

        # receive: from right neighbour its first samples (my lookahead),
        # from left neighbour its last samples (my history).
        lookahead = jax.lax.ppermute(
            left_edge, axis, [(k, (k - 1) % n) for k in range(n)])
        history = jax.lax.ppermute(
            right_edge, axis, [(k, (k + 1) % n) for k in range(n)])

        # zero history/lookahead at the stream boundaries
        history = jnp.where(i == 0, 0.0, history)
        lookahead = jnp.where(i == n - 1, 0.0, lookahead)

        ext = jnp.concatenate([history, flat, lookahead])
        y = jax.lax.conv_general_dilated(
            ext[None, None, :], kern[None, None, :],
            window_strides=(1,), padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"))[0, 0]
        return y.reshape(xb.shape)

    fn = jax.shard_map(block_fn, mesh=mesh,
                       in_specs=P(axis, None), out_specs=P(axis, None))
    return fn(x)


def shard_blocks(arr: jnp.ndarray, mesh: Mesh, axis: str = "t"):
    """Place [n_blocks, ...] with the leading axis sharded over the mesh."""
    return jax.device_put(arr, NamedSharding(mesh, P(axis)))
