#!/usr/bin/env python
"""Profile the PAL-I full chain: host-side share vs full wall per block.

The FM device-held path chains a device phase anchor block to block, so
host args can only be built in stream order interleaved with dispatch;
the host share is timed inline around the arg-building calls.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402
import numpy as np  # noqa: E402
from hacktv_tpu import Encoder  # noqa: E402

fpb = int(sys.argv[1]) if len(sys.argv) > 1 else 32
enc = Encoder("i", 16_000_000, frames_per_block=fpb)
fs = enc.params.frame_samples

for b in range(5):
    enc.encode_block_device(b).block_until_ready()

N = 8
t_host = 0.0
t0 = time.perf_counter()
outs = []
for b in range(5, 5 + N):
    th = time.perf_counter()
    rgb = enc._device_rgb(b)
    m = enc._block_meta(b)
    aa = enc._audio_args(b)
    dev, bufs = enc._pack_args(aa)
    t_host += time.perf_counter() - th
    import jax.numpy as jnp
    first = jnp.float32(0.0 if b == 0 else 1.0)
    out = enc._step(rgb, m["base"], m["nxt"], m["burst"], m["vswitch"],
                    m["vy"], m["al"], m["ar"], m["cos0"], m["sin0"],
                    m["lut_row"], m["fsc"], m["fscf"], m["prv"], first,
                    dev, bufs)
    if isinstance(out, tuple):
        out, *aux = out
        if enc.fm_video_statics is not None:
            enc._fm_r[b + 1] = aux.pop(0)
        if enc.fm_dev_held:
            enc._fm_xa[b + 1][1] = aux.pop(0)
        if enc.secam_device:
            enc._secam_z[b + 1] = aux.pop(0)
        if enc.nicam_statics is not None:
            enc.audio.nicam_dev_dsym(aux.pop(0))
    outs.append(out)
outs[-1].block_until_ready()
t_full = (time.perf_counter() - t0) / N
t_host /= N

sps = fpb * fs
print(f"fpb={fpb} block={sps/1e6:.1f}MS")
print(f"full : {t_full*1e3:8.2f} ms/block  {sps/t_full/1e6:8.1f} MS/s  "
      f"{sps/t_full/16e6:6.1f}x")
print(f"host : {t_host*1e3:8.2f} ms/block (inline share)")
