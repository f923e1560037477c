#!/usr/bin/env python
"""Profile the PAL-I full chain: split host vs device time, per-stage cost."""
import time, sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np
from hacktv_tpu import Encoder

fpb = int(sys.argv[1]) if len(sys.argv) > 1 else 32
enc = Encoder("i", 16_000_000, frames_per_block=fpb)
fs = enc.params.frame_samples

# warm
for b in range(5):
    enc.encode_block_device(b).block_until_ready()

N = 8
# full path
t0 = time.perf_counter()
outs = [enc.encode_block_device(b) for b in range(N)]
outs[-1].block_until_ready()
t_full = (time.perf_counter() - t0) / N

# host-only: meta + audio args
t0 = time.perf_counter()
for b in range(N):
    m = enc._block_meta(b)
    aa = enc._audio_args(b)
t_host = (time.perf_counter() - t0) / N

# device-only with prebuilt args
rgb = enc._device_rgb(0)
m = enc._block_meta(1)
dev, bufs = enc._pack_args(enc._audio_args(1))
dev = jax.tree_util.tree_map(jnp.asarray, dev)
bufs = tuple(jnp.asarray(b) for b in bufs)
first = jnp.float32(1.0)
def dev_step():
    return enc._step(rgb, m["base"], m["nxt"], m["burst"], m["vswitch"],
                     m["vy"], m["al"], m["ar"], m["cos0"], m["sin0"],
                     m["lut_row"], m["fsc"], m["fscf"], m["prv"],
                     first, dev, bufs)
def _first(o):
    return o[0] if isinstance(o, tuple) else o
_first(dev_step()).block_until_ready()
t0 = time.perf_counter()
for _ in range(N):
    o = dev_step()
_first(o).block_until_ready()
t_dev = (time.perf_counter() - t0) / N

sps = fpb * fs
print(f"fpb={fpb} block={sps/1e6:.1f}MS")
print(f"full : {t_full*1e3:8.2f} ms/block  {sps/t_full/1e6:8.1f} MS/s  {sps/t_full/16e6:6.1f}x")
print(f"host : {t_host*1e3:8.2f} ms/block")
print(f"dev  : {t_dev*1e3:8.2f} ms/block  {sps/t_dev/1e6:8.1f} MS/s  {sps/t_dev/16e6:6.1f}x")
