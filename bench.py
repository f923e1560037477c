#!/usr/bin/env python
"""Benchmark: sustained IQ sample throughput of the full encoder chain.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is the achieved realtime factor divided by the BASELINE.md
target of 100x realtime per chip.
"""

import json
import sys
import time

import jax
import numpy as np


def main():
    mode = "i"             # PAL-I: raster + FM audio + NICAM-728, complex IQ
    sample_rate = 16_000_000
    from hacktv_tpu import Encoder

    fpb = 32
    enc = Encoder(mode, sample_rate, frames_per_block=fpb)
    frame_samples = enc.params.frame_samples

    # Warm-up: compile + populate meta cache, then until timing stabilises
    for b in range(5):
        enc.encode_block_device(b).block_until_ready()

    # 3 trials of a sequential block stream; report the median (single
    # captures through the device tunnel can be cold/contended)
    n_blocks = 8
    trials = []
    b = 0
    for _ in range(3):
        t0 = time.perf_counter()
        outs = []
        for _ in range(n_blocks):
            outs.append(enc.encode_block_device(b))
            b += 1
        outs[-1].block_until_ready()
        trials.append(time.perf_counter() - t0)
    dt = sorted(trials)[len(trials) // 2]

    sps = n_blocks * fpb * frame_samples / dt
    x_rt = sps / sample_rate
    result = {
        "metric": f"PAL-I ({mode}) full-chain IQ samples/s/chip",
        "value": round(sps),
        "unit": "samples/s",
        "vs_baseline": round(x_rt / 100.0, 3),
        "x_realtime": round(x_rt, 1),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
