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
    mode = "pal"           # upgraded to the full PAL-I chain as it lands
    sample_rate = 16_000_000
    from hacktv_tpu import Encoder

    enc = Encoder(mode, sample_rate)
    frame_samples = enc.params.frame_samples
    frame_rate = float(enc.conf.frame_rate)

    # Warm-up: compile + first execution
    y = enc._encode_frame_dev(0)
    y.block_until_ready()

    # Steady state: meta cache populated after one carrier cycle of frames
    cycle = 16
    for f in range(cycle):
        enc._encode_frame_dev(f).block_until_ready()

    n_frames = 100
    t0 = time.perf_counter()
    outs = []
    for f in range(n_frames):
        outs.append(enc._encode_frame_dev(f))
    outs[-1].block_until_ready()
    dt = time.perf_counter() - t0

    sps = n_frames * frame_samples / dt
    x_rt = sps / sample_rate
    result = {
        "metric": f"{mode} baseband synthesis samples/s/chip",
        "value": round(sps),
        "unit": "samples/s",
        "vs_baseline": round(x_rt / 100.0, 3),
        "x_realtime": round(x_rt, 1),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
