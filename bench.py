#!/usr/bin/env python
"""Benchmark: sustained IQ sample throughput of the full encoder chain.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is the achieved realtime factor divided by the BASELINE.md
target of 100x realtime per chip.
"""

import argparse
import json
import sys
import time

import jax
import numpy as np

# secondary configs: python bench.py --mode dmac / secam / ntsc-vsb
_CONFIGS = {
    "i": dict(mode="i", rate=16_000_000, label="PAL-I (i) full-chain"),
    "secam": dict(mode="l", rate=16_000_000, label="SECAM-L (l) full-chain"),
    "dmac": dict(mode="dmac-fm", rate=20_250_000,
                 label="D-MAC FM (dmac-fm) full-chain"),
    "ntsc-vsb": dict(mode="m", rate=13_500_000, vfilter=True,
                     label="NTSC-M+VSB (m) full-chain"),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="i", choices=sorted(_CONFIGS))
    ns = ap.parse_args()
    cfg = _CONFIGS[ns.mode]
    mode = cfg["mode"]
    sample_rate = cfg["rate"]
    from hacktv_tpu import Encoder

    fpb = 64
    kw = {"vfilter": True} if cfg.get("vfilter") else {}
    if mode.startswith("dmac") or mode.startswith("d2mac"):
        from hacktv_tpu.video.mac import MacEncoder
        from hacktv_tpu.config.standards import get_mode
        enc = MacEncoder(get_mode(mode), sample_rate, 0,
                         frames_per_block=fpb)
    else:
        enc = Encoder(mode, sample_rate, frames_per_block=fpb, **kw)
    frame_samples = (enc.params.frame_samples if hasattr(enc, "params")
                     else enc.frame_samples)

    # Warm-up: compile + populate meta cache, then until timing stabilises
    for b in range(5):
        enc.encode_block_device(b).block_until_ready()

    # 3 trials of a sequential block stream; report the median (single
    # captures through the device tunnel can be cold/contended)
    n_blocks = 8
    trials = []
    b = 5              # continue past warm-up: blocks are a stream
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
        "metric": f"{cfg['label']} IQ samples/s/chip",
        "value": round(sps),
        "unit": "samples/s",
        "vs_baseline": round(x_rt / 100.0, 3),
        "x_realtime": round(x_rt, 1),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
