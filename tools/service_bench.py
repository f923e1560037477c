#!/usr/bin/env python
"""Service/scrambler throughput table on the real device.

Measures the full-chain device throughput of PAL service configs
(the host bit pipelines run interleaved with device dispatch, exactly
like the CLI's block loop) and writes one JSON object per config.

Usage: python tools/service_bench.py [--out BENCH_SERVICES.json]
       [--only teletext,sis] [--blocks N]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

CONFIGS = {
    # label -> (mode, rate, encoder kwargs)
    "teletext": ("i", 16_000_000, dict(teletext="tests/data/demo.tti")),
    "sis": ("g", 16_000_000, dict(sis="dcsis")),
    "stacked": ("i", 16_000_000, dict(wss="16:9", vits=True, vitc=True,
                                      acp=True, cc608=True)),
    "videocrypt": ("i", 16_000_000, dict(videocrypt="free")),
    "videocrypt2": ("i", 16_000_000, dict(videocrypt2="free")),
    "videocrypts": ("i", 16_000_000, dict(videocrypts="free")),
    "syster": ("l", 16_000_000, dict(syster="premiere-fa", systeraudio=True)),
    "systercnr": ("l", 16_000_000, dict(systercnr="premiere-fa")),
    "d11": ("l", 16_000_000, dict(d11="premiere-fa")),
    "eurocrypt": ("d2mac-fm", 20_250_000, dict(eurocrypt="filmnet")),
}


def bench_one(label, mode, rate, kw, fpb=32, blocks=8, trials=3,
              warm=8):
    from hacktv_tpu import create_encoder

    enc_kw = dict(kw)
    if "eurocrypt" in kw:
        from hacktv_tpu.services.eurocrypt import Eurocrypt
        enc_kw["eurocrypt"] = Eurocrypt(kw["eurocrypt"])
        enc_kw["scramble_audio"] = True
    enc = create_encoder(mode, rate, frames_per_block=fpb, **enc_kw)
    frame_samples = (enc.params.frame_samples if hasattr(enc, "params")
                     else enc.frame_samples)
    block_samples = fpb * frame_samples
    b = 0
    for _ in range(warm):                  # warm-up: compile + caches
        enc.encode_block_device(b).block_until_ready()
        b += 1
    rates = []
    for _ in range(trials):
        t0 = time.perf_counter()
        hs = [enc.encode_block_device(b + i) for i in range(blocks)]
        hs[-1].block_until_ready()
        dt = time.perf_counter() - t0
        b += blocks
        rates.append(blocks * block_samples / dt)
    sps = float(np.median(rates))
    rt = sps / rate
    return {"metric": f"PAL+{label} full-chain device IQ samples/s/chip",
            "value": int(sps), "unit": "samples/s",
            "x_realtime": round(rt, 1),
            "spread_pct": round(100 * (max(rates) - min(rates))
                                / sps, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="BENCH_SERVICES.json")
    ap.add_argument("--only", default=None)
    ap.add_argument("--blocks", type=int, default=8)
    args = ap.parse_args()
    names = (args.only.split(",") if args.only else list(CONFIGS))
    results = []
    for name in names:
        mode, rate, kw = CONFIGS[name]
        r = bench_one(name, mode, rate, kw, blocks=args.blocks)
        print(json.dumps(r))
        results.append(r)
    if args.only and os.path.exists(args.out):
        # merge a partial run into the existing file instead of
        # clobbering the other configs' results
        with open(args.out) as f:
            prev = json.load(f).get("results", [])
        fresh = {r["metric"] for r in results}
        results = [r for r in prev if r["metric"] not in fresh] + results
    import jax
    out = {"device": str(jax.devices()[0]),
           "note": "median of 3 trials of an 8-block sequential stream "
                   "per config; host bit pipelines overlap device "
                   "compute as in the CLI block loop",
           "results": results}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
