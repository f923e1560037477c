#!/usr/bin/env python
"""TPU-vs-CPU smoke sweep: encode a block of each mode family on the
real device and compare against the CPU backend's output.

The CPU suite (tests/) is the bit-exact oracle; this sweep checks the
TPU compilation path end-to-end — layout/precision differences show up
as SNR, crashes as failures.  TPU transcendentals differ slightly from
the host libm, so thresholds are SNR-based (>= 60 dB), not byte
equality.  Writes TPU_SMOKE.json.
"""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CASES = [
    ("pal-composite", ["-m", "pal"]),
    ("pal-i-fm-audio", ["-m", "i"]),
    ("ntsc-m", ["-m", "m"]),
    ("secam-l", ["-m", "l"]),
    ("pal-fm", ["-m", "pal-fm"]),
    ("dmac-fm", ["-m", "dmac-fm", "-s", "20250000"]),
    ("d2mac", ["-m", "d2mac", "-s", "20250000"]),
    ("ntsc-bs-dance", ["-m", "ntsc-bs"]),
    ("405-line", ["-m", "405", "-s", "14000000"]),
    ("apollo-fsc-fm", ["-m", "apollo-fsc-fm"]),
    ("nbtv", ["-m", "nbtv", "-s", "1000000"]),
    ("teletext", ["-m", "i", "--teletext", "tests/data/demo.tti"]),
    ("videocrypt", ["-m", "i", "--videocrypt", "free"]),
    ("syster-secam-l", ["-m", "l", "--syster", "premiere-fa"]),
    ("wss-vits-acp", ["-m", "i", "--wss", "16:9", "--vits", "--acp"]),
]


FM_VIDEO = {"ntsc-bs-dance", "dmac-fm", "apollo-fsc-fm", "pal-fm"}


def _run(case_args, out, env):
    r = subprocess.run(
        [sys.executable, "-m", "hacktv_tpu", "-o", out, "--frames", "2",
         *case_args, "test"],
        capture_output=True, timeout=900, cwd=ROOT, env=env)
    if r.returncode != 0:
        raise RuntimeError(r.stderr.decode()[-800:])


def main():
    import numpy as np
    results = {}
    worst = None
    for name, case_args in CASES:
        cpu_env = dict(os.environ, JAX_PLATFORM_NAME="cpu",
                       JAX_PLATFORMS="cpu",
                       HACKTV_TPU_TELETEXT_TIME="1200000000")
        tpu_env = dict(os.environ,
                       HACKTV_TPU_TELETEXT_TIME="1200000000")
        tpu_env.pop("JAX_PLATFORMS", None)
        tpu_env.pop("JAX_PLATFORM_NAME", None)
        a, b = "/tmp/smoke_cpu.bin", "/tmp/smoke_tpu.bin"
        try:
            _run(case_args, a, cpu_env)
            _run(case_args, b, tpu_env)
        except RuntimeError as e:
            results[name] = {"error": str(e)}
            print(f"{name}: FAILED {e}", file=sys.stderr)
            continue
        x = np.fromfile(a, dtype=np.int16).astype(np.float64)
        y = np.fromfile(b, dtype=np.int16).astype(np.float64)
        n = min(len(x), len(y))
        e = x[:n] - y[:n]
        if not e.any():
            snr = float("inf")
        elif name in FM_VIDEO:
            # FM-modulated video: a +/-1 LSB composite difference
            # permanently shifts the carrier phase, so the raw I/Q SNR
            # collapses while a receiver sees an identical signal.
            # Compare the demodulated instantaneous frequency instead
            # (the composite a receiver recovers).
            zx = x[0:n:2] + 1j * x[1:n:2]
            zy = y[0:n:2] + 1j * y[1:n:2]
            fx = np.angle(zx[1:] * np.conj(zx[:-1]))
            fy = np.angle(zy[1:] * np.conj(zy[:-1]))
            ed = fx - fy
            snr = 10 * np.log10((fx ** 2).sum()
                                / max((ed ** 2).sum(), 1e-12))
        else:
            snr = 10 * np.log10((x[:n] ** 2).sum() / (e ** 2).sum())
        results[name] = {"snr_db": (None if snr == float("inf")
                                    else round(snr, 1)),
                         "bit_exact": bool(not e.any()),
                         "samples": n}
        tag = "bit-exact" if not e.any() else f"{snr:.1f} dB"
        print(f"{name}: {tag}")
        if e.any() and (worst is None or snr < worst):
            worst = snr
    ok = all("error" not in r and (r["bit_exact"] or r["snr_db"] >= 60)
             for r in results.values())
    out = {"device": "TPU via axon tunnel vs XLA:CPU oracle",
           "threshold_db": 60, "pass": ok, "results": results}
    with open(os.path.join(ROOT, "TPU_SMOKE.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote TPU_SMOKE.json (pass={ok})")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
