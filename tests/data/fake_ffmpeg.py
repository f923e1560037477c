#!/usr/bin/env python3
"""Fake ffmpeg binary for FFmpegSource tests.

Probe invocation (no '-' output target): prints reference-shaped
stream info to stderr (including SAR) and exits 1 like real ffmpeg.
Decode invocations emit deterministic rgb24 frames / s16le audio.
Every invocation appends its argv to <input>.calls for assertions.
"""

import sys

import numpy as np

W, H, N = 64, 48, 5


def main():
    args = sys.argv[1:]
    path = args[args.index("-i") + 1]
    with open(path + ".calls", "a") as f:
        f.write(" ".join(args) + "\n")
    if args[-1] != "-":
        sys.stderr.write(
            f"Input #0, avi, from '{path}':\n"
            "  Duration: 00:00:00.20, start: 0.000000\n"
            "  Stream #0:0: Video: mjpeg, yuvj420p, "
            f"{W}x{H} [SAR 16:11 DAR 512:297], 25 fps, 25 tbr\n"
            "  Stream #0:1: Audio: pcm_s16le, 32000 Hz, stereo\n"
            "At least one output file must be specified\n")
        sys.exit(1)
    out = sys.stdout.buffer
    if "s16le" in args:
        t = np.arange(N * 32000 // 25, dtype=np.int16)
        pcm = np.stack([t, -t], axis=-1).astype(np.int16)
        out.write(pcm.tobytes())
    else:
        for n in range(N):
            fr = np.zeros((H, W, 3), np.uint8)
            fr[:, :, 0] = 10 * n + 5
            fr[:, :, 1] = np.arange(W, dtype=np.uint8)[None, :]
            fr[:, :, 2] = 200
            out.write(fr.tobytes())
    sys.exit(0)


if __name__ == "__main__":
    main()
