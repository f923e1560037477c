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


def mpeg2_es_fixture(n_frames: int = N) -> bytes:
    """Synthetic MPEG-2 ES: one GOP, pictures in bitstream order
    [2, 0, 1, 4, 3] (simulated B-frame reordering) with one GA94
    caption pair per picture keyed by DISPLAY order, plus one non-608
    packet that the (b0 & 0x07) == 0x04 filter must skip."""
    sc = lambda c: b"\x00\x00\x01" + bytes([c])
    es = sc(0xB3) + b"\x04\x00\x30"          # sequence header stub
    es += sc(0xB8) + b"\x00\x00\x00\x00"     # GOP header stub
    order = [2, 0, 1, 4, 3][:n_frames]
    for tref in order:
        es += sc(0x00) + bytes([tref >> 2, (tref & 3) << 6, 0x00])
        cc = bytes([0xFC, 0x20 + tref, 0x40 + tref])      # valid f1
        cc += bytes([0xFD, 0xEE, 0xEE])                   # field 2: skip
        es += sc(0xB2) + b"GA94\x03" + bytes([0x40 | 2, 0xFF]) + cc
        es += b"\xAA" * 8                    # slice data stand-in
    return es + sc(0xB7)


def main():
    args = sys.argv[1:]
    path = args[args.index("-i") + 1]
    with open(path + ".calls", "a") as f:
        f.write(" ".join(args) + "\n")
    captioned = "captioned" in path
    if args[-1] != "-":
        codec = "mpeg2video" if captioned else "mjpeg"
        sys.stderr.write(
            f"Input #0, avi, from '{path}':\n"
            "  Duration: 00:00:00.20, start: 0.000000\n"
            f"  Stream #0:0: Video: {codec}, yuvj420p, "
            f"{W}x{H} [SAR 16:11 DAR 512:297], 25 fps, 25 tbr\n"
            "  Stream #0:1: Audio: pcm_s16le, 32000 Hz, stereo\n"
            "At least one output file must be specified\n")
        sys.exit(1)
    out = sys.stdout.buffer
    if "copy" in args:
        out.write(mpeg2_es_fixture())
        out.flush()
        sys.exit(0)
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
