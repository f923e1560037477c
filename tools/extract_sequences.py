#!/usr/bin/env python
"""Extract the scrambler shuffle-sequence DATA tables from the reference
headers into an .npz shipped with the package.

These tables are protocol constants (line-shuffle sequences sampled from
real broadcasts / decoder hardware):
  - _systercnrshuffle[25][576], _systercnr[25][576]
      (src/systercnr-sequence.h — Syster cut-and-rotate shift tables)
  - _fa_sequence[256][12][47]
      (src/videocrypts-sequence.h — Videocrypt S block shuffle)

Usage: python tools/extract_sequences.py [/root/reference/src] [outdir]
"""

import re
import sys

import numpy as np


def parse_tables(text: str, signed: bool = False) -> dict:
    out = {}
    for m in re.finditer(
            r"u?int(?:8|16)_t\s+(_\w+)\s*((?:\[\w+\])+)\s*=\s*\{", text):
        name = m.group(1)
        dims = tuple(int(d) for d in re.findall(r"\[(\d+)\]", m.group(2)))
        # consume to the matching closing brace
        depth, i = 1, m.end()
        while depth:
            c = text[i]
            if c == "{":
                depth += 1
            elif c == "}":
                depth -= 1
            i += 1
        body = re.sub(r"/\*.*?\*/", "", text[m.end():i], flags=re.S)
        vals = [int(v, 0) for v in
                re.findall(r"0[xX][0-9a-fA-F]+|-?\d+", body)]
        arr = np.asarray(vals,
                         dtype=np.int32 if signed else np.uint8)
        if dims:
            arr = arr.reshape(dims)
        out[name] = arr
    return out


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/src"
    outdir = (sys.argv[2] if len(sys.argv) > 2
              else "hacktv_tpu/services/data")
    tables = {}
    with open(f"{src}/systercnr-sequence.h") as f:
        tables.update(parse_tables(f.read()))
    with open(f"{src}/videocrypts-sequence.h") as f:
        tables.update(parse_tables(f.read()))
    # Syster audio-inversion FIR/mixer taps (src/syster.c:87-102)
    with open(f"{src}/syster.c") as f:
        taps = parse_tables(f.read(), signed=True)
    assert tables["_systercnrshuffle"].shape == (25, 576)
    assert tables["_systercnr"].shape == (25, 576)
    assert tables["_fa_sequence"].shape == (256, 12, 47)
    assert taps["_firi"].shape == (771,) and taps["_firq"].shape == (771,)
    np.savez_compressed(
        f"{outdir}/scramble_sequences.npz",
        systercnr_shuffle=tables["_systercnrshuffle"],
        systercnr=tables["_systercnr"],
        vcs_fa=tables["_fa_sequence"],
        ng_firi=taps["_firi"], ng_firq=taps["_firq"],
        ng_mixi=taps["_mixi"], ng_mixq=taps["_mixq"])
    print(f"wrote {outdir}/scramble_sequences.npz")


if __name__ == "__main__":
    main()
