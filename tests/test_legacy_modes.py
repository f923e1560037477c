"""Golden SNR coverage for the legacy raster family: 819/405/240/30-line
monochrome, NBTV, Apollo (incl. field-sequential colour + FM), CBS-FSC
405, PAL-M/N/60, NTSC-A (VERDICT round-1 gap #8)."""

import os

import numpy as np
import pytest

from hacktv_tpu import Encoder

GOLDEN = "/tmp/golden"

XF = pytest.mark.xfail
CASES = [
    # (mode, rate, complex, min_snr)
    ("apollo-fsc", 14_000_000, False, 40.0),
    ("cbs405", 9_000_000, False, 40.0),
    ("819", 20_000_000, False, 40.0),
    ("e", 20_000_000, True, 40.0),
    ("240", 2_000_000, False, 40.0),
    ("30", 100_000, False, 40.0),
    ("nbtv", 100_000, False, 40.0),
    ("apollo", 2_000_000, False, 40.0),
    ("apollo-fm", 2_000_000, True, 40.0),
    ("pal-m", 16_000_000, True, 40.0),
    ("b", 16_000_000, True, 40.0),
    ("pal-d", 16_000_000, True, 40.0),
    ("pal-k", 16_000_000, True, 40.0),
    ("525pal", 13_500_000, False, 40.0),
    ("d", 16_000_000, True, 40.0),
    ("k", 16_000_000, True, 40.0),
    ("secam-i", 16_000_000, True, 40.0),
    ("secam-b", 16_000_000, True, 40.0),
    ("secam-g", 16_000_000, True, 40.0),
    ("ntsc-i", 13_500_000, True, 40.0),
    ("ntsc-fm", 13_500_000, True, 40.0),
    ("pal60-i", 13_500_000, True, 40.0),
    ("a", 14_000_000, True, 40.0),
    ("405-i", 14_000_000, True, 40.0),
    ("ntsc-405", 14_000_000, False, 40.0),
    ("240-am", 2_000_000, True, 40.0),
    ("30-am", 100_000, True, 40.0),
    ("nbtv-am", 100_000, True, 40.0),
    ("apollo-fsc-fm", 13_500_000, True, 40.0),
    ("m-cbs405", 14_000_000, True, 40.0),
    ("pal-n", 16_000_000, True, 40.0),
    ("pal60", 16_000_000, True, 40.0),
    ("ntsc-a", 16_000_000, True, 40.0),
    ("405", 16_000_000, True, 40.0),
]


def _case_id(c):
    return c.values[0] if hasattr(c, "values") else c[0]


@pytest.mark.parametrize("mode,rate,cplx,min_snr",
                         CASES, ids=[_case_id(c) for c in CASES])
def test_legacy_mode_snr(mode, rate, cplx, min_snr):
    ext = "c16" if cplx else "s16"
    path = os.path.join(GOLDEN, f"legacy_{mode}_2f.{ext}")
    if not os.path.exists(path):
        pytest.skip("golden missing; run tools/make_golden.sh")
    ref = np.fromfile(path, dtype=np.int16)
    enc = Encoder(mode, rate)
    n_frames = max(1, len(ref) // (enc.frame_samples * (2 if cplx else 1)))
    ours = np.concatenate(
        [enc.encode_frame(f).reshape(-1) for f in range(n_frames)])
    ref = ref[:len(ours)].astype(np.float64)
    e = ours.astype(np.float64) - ref
    snr = 10 * np.log10(np.sum(ref ** 2) / max(np.sum(e ** 2), 1e-12))
    assert snr > min_snr, f"{mode}: {snr:.1f} dB"


MAC_AM_CASES = [
    ("secam-fm", 20_250_000, 40.0),
    ("d2mac-am", 20_250_000, 40.0),
    ("dmac-am", 20_250_000, 40.0),
    ("d2mac-fm", 20_250_000, 40.0),
]


@pytest.mark.parametrize("mode,rate,min_snr", MAC_AM_CASES,
                         ids=[_case_id(c) for c in MAC_AM_CASES])
def test_fm_am_mode_snr(mode, rate, min_snr):
    from hacktv_tpu import create_encoder
    path = os.path.join(GOLDEN, f"legacy_{mode}_2f.c16")
    if not os.path.exists(path):
        pytest.skip("golden missing; run tools/make_golden.sh")
    ref = np.fromfile(path, dtype=np.int16)
    enc = create_encoder(mode, rate)
    n_frames = max(1, len(ref) // (enc.frame_samples * 2))
    ours = np.concatenate(
        [enc.encode_block(f).reshape(-1) for f in range(n_frames)])
    ref = ref[:len(ours)].astype(np.float64)
    e = ours.astype(np.float64) - ref
    snr = 10 * np.log10(np.sum(ref ** 2) / max(np.sum(e ** 2), 1e-12))
    assert snr > min_snr, f"{mode}: {snr:.1f} dB"


def test_secam_field_id_golden():
    """--secam-field-id renders the field-identification sawtooth
    "bottles" on lines 7-15/320-328 (src/video.c:3101-3136)."""
    from dataclasses import replace
    from hacktv_tpu.config.standards import get_mode
    path = os.path.join(GOLDEN, "secaml_fid_2frames.c16")
    if not os.path.exists(path):
        pytest.skip("golden missing; run tools/make_golden.sh")
    ref = np.fromfile(path, dtype=np.int16).astype(np.float64)
    conf = replace(get_mode("l"), secam_field_id=True)
    enc = Encoder(conf, 16_000_000)
    ours = np.concatenate([enc.encode_block(f).reshape(-1)
                           for f in range(1)]).astype(np.float64)
    n = min(len(ref), len(ours))
    e = ours[:n] - ref[:n]
    snr = 10 * np.log10((ref[:n] ** 2).sum() / max((e ** 2).sum(), 1e-12))
    assert snr > 40.0, snr


@pytest.mark.parametrize("mode,golden", [
    ("pal", "pal_svideo_2frames.c16"),
    ("secam", "secam_svideo_2frames.c16"),
])
def test_s_video_golden(mode, golden):
    """--s-video splits luma and chroma onto separate channels
    (src/video.c:3032, 3219)."""
    from dataclasses import replace
    from hacktv_tpu.config.standards import get_mode
    path = os.path.join(GOLDEN, golden)
    if not os.path.exists(path):
        pytest.skip("golden missing; run tools/make_golden.sh")
    ref = np.fromfile(path, dtype=np.int16).astype(np.float64)
    conf = replace(get_mode(mode), s_video=True)
    enc = Encoder(conf, 16_000_000)
    assert enc.complex_out
    ours = np.concatenate([enc.encode_block(f).reshape(-1)
                           for f in range(2)]).astype(np.float64)
    n = min(len(ref), len(ours))
    e = ours[:n] - ref[:n]
    snr = 10 * np.log10((ref[:n] ** 2).sum() / max((e ** 2).sum(), 1e-12))
    assert snr > 40.0, f"{mode}: {snr:.1f} dB"


def test_invert_video_golden():
    """--invert-video swaps sync/white and mirrors blanking/black
    (src/video.c:3863-3876)."""
    from dataclasses import replace
    from hacktv_tpu.config.standards import get_mode
    path = os.path.join(GOLDEN, "pal_invert_2frames.s16")
    if not os.path.exists(path):
        pytest.skip("golden missing; run tools/make_golden.sh")
    ref = np.fromfile(path, dtype=np.int16).astype(np.float64)
    conf = replace(get_mode("pal"), invert_video=True)
    enc = Encoder(conf, 16_000_000)
    ours = np.concatenate([enc.encode_block(f).reshape(-1)
                           for f in range(2)]).astype(np.float64)
    n = min(len(ref), len(ours))
    e = ours[:n] - ref[:n]
    snr = 10 * np.log10((ref[:n] ** 2).sum() / max((e ** 2).sum(), 1e-12))
    assert snr > 40.0, snr
