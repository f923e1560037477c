"""D/D2-MAC parity tests vs the reference golden captures.

Bit-domain oracle: tools/make_golden.sh dumps the reference's per-line
duobinary bit buffer (162 bytes/line); the MacMux must reproduce it
byte-exactly — this covers the packet multiplex, audio encoder, SI
packets, frame sync and PRBS whitening in one shot.

Waveform oracle: SNR vs the int16 file-sink captures.
"""

import os

import numpy as np
import pytest

GOLDEN = "/tmp/golden"


def _golden(name):
    path = os.path.join(GOLDEN, name)
    if not os.path.exists(path):
        pytest.skip(f"golden {name} missing; run tools/make_golden.sh")
    return path


def _mux(mode, **kw):
    from hacktv_tpu.av.testcard import TestCardSource
    from hacktv_tpu.config.standards import get_mode
    from hacktv_tpu.video.mac import MacMux
    conf = get_mode(mode)
    src = TestCardSource(702, 576)
    return MacMux(conf, 1296, 20_250_000, src,
                  vsam=kw.pop("vsam", 1), timestamp=1_200_000_000,
                  aspect_43=1, **kw)


@pytest.mark.parametrize("mode", ["d2mac", "dmac"])
def test_mac_bits_exact(mode):
    path = _golden(f"{mode}_bits_50f.bin")
    golden = np.fromfile(path, dtype=np.uint8).reshape(-1, 162)
    gbits = np.unpackbits(golden, axis=1, bitorder="little")
    mux = _mux(mode)
    n = 10 * 625
    mux.ensure(n)
    for k in range(n):
        mine = mux.line_bits[k]
        assert np.array_equal(mine, gbits[k, :len(mine)]), \
            f"line k={k} bits differ"


def _wave_snr(mode, golden_name, nframes=None, **kw):
    from hacktv_tpu.video.mac import MacEncoder
    path = _golden(golden_name)
    enc = MacEncoder(mode, 20_250_000, **kw)
    cplx = golden_name.endswith(".c16")
    ref = np.fromfile(path, dtype=np.int16)
    fs = enc.frame_samples * (2 if cplx else 1)
    nf = min(len(ref) // fs, nframes or 99)
    mine = np.concatenate([
        enc.encode_block(b).reshape(-1)
        for b in range(nf)]).astype(np.float64)
    ref = ref.astype(np.float64)[:len(mine)]
    err = mine - ref
    return 10 * np.log10(np.sum(ref ** 2) / max(np.sum(err ** 2), 1e-12))


def test_d2mac_waveform():
    assert _wave_snr("d2mac", "d2mac_4frames.s16") > 60.0


def test_dmac_waveform():
    assert _wave_snr("dmac", "dmac_4frames.s16") > 60.0


def test_d2mac_double_cut():
    assert _wave_snr("d2mac", "d2mac_dcut_4frames.s16",
                     scramble_video=2) > 60.0


def test_d2mac_single_cut():
    assert _wave_snr("d2mac", "d2mac_scut_4frames.s16",
                     scramble_video=1) > 60.0


def test_dmac_fm():
    assert _wave_snr("dmac-fm", "dmacfm_2frames.c16", nframes=2) > 40.0


def test_d2mac_moving_video():
    """MAC carries the *current* source frame every frame
    (src/mac.c:1758-1834 + frame advance src/video.c:4873-4903): the
    golden is 4 distinct raw BGRA frames fed to the reference via
    ffmpeg's rawvideo demuxer, read here by RawFileSource."""
    from hacktv_tpu.av.rawfile import RawFileSource
    from hacktv_tpu.video.mac import MacEncoder
    path = _golden("d2mac_motion_3frames.s16")
    src = RawFileSource(_golden("motion_702x576.bgra"), 702, 576)
    ref = np.fromfile(path, dtype=np.int16).astype(np.float64)
    enc = MacEncoder("d2mac", 20_250_000, source=src)
    fs = enc.frame_samples
    for f in range(3):
        mine = enc.encode_block(f).reshape(-1).astype(np.float64)
        r = ref[f * fs:(f + 1) * fs]
        n = min(len(r), len(mine))
        e = mine[:n] - r[:n]
        snr = 10 * np.log10((r[:n] ** 2).sum() / max((e ** 2).sum(),
                                                     1e-12))
        assert snr > 60.0, f"frame {f}: {snr:.1f} dB"


def test_d2mac_pixelrate_resample():
    """--pixelrate synthesis at 20.25 MS/s resampled to 10.125 MS/s
    (src/video.c:3627-3651); covers the decimating polyphase path and
    the vresampler's extra audio-process lag."""
    from hacktv_tpu.video.mac import MacEncoder
    path = _golden("d2mac_pr10125_2frames.s16")
    ref = np.fromfile(path, dtype=np.int16).astype(np.float64)
    enc = MacEncoder("d2mac", 10_125_000, pixel_rate=20_250_000)
    assert enc.frame_samples == 648 * 625
    mine = np.concatenate([enc.encode_block(b).reshape(-1)
                           for b in range(2)]).astype(np.float64)
    n = min(len(ref), len(mine))
    e = mine[:n] - ref[:n]
    snr = 10 * np.log10((ref[:n] ** 2).sum() / max((e ** 2).sum(), 1e-12))
    assert snr > 60.0, snr


def test_d2mac_medium_quality_audio():
    from dataclasses import replace
    from hacktv_tpu.config.standards import get_mode
    conf = replace(get_mode("d2mac"), mac_audio_quality=False)
    assert _wave_snr(conf, "d2mac_mq_4frames.s16") > 60.0


def test_d2mac_linear_audio():
    from dataclasses import replace
    from hacktv_tpu.config.standards import get_mode
    conf = replace(get_mode("d2mac"), mac_audio_companded=False,
                   mac_audio_protection=True)
    assert _wave_snr(conf, "d2mac_lin_4frames.s16") > 60.0


@pytest.mark.parametrize("mode", ["d2mac", "dmac"])
def test_mac_teletext_bits_exact(mode):
    """Teletext packets packed into the D/D2-MAC line formats
    (src/mac.c:1556-1602), byte-exact vs the reference dump with
    --teletext demo.tti and pinned clocks."""
    import os
    from hacktv_tpu.services.teletext import MacTeletext
    path = _golden(f"{mode}_tt_bits_10f.bin")
    golden = np.fromfile(path, dtype=np.uint8).reshape(-1, 162)
    gbits = np.unpackbits(golden, axis=1, bitorder="little")
    tti = os.path.join(os.path.dirname(__file__), "data", "demo.tti")
    tt = MacTeletext(tti, 625, 25, clock=lambda: 1_200_000_000)
    mux = _mux(mode, teletext=tt)
    n = 10 * 625
    mux.ensure(n)
    for k in range(n):
        mine = mux.line_bits[k]
        assert np.array_equal(mine, gbits[k, :len(mine)]), \
            f"line k={k} bits differ"


def test_d2mac_mono_audio():
    """--mac-audio-mono: downmixed single channel; the scale-factor
    signalling region crosses the channel boundary (src/mac.c:1151-1156,
    1319-1323)."""
    from dataclasses import replace
    from hacktv_tpu.config.standards import get_mode
    conf = replace(get_mode("d2mac"), mac_audio_stereo=False)
    assert _wave_snr(conf, "d2mac_mono_4frames.s16") > 60.0


def test_d2mac_companded_l2_audio():
    """--mac-audio-l2-protection with companded samples."""
    from dataclasses import replace
    from hacktv_tpu.config.standards import get_mode
    conf = replace(get_mode("d2mac"), mac_audio_protection=True)
    assert _wave_snr(conf, "d2mac_compl2_4frames.s16") > 60.0


def test_d2mac_linear_l1_audio():
    """--mac-audio-linear without L2 protection (parity bits)."""
    from dataclasses import replace
    from hacktv_tpu.config.standards import get_mode
    conf = replace(get_mode("d2mac"), mac_audio_companded=False)
    assert _wave_snr(conf, "d2mac_linl1_4frames.s16") > 60.0


def test_mac_checkpoint_resume_bit_exact():
    """MacEncoder: encode 4 blocks, checkpoint at 2, resume in a fresh
    encoder, byte-compare — the packet mux / CA / audio-coder state
    round-trips through the pickled mux."""
    import numpy as np
    from hacktv_tpu.video.mac import MacEncoder
    from hacktv_tpu.config.standards import get_mode
    from hacktv_tpu.services.eurocrypt import Eurocrypt

    def mk():
        return MacEncoder(get_mode("d2mac"), 2_025_000,
                          frames_per_block=1, scramble_video=2,
                          scramble_audio=True,
                          eurocrypt=Eurocrypt("filmnet"))

    full = mk()
    ref = [full.encode_block(b) for b in range(4)]
    a = mk()
    for b in range(2):
        assert np.array_equal(a.encode_block(b), ref[b]), b
    blob = a.checkpoint(2)
    c = mk()
    assert c.load_checkpoint(blob) == 2
    for b in range(2, 4):
        assert np.array_equal(c.encode_block(b), ref[b]), ("resumed", b)
