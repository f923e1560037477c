"""RF chain golden tests: VSB filter, FM video modulation.

FM modes cannot be compared sample-for-sample against the reference: the
reference's chroma FIR reads past its line buffer (uninitialised heap) and
those samples enter the FM phase integral, adding an untrackable ~0.02
rad/line random phase walk to the golden capture.  FM fidelity is
therefore measured after removing a per-line phase rotation (circular
mean over the clean columns) — this preserves sensitivity to any real
modulation error while discarding only the unknowable absolute phase.
"""

import os

import numpy as np
import pytest

from hacktv_tpu import Encoder

GOLDEN = "/tmp/golden"


def _golden_iq(name):
    path = os.path.join(GOLDEN, name)
    if not os.path.exists(path):
        pytest.skip(f"golden file {path} missing; run tools/make_golden.sh")
    return np.fromfile(path, dtype=np.int16).reshape(-1, 2)


def test_vsb_filter_pal_i():
    ref = _golden_iq("pali_filter_2frames.c16")
    enc = Encoder("i", 16_000_000, vfilter=True)
    ours = np.concatenate(
        [enc.encode_block(b) for b in range(2)])
    n = min(len(ref), len(ours))
    r = ref[:n].astype(np.float64)
    e = ours[:n].astype(np.float64) - r
    snr = 10 * np.log10((r ** 2).sum() / (e ** 2).sum())
    assert snr >= 40.0, f"VSB SNR {snr:.2f} dB"


def test_real_vfilter_pal():
    path = os.path.join(GOLDEN, "pal_filter_2frames.s16")
    if not os.path.exists(path):
        pytest.skip("golden missing")
    ref = np.fromfile(path, dtype=np.int16)
    enc = Encoder("pal", 16_000_000, vfilter=True)
    ours = np.concatenate([enc.encode_frame(f) for f in range(2)])
    n = min(len(ref), len(ours))
    r = ref[:n].astype(np.float64)
    e = ours[:n].astype(np.float64) - r
    snr = 10 * np.log10((r ** 2).sum() / (e ** 2).sum())
    assert snr >= 40.0, f"--filter SNR {snr:.2f} dB"


def test_fm_video_pal_fm():
    ref = _golden_iq("palfm_16M_2frames.c16")
    enc = Encoder("pal-fm", 16_000_000)
    ours = np.concatenate(
        [enc.encode_block(b) for b in range(2)])
    n = (min(len(ref), len(ours)) // enc.params.width) * enc.params.width
    W = enc.params.width
    r = (ref[:n, 0] + 1j * ref[:n, 1]).astype(np.complex128).reshape(-1, W)
    o = (ours[:n, 0] + 1j * ours[:n, 1]).astype(np.complex128).reshape(-1, W)

    # absolute initial phase must match (no derotation on the first line)
    d0 = np.angle((o[0, :W - 12] * np.conj(r[0, :W - 12])).sum())
    assert abs(d0) < 0.05, f"initial FM phase differs by {d0:.3f} rad"

    # per-line derotation over clean columns (see module docstring)
    drift = np.angle((o[:, :W - 12] * np.conj(r[:, :W - 12])).sum(axis=1))
    o = o * np.exp(-1j * drift)[:, None]
    e = (o - r)[:, :W - 12]
    rr = r[:, :W - 12]
    snr = 10 * np.log10((np.abs(rr) ** 2).sum() / (np.abs(e) ** 2).sum())
    assert snr >= 55.0, f"FM conditional SNR {snr:.2f} dB"


def test_fm_energy_dispersal_pal_fm():
    """Frame-locked triangular energy dispersal (src/video.c:2245-2257,
    applied at :2301-2318, wired at :4573-4581 — stock-disabled constant
    video.c:221 enabled via the FM_ED golden-build hook)."""
    from dataclasses import replace
    from hacktv_tpu.config.standards import get_mode
    ref = _golden_iq("palfm_ed_16M_2frames.c16")
    conf = replace(get_mode("pal-fm"), fm_energy_dispersal=0.0625)
    enc = Encoder(conf, 16_000_000)
    ours = np.concatenate(
        [enc.encode_block(b) for b in range(2)])
    n = (min(len(ref), len(ours)) // enc.params.width) * enc.params.width
    W = enc.params.width
    r = (ref[:n, 0] + 1j * ref[:n, 1]).astype(np.complex128).reshape(-1, W)
    o = (ours[:n, 0] + 1j * ours[:n, 1]).astype(np.complex128).reshape(-1, W)
    d0 = np.angle((o[0, :W - 12] * np.conj(r[0, :W - 12])).sum())
    assert abs(d0) < 0.05, f"initial FM phase differs by {d0:.3f} rad"
    drift = np.angle((o[:, :W - 12] * np.conj(r[:, :W - 12])).sum(axis=1))
    o = o * np.exp(-1j * drift)[:, None]
    e = (o - r)[:, :W - 12]
    rr = r[:, :W - 12]
    snr = 10 * np.log10((np.abs(rr) ** 2).sum() / (np.abs(e) ** 2).sum())
    assert snr >= 55.0, f"FM+ED conditional SNR {snr:.2f} dB"

    # and the triangle must actually be present: with ED off the same
    # capture must NOT match
    enc0 = Encoder("pal-fm", 16_000_000)
    ours0 = np.concatenate([enc0.encode_block(b) for b in range(2)])
    o0 = (ours0[:n, 0] + 1j * ours0[:n, 1]).astype(np.complex128) \
        .reshape(-1, W)
    drift0 = np.angle((o0[:, :W - 12] * np.conj(r[:, :W - 12])).sum(axis=1))
    o0 = o0 * np.exp(-1j * drift0)[:, None]
    e0 = (o0 - r)[:, :W - 12]
    snr0 = 10 * np.log10((np.abs(rr) ** 2).sum() / (np.abs(e0) ** 2).sum())
    assert snr0 < 30.0, f"ED-off stream unexpectedly matches ({snr0:.1f})"

    # device closed-form path (chosen when FM combines with swap/offset/
    # passthru) must carry the same triangle: --swap-iq is an exact I<->Q
    # exchange, so it must match the host-exact stream swapped
    encs = Encoder(replace(conf, swap_iq=True), 16_000_000)
    xs = np.concatenate([encs.encode_block(b) for b in range(2)])[:n]
    swapped = ours[:n][:, ::-1]
    ds = (xs.astype(np.float64) - swapped.astype(np.float64))
    snr_s = 10 * np.log10((swapped.astype(np.float64) ** 2).sum()
                          / max((ds ** 2).sum(), 1e-12))
    assert snr_s >= 55.0, f"device-path ED SNR {snr_s:.2f} dB"


def test_secam_composite():
    path = os.path.join(GOLDEN, "secam_16M_2frames.s16")
    if not os.path.exists(path):
        pytest.skip("golden missing")
    ref = np.fromfile(path, dtype=np.int16)
    enc = Encoder("secam", 16_000_000)
    ours = np.concatenate(
        [enc.encode_block(b) for b in range(2)])
    n = min(len(ref), len(ours))
    r = ref[:n].astype(np.float64)
    e = ours[:n].astype(np.float64) - r
    snr = 10 * np.log10((r ** 2).sum() / (e ** 2).sum())
    assert snr >= 40.0, f"SECAM SNR {snr:.2f} dB"


def test_secam_l_full_chain():
    """SECAM-L: AM video polarity + AM audio carrier at 6.5 MHz."""
    ref = _golden_iq("secaml_16M_2frames.c16")
    enc = Encoder("l", 16_000_000)
    ours = np.concatenate(
        [enc.encode_block(b) for b in range(2)])
    n = min(len(ref), len(ours))
    r = ref[:n].astype(np.float64)
    e = ours[:n].astype(np.float64) - r
    snr = 10 * np.log10((r ** 2).sum() / (e ** 2).sum())
    assert snr >= 40.0, f"SECAM-L SNR {snr:.2f} dB"


def test_secam_device_path_vs_exact_oracle():
    """The TPU-native SECAM chroma program (verdict r3 item 1) must track
    the bit-exact host oracle within 1 LSB on rare round-boundary
    samples (>= 60 dB; measured ~108 dB), with the scalar IIR carry
    seamless across blocks."""
    exact = Encoder("l", 16_000_000, secam_exact=True)
    dev = Encoder("l", 16_000_000)
    assert dev.secam_device and not exact.secam_device
    x = np.concatenate([exact.encode_block(b).reshape(-1)
                        for b in range(3)]).astype(np.float64)
    y = np.concatenate([dev.encode_block(b).reshape(-1)
                        for b in range(3)]).astype(np.float64)
    e = y - x
    assert np.abs(e).max() <= 1.0, f"max err {np.abs(e).max()}"
    snr = 10 * np.log10((x ** 2).sum() / max((e ** 2).sum(), 1e-12))
    assert snr >= 60.0, f"device-vs-oracle SNR {snr:.2f} dB"


def test_fm_absolute_phase_tracks():
    """With the deterministic reference build, our FM absolute phase must
    track the golden within a fraction of a radian for at least a frame
    (raw SNR > 25 dB over 2 frames)."""
    ref = _golden_iq("palfm_16M_2frames.c16")
    enc = Encoder("pal-fm", 16_000_000)
    ours = np.concatenate(
        [enc.encode_block(b) for b in range(2)])
    n = min(len(ref), len(ours))
    r = ref[:n].astype(np.float64)
    e = ours[:n].astype(np.float64) - r
    snr = 10 * np.log10((r ** 2).sum() / (e ** 2).sum())
    assert snr >= 25.0, f"FM raw SNR {snr:.2f} dB"


def test_two_channel_mux_golden(tmp_path):
    """Two-transmitter mux (BASELINE config #5 / README:90): channel 1
    at -2.25 MHz captured to a file, channel 2 at +2.25 MHz adds it via
    --passthru (src/video.c:3517-3541)."""
    ref2 = _golden_iq("mux_2ch_2f.c16")
    ch1_golden = os.path.join(GOLDEN, "mux_ch1_2f.c16")

    # our channel 1 must match the reference's channel 1 capture
    enc1 = Encoder("i", 20_000_000, offset=-2_250_000)
    ours1 = np.concatenate([enc1.encode_frame(f).reshape(-1)
                            for f in range(2)])
    ref1 = np.fromfile(ch1_golden, dtype=np.int16).astype(np.float64)
    e = ours1.astype(np.float64) - ref1[:len(ours1)]
    snr1 = 10 * np.log10((ref1[:len(ours1)] ** 2).sum()
                         / max((e ** 2).sum(), 1e-12))
    assert snr1 > 40.0, snr1

    # channel 2 sums the reference's channel-1 stream via passthru
    enc2 = Encoder("i", 20_000_000, offset=2_250_000,
                   passthru=ch1_golden)
    ours2 = np.concatenate([enc2.encode_frame(f).reshape(-1)
                            for f in range(2)])
    r2 = ref2.reshape(-1)[:len(ours2)].astype(np.float64)
    e2 = ours2.astype(np.float64) - r2
    snr2 = 10 * np.log10((r2 ** 2).sum() / max((e2 ** 2).sum(), 1e-12))
    assert snr2 > 40.0, snr2


def test_device_mux_matches_passthru_chain(tmp_path):
    """MuxEncoder sums whole channel blocks on device with int16
    wraparound — byte-identical to the reference's --passthru chaining
    of the same channels (channel 1 captured to a file and re-added
    during channel 2's encode)."""
    from hacktv_tpu.mux import MuxEncoder

    ch1 = Encoder("i", 20_000_000, offset=-2_250_000)
    dump = tmp_path / "ch1.c16"
    np.concatenate([ch1.encode_frame(f).reshape(-1)
                    for f in range(2)]).astype(np.int16).tofile(dump)

    chain = Encoder("i", 20_000_000, offset=2_250_000,
                    passthru=str(dump))
    want = np.concatenate([chain.encode_frame(f) for f in range(2)])

    mux = MuxEncoder([Encoder("i", 20_000_000, offset=-2_250_000),
                      Encoder("i", 20_000_000, offset=2_250_000)])
    got = np.concatenate([mux.encode_block(b) for b in range(2)])
    assert np.array_equal(got, want[:len(got)])
