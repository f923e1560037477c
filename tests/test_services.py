"""VBI service tests: WSS golden parity and teletext waveform decode."""
import os

import numpy as np
import pytest

from hacktv_tpu import Encoder

GOLDEN = "/tmp/golden"
DEMO_TTI = "/root/reference/src/demo.tti"


def test_wss_golden():
    path = os.path.join(GOLDEN, "pal_wss_2frames.s16")
    if not os.path.exists(path):
        pytest.skip("golden missing; run tools/make_golden.sh")
    ref = np.fromfile(path, dtype=np.int16)
    enc = Encoder("pal", 16_000_000, wss="auto")
    ours = np.concatenate([enc.encode_frame(f) for f in range(2)])
    n = min(len(ref), len(ours))
    r = ref[:n].astype(np.float64)
    e = ours[:n].astype(np.float64) - r
    snr = 10 * np.log10((r ** 2).sum() / (e ** 2).sum())
    assert snr >= 40.0, f"WSS SNR {snr:.2f} dB"


def test_teletext_decode_roundtrip():
    if not os.path.exists(DEMO_TTI):
        pytest.skip("reference demo.tti not available")
    # pin the clock: a real-time second rollover mid-frame inserts an
    # extra 8/30 packet and shifts the schedule into lines 9/22
    enc = Encoder("pal", 16_000_000, teletext=DEMO_TTI,
                  teletext_clock=lambda: 1_200_000_000)
    Y = enc.encode_frame(0).reshape(-1, enc.params.width)
    p = enc.params
    off = p.pixel_rate * (12e-6 - (64e-6 / 444 * 12))
    bw = p.width / 444.0
    centers = (off + np.arange(360) * bw).round().astype(int)
    lvl = round((p.white_level - p.black_level) * 0.66)
    pkts = []
    for j in list(range(6, 22)) + list(range(319, 335)):
        bits = (Y[j][centers] > lvl / 2).astype(np.uint8)
        by = np.packbits(bits, bitorder="little")
        if by[0] == 0x55 and by[1] == 0x55 and by[2] == 0x27:
            pkts.append((j, by))
    # 8/30 + header + (20ms gap) + page rows in the second field
    assert len(pkts) >= 15
    assert pkts[0][0] == 6          # line 7: 8/30 clock packet
    assert pkts[0][1][3] == 0x15    # hamming84(mag 8 | pkt30 lsb)
    assert pkts[0][1][4] == 0xEA    # hamming84(15)
    # the 20ms header-to-row rule leaves lines 9..22 of field 1 empty
    lines_used = {p_[0] for p_ in pkts}
    assert 8 not in lines_used and 21 not in lines_used


def test_teletext_crc_and_parity():
    from hacktv_tpu.services.teletext import crc16, HAMMING84, _PARITY
    # CRC over a known vector is stable and 16-bit
    assert crc16(b"hello world") & 0xFFFF == crc16(b"hello world")
    assert crc16(b"a") != crc16(b"b")
    # parity table: odd parity over 8 bits
    for v in range(0x80):
        assert bin(int(_PARITY[v])).count("1") & 1 == 1
    # hamming84 table values are distinct
    assert len(set(int(h) for h in HAMMING84)) == 16


def _svc_golden(name, mode, rate, nb=2, **kw):
    path = os.path.join(GOLDEN, name)
    if not os.path.exists(path):
        pytest.skip("golden missing")
    ref = np.fromfile(path, dtype=np.int16)
    enc = Encoder(mode, rate, **kw)
    ours = np.concatenate(
        [enc.encode_block(b) for b in range(nb)])
    n = min(len(ref), len(ours))
    r = ref[:n].astype(np.float64)
    e = ours[:n].astype(np.float64) - r
    return 10 * np.log10((r ** 2).sum() / (e ** 2).sum())


def test_vits_vitc_golden():
    snr = _svc_golden("pal_vits_vitc_2frames.s16", "pal", 16_000_000,
                      vits=True, vitc=True)
    assert snr >= 40.0, f"VITS+VITC SNR {snr:.2f} dB"


def test_acp_golden():
    snr = _svc_golden("pal_acp_2frames.s16", "pal", 16_000_000, acp=True)
    assert snr >= 40.0, f"ACP SNR {snr:.2f} dB"


def test_services_combo_golden():
    """All 625-line VBI services stacked on one signal: the reference
    composes them per-line with no interaction (src/hacktv.c:1184-1437
    validates, src/video.c renders each independently)."""
    snr = _svc_golden("pal_services_combo_2frames.s16", "pal", 16_000_000,
                      wss="auto", vits=True, vitc=True, acp=True,
                      cc608=True)
    assert snr >= 40.0, f"combined-services SNR {snr:.2f} dB"


def test_syster_vits_combo_golden():
    """Scrambler + VBI service combination: VITS lines pass through the
    Syster line shuffle like any other active line."""
    snr = _svc_golden("pal_syster_vits_4frames.s16", "pal", 16_000_000,
                      nb=4, syster="premiere-fa", vits=True)
    assert snr >= 40.0, f"syster+vits SNR {snr:.2f} dB"


def test_cc608_golden():
    snr = _svc_golden("ntsc_cc608_2frames.s16", "ntsc", 14318181,
                      cc608=True)
    assert snr >= 40.0, f"CC608 SNR {snr:.2f} dB"


def test_videocrypt1_golden():
    snr = _svc_golden("pal_vc1_4frames.s16", "pal", 16_000_000, nb=4,
                      videocrypt="free")
    assert snr >= 40.0, f"Videocrypt I SNR {snr:.2f} dB"


def test_videocrypt1_conditional_golden():
    snr = _svc_golden("pal_vc1c_4frames.s16", "pal", 16_000_000, nb=4,
                      videocrypt="conditional")
    assert snr >= 40.0, f"Videocrypt I CA SNR {snr:.2f} dB"


def test_videocrypt2_golden():
    snr = _svc_golden("pal_vc2_4frames.s16", "pal", 16_000_000, nb=4,
                      videocrypt2="free")
    assert snr >= 40.0, f"Videocrypt II SNR {snr:.2f} dB"


def test_videocrypts_golden():
    snr = _svc_golden("pal_vcs_8frames.s16", "pal", 16_000_000, nb=8,
                      videocrypts="free")
    assert snr >= 40.0, f"Videocrypt S SNR {snr:.2f} dB"


def test_syster_shuffle_golden():
    snr = _svc_golden("pal_syster_4frames.s16", "pal", 16_000_000, nb=4,
                      syster="premiere-fa")
    assert snr >= 40.0, f"Syster SNR {snr:.2f} dB"


def _sha_golden(name, frames, fpb, **kw):
    """Long-horizon cadence check (verdict r3 item 6): encode `frames`
    frames across many blocks and compare per-frame sha256 digests
    against the reference capture — the regression net for multi-
    frame-block state bugs (commit 25b4f3a's class)."""
    import hashlib
    path = os.path.join(GOLDEN, name)
    if not os.path.exists(path):
        pytest.skip("golden missing")
    ref = open(path, "rb").read()
    enc = Encoder("pal", 16_000_000, frames_per_block=fpb, **kw)
    fbytes = enc.frame_samples * 2
    nb = -(-frames // fpb)
    buf = b""
    done = 0
    for b in range(nb):
        buf += enc.encode_block(b).tobytes()
        while len(buf) >= fbytes and done < frames:
            h = hashlib.sha256(buf[:fbytes]).digest()
            exp = ref[done * 32:(done + 1) * 32]
            assert h == exp, f"{name}: frame {done} differs"
            buf = buf[fbytes:]
            done += 1
    assert done == min(frames, len(ref) // 32)


def test_videocrypts_full_table_period():
    """VCS across its full 256-frame shuffle-table cycle (one full
    period of videocrypts-sequence.h), spanning 17 encoder blocks."""
    _sha_golden("pal_vcs_260f.sha", 260, 16, videocrypts="free")


def test_syster_full_cw_cycle():
    """Syster across one full 50-frame CW cycle (PRBS reset on frames
    6/31, syster.c:706-718), spanning 7 encoder blocks."""
    _sha_golden("pal_syster_52f.sha", 52, 8, syster="premiere-fa")


def test_videocrypt1_16_frames():
    _sha_golden("pal_vc1_16f.sha", 16, 4, videocrypt="free")


def test_videocrypt2_16_frames():
    _sha_golden("pal_vc2_16f.sha", 16, 4, videocrypt2="free")


def test_systercnr_golden():
    snr = _svc_golden("pal_systercnr_4frames.s16", "pal", 16_000_000, nb=4,
                      systercnr="premiere-fa")
    assert snr >= 40.0, f"Syster CNR SNR {snr:.2f} dB"


def test_syster_combined_golden():
    snr = _svc_golden("pal_systerfull_4frames.s16", "pal", 16_000_000,
                      nb=4, syster="premiere-fa", systercnr="premiere-fa")
    assert snr >= 40.0, f"Syster shuffle+CNR SNR {snr:.2f} dB"


def test_d11_golden():
    snr = _svc_golden("pal_d11_6frames.s16", "pal", 16_000_000, nb=6,
                      d11="premiere-fa")
    assert snr >= 40.0, f"Discret 11 SNR {snr:.2f} dB"


def test_syster_audio_inversion_golden():
    """PAL-I with Syster video scrambling + audio spectrum inversion."""
    path = os.path.join(GOLDEN, "pali_systeraudio_2frames.c16")
    if not os.path.exists(path):
        pytest.skip("golden missing")
    ref = np.fromfile(path, dtype=np.int16).reshape(-1, 2)
    enc = Encoder("i", 16_000_000, syster="premiere-fa", systeraudio=True)
    ours = np.concatenate(
        [enc.encode_block(b) for b in range(2)])
    n = min(len(ref), len(ours))
    r = ref[:n].astype(np.float64)
    e = ours[:n].astype(np.float64) - r
    snr = 10 * np.log10((r ** 2).sum() / (e ** 2).sum())
    assert snr >= 40.0, f"systeraudio SNR {snr:.2f} dB"
    q = 10 * np.log10((r[:, 1] ** 2).sum() / (e[:, 1] ** 2).sum())
    assert q >= 60.0, f"audio-carrier SNR {q:.2f} dB"


def test_syster_ca_cipher():
    """encrypt_syster_cw vs vectors from the reference syster-ca.c."""
    from hacktv_tpu.services.syster_ca import encrypt_syster_cw
    data = [0xFF, 0x01, 0x11, 0x00, 0x21, 0x92, 0x21, 0x92]
    key = [0xC4, 0xA5, 0xA8, 0x18, 0x74, 0x93, 0xC7, 0x65]
    ecm = [(i if (i < 4 or i > 11) else data[i - 4]) for i in range(16)]
    cw = encrypt_syster_cw(ecm, key)
    assert cw == 0x060402000F0E0D0C
    assert bytes(ecm).hex() == "03b3e56debb4e4e3b53a2973dfbfb031"
    key2 = [0x00, 0xAE, 0x52, 0x90, 0x49, 0xF1, 0xF1, 0xBB]
    ecm = [((i * 7 + 1) & 0xFF if (i < 4 or i > 11) else data[i - 4])
           for i in range(16)]
    cw = encrypt_syster_cw(ecm, key2)
    assert cw == 0x0C1E10026A635C55
    assert bytes(ecm).hex() == "38e7661dc880e1c1751672e857a5f87c"


def _snr_c16(name, mode, rate, nb=2, **kw):
    path = os.path.join(GOLDEN, name)
    if not os.path.exists(path):
        pytest.skip("golden missing")
    ref = np.fromfile(path, dtype=np.int16).reshape(-1, 2)
    enc = Encoder(mode, rate, **kw)
    ours = np.concatenate(
        [enc.encode_block(b) for b in range(nb)])
    n = min(len(ref), len(ours))
    r = ref[:n].astype(np.float64)
    e = ours[:n].astype(np.float64) - r
    return 10 * np.log10((r ** 2).sum() / (e ** 2).sum())


def test_pal_bg_golden():
    snr = _snr_c16("palg_16M_2frames.c16", "g", 16_000_000)
    assert snr >= 40.0, f"PAL B/G SNR {snr:.2f} dB"


def test_a2stereo_bg_golden():
    snr = _snr_c16("palg_a2_2frames.c16", "g", 16_000_000, a2stereo=True)
    assert snr >= 40.0, f"A2 B/G SNR {snr:.2f} dB"


def test_a2stereo_m_golden():
    snr = _snr_c16("ntscm_a2_2frames.c16", "m", 13_513_500, a2stereo=True)
    assert snr >= 40.0, f"A2 System M SNR {snr:.2f} dB"


def test_sis_golden():
    """Sound-in-syncs on PAL-I, compared from output sample 0: the
    reference's warm-up burst spill onto line 1 (vbidata_render's
    zero-width boundary redirect, incl. its OOB lut reads) is emulated
    exactly (services/sis.py _warmup_spill), as is the int16 wraparound
    its over-range video+audio sum produces."""
    path = os.path.join(GOLDEN, "pali_sis_4frames.c16")
    if not os.path.exists(path):
        pytest.skip("golden missing")
    ref = np.fromfile(path, dtype=np.int16).reshape(-1, 2)
    enc = Encoder("i", 16_000_000, sis="dcsis")
    ours = np.concatenate(
        [enc.encode_block(b) for b in range(4)])
    n = min(len(ref), len(ours))
    r = ref[:n].astype(np.float64)
    d = ours[:n].astype(np.float64) - r
    assert np.abs(d).max() <= 4, f"SiS max dev {np.abs(d).max()} LSB"
    snr = 10 * np.log10((r ** 2).sum() / (d ** 2).sum())
    assert snr >= 70.0, f"SiS SNR {snr:.2f} dB"
    # the quit bursts themselves must be near-exact
    w = enc.params.width
    nl = n // w * w
    rr = ref[:nl].reshape(-1, w, 2)[:, :80, 0].astype(np.float64)
    ee = ours[:nl].reshape(-1, w, 2)[:, :80, 0].astype(np.float64) - rr
    qsnr = 10 * np.log10((rr ** 2).sum() / (ee ** 2).sum())
    assert qsnr >= 60.0, f"SiS quit-region SNR {qsnr:.2f} dB"


def test_sis_warmup_spill_values():
    """The reconstructed warm-up burst spill (services/sis.py
    _warmup_spill) must match the per-sample sums captured from an
    instrumented reference build (vbidata_render write log, i mode at
    16 MS/s) — pins the flat-lut layout, the glibc chunk-header
    prefix, and the OOB read emulation without needing a golden."""
    enc = Encoder("i", 16_000_000, sis="dcsis")
    svc = [s for s in enc.services if type(s).__name__ == "SiS"][0]
    measured = [6876, 12402, 5113, -4132, 784, 12377,
                8955, -1495, 4491, 9866, -157, -4233]
    got = svc.warmup_spill[:12].astype(np.int64)
    wrapped = ((got + 32768) % 65536) - 32768
    assert wrapped.tolist() == measured


def test_teletext_waveform_golden():
    """Teletext line 7-22/320-335 waveforms vs the reference capture
    (clock pinned both sides, tools/make_golden.sh teletext patch)."""
    import os
    path = os.path.join(GOLDEN, "pal_tt_2frames.s16")
    if not os.path.exists(path):
        pytest.skip("golden missing")
    ref = np.fromfile(path, dtype=np.int16)
    tti = os.path.join(os.path.dirname(__file__), "data", "demo.tti")
    enc = Encoder("pal", 16_000_000, teletext=tti,
                  teletext_clock=lambda: 1_200_000_000)
    ours = np.concatenate([enc.encode_frame(f) for f in range(2)])
    r = ref[:len(ours)].astype(np.float64)
    e = ours.astype(np.float64) - r
    snr = 10 * np.log10(np.sum(r ** 2) / max(np.sum(e ** 2), 1e-12))
    assert snr > 40.0, snr


def test_cc608_source_feed(tmp_path):
    """A53-style per-frame caption pairs from the AV source reach the
    CC608 FIFO and render on line 21 (src/av_ffmpeg.c:566-581,
    src/video.c:4899-4903)."""
    from hacktv_tpu.av.rawfile import RawFileSource
    w, h = 100, 50
    frame = np.zeros((h, w, 4), dtype=np.uint8)
    raw = tmp_path / "v.raw"
    raw.write_bytes(frame.tobytes() * 3)
    np.array([[0x94, 0x2C], [0x41, 0x42], [0, 0]],
             dtype=np.uint8).tofile(str(raw) + ".cc608")
    src = RawFileSource(str(raw), w, h)
    assert src.read_cc608(0) == (0x94, 0x2C)

    enc = Encoder("ntsc", 13_500_000, source=src, cc608=True)
    y1 = enc.encode_frame(0).reshape(-1, enc.params.width)
    enc2 = Encoder("ntsc", 13_500_000, source=RawFileSource(str(raw), w, h))
    y2 = enc2.encode_frame(0).reshape(-1, enc2.params.width)
    line = 21
    assert not np.array_equal(y1[line - 1], y2[line - 1])


def test_teletext_raw_packets_golden():
    """raw: 42-byte packet input incl. the partial-tail feof behaviour
    (src/teletext.c:1081-1201): the wrap emits one empty line, a short
    tail yields no packet."""
    path = os.path.join(GOLDEN, "pal_ttraw_2frames.s16")
    if not os.path.exists(path):
        pytest.skip("golden missing")
    ref = np.fromfile(path, dtype=np.int16)
    fixture = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "data", "raw_tt_packets.bin")
    enc = Encoder("pal", 16_000_000, teletext=f"raw:{fixture}")
    ours = np.concatenate([enc.encode_frame(f) for f in range(2)])
    n = min(len(ref), len(ours))
    r = ref[:n].astype(np.float64)
    e = ours[:n].astype(np.float64) - r
    snr = 10 * np.log10((r ** 2).sum() / max((e ** 2).sum(), 1e-12))
    assert snr >= 40.0, f"raw teletext SNR {snr:.2f} dB"


def test_vits_vitc_525_golden():
    """525-line VITS/VITC placement (lines 17/280, 14/277+2)."""
    snr = _svc_golden("ntsc_vits_vitc_2frames.s16", "ntsc", 13_500_000,
                      vits=True, vitc=True)
    assert snr >= 40.0, f"525 VITS+VITC SNR {snr:.2f} dB"


def test_acp_525_golden():
    """525-line ACP (lines 12-19 / 275-282)."""
    snr = _svc_golden("ntsc_acp_2frames.s16", "ntsc", 13_500_000,
                      acp=True)
    assert snr >= 40.0, f"525 ACP SNR {snr:.2f} dB"


def test_vits_vitc_525_4xfsc_golden():
    """14318181 Hz has a 17.5M-sample carrier period (no exact LUT
    rows): the service chroma mixes via the angle-addition fallback."""
    snr = _svc_golden("ntsc143_vits_vitc_2frames.s16", "ntsc", 14_318_181,
                      vits=True, vitc=True)
    assert snr >= 40.0, f"4xfsc VITS+VITC SNR {snr:.2f} dB"


def test_syster_providers_golden():
    """Non-default Syster/D11 providers (different keys, dates, tables,
    VBI offsets) — run with a 16-frame block to cover the lookahead
    cache-retention path the CLI uses."""
    for name, kw in [("pal_syster_pca_2frames.s16",
                      dict(syster="premiere-ca")),
                     ("pal_syster_cfrfa_2frames.s16", dict(syster="cfrfa")),
                     ("pal_d11_cfrfa_2frames.s16", dict(d11="cfrfa"))]:
        path = os.path.join(GOLDEN, name)
        if not os.path.exists(path):
            pytest.skip("golden missing")
        ref = np.fromfile(path, dtype=np.int16)
        enc = Encoder("pal", 16_000_000, frames_per_block=16, **kw)
        ours = enc.encode_block(0).reshape(-1)
        n = min(len(ref), len(ours))
        r = ref[:n].astype(np.float64)
        e = ours[:n].astype(np.float64) - r
        snr = 10 * np.log10((r ** 2).sum() / max((e ** 2).sum(), 1e-12))
        assert snr >= 40.0, f"{name}: {snr:.2f} dB"


def test_syster_vbi_survives_large_blocks():
    """The VBI byte cache must retain a whole encoder block: at
    frames_per_block=16 the lookahead generates past the block before
    the early VBI lines are gathered."""
    path = os.path.join(GOLDEN, "pal_syster_4frames.s16")
    if not os.path.exists(path):
        pytest.skip("golden missing")
    ref = np.fromfile(path, dtype=np.int16)
    enc = Encoder("pal", 16_000_000, syster="premiere-fa",
                  frames_per_block=16)
    ours = enc.encode_block(0).reshape(-1)
    n = min(len(ref), len(ours))
    r = ref[:n].astype(np.float64)
    e = ours[:n].astype(np.float64) - r
    snr = 10 * np.log10((r ** 2).sum() / max((e ** 2).sum(), 1e-12))
    assert snr >= 40.0, f"fpb=16 syster SNR {snr:.2f} dB"
