"""DANCE / BS digital audio parity tests (mode ntsc-bs).

Bit-domain oracle: tools/make_golden.sh patches the reference to dump
each encoded 256-byte DANCE frame; our encoder must match byte-exactly.
Waveform oracle: conditional SNR vs the ntsc-bs FM capture (per-line
derotation as in test_rf_chain — the reference's FM phase carries an
uninitialised-memory random walk, see that module's docstring).
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


def test_dance_frames_bit_exact():
    path = _golden("dance_bits_100f.bin")
    golden = np.fromfile(path, dtype=np.uint8).reshape(-1, 256)
    from hacktv_tpu import Encoder
    enc = Encoder("ntsc-bs", 16_000_000)
    mine = enc.audio._dance_frames(0, len(golden))
    for f in range(len(golden)):
        assert np.array_equal(mine[f], golden[f]), f"frame {f} differs"


def test_dance_prn_interleave_ranges():
    """Structural self-checks on the DANCE tables."""
    from hacktv_tpu.audio import dance
    # the interleave is a bijection over the 2016 block bits
    assert len(np.unique(dance._ILEAVE)) == 2016
    # silence keeps range 7 (pattern 0xE8, shift 2: src/dance.c:114-130)
    assert dance.range_indices(np.zeros((1, 32), dtype=np.int64))[0] == 7
    assert dance.range_indices(np.full((1, 32), 32767))[0] == 0
    assert dance.range_indices(np.full((1, 32), -32768))[0] == 0
    assert dance.range_indices(np.full((1, 32), 255))[0] == 7
    assert dance.range_indices(np.full((1, 32), 256))[0] == 6


def test_ntsc_bs_waveform():
    """Strict raw parity: the DANCE DQPSK mix runs the reference's
    exact cint16 arithmetic (carrier LUT + int32 products), so the FM
    carrier no longer walks and the capture matches byte-for-byte."""
    from hacktv_tpu import Encoder
    ref = np.fromfile(_golden("ntscbs_16M_2frames.c16"), dtype=np.int16)
    enc = Encoder("ntsc-bs", 16_000_000)
    ours = np.concatenate(
        [enc.encode_block(b) for b in range(2)]).reshape(-1)
    n = min(len(ref), len(ours))
    r = ref[:n].astype(np.float64)
    e = ours[:n].astype(np.float64) - r
    snr = 10 * np.log10((r ** 2).sum() / max((e ** 2).sum(), 1e-12))
    assert snr >= 100.0, f"ntsc-bs raw SNR {snr:.2f} dB"


def test_dance_mode_b_decode_back():
    """Mode B (2x 48 kHz 16-bit linear; src/dance.c:283-351): the frame
    pair must carry every sample verbatim — deinterleave, strip PRN,
    check header/BCH, and recover the previous call's samples from the
    payload slots."""
    from hacktv_tpu.audio import dance
    rng = np.random.default_rng(9)
    pcm = rng.integers(-32768, 32768, (5 * 48, 2)).astype(np.int64)
    pre = dance.pre_emphasis_b(pcm.reshape(-1)).reshape(-1, 2)
    frames = dance.encode_frames_b(pre, 1)
    assert frames.shape == (4, 256)
    inv = np.argsort(dance._ILEAVE)
    for f in range(4):
        clear = frames[f] ^ dance._PRN
        bits = np.unpackbits(clear)
        assert np.packbits(bits[:16]).tobytes() == b"\x13\x5e"
        hdr2 = int(np.packbits(bits[16:24])[0])
        assert hdr2 >> 7 == 1                 # mode B flag
        assert (hdr2 >> 3) & 3 == 3           # channels 3/4 none
        blk = bits[32:][inv].reshape(32, 63)
        # BCH(63,56) re-encode must match
        contrib = np.where(blk[:, :56].astype(bool),
                           dance._BCH_MASKS[None, :], 0)
        code = np.bitwise_xor.reduce(contrib, axis=1)
        assert np.array_equal(
            blk[:, 56:], (code[:, None] >> np.arange(7)[None, :]) & 1)
        # payload: 96 16-bit samples of the PREVIOUS call (frame f maps
        # to pre block f since block 0 is the pre-first-call context)
        got = np.zeros(96, dtype=np.int64)
        v = blk[:, 1:49].reshape(32, 3, 16)
        w = (v << np.arange(15, -1, -1)[None, None, :]).sum(axis=2)
        got[:] = w.reshape(-1)
        sa = np.arange(96)
        want = pre[f * 48:(f + 1) * 48][sa >> 1, sa & 1] & 0xFFFF
        assert np.array_equal(got, want)
