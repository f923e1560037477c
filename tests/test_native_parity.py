"""Native-runtime fast paths vs their numpy oracles.

Each native function added for the host bit pipelines keeps its numpy
formulation as the reference; these tests pin byte-exact equivalence so
either side can be changed safely (the golden dumps only cover the
configurations make_golden.sh captures)."""

import itertools

import numpy as np
import pytest

from hacktv_tpu import runtime

pytestmark = pytest.mark.skipif(not runtime.available(),
                                reason="native runtime unavailable")


def test_mac_audio_blocks_native_matches_numpy():
    from hacktv_tpu.audio.mac_audio import MacAudioEnc
    rng = np.random.default_rng(7)
    for hq, st, lin, pr in itertools.product([1, 0], [1, 0], [0, 1],
                                             [0, 1]):
        a = MacAudioEnc(high_quality=hq, stereo=st, protection=pr,
                        linear=lin)
        b = MacAudioEnc(high_quality=hq, stereo=st, protection=pr,
                        linear=lin)
        b._no_native = True
        for _ in range(3):
            n = int(rng.integers(1, 80))
            S = rng.integers(-32768, 32768,
                             (n, a.src_samples_per_block))
            assert a._encode_blocks(S.copy()) == b._encode_blocks(
                S.copy()), (hq, st, lin, pr)
        assert np.array_equal(a.fir[0].hist, b.fir[0].hist)
        assert a.fir[0].phase == b.fir[0].phase


def test_nicam_frames_native_matches_numpy():
    import hacktv_tpu.audio.nicam as nicam
    rng = np.random.default_rng(11)
    hist = nicam.J17_NTAPS - 1
    for trial in range(4):
        n = int(rng.integers(1, 120))
        ff = int(rng.integers(0, 1 << 20))
        mode = [nicam.MODE_STEREO, nicam.MODE_DUAL_MONO][trial % 2]
        pcm = rng.integers(-32768, 32768, (n * 32 + hist, 2))
        a = nicam.encode_frames(pcm, ff, mode, trial % 2)
        nicam._NO_NATIVE = True
        try:
            b = nicam.encode_frames(pcm, ff, mode, trial % 2)
        finally:
            nicam._NO_NATIVE = False
        assert np.array_equal(np.asarray(a), np.asarray(b)), trial


def _mux_stream(mode, no_native, frames=6, **kw):
    from hacktv_tpu.video.mac import MacEncoder
    if "eurocrypt" in kw:
        from hacktv_tpu.services.eurocrypt import Eurocrypt
        kw = dict(kw, eurocrypt=Eurocrypt(kw["eurocrypt"],
                                          now=1_200_000_000))
    if "teletext" in kw:
        # the rolling-header clock defaults to wall time; the A/B runs
        # would otherwise diverge whenever they straddle a second
        kw = dict(kw, teletext_clock=lambda: 1_200_000_000)
    enc = MacEncoder(mode, 20_250_000, **kw)
    mux = enc.mux
    if no_native:
        mux._no_native = True
        mux.audio._no_native = True
    out = []
    for b in range(frames):
        k0 = b * 625
        mux.ensure(k0 + 625)
        p, pol = mux.bits_block(k0 - 1, k0 + 626)
        s = mux.scramble_block(k0, k0 + 625)
        out.append((p.tobytes(), pol.tobytes(),
                    tuple(a.tobytes() for a in s)))
        mux.prune(k0 + 623)
    return out


@pytest.mark.parametrize("mode,kw", [
    ("dmac", {}),
    ("d2mac", {}),
    ("dmac", {"teletext": "tests/data/demo.tti"}),
    ("d2mac-fm", {"eurocrypt": "filmnet"}),
    ("dmac", {"scramble_video": 2, "scramble_audio": True}),
])
def test_mac_mux_native_matches_numpy(mode, kw):
    assert _mux_stream(mode, False, **kw) == _mux_stream(mode, True,
                                                         **kw)
