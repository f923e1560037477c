"""S/PDIF block encoder: vectorised output vs a direct transcription of
the reference algorithm (src/spdif.c:27-82)."""

import numpy as np


def _subframe_scalar(sample, pcm, c):
    sf = (pcm & 0xFFFF) << 12
    sf |= (c & 1) << 30
    for i in range(31):
        sf ^= ((sf >> i) & 1) << 31
    out = bytearray(8)
    out[0] = 0xE4 if sample & 1 else (0xE2 if sample else 0xE8)
    p = 1
    for i in range(4, 32):
        out[i >> 2] |= p << (7 - ((i & 3) << 1))
        p ^= (sf >> i) & 1
        out[i >> 2] |= p << (6 - ((i & 3) << 1))
        p ^= 1
    return bytes(out)


def _block_scalar(pcm):
    cs = bytearray(24)
    cs[0] = 1 << 5
    out = bytearray()
    for i in range(384):
        c = (cs[i >> 4] >> (7 - ((i >> 1) & 7))) & 1
        out += _subframe_scalar(i, int(pcm[i]) & 0xFFFF, c)
    return bytes(out)


def test_spdif_block_matches_scalar():
    from hacktv_tpu.audio.spdif import spdif_block
    rng = np.random.RandomState(42)
    pcm = rng.randint(-32768, 32768, 384).astype(np.int16)
    assert bytes(spdif_block(pcm)) == _block_scalar(pcm)


def test_spdif_silence():
    from hacktv_tpu.audio.spdif import spdif_block
    pcm = np.zeros(384, dtype=np.int16)
    assert bytes(spdif_block(pcm)) == _block_scalar(pcm)
