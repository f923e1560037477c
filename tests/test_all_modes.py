"""Every registry mode constructs and encodes one block.

The golden tests cover waveform parity for the flagship modes; this
sweep guarantees the other registry entries (all 50, src/video.c:
1956-2008) at least run end-to-end at a modest rate without shape or
plumbing errors, and produce non-degenerate output."""

import numpy as np
import pytest

from hacktv_tpu import create_encoder
from hacktv_tpu.config.standards import get_mode, list_modes

# sensible small sample rate per lines standard (fast on the CPU
# backend; rate must give an integer-ish line width)
_RATES = {30: 100_000, 32: 100_000, 240: 2_000_000, 320: 2_000_000,
          405: 4_000_000, 525: 13_500_000, 625: 4_000_000,
          819: 20_000_000}

_MODES = [k for k, _ in list_modes()]


@pytest.mark.parametrize("mode", _MODES)
def test_mode_encodes(mode):
    conf = get_mode(mode)
    rate = 20_250_000 if conf.mac_mode is not None \
        else _RATES[conf.lines]
    enc = create_encoder(mode, rate)
    out = enc.encode_block(0)
    fs = enc.frame_samples
    assert len(out.reshape(-1)) in (fs, 2 * fs)
    a = out.reshape(-1).astype(np.int64)
    # non-degenerate: some signal structure present
    assert np.abs(a).max() > 1000
    assert len(np.unique(a[:fs])) > 4
