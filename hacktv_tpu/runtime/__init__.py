"""Native host runtime bindings.

The C++ runtime (native/hacktv_rt.cpp) provides the streaming plumbing the
TPU pipeline needs on the host side: a bounded byte FIFO with prefill/EOF
semantics (reference: src/fifo.c), sample-format conversion kernels
(src/rf_file.c:34-277, src/rf_hackrf.c:246-308, src/rf_fl2k.c:96-183) and a
threaded file sink that overlaps disk IO with device compute.

The library is built on demand with the in-tree Makefile; all consumers can
fall back to pure numpy (see hacktv_tpu.rf) if the toolchain is missing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

# HACKTV_RT_DIR points the loader at an alternative build of the
# native runtime (tools/run_sanitizers.sh uses it for TSAN/ASAN
# instrumented builds)
_NATIVE_DIR = os.environ.get("HACKTV_RT_DIR") or os.path.join(
    os.path.dirname(__file__), os.pardir, os.pardir, "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libhacktv_rt.so"))
_SRC_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "hacktv_rt.cpp"))

_lock = threading.Lock()
_lib = None
_load_error: Exception | None = None

# rt_type enum (must match native/hacktv_rt.cpp)
TYPE_IDS = {"uint8": 0, "int8": 1, "uint16": 2, "int16": 3,
            "int32": 4, "float": 5}
TYPE_NP = {"uint8": np.uint8, "int8": np.int8, "uint16": np.uint16,
           "int16": np.int16, "int32": np.int32, "float": np.float32}


def _build() -> None:
    if (os.path.exists(_LIB_PATH)
            and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC_PATH)):
        return
    subprocess.run(["make", "-C", os.path.dirname(_SRC_PATH)],
                   check=True, capture_output=True)


def load():
    """Build (if stale) and load the native runtime; raises on failure."""
    global _lib, _load_error
    with _lock:
        if _lib is not None:
            return _lib
        if _load_error is not None:
            raise _load_error
        try:
            _build()
            lib = ctypes.CDLL(_LIB_PATH)
        except Exception as e:  # toolchain or dlopen failure
            _load_error = e
            raise
        _declare(lib)
        _lib = lib
        return lib


def available() -> bool:
    try:
        load()
        return True
    except Exception:
        return False


def _declare(lib) -> None:
    c = ctypes
    lib.rt_fifo_create.restype = c.c_void_p
    lib.rt_fifo_create.argtypes = [c.c_size_t, c.c_size_t]
    lib.rt_fifo_destroy.argtypes = [c.c_void_p]
    lib.rt_fifo_write.restype = c.c_long
    lib.rt_fifo_write.argtypes = [c.c_void_p, c.c_void_p, c.c_size_t]
    lib.rt_fifo_read.restype = c.c_long
    lib.rt_fifo_read.argtypes = [c.c_void_p, c.c_void_p, c.c_size_t]
    lib.rt_fifo_read_nowait.restype = c.c_long
    lib.rt_fifo_read_nowait.argtypes = [c.c_void_p, c.c_void_p, c.c_size_t]
    lib.rt_fifo_close_writer.argtypes = [c.c_void_p]
    lib.rt_fifo_abort.argtypes = [c.c_void_p]
    lib.rt_fifo_level.restype = c.c_long
    lib.rt_fifo_level.argtypes = [c.c_void_p]

    lib.rt_convert_iq.restype = c.c_size_t
    lib.rt_convert_iq.argtypes = [c.c_void_p, c.c_size_t, c.c_void_p,
                                  c.c_int, c.c_int]
    lib.rt_convert_hackrf_iq8.argtypes = [c.c_void_p, c.c_size_t, c.c_void_p]
    lib.rt_convert_hackdac_bb.argtypes = [c.c_void_p, c.c_size_t, c.c_void_p,
                                          c.c_int16]
    lib.rt_convert_fl2k_u8.argtypes = [c.c_void_p, c.c_size_t, c.c_void_p,
                                       c.c_int]
    lib.rt_fl2k_dither_u8.argtypes = [c.c_void_p, c.c_size_t, c.c_size_t,
                                      c.c_void_p, c.c_void_p]
    lib.rt_fm_carrier_exact.argtypes = [c.c_void_p, c.c_void_p, c.c_size_t,
                                        c.c_void_p, c.c_int32, c.c_void_p]
    lib.rt_iir1_exact.argtypes = [c.c_void_p, c.c_size_t, c.c_double,
                                  c.c_double, c.c_double, c.c_void_p,
                                  c.c_void_p]
    lib.rt_iir1_exact_i16.argtypes = [c.c_void_p, c.c_size_t, c.c_double,
                                      c.c_double, c.c_double, c.c_void_p,
                                      c.c_void_p]
    lib.rt_fir_block_i16.argtypes = [c.c_void_p, c.c_long, c.c_long,
                                     c.c_void_p, c.c_long, c.c_void_p,
                                     c.c_int]
    lib.rt_secam_carrier_exact.argtypes = [
        c.c_void_p, c.c_long, c.c_long, c.c_long, c.c_void_p, c.c_void_p,
        c.c_void_p, c.c_void_p, c.c_int32, c.c_void_p, c.c_void_p,
        c.c_int]
    lib.rt_mac_prbs1.argtypes = [c.c_void_p, c.c_long, c.c_void_p]
    lib.rt_mac_prbs2.argtypes = [c.c_void_p, c.c_long, c.c_void_p]
    lib.rt_vc_clock16.argtypes = [c.c_void_p, c.c_long, c.c_void_p]
    lib.rt_ng_event.argtypes = [c.c_void_p, c.c_void_p, c.c_void_p]
    lib.rt_mac_encode_packet.argtypes = [c.c_int, c.c_int, c.c_void_p,
                                         c.c_int, c.c_uint64, c.c_void_p]
    lib.rt_mac_encode_packets.argtypes = [
        c.c_long, c.c_void_p, c.c_void_p, c.c_void_p, c.c_void_p,
        c.c_void_p, c.c_void_p, c.c_void_p, c.c_int]
    lib.rt_mac_mux_replay.argtypes = [
        c.c_long, c.c_void_p, c.c_void_p, c.c_void_p, c.c_void_p,
        c.c_void_p, c.c_void_p, c.c_void_p, c.c_void_p, c.c_void_p,
        c.c_void_p, c.c_void_p, c.c_void_p, c.c_void_p, c.c_void_p,
        c.c_void_p, c.c_int]
    lib.rt_nicam_encode_frames.argtypes = [
        c.c_void_p, c.c_long, c.c_void_p, c.c_int, c.c_void_p,
        c.c_void_p, c.c_void_p, c.c_void_p, c.c_long, c.c_int,
        c.c_int, c.c_void_p]
    lib.rt_mac_audio_blocks.argtypes = [
        c.c_void_p, c.c_long, c.c_long, c.c_int, c.c_int, c.c_int,
        c.c_void_p, c.c_int, c.c_int, c.c_void_p, c.c_void_p,
        c.c_void_p, c.c_void_p, c.c_void_p]
    lib.rt_mac_materialize.argtypes = [
        c.c_long, c.c_long, c.c_long, c.c_void_p, c.c_void_p, c.c_int,
        c.c_void_p, c.c_void_p, c.c_void_p, c.c_void_p, c.c_void_p,
        c.c_void_p, c.c_void_p, c.c_void_p, c.c_int]
    lib.rt_mac_encode_packet_packed.argtypes = [
        c.c_int, c.c_int, c.c_void_p, c.c_int, c.c_uint64, c.c_void_p]
    lib.rt_mac_mux_replay_packed.argtypes = [
        c.c_long, c.c_void_p, c.c_void_p, c.c_void_p, c.c_void_p,
        c.c_void_p, c.c_void_p, c.c_void_p, c.c_void_p, c.c_void_p,
        c.c_void_p, c.c_void_p, c.c_void_p, c.c_int64, c.c_void_p,
        c.c_int64, c.c_void_p, c.c_void_p, c.c_int]
    lib.rt_mac_materialize_packed.argtypes = [
        c.c_long, c.c_long, c.c_long, c.c_void_p, c.c_void_p, c.c_int,
        c.c_void_p, c.c_void_p, c.c_void_p, c.c_void_p, c.c_void_p,
        c.c_void_p, c.c_void_p, c.c_void_p, c.c_int]

    lib.rt_file_sink_open.restype = c.c_void_p
    lib.rt_file_sink_open.argtypes = [c.c_char_p, c.c_int, c.c_int,
                                      c.c_size_t]
    lib.rt_file_sink_write.restype = c.c_long
    lib.rt_file_sink_write.argtypes = [c.c_void_p, c.c_void_p, c.c_size_t]
    lib.rt_file_sink_close.restype = c.c_long
    lib.rt_file_sink_close.argtypes = [c.c_void_p]


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


class Fifo:
    """Bounded byte FIFO with prefill + EOF semantics (src/fifo.c model)."""

    def __init__(self, capacity: int, prefill: int = 0):
        self._lib = load()
        self._h = self._lib.rt_fifo_create(capacity, prefill)
        if not self._h:
            raise MemoryError("rt_fifo_create failed")

    def write(self, data: bytes | np.ndarray) -> int:
        a = np.frombuffer(data, np.uint8) if isinstance(data, (bytes, bytearray)) \
            else np.ascontiguousarray(data).view(np.uint8).ravel()
        return self._lib.rt_fifo_write(self._h, _ptr(a), a.nbytes)

    def read(self, n: int, nowait: bool = False) -> bytes | None:
        """Read up to n bytes.  Returns b"" on EOF (blocking read) or
        underrun (nowait read), and None on abort / nowait-EOF — the
        native API's -1, which callers must be able to distinguish from
        an empty read."""
        out = np.empty(n, np.uint8)
        fn = (self._lib.rt_fifo_read_nowait if nowait
              else self._lib.rt_fifo_read)
        r = fn(self._h, _ptr(out), n)
        if r < 0:
            return None
        return out[:r].tobytes()

    def close_writer(self) -> None:
        self._lib.rt_fifo_close_writer(self._h)

    def abort(self) -> None:
        self._lib.rt_fifo_abort(self._h)

    def level(self) -> int:
        return self._lib.rt_fifo_level(self._h)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.rt_fifo_destroy(self._h)
            self._h = None


def convert_iq(iq: np.ndarray, dtype: str, complex_out: bool) -> np.ndarray:
    """Convert interleaved int16 IQ to the sink byte format (native kernel)."""
    lib = load()
    iq = np.ascontiguousarray(iq, np.int16)
    samples = iq.size // 2
    n = samples * (2 if complex_out else 1)
    out = np.empty(n, TYPE_NP[dtype])
    lib.rt_convert_iq(_ptr(iq), samples, _ptr(out), TYPE_IDS[dtype],
                      1 if complex_out else 0)
    return out


def convert_hackrf_iq8(iq: np.ndarray) -> np.ndarray:
    lib = load()
    iq = np.ascontiguousarray(iq, np.int16)
    out = np.empty(iq.size, np.int8)
    lib.rt_convert_hackrf_iq8(_ptr(iq), iq.size // 2, _ptr(out))
    return out


def convert_hackdac_bb(iq: np.ndarray, sync_level: int = -9000) -> np.ndarray:
    lib = load()
    iq = np.ascontiguousarray(iq, np.int16)
    samples = iq.size // 2
    out = np.empty(samples * 2, np.uint8)
    lib.rt_convert_hackdac_bb(_ptr(iq), samples, _ptr(out), sync_level)
    return out


def convert_fl2k_u8(iq: np.ndarray, channel: int) -> np.ndarray:
    lib = load()
    iq = np.ascontiguousarray(iq, np.int16)
    samples = iq.size // 2
    out = np.empty(samples, np.uint8)
    lib.rt_convert_fl2k_u8(_ptr(iq), samples, _ptr(out), channel)
    return out


class Fl2kDither:
    """Stateful first-order delta-sigma 16->8 bit audio dither (per channel)."""

    def __init__(self):
        self._lib = load()
        self._err = np.zeros(1, np.int32)

    def process(self, pcm: np.ndarray, stride: int = 1) -> np.ndarray:
        pcm = np.ascontiguousarray(pcm, np.int16)
        n = pcm.size // stride
        out = np.empty(n, np.uint8)
        self._lib.rt_fl2k_dither_u8(_ptr(pcm), n, stride, _ptr(out),
                                    _ptr(self._err))
        return out


class FmCarrierExact:
    """Exact reference FM audio-carrier generator (src/video.c:2218-2276):
    int32 phase times quantised per-sample-value LUT phasor, truncating
    >>31 multiplies, atan2 renorm every 32767 samples.  Stateful and
    strictly sequential in the absolute output-sample index."""

    def __init__(self, frequency: float, deviation: float,
                 sample_rate: int, level_int: int):
        self._lib = load()
        r = np.arange(-32768, 32768, dtype=np.float64)
        d = 2.0 * np.pi / sample_rate * (frequency + r / 32767.0
                                         * deviation)
        M = 2147483647.0

        def lround(x):
            return np.where(x >= 0, np.floor(x + 0.5),
                            -np.floor(-x + 0.5))
        lut = np.empty((65536, 2), np.int32)
        lut[:, 0] = lround(np.cos(d) * M)
        lut[:, 1] = lround(np.sin(d) * M)
        self._lut = np.ascontiguousarray(lut)
        self.level = int(level_int)
        # [phase_i, phase_q, counter] (src/video.c:2223-2226)
        self._state = np.array([2147483647, 0, 32767], np.int64)
        self.n = 0           # absolute sample index of the state

    def process(self, samples: np.ndarray, n0: int,
                emit: bool = True) -> np.ndarray | None:
        """Generate the packed int32 (i | q<<16) carrier for output
        samples [n0, n0+len).  n0 must continue the stream; a rewind
        restarts from sample 0 (the caller re-feeds the prefix with
        emit=False)."""
        if n0 != self.n:
            raise ValueError(f"carrier stream discontinuity: {n0} != "
                             f"{self.n}")
        samples = np.ascontiguousarray(samples, np.int16)
        out = np.empty(len(samples), np.int32) if emit else None
        self._lib.rt_fm_carrier_exact(
            _ptr(self._state), _ptr(samples), len(samples),
            _ptr(self._lut), self.level,
            _ptr(out) if emit else None)
        self.n += len(samples)
        return out

    def reset(self) -> None:
        self._state[:] = (2147483647, 0, 32767)
        self.n = 0


class NativeFileSink:
    """Threaded file sink: conversion + buffered write off the main thread."""

    def __init__(self, path: str, dtype: str = "int16",
                 complex_out: bool = True, fifo_bytes: int = 64 << 20):
        self._lib = load()
        self._h = self._lib.rt_file_sink_open(
            path.encode(), TYPE_IDS[dtype], 1 if complex_out else 0,
            fifo_bytes)
        if not self._h:
            raise OSError(f"cannot open sink {path!r}")

    def write(self, iq: np.ndarray) -> None:
        iq = np.ascontiguousarray(iq, np.int16)
        if self._lib.rt_file_sink_write(self._h, _ptr(iq), iq.size // 2) < 0:
            raise OSError("sink write failed")

    def close(self) -> None:
        if self._h:
            r = self._lib.rt_file_sink_close(self._h)
            self._h = None
            if r < 0:
                raise OSError("sink close reported IO error")

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
