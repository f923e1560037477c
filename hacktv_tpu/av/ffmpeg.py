"""ffmpeg-based AV input (host side).

The reference links libavcodec and runs five decode/scale/resample
threads (src/av_ffmpeg.c).  Here decode stays on the host CPU either
way, so we drive the `ffmpeg` *binary* through two pipes — one decoding
video to raw RGB24 frames at the target frame rate and size, one
decoding audio to 32 kHz stereo s16le (the reference's fixed internal
audio format, src/hacktv.h:31) — and hand the frames to the device
pipeline.  Gated: raises a clear error when no ffmpeg binary is on
PATH.
"""

from __future__ import annotations

import shutil
import subprocess

import numpy as np

AUDIO_RATE = 32000


class FFmpegSource:
    def __init__(self, path: str, width: int, height: int,
                 frame_rate=(25, 1), loop: bool = False):
        if shutil.which("ffmpeg") is None:
            raise SystemExit(
                "ffmpeg input requires the ffmpeg binary on PATH "
                "(not present in this environment); use 'test' or 'raw:'")
        self.path = path
        self.width = width
        self.height = height
        self.interlaced = 0
        self.loop = loop
        num, den = (frame_rate.num, frame_rate.den) \
            if hasattr(frame_rate, "num") else frame_rate
        self._vproc = subprocess.Popen(
            ["ffmpeg", "-nostdin", "-v", "error", "-i", path,
             "-f", "rawvideo", "-pix_fmt", "rgb24",
             "-vf", f"scale={width}:{height}",
             "-r", f"{num}/{den}", "-"],
            stdout=subprocess.PIPE)
        self._aproc = subprocess.Popen(
            ["ffmpeg", "-nostdin", "-v", "error", "-i", path,
             "-f", "s16le", "-acodec", "pcm_s16le",
             "-ar", str(AUDIO_RATE), "-ac", "2", "-"],
            stdout=subprocess.PIPE)
        self._frame_no = -1
        self._frame = np.zeros((height, width, 3), dtype=np.uint8)
        self._eof = False
        # bounded sliding audio window: consumers pull nearly
        # monotonically with < 1 s of lookback (limiter/J17 history),
        # so old history is pruned instead of concatenating forever
        self._audio = np.zeros((0, 2), dtype=np.int16)
        self._audio_base = 0           # stream pair index of _audio[0]
        self._audio_keep = 4 * AUDIO_RATE
        self._audio_eof = False

    def read_video(self, frame_no: int) -> np.ndarray:
        while self._frame_no < frame_no and not self._eof:
            raw = self._vproc.stdout.read(self.width * self.height * 3)
            if len(raw) < self.width * self.height * 3:
                self._eof = True
                break
            self._frame = np.frombuffer(raw, dtype=np.uint8).reshape(
                self.height, self.width, 3).copy()
            self._frame_no += 1
        return self._frame

    def read_audio(self, start: int, count: int) -> np.ndarray:
        if start < self._audio_base:
            raise ValueError(
                f"audio seek before the sliding window ({start} < "
                f"{self._audio_base}); increase the keep margin")
        need = start + count
        while self._audio_base + len(self._audio) < need \
                and not self._audio_eof:
            have = self._audio_base + len(self._audio)
            raw = self._aproc.stdout.read(4 * max(need - have, AUDIO_RATE))
            if not raw:
                self._audio_eof = True
                break
            chunk = np.frombuffer(raw[:len(raw) // 4 * 4],
                                  dtype=np.int16).reshape(-1, 2)
            self._audio = np.concatenate([self._audio, chunk])
        out = np.zeros((count, 2), dtype=np.int16)
        lo = start - self._audio_base
        got = self._audio[lo:lo + count]
        out[:len(got)] = got
        # prune consumed history beyond the lookback margin
        drop = lo - self._audio_keep
        if drop > 0:
            self._audio = self._audio[drop:]
            self._audio_base += drop
        return out

    def eof(self, frame_no: int) -> bool:
        return self._eof and frame_no > self._frame_no

    def close(self) -> None:
        for p in (self._vproc, self._aproc):
            if p.poll() is None:
                p.kill()
            p.wait()
