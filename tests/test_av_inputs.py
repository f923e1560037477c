"""AV input tests: the ffmpeg pipe source (via a fake ffmpeg binary,
so the whole pipe/probe path runs in CI) and the OpenCV fallback
decoder for environments without ffmpeg."""

import os
import subprocess
import sys
from fractions import Fraction

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FAKE = os.path.join(ROOT, "tests", "data", "fake_ffmpeg.py")


def _ffsrc(tmp_path, **kw):
    from hacktv_tpu.av.ffmpeg import FFmpegSource
    inp = tmp_path / "in.avi"
    inp.write_bytes(b"fake")
    return FFmpegSource(str(inp), 702, 576,
                        binary=[sys.executable, FAKE], **kw), inp


def test_ffmpeg_probe_par_and_native_size(tmp_path):
    src, _ = _ffsrc(tmp_path)
    # SAR 16:11 parsed from the probe (src/av_ffmpeg.c:606-620)
    assert src.pixel_aspect_ratio == Fraction(16, 11)
    # native decode size, not the active size — FitSource scales
    assert (src.width, src.height) == (64, 48)
    src.close()


def test_ffmpeg_video_and_audio_pipes(tmp_path):
    src, _ = _ffsrc(tmp_path)
    f0 = src.read_video(0)
    f2 = src.read_video(2)
    assert f0.shape == (48, 64, 3)
    assert f2[0, 0, 0] == 25 and f2[0, 0, 2] == 200
    assert not src.eof(4)
    src.read_video(10)
    assert src.eof(10)
    pcm = src.read_audio(0, 100)
    assert pcm.shape == (100, 2)
    assert pcm[50, 0] == 50 and pcm[50, 1] == -50
    src.close()


def test_ffmpeg_ffmt_fopts_passthrough(tmp_path):
    src, inp = _ffsrc(tmp_path, ffmt="rawvideo",
                      fopts="video_size=64x48:pixel_format=bgra")
    src.read_video(0)
    calls = (tmp_path / "in.avi.calls").read_text().splitlines()
    decode = [c for c in calls if c.endswith(" -")]
    assert decode, calls
    for c in decode:
        assert "-f rawvideo" in c.split("-i")[0]
        assert "-video_size 64x48" in c
        assert "-pixel_format bgra" in c
    src.close()


def test_ffmpeg_cc608_sidecar(tmp_path):
    from hacktv_tpu.av.ffmpeg import FFmpegSource
    inp = tmp_path / "in.avi"
    inp.write_bytes(b"fake")
    (tmp_path / "in.avi.cc608").write_bytes(bytes([0x14, 0x2C, 0x80,
                                                   0x80]))
    src = FFmpegSource(str(inp), 702, 576,
                       binary=[sys.executable, FAKE])
    assert src.read_cc608(0) == (0x14, 0x2C)
    assert src.read_cc608(1) == (0x80, 0x80)
    assert src.read_cc608(2) == (0, 0)
    src.close()


def test_a53_parser_mpeg2_reorder():
    """MPEG-2 ES: pairs re-ordered to display order via the picture
    temporal_reference; non-608 packets filtered
    ((b0 & 0x07) == 0x04, src/av_ffmpeg.c:566-581)."""
    sys.path.insert(0, os.path.join(ROOT, "tests", "data"))
    from fake_ffmpeg import mpeg2_es_fixture
    from hacktv_tpu.av.a53 import A53ESParser
    es = mpeg2_es_fixture()
    p = A53ESParser("mpeg2video")
    pairs = []
    # feed in awkward chunk sizes to exercise the partial-unit buffer
    for i in range(0, len(es), 7):
        pairs += p.feed(es[i:i + 7])
    pairs += p.feed(b"", final=True)
    assert p.pictures == 5
    assert pairs == [(0x20 + n, 0x40 + n) for n in range(5)]


def test_a53_parser_h264_sei():
    from hacktv_tpu.av.a53 import A53ESParser
    cc = bytes([0xFC, 0x31, 0x51])
    t35 = bytes([0xB5, 0x00, 0x31]) + b"GA94\x03" \
        + bytes([0x41, 0xFF]) + cc
    sei = b"\x00\x00\x01\x06" + bytes([4, len(t35)]) + t35 + b"\x80"
    slc = b"\x00\x00\x01\x65" + b"\xAA" * 6
    p = A53ESParser("h264")
    pairs = p.feed(sei + slc + b"\x00\x00\x01\x65" + b"\xBB" * 4,
                   final=True)
    assert p.pictures == 2
    assert pairs == [(0x31, 0x51)]


def test_a53_parser_h265_sei():
    """H.265 prefix SEI (NAL type 39) carries the same ITU-T T.35
    GA94 payload; pictures are counted at VCL NALs with
    first_slice_segment_in_pic_flag set (src/av_ffmpeg.c:566-581 is
    codec-agnostic through libav side data)."""
    from hacktv_tpu.av.a53 import A53ESParser
    cc = bytes([0xFC, 0x32, 0x52])
    t35 = bytes([0xB5, 0x00, 0x31]) + b"GA94\x03" \
        + bytes([0x41, 0xFF]) + cc
    # 2-byte NAL header: type 39 (prefix SEI) = (39 << 1), layer/tid
    sei = b"\x00\x00\x01" + bytes([39 << 1, 0x01]) \
        + bytes([4, len(t35)]) + t35 + b"\x80"
    # IDR_W_RADL (type 19) slice with first_slice flag set (MSB of the
    # first RBSP byte), then a non-first slice segment of the same pic
    slc = b"\x00\x00\x01" + bytes([19 << 1, 0x01]) + b"\xAA" * 6
    slc2 = b"\x00\x00\x01" + bytes([19 << 1, 0x01]) + b"\x2A" * 6
    p = A53ESParser("hevc")
    pairs = p.feed(sei + slc + slc2
                   + b"\x00\x00\x01" + bytes([1 << 1, 0x01])
                   + b"\xBB" * 4, final=True)
    assert p.pictures == 2          # slc2 continues the first picture
    assert pairs == [(0x32, 0x52)]


def test_ffmpeg_in_stream_a53(tmp_path):
    """No side-car: captions come from the codec-copied elementary
    stream, drained one pair per frame like the reference's FIFO."""
    from hacktv_tpu.av.ffmpeg import FFmpegSource
    inp = tmp_path / "captioned.avi"
    inp.write_bytes(b"fake")
    src = FFmpegSource(str(inp), 702, 576,
                       binary=[sys.executable, FAKE])
    for n in range(5):
        assert src.read_cc608(n) == (0x20 + n, 0x40 + n), n
    assert src.read_cc608(5) == (0, 0)
    calls = (tmp_path / "captioned.avi.calls").read_text()
    assert "copy" in calls
    src.close()


def test_cli_in_stream_a53_matches_sidecar(tmp_path):
    """The real CLI path with a captioned input renders the same
    line-21 waveform as the identical pairs fed via the side-car —
    the in-stream extractor is equivalent upstream of the proven
    renderer."""
    import shutil
    bindir = tmp_path / "bin"
    bindir.mkdir()
    wrap = bindir / "ffmpeg"
    wrap.write_text(f"#!{sys.executable}\n"
                    + open(FAKE).read())
    wrap.chmod(0o755)
    env = dict(os.environ, PATH=f"{bindir}:{os.environ['PATH']}",
               JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu")

    pairs = bytes(sum(([0x20 + n, 0x40 + n] for n in range(5)), []))
    outs = []
    for name, sidecar in (("captioned.avi", None),
                          ("plain.avi", pairs)):
        inp = tmp_path / name
        inp.write_bytes(b"fake")
        if sidecar is not None:
            (tmp_path / (name + ".cc608")).write_bytes(sidecar)
        out = tmp_path / (name + ".s16")
        r = subprocess.run(
            [sys.executable, "-m", "hacktv_tpu", "-o", str(out),
             "-m", "m", "--cc608", "--frames", "4",
             "--frames-per-block", "1", f"ffmpeg:{inp}"],
            capture_output=True, timeout=600, cwd=ROOT, env=env)
        assert r.returncode == 0, r.stderr.decode()
        outs.append(out.read_bytes())
    assert outs[0] == outs[1]


# ---------------------------------------------------------------------------
# OpenCV fallback


def _write_avi(path, n=6, w=64, h=48):
    cv2 = pytest.importorskip("cv2")
    wr = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"MJPG"),
                         25, (w, h))
    assert wr.isOpened()
    for f in range(n):
        img = np.zeros((h, w, 3), np.uint8)
        img[:, :, 2] = 40 * f + 20        # red ramp (BGR order)
        wr.write(img)
    wr.release()


def test_opencv_source_decode(tmp_path):
    from hacktv_tpu.av.videofile import OpenCVSource
    avi = tmp_path / "m.avi"
    _write_avi(avi)
    src = OpenCVSource(str(avi), 702, 576, frame_rate=(25, 1))
    assert (src.width, src.height) == (64, 48)
    f0 = src.read_video(0)
    f3 = src.read_video(3)
    # BGR -> RGB: the ramp is in the red channel
    assert abs(int(f3[5, 5, 0]) - 140) < 25
    assert not src.eof(5)
    src.read_video(10)
    assert src.eof(10)
    src.close()


def test_cli_video_file_input(tmp_path):
    """A video file input drives the full CLI encode via the OpenCV
    fallback (no ffmpeg binary in this environment)."""
    pytest.importorskip("cv2")
    avi = tmp_path / "m.avi"
    _write_avi(avi)
    out = tmp_path / "o.s16"
    r = subprocess.run(
        [sys.executable, "-m", "hacktv_tpu", "-o", str(out), "-m",
         "pal", "--fit", "fit", "--frames", "1", str(avi)],
        capture_output=True, timeout=600, cwd=ROOT)
    assert r.returncode == 0, r.stderr.decode()
    mine = np.fromfile(out, dtype=np.int16)
    assert len(mine) == 640000
    r2 = subprocess.run(
        [sys.executable, "-m", "hacktv_tpu", "-o", str(out) + ".t",
         "-m", "pal", "--frames", "1", "test"],
        capture_output=True, timeout=600, cwd=ROOT)
    card = np.fromfile(str(out) + ".t", dtype=np.int16)
    assert not np.array_equal(mine, card)


def test_multi_frame_blocks_match_single_frame():
    """Moving sources with frames_per_block > 1: frames are stacked
    per block, converted on device through the reference's 16M LUT and
    gathered with absolute row indices — byte-identical to the
    fpb=1 stream."""
    from hacktv_tpu.encoder import Encoder

    class Moving:
        width, height = 160, 100
        interlaced = 0

        def __init__(self):
            rng = np.random.default_rng(5)
            self.frames = [rng.integers(0, 255, (100, 160, 3), np.uint8)
                           for _ in range(12)]

        def read_video(self, k):
            return self.frames[min(k, 11)]

        def read_audio(self, start, count):
            t = np.arange(start, start + count)
            return np.stack([(1000 * np.sin(t * 0.01)).astype(np.int16)]
                            * 2, -1)

    a = Encoder("i", 16_000_000, frames_per_block=4, source=Moving())
    assert a._multi_frame
    b = Encoder("i", 16_000_000, frames_per_block=1, source=Moving())
    xa = np.concatenate([a.encode_block(k).reshape(-1) for k in range(2)])
    xb = np.concatenate([b.encode_block(k).reshape(-1) for k in range(8)])
    assert np.array_equal(xa, xb)
