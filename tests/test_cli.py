"""CLI smoke tests: option parity surface + file-sink output."""

import os
import subprocess
import sys

import numpy as np
import pytest

GOLDEN = "/tmp/golden"


def _run(args):
    return subprocess.run([sys.executable, "-m", "hacktv_tpu"] + args,
                          capture_output=True, timeout=600,
                          cwd=os.path.dirname(os.path.dirname(
                              os.path.abspath(__file__))))


def test_list_modes_json():
    r = _run(["--list-modes", "--json"])
    assert r.returncode == 0
    import json
    modes = json.loads(r.stdout)["modes"]
    assert len(modes) == 50
    assert any(m["id"] == "i" for m in modes)


def test_cli_pal_capture(tmp_path):
    golden = os.path.join(GOLDEN, "pal_16M_4frames.s16")
    if not os.path.exists(golden):
        pytest.skip("golden missing")
    out = tmp_path / "pal.s16"
    r = _run(["-o", str(out), "-m", "pal", "--frames", "1", "test"])
    assert r.returncode == 0, r.stderr.decode()
    mine = np.fromfile(out, dtype=np.int16)
    ref = np.fromfile(golden, dtype=np.int16)[:len(mine)]
    assert len(mine) == 640000
    e = mine.astype(np.float64) - ref
    snr = 10 * np.log10((ref.astype(np.float64) ** 2).sum()
                        / max((e ** 2).sum(), 1e-12))
    assert snr > 40.0, snr


def test_cli_stdout_uint8(tmp_path):
    r = _run(["-o", "-", "-m", "pal", "--frames", "1", "-t", "uint8",
              "test"])
    assert r.returncode == 0, r.stderr.decode()
    assert len(r.stdout) == 640000


def test_cli_rejects_hw_sink():
    r = _run(["-o", "hackrf", "-m", "pal", "--frames", "1", "test"])
    assert r.returncode != 0
    assert b"libhackrf" in r.stderr


def test_cli_unknown_mode():
    r = _run(["-m", "nosuchmode", "--frames", "1", "test"])
    assert r.returncode != 0


def test_cli_raw_input_and_fit(tmp_path):
    """`raw:` input produces non-test-card output; FitSource letterboxes
    a smaller frame (src/hacktv.c:1502-1526 + av.c:103-220)."""
    # 2 frames of solid colour at a non-native size -> letterbox path
    w, h = 200, 100
    frame = np.zeros((h, w, 4), dtype=np.uint8)
    frame[..., 2] = 255          # red in 0xAARRGGBB little-endian (B,G,R,A)
    raw = tmp_path / "in.raw"
    raw.write_bytes(frame.tobytes() * 2)
    out = tmp_path / "o.s16"
    r = _run(["-o", str(out), "-m", "pal", "--fit", "fit", "--frames",
              "1", f"raw:{raw}:{w}x{h}"])
    assert r.returncode == 0, r.stderr.decode()
    mine = np.fromfile(out, dtype=np.int16)
    assert len(mine) == 640000
    # compare to the test card: must differ in the active region
    out2 = tmp_path / "t.s16"
    r = _run(["-o", str(out2), "-m", "pal", "--frames", "1", "test"])
    card = np.fromfile(out2, dtype=np.int16)
    assert not np.array_equal(mine, card)


def test_cli_mac_raw_input(tmp_path):
    """MAC modes take the CLI input list like any other mode
    (src/hacktv.c:1502-1576): a raw: frame must show up in the D2-MAC
    active video, and the golden motion capture must match when the
    same frames are fed."""
    golden = os.path.join(GOLDEN, "d2mac_motion_3frames.s16")
    bgra = os.path.join(GOLDEN, "motion_702x576.bgra")
    if not (os.path.exists(golden) and os.path.exists(bgra)):
        pytest.skip("golden missing")
    out = tmp_path / "mac.s16"
    r = _run(["-o", str(out), "-m", "d2mac", "-s", "20250000",
              "--frames", "2", f"raw:{bgra}:702x576"])
    assert r.returncode == 0, r.stderr.decode()
    mine = np.fromfile(out, dtype=np.int16).astype(np.float64)
    assert len(mine) == 2 * 810000
    ref = np.fromfile(golden, dtype=np.int16
                      ).astype(np.float64)[:len(mine)]
    e = mine - ref
    snr = 10 * np.log10((ref ** 2).sum() / max((e ** 2).sum(), 1e-12))
    assert snr > 60.0, snr


def test_cli_key_table_override(tmp_path):
    """--key-table-2 switches the Syster substitution table
    (src/hacktv.c:801-807, src/syster.c:509-514): the shuffle order and
    therefore the output must change."""
    a = tmp_path / "t1.s16"
    b = tmp_path / "t2.s16"
    r = _run(["-o", str(a), "-m", "pal", "--frames", "1", "--syster",
              "premiere-fa", "test"])
    assert r.returncode == 0, r.stderr.decode()
    r = _run(["-o", str(b), "-m", "pal", "--frames", "1", "--syster",
              "premiere-fa", "--key-table-2", "test"])
    assert r.returncode == 0, r.stderr.decode()
    assert a.read_bytes() != b.read_bytes()
    # --key-table-1 must equal the provider default (table 1)
    c = tmp_path / "t3.s16"
    r = _run(["-o", str(c), "-m", "pal", "--frames", "1", "--syster",
              "premiere-fa", "--key-table-1", "test"])
    assert r.returncode == 0, r.stderr.decode()
    assert a.read_bytes() == c.read_bytes()


def test_cli_verbose_report(tmp_path):
    """-v prints the vid_info()-style mode report and a samples/s
    counter (src/video.c:4846-4860)."""
    r = _run(["-o", str(tmp_path / "v.s16"), "-m", "pal", "--frames",
              "1", "-v", "test"])
    assert r.returncode == 0
    err = r.stderr.decode()
    assert "Video: 832x576 25.00 fps (full frame 1024x625)" in err
    assert "Sample rate: 16000000" in err
    assert "x realtime" in err


def test_cli_passthru_and_rawbb(tmp_path):
    """--passthru adds an external IQ stream; --raw-bb-file replaces the
    raster (src/video.c:3517-3541, 2406-2445)."""
    base = tmp_path / "base.s16"
    r = _run(["-o", str(base), "-m", "pal", "--frames", "1", "test"])
    assert r.returncode == 0, r.stderr.decode()

    # passthru: adding a stream of zeros must reproduce the base exactly
    zeros = tmp_path / "z.c16"
    zeros.write_bytes(b"\x00" * (640000 * 4))
    out = tmp_path / "pt.s16"
    r = _run(["-o", str(out), "-m", "pal", "--frames", "1",
              "--passthru", str(zeros), "test"])
    assert r.returncode == 0, r.stderr.decode()
    assert out.read_bytes() == base.read_bytes()

    # raw bb replay of a constant level
    bb = tmp_path / "bb.s16"
    np.full(2048, 0x200, np.int16).tofile(bb)
    out2 = tmp_path / "bb_out.s16"
    r = _run(["-o", str(out2), "-m", "pal", "--frames", "1",
              "--raw-bb-file", str(bb), "test"])
    assert r.returncode == 0, r.stderr.decode()
    got = np.fromfile(out2, dtype=np.int16)
    assert len(got) == 640000 and len(np.unique(got)) <= 3


def test_cli_pixelrate(tmp_path):
    out = tmp_path / "pr.s16"
    r = _run(["-o", str(out), "-m", "pal", "--pixelrate", "14750000",
              "--frames", "1", "test"])
    assert r.returncode == 0, r.stderr.decode()
    mine = np.fromfile(out, dtype=np.int16)
    assert len(mine) == 640000
    golden = os.path.join(GOLDEN, "pal_pr1475_2frames.s16")
    if os.path.exists(golden):
        ref = np.fromfile(golden, dtype=np.int16)[:len(mine)]
        e = mine.astype(np.float64) - ref
        snr = 10 * np.log10((ref.astype(np.float64) ** 2).sum()
                            / max((e ** 2).sum(), 1e-12))
        assert snr > 40.0, snr


def test_cli_hardware_sink_error_message():
    r = _run(["-o", "hackrf", "-m", "i", "--frames", "1", "test"])
    assert r.returncode != 0
    assert b"libhackrf" in r.stderr or b"hackrf" in r.stderr


def test_cli_mode_service_validation():
    """Cross-checks mirroring src/hacktv.c:1184-1437."""
    bad = [
        ["-m", "pal", "--acp", "--videocrypt", "free"],
        ["-m", "pal", "--videocrypt", "conditional",
         "--videocrypt2", "free"],
        ["-m", "pal", "--syster", "premiere-fa", "--d11", "premiere-fa"],
        ["-m", "ntsc", "--wss", "auto"],
        ["-m", "ntsc", "--syster", "premiere-fa"],
        ["-m", "405", "--vits"],
        ["-m", "ntsc", "--sis", "dcsis"],
        ["-m", "pal", "--ec-mat-rating", "3"],
    ]
    for argv in bad:
        r = _run(argv + ["--frames", "1", "test"])
        assert r.returncode != 0, argv
    # allowed: VC1+VC2 both free, syster+systercnr
    r = _run(["-o", "/dev/null", "-m", "pal", "--videocrypt", "free",
              "--videocrypt2", "free", "--frames", "1", "test"])
    assert r.returncode == 0, r.stderr.decode()


def test_pal_motion_multi_frame_golden(tmp_path):
    """Moving video through the multi-frame raster path vs the
    REFERENCE encoding the same raw frames (at the native active size,
    so both scalers are identity).  Validates the on-device LUT
    conversion + stacked row gathers against the reference, not just
    self-consistency.  (The capture's last partial frame covers the
    reference's EOF transition and is excluded.)"""
    golden = os.path.join(GOLDEN, "pal_motion_5frames.s16")
    bgra = os.path.join(GOLDEN, "motion_832x576.bgra")
    if not (os.path.exists(golden) and os.path.exists(bgra)):
        pytest.skip("golden missing")
    from hacktv_tpu.encoder import Encoder
    from hacktv_tpu.av.rawfile import RawFileSource
    src = RawFileSource(bgra, 832, 576)
    enc = Encoder("pal", 16_000_000, frames_per_block=4, source=src)
    assert enc._multi_frame
    ours = enc.encode_block(0).reshape(-1)
    ref = np.fromfile(golden, dtype=np.int16)[: len(ours)]
    e = ours.astype(np.float64) - ref
    r = ref.astype(np.float64)
    snr = 10 * np.log10((r ** 2).sum() / max((e ** 2).sum(), 1e-9))
    assert snr >= 60.0, f"motion multi-frame SNR {snr:.1f} dB"


def test_cli_profiler_trace(tmp_path):
    """--profile captures a JAX profiler trace of the encode loop
    (SURVEY §5 tracing: profiler traces + samples/s counters)."""
    prof = tmp_path / "trace"
    r = _run(["-o", "/dev/null", "-m", "pal", "--frames", "1",
              "--profile", str(prof), "test"])
    assert r.returncode == 0, r.stderr.decode()
    assert b"profiler trace written" in r.stderr
    found = list(prof.rglob("*.xplane.pb")) + \
        list(prof.rglob("*.trace.json.gz"))
    assert found, list(prof.rglob("*"))
