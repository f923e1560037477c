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
    assert b"native" in r.stderr or b"bridge" in r.stderr


def test_cli_unknown_mode():
    r = _run(["-m", "nosuchmode", "--frames", "1", "test"])
    assert r.returncode != 0
