"""Multi-device sharding of the PRODUCTION synthesis step.

The dryrun entry (also used by the driver) shards Encoder._step_impl
over an 8-virtual-device CPU mesh via GSPMD output partitioning; these
tests assert bit-exact equality with the single-device step, and the
multi-host test runs the same step across 2 separate processes with
jax.distributed (DCN-style coordination)."""

import os
import socket
import subprocess
import sys

import pytest


def test_dryrun_multichip_8dev():
    import __graft_entry__ as g
    g.dryrun_multichip(8)        # asserts bit-exactness internally


def test_multihost_2proc():
    """Two OS processes, one CPU device each, one global mesh."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = str(s.getsockname()[1])
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "tests", "_multihost_worker.py")
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    env.pop("JAX_PLATFORM_NAME", None)
    procs = [subprocess.Popen([sys.executable, worker, str(i), port],
                              env=env, cwd=root,
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT)
             for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out.decode())
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i}: OK" in out, out


def test_cli_devices_flag_byte_identical(tmp_path):
    """A sharded production stream is user-reachable: the CLI's
    --devices flag must produce a byte-identical file."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               JAX_PLATFORM_NAME="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=2")
    outs = []
    for devflag in ([], ["--devices", "2"]):
        out = tmp_path / f"pal{len(devflag)}.s16"
        r = subprocess.run(
            [sys.executable, "-m", "hacktv_tpu", "-o", str(out),
             "-m", "pal", "--frames", "2", "--frames-per-block", "2",
             "test"] + devflag,
            capture_output=True, timeout=600, cwd=root, env=env)
        assert r.returncode == 0, r.stderr.decode()
        outs.append(out.read_bytes())
    assert outs[0] == outs[1], "sharded CLI output differs"


def test_cli_hosts_byte_identical(tmp_path):
    """Production multi-host streaming (SURVEY 2.10): two --hosts
    processes, each synthesizing a contiguous block range, must land
    one ordered file byte-identical to the single-process run."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu")
    base = ["-m", "i", "-s", "1000000", "--frames", "6",
            "--frames-per-block", "2", "test"]

    single = tmp_path / "single.c16"
    r = subprocess.run(
        [sys.executable, "-m", "hacktv_tpu", "-o", str(single)] + base,
        capture_output=True, timeout=600, cwd=root, env=env)
    assert r.returncode == 0, r.stderr.decode()

    multi = tmp_path / "multi.c16"
    procs = [subprocess.Popen(
        [sys.executable, "-m", "hacktv_tpu", "-o", str(multi),
         "--hosts", "2", "--host", str(i)] + base,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        cwd=root, env=env) for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out.decode())
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"host {i} failed:\n{out}"
    assert multi.exists(), "host 0 did not stitch the parts"
    assert not (tmp_path / "multi.c16.part0").exists()
    assert single.read_bytes() == multi.read_bytes(), \
        "multi-host stream differs from the single-process run"
