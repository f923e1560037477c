"""Worker for the 2-process multi-host sharding test (CPU backend).

Each process contributes one CPU device to a global 2-device mesh; the
production PAL-I step is jitted with time-partitioned output and every
process checks its own shard bit-exactly against a locally computed
single-device reference.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS", "")

import jax  # noqa: E402

# env vars alone are not enough: the axon TPU plugin can win backend
# selection, so force CPU through the config API too (see conftest.py)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_platform_name", "cpu")

pid = int(sys.argv[1])
port = sys.argv[2]
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=pid)

# Build the cross-process Gloo context NOW, while the two processes are
# still in lockstep from the initialize() rendezvous.  The first
# collective otherwise runs after the multi-minute production-step
# compile, and on a loaded host the processes can arrive there more
# than 30 s apart — past Gloo's context-init key-value deadline
# (observed: "GetKeyValue() timed out with key: cpu:gloo/...").
from jax.experimental import multihost_utils  # noqa: E402
multihost_utils.sync_global_devices("gloo-context-warmup")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from hacktv_tpu import Encoder  # noqa: E402

# direct trig: the piecewise FM rotation chain can contract differently
# between the two compilations (see audio/synth.FMStatics.direct)
enc = Encoder("i", 1_000_000, frames_per_block=8, fm_direct_trig=True)
rgb = enc._device_rgb(1)
m = enc._block_meta(1)
dev, bufs = enc._pack_args(enc._audio_args(1))
args = (rgb, m["base"], m["nxt"], m["burst"], m["vswitch"], m["vy"],
        m["al"], m["ar"], m["cos0"], m["sin0"], m["lut_row"],
        m["fsc"], m["fscf"], m["prv"], jnp.float32(1.0), dev, bufs)

# local single-device reference (deterministic, identical in both procs)
ref = enc._step(*args)
ref0 = np.asarray(ref[0] if isinstance(ref, tuple) else ref)

assert len(jax.devices()) == 2, jax.devices()
mesh = Mesh(np.array(jax.devices()), ("t",))
out_shard = NamedSharding(mesh, P("t", None))
rep = NamedSharding(mesh, P())
nouts = len(ref) if isinstance(ref, tuple) else 1
outs = ((out_shard,) + (rep,) * (nouts - 1)) if nouts > 1 else out_shard

sharded = jax.jit(enc._step_impl, out_shardings=outs)
out = sharded(*args)
out0 = out[0] if isinstance(out, tuple) else out

B = ref0.shape[0]
half = B // 2
for shard in out0.addressable_shards:
    lo = shard.index[0].start or 0
    local = np.asarray(shard.data)
    if not np.array_equal(local, ref0[lo:lo + local.shape[0]]):
        print(f"proc {pid}: shard mismatch at {lo}", flush=True)
        sys.exit(1)
print(f"proc {pid}: OK shard rows {half}", flush=True)
