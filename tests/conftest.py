import os

# Tests run on the CPU backend with a virtual 8-device mesh so sharding
# logic is exercised without TPU hardware.  Env vars alone are not enough:
# the axon TPU plugin can win backend selection even with JAX_PLATFORMS
# set, so also force it through the config API before first use.
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_platform_name", "cpu")
