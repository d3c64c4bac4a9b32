"""Test configuration: force an 8-virtual-device CPU platform so multi-chip
sharding paths are exercised without TPU hardware (the TPU-native analog of a
fake distributed backend — see SURVEY.md §4).

The environment may carry an `axon` TPU PJRT plugin whose sitecustomize
imports jax at interpreter start and sets jax_platforms="axon,cpu". Setting
env vars here is too late for that, but the jax *config* can still be
overridden before the first backend initialization — which is exactly what
this conftest does (a re-exec would lose pytest's captured stdout fd).
"""

import os

os.environ.setdefault("JAX_ENABLE_X64", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (may already be imported by the plugin's sitecustomize)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"
