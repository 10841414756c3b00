"""Test configuration: force a virtual 8-device CPU platform.

The rebuild's analogue of the reference's `mpirun -n 8` on localhost
(SURVEY.md §4b): shard_map + ppermute run on faked host devices, so the
distributed tests need no TPU or cluster.  Must run before jax imports.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# REPLACE any pre-existing device-count flag (a leftover =4 from the README's
# CLI recipe would otherwise survive and abort the whole session at the
# device-count assert below) — hermetic means our count wins
toks = [t for t in os.environ.get("XLA_FLAGS", "").split()
        if not t.startswith("--xla_force_host_platform_device_count")]
os.environ["XLA_FLAGS"] = " ".join(
    toks + ["--xla_force_host_platform_device_count=8"])

import jax  # noqa: E402

# the axon TPU plugin force-sets jax_platforms="axon,cpu" at import, ignoring
# the env var — override it back so tests are hermetic on (8 virtual) CPUs
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # f64 golden/bit-match paths

assert jax.device_count() == 8, f"expected 8 virtual CPU devices, got {jax.devices()}"
