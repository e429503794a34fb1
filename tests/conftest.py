"""Test configuration: force an 8-device virtual CPU mesh.

The TPU-world way to test multi-chip sharding without a pod slice (SURVEY.md §4):
run on CPU with ``xla_force_host_platform_device_count=8``. The environment's
TPU plugin pins ``jax_platforms`` via jax.config at interpreter start, so the
env var alone is not enough — override through jax.config before any backend
initializes. Matmul precision is raised to HIGHEST so f32 parity tests against
torch are exact regardless of backend defaults.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
assert jax.default_backend() == "cpu"
