"""Test harness: force an 8-device CPU mesh so multi-chip sharding logic is
exercised without TPU hardware (SURVEY.md §4: multi-host logic testable on CPU
with an 8-device CPU mesh)."""
import os
import sys

# Force CPU: the ambient environment sets JAX_PLATFORMS=axon (the real-TPU
# relay, which serializes every JAX process through one tunnel); tests must
# run on local CPU devices.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# This platform's default matmul precision quantizes fp32 matmuls (bf16
# passes); goldens need exact fp32. Production code pins precision explicitly
# where it matters (geometry/resize) and feeds bf16 inputs where it doesn't.
# (The env var is not honored by this jax build; set the config after import.)
import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
