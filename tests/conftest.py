import os

# Fake an 8-device platform on CPU so mesh/sharding logic is exercised without
# a TPU pod — the same trick the reference notebooks use
# (examples/*.ipynb cell 0: xla_force_host_platform_device_count=10).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The env var JAX_PLATFORMS is overridden by the environment's TPU plugin;
# the config update below is authoritative.  Set MTGP_TPU_TESTS=1 to keep the
# real TPU backend so tests/test_pallas_tpu.py runs on hardware:
#   MTGP_TPU_TESTS=1 python -m pytest tests/test_pallas_tpu.py -q
import jax  # noqa: E402

if os.environ.get("MTGP_TPU_TESTS", "") != "1":
    jax.config.update("jax_platforms", "cpu")
