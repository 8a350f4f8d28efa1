"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharding paths are validated
on host-platform virtual devices (the driver separately dry-runs
__graft_entry__.dryrun_multichip). The axon TPU plugin force-registers
itself via sitecustomize, so the platform must be overridden through
jax.config, not just env vars.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# Persistent compilation cache: the suite's wall time is dominated by
# XLA CPU compiles of the big model graphs; repeated runs (same code,
# same shapes) skip them entirely. Only large compiles are stored.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# CM2_TEST_PLATFORM=axon (or tpu) runs the tpu-marked hardware tests on
# the real chip instead of the virtual CPU mesh (used for the decode
# top-k exactness tier; everything else stays CPU).
_want = os.environ.get("CM2_TEST_PLATFORM")
if _want:
    os.environ["JAX_PLATFORMS"] = _want
    jax.config.update("jax_platforms", _want)
