import atexit
import os
import sys

# Tests run on a virtual 8-device CPU mesh: fast compiles, and shard_map /
# pjit multi-chip paths are exercised without TPU hardware. This image
# pre-sets JAX_PLATFORMS=axon (tunneled TPU), so we must override, not
# setdefault — otherwise the whole suite runs over the TPU tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon sitecustomize pins jax_platforms to "axon,cpu" at interpreter
# start, overriding the env var; force CPU via the config instead.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persistent compilation cache: the suite's compile-heavy jitted steps are
# reused across test runs.
os.makedirs("/tmp/jax_cache_cpu", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# This image registers a TPU PJRT plugin ("axon") from sitecustomize at
# interpreter start. When JAX_PLATFORMS=cpu leaves that plugin registered but
# never initialized, interpreter teardown blocks for minutes on its pending
# connection. Our atexit handler is registered after the plugin's, so it runs
# first (LIFO) and hard-exits with the real pytest status, skipping the hang.
_exit_status = {"code": 0}


def pytest_sessionfinish(session, exitstatus):
    _exit_status["code"] = int(exitstatus)


if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    atexit.register(lambda: (sys.stdout.flush(), sys.stderr.flush(),
                             os._exit(_exit_status["code"])))
