"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip logic is tested without hardware the JAX-native way
(SURVEY.md §4): XLA's forced host platform device count.

Environment quirks handled here:

* sitecustomize imports jax and registers a remote TPU plugin
  (JAX_PLATFORMS=axon) before pytest starts, so env-var overrides are too
  late for the PLATFORM — we flip the already-imported jax config instead.
* C++-level XLA flags (absl) are parsed at that same early jax import, so
  they can only be supplied via the process environment.  This box has ONE
  CPU core; 8 oversubscribed virtual devices can take >40s (the default
  termination timeout) to reach a collective rendezvous, which hard-aborts
  the process.  If the timeout flag is missing we re-exec pytest once with
  the right environment.
"""

import os
import sys

_TIMEOUT_FLAG = "--xla_cpu_collective_call_terminate_timeout_seconds=600"
_DEVICES_FLAG = "--xla_force_host_platform_device_count=8"

_flags = os.environ.get("XLA_FLAGS", "")
if "collective_call_terminate_timeout" not in _flags and not os.environ.get(
    "_DISTILLCLIP_REEXEC"
):
    env = dict(os.environ)
    env["XLA_FLAGS"] = f"{_flags} {_DEVICES_FLAG} {_TIMEOUT_FLAG}".strip()
    env["_DISTILLCLIP_REEXEC"] = "1"
    os.execvpe(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " " + _DEVICES_FLAG
    ).strip()

os.environ.setdefault("DISTILLCLIP_FLASH", "1")  # exercise kernels in tests

import jax  # noqa: E402  (already imported by sitecustomize; config still mutable)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")


import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _drain_async_dispatch():
    """Block on every live array before interpreter exit.

    Tests that inspect only shapes/dtypes can leave sharded computations
    in flight; on this 1-core host their collective rendezvous threads can
    still be parked at process exit and hard-abort (rendezvous termination)
    AFTER pytest prints its summary — flipping a green run into SIGABRT.
    """
    yield
    try:
        for arr in list(jax.live_arrays()):
            try:
                arr.block_until_ready()
            except Exception:
                pass
    except Exception:
        pass
