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
# Synchronous CPU dispatch: with async dispatch, a computation whose outputs
# were garbage-collected can still be EXECUTING when the next test starts
# (the drain fixture below only sees live arrays); on this 1-core host its
# 8-way collective rendezvous then starves against newly dispatched work and
# hard-aborts at the termination timeout (observed twice as a suite SIGABRT
# mid-run).  Synchronous dispatch removes the overlap entirely.
try:
    jax.config.update("jax_cpu_enable_async_dispatch", False)
except Exception:
    pass


import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _drain_async_dispatch():
    """Block on every live array after EACH test.

    On this 1-core host, two sharded computations interleaving on the
    shared device-thread pool can deadlock each other's collective
    rendezvous (exe A holds 5 workers waiting, exe B holds the rest) and
    hard-abort the process at the termination timeout — after pytest has
    already printed a green summary.  Draining between tests serializes
    cross-test dispatch.
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


_EXIT_STATUS = {}


def pytest_sessionfinish(session, exitstatus):
    _EXIT_STATUS["code"] = int(exitstatus)


@pytest.hookimpl(trylast=True)
def pytest_unconfigure(config):
    """Hard-exit with pytest's status, skipping interpreter teardown.

    On this host, XLA CPU device threads can enter a collective rendezvous
    during shutdown with the thread pool half torn down; the rendezvous
    termination then SIGABRTs ~10 minutes AFTER a green test summary,
    flipping the suite's exit code.  os._exit preserves the real result.
    """
    import sys

    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(_EXIT_STATUS.get("code", 0))
