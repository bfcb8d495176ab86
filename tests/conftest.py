"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip logic is tested without hardware the JAX-native way
(SURVEY.md §4): XLA's forced host platform device count.

Note: this environment's sitecustomize imports jax and registers a remote
TPU plugin (JAX_PLATFORMS=axon) before pytest starts, so env-var overrides
are too late — we must flip the already-imported jax config before the
backend initializes on first use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (already imported by sitecustomize; config still mutable)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
