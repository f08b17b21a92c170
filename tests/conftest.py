"""Test configuration: force genuine local CPU with 8 virtual devices.

The container routes JAX through the 'axon' TPU tunnel by default
(PALLAS_AXON_POOL_IPS + sitecustomize registers the plugin at interpreter
startup, before conftest can run).  Tests must be hermetic: local CPU with
a virtual 8-device mesh, mirroring the reference's multi-rank-on-one-node
test strategy (SURVEY.md §4).  Since the plugin is already registered by
the time this file is imported, we re-exec the test process once with a
scrubbed environment.
"""

import os
import sys

_GUARD = "MGB_TESTS_REEXEC"

if os.environ.get("PALLAS_AXON_POOL_IPS") and not os.environ.get(_GUARD):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env[_GUARD] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.execve(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
