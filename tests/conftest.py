"""Test configuration: force a deterministic 8-device CPU mesh.

The reference has no unit tests at all (SURVEY.md §4); we add what it lacks.
Multi-device code is exercised on CPU via XLA's host-platform device count —
the standard JAX fake-mesh trick — so the whole suite runs without TPUs.
Pallas kernels auto-select interpret mode off-TPU (see rag_dpo_tpu.ops).
"""

import os

# Must be set before jax initializes its backends. The container pins
# JAX_PLATFORMS=axon (one real TPU) via sitecustomize; tests run on a CPU
# fake-mesh instead, so force cpu through jax.config (env alone is ignored
# once the axon plugin has registered).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs
