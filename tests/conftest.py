"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The container pins ``JAX_PLATFORMS=axon`` (a tunneled real TPU) and a
sitecustomize hook re-registers the axon plugin in every process, so env
vars alone do not stick — the platform must be forced via jax.config after
import.  ``JAX_NUM_CPU_DEVICES`` must be set before the backend initialises.
"""

import os

os.environ["JAX_NUM_CPU_DEVICES"] = "8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402  (import after env setup, on purpose)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
  return jax.devices()
