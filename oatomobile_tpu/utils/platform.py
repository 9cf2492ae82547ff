"""Platform/configuration helpers for awkward runtimes.

This container pins ``JAX_PLATFORMS=axon`` (a tunneled TPU with a remote
compile service of highly variable latency) through a sitecustomize hook,
so plain env vars cannot select the CPU backend.  These helpers must run
BEFORE any jax operation executes.
"""

import os

import jax


def force_cpu(num_devices: int = 1) -> None:
  """Switches jax to the (virtual multi-device) CPU backend."""
  jax.config.update("jax_platforms", "cpu")
  if num_devices > 1:
    jax.config.update("jax_num_cpu_devices", num_devices)


def enable_compilation_cache(
    cache_dir: str = os.path.join(os.path.expanduser("~"), ".cache",
                                  "jax_comp")) -> None:
  """Enables the persistent compilation cache (large win under the axon
  remote-compile path: reruns start in seconds instead of minutes)."""
  try:
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
  except Exception:  # Older jax without the knobs.
    pass
