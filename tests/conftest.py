"""Test environment: force the CPU backend with 8 virtual devices so every multi-chip
sharding path runs without TPUs (SURVEY.md §4).

This image boots an `axon` TPU PJRT plugin from sitecustomize which force-sets
``jax_platforms="axon,cpu"`` at interpreter start, so env vars alone don't stick — we override
the config after import and clear any initialized backends.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from jax._src import xla_bridge as _xb  # noqa: E402

if _xb.backends_are_initialized():
    from jax.extend.backend import clear_backends

    clear_backends()

assert jax.devices()[0].platform == "cpu", jax.devices()
assert jax.device_count() == 8, jax.devices()
