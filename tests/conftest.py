"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh (the standard JAX trick for
exercising pjit/shard_map sharding without TPU hardware).  This image's
sitecustomize force-registers the 'axon' TPU platform and prepends it to
jax_platforms regardless of the JAX_PLATFORMS env var, so the override must
happen through jax.config AFTER import — env vars alone do not stick.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", jax.default_backend()
