"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware, the standard JAX
pattern (SURVEY.md section 4: test strategy item (e)).

NOTE: the ambient environment ships an 'axon' PJRT plugin that tunnels to a
real TPU and IGNORES the JAX_PLATFORMS env var; only a config update after
import reliably forces the CPU backend, so we do both.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()
