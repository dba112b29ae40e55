"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware, the standard JAX
pattern (SURVEY.md section 4: test strategy item (e)). Must run before any
``import jax`` in the test process.
"""

import os

# force-override: the ambient environment may pin JAX_PLATFORMS to a real
# accelerator (e.g. a tunneled TPU); tests must run on the virtual CPU mesh
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
