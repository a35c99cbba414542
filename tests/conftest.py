"""Test configuration: force a virtual 8-device CPU mesh.

Must run before the first `import jax` anywhere in the test process.
"""

import os
import sys

# Force override: this environment exports JAX_PLATFORMS=axon (the real TPU
# tunnel); tests must run on the virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon sitecustomize hook re-registers the TPU backend regardless of the
# env var, so the config update after import is what actually forces CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
