"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via
``xla_force_host_platform_device_count`` (the JAX-native fake backend).
Must run before jax is imported anywhere.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The machine's sitecustomize registers the remote-TPU ("axon") backend at
# interpreter startup and overrides JAX_PLATFORMS; only a config update
# reliably forces CPU for tests.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_DIR = "/root/reference/src"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_DIR)


def purge_reference_modules() -> None:
    """Drop every cached module that was loaded from /root/reference.

    The reference uses bare top-level module names ('utils', 'generate',
    'models', 'data') from two different roots (src/ and
    src/create_dataset/), so tests that import from one root would poison
    tests importing the same names from the other."""
    for name in list(sys.modules):
        mod = sys.modules.get(name)
        path = getattr(mod, "__file__", None) or ""
        if path.startswith("/root/reference"):
            del sys.modules[name]
