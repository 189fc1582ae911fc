"""Test harness: run everything on a virtual 8-device CPU mesh.

The axon sitecustomize registers the tunneled TPU backend at interpreter
start and force-sets ``jax_platforms="axon,cpu"``, so an env var alone is not
enough — we must also override the jax config after import. XLA_FLAGS has to
be set before the CPU backend initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", "tests must run on the virtual CPU mesh"
assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"
