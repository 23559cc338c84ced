"""Test configuration: run on a virtual 8-device CPU mesh with float64.

- 8 virtual CPU devices let the multi-chip sharding paths (mesh collectives,
  sharded statevector) run without TPU hardware, per SURVEY.md section 5.
- x64 is enabled because the reference's tightest golden tolerance is 1e-15
  (ChebyshevStep block-encoding test, reference ChebyshevStep.py:133).

Note: this environment's sitecustomize registers a remote TPU PJRT plugin and
forces ``jax_platforms=axon,cpu`` via jax.config at interpreter start, so
setting the JAX_PLATFORMS env var here is not enough -- we must override the
config value itself.  XLA_FLAGS must still be set before the (lazy) CPU
client is created.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
