"""Test harness config.

Tests run on CPU with 8 virtual XLA devices (multi-chip sharding tests use a
simulated mesh, per SURVEY.md §4) and float64 enabled, so parity checks
against the f64 oracle use the reference's own acceptance bar
(|x - x_ref|_inf <= 1e-5 at eps=1e-7, RunTests.jl:50-58,93).

Environment note: this image pre-imports jax at interpreter start (a
sitecustomize registers a remote-TPU "axon" PJRT plugin and bakes
JAX_PLATFORMS=axon into the already-loaded config), so plain env-var hygiene
is ineffective by conftest time. We force the platform back to cpu via
config.update and drop the axon backend factory before any backend is
initialized — otherwise every test run depends on (and can hang on) the TPU
tunnel.
"""

import os

# Must be set before the first backend initialization (not merely before jax
# import, which sitecustomize already did).
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from jax._src import xla_bridge as _xb  # noqa: E402

_xb._backend_factories.pop("axon", None)

assert len(jax.devices("cpu")) == 8, (
    f"expected 8 virtual CPU devices, got {jax.devices()}; "
    "XLA_FLAGS were applied too late")
