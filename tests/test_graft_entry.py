"""Hermeticity of the driver entry points (round-1 VERDICT weak #2).

dryrun_multichip is a CPU-virtual-mesh check; it must pass even when the
TPU client cannot initialize (the round-1 driver run died on a libtpu
version mismatch raised from an incidental default-backend op). The test
runs the dryrun in a subprocess under the UNMODIFIED environment (where
sitecustomize pins JAX_PLATFORMS=axon) and asserts the axon/TPU backend
was never created.
"""

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_PROG = """
import __graft_entry__
__graft_entry__.dryrun_multichip(8)

import jax._src.xla_bridge as xb
inited = set(xb._backends.keys())
assert inited <= {"cpu"}, f"non-cpu backend initialized: {inited}"
print("HERMETIC_OK", sorted(inited))
"""


def test_dryrun_multichip_never_touches_default_backend():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)           # dryrun must claim its own devices
    out = subprocess.run(
        [sys.executable, "-c", _PROG], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-4000:]
    assert "HERMETIC_OK" in out.stdout


def test_entry_forward_compiles_and_runs():
    """entry()'s forward must jit and execute — the driver compile-checks
    exactly this (a stale internal reference here once survived the rest
    of the suite: round 3, the _trace_batch removal)."""
    import jax
    import numpy as np

    import __graft_entry__ as g

    fn, args = g.entry()
    rad, nrays = jax.jit(fn)(*args)
    assert rad.shape == (args[2].shape[0], 3)
    assert np.isfinite(np.asarray(rad)).all()
    assert int(nrays) > 0
