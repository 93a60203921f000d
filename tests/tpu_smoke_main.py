"""Real-TPU smoke: compile the fused Mosaic kernel (non-interpret), run
mixed1 steps, check finiteness and agreement with the inline-XLA f32 path,
and run one sharded step.  Invoked as a SUBPROCESS by test_tpu_smoke.py
and by bench.py (the unit suite's own process is CPU-forced by conftest).

Exit codes / stdout protocol:
    NO_TPU      — no TPU device available (caller skips)
    SMOKE_OK    — everything passed
    (assertion/traceback otherwise)
"""
from __future__ import annotations

import dataclasses
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/kid_tpu_xla"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

if jax.devices()[0].platform == "cpu":
    print("NO_TPU", flush=True)
    sys.exit(0)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from kid_tpu.dist.mesh import make_mesh, simulate_sharded  # noqa: E402
from kid_tpu.driver.cases import AEROSOL1D, CUMULUS2D, MIXED1  # noqa: E402
from kid_tpu.driver.loop import initial_state, simulate  # noqa: E402
from kid_tpu.micro.solver import device_tables  # noqa: E402
from kid_tpu.tables.cache import get_tables  # noqa: E402


def run(n_steps=40, ncol=256):
    case = dataclasses.replace(MIXED1, nx=ncol)
    tables = device_tables(get_tables(iiwarm=False), jnp.float32)
    st = initial_state(case, jnp.float32)
    # spin into active physics so the kernel's table branches execute
    st, _ = simulate(st, tables, case, 200)

    assert os.environ.get("KID_TPU_PALLAS", "auto") != "0"
    f_kernel, s_kernel = simulate(st, tables, case, n_steps, istep0=200)
    qr_k = np.asarray(f_kernel.qr)
    assert np.isfinite(qr_k).all(), "fused kernel produced non-finite qr"
    for f in f_kernel._fields:
        assert np.isfinite(np.asarray(getattr(f_kernel, f))).all(), f

    # inline XLA twin of the same steps (KID_TPU_PALLAS read at trace
    # time inside pallas_enabled, so flipping the env var + clearing jit
    # caches retraces the inline path)
    os.environ["KID_TPU_PALLAS"] = "0"
    jax.clear_caches()
    f_inline, _ = simulate(st, tables, case, n_steps, istep0=200)
    os.environ["KID_TPU_PALLAS"] = "auto"
    worst = 0.0
    for f in f_kernel._fields:
        a = np.asarray(getattr(f_kernel, f), np.float64)
        b = np.asarray(getattr(f_inline, f), np.float64)
        scale = np.abs(b).max() + 1e-30
        worst = max(worst, float(np.abs(a - b).max() / scale))
    # two f32 realizations of the same algorithm over n_steps chaotic
    # steps; ulp-level transcendental differences grow slowly at this
    # horizon (measured ~1e-5..1e-3)
    assert worst < 2e-2, f"kernel vs inline diverged: {worst:.3e}"

    # one sharded 2-D step on the real device mesh (1 chip here)
    jax.clear_caches()
    mesh = make_mesh(len(jax.devices()))
    st2 = initial_state(CUMULUS2D, jnp.float32)
    f_sh, _ = simulate_sharded(st2, tables, CUMULUS2D, 1, mesh)
    assert np.isfinite(np.asarray(f_sh.qv)).all()

    # the aerosol SPLIT kernels (fused_rates/fused_post) inside
    # shard_map on real hardware: widened aerosol1d, a few steps
    aero = dataclasses.replace(AEROSOL1D, nx=256)
    st3 = initial_state(aero, jnp.float32)
    f_a, _ = simulate_sharded(st3, tables, aero, 3, mesh)
    for f in f_a._fields:
        assert np.isfinite(np.asarray(getattr(f_a, f))).all(), f
    print(f"SMOKE_OK kernel_vs_inline_worst_rel={worst:.3e} "
          f"platform={jax.devices()[0].platform}", flush=True)


if __name__ == "__main__":
    run()
