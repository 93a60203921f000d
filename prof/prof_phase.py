"""Phase-level ablation of the solver step (dev tool): stub whole phases
to bisect step time.  Values become wrong; timing stays informative.
Usage: python prof_phase.py [variant ...]"""
from __future__ import annotations

import sys
import time
import types

import jax
import jax.numpy as jnp

import os
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
SRC = open(os.path.join(_ROOT, "kid_tpu/micro/solver.py")).read()

VARIANTS = {
    "full": [],
    "iiwarm": [],      # full source, cfg.iiwarm=True (skips ice phases)
    # skip every sedimentation sweep body (keeps vt math + CFL counts)
    "no_sweep": [
        ("        ten_m, ten_n, dm, dn, ppt = lax.fori_loop(0, n_iter, "
         "body, init)",
         "        ten_m, ten_n, dm, dn, ppt = init"),
    ],
    # skip terminal-velocity math too: everything from phase 17 on is
    # pass-through (ten/dens unchanged)
    "no_sed_at_all": [
        ("    def _cfl(vt_mask, vt):",
         "    def _cfl(vt_mask, vt):\n"
         "        z1 = jnp.zeros(vt.shape[:-1] + (1,), jnp.int32)\n"
         "        return z1, z1 + 1, 1.0 + jnp.zeros(vt.shape[:-1] + (1,),"
         " dtype)\n\n"
         "    def _cfl_dead(vt_mask, vt):"),
        ("        ten_m, ten_n, dm, dn, ppt = lax.fori_loop(0, n_iter, "
         "body, init)",
         "        ten_m, ten_n, dm, dn, ppt = init"),
    ],
    # 1 Newton iteration instead of 3 in saturation adjustment
    "sat_1iter": [
        ("    for _ in range(3):", "    for _ in range(1):"),
    ],
    # no graupel-N0 running-min scan (keeps the rest of _graupel_psd)
    "no_cummin": [
        ("    n0_exp = lax.cummin(n0_exp, axis=n0_exp.ndim - 1, "
         "reverse=True)",
         "    n0_exp = n0_exp"),
    ],
    # snow Field moments -> trivial
    "no_field": [
        ("def _field_moment(log10_smo2, tc0, m: float):",
         "def _field_moment(log10_smo2, tc0, m: float):\n"
         "    return log10_smo2 * (1.0 + 1e-6 * tc0 * m)\n\n\n"
         "def _field_moment_dead(log10_smo2, tc0, m: float):"),
    ],
}


def load_variant(name):
    src = SRC
    for old, new in VARIANTS[name]:
        assert old in src, (name, old)
        src = src.replace(old, new)
    mod = types.ModuleType(f"solver_{name}")
    mod.__dict__["__name__"] = f"kid_tpu.micro.solver_{name}"
    mod.__dict__["__package__"] = "kid_tpu.micro"
    exec(compile(src, f"solver_{name}.py", "exec"), mod.__dict__)
    return mod


def main():
    from __graft_entry__ import _example_batch
    from kid_tpu.config import MicroConfig
    from kid_tpu.tables.cache import get_tables

    ncol, nz = 8192, 120
    dtype = jnp.float32
    host_tables = get_tables(iiwarm=False)
    state, pres, w, dzq = _example_batch(ncol=ncol, nz=nz, dtype=dtype)

    names = sys.argv[1:] or list(VARIANTS)
    for name in names:
        iiwarm = name == "iiwarm"
        cfg = MicroConfig(iiwarm=iiwarm)
        mod = load_variant("full" if iiwarm else name)
        tables = mod.device_tables(host_tables, dtype)

        # tables as ARGUMENTS (closed-over device arrays are fetched
        # device->host at lower() time: minutes over the tunneled TPU);
        # np.asarray() sync (block_until_ready can return early on axon)
        import numpy as _np

        from functools import partial as _partial

        @_partial(jax.jit, donate_argnums=(0,))
        def step(st, pres, w, dzq, tables):
            new, _, _ = mod.batched_microphysics(st, pres, w, dzq, 10.0,
                                                 tables, cfg)
            return new

        # donation consumes the input; give each variant a copy
        st = step(jax.tree.map(lambda x: x.copy(), state),
                  pres, w, dzq, tables)
        _np.asarray(st.qr)
        n = 30
        t0 = time.perf_counter()
        for _ in range(n):
            st = step(st, pres, w, dzq, tables)
        _np.asarray(st.qr)
        ms = (time.perf_counter() - t0) / n * 1e3
        print(f"{name:14s} {ms:8.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
