"""Ablation profile of the full step: time solver variants with specific
cost centers stubbed out (dev tool; values become wrong, timing stays
informative).  Usage: python prof_ablate.py [variant ...]
"""
from __future__ import annotations

import importlib.util
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
    # full, unmodified
    "full": [],
    # all big-table row gathers return constant rows
    "no_gather": [
        ("rv = tables.racs[:, lin_s]",
         "rv = tables.racs[:, :1, None] * jnp.ones(lin_s.shape, dtype)"),
        ("gv = tables.racg[:, lin_g]",
         "gv = tables.racg[:, :1, None] * jnp.ones(lin_g.shape, dtype)"),
        ("fv = tables.qrfz[:, (idx_r * c.NTB_R1 + idx_r1) * 45 + idx_tc]",
         "fv = tables.qrfz[:, :1, None] * jnp.ones(idx_r.shape, dtype)"),
        ("cv = tables.qcfz[:, idx_c * 45 + idx_tc]",
         "cv = tables.qcfz[:, :1, None] * jnp.ones(idx_c.shape, dtype)"),
        ("iv = tables.iaus[:, idx_i * c.NTB_I1 + idx_i1]",
         "iv = tables.iaus[:, :1, None] * jnp.ones(idx_i.shape, dtype)"),
    ],
    # one-hot nu_c row fetches -> first row broadcast
    "no_onehot": [
        ("def _rows(mat, idx):",
         "def _rows(mat, idx):\n"
         "    return jnp.zeros(idx.shape + (mat.shape[1],), mat.dtype)"
         " + mat[3]\n\n\ndef _rows_dead(mat, idx):"),
    ],
    # 2-D efficiency-table lookups -> constant
    "no_lookup2d": [
        ("def _lookup2d(tab, i0, i1):",
         "def _lookup2d(tab, i0, i1):\n"
         "    return jnp.zeros(i0.shape, tab.dtype) + tab[5, 5]\n\n\n"
         "def _lookup2d_dead(tab, i0, i1):"),
    ],
    # fill_down associative scans -> identity
    "no_filldown": [
        ("def _fill_down(vals, valid):",
         "def _fill_down(vals, valid):\n"
         "    return jnp.where(valid, vals, 0.0)\n\n\n"
         "def _fill_down_dead(vals, valid):"),
    ],
    # sedimentation always runs exactly 1 substep
    "sed_1step": [
        ("        n_iter = jnp.max(n_loop)",
         "        n_iter = 1"),
    ],
    # keep gathers, but feed them trivial indices (isolates index math)
    "triv_idx": [
        ("rv = tables.racs[:, lin_s]",
         "rv = tables.racs[:, lin_s * 0]"),
        ("gv = tables.racg[:, lin_g]",
         "gv = tables.racg[:, lin_g * 0]"),
        ("fv = tables.qrfz[:, (idx_r * c.NTB_R1 + idx_r1) * 45 + idx_tc]",
         "fv = tables.qrfz[:, idx_r * 0]"),
        ("cv = tables.qcfz[:, idx_c * 45 + idx_tc]",
         "cv = tables.qcfz[:, idx_c * 0]"),
        ("iv = tables.iaus[:, idx_i * c.NTB_I1 + idx_i1]",
         "iv = tables.iaus[:, idx_i * 0]"),
    ],
    # keep index math + gathers, discard gathered values (isolates unpack)
    "drop_rv": [
        ("rv = tables.racs[:, lin_s]",
         "rv = tables.racs[:, lin_s] * 0.0 + tables.racs[:, :1, None]"),
        ("gv = tables.racg[:, lin_g]",
         "gv = tables.racg[:, lin_g] * 0.0 + tables.racg[:, :1, None]"),
        ("fv = tables.qrfz[:, (idx_r * c.NTB_R1 + idx_r1) * 45 + idx_tc]",
         "fv = tables.qrfz[:, (idx_r * c.NTB_R1 + idx_r1) * 45 + idx_tc]"
         " * 0.0 + tables.qrfz[:, :1, None]"),
        ("cv = tables.qcfz[:, idx_c * 45 + idx_tc]",
         "cv = tables.qcfz[:, idx_c * 45 + idx_tc] * 0.0"
         " + tables.qcfz[:, :1, None]"),
        ("iv = tables.iaus[:, idx_i * c.NTB_I1 + idx_i1]",
         "iv = tables.iaus[:, idx_i * c.NTB_I1 + idx_i1] * 0.0"
         " + tables.iaus[:, :1, None]"),
    ],
    # pow -> cheap (keeps data flowing, removes transcendentals)
    "cheap_pow": [
        ("import math",
         "import math\n\n\ndef _cheap_pow(a, b):\n"
         "    return a * 1e-3 + (b if not hasattr(b, 'shape') else 0.0) "
         "* 1e-6 + 1.0\n"),
    ],
    # Field-2005 snow moments -> constants
    "no_field": [
        ("def _field_moment(log10_smo2, tc0, m: float):",
         "def _field_moment(log10_smo2, tc0, m: float):\n"
         "    return log10_smo2 * (1.0 + 1e-6 * tc0)\n\n\n"
         "def _field_moment_dead(log10_smo2, tc0, m: float):"),
    ],
}


def load_variant(name):
    src = SRC
    for old, new in VARIANTS[name]:
        assert old in src, (name, old)
        src = src.replace(old, new)
    if name == "cheap_pow":
        src = src.replace("jnp.power", "_cheap_pow")
    mod = types.ModuleType(f"solver_{name}")
    mod.__dict__["__name__"] = f"kid_tpu.micro.solver_{name}"
    mod.__dict__["__package__"] = "kid_tpu.micro"
    exec(compile(src, f"solver_{name}.py", "exec"), mod.__dict__)
    return mod


def main():
    from __graft_entry__ import _example_batch
    from kid_tpu.config import MicroConfig
    from kid_tpu.tables.cache import get_tables
    from kid_tpu.micro import solver as base_solver

    ncol, nz = 8192, 120
    dtype = jnp.float32
    cfg = MicroConfig(iiwarm=False)
    host_tables = get_tables(iiwarm=False)
    state, pres, w, dzq = _example_batch(ncol=ncol, nz=nz, dtype=dtype)

    names = sys.argv[1:] or list(VARIANTS)
    for name in names:
        mod = load_variant(name)
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
        print(f"{name:12s} {ms:8.2f} ms/step")


if __name__ == "__main__":
    main()
