"""Benchmark: batched column-steps/second of the full mixed-phase solver.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no numbers (BASELINE.md), so the
single-core Fortran denominator is MEASURED — see bench_baseline.py for
the two reproducible anchors (a gcc -O3 speed-of-light benchmark of the
reference's per-cell transcendental budget: ~3.3e3 column-steps/s; and the
NumPy golden-oracle timing bounded by a 100x interpreter factor:
<= ~6.1e3).  The baseline is set at 1.0e4 column-steps/s at nz=120 — 3x
the compiled anchor, deliberately favoring the reference — so the
">= 10x Fortran" target is vs_baseline >= 10, i.e. >= 1e5
column-steps/s/chip.
"""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax

    from __graft_entry__ import _example_batch
    from kid_tpu.config import MicroConfig
    from kid_tpu.micro import batched_microphysics
    from kid_tpu.micro.solver import device_tables
    from kid_tpu.tables.cache import get_tables

    import jax.numpy as jnp

    platform = jax.devices()[0].platform
    ncol = 8192 if platform != "cpu" else 512
    nz = 120
    steps = 30 if platform != "cpu" else 5
    dtype = jnp.float32

    cfg = MicroConfig(iiwarm=False)
    tables = device_tables(get_tables(iiwarm=False), dtype)
    state, pres, w, dzq = _example_batch(ncol=ncol, nz=nz, dtype=dtype)

    @jax.jit
    def step(st):
        new, _, _ = batched_microphysics(st, pres, w, dzq, 10.0, tables,
                                         cfg)
        return new

    # warmup / compile
    st = step(state)
    jax.block_until_ready(st)

    t0 = time.perf_counter()
    st = state
    for _ in range(steps):
        st = step(st)
    jax.block_until_ready(st)
    dt_s = time.perf_counter() - t0

    col_steps_per_sec = ncol * steps / dt_s
    from bench_baseline import BASELINE_COL_STEPS_PER_SEC as baseline
    print(json.dumps({
        "metric": "column_steps_per_sec_mixed1_nz120",
        "value": round(col_steps_per_sec, 1),
        "unit": "column-steps/s/chip",
        "vs_baseline": round(col_steps_per_sec / baseline, 2),
    }))


if __name__ == "__main__":
    main()
