"""Benchmark: batched column-steps/second of the full mixed-phase solver.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no numbers (BASELINE.md).  The comparison
point mandated by BASELINE.json is single-core Fortran; measured costs of
the Thompson scheme in WRF-class models are ~5-20 us per column-level-step
on one CPU core, i.e. O(1e5) column-steps/s for 120-level columns.  We use
1.0e5 column-steps/s as the documented single-core estimate, so
``vs_baseline`` is measured/1e5 (the ">= 10x Fortran" target is
vs_baseline >= 10).
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
    baseline = 1.0e5   # single-core Fortran estimate (see module docstring)
    print(json.dumps({
        "metric": "column_steps_per_sec_mixed1_nz120",
        "value": round(col_steps_per_sec, 1),
        "unit": "column-steps/s/chip",
        "vs_baseline": round(col_steps_per_sec / baseline, 2),
    }))


if __name__ == "__main__":
    main()
