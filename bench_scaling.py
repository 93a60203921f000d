"""Distributed-path scaling measurement (BASELINE.md scaling target).

Only one physical TPU chip is reachable in this environment, so true
multi-chip wall-clock scaling cannot be measured here.  What CAN be
measured, and what this script reports:

1. **Collective overhead** — the same global problem run through
   ``simulate`` (single device) vs ``simulate_sharded`` (8-way virtual CPU
   mesh, 2-wide ppermute halos).  Virtual devices share the host's cores,
   so if the sharded path's wall-clock is ~the single-device wall-clock,
   the halo exchange and shard bookkeeping cost ~nothing — the collective
   pattern (1 ppermute pair per step for the whole 9-tracer stack) is the
   part that rides ICI on real hardware.
2. **Weak-scaling shape** — per-device column count held fixed while the
   mesh grows 1 -> 2 -> 4 -> 8; on shared-core virtual devices ideal weak
   scaling shows total wall-clock growing ~linearly with total work (all
   devices multiplex one host), with NO superlinear blowup from
   collectives.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 python bench_scaling.py
"""
from __future__ import annotations

import dataclasses
import json
import time


def main():
    import jax
    # virtual 8-device CPU mesh (sitecustomize consumed JAX_PLATFORMS, so
    # force via config); real-TPU single-chip throughput comes from bench.py
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from kid_tpu.dist.mesh import make_mesh, simulate_sharded
    from kid_tpu.driver.cases import CUMULUS2D
    from kid_tpu.driver.loop import initial_state, simulate
    from kid_tpu.micro.solver import device_tables
    from kid_tpu.tables.cache import get_tables

    dtype = jnp.float32
    tables = device_tables(get_tables(iiwarm=True), dtype)
    n_steps = 10
    results = {}

    def timed(fn, *args, **kw):
        out = jax.block_until_ready(fn(*args, **kw))   # compile
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args, **kw))
        return time.perf_counter() - t0, out

    # 1) fixed global size: single-device vs 8-way sharded
    case = dataclasses.replace(CUMULUS2D, nx=256, nz=60)
    st0 = initial_state(case, dtype)
    t_single, _ = timed(simulate, st0, tables, case, n_steps, False)
    mesh8 = make_mesh(8)
    t_shard, _ = timed(simulate_sharded, st0, tables, case, n_steps,
                       mesh8, False)
    results["single_dev_s"] = round(t_single, 4)
    results["sharded_8dev_s"] = round(t_shard, 4)
    results["collective_overhead"] = round(t_shard / t_single - 1.0, 4)

    # 2) weak scaling: 32 columns per device
    weak = {}
    for nd in (1, 2, 4, 8):
        case_w = dataclasses.replace(CUMULUS2D, nx=32 * nd, nz=60)
        st_w = initial_state(case_w, dtype)
        mesh = make_mesh(nd)
        t_w, _ = timed(simulate_sharded, st_w, tables, case_w, n_steps,
                       mesh, False)
        weak[str(nd)] = round(t_w, 4)
    results["weak_scaling_s_per_mesh"] = weak

    print(json.dumps(results))


if __name__ == "__main__":
    main()
