"""Device-time op breakdown of the case-true mixed1 step on the real TPU.

Traces a compiled n-step lax.scan window with jax.profiler, then parses
the xplane proto via tensorboard_plugin_profile and prints per-op device
times (aggregated, sorted).  Usage:
    python prof/prof_trace.py [case] [ncol] [n_steps]
"""
from __future__ import annotations

import dataclasses
import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/kid_tpu_xla"))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    case_name = sys.argv[1] if len(sys.argv) > 1 else "mixed1"
    ncol = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    n_time = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    from kid_tpu.driver.cases import CASES
    from kid_tpu.driver.loop import initial_state, simulate
    from kid_tpu.micro.solver import device_tables
    from kid_tpu.tables.cache import get_tables

    case = dataclasses.replace(CASES[case_name], nx=ncol)
    tables = device_tables(get_tables(iiwarm=case.micro.iiwarm),
                           jnp.float32)
    st = initial_state(case, jnp.float32)
    n_spin = 250
    st, _ = simulate(st, tables, case, n_spin)
    st, _ = simulate(st, tables, case, n_time, istep0=n_spin)  # compile
    np.asarray(st.qv[0, 0])

    trace_dir = "/tmp/kid_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        st2, _ = simulate(st, tables, case, n_time, istep0=n_spin)
        np.asarray(st2.qv[0, 0])

    paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    assert paths, f"no xplane under {trace_dir}"
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(
        paths, "framework_op_stats", {})
    tbl = json.loads(data) if isinstance(data, (str, bytes)) else data
    # framework_op_stats returns gviz json-ish; fall back to op_profile
    print(type(tbl))
    rows = []
    try:
        cols = [c["label"] for c in tbl[0]["cols"]]
        for r in tbl[0]["rows"]:
            rows.append({c: v.get("v") for c, v in zip(cols, r["c"])})
    except Exception:
        print(str(tbl)[:2000])
        return
    rows.sort(key=lambda r: -(r.get("Total self-time (us)") or 0))
    tot = sum(r.get("Total self-time (us)") or 0 for r in rows)
    print(f"total device self-time: {tot/1e3:.2f} ms over {n_time} steps "
          f"=> {tot/1e3/n_time:.3f} ms/step")
    for r in rows[:40]:
        t = (r.get("Total self-time (us)") or 0)
        print(f"{t/n_time/1e3:8.3f} ms/step  {r.get('Type','?'):24s} "
              f"{str(r.get('Operation','?'))[:90]}")


if __name__ == "__main__":
    main()
