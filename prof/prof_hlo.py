"""Compile the step and histogram the optimized-HLO ops (dev tool).
Usage: python prof_hlo.py [git-rev]   (rev = use solver.py from that rev)
"""
import collections
import re
import subprocess
import os
import sys
import types
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    rev = sys.argv[1] if len(sys.argv) > 1 else None
    import kid_tpu.micro.solver as base

    if rev:
        src = subprocess.run(
            ["git", "show", f"{rev}:kid_tpu/micro/solver.py"],
            capture_output=True, text=True, check=True).stdout
        mod = types.ModuleType("solver_rev")
        mod.__dict__["__package__"] = "kid_tpu.micro"
        exec(compile(src, "solver_rev.py", "exec"), mod.__dict__)
    else:
        mod = base

    from __graft_entry__ import _example_batch
    from kid_tpu.config import MicroConfig
    from kid_tpu.tables.cache import get_tables

    ncol, nz = 8192, 120
    cfg = MicroConfig(iiwarm=False)
    tables = mod.device_tables(get_tables(iiwarm=False), jnp.float32)
    state, pres, w, dzq = _example_batch(ncol=ncol, nz=nz,
                                         dtype=jnp.float32)

    @jax.jit
    def step(st, pres, w, dzq, tables):
        new, _, _ = mod.batched_microphysics(st, pres, w, dzq, 10.0,
                                             tables, cfg)
        return new

    compiled = step.lower(state, pres, w, dzq, tables).compile()
    txt = compiled.as_text()
    ops = collections.Counter()
    fusion_kinds = collections.Counter()
    for line in txt.splitlines():
        m = re.search(r"=\s+\S+\s+(\w+)\(", line)
        if m:
            ops[m.group(1)] += 1
            if m.group(1) == "fusion":
                km = re.search(r'kind=(\w+)', line)
                fusion_kinds[km.group(1) if km else "?"] += 1
    total = sum(ops.values())
    print("rev:", rev or "working-tree", " total ops:", total)
    for name, cnt in ops.most_common(18):
        print(f"  {name:22s} {cnt}")
    print(" fusion kinds:", dict(fusion_kinds))
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        for key in ("flops", "transcendentals", "bytes accessed"):
            if key in ca:
                print(f"  cost[{key}] = {ca[key]:.3e}")
    except Exception as e:  # noqa: BLE001
        print("  cost_analysis failed:", e)


if __name__ == "__main__":
    main()
