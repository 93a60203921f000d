"""Gather-strategy microbenchmark at HEAD (the 5 family gathers measured
~13.5 ms of the 27 ms step: prof_ablate no_gather).  Times each candidate
layout for the racs family (11 tables, 28*9*37*37 = 344,988 cells) with
realistic decade indices on (8192, 120) cells.

Run on the TPU:  python prof/prof_gather4.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial

NCOL, NZ = 8192, 120
NTAB, CELLS = 11, 28 * 9 * 37 * 37


def timeit(name, fn, *args):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0][..., 0] if hasattr(
        jax.tree.leaves(out)[0], 'ndim') else out)
    n = 30
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:28s} {ms:8.3f} ms", flush=True)
    return ms


def main():
    rng = np.random.default_rng(0)
    # realistic: indices vary smoothly in z, constant-ish across columns
    base = rng.integers(0, CELLS, size=(1, NZ))
    jitter = rng.integers(-200, 200, size=(NCOL, NZ))
    lin = jnp.asarray(np.clip(base + jitter, 0, CELLS - 1), jnp.int32)

    fam_major = jnp.asarray(rng.standard_normal((NTAB, CELLS)), jnp.float32)
    row_major = jnp.asarray(np.ascontiguousarray(
        np.asarray(fam_major).T), jnp.float32)          # (CELLS, NTAB)
    flats = tuple(jnp.asarray(np.asarray(fam_major[i]), jnp.float32)
                  for i in range(NTAB))
    fam_bf16 = fam_major.astype(jnp.bfloat16)

    @jax.jit
    def g_fam(t, idx):
        return jnp.sum(t[:, idx], axis=0)

    @jax.jit
    def g_row(t, idx):
        return jnp.sum(t[idx], axis=-1)

    @jax.jit
    def g_flats(ts, idx):
        return sum(t[idx] for t in ts)

    @jax.jit
    def g_bf16(t, idx):
        return jnp.sum(t[:, idx].astype(jnp.float32), axis=0)

    @jax.jit
    def g_const(t, idx):
        return jnp.sum(t[:, idx * 0], axis=0)

    @jax.jit
    def g_one(t, idx):
        return t[0, idx]

    @jax.jit
    def g_row_sorted(t, idx):
        return jnp.sum(t[jnp.sort(idx, axis=0)], axis=-1)

    timeit("family-major (current)", g_fam, fam_major, lin)
    timeit("row-major (cells,11)", g_row, row_major, lin)
    timeit("11 separate flats", g_flats, flats, lin)
    timeit("family-major bf16", g_bf16, fam_bf16, lin)
    timeit("constant index (bound)", g_const, fam_major, lin)
    timeit("single table 1x", g_one, fam_major, lin)
    timeit("row-major, sorted idx", g_row_sorted, row_major, lin)


if __name__ == "__main__":
    main()
