"""Round-2 gather-strategy microbenchmarks (dev tool): the 5 family row
gathers are 55% of the step (trace 2026-08-20); find a faster formulation.
Realistic: distinct random index fields per family (ADVICE r1)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

ncol, nz = 8192, 120
N = ncol * nz
ks = jax.random.split(jax.random.PRNGKey(7), 12)

RACS_N = 28 * 9 * 37 * 37
RACG_N = 28 * 28 * 37 * 37
QRFZ_N = 37 * 37 * 45
QCFZ_N = 37 * 45
IAUS_N = 64 * 55

FAMS = [("racs", RACS_N, 11, 0), ("racg", RACG_N, 5, 1),
        ("qrfz", QRFZ_N, 4, 2), ("qcfz", QCFZ_N, 2, 3),
        ("iaus", IAUS_N, 3, 4)]

idx = {n: jax.random.randint(ks[k], (ncol, nz), 0, rows)
       for n, rows, _, k in FAMS}
tab = {n: jax.random.normal(ks[5 + k], (rows, w), jnp.float32)
       for n, rows, w, k in FAMS}
tab_T = {n: jnp.asarray(np.asarray(t).T.copy()) for n, t in tab.items()}
tab_flat = {n: t.reshape(-1) for n, t in tab.items()}


def timeit(fn, *args, n=30):
    r = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3


@jax.jit
def cur_rows():          # today's formulation: 5 row gathers
    return [tab[n][idx[n]] for n, *_ in FAMS]


@jax.jit
def flat_linidx():       # per family: flat 1-D gather with (N, w) indices
    out = []
    for n, rows, w, _ in FAMS:
        lin = idx[n][..., None] * w + jnp.arange(w)
        out.append(tab_flat[n][lin])
    return out


@jax.jit
def transposed():        # family-major tables: w separate 1-D gathers each
    out = []
    for n, rows, w, _ in FAMS:
        out.append(tab_T[n][:, idx[n]])
    return out


@jax.jit
def one_combined():      # ONE giant flat gather for all 25 values
    offs = []
    base = 0
    parts = []
    for n, rows, w, _ in FAMS:
        lin = base + idx[n].reshape(-1)[:, None] * w + jnp.arange(w)
        parts.append(lin.reshape(-1))
        base += rows * w
    big_tab = jnp.concatenate([tab_flat[n] for n, *_ in FAMS])
    big_idx = jnp.concatenate(parts)
    return big_tab[big_idx]


@jax.jit
def rows_pad16():        # width padded to 16 (aligned rows)
    out = []
    for n, rows, w, _ in FAMS:
        t16 = jnp.pad(tab[n], ((0, 0), (0, 16 - w)))
        out.append(t16[idx[n]][..., :w])
    return out


@jax.jit
def transposed_1call():  # family-major, all w columns in one take along ax1
    return [jnp.take(tab_T[n], idx[n], axis=1) for n, *_ in FAMS]


def main():
    for name, fn in [("cur_rows", cur_rows),
                     ("flat_linidx", flat_linidx),
                     ("transposed", transposed),
                     ("transposed_1call", transposed_1call),
                     ("one_combined", one_combined),
                     ("rows_pad16", rows_pad16)]:
        try:
            ms = timeit(fn)
            print(f"{name:18s} {ms:8.2f} ms", flush=True)
        except Exception as e:
            print(f"{name:18s} FAILED {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
