"""Microbenchmarks of gather strategies on the real chip (dev tool)."""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

ncol, nz = 8192, 120
M = ncol * nz
key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 8)


def timeit(fn, *args, n=20):
    r = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3


RACS_N = 28 * 9 * 37 * 37       # 345,060
RACG_N = 28 * 28 * 37 * 37      # 1,073,296
QRFZ_N = 37 * 37 * 45           # 61,605

idx_racs = jax.random.randint(ks[0], (ncol, nz), 0, RACS_N)
idx_racg = jax.random.randint(ks[1], (ncol, nz), 0, RACG_N)
idx_qrfz = jax.random.randint(ks[2], (ncol, nz), 0, QRFZ_N)
idx_small = jax.random.randint(ks[3], (ncol, nz), 0, 1665)

tab_racs11 = jax.random.normal(ks[4], (RACS_N, 11), jnp.float32)
tab_racs5 = tab_racs11[:, :5]
tab_racs8 = jax.random.normal(ks[4], (RACS_N, 8), jnp.float32)
tab_racs1 = tab_racs11[:, 0]
tab_racg5 = jax.random.normal(ks[5], (RACG_N, 5), jnp.float32)
tab_racg4 = tab_racg5[:, :4]
tab_qrfz4 = jax.random.normal(ks[6], (QRFZ_N, 4), jnp.float32)
tab_small2 = jax.random.normal(ks[7], (1665, 2), jnp.float32)

rg = jax.jit(lambda t, i: t[i])
rg_sorted_idx = jnp.sort(idx_racs.reshape(-1)).reshape(ncol, nz)


@jax.jit
def g_scalar11(t, i):
    # 11 scalar gathers from 11 flat tables
    return [t[:, j][i] for j in range(11)]


@jax.jit
def g_take(t, i):
    return jnp.take(t, i, axis=0)


@jax.jit
def g_onehot_2d(t2, i0, i1):
    # qcfz as (37,45,2) via two one-hot contractions
    oh0 = jax.nn.one_hot(i0, 37, dtype=t2.dtype)
    b = lax.dot_general(oh0, t2.reshape(37, -1),
                        (((oh0.ndim - 1,), (0,)), ((), ())))
    b = b.reshape(i0.shape + (45, 2))
    oh1 = jax.nn.one_hot(i1, 45, dtype=t2.dtype)
    return jnp.einsum("...tc,...t->...c", b, oh1)


i0_small = idx_small // 45
i1_small = idx_small % 45
tab_qcfz_3d = jax.random.normal(ks[7], (37, 45, 2), jnp.float32)

print("racs (345k,11) rows    %7.3f ms" % timeit(rg, tab_racs11, idx_racs))
print("racs (345k,8) rows     %7.3f ms" % timeit(rg, tab_racs8, idx_racs))
print("racs (345k,5) rows     %7.3f ms" % timeit(rg, tab_racs5, idx_racs))
print("racs (345k,) scalar    %7.3f ms" % timeit(rg, tab_racs1, idx_racs))
print("racs 11x scalar        %7.3f ms" % timeit(g_scalar11, tab_racs11,
                                                 idx_racs))
print("racs rows sorted idx   %7.3f ms" % timeit(rg, tab_racs11,
                                                 rg_sorted_idx))
print("racs take()            %7.3f ms" % timeit(g_take, tab_racs11,
                                                 idx_racs))
print("racg (1.07M,5) rows    %7.3f ms" % timeit(rg, tab_racg5, idx_racg))
print("racg (1.07M,4) rows    %7.3f ms" % timeit(rg, tab_racg4, idx_racg))
print("qrfz (61k,4) rows      %7.3f ms" % timeit(rg, tab_qrfz4, idx_qrfz))
print("qcfz (1665,2) rows     %7.3f ms" % timeit(rg, tab_small2, idx_small))
print("qcfz onehot 2-stage    %7.3f ms" % timeit(g_onehot_2d, tab_qcfz_3d,
                                                 i0_small, i1_small))

# does element count scale linearly?
idx_racs_small = idx_racs[:, :12]
print("racs rows M/10 elems   %7.3f ms" % timeit(rg, tab_racs11,
                                                 idx_racs_small))
