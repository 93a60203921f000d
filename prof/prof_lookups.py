"""Micro-profile of step components on the real chip (dev tool)."""
import time, json
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

ncol, nz = 8192, 120
key = jax.random.PRNGKey(0)


def timeit(fn, *args, n=20):
    r = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3  # ms


k1, k2 = jax.random.split(key)
idx = jax.random.randint(k1, (ncol, nz), 0, 100)
idx2 = jax.random.randint(k2, (ncol, nz), 0, 100)
tab2d = jax.random.normal(key, (100, 100), jnp.float32)
racs = jax.random.normal(key, (28 * 9 * 37 * 37, 11), jnp.float32)
lin = jax.random.randint(key, (ncol, nz), 0, racs.shape[0])


@jax.jit
def onehot2d(tab, i0, i1):
    oh = jax.nn.one_hot(i0, tab.shape[0], dtype=tab.dtype)
    b = lax.dot_general(oh, tab, (((2,), (0,)), ((), ())),
                        precision=lax.Precision.HIGHEST)
    oh1 = jax.nn.one_hot(i1, tab.shape[1], dtype=tab.dtype)
    return jnp.sum(b * oh1, axis=-1)


@jax.jit
def flatgather2d(tab, i0, i1):
    flat = tab.reshape(-1)
    return flat[i0 * tab.shape[1] + i1]


@jax.jit
def rowgather(mat, i):
    return mat[i]


@jax.jit
def powchain(x):
    acc = x
    for p in (0.8, 1.3, 2.2, 0.5, 3.1, 1.7, 0.25, 2.8):
        acc = acc + jnp.power(x + acc * 0.01, p)
    return acc


x = jax.random.uniform(key, (ncol, nz), jnp.float32, 1e-8, 1e-2)

print("onehot2d 100x100   %.3f ms" % timeit(onehot2d, tab2d, idx, idx2))
print("flatgather2d        %.3f ms" % timeit(flatgather2d, tab2d, idx, idx2))
print("rowgather racs(11)  %.3f ms" % timeit(rowgather, racs, lin))
print("8x pow chain        %.3f ms" % timeit(powchain, x))

# full step for reference
from __graft_entry__ import _example_batch
from kid_tpu.config import MicroConfig
from kid_tpu.micro import batched_microphysics
from kid_tpu.micro.solver import device_tables
from kid_tpu.tables.cache import get_tables

for warm in (True, False):
    cfg = MicroConfig(iiwarm=warm)
    tables = device_tables(get_tables(iiwarm=warm), jnp.float32)
    state, pres, w, dzq = _example_batch(ncol=ncol, nz=nz, dtype=jnp.float32)

    @jax.jit
    def step(st):
        new, _, _ = batched_microphysics(st, pres, w, dzq, 10.0, tables, cfg)
        return new

    ms = timeit(step, state, n=10)
    print(("warm" if warm else "full") + " step          %.2f ms" % ms)
