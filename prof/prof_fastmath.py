"""Microbench fastmath helpers vs raw pow on the chip (dev tool)."""
import time

import jax
import jax.numpy as jnp

from kid_tpu.micro.fastmath import exp10, floor_log10, powc

key = jax.random.PRNGKey(0)
x = jax.random.uniform(key, (8192, 120), jnp.float32, 1e-8, 1e-2)


def timeit(fn, *args, n=20):
    f = jax.jit(fn)
    r = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3


print("pow(x,1/3)        %7.3f ms" % timeit(lambda a: jnp.power(a, 1/3), x))
print("cbrt(x)           %7.3f ms" % timeit(jnp.cbrt, x))
print("sqrt(x)           %7.3f ms" % timeit(jnp.sqrt, x))
print("powc(x,1/3)       %7.3f ms" % timeit(lambda a: powc(a, 1/3), x))
print("powc(x,4)         %7.3f ms" % timeit(lambda a: powc(a, 4.0), x))
print("powc(x,2.5)       %7.3f ms" % timeit(lambda a: powc(a, 2.5), x))
print("pow(x,4.0)        %7.3f ms" % timeit(lambda a: jnp.power(a, 4.0), x))
print("pow(x,0.89)       %7.3f ms" % timeit(lambda a: jnp.power(a, .89), x))
print("exp(x)            %7.3f ms" % timeit(jnp.exp, x))
print("log(x)            %7.3f ms" % timeit(jnp.log, x))
print("log10(x)          %7.3f ms" % timeit(jnp.log10, x))
print("exp10(x)          %7.3f ms" % timeit(exp10, x))
print("floor_log10(x)    %7.3f ms" % timeit(lambda a: floor_log10(a)[1], x))
print("x*x               %7.3f ms" % timeit(lambda a: a * a, x))
