"""Gather formulation re-test with real arguments (no constant folding)
and output equivalence checks."""
import time

import jax
import jax.numpy as jnp
import numpy as np

ncol, nz = 8192, 120
ks = jax.random.split(jax.random.PRNGKey(7), 12)

FAMS = [("racs", 28 * 9 * 37 * 37, 11, 0), ("racg", 28 * 28 * 37 * 37, 5, 1),
        ("qrfz", 37 * 37 * 45, 4, 2), ("qcfz", 37 * 45, 2, 3),
        ("iaus", 64 * 55, 3, 4)]

idx = [jax.random.randint(ks[k], (ncol, nz), 0, rows)
       for _, rows, _, k in FAMS]
tab = [jax.random.normal(ks[5 + k], (rows, w), jnp.float32)
       for _, rows, w, k in FAMS]
tab_T = [jnp.asarray(np.asarray(t).T.copy()) for t in tab]


def timeit(fn, *args, n=30):
    r = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3, r


@jax.jit
def cur_rows(i0, i1, i2, i3, i4):
    return [tab[j][i] for j, i in enumerate((i0, i1, i2, i3, i4))]


@jax.jit
def transposed(i0, i1, i2, i3, i4):
    return [tab_T[j][:, i] for j, i in enumerate((i0, i1, i2, i3, i4))]


def main():
    ms_a, ra = timeit(cur_rows, *idx)
    ms_b, rb = timeit(transposed, *idx)
    print(f"cur_rows   {ms_a:8.2f} ms")
    print(f"transposed {ms_b:8.2f} ms")
    for j, (a, b) in enumerate(zip(ra, rb)):
        np.testing.assert_array_equal(np.asarray(a),
                                      np.moveaxis(np.asarray(b), 0, -1),
                                      err_msg=f"family {j}")
    print("outputs identical")


if __name__ == "__main__":
    main()
