"""Transcendental-light math helpers for the TPU hot path.

TPU lowers a generic ``pow(x, y)`` HLO to a guarded exp/log chain with
edge-case handling; ablation profiling showed the solver's pow/log10 index
chains cost ~20 ms of a 29 ms step at (8192, 120) f32.  These helpers give
the same math (validated against the NumPy oracle at rtol 1e-4):

  * ``exp10(x)``   — 10**x as one exp;
  * ``powc(x, p)`` — x**const expanded to multiply/sqrt/cbrt chains for
    integer, half-integer and third-integer constants (falls back to
    jnp.power otherwise).
"""
from __future__ import annotations



import jax.numpy as jnp


_LN10 = 2.302585092994046


def exp10(x):
    """10**x as a single exp (pow(10,x) costs a guarded exp/log chain)."""
    return jnp.exp(x * jnp.asarray(_LN10, x.dtype))


def _cbrt(x):
    """Nonnegative cube root as exp(log(x)/3): Mosaic (Pallas TPU) has no
    cbrt primitive; every PSD argument here is >= 0 (log(0) -> -inf ->
    exp -> 0 is exact).  ~2 ulp vs jnp.cbrt, well inside the rtol 1e-4
    oracle budget."""
    return jnp.exp(jnp.log(x) * (1.0 / 3.0))


def _int_pow(x, k: int):
    """x**k for small non-negative integer k by binary squaring."""
    if k == 0:
        return jnp.ones_like(x)
    acc = None
    base = x
    while k:
        if k & 1:
            acc = base if acc is None else acc * base
        k >>= 1
        if k:
            base = base * base
    return acc


def powc(x, p) -> jnp.ndarray:
    """x**p for a compile-time constant p, avoiding the pow HLO when p is
    an integer, half-integer, or third-integer (covers every PSD exponent
    with mu_r = mu_g = mu_i = 0, bm = 3, bv_r = bv_i = 1)."""
    p = float(p)
    if p == 0.0:
        return jnp.ones_like(x)
    a = abs(p)
    k = int(a)
    f = a - k
    if abs(f) < 1e-12:
        extra = None
    elif abs(f - 0.5) < 1e-12:
        extra = jnp.sqrt(x)
    elif abs(f - 1.0 / 3.0) < 1e-12:
        extra = _cbrt(x)
    elif abs(f - 2.0 / 3.0) < 1e-12:
        cr = _cbrt(x)
        extra = cr * cr
    elif abs(f - 0.25) < 1e-12:
        extra = jnp.sqrt(jnp.sqrt(x))
    elif abs(f - 0.75) < 1e-12:
        s = jnp.sqrt(x)
        extra = s * jnp.sqrt(s)
    elif abs(f - 1.0 / 6.0) < 1e-12:
        extra = jnp.sqrt(_cbrt(x))
    else:
        return jnp.power(x, p)
    ip = _int_pow(x, k)
    out = ip if extra is None else (extra if ip is None else ip * extra)
    if p < 0:
        out = 1.0 / out
    return out


# NOTE: a transcendental-free decade index (float exponent bits + exact
# 10^n lookup table) was tried here and measured 7x SLOWER in the full
# step despite each piece being faster standalone: the extra tiny gathers
# fragment XLA:TPU fusion.  The winning formulation batches all decade
# indices into one stacked log10/pow call (tables/index.py).
