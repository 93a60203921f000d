"""Fused Pallas TPU kernel for the phase 8-11 rates block.

The solver's hot region (process rates + conservation clamps + tendency
assembly, f90:1676-2569) is pure elementwise math once the table-family
gathers are hoisted to the caller (solver.py prologue).  Under XLA that
region fragments into dozens of fusions whose intermediates round-trip
through HBM — ablation at HEAD showed the step is bandwidth/critical-path
bound, not compute bound (removing whole phases does not speed it up).
This wrapper runs the SAME function, ``solver.rates_and_tendencies``, as
ONE ``pallas_call`` blocked over columns, so every intermediate lives in
VMEM and HBM sees each input/output channel exactly once.

Layout: all channels are (ncol, nz) f32 blocks of (BC, nz); the stacked
gathered families rv/gv/fv/cv/iv are (k, ncol, nz) with (k, BC, nz)
blocks.  nz (120) is lane-padded to 128 by Mosaic.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

# columns per block: ~100 live (BC, nz) f32 channels must fit the 16 MB
# VMEM with double-buffered I/O streaming (BC=256 measured 25.2 MB: OOM)
BC = int(os.environ.get("KID_TPU_PALLAS_BC", "128"))


def _keys(cfg, want_rates):
    from . import solver as S
    in_keys = list(S.P8_BASE)
    if cfg.is_aerosol_aware:
        in_keys += list(S.P8_AERO)
    if not cfg.iiwarm:
        in_keys += list(S.P8_ICE)
    out_keys = list(S.P8_OUT) + (list(S.P8_RATES) if want_rates else [])
    return in_keys, out_keys


def rates_pallas(pro, cfg, dt_f, want_rates=True, interpret=False):
    """Run ``rates_and_tendencies`` as one fused kernel over column blocks."""
    from . import solver as S

    in_keys, out_keys = _keys(cfg, want_rates)
    qv = pro["qv"]
    ncol, nz = qv.shape
    dtype = qv.dtype

    # the 33 extra rate outputs of want_rates roughly double the output
    # streaming footprint; halve the block to stay inside VMEM
    bc = BC if not want_rates else max(32, BC // 2)
    pad = (-ncol) % bc
    ncol_p = ncol + pad

    def prep(x):
        if pad:
            widths = [(0, 0)] * x.ndim
            widths[x.ndim - 2] = (0, pad)
            x = jnp.pad(x, widths, mode="edge")
        return x

    operands = [prep(pro[k]) for k in in_keys]

    def kernel(*refs):
        in_refs = refs[:len(in_keys)]
        out_refs = refs[len(in_keys):]
        blk = {k: r[...] for k, r in zip(in_keys, in_refs)}
        out = S.rates_and_tendencies(blk, cfg, dt_f, want_rates)
        for k, r in zip(out_keys, out_refs):
            r[...] = out[k]

    def spec_for(k):
        if k in ("rv", "gv", "fv", "cv", "iv"):
            nk = pro[k].shape[0]
            return pl.BlockSpec((nk, bc, nz), lambda b: (0, b, 0),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((bc, nz), lambda b: (b, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid=(ncol_p // bc,),
        in_specs=[spec_for(k) for k in in_keys],
        out_specs=[pl.BlockSpec((bc, nz), lambda b: (b, 0),
                                memory_space=pltpu.VMEM)
                   for _ in out_keys],
        out_shape=[jax.ShapeDtypeStruct((ncol_p, nz), dtype)
                   for _ in out_keys],
        interpret=interpret,
    )(*operands)

    res = {k: (v[:ncol] if pad else v) for k, v in zip(out_keys, out)}
    return res
