"""Fused Pallas TPU kernel for the whole microphysics step (phases 2-20).

Round-3 profiling (prof/README.md) proved the step is boundary-bound, not
compute-bound: a rates-only kernel won 2.2x in isolation but lost end to
end because its ~70-channel HBM boundary (materialization + layout copies
+ lost prologue/tail fusion) cost ~15 ms while the kernel itself added
only ~0.5 ms.  The fix, shipped here, is to let ONE kernel swallow nearly
the whole of ``mp_thompson`` (module_mp_thompson09n.f90:1156-3688):

  * the XLA stage keeps ONLY what must stay outside Mosaic — the
    lookup-table indices and the scattered family gathers plus their
    consumer rates (``solver._prologue`` + ``solver._table_stage``), since
    Mosaic has no scattered-gather primitive and XLA's gather+consumer
    fusions are the cheapest known lowering of them;
  * the kernel re-derives the entire prologue VMEM-resident from the raw
    state (pure VPU math — free compared to an HBM round trip) and then
    runs phases 8-20: rates, clamps, tendency assembly, provisional
    update, PSD recompute, saturation-adjustment Newton, rain evaporation,
    terminal velocities, the CFL-substepped sedimentation sweeps (dynamic
    trip count), instant melt/freeze, final renorm;
  * the boundary is therefore 14 input channels (12 state + pres + dzq)
    plus the 19 table-stage channels, and 12 + 4 output channels.

Layout: all channels are (ncol, nz) blocks of (BC, nz), grid over column
blocks; nz (120) is lane-padded to 128 by Mosaic.  Vertical structures
stay inside a block (nz is never sharded): the graupel-N0 suffix cummin
and the fall-speed fill-down are log-doubling shifted selects, the
sedimentation substep loop is a ``lax.fori_loop`` whose trip count is the
BLOCK max (columns in a quiet block no longer pay a stormy block's
substeps — strictly better than the global batch max of the inline path).

Equivalence with the inline XLA path is pinned by interpret-mode tests
(tests/test_pallas.py) and the f32 TPU case-length validation artifact.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# columns per block: live (BC, nz) f32 intermediates must fit the 16 MB
# VMEM together with double-buffered I/O streaming
BC = int(os.environ.get("KID_TPU_PALLAS_BC", "128"))

_PRECIP_KEYS = ("ppt_rain", "ppt_snow", "ppt_graupel", "ppt_ice")


def _tv_keys(cfg):
    from . import solver as S
    if cfg.iiwarm:
        return ("ef_rw",)
    return ("ef_rw", "ef_sw", "tide") + tuple(
        k for k in S.P8_ICE
        if k.startswith(("prr_", "prs_", "prg_", "pnr_", "pri_", "pni_")))


def _diag_keys(want_rates):
    from . import solver as S
    if not want_rates:
        return ()
    return tuple(S.P8_RATES) + ("prr_gml", "prv_rev", "pnr_rev")


def fused_kid_step(st, w_pat_prof, mmod, tv, pres_prof, exner_prof,
                   rho0_prof, dz_prof, cfg, dt_f, want_rates,
                   interpret=None, bc=None):
    """The whole 1-D KiD DRIVER step as one fused kernel: vertical MUSCL
    advection + divergence closure (driver/advection.py), the adapter's
    provisional state ``x + (adv+div)*dt`` and theta<->T Exner mapping
    (mphys_thompson09n.f90:60-93), then phases 2-20 of the solver — all
    VMEM-resident.  The kernel reads the RAW scan-carried KidState (which
    already lives in HBM) so the provisional state never materializes as
    kernel operands; the XLA stage recomputes it only inside the fused
    gather-index chain.

    Args:
      st:          KidState of (nx, nz) arrays (theta, not T).
      w_pat_prof:  (nz+1,) static rho0*w face profile (1-D case: identical
                   for every column).
      mmod:        scalar time modulation m(t); w_face = mmod * w_pat.
      tv:          table-stage channels (from the XLA provisional state).
      pres/exner/rho0/dz_prof: (nz,) static case profiles.
    Returns (new KidState, Precip, diag) exactly like the driver's
    unfused advect->micro->update sequence.
    """
    import jax.numpy as jnp_

    from . import solver as S
    from ..driver.advection import (advective_tendency_z,
                                    divergence_tendency_z)
    from ..driver.loop import KidState
    from .state import ColumnState, Precip

    assert not cfg.is_aerosol_aware
    ncol, nz = st.qv.shape
    dtype = st.qv.dtype
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bc = bc or (BC if not want_rates else max(32, BC // 2))
    pad = (-ncol) % bc
    ncol_p = ncol + pad

    fields = KidState._fields
    tvk = _tv_keys(cfg)
    diagk = _diag_keys(want_rates)
    in_keys = list(fields) + list(tvk)
    out_keys = list(fields) + list(_PRECIP_KEYS) + list(diagk)

    def prep(x):
        x = jnp.broadcast_to(x, (ncol, nz)).astype(dtype)
        if pad:
            x = jnp.pad(x, ((0, pad), (0, 0)), mode="edge")
        return x

    vals = dict(zip(fields, st))
    vals.update(tv)
    operands = ([prep(vals[k]) for k in in_keys]
                + [jnp.asarray(mmod, dtype).reshape(1, 1),
                   jnp.asarray(w_pat_prof, dtype).reshape(1, nz + 1),
                   jnp.asarray(pres_prof, dtype).reshape(1, nz),
                   jnp.asarray(exner_prof, dtype).reshape(1, nz),
                   jnp.asarray(rho0_prof, dtype).reshape(1, nz),
                   jnp.asarray(dz_prof, dtype).reshape(1, nz)])
    n_chan = len(in_keys)

    def kernel(*refs):
        d = {k: r[...] for k, r in zip(in_keys, refs[:n_chan])}
        m_ref, w_ref, p_ref, e_ref, r0_ref, dz_ref = refs[n_chan:n_chan + 6]
        out_refs = dict(zip(out_keys, refs[n_chan + 6:]))
        m = m_ref[0, 0]
        w_face = m * w_ref[...]                 # (1, nz+1)
        exner = e_ref[...]                      # (1, nz)
        rho0 = r0_ref[...]
        dz = dz_ref[...]
        dt = jnp_.asarray(dt_f, dtype)
        prov = {}
        for f in fields:
            q = d[f]
            ten = (advective_tendency_z(q, w_face, rho0, dz)
                   + divergence_tendency_z(q, w_face, rho0, dz))
            prov[f] = q + ten * dt
        micro_in = ColumnState(
            t=prov["theta"] * exner, qv=prov["qv"], qc=prov["qc"],
            qi=prov["qi"], qr=prov["qr"], qs=prov["qs"], qg=prov["qg"],
            ni=prov["ni"], nr=prov["nr"], nc=prov["nc"],
            nwfa=prov["nwfa"], nifa=prov["nifa"])
        tvb = {k: d[k] for k in tvk}
        out, ppt, diag = S.core_from_tables(
            micro_in, p_ref[...], None, dz, tvb, cfg, dt_f, want_rates,
            kernel=True)
        new = dict(theta=out.t / exner, qv=out.qv, qc=out.qc, qr=out.qr,
                   nr=out.nr, qi=out.qi, ni=out.ni, qs=out.qs, qg=out.qg,
                   nc=out.nc, nwfa=out.nwfa, nifa=out.nifa)
        for f in fields:
            out_refs[f][...] = new[f]
        for k, v in zip(_PRECIP_KEYS,
                        (ppt.rain, ppt.snow, ppt.graupel, ppt.ice)):
            out_refs[k][...] = v
        for k in diagk:
            out_refs[k][...] = diag[k]

    chan = pl.BlockSpec((bc, nz), lambda b: (b, 0),
                        memory_space=pltpu.VMEM)
    col = pl.BlockSpec((bc, 1), lambda b: (b, 0),
                       memory_space=pltpu.VMEM)

    def prof_spec(w):
        return pl.BlockSpec((1, w), lambda b: (0, 0),
                            memory_space=pltpu.VMEM)

    extra_specs = [pl.BlockSpec((1, 1), lambda b: (0, 0),
                                memory_space=pltpu.SMEM),
                   prof_spec(nz + 1), prof_spec(nz), prof_spec(nz),
                   prof_spec(nz), prof_spec(nz)]

    out = pl.pallas_call(
        kernel,
        grid=(ncol_p // bc,),
        in_specs=[chan] * n_chan + extra_specs,
        out_specs=[col if k in _PRECIP_KEYS else chan for k in out_keys],
        out_shape=[jax.ShapeDtypeStruct(
            (ncol_p, 1 if k in _PRECIP_KEYS else nz), dtype)
            for k in out_keys],
        input_output_aliases={i: i for i in range(len(fields))},
        interpret=interpret,
    )(*operands)

    res = dict(zip(out_keys, out))

    def unpad(x):
        return x[:ncol] if pad else x

    new_state = KidState(*[unpad(res[f]) for f in fields])
    precip = Precip(*[unpad(res[k])[:, 0] for k in _PRECIP_KEYS])
    diag = {k: unpad(res[k]) for k in diagk}
    return new_state, precip, diag


def fused_rates(state, pres, tv, cfg, dt_f, want_rates,
                interpret=None, bc=None):
    """Kernel A of the aerosol split step: phases 2-11
    (``solver.rates_from_tables``) as one fused kernel.  Outputs the p8
    tendency channels (P8_OUT, + P8_RATES when ``want_rates``) that both
    the XLA aerosol-lookup stage and kernel B (``fused_post``) consume.
    See fused_step for why the one-kernel design cannot cover aerosol
    mode (the phase-14 lookups need the phase-12 provisional state)."""
    from . import solver as S
    from .state import ColumnState

    qv = state.qv
    ncol, nz = qv.shape
    dtype = qv.dtype
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bc = bc or (BC if not want_rates else max(32, BC // 2))
    pad = (-ncol) % bc
    ncol_p = ncol + pad

    fields = ColumnState._fields
    tvk = _tv_keys(cfg)
    in_keys = list(fields) + ["pres"] + list(tvk)
    out_keys = list(S.P8_OUT) + (list(S.P8_RATES) if want_rates else [])

    def prep(x):
        x = jnp.broadcast_to(x, (ncol, nz)).astype(dtype)
        if pad:
            x = jnp.pad(x, ((0, pad), (0, 0)), mode="edge")
        return x

    vals = dict(zip(fields, state))
    vals["pres"] = pres
    vals.update(tv)
    operands = [prep(vals[k]) for k in in_keys]

    def kernel(*refs):
        d = {k: r[...] for k, r in zip(in_keys, refs[:len(in_keys)])}
        out_refs = dict(zip(out_keys, refs[len(in_keys):]))
        st = ColumnState(*[d[f] for f in fields])
        tvb = {k: d[k] for k in tvk}
        p8 = S.rates_from_tables(st, d["pres"], tvb, cfg, dt_f,
                                 want_rates, kernel=True)
        for k in out_keys:
            out_refs[k][...] = p8[k]

    chan = pl.BlockSpec((bc, nz), lambda b: (b, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(ncol_p // bc,),
        in_specs=[chan for _ in in_keys],
        out_specs=[chan for _ in out_keys],
        out_shape=[jax.ShapeDtypeStruct((ncol_p, nz), dtype)
                   for _ in out_keys],
        interpret=interpret,
    )(*operands)

    def unpad(x):
        return x[:ncol] if pad else x

    return {k: unpad(v) for k, v in zip(out_keys, out)}


def fused_post(state, pres, dzq, p8, aero_aux, cfg, dt_f, want_rates,
               interpret=None, bc=None):
    """Kernel B of the aerosol split step: phases 12-20
    (``solver.post_from_p8``) with the XLA-stage lookup results
    (xnc_act, wev) as operands.  Returns (new ColumnState, Precip, diag)
    like fused_step; the P8_RATES part of ``diag`` is taken from the
    kernel-A ``p8`` dict (it passes through _post_rates unchanged)."""
    from . import solver as S
    from .state import ColumnState, Precip

    qv = state.qv
    ncol, nz = qv.shape
    dtype = qv.dtype
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bc = bc or (BC if not want_rates else max(32, BC // 2))
    pad = (-ncol) % bc
    ncol_p = ncol + pad

    fields = ColumnState._fields
    p8k = list(S.P8_OUT)
    auxk = ["xnc_act", "wev"]
    in_keys = list(fields) + ["pres", "dzq"] + p8k + auxk
    diagk = ("prr_gml", "prv_rev", "pnr_rev") if want_rates else ()
    out_keys = list(fields) + list(_PRECIP_KEYS) + list(diagk)

    def prep(x):
        x = jnp.broadcast_to(x, (ncol, nz)).astype(dtype)
        if pad:
            x = jnp.pad(x, ((0, pad), (0, 0)), mode="edge")
        return x

    vals = dict(zip(fields, state))
    vals["pres"] = pres
    vals["dzq"] = dzq
    vals.update({k: p8[k] for k in p8k})
    vals.update(aero_aux)
    operands = [prep(vals[k]) for k in in_keys]

    def kernel(*refs):
        d = {k: r[...] for k, r in zip(in_keys, refs[:len(in_keys)])}
        out_refs = dict(zip(out_keys, refs[len(in_keys):]))
        st = ColumnState(*[d[f] for f in fields])
        p8b = {k: d[k] for k in p8k}
        aux = {"xnc_act": d["xnc_act"], "wev": d["wev"]}
        new_state, ppt, diag = S.post_from_p8(
            st, d["pres"], d["dzq"], p8b, cfg, dt_f, want_rates,
            kernel=True, aero_aux=aux)
        for f in fields:
            out_refs[f][...] = getattr(new_state, f)
        for k, v in zip(_PRECIP_KEYS,
                        (ppt.rain, ppt.snow, ppt.graupel, ppt.ice)):
            out_refs[k][...] = v
        for k in diagk:
            out_refs[k][...] = diag[k]

    chan = pl.BlockSpec((bc, nz), lambda b: (b, 0),
                        memory_space=pltpu.VMEM)
    col = pl.BlockSpec((bc, 1), lambda b: (b, 0),
                       memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid=(ncol_p // bc,),
        in_specs=[chan for _ in in_keys],
        out_specs=[col if k in _PRECIP_KEYS else chan for k in out_keys],
        out_shape=[jax.ShapeDtypeStruct(
            (ncol_p, 1 if k in _PRECIP_KEYS else nz), dtype)
            for k in out_keys],
        input_output_aliases={i: i for i in range(len(fields))},
        interpret=interpret,
    )(*operands)

    res = dict(zip(out_keys, out))

    def unpad(x):
        return x[:ncol] if pad else x

    new_state = ColumnState(*[unpad(res[f]) for f in fields])
    precip = Precip(*[unpad(res[k])[:, 0] for k in _PRECIP_KEYS])
    diag = {}
    if want_rates:
        diag = {k: p8[k] for k in S.P8_RATES}
        diag.update({k: unpad(res[k]) for k in diagk})
    return new_state, precip, diag


def fused_step(state, pres, dzq, tv, cfg, dt_f, want_rates,
               interpret=None, bc=None):
    """Run phases 2-20 (``solver.core_from_tables``) as one fused kernel
    over column blocks.  ``state`` is a (ncol, nz) ColumnState; ``tv`` the
    table-stage channel dict; non-aerosol configs only (the gate in
    ``solver._use_pallas`` guarantees this)."""
    from . import solver as S
    from .state import ColumnState, Precip

    assert not cfg.is_aerosol_aware
    qv = state.qv
    ncol, nz = qv.shape
    dtype = qv.dtype
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bc = bc or (BC if not want_rates else max(32, BC // 2))
    pad = (-ncol) % bc
    ncol_p = ncol + pad

    fields = ColumnState._fields
    tvk = _tv_keys(cfg)
    diagk = _diag_keys(want_rates)
    in_keys = list(fields) + ["pres", "dzq"] + list(tvk)
    out_keys = list(fields) + list(_PRECIP_KEYS) + list(diagk)

    def prep(x):
        x = jnp.broadcast_to(x, (ncol, nz)).astype(dtype)
        if pad:
            x = jnp.pad(x, ((0, pad), (0, 0)), mode="edge")
        return x

    vals = dict(zip(fields, state))
    vals["pres"] = pres
    vals["dzq"] = dzq
    vals.update(tv)
    operands = [prep(vals[k]) for k in in_keys]

    def kernel(*refs):
        d = {k: r[...] for k, r in zip(in_keys, refs[:len(in_keys)])}
        out_refs = dict(zip(out_keys, refs[len(in_keys):]))
        st = ColumnState(*[d[f] for f in fields])
        tvb = {k: d[k] for k in tvk}
        new_state, ppt, diag = S.core_from_tables(
            st, d["pres"], None, d["dzq"], tvb, cfg, dt_f, want_rates,
            kernel=True)
        for f in fields:
            out_refs[f][...] = getattr(new_state, f)
        for k, v in zip(_PRECIP_KEYS,
                        (ppt.rain, ppt.snow, ppt.graupel, ppt.ice)):
            out_refs[k][...] = v        # already (BC, 1) in kernel mode
        for k in diagk:
            out_refs[k][...] = diag[k]

    chan = pl.BlockSpec((bc, nz), lambda b: (b, 0),
                        memory_space=pltpu.VMEM)
    col = pl.BlockSpec((bc, 1), lambda b: (b, 0),
                       memory_space=pltpu.VMEM)

    def out_spec(k):
        return col if k in _PRECIP_KEYS else chan

    def out_shape(k):
        if k in _PRECIP_KEYS:
            return jax.ShapeDtypeStruct((ncol_p, 1), dtype)
        return jax.ShapeDtypeStruct((ncol_p, nz), dtype)

    out = pl.pallas_call(
        kernel,
        grid=(ncol_p // bc,),
        in_specs=[chan for _ in in_keys],
        out_specs=[out_spec(k) for k in out_keys],
        out_shape=[out_shape(k) for k in out_keys],
        # the 12 state inputs are consumed exactly once and the outputs
        # have identical shapes: alias them so donated state buffers are
        # reused in place
        input_output_aliases={i: i for i in range(len(fields))},
        interpret=interpret,
    )(*operands)

    res = dict(zip(out_keys, out))

    def unpad(x):
        return x[:ncol] if pad else x

    new_state = ColumnState(*[unpad(res[f]) for f in fields])
    precip = Precip(*[unpad(res[k])[:, 0] for k in _PRECIP_KEYS])
    diag = {k: unpad(res[k]) for k in diagk}
    return new_state, precip, diag
