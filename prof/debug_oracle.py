"""Differential debug: solver diag rates vs oracle rates (dev tool)."""
import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

import sys
sys.path.insert(0, "tests")
from test_oracle import _profile, _run_jax, _run_oracle  # noqa: E402

from kid_tpu.config import MicroConfig  # noqa: E402
from kid_tpu.micro import ColumnState, batched_microphysics  # noqa: E402
from kid_tpu.micro.solver import device_tables  # noqa: E402
from kid_tpu.tables.cache import get_tables  # noqa: E402

seed = int(sys.argv[1]) if len(sys.argv) > 1 else 0
tables = get_tables(iiwarm=False)
tdev = device_tables(tables, jnp.float64)
cfg = MicroConfig(iiwarm=False, dtype="float64", l_sediment=(os.environ.get("NOSED") != "1"))
prof = _profile(48, seed)

st = ColumnState(
    t=jnp.asarray(prof["t"]), qv=jnp.asarray(prof["qv"]),
    qc=jnp.asarray(prof["qc"]), qi=jnp.asarray(prof["qi"]),
    qr=jnp.asarray(prof["qr"]), qs=jnp.asarray(prof["qs"]),
    qg=jnp.asarray(prof["qg"]), ni=jnp.asarray(prof["ni"]),
    nr=jnp.asarray(prof["nr"]), nc=jnp.asarray(prof["nc"]),
    nwfa=jnp.asarray(prof["nwfa"]), nifa=jnp.asarray(prof["nifa"]))
out, ppt, diag = batched_microphysics(
    st, jnp.asarray(prof["p"]), jnp.asarray(prof["w"]),
    jnp.asarray(prof["dz"]), 10.0, tdev, cfg)
want = _run_oracle(prof, 10.0, tables, iiwarm=False, l_sediment=(os.environ.get("NOSED") != "1"))

print("== rate comparison (max rel diff where |oracle| > 1e-30) ==")
for name, oarr in sorted(want["rates"].items()):
    if name not in diag:
        continue
    j = np.asarray(diag[name], np.float64)
    o = np.asarray(oarr, np.float64)
    scale = np.maximum(np.abs(o), np.abs(j))
    bad = scale > 1e-30
    if not bad.any():
        continue
    rel = np.abs(j - o)[bad] / np.maximum(scale[bad], 1e-300)
    if rel.max() > 1e-9:
        kworst = np.where(bad)[0][np.argmax(rel)]
        print(f"{name:10s} maxrel {rel.max():9.2e} at k={kworst} "
              f"jax={j[kworst]:.8e} oracle={o[kworst]:.8e}")
print("== state fields ==")
for f, key in [("t", "t1d"), ("qv", "qv1d"), ("qc", "qc1d"),
               ("qr", "qr1d"), ("qi", "qi1d"), ("qs", "qs1d"),
               ("qg", "qg1d"), ("ni", "ni1d"), ("nr", "nr1d")]:
    j = np.asarray(getattr(out, f), np.float64)
    o = np.asarray(want[key], np.float64)
    scale = np.maximum(np.abs(o), np.abs(j))
    bad = scale > 1e-30
    rel = np.abs(j - o)[bad] / np.maximum(scale[bad], 1e-300)
    if bad.any() and rel.max() > 1e-9:
        kworst = np.where(bad)[0][np.argmax(rel)]
        print(f"{f:4s} maxrel {rel.max():9.2e} at k={kworst} "
              f"jax={j[kworst]:.8e} oracle={o[kworst]:.8e}")
