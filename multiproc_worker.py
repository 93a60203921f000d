"""Worker for the multi-process distributed equivalence check.

Runs the sharded cumulus2d case on a GLOBAL mesh assembled across
``num_processes`` CPU processes via ``jax.distributed`` — the DCN-analogue
code path (SURVEY §4.2 distributed level: "same program, 1-process mesh
vs N-process mesh must be bitwise-identical").  Each process hosts
``8 // num_processes`` virtual CPU devices so the global mesh is always
the same 8 devices; process 0 all-gathers the final state and writes it
to ``<out>.npz``.

Invoked by run_multiproc.py; also usable standalone:
    python multiproc_worker.py <num_processes> <process_id> <port> <out>
"""
from __future__ import annotations

import os
import sys

NUM, PID, PORT, OUT = (int(sys.argv[1]), int(sys.argv[2]),
                       int(sys.argv[3]), sys.argv[4])
N_DEV_GLOBAL = 8
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={N_DEV_GLOBAL // NUM}")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

if NUM > 1:
    jax.distributed.initialize(coordinator_address=f"localhost:{PORT}",
                               num_processes=NUM, process_id=PID)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from kid_tpu.dist.mesh import AXIS, make_mesh, simulate_sharded  # noqa: E402
from kid_tpu.driver.cases import CUMULUS2D  # noqa: E402
from kid_tpu.driver.loop import initial_state  # noqa: E402
from kid_tpu.micro.solver import device_tables  # noqa: E402
from kid_tpu.tables.cache import get_tables  # noqa: E402

# full case length (cumulus2d: 1800 s / dt=2 s; VERDICT r4 weak #5 asked
# >= 200 steps — run the whole case)
N_STEPS = int(os.environ.get("KID_MULTIPROC_STEPS", "900"))


def main():
    case = CUMULUS2D
    mesh = make_mesh(N_DEV_GLOBAL)
    assert len(jax.devices()) == N_DEV_GLOBAL, jax.devices()
    tables = device_tables(get_tables(iiwarm=case.micro.iiwarm),
                           jnp.float64)
    st_host = initial_state(case, jnp.float64)

    def global_arr(x):
        x = np.asarray(x)
        sh = NamedSharding(mesh, P(AXIS, *([None] * (x.ndim - 1))))
        return jax.make_array_from_callback(x.shape, sh,
                                            lambda idx: x[idx])

    st0 = jax.tree_util.tree_map(global_arr, st_host)
    final, streams = simulate_sharded(st0, tables, case, N_STEPS, mesh)
    out = {f: multihost_utils.process_allgather(getattr(final, f),
                                                tiled=True)
           for f in final._fields}
    out["ppt_rain"] = multihost_utils.process_allgather(
        streams.ppt_rain, tiled=True)
    if PID == 0:
        np.savez(OUT, **out)
        print(f"worker done: {OUT} n_processes={NUM} "
              f"devices={len(jax.devices())}", flush=True)


if __name__ == "__main__":
    main()
