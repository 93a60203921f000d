"""Multi-process distributed equivalence: 1-process vs 2-process mesh.

Round-3 verdict missing-item #4: everything ran one process with 8
virtual devices (the ICI analogue); the DCN/multi-process path —
``jax.distributed`` init, a global mesh spanning processes, ppermute
halo exchange crossing process boundaries — was never exercised.  This
orchestrator runs ``multiproc_worker.py`` (cumulus2d, sharded over the
same 8 global devices) once as a single process and once as TWO
``jax.distributed`` processes of 4 local devices each, then asserts the
final states and precip series are BITWISE identical (SURVEY §4.2).
Writes MULTIPROC_r04.json.

Usage:  python run_multiproc.py
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))


def run_workers(num, port, out):
    procs = []
    for pid in range(num):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(HERE, "multiproc_worker.py"),
             str(num), str(pid), str(port), out],
            cwd=HERE, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    logs = []
    for p in procs:
        out_text, _ = p.communicate(timeout=1200)
        logs.append(out_text)
        if p.returncode != 0:
            raise RuntimeError(
                f"worker exited {p.returncode}:\n" + out_text[-4000:])
    return logs


def main():
    import numpy as np
    t0 = time.time()
    tmp = tempfile.mkdtemp(prefix="kid_multiproc_")
    ref = os.path.join(tmp, "ref.npz")
    multi = os.path.join(tmp, "multi.npz")
    run_workers(1, 0, ref)
    print("single-process run done", flush=True)
    run_workers(2, 12355, multi)
    print("2-process run done", flush=True)

    # same default as multiproc_worker.py (module not importable here:
    # it parses sys.argv and sets XLA_FLAGS at import)
    N_STEPS = int(os.environ.get("KID_MULTIPROC_STEPS", "900"))
    a, b = np.load(ref), np.load(multi)
    report = {"case": "cumulus2d", "n_steps": N_STEPS, "global_devices": 8,
              "layouts": ["1 process x 8 devices",
                          "2 jax.distributed processes x 4 devices"],
              "fields": {}, "seconds": None}
    bitwise = True
    for k in a.files:
        same = bool(np.array_equal(a[k], b[k]))
        maxdiff = float(np.abs(a[k] - b[k]).max()) if not same else 0.0
        report["fields"][k] = {"bitwise_equal": same, "max_abs_diff": maxdiff}
        bitwise &= same
    report["bitwise_identical"] = bitwise
    report["seconds"] = round(time.time() - t0, 1)
    out_name = os.environ.get("KID_MULTIPROC_OUT", "MULTIPROC_r05.json")
    with open(os.path.join(HERE, out_name), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"bitwise_identical": bitwise,
                      "seconds": report["seconds"]}))
    sys.exit(0 if bitwise else 1)


if __name__ == "__main__":
    main()
