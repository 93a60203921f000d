"""Parse a jax.profiler xplane.pb (TPU device plane) and print per-op
device self-times aggregated by op name prefix.  Companion to
prof_trace.py (whose tensorboard-plugin parse path is broken by a
protobuf version conflict in this image).

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
           python prof/parse_trace.py [trace_dir] [n_steps]
"""
import collections
import glob
import re
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2

trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/kid_trace"
n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20

path = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))[-1]
xs = xplane_pb2.XSpace()
xs.ParseFromString(open(path, "rb").read())

for plane in xs.planes:
    if "TPU" not in plane.name:
        continue
    meta = {m.id: m.name for m in plane.event_metadata.values()}
    tot = collections.Counter()
    cnt = collections.Counter()
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            name = meta.get(ev.metadata_id, "?")
            tot[name] += ev.duration_ps
            cnt[name] += 1
    grand = sum(tot.values())
    print(f"== {plane.name}: total XLA-op device time "
          f"{grand/1e12*1e3:.2f} ms over {n_steps} steps = "
          f"{grand/1e12*1e3/n_steps:.3f} ms/step ==")
    # aggregate by sanitized op "kind" prefix (fusion.123 -> fusion)
    agg = collections.Counter()
    for name, ps in tot.items():
        kind = re.sub(r"[.\d]+$", "", name)
        agg[kind] += ps
    for kind, ps in agg.most_common(25):
        print(f"  {ps/1e12*1e3/n_steps:8.4f} ms/step  {kind}")
    print("-- top individual ops --")
    for name, ps in tot.most_common(35):
        print(f"  {ps/1e12*1e3/n_steps:8.4f} ms/step  x{cnt[name]:<5d} {name[:80]}")
