"""Group the latest jax-profiler trace's HLO self-times by model component.

Usage: python tools/hlo_group.py [trace_dir] [steps]
Reads the newest /tmp/dmmfods_prof_* trace by default (3 steps).
"""
import glob
import json
import re
import sys
import collections

from xprof.convert import raw_to_tool_data as rtd

base = sys.argv[1] if len(sys.argv) > 1 else None
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
if base is None:
    import os
    dirs = sorted(glob.glob("/tmp/dmmfods_prof_*/plugins/profile/*"),
                  key=os.path.getmtime)
    base = dirs[-1]
xs = glob.glob(base + "/*.xplane.pb")
data, _ = rtd.xspace_to_tool_data(xs, "hlo_stats", {})
data = json.loads(data if isinstance(data, str) else data.decode())
cols = [c.get("label") for c in data["cols"]]
idx = {c: i for i, c in enumerate(cols)}

groups = collections.Counter()
cats = collections.defaultdict(collections.Counter)
total = 0.0
for r in data["rows"]:
    v = [c.get("v") for c in r["c"]]
    us = (v[idx["Total self time (us)"]] or 0) / steps
    fw = v[idx["Framework op name"]] or ""
    cat = v[idx["HLO op category"]]
    m = re.search(
        r"(stream_2_features/[a-z_0-9]+|features_[a-z_0-9]+|denseblock\d|"
        r"up\d|dec_out_to_heat_maps|concat_module|transition\d|stem)", fw)
    g = m.group(1) if m else (fw.split("/")[-1][:30] if fw else "(unattributed)")
    groups[g] += us
    cats[g][cat] += us
    total += us

print(f"total: {total/1e3:.2f} ms")
for g, us in groups.most_common(24):
    top = ", ".join(f"{c}={t/1e3:.1f}" for c, t in cats[g].most_common(3))
    print(f"{us/1e3:>8.2f} ms {100*us/total:>5.1f}%  {g:<42} [{top}]")
