#!/usr/bin/env python
"""Minimal xplane.pb analyzer: per-HLO-op TPU time from a jax.profiler trace.

The tensorboard_plugin_profile converter in this image is broken against
its own TF build (missing `xspace_to_tools_data` + protobuf descriptor
mismatch), so this parses the XSpace proto directly via
tensorflow.tsl.profiler.protobuf.xplane_pb2 and reduces the device
plane's "XLA Ops" lines to:

  * total device-busy time per step
  * time grouped by HLO category (the `hlo_category` stat)
  * the top-N ops by total self time

  python tools/xplane_summary.py <logdir> [steps]
"""

from __future__ import annotations

import glob
import os
import sys
from collections import defaultdict

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def load_xspace(logdir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        raise RuntimeError(f"no xplane under {logdir}")
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def analyze(logdir: str, steps: int = 1, top_n: int = 40):
    xs = load_xspace(logdir)
    device_planes = [p for p in xs.planes
                     if "TPU" in p.name or "/device:" in p.name.lower()
                     or p.name.startswith("/device")]
    if not device_planes:
        device_planes = [p for p in xs.planes if "Host" not in p.name]
    by_op = defaultdict(lambda: [0.0, 0])  # name -> [ps, count]
    op_cat = {}
    total_ps = 0.0
    for plane in device_planes:
        stat_names = {m.id: m.name for m in plane.stat_metadata.values()}
        ev_meta = dict(plane.event_metadata.items())
        for line in plane.lines:
            if "XLA Ops" not in line.name and "XLA TraceMe" not in line.name \
                    and line.name != "Ops":
                continue
            for ev in line.events:
                md = ev_meta.get(ev.metadata_id)
                name = md.name if md else "?"
                dur = ev.duration_ps
                by_op[name][0] += dur
                by_op[name][1] += 1
                total_ps += dur
                if name not in op_cat:
                    cat = "?"
                    stats = list(ev.stats) + (list(md.stats) if md else [])
                    for st in stats:
                        if stat_names.get(st.metadata_id) == "hlo_category":
                            cat = (st.str_value
                                   or stat_names.get(st.ref_value, "?"))
                    op_cat[name] = cat
    # copy-start/async-start spans cover the whole async region and OVERLAP
    # with compute (VMEM prefetches, async slices) — keep them out of the
    # busy-time total and the top-op table, report their sum separately.
    ASYNC = {"copy-start", "async-start", "copy-done", "async-done"}
    by_cat = defaultdict(float)
    sync_ps = 0.0
    for name, (ps, _) in by_op.items():
        cat = op_cat.get(name, "?")
        by_cat[cat] += ps
        if cat not in ASYNC:
            sync_ps += ps
    ops = sorted(((v[0], op_cat.get(k, "?"), v[1], k)
                  for k, v in by_op.items()
                  if op_cat.get(k, "?") not in ASYNC), reverse=True)
    us = 1e-6
    return {
        "device_busy_us_per_step": round(sync_ps * us / steps, 1),
        "async_span_us_per_step": round((total_ps - sync_ps) * us / steps, 1),
        "by_category_us_per_step": {
            k: round(v * us / steps, 1)
            for k, v in sorted(by_cat.items(), key=lambda kv: -kv[1])
            if k not in ASYNC},
        "top_ops": [
            {"us_per_step": round(ps * us / steps, 1), "category": c,
             "occurrences": n, "op": name[:200]}
            for ps, c, n, name in ops[:top_n]
        ],
    }


if __name__ == "__main__":
    import json

    logdir = sys.argv[1]
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    r = analyze(logdir, steps)
    print(json.dumps({k: v for k, v in r.items() if k != "top_ops"},
                     indent=1))
    for op in r["top_ops"][:30]:
        print(f"{op['us_per_step']:>10.1f} us  {op['category']:<22}"
              f" x{op['occurrences']:<6} {op['op'][:110]}")
