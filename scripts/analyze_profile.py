"""Summarize a jax.profiler trace: top HLO ops by self-time.

Usage:
    MME_PROFILE_DIR=/tmp/prof python bench.py       # capture
    python scripts/analyze_profile.py /tmp/prof     # analyze

Feeds the BASELINE.md perf decomposition: where VPU/HBM time actually goes
between the MXU bursts (the reference has no profiling story at all —
SURVEY.md §5.1). Parsing uses the xprof pip package's xplane converter.
"""

from __future__ import annotations

import glob
import json
import sys


def find_xplanes(log_dir: str) -> list[str]:
    paths = sorted(glob.glob(f"{log_dir}/**/*.xplane.pb", recursive=True))
    if not paths:
        raise SystemExit(f"no .xplane.pb under {log_dir}")
    return paths[-1:]  # newest capture


def tool_data(xplanes: list[str], tool: str, params=None):
    from xprof.convert import raw_to_tool_data
    data, _ctype = raw_to_tool_data.xspace_to_tool_data(
        xplanes, tool, params or {})
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    return data


def main():
    log_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prof"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    xplanes = find_xplanes(log_dir)
    print(f"# {xplanes[0]}")

    rows = []
    data = tool_data(xplanes, "hlo_stats")
    obj = json.loads(data) if isinstance(data, str) else data
    # hlo_stats is GViz-style: {cols: [...], rows: [{c: [{v: ...}...]}...]}
    cols = [c.get("label") or c.get("id") for c in obj["cols"]]
    for r in obj["rows"]:
        rows.append({cols[i]: (cell or {}).get("v")
                     for i, cell in enumerate(r["c"])})

    def col(row, *names, default=0.0):
        for n in names:
            for k, v in row.items():
                if k and n in k.lower():
                    return v
        return default

    for r in rows:
        r["_self_us"] = float(col(r, "total self time (us)",
                                  "self time (us)", "self_time") or 0.0)
    rows.sort(key=lambda r: -r["_self_us"])
    total = sum(r["_self_us"] for r in rows) or 1.0
    print(f"{'self%':>6} {'cum%':>6} {'self ms':>9}  category / op")
    cum = 0.0
    for r in rows[:top_n]:
        cum += r["_self_us"]
        cat = col(r, "category", default="?")
        name = col(r, "hlo op name", "op name", "name", default="?")
        expr = str(col(r, "hlo op expression", "expression", default=""))[:80]
        print(f"{100*r['_self_us']/total:6.1f} {100*cum/total:6.1f} "
              f"{r['_self_us']/1e3:9.2f}  {cat:<22} {name}  {expr}")

    # category rollup
    agg = {}
    for r in rows:
        agg.setdefault(str(col(r, "category", default="?")), [0.0, 0])
        agg[str(col(r, "category", default="?"))][0] += r["_self_us"]
        agg[str(col(r, "category", default="?"))][1] += 1
    print("\n# by category")
    for cat, (us, n) in sorted(agg.items(), key=lambda kv: -kv[1][0]):
        print(f"{100*us/total:6.1f}%  {us/1e3:9.2f} ms  {n:5d} ops  {cat}")


if __name__ == "__main__":
    main()
