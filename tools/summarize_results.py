"""Print a BASELINE-ready one-line summary of a results artifact.

Usage: python tools/summarize_results.py results/<artifact>.json [...]

For each artifact: model/dataset, epochs run, best-valid epoch, valid and
test recall@k / ndcg@k vectors, measured s/epoch (median inter-epoch gap is
not stored, so wall_s / epochs is reported), and whether the run is partial.
"""

from __future__ import annotations

import json
import sys


def summarize(path: str) -> str:
    d = json.load(open(path))
    traj = d.get("trajectory") or []
    valids = [t for t in traj if "valid" in t]
    n_ep = len(traj)
    wall = d.get("wall_s")
    sep = f"{wall / n_ep:.1f}" if (wall and n_ep) else "?"
    k = d.get("k")
    out = [f"{path}: {d.get('model')}/{d.get('dataset')} "
           f"epochs={n_ep} wall_s={wall} (~{sep} s/epoch) k={k}"]
    if d.get("partial"):
        out.append("  PARTIAL (no finals)")
        if valids:
            last = valids[-1]
            out.append(f"  last valid @ep{last['epoch']}: "
                       f"recall={[round(v, 4) for v in last['valid']['recall']]}")
    bv, ts = d.get("best_valid"), d.get("test")
    if bv:
        out.append(f"  best valid: recall={[round(v, 4) for v in bv['recall']]} "
                   f"ndcg={[round(v, 4) for v in bv['ndcg']]}")
    if ts:
        out.append(f"  test:       recall={[round(v, 4) for v in ts['recall']]} "
                   f"ndcg={[round(v, 4) for v in ts['ndcg']]}")
    return "\n".join(out)


if __name__ == "__main__":
    for p in sys.argv[1:]:
        print(summarize(p))
