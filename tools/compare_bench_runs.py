#!/usr/bin/env python3
"""Cross-run bench agreement check (the honesty cadence, VERDICT r17 #7).

Usage: python3 tools/compare_bench_runs.py runA.json runB.json

Compares two bench_detail artifacts from the SAME classes: per-query base
walls, per-tier scale ratios, and (r18) per-row cpu agreement. Prints the
rows disagreeing beyond 1.5x (wall/ratio) or 2x (cpu at >=5 cpu-s) and an
agreement summary.
"""
import json, sys


def load(p):
    return json.load(open(p))


def main(a_path, b_path):
    a, b = load(a_path), load(b_path)
    qa, qb = a["queries"], b["queries"]
    common = sorted(set(qa) & set(qb))
    bad_wall = []
    for n in common:
        wa, wb = qa[n]["sec"], qb[n]["sec"]
        if max(wa, wb) > 1.5 * min(wa, wb):
            bad_wall.append((n, wa, wb))
    bad_ratio, bad_cpu, n_ratio = [], [], 0
    for tier in ("scale", "scaleF", "scale26", "scale100"):
        ra = a.get(tier, {}).get("rows", {})
        rb = b.get(tier, {}).get("rows", {})
        for n in sorted(set(ra) & set(rb)):
            n_ratio += 1
            x, y = ra[n]["ratio"], rb[n]["ratio"]
            if max(x, y) > 1.5 * min(x, y):
                bad_ratio.append((f"{tier}:{n}", x, y, ra[n]["sec"], rb[n]["sec"]))
            ca, cb = ra[n].get("cpu_sec", -1), rb[n].get("cpu_sec", -1)
            if ca > 0 and cb > 0 and max(ca, cb) >= 5.0 and max(ca, cb) > 2 * min(ca, cb):
                bad_cpu.append((f"{tier}:{n}", ca, cb))
    print(f"base walls: {len(common) - len(bad_wall)}/{len(common)} within 1.5x")
    for n, x, y in bad_wall:
        print(f"  [wall] {n}: {x:.2f} vs {y:.2f}")
    print(f"scale ratios: {n_ratio - len(bad_ratio)}/{n_ratio} within 1.5x")
    for n, x, y, sa, sb in bad_ratio:
        print(f"  [ratio] {n}: {x:.2f} vs {y:.2f} (sec {sa:.2f} vs {sb:.2f})")
    print(f"cpu (material rows): {len(bad_cpu)} divergent >2x")
    for n, x, y in bad_cpu:
        print(f"  [cpu] {n}: {x:.1f} vs {y:.1f}")
    print(f"failed: A={a.get('failed')} B={b.get('failed')}")
    print(f"totals: A={a.get('total'):.1f}s B={b.get('total'):.1f}s "
          f"n={a.get('n_queries')}/{b.get('n_queries')}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
