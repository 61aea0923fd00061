#!/usr/bin/env python3
"""Per-query bench regression diff between two bench JSON files.

Usage: python3 tools/bench_diff.py <old.json> <new.json> [threshold]

Each input is a Bench output line ({"metric":"total","value":…,
"queries":{name: sec,…}}) or a driver BENCH_r{N}.json wrapping it.
Prints totals, the queries regressed/improved beyond `threshold`
(default 2.0×), and coverage changes (added/removed queries) — the
round-over-round comparability the r02 tail truncation cost us.

Sub-threshold movement on MB-scale inputs is host codegen-stall noise
(BASELINE.md documents the variance band); only structural regressions
clear 2×.
"""
import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        text = f.read()
    # tolerate a driver wrapper, a bare Bench line, or a captured log
    # with the Bench line among other output: find the object containing
    # "queries"
    candidates = []
    try:
        candidates.append(json.loads(text))
    except json.JSONDecodeError:
        for line in text.splitlines():
            line = line.strip()
            brace = line.find("{")
            if brace < 0 or '"queries"' not in line:
                continue
            try:
                candidates.append(json.loads(line[brace:]))
            except json.JSONDecodeError:
                pass
    for data in candidates:
        if isinstance(data, dict) and "queries" in data:
            return data
        if isinstance(data, dict):  # driver wrapper: search values
            for v in data.values():
                if isinstance(v, dict) and "queries" in v:
                    return v
                if isinstance(v, str):
                    try:
                        p = json.loads(v)
                        if isinstance(p, dict) and "queries" in p:
                            return p
                    except json.JSONDecodeError:
                        pass
    raise SystemExit(f"{path}: no bench object with a 'queries' map found")


def main(old_path: str, new_path: str, threshold: float = 2.0) -> None:
    old, new = load(old_path), load(new_path)
    oq, nq = old["queries"], new["queries"]
    common = sorted(set(oq) & set(nq))
    print(f"total: {old.get('value', '?')}s ({len(oq)} queries) -> "
          f"{new.get('value', '?')}s ({len(nq)} queries)")
    added, removed = sorted(set(nq) - set(oq)), sorted(set(oq) - set(nq))
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")

    moved = []
    for name in common:
        a, b = oq[name], nq[name]
        if a <= 0:
            continue
        ratio = b / a
        if ratio >= threshold or ratio <= 1 / threshold:
            moved.append((ratio, name, a, b))
    if not moved:
        print(f"no common query moved beyond {threshold}x")
        return
    print(f"{'query':40s} {'old':>8s} {'new':>8s} {'ratio':>7s}")
    for ratio, name, a, b in sorted(moved, reverse=True):
        print(f"{name:40s} {a:7.2f}s {b:7.2f}s {ratio:6.2f}x")


if __name__ == "__main__":
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    main(sys.argv[1], sys.argv[2],
         float(sys.argv[3]) if len(sys.argv) > 3 else 2.0)
