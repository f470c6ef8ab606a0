"""Diff two byte_map.py JSON dumps (before/after a byte-diet change).

Groups each map's rows by (opcode, result shape) — instruction names are
not stable across compiles — sums the proxy MB per group, and prints the
groups whose totals moved, sorted by delta.  The headline is the
cost_analysis total delta, which (unlike the proxy) is the number the
roofline row uses.

    python scripts/byte_map_diff.py runs/byte_map_r4.json \
        runs/byte_map_r4_after.json [--min-mb 2]
"""

from __future__ import annotations

import argparse
import collections
import json
import re

_SHAPE_RE = re.compile(r"((?:f|bf|s|u|pred)[0-9]*\[[0-9,]*\])")


def group_key(row):
    m = _SHAPE_RE.search(row["sig"].split("=", 1)[-1])
    return (row["opcode"], m.group(1) if m else "?")


def load(path):
    with open(path) as f:
        d = json.load(f)
    g = collections.Counter()
    n = collections.Counter()
    for row in d["rows"]:
        g[group_key(row)] += row["total_mb"]
        n[group_key(row)] += 1
    return d, g, n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("before")
    p.add_argument("after")
    p.add_argument("--min-mb", type=float, default=2.0)
    args = p.parse_args()

    db, gb, nb = load(args.before)
    da, ga, na = load(args.after)

    cb, ca = db.get("cost_bytes"), da.get("cost_bytes")
    if cb and ca:
        print(f"cost_analysis bytes: {cb / 1e6:.1f} MB -> {ca / 1e6:.1f} MB "
              f"({(ca - cb) / cb * 100:+.1f}%)")
    fb, fa = db.get("cost_flops"), da.get("cost_flops")
    if fb and fa:
        print(f"cost_analysis flops: {fb / 1e9:.2f} G -> {fa / 1e9:.2f} G "
              f"({(fa - fb) / fb * 100:+.1f}%)")

    deltas = []
    for key in set(gb) | set(ga):
        d = ga.get(key, 0.0) - gb.get(key, 0.0)
        if abs(d) >= args.min_mb:
            deltas.append((d, key))
    deltas.sort()
    print(f"# per-(opcode, shape) proxy-MB deltas (|delta| >= "
          f"{args.min_mb} MB), negative = traffic removed:")
    for d, (op, shape) in deltas:
        print(f"  {d:+10.2f} MB  {op:<18} {shape:<28} "
              f"(rows {nb.get((op, shape), 0)} -> {na.get((op, shape), 0)})")


if __name__ == "__main__":
    main()
