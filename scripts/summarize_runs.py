"""Summarize campaign runs: final eval metrics per runs/<name>/metrics.jsonl.

    python scripts/summarize_runs.py [runs/*/metrics.jsonl ...]

Prints one line per run: last eval-prefixed record's step, elbo, count
accuracies, expected steps — the BASELINE.md table feed.
"""

from __future__ import annotations

import glob
import json
import sys


def last_records(path):
    last = {}
    with open(path) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            last[rec.get("split", "?")] = rec
    return last


def main():
    paths = sys.argv[1:] or sorted(glob.glob("runs/*/metrics.jsonl"))
    for path in paths:
        run = path.split("/")[-2]
        last = last_records(path)
        ev = last.get("eval") or last.get("train")
        if not ev:
            print(f"{run:24s}  (no records)")
            continue
        print(f"{run:24s} step={ev.get('step'):>7} "
              f"elbo={ev.get('elbo', float('nan')):8.1f} "
              f"acc={ev.get('count_accuracy', float('nan')):.4f} "
              f"acc_mode={ev.get('count_accuracy_mode', float('nan')):.4f} "
              f"E[n]={ev.get('expected_steps', float('nan')):.3f}")


if __name__ == "__main__":
    main()
