"""Per-op HBM byte attribution for the headline train step (VERDICT r3
next #4: the roofline row says ~25% headroom that the aggregate
cost-model byte estimate cannot resolve — this maps WHERE the 1.57
MB/image goes).

Compiles a preset's train step, walks the optimized HLO, and ranks
instructions by a bytes-touched proxy: output buffer size + the sizes of
distinct operand buffers (post-fusion, so each fusion is one row — the
same granularity the hardware sees).  The proxy over-counts aliased /
in-place buffers, matching ``cost_analysis()['bytes accessed']``'s
upper-bound semantics; use the RANKING, not the absolute numbers.

    python scripts/byte_map.py --config canonical_fast [--top 30]
"""

from __future__ import annotations

import argparse
import collections
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "f8e4m3": 1, "f8e5m2": 1,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1,
}

_SHAPE_RE = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")
_DEF_RE = re.compile(r"^\s*(?:ROOT\s+)?(%[\w.\-]+)\s*=\s*(\(?[^=]+?\)?)\s+"
                     r"([\w\-]+)\(")
_OPERAND_RE = re.compile(r"(%[\w.\-]+)")


def shape_bytes(shape_str: str) -> int:
    """Total bytes of all array shapes in a (possibly tuple) shape str."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(shape_str):
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def parse_hlo(hlo: str):
    """Yield (name, shape_str, opcode, operand_names, line) per def."""
    for line in hlo.splitlines():
        m = _DEF_RE.match(line)
        if not m:
            continue
        name, shape_str, opcode = m.groups()
        # operands = %refs after the opcode's open paren
        tail = line[m.end():]
        operands = _OPERAND_RE.findall(tail.split("//")[0])
        yield name, shape_str, opcode, operands, line.strip()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="canonical_fast")
    p.add_argument("--top", type=int, default=30)
    p.add_argument("--min-mb", type=float, default=1.0,
                   help="only rows touching at least this many MB")
    p.add_argument("--out", default=None, help="also write JSON here")
    p.add_argument("--model-set", action="append", metavar="KEY=VALUE",
                   help="ModelConfig override (run_variant.py syntax) — "
                        "map an experimental knob's byte profile, e.g. "
                        "--model-set canvas_rebuild=True")
    args = p.parse_args()

    import jax

    from attend_infer_repeat_tpu.configs import get_config
    from attend_infer_repeat_tpu.utils.cache import enable_compilation_cache
    import bench

    enable_compilation_cache()
    config = get_config(args.config)
    if args.model_set:
        import ast
        import dataclasses
        kw = {}
        for item in args.model_set:
            key, _, val = item.partition("=")
            kw[key.strip()] = ast.literal_eval(val)
        config = dataclasses.replace(
            config, model=dataclasses.replace(config.model, **kw))
    model, state, bank = bench._build(config)
    from attend_infer_repeat_tpu.train import make_train_step
    from attend_infer_repeat_tpu.train.step import make_scan_train_step

    k = max(1, config.train.scan_steps)
    if k > 1:
        step = make_scan_train_step(config, model, bank, k, donate=False)
    else:
        step = make_train_step(config, model, digit_bank=bank, donate=False)
    compiled = step.lower(state).compile()
    flops, byts = bench._cost_analysis(compiled)
    hlo = compiled.as_text()

    # name -> own output bytes (for operand lookups)
    out_bytes = {}
    rows = []
    for name, shape_str, opcode, operands, line in parse_hlo(hlo):
        b_out = shape_bytes(shape_str)
        out_bytes[name] = b_out
        rows.append((name, opcode, b_out, operands, line))

    ranked = []
    by_opcode = collections.Counter()
    for name, opcode, b_out, operands, line in rows:
        if opcode in ("tuple", "get-tuple-element", "parameter", "bitcast"):
            continue
        b_in = sum(out_bytes.get(o, 0) for o in set(operands))
        total = b_out + b_in
        by_opcode[opcode] += total
        ranked.append({"name": name, "opcode": opcode,
                       "out_mb": round(b_out / 1e6, 2),
                       "in_mb": round(b_in / 1e6, 2),
                       "total_mb": round(total / 1e6, 2),
                       "sig": line[:160]})
    ranked.sort(key=lambda r: -r["total_mb"])

    batch = config.train.batch_size
    print(f"# {args.config}: compiled program (scan_steps={k}), "
          f"cost_analysis bytes={byts and round(byts / 1e6, 1)} MB "
          f"({byts and round(byts / (batch * 1), 0)} B/img per scan "
          f"trip-count caveat), flops={flops and round(flops / 1e9, 2)} G")
    print(f"# proxy-ranked instructions (>= {args.min_mb} MB):")
    for r in ranked[:args.top]:
        if r["total_mb"] < args.min_mb:
            break
        print(f"{r['total_mb']:10.2f} MB  (out {r['out_mb']:8.2f} / "
              f"in {r['in_mb']:8.2f})  {r['opcode']:<18} {r['name']}")
        print(f"             {r['sig']}")
    print("# totals by opcode (proxy MB):")
    for op, b in by_opcode.most_common(15):
        print(f"  {op:<20} {b / 1e6:10.1f} MB")

    if args.out:
        with open(args.out, "w") as f:
            json.dump({"config": args.config, "scan_steps": k,
                       "cost_bytes": byts, "cost_flops": flops,
                       "rows": ranked[:200]}, f, indent=1)


if __name__ == "__main__":
    main()
