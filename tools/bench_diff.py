#!/usr/bin/env python3
"""Diff two bench outputs (warm per-query seconds): flags real
regressions/wins beyond a noise threshold and summarizes the rest.
Accepts either the raw graft.Bench JSON line or the driver's
BENCH_r{N}.json wrapper (whose "tail" holds a fragment of that line) —
query times are regex-extracted so truncation doesn't matter.
When BOTH files carry a graft.MemEvalRunner "longmemeval" JSON line,
also diffs the IR metrics (overall + per-type Recall/MRR/NDCG).
Usage: bench_diff.py <old> <new> [threshold_ratio=1.5]
"""
import json, re, sys

old_p, new_p = sys.argv[1], sys.argv[2]
thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5


def load(p):
    raw = open(p).read()
    qs = {m.group(1): float(m.group(2))
          for m in re.finditer(r'\\?"(q_\w+)\\?":([0-9.]+)', raw)}
    tm = re.search(r'\\?"(?:metric\\?":\\?"total\\?",\\?"value|total)\\?":([0-9.]+)', raw)
    return qs, (float(tm.group(1)) if tm else sum(qs.values()))


oq, ototal = load(old_p)
nq, ntotal = load(new_p)
added = sorted(set(nq) - set(oq))
removed = sorted(set(oq) - set(nq))
common = sorted(set(oq) & set(nq))

slower, faster = [], []
for q in common:
    a, b = oq[q], nq[q]
    if b > a * thresh and b - a > 0.25:
        slower.append((q, a, b))
    elif a > b * thresh and a - b > 0.25:
        faster.append((q, a, b))

print(f"old total={ototal:.1f}s ({len(oq)} queries)  "
      f"new total={ntotal:.1f}s ({len(nq)} queries)")
if added:
    print(f"added ({len(added)}): " + ", ".join(f"{q} {nq[q]:.2f}s" for q in added))
if removed:
    print(f"removed ({len(removed)}): " + ", ".join(removed))
for tag, rows in (("SLOWER", slower), ("faster", faster)):
    for q, a, b in rows:
        r = b / a if b > a else a / b
        print(f"{tag}: {q}  {a:.2f}s -> {b:.2f}s  ({r:.1f}x)")
if not slower:
    print(f"no per-query regression beyond {thresh}x+0.25s on {len(common)} common queries")


# ---- IR metrics (MemEvalRunner longmemeval line), when both sides have one
def load_ir(p):
    for line in open(p):
        line = line.strip()
        if '"metric":"longmemeval"' in line and line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                pass
    return None


oir, nir = load_ir(old_p), load_ir(new_p)
if oir and nir:
    IR_EPS = 0.005

    def row(tag, o, n):
        out = []
        for key in ("recall", "mrr", "ndcg"):
            a = o.get(key, o.get(f"{key}_at_k"))
            b = n.get(key, n.get(f"{key}_at_k"))
            if a is None or b is None:
                continue
            mark = "" if abs(b - a) < IR_EPS else ("  ▲" if b > a else "  ▼ REGRESSED")
            out.append(f"{key} {a:.3f} -> {b:.3f}{mark}")
        print(f"IR {tag}: " + "  |  ".join(out))

    print(f"\nIR (longmemeval, k={nir.get('k', '?')}, "
          f"provider {oir.get('provider', '?')} -> {nir.get('provider', '?')}, "
          f"n={nir.get('questions', '?')}):")
    row("overall", oir, nir)
    for qtype in sorted(set(oir.get("per_type", {})) | set(nir.get("per_type", {}))):
        o, n = oir.get("per_type", {}).get(qtype), nir.get("per_type", {}).get(qtype)
        if o and n:
            row(qtype, o, n)
        else:
            print(f"IR {qtype}: only in {'new' if n else 'old'}")
