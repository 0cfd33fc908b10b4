#!/usr/bin/env python3
"""Ratchet-safe SHUFFLE_BASELINE refresh (the round-9 judge's item 2).

The baseline's per-query times are ghost-adjudication BUDGETS: a suite run
whose time exceeds 2x budget at byte-identical shuffle is re-run isolated.
Round 9 showed why the baseline must never be a raw copy of a bench line:
a contended q39 run (1.73 -> 3.60 s, shuffle bytes identical) was absorbed
into the baseline, doubling the budget and blinding the adjudicator for the
pipeline flagship.

Merge rule, per query:
  - shuffle_write_mb changed beyond max(1%, 0.5 MB)  -> the PLAN changed;
    the budget follows the new measurement (up or down).
  - shuffle bytes unchanged -> new budget = min(old budget, new time).
    A contended run can only ever LOWER a budget, never inflate it.
  - query only in the new line (new this round) -> take the new time.
  - query only in the old baseline (retired)    -> dropped.

Guard (always enforced, also in --check mode): no merged budget may exceed
1.5x the old budget without a shuffle-byte delta. With the min rule this is
unreachable from this tool; the guard exists so a hand-edited or raw-copied
baseline fails loudly before it can blind the adjudicator.

Usage:
  tools/refresh_baseline.py OLD_BASELINE NEW_BENCH [-o OUT]   # merge
  tools/refresh_baseline.py --check OLD_BASELINE CANDIDATE    # guard only
Dev tool only — not part of the shipped library.
"""
import json
import sys

WIRE_REL = 0.01   # shuffle-byte noise: 1% ...
WIRE_ABS = 0.5    # ... with a 0.5 MB floor (matches Bench.scala adjudication)
INFLATE = 1.5     # max budget inflation without a shuffle-byte delta


def wire_same(a, b):
    if a is None or b is None:
        return False
    return abs(a - b) <= max(WIRE_REL * b, WIRE_ABS)


def merge(old, new):
    oq, ow = old["queries"], old.get("shuffle_write_mb", {})
    nq, nw = new["queries"], new.get("shuffle_write_mb", {})
    out = dict(new)  # keep the new line's full shape (wire maps, spill, ...)
    merged = {}
    for q, nt in nq.items():
        ot = oq.get(q)
        if ot is None:
            merged[q] = nt                      # new query: no history
        elif nw.get(q) is None or ow.get(q) is None:
            # wire data MISSING on either side: we cannot prove the plan
            # changed, so fall back to the conservative min-merge — a bench
            # line lacking shuffle bytes must never ratchet a budget up
            merged[q] = min(ot, nt)
        elif not wire_same(nw.get(q), ow.get(q)):
            merged[q] = nt                      # plan changed: follow it
        else:
            merged[q] = min(ot, nt)             # same plan: budgets only fall
    out["queries"] = merged
    out["value"] = round(sum(merged.values()), 3)
    out["value_suite"] = out["value"]
    # budgets are adjudicated by construction now; drop the raw-run residue
    for k in ("top20", "unstable", "adjudicated", "failed", "build_s"):
        out.pop(k, None)
    return out


def check(old, cand):
    """The anti-ratchet guard: candidate budgets may not inflate >1.5x over
    the old baseline unless that query's shuffle bytes actually moved."""
    oq, ow = old["queries"], old.get("shuffle_write_mb", {})
    cq, cw = cand["queries"], cand.get("shuffle_write_mb", {})
    flags = []
    for q, ct in sorted(cq.items()):
        ot = oq.get(q)
        if ot is None or ot <= 0.05:
            continue
        if ct <= INFLATE * ot:
            continue
        # inflation is only legitimate with a DEMONSTRATED shuffle delta;
        # unchanged bytes AND missing bytes both flag (a line without wire
        # data could otherwise launder a contended time into the baseline)
        wire_missing = cw.get(q) is None or ow.get(q) is None
        if wire_same(cw.get(q), ow.get(q)) or wire_missing:
            why = ("no shuffle-byte data" if wire_missing
                   else "unchanged shuffle bytes")
            flags.append(f"{q}: budget {ot:.2f} -> {ct:.2f} s "
                         f"({ct / ot:.1f}x) at {why} — "
                         f"a contended run is being ratcheted in")
    for f in flags:
        print(f"  ✗ {f}")
    print(f"== ratchet guard: {len(cq) - len(flags)}/{len(cq)} budgets ok, "
          f"{len(flags)} inflated ==")
    return 1 if flags else 0


def main(argv):
    if argv and argv[0] == "--check":
        old, cand = (json.load(open(p)) for p in argv[1:3])
        return check(old, cand)
    old_path, new_path = argv[0], argv[1]
    out_path = argv[argv.index("-o") + 1] if "-o" in argv else old_path
    old, new = json.load(open(old_path)), json.load(open(new_path))
    merged = merge(old, new)
    rc = check(old, merged)
    if rc:
        print("refusing to write an inflated baseline", file=sys.stderr)
        return rc
    with open(out_path, "w") as f:
        json.dump(merged, f)
    lowered = sum(1 for q, t in merged["queries"].items()
                  if q in old["queries"] and t < old["queries"][q] - 1e-9)
    print(f"wrote {out_path}: {len(merged['queries'])} budgets, "
          f"{lowered} lowered, total {merged['value']:.1f} s")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
