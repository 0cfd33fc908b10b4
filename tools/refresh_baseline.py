#!/usr/bin/env python3
"""Ratchet-safe SHUFFLE_BASELINE refresh (round-9 item 2, hardened with
plan fingerprints per round-11 item 2).

The baseline's per-query times are ghost-adjudication BUDGETS: a suite run
whose time exceeds 2x budget at byte-identical shuffle is re-run isolated.
Round 9 showed why the baseline must never be a raw copy of a bench line:
a contended q39 run (1.73 -> 3.60 s, shuffle bytes identical) was absorbed
into the baseline, doubling the budget and blinding the adjudicator for the
pipeline flagship. Round 11 showed the wire-delta escape hatch is too wide:
a bench-session CONF change moved recorded shuffle bytes on 20 queries with
no logical-plan change, and "bytes moved" re-derived those budgets from the
current run, erasing min-history.

Merge rule, per query (plan_fp = 16-hex md5 of the canonicalized physical
plan, emitted by graft.Bench since round 12):
  - plan_fp PRESENT on both sides and DIFFERENT -> the plan changed;
    the budget follows the new measurement (up or down).
  - plan_fp present and IDENTICAL -> new budget = min(old, new time),
    EVEN IF shuffle bytes moved — wire deltas alone (conf changes, AQE
    wobble, cache-eviction blips) can never ratchet a budget up.
  - plan_fp MISSING on either side (legacy artifacts) -> conservative
    min-merge; nothing can inflate without fingerprint evidence.
  - query only in the new line (new this round) -> take the new time.
  - query only in the old baseline (retired)    -> dropped.

Guard (always enforced, also in --check mode): no merged budget may exceed
1.5x the old budget without a plan-fingerprint change. With the min rule
this is unreachable from this tool; the guard exists so a hand-edited or
raw-copied baseline fails loudly before it can blind the adjudicator.

Usage:
  tools/refresh_baseline.py OLD_BASELINE NEW_BENCH [-o OUT]   # merge
  tools/refresh_baseline.py --check OLD_BASELINE CANDIDATE    # guard only
  tools/refresh_baseline.py --selftest                        # invariants
Dev tool only — not part of the shipped library.
"""
import json
import sys

WIRE_REL = 0.01   # shuffle-byte noise: 1% ...
WIRE_ABS = 0.5    # ... with a 0.5 MB floor (matches Bench.scala adjudication)
INFLATE = 1.5     # max budget inflation without a plan-fingerprint change


def wire_same(a, b):
    if a is None or b is None:
        return False
    return abs(a - b) <= max(WIRE_REL * b, WIRE_ABS)


def fp_changed(a, b):
    """True ONLY with positive evidence: both fingerprints present, valid,
    and different. A missing or errored fingerprint proves nothing."""
    return (a is not None and b is not None
            and a != "err" and b != "err" and a != b)


def merge(old, new):
    oq = old["queries"]
    nq = new["queries"]
    ofp, nfp = old.get("plan_fp", {}), new.get("plan_fp", {})
    out = dict(new)  # keep the new line's full shape (wire maps, plan_fp, ...)
    merged = {}
    for q, nt in nq.items():
        ot = oq.get(q)
        if ot is None:
            merged[q] = nt                      # new query: no history
        elif fp_changed(ofp.get(q), nfp.get(q)):
            merged[q] = nt                      # plan changed: follow it
        else:
            # identical or unproven plan: budgets only fall. Wire deltas
            # alone are NOT plan evidence (round-11 item 2).
            merged[q] = min(ot, nt)
    out["queries"] = merged
    out["value"] = round(sum(merged.values()), 3)
    out["value_suite"] = out["value"]
    # budgets are adjudicated by construction now; drop the raw-run residue
    for k in ("top20", "unstable", "adjudicated", "stabilized", "failed",
              "build_s"):
        out.pop(k, None)
    return out


def check(old, cand):
    """The anti-ratchet guard: candidate budgets may not inflate >1.5x over
    the old baseline unless that query's canonicalized plan fingerprint
    actually changed. Wire-byte deltas are reported as context but are NOT
    sufficient evidence."""
    oq, ow = old["queries"], old.get("shuffle_write_mb", {})
    cq, cw = cand["queries"], cand.get("shuffle_write_mb", {})
    ofp, cfp = old.get("plan_fp", {}), cand.get("plan_fp", {})
    flags = []
    for q, ct in sorted(cq.items()):
        ot = oq.get(q)
        if ot is None or ot <= 0.05:
            continue
        if ct <= INFLATE * ot:
            continue
        if fp_changed(ofp.get(q), cfp.get(q)):
            continue                            # demonstrated plan change
        if ofp.get(q) is None and cfp.get(q) is None:
            why = "no plan fingerprints on either side"
        elif ofp.get(q) is None or cfp.get(q) is None:
            why = "plan fingerprint missing on one side"
        else:
            why = "unchanged plan fingerprint"
        wire_note = ("unchanged shuffle bytes"
                     if wire_same(cw.get(q), ow.get(q))
                     else "shuffle bytes moved — not plan evidence")
        flags.append(f"{q}: budget {ot:.2f} -> {ct:.2f} s "
                     f"({ct / ot:.1f}x) at {why} ({wire_note}) — "
                     f"a contended run is being ratcheted in")
    for f in flags:
        print(f"  ✗ {f}")
    print(f"== ratchet guard: {len(cq) - len(flags)}/{len(cq)} budgets ok, "
          f"{len(flags)} inflated ==")
    return 1 if flags else 0


def selftest():
    """The invariants the round-11 judge asked to be spec'd (RatchetGuardSpec
    shells into this): a budget can NEVER inflate without a fingerprint
    change, no matter what the wire bytes do."""
    old = {"queries": {"q1": 1.0, "q2": 1.0, "q3": 1.0},
           "shuffle_write_mb": {"q1": 10.0, "q2": 10.0, "q3": 10.0},
           "plan_fp": {"q1": "aaaa", "q2": "aaaa"}}
    # q1: same fp, wire moved 3x, time 3x  -> must min-merge to 1.0
    # q2: fp CHANGED                        -> follows the 3.0 measurement
    # q3: no fp history, wire moved         -> must min-merge to 1.0
    new = {"queries": {"q1": 3.0, "q2": 3.0, "q3": 3.0, "q4": 0.5},
           "shuffle_write_mb": {"q1": 30.0, "q2": 30.0, "q3": 30.0,
                                "q4": 1.0},
           "plan_fp": {"q1": "aaaa", "q2": "bbbb", "q3": "cccc",
                       "q4": "dddd"}}
    m = merge(old, new)
    fails = []
    if m["queries"]["q1"] != 1.0:
        fails.append(f"q1: wire delta at SAME fp inflated the budget "
                     f"({m['queries']['q1']})")
    if m["queries"]["q2"] != 3.0:
        fails.append("q2: a demonstrated fp change must follow the "
                     "new measurement")
    if m["queries"]["q3"] != 1.0:
        fails.append("q3: a missing fingerprint must min-merge")
    if m["queries"]["q4"] != 0.5:
        fails.append("q4: a new query takes its first measurement")
    # the --check gate must reject a hand-inflated candidate at same fp
    # (q1) and at missing fp (q3), and accept the fp-changed q2
    inflated = {"queries": {"q1": 3.0, "q2": 3.0, "q3": 3.0},
                "shuffle_write_mb": new["shuffle_write_mb"],
                "plan_fp": new["plan_fp"]}
    import io
    import contextlib
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = check(old, inflated)
    text = buf.getvalue()
    if rc != 1:
        fails.append("--check accepted an inflated candidate")
    if "q1:" not in text:
        fails.append("--check missed the same-fp inflation (q1)")
    if "q3:" not in text:
        fails.append("--check missed the missing-fp inflation (q3)")
    if "q2:" in text:
        fails.append("--check flagged a legitimate fp-changed budget (q2)")
    # and the merge tool's own output must always pass its own check
    buf2 = io.StringIO()
    with contextlib.redirect_stdout(buf2):
        rc2 = check(old, m)
    if rc2 != 0:
        fails.append("merge output failed its own ratchet guard")
    for f in fails:
        print(f"  ✗ {f}")
    print(f"== selftest: {'FAIL' if fails else 'ok'} ==")
    return 1 if fails else 0


def main(argv):
    if argv and argv[0] == "--selftest":
        return selftest()
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
