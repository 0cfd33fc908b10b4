#!/usr/bin/env python3
"""Round-over-round shuffle regression guard: compare two Bench JSON lines
(e.g. target/bench_last.json vs the previous round's BENCH_r{N}.json or the
committed SHUFFLE_BASELINE.json) and flag any query whose shuffle WRITE bytes
grew more than 2x (beyond a 1 MB noise floor), or that spills where it
previously didn't. Exit 1 on any flag so the check can gate a commit.

Usage: python3 tools/check_shuffle_regression.py <baseline.json> <current.json>
Dev tool only — not part of the shipped library.
"""
import json
import sys

NOISE_MB = 1.0
RATIO = 2.0


def main(base_path, cur_path):
    base = json.load(open(base_path))
    cur = json.load(open(cur_path))
    if "shuffle_write_mb" not in base:
        print(f"[shuffle-guard] baseline {base_path} has no shuffle columns "
              f"(pre-r5 format) — nothing to compare")
        return 0
    b_w, c_w = base["shuffle_write_mb"], cur.get("shuffle_write_mb", {})
    b_s, c_s = base.get("spill_mb", {}), cur.get("spill_mb", {})
    flags = []
    for q, cw in sorted(c_w.items()):
        bw = b_w.get(q)
        if bw is None:
            continue  # new query this round — no baseline
        if cw > NOISE_MB and cw > RATIO * max(bw, NOISE_MB):
            flags.append(f"{q}: shuffle write {bw:.1f} -> {cw:.1f} MB "
                         f"({cw / max(bw, NOISE_MB):.1f}x)")
        if c_s.get(q, 0.0) > NOISE_MB and b_s.get(q, 0.0) <= NOISE_MB:
            flags.append(f"{q}: NEW SPILL {c_s[q]:.1f} MB (was "
                         f"{b_s.get(q, 0.0):.1f})")
    for f in flags:
        print(f"  ✗ {f}")
    n = len(c_w)
    print(f"== {n - len(flags)}/{n} queries within shuffle budget, "
          f"{len(flags)} flagged ==")
    return 1 if flags else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
