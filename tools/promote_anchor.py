#!/usr/bin/env python3
"""Mechanical BENCH_BASELINE.json promotion (r11 verdict #4 -> r12).

The anchor used to be promoted by judgment ("the quietest of four
runs") -- defensible prose, but a contended round could promote a
flattering anchor with the same prose. This tool makes the rule
mechanical and the ONLY sanctioned path for replacing the anchor:

    A candidate bench_out.json replaces BENCH_BASELINE.json only if
    its calibration-probe trace DOMINATES the incumbent's:
    min AND median AND max are all <= the incumbent's.

Probe dominance means the candidate run observed a quieter host at
every summary point -- under the one-sided-noise model (contention can
only inflate, never deflate) its per-query values are closer to the
uncontended truth everywhere, so promotion can only tighten the
anchor, never flatter a noisy run. Ties promote (equal traces carry
the newer tree's values).

Every attempt -- accepted or rejected -- is appended to the anchor's
`promotion_log` with both probe summaries, so the artifact itself
records what was considered (the verdict's "record the rejected
candidates" requirement). Bench.scala emits the same comparison as
`anchor_candidate` in bench_out.json, so a run knows at write time
whether it is promotable.

Usage: python3 tools/promote_anchor.py [candidate] [anchor]
       (defaults: bench_out.json BENCH_BASELINE.json)
Exit 0 = promoted, 3 = rejected (dominance fails), 2 = bad input.
"""
import json
import os
import sys
import time


def median(xs):
    """Upper-middle median — MUST match BenchSupport.median (Scala), or
    `dominates` here could disagree with the run's own anchor_candidate
    self-report on even-length traces (code-review r12: the committed
    anchor's 180-entry trace makes the two definitions differ today)."""
    s = sorted(xs)
    return s[len(s) // 2]


def probe_summary(doc):
    trace = doc.get("probe_trace")
    if not trace:
        return None
    return {
        "min": min(trace),
        "median": median(trace),
        "max": max(trace),
        "n": len(trace),
    }


def dominates(cand, inc):
    return (cand["min"] <= inc["min"] and cand["median"] <= inc["median"]
            and cand["max"] <= inc["max"])


def main():
    cand_path = sys.argv[1] if len(sys.argv) > 1 else "bench_out.json"
    anchor_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_BASELINE.json"
    try:
        with open(cand_path) as f:
            cand = json.load(f)
    except (OSError, ValueError) as e:
        print(f"cannot read candidate {cand_path}: {e}", file=sys.stderr)
        return 2
    cand_probe = probe_summary(cand)
    if cand_probe is None or not cand.get("queries_norm"):
        print("candidate lacks probe_trace/queries_norm -- not a bench_out.json",
              file=sys.stderr)
        return 2
    if os.path.exists(anchor_path):
        # an EXISTING anchor that cannot be read or lacks its probe
        # trace must REFUSE, not bootstrap-promote — otherwise a
        # corrupt/hand-edited anchor lets any noisy run replace the
        # trusted one, the exact bypass this tool exists to prevent
        # (code-review r12)
        try:
            with open(anchor_path) as f:
                anchor = json.load(f)
        except (OSError, ValueError) as e:
            print(f"anchor {anchor_path} exists but is unreadable: {e} -- "
                  "refusing to promote over it", file=sys.stderr)
            return 2
        inc_probe = probe_summary(anchor)
        if inc_probe is None:
            print(f"anchor {anchor_path} exists but has no probe_trace -- "
                  "refusing to promote over it", file=sys.stderr)
            return 2
    else:
        anchor, inc_probe = None, None  # bootstrap: no incumbent file

    entry = {
        "at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "candidate_probe": cand_probe,
        "incumbent_probe": inc_probe,
    }
    log = (anchor or {}).get("promotion_log", [])

    if inc_probe is None or dominates(cand_probe, inc_probe):
        entry["promoted"] = True
        cand["promotion_log"] = log + [entry]
        with open(anchor_path, "w") as f:
            json.dump(cand, f)
            f.write("\n")
        print(f"PROMOTED: candidate probe {cand_probe} dominates "
              f"incumbent {inc_probe}")
        return 0
    # rejected: anchor values untouched, but the attempt is recorded in it
    entry["promoted"] = False
    anchor["promotion_log"] = log + [entry]
    with open(anchor_path, "w") as f:
        json.dump(anchor, f)
        f.write("\n")
    print(f"REJECTED: candidate probe {cand_probe} does not dominate "
          f"incumbent {inc_probe} (anchor values unchanged; attempt logged)")
    return 3


if __name__ == "__main__":
    sys.exit(main())
