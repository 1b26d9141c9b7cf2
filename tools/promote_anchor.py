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

A third, narrowest operation exists for KNOB CHANGES (ADVICE r13 —
RefineR moved 10 -> 20 but the anchor still carried R=10 timings, so
the regression diff compared different computations):

    python3 tools/promote_anchor.py --refresh Q1[,Q2...] \
        --reason "<what changed>" [candidate] [anchor]

replaces exactly the NAMED queries' per-query entries (all four
sections, candidate must be healthy in all) with the candidate run's
values, leaving every other entry, the probe summary, and the headline
total untouched. A refresh bypasses the dominance check (the knob
changed; old and new timings aren't comparable), so it must carry its
own audit trail (ADVICE r14): --reason is MANDATORY, and the log entry
records the reason, the refreshed names, the REPLACED old entries, and
the source probe stats — a refresh of an unchanged-but-flattering
query is reviewable from the artifact alone, not just detectable by a
human correlating timestamps. Use ONLY when the query's registered
computation changed (a knob, a geometry).

A second, narrower operation exists for COVERAGE, not replacement:

    python3 tools/promote_anchor.py --augment [candidate] [anchor]

adds per-query entries for queries the candidate measured that the
anchor LACKS (newly registered queries, which otherwise have no
regression guard until some future run happens to dominate). Augment
NEVER modifies an existing entry, the probe summary, or the headline
total -- it only extends the per-query maps -- and each augmentation
is logged with the source run's probe stats, so a reader can judge
the new entries' noise floor. The values are one-sided-conservative:
if the source run was contended, the stored mins are INFLATED and the
raw channel under-flags, but the normalized channel (stored alongside)
corrects for exactly that, and the dual-channel rule requires BOTH to
exceed 1.5x before flagging.

Usage: python3 tools/promote_anchor.py [--augment | --refresh Q1[,Q2...]
       --reason "<justification>"] [candidate] [anchor]
       (defaults: bench_out.json BENCH_BASELINE.json)
Exit 0 = promoted/augmented/refreshed, 3 = rejected (dominance fails)
or nothing to augment, 2 = bad input.
"""
import json
import os
import re
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


SECTIONS = ("queries", "queries_norm", "queries_median", "reps")


def healthy_in_all_sections(cand, q):
    """A candidate query is usable only if EVERY per-query section holds
    a clean value for it: a healthy raw min next to a failed sentinel in
    queries_norm would otherwise graft -1 into the anchor's normalized
    channel, where the dual-channel diff skips b <= 0 entries and the
    1.5x-on-BOTH flag could then never fire for that query — the guard
    augment exists to create would be silently absent (ADVICE r12).
    The three SCALAR sections must be >= 0 (with Bench-produced files
    they fail together); the reps LIST is the raw per-rep record and
    may legitimately contain an individual -1 rep next to good ones
    (Bench keeps min/median from the good reps), so it only needs to
    be a non-empty numeric list with at least one good rep."""
    for section in SECTIONS:
        v = (cand.get(section) or {}).get(q)
        if v is None:
            return False
        if isinstance(v, list):
            if (not v or any(not isinstance(x, (int, float)) for x in v)
                    or all(x < 0 for x in v)):
                return False
        elif not isinstance(v, (int, float)) or v < 0:
            return False
    return True


def augment(cand, anchor, anchor_path, cand_probe, inc_probe):
    """Add per-query entries the anchor lacks; never touch a HEALTHY
    existing entry. A failed sentinel (value < 0: Bench records -1 when
    every rep failed, and its diff skips b <= 0 entries) is NOT
    coverage — it is the exact guardless state this operation exists to
    close — so a clean candidate value replaces it, coherently across
    all four per-query sections, and the log names it. Candidates
    missing ANY section for a query are skipped and logged (all four
    sections move together or not at all — a partial graft would leave
    a stale sentinel next to fresh values, ADVICE r12)."""
    inc_q = anchor.get("queries", {})
    candidates = [q for q in sorted(cand.get("queries", {}))
                  if (q not in inc_q or inc_q[q] < 0)
                  and cand["queries"][q] >= 0]
    new = [q for q in candidates if healthy_in_all_sections(cand, q)]
    new_set = set(new)
    skipped = [q for q in candidates if q not in new_set]
    entry = {
        "at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "augmented": new,
        "source_probe": cand_probe,
        "incumbent_probe": inc_probe,
    }
    if skipped:
        entry["skipped_incomplete"] = skipped
        print(f"AUGMENT: skipping {skipped} (candidate lacks a clean value "
              f"in every per-query section; all four move together)")
    if not new:
        # even an all-skipped attempt must reach the artifact — the
        # contract is that promotion_log records what was CONSIDERED,
        # and the skipped case is exactly what the section guard
        # introduces (code-review r13)
        if skipped:
            anchor["promotion_log"] = anchor.get("promotion_log", []) + [entry]
            with open(anchor_path, "w") as f:
                json.dump(anchor, f)
                f.write("\n")
            print(f"AUGMENT: nothing added — every candidate query was "
                  f"skipped as incomplete (attempt logged)")
        else:
            print("AUGMENT: nothing to add (anchor already covers every "
                  "candidate query)")
        return 3
    for q in new:
        replacing_failed = q in inc_q and inc_q[q] < 0
        for section in SECTIONS:
            src = cand.get(section) or {}
            dst = anchor.setdefault(section, {})
            # never clobber a healthy entry in ANY section: a mangled
            # anchor (q in queries_norm but not queries) keeps what it
            # has unless we are coherently replacing a failed sentinel
            # (healthy_in_all_sections guarantees src covers all four)
            if replacing_failed or q not in dst:
                dst[q] = src[q]
    anchor["promotion_log"] = anchor.get("promotion_log", []) + [entry]
    with open(anchor_path, "w") as f:
        json.dump(anchor, f)
        f.write("\n")
    print(f"AUGMENTED: added {len(new)} new-query entries {new} "
          f"(healthy existing entries, probe stats and totals untouched; "
          f"source probe {cand_probe})")
    return 0


def refresh(names, cand, anchor, anchor_path, cand_probe, inc_probe,
            reason):
    """Replace the NAMED queries' entries coherently across all four
    per-query sections — the knob-change path (module doc). Names the
    candidate didn't measure cleanly are refused (a partial refresh
    would mix knob generations inside one query's entries). A refresh
    has NO dominance check by design (the knob changed; old and new
    times aren't comparable), so it must be AUDITABLE instead (ADVICE
    r14): the mandatory --reason string and the replaced entries are
    both recorded in the promotion_log, making a refresh of an
    unchanged-but-flattering query reviewable from the artifact alone."""
    missing = [q for q in names if not healthy_in_all_sections(cand, q)]
    if missing:
        print(f"REFRESH refused: candidate lacks a clean value in every "
              f"per-query section for {missing}", file=sys.stderr)
        return 2
    unknown = [q for q in names if q not in anchor.get("queries", {})]
    if unknown:
        print(f"REFRESH refused: {unknown} not in the anchor (use --augment "
              f"for new queries)", file=sys.stderr)
        return 2
    replaced = {q: {section: anchor.get(section, {}).get(q)
                    for section in SECTIONS} for q in names}
    for q in names:
        for section in SECTIONS:
            anchor.setdefault(section, {})[q] = cand[section][q]
    anchor["promotion_log"] = anchor.get("promotion_log", []) + [{
        "at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "refreshed": sorted(names),
        "reason": reason,
        "replaced_entries": replaced,
        "source_probe": cand_probe,
        "incumbent_probe": inc_probe,
    }]
    with open(anchor_path, "w") as f:
        json.dump(anchor, f)
        f.write("\n")
    print(f"REFRESHED: {sorted(names)} re-based on the candidate run "
          f"(source probe {cand_probe}); all other entries untouched")
    return 0


def main():
    args = sys.argv[1:]
    do_augment = "--augment" in args
    refresh_names = []
    if "--refresh" in args:
        # ONE comma-separated token — a name list scanned "until the
        # first path-looking arg" mis-parses a suffixless candidate
        # path as a query name and mis-diagnoses (code-review r14)
        i = args.index("--refresh")
        if i + 1 >= len(args):
            print("--refresh needs a comma-separated query-name list "
                  "(e.g. --refresh q1,q2)", file=sys.stderr)
            return 2
        refresh_names = [q for q in args[i + 1].split(",") if q]
        args = args[:i] + args[i + 2:]
        if not refresh_names:
            print("--refresh needs at least one query name", file=sys.stderr)
            return 2
    refresh_reason = None
    if "--reason" in args:
        i = args.index("--reason")
        if i + 1 >= len(args):
            print("--reason needs a justification string", file=sys.stderr)
            return 2
        refresh_reason = args[i + 1]
        args = args[:i] + args[i + 2:]
    if refresh_names and not (refresh_reason and refresh_reason.strip()):
        # a refresh bypasses the dominance check, so it must carry its
        # own audit trail (ADVICE r14): no reason, no refresh
        print("--refresh requires --reason \"<what knob/computation "
              "changed>\" (recorded in promotion_log)", file=sys.stderr)
        return 2
    if refresh_reason is not None and not refresh_names:
        # only --refresh records a reason; silently dropping the string
        # on the promote/augment paths would lose the very audit text
        # the caller meant to attach (code-review r15)
        print("--reason is only recorded by --refresh; promote/augment "
              "entries carry probe stats instead — rerun without it",
              file=sys.stderr)
        return 2
    if do_augment and refresh_names:
        print("--augment and --refresh are distinct operations; "
              "run them separately", file=sys.stderr)
        return 2
    argv = [a for a in args if a != "--augment"]
    cand_path = argv[0] if len(argv) > 0 else "bench_out.json"
    anchor_path = argv[1] if len(argv) > 1 else "BENCH_BASELINE.json"
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

    # Scale-factor guard, BOTH paths: probe traces are SF-independent
    # (pure-CPU probes), so a dominating sf0.01 run would otherwise
    # replace — or augment-graft ~10x-smaller per-query mins into — an
    # sf0.1 anchor, permanently corrupting the per-query diff in one
    # direction or the other. Mixed scales are refused, never merged.
    # Bench stores the data-dir PATH, so normalize before comparing
    # (ADVICE r12: a trailing slash or relative spelling of the SAME
    # scale was refused — fail-closed but blocking legitimate
    # promotions): prefer the sfN basename when it parses, else the
    # normalized path.
    def sf_key(v):
        if not isinstance(v, str):
            return v
        base = os.path.basename(os.path.normpath(v))
        # only a REAL scale-factor basename (sf0.1, sf0.01, ...) compares
        # by basename; anything else (sf_test, sftmp) falls back to the
        # normalized path so coincidental "sf" prefixes can't alias
        # distinct data dirs (ADVICE r13)
        return base if re.fullmatch(r"sf[0-9.]+", base) else os.path.normpath(v)

    if anchor is not None and sf_key(cand.get("sf")) != sf_key(anchor.get("sf")):
        mode = ("augment" if do_augment
                else "refresh" if refresh_names else "promote")
        print(f"scale-factor mismatch: candidate sf={cand.get('sf')!r} vs "
              f"anchor sf={anchor.get('sf')!r} -- refusing to {mode}",
              file=sys.stderr)
        return 2

    if refresh_names:
        if anchor is None:
            print("nothing to refresh: no anchor exists", file=sys.stderr)
            return 2
        return refresh(refresh_names, cand, anchor, anchor_path,
                       cand_probe, inc_probe, refresh_reason.strip())

    if do_augment:
        if anchor is None:
            print("nothing to augment: no anchor exists (run a plain "
                  "promotion to bootstrap one)", file=sys.stderr)
            return 2
        return augment(cand, anchor, anchor_path, cand_probe, inc_probe)

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
