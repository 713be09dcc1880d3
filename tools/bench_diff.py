#!/usr/bin/env python3
"""Cross-round bench regression diff.

Usage: python3 tools/bench_diff.py <old bench_full.json> <new bench_full.json>
                                   [--ratio 1.3]

Compares per-query min-of-N timings between two rounds' complete bench
artifacts and prints a markdown table of drifts beyond the ratio (both
directions — regressions AND improvements; a big improvement in a query
that didn't change is a measurement-hygiene signal too). Sub-threshold
queries are summarized, not listed. Gated queries already fail loudly in
Bench itself; this catches the ungated majority, where a regression used
to surface only if a human hand-diffed two artifacts.

Exit code: 0 always (it reports; the gates decide). The table is meant to
be pasted into the round notes next to the artifact.
"""
import argparse
import json


def main():
    # argparse (not hand-rolled filtering): the space-separated form
    # `--ratio 1.5 old new` used to leak "1.5" into the positionals and
    # crash on open("1.5"); argparse consumes the value token correctly
    # in both `--ratio 1.5` and `--ratio=1.5` forms and rejects a
    # trailing valueless `--ratio` with a usage error instead of an
    # IndexError.
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("old_path")
    p.add_argument("new_path")
    p.add_argument("--ratio", type=float, default=1.3)
    ns = p.parse_args()
    ratio = ns.ratio
    old_path, new_path = ns.old_path, ns.new_path
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    oq, nq = old["queries_min"], new["queries_min"]
    # Floor: a 0.08s -> 0.12s swing is scheduler noise, not a regression.
    # Only flag drifts where at least one side is >= 0.3s.
    FLOOR = 0.3

    slower, faster, small = [], [], 0
    for k in sorted(set(oq) & set(nq)):
        a, b = oq[k], nq[k]
        if a <= 0 or b <= 0:
            continue
        if max(a, b) < FLOOR:
            small += 1
            continue
        if b > a * ratio:
            slower.append((b / a, k, a, b))
        elif a > b * ratio:
            faster.append((a / b, k, a, b))
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))

    print(f"# bench diff: {old_path} -> {new_path} (ratio > {ratio}x, floor {FLOOR}s)")
    print(f"common queries: {len(set(oq) & set(nq))}; "
          f"within band or sub-floor: {len(set(oq) & set(nq)) - len(slower) - len(faster)}")
    if slower:
        print(f"\n## SLOWER (> {ratio}x) — investigate or re-gate")
        print("| query | old s | new s | ratio |")
        print("|---|---|---|---|")
        for r, k, a, b in sorted(slower, reverse=True):
            print(f"| {k} | {a:.3f} | {b:.3f} | {r:.2f}x |")
    else:
        print("\nno query slowed beyond the band.")
    if faster:
        print(f"\n## FASTER (> {ratio}x)")
        print("| query | old s | new s | ratio |")
        print("|---|---|---|---|")
        for r, k, a, b in sorted(faster, reverse=True):
            print(f"| {k} | {a:.3f} | {b:.3f} | {r:.2f}x |")
    if added:
        print(f"\nnew queries ({len(added)}): " + ", ".join(added))
    if removed:
        print(f"\nREMOVED queries ({len(removed)}): " + ", ".join(removed))
    ol, nl = old.get("listing_objects_per_sec"), new.get("listing_objects_per_sec")
    if ol and nl:
        print(f"\nlisting obj/s: {ol} -> {nl} ({nl / ol:.2f}x)")
    ot, nt = old.get("total_sec"), new.get("total_sec")
    if ot and nt:
        print(f"total: {ot}s ({old.get('n_queries')}q) -> {nt}s ({new.get('n_queries')}q)")
    print(f"box load: {old.get('box_load_1m')} -> {new.get('box_load_1m')}; "
          f"run_by: {old.get('run_by', '?')} -> {new.get('run_by', '?')}")


if __name__ == "__main__":
    main()
