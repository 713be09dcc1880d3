#!/usr/bin/env python3
"""Re-derive Bench.scala's per-query wall-time gates from the round's
quiet-box record (methodology: gate = 1.5 x quiet min + 0.5s, for every
query whose min exceeds 1s in EITHER the quiet record or the latest
of-record run — the round-13 rule closing the 'which box crossed 1s'
ambiguity).

Round-14 hardening (r13 advice + verdict item 3):
 - the >1s cut iterates the UNION of quiet and of-record keys, so a query
   present only in the of-record run (added after the quiet run, or absent
   from a partial quiet record) cannot silently escape gating;
 - the of-record artifact's own `ungated_over_1s` list (queries that
   crossed 1s at RUN time without a gate) is folded into the gated set,
   closing the derivation-time loophole;
 - a >1s query with no quiet min FAILS LOUDLY (TODO line + exit 1) instead
   of being skipped — the fix is to re-run the quiet bench, not to ship a
   gate set with a hole.

Usage: python3 tools/derive_gates.py <quiet_bench.json> [of_record.json]
Prints the Scala Map entries to paste into Bench.scala.
"""
import json, sys

quiet = json.load(open(sys.argv[1]))["queries_min"]
ofj = json.load(open(sys.argv[2])) if len(sys.argv) > 2 else {}
ofrec = ofj.get("queries_min", {})
runtime_escapees = set(ofj.get("ungated_over_1s", []))

union = set(quiet) | set(ofrec) | runtime_escapees
gated = sorted(q for q in union
               if float(quiet.get(q, 0)) > 1.0
               or float(ofrec.get(q, 0)) > 1.0
               or q in runtime_escapees)

missing = [q for q in gated if q not in quiet]
for q in missing:
    print(f"// TODO: {q} crossed 1s of-record but has NO quiet-record min - "
          f"re-run the quiet bench before shipping this gate set",
          file=sys.stderr)

width = max(len(q) for q in gated) + 2
for q in gated:
    if q not in quiet:
        continue
    gate = round(1.5 * quiet[q] + 0.5, 1)
    print(f'      "{q}"{" " * (width - len(q))}-> {gate},')
print(f"// {len(gated) - len(missing)} gates"
      + (f"; {len(missing)} MISSING quiet minima" if missing else ""),
      file=sys.stderr)
sys.exit(1 if missing else 0)
