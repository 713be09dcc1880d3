#!/usr/bin/env python3
"""Re-derive Bench.scala's per-query wall-time gates from the round's
quiet-box record (methodology: gate = 1.5 x quiet min + 0.5s, for every
query whose min exceeds 1s in EITHER the quiet record or the latest
of-record run — the round-13 rule closing the 'which box crossed 1s'
ambiguity).

Usage: python3 tools/derive_gates.py <quiet_bench.json> [of_record.json]
Prints the Scala Map entries to paste into Bench.scala.
"""
import json, sys

quiet = json.load(open(sys.argv[1]))["queries_min"]
ofrec = json.load(open(sys.argv[2]))["queries_min"] if len(sys.argv) > 2 else {}

gated = sorted(q for q in quiet
               if quiet[q] > 1.0 or float(ofrec.get(q, 0)) > 1.0)
width = max(len(q) for q in gated) + 2
for q in gated:
    gate = round(1.5 * quiet[q] + 0.5, 1)
    print(f'      "{q}"{" " * (width - len(q))}-> {gate},')
print(f"// {len(gated)} gates", file=sys.stderr)
