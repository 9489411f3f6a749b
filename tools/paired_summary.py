"""Summarize the paired scaling-evidence ledger
(BENCH/paired_evidence.jsonl by default, or argv[1]).

Prints: all pairs; valid-window subset; medians; job/control
ratios. Validity is PER RECORD, the rule each record was collected
under: records carrying a window_valid flag use it verbatim (the
double- or single-bracket gate active at collection time); records
without the flag fall back to opening-control eff >= 0.8. Used to
curate BENCH/BASELINE.md at session end.
"""

import json
import os
import statistics
import sys

_DEFAULT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "BENCH", "paired_evidence.jsonl",
)
path = sys.argv[1] if len(sys.argv) > 1 else _DEFAULT
rows = [json.loads(l) for l in open(path) if l.strip()]

all_q, valid_q, ratios = [], [], []
companions: dict[str, dict[str, list]] = {}
for r in rows:
    q = r["quotient"]
    all_q.append(q)
    ctl = r.get("control", {}).get("eff")
    # validity = the rule the record was COLLECTED under: any record
    # carrying window_valid (all control-bracketed records, from run 1
    # on — single- OR double-bracket gate, whichever was active) uses
    # it verbatim; records without the flag fall back to the opening
    # control alone
    if "window_valid" in r:
        is_valid = bool(r["window_valid"])
    else:
        is_valid = ctl is not None and ctl >= 0.8
    flag = ""
    if ctl is not None:
        ratios.append(q / ctl if ctl > 0 else float("inf"))
    if is_valid:
        valid_q.append(q)
        flag = "  <-- VALID WINDOW"
    # the headline quotient belongs to the record's own job bucket too
    # (runs where a job rode as headline rather than companion would
    # otherwise vanish from that job's median — e.g. run 6's counting)
    head = companions.setdefault(
        r.get("job", "scaling"), {"all": [], "valid": []}
    )
    head["all"].append(q)
    if is_valid:
        head["valid"].append(q)
    extra = ""
    for key in sorted(r):
        if key.startswith("quotient_"):
            name = key[len("quotient_"):]
            extra += f"  {name}={r[key]:.4f}"
            bucket = companions.setdefault(name, {"all": [], "valid": []})
            bucket["all"].append(r[key])
            if is_valid:
                bucket["valid"].append(r[key])
    print(
        f"{r['ts']}  q={q:.4f}  control={ctl if ctl is not None else '—'}"
        f"  @2={r.get('sec@2')}  @8={r.get('sec@8')}{extra}{flag}"
    )

print(f"\npairs: {len(all_q)}  median(all): {statistics.median(all_q):.4f}")
for name, b in sorted(companions.items()):
    line = f"{name}: median(all) {statistics.median(b['all']):.4f}"
    if b["valid"]:
        line += (
            f"  median(valid) {statistics.median(b['valid']):.4f}"
            f"  ({len(b['valid'])} valid)"
        )
    print(line)
if ratios:
    finite = [x for x in ratios if x != float("inf")]
    print(
        f"job/control ratio: median {statistics.median(finite):.3f}, "
        f">=1 in {sum(1 for x in ratios if x >= 1)}/{len(ratios)} pairs"
    )
if valid_q:
    print(
        f"VALID windows: {len(valid_q)}  median {statistics.median(valid_q):.4f}"
        f"  min {min(valid_q):.4f}  max {max(valid_q):.4f}"
    )
else:
    print("VALID windows: none yet (control never reached 0.8)")
