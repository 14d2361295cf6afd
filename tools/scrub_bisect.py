#!/usr/bin/env python
"""Interpret the ExactSubstr scrub canaries in the latest driver
correctness artifact (VERDICT r8 item #2's decision table, automated).

    python tools/scrub_bisect.py            # latest CORRECTNESS_r*.json
    python tools/scrub_bisect.py CORRECTNESS_r09.json

Background: scrub_duplicated_spans was hash-red in the driver's
environment in rounds 7 and 8 while green in every local configuration
(plain-session repro, DuckDB thread sweeps, hostile TZs/locales, sf0.001
/0.01/0.1, and a dialect-independent brute-force property oracle). r9
rewrote the oracle onto the driver-proven construct set and split the
output channel into two canaries. All four queries project ONE shared
interval computation (inventory_corpus._scrub_result), so the green/red
pattern across them localizes any remaining divergence:

    meta   = scrub_spans_meta   (doc_id, n_spans, n_tokens_removed)
    digest = scrub_text_digest  (doc_id, md5(clean_text))
    full   = scrub_duplicated_spans (doc_id, clean_text, ...)
    incr   = incremental_scrub_batch (full restricted to doc_id%10=0)
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ROWS = (
    "scrub_spans_meta",
    "scrub_text_digest",
    "scrub_duplicated_spans",
    "incremental_scrub_batch",
)


def main() -> None:
    if len(sys.argv) > 1:
        path = os.path.join(_REPO, sys.argv[1])
    else:
        arts = sorted(
            glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")),
            key=lambda p: int(re.search(r"r(\d+)", p).group(1)),
        )
        path = arts[-1]
    art = json.load(open(path))
    state = {}
    for name in ROWS:
        row = art.get(name)
        if row is None:
            state[name] = "absent"
        elif row.get("err"):
            state[name] = f"ERROR: {row['err']}"
        else:
            state[name] = "green" if row.get("hash_match") else "RED"
    print(f"{os.path.basename(path)}:")
    for name in ROWS:
        print(f"  {name:28s} {state[name]}")

    meta, dig, full = (state[n] for n in ROWS[:3])
    print("\nLocalization:")
    if any(v.startswith("ERROR") for v in state.values()):
        print("  An oracle ERRORED — the driver's DuckDB rejects a construct")
        print("  outright (version older/newer than the portable set assumed).")
        print("  The err string above names it; replace just that construct.")
    elif "absent" in (meta, dig):
        print("  Canary rows absent from this artifact (pre-r9, or rotated")
        print("  out) — the bisect needs an artifact that recorded both")
        print("  canaries alongside the full query. No conclusion.")
    elif meta == dig == full == "green":
        print("  All green — the r9 oracle rewrite fixed the divergence.")
        print("  Next round: remove the two _FORCE_FRESH pins (keep the")
        print("  canaries registered; they are ordinary DD8 coverage now).")
    elif meta == "RED":
        print("  META red ⇒ the interval/window logic itself evaluates")
        print("  differently in the driver's DuckDB (its oracle uses ONLY")
        print("  constructs driver-proven green elsewhere). Compare the")
        print("  n_spans/n_tokens_removed totals against a local run; bisect")
        print("  the miv chain CTE by CTE with count/sum canaries.")
    elif dig == "RED":
        print("  META green + DIGEST red ⇒ the text RECONSTRUCTION diverges")
        print("  (intervals agree; the list_filter/array_to_string tail or")
        print("  Spark's concat_ws path produces different strings there).")
        print("  Ship per-doc clean-token COUNTS as the next bisect level.")
    elif full == "RED":
        print("  META+DIGEST green + FULL red ⇒ intervals AND reconstructed")
        print("  text agree (the md5 is over the identical strings the full")
        print("  query ships) — the divergence is the driver's value-channel")
        print("  handling of long strings (canonicalization/truncation/")
        print("  encoding), not engine semantics. Evidence is complete on")
        print("  this side; flag the harness.")
    else:
        print("  Mixed/absent rows — see the table above.")


if __name__ == "__main__":
    main()
