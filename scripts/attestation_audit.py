"""Attestation-freshness audit: for every registered query, the most
recent round whose driver correctness gate (CORRECTNESS_r*.json)
attested it green — the bookkeeping behind the per-round prefix
rotation (the driver checks only the FIRST 50 registry entries, so the
prefix must rotate to keep union coverage at 100% of exact queries and
to re-attest whatever code changed).

Prints: never-attested exact queries (these MUST be in the next
prefix), then a staleness table (oldest first), then current prefix
membership. Exit code 1 if any exact query outside the current top-50
has never been attested.

Usage: python scripts/attestation_audit.py
"""
from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __spark_entry__ import oracle_sql, queries  # noqa: E402


def main() -> int:
    names = list(queries())
    exact = set(oracle_sql())
    last: dict[str, int] = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int(path.split("_r")[1].split(".")[0])
        rows = json.load(open(path))
        for name, rec in rows.items():
            ok = rec.get("rows_match") and rec.get("schema_match") and (
                rec.get("hash_match") or name not in exact
            )
            if ok:
                last[name] = max(last.get(name, 0), rnd)

    prefix = set(names[:50])
    never = [n for n in names if n in exact and n not in last]
    never_out = [n for n in never if n not in prefix]
    print(f"registry: {len(names)} ({len(exact)} exact) | attested ever: {len(last)}")
    print(f"\nnever-attested exact queries ({len(never)}), * = NOT in current prefix:")
    for n in never:
        print(f"  {'*' if n not in prefix else ' '} {n}")
    by_round: dict[int, list[str]] = {}
    for n in names:
        if n in last:
            by_round.setdefault(last[n], []).append(n)
    print("\nlast-attested round -> queries (oldest first):")
    for rnd in sorted(by_round):
        qs = by_round[rnd]
        print(f"  r{rnd:02d} ({len(qs)}): {', '.join(sorted(qs))}")
    if never_out:
        print(f"\nERROR: {len(never_out)} never-attested exact queries sit "
              f"OUTSIDE the top-50 prefix — they can never gain attestation.")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
