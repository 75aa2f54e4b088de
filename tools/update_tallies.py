"""Regenerate the catalog tallies mechanically (r09 verdict item 4).

The README/ROADMAP/PLAN_AUDIT counts drifted twice when queries landed
after the prose was written. This tool makes the counts a build artifact:

- rewrites the ``(N queries, M value-hash-checked`` tally in README.md
  from the live registry;
- verifies PLAN_AUDIT.md has one row per catalog query and lists any
  missing/stale names;
- prints the canonical one-line tally for ROADMAP session-close notes.

Run at session close; exits non-zero if PLAN_AUDIT is stale so the gap
is fixed (rerun tools/plan_audit.py) instead of shipped.

Usage: python tools/update_tallies.py [--check]
    --check: verify only, never rewrite README (CI-style).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    check_only = "--check" in sys.argv
    from pangool_spark.queries import ORACLES, QUERIES

    n_q, n_o = len(QUERIES), len(ORACLES)
    rows_only = sorted(set(QUERIES) - set(ORACLES))
    print(f"catalog: {n_q} queries / {n_o} value-oracled "
          f"({n_q - n_o} rows-only: {', '.join(rows_only)})")

    ok = True

    # --- README tally ---------------------------------------------------
    readme_path = os.path.join(REPO, "README.md")
    with open(readme_path) as f:
        readme = f.read()
    pat = re.compile(r"\((\d+) queries, (\d+) value-hash-checked")
    m = pat.search(readme)
    if not m:
        print("README.md: tally pattern not found", file=sys.stderr)
        ok = False
    elif (int(m.group(1)), int(m.group(2))) != (n_q, n_o):
        if check_only:
            print(f"README.md: stale tally {m.group(1)}/{m.group(2)} "
                  f"(want {n_q}/{n_o})", file=sys.stderr)
            ok = False
        else:
            readme = pat.sub(f"({n_q} queries, {n_o} value-hash-checked",
                             readme, count=1)
            with open(readme_path, "w") as f:
                f.write(readme)
            print(f"README.md: tally rewritten -> {n_q}/{n_o}")
    else:
        print("README.md: tally up to date")

    # --- PLAN_AUDIT coverage ---------------------------------------------
    audit_path = os.path.join(REPO, "PLAN_AUDIT.md")
    with open(audit_path) as f:
        audit_names = {
            line.split("|")[1].strip()
            for line in f
            if line.startswith("| ") and not line.startswith("| query")
            and not line.startswith("| ---") and "---" not in line.split("|")[1]
        }
    missing = sorted(set(QUERIES) - audit_names)
    stale = sorted(audit_names - set(QUERIES))
    if missing:
        print(f"PLAN_AUDIT.md: {len(missing)} catalog queries missing rows: "
              f"{', '.join(missing)} — rerun tools/plan_audit.py",
              file=sys.stderr)
        ok = False
    if stale:
        print(f"PLAN_AUDIT.md: {len(stale)} rows for retired names: "
              f"{', '.join(stale)}", file=sys.stderr)
        ok = False
    if not missing and not stale:
        print(f"PLAN_AUDIT.md: {len(audit_names)} rows, 1:1 with catalog")

    # --- canonical ROADMAP line -------------------------------------------
    print(f"\nROADMAP session-close line:\n"
          f"**{n_q} catalog queries / {n_o} value-oracled** "
          f"({n_q - n_o} justified rows-only)")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
