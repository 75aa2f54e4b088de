"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same sf dir, then compares row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted by their
stringified tuple). Usage:

    python tools/check_oracles.py [sf_dir] [query ...]
    python tools/check_oracles.py --lenient [sf_dir] [query ...]

STRICT TYPE MODE (default on): the r05 (q12) and r07 (data_quality_orders)
driver failures were both cross-engine result-TYPE drift — an uncast
integer SUM surfacing from DuckDB as HUGEINT/DECIMAL where Spark returns
BIGINT/DOUBLE — which this checker's value normalization (Decimal →
float) used to paper over, so it passed locally while the driver's own
normalization hashed the two sides differently. Strict mode compares the
DECLARED result types column-by-column (Spark ``df.dtypes`` vs DuckDB
``rel.types``) and fails any pair outside the exact-match lattice, so the
defect class is caught before a driver round burns on it. ``--lenient``
restores the old value-only behavior (useful while prototyping oracles).
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def normalize_cell(v):
    import datetime
    import decimal
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, bool):
        return str(v)
    return str(v)


_INT_CLASS = frozenset({"TINYINT", "SMALLINT", "INTEGER", "BIGINT"})


def _spark_to_duck_types(dt: str) -> frozenset | None:
    """Map a Spark simpleString dtype to the SET of DuckDB result types
    that round-trip identically through any sane client normalization
    (all ≤64-bit integer widths fetch as Python int, so they form one
    equivalence class — the danger types are the ones OUTSIDE every
    class: HUGEINT and DECIMAL surface as Decimal/float128-ish values
    that drivers normalize differently, the r05/r07 failure class).
    Returns None for types we don't strict-check (struct/map/binary)."""
    dt = dt.strip().lower()
    scalar = {
        "tinyint": _INT_CLASS,
        "smallint": _INT_CLASS,
        "int": _INT_CLASS,
        "bigint": _INT_CLASS,
        "float": frozenset({"FLOAT"}),
        "double": frozenset({"DOUBLE"}),
        "string": frozenset({"VARCHAR"}),
        "boolean": frozenset({"BOOLEAN"}),
        "date": frozenset({"DATE"}),
        "timestamp": frozenset({"TIMESTAMP", "TIMESTAMPWITHTIMEZONE"}),
        "timestamp_ntz": frozenset({"TIMESTAMP"}),
    }
    if dt in scalar:
        return scalar[dt]
    if dt.startswith("decimal("):
        return frozenset({"DECIMAL" + dt[len("decimal") :].upper().replace(" ", "")})
    if dt.startswith("array<"):
        inner = _spark_to_duck_types(dt[len("array<") : -1])
        return (
            None
            if inner is None
            else frozenset(t + "[]" for t in inner)
        )
    return None


def strict_type_problems(sdf_dtypes, dcols, dtypes) -> list:
    """Compare declared result types column-by-column. Any drift outside
    the equivalence lattice (e.g. DuckDB HUGEINT/DECIMAL where Spark
    says BIGINT/DOUBLE) is the r05/r07 driver-failure class."""
    duck = {c: str(t).replace(" ", "").upper() for c, t in zip(dcols, dtypes)}
    problems = []
    for col, sdt in sdf_dtypes:
        want = _spark_to_duck_types(sdt)
        got = duck.get(col)
        if want is None or got is None:
            continue
        if got not in want:
            problems.append(
                f"type drift {col}: spark={sdt} accepts duck={sorted(want)}, got {got}"
            )
    return problems


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(normalize_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--lenient"]
    strict = "--lenient" not in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import duckdb

    import __spark_entry__ as entry_mod
    from pangool_spark.session import get_spark

    spark = get_spark("check_oracles")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as exc:
            print(f"FAIL  {name}: spark error: {type(exc).__name__}: {str(exc)[:200]}")
            failures += 1
            continue
        dt_spark = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle) [{dt_spark:.1f}s]")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = list(rel.columns)
            dtypes = list(rel.types)
            drows = rel.fetchall()
        except Exception as exc:
            print(f"FAIL  {name}: duckdb error: {type(exc).__name__}: {str(exc)[:200]}")
            failures += 1
            continue
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        if strict:
            problems.extend(strict_type_problems(sdf.dtypes, dcols, dtypes))
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if not problems:
            hs = table_hash(scols, [[r[c] for c in scols] for r in srows])
            hd = table_hash(dcols, drows)
            if hs != hd:
                problems.append("value hash mismatch")
                # show a diff sample
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
                set_s = {
                    tuple(normalize_cell(row[i]) for i in order_s)
                    for row in [[r[c] for c in scols] for r in srows]
                }
                set_d = {tuple(normalize_cell(r[i]) for i in order_d) for r in drows}
                only_s = list(set_s - set_d)[:3]
                only_d = list(set_d - set_s)[:3]
                for x in only_s:
                    print(f"      spark-only: {x}")
                for x in only_d:
                    print(f"      duck-only:  {x}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)} [{dt_spark:.1f}s]")
            failures += 1
        else:
            print(f"OK    {name}: {len(srows)} rows [{dt_spark:.1f}s]")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
