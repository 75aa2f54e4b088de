"""Catalog-wide regression net, cheap enough for every pytest run.

The driver's value gate runs at sf0.01 out-of-band; this test pins the two
failure modes that historically slipped between rounds WITHOUT paying for
value hashing:

- a query that no longer ANALYZES (missing column, bad import, schema
  drift) — caught by building every DataFrame;
- Spark/oracle COLUMN-NAME drift (the q12 class of driver red: the compare
  sorts columns by name, so one unaliased aggregate hash-mismatches even
  with identical values) — caught by running every oracle on DuckDB at
  sf0.001 (500-row tables, milliseconds each) and comparing column sets.
"""

import pytest

from pangool_spark.queries import ORACLES, QUERIES


@pytest.fixture(scope="module")
def duck(sf_dir):
    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def test_catalog_is_well_formed():
    assert set(ORACLES) <= set(QUERIES)
    # rows-only entries are the documented, justified exceptions
    assert set(QUERIES) - set(ORACLES) == {
        "approx_distinct_parts",
        "minhash_lsh_dedup_fast",
        "compression_quality_docs",
        # xxhash64 edge sampling is engine-internal; the md5-portable
        # twin (triangle_count_approx_parts) carries the value oracle
        "triangle_count_approx_parts_fast",
    }


def test_every_query_analyzes_and_matches_oracle_columns(spark, sf_dir, duck):
    # Two speed disciplines keep this (281-query) sweep test-suite-sized:
    # DESCRIBE plans each oracle and yields its column list WITHOUT
    # executing it (executing all 277 — several are O(n²) self-joins /
    # recursive CTEs — made this one test ~4 min of the suite; values are
    # the driver's check_oracles sweep, not this test's job), and query
    # construction runs on a small thread pool so the eager-checkpoint
    # jobs many operators launch at build time overlap instead of
    # serializing (guide §2.6). DuckDB work stays on per-thread cursors.
    from concurrent.futures import ThreadPoolExecutor

    def check(item):
        name, fn = item
        try:
            df = fn(spark, sf_dir)
            scols = sorted(df.columns)
        except Exception as exc:  # noqa: BLE001 — collect every failure
            return f"{name}: spark analysis failed: {exc!r:.150}"
        if name not in ORACLES:
            return None
        try:
            rel = duck.cursor().execute(f"DESCRIBE {ORACLES[name]}")
            dcols = sorted(r[0] for r in rel.fetchall())
        except Exception as exc:  # noqa: BLE001
            return f"{name}: oracle SQL failed: {exc!r:.150}"
        if scols != dcols:
            return f"{name}: columns spark={scols} oracle={dcols}"
        return None

    with ThreadPoolExecutor(max_workers=8) as pool:
        problems = [p for p in pool.map(check, QUERIES.items()) if p]
    assert not problems, "\n".join(problems)
