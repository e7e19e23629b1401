"""Rehearse the driver's correctness gate: every queries() entry must
match its oracle_sql() DuckDB result at sf0.01 — row count, column
names, and values (order-insensitive, like the driver's value-hash)."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

pytestmark = pytest.mark.skipif(
    not os.path.exists(SF_DIR), reason="driver testdata not present"
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 4)
    return v


def _rows(recs, cols):
    return sorted(tuple(_canon(r[c]) for c in sorted(cols)) for r in recs)


@pytest.mark.slow
def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and "score" in df.columns


@pytest.mark.slow
def test_all_oracle_pairs(spark, duck):
    qs = entry_mod.queries()
    os_ = entry_mod.oracle_sql()
    missing = [k for k in os_ if k not in qs]
    assert not missing, f"oracle_sql keys without queries(): {missing}"
    failures = []
    for name, fn in qs.items():
        sql = os_.get(name)
        try:
            sdf = fn(spark, SF_DIR)
            got = [r.asDict() for r in sdf.collect()]
        except Exception as ex:  # noqa: BLE001
            failures.append((name, f"spark error: {str(ex)[:200]}"))
            continue
        if sql is None:
            continue
        try:
            exp_df = duck.execute(sql).df()
        except Exception as ex:  # noqa: BLE001
            failures.append((name, f"duckdb error: {str(ex)[:200]}"))
            continue
        exp = exp_df.to_dict("records")
        if sorted(sdf.columns) != sorted(exp_df.columns.tolist()):
            failures.append((name, f"columns {sorted(sdf.columns)} vs {sorted(exp_df.columns.tolist())}"))
            continue
        g, e = _rows(got, sdf.columns), _rows(exp, sdf.columns)
        if len(g) != len(e):
            failures.append((name, f"row count {len(g)} vs {len(e)}"))
        elif g != e:
            diff = [(a, b) for a, b in zip(g, e) if a != b][:3]
            failures.append((name, f"value mismatch, first diffs: {diff}"))
    assert not failures, "\n".join(f"{n}: {m}" for n, m in failures)
