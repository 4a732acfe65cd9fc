"""Driver-contract static checks — fast (no SparkSession): the window
invariants and oracle-SQL health that otherwise only surface when the
round driver runs.

These encode the failure modes that actually happened across rounds:
a window entry misspelled or >50 names (silently truncating someone's
verification slot), and an oracle whose SQL no longer parses after a
fragment edit (the Spark side would green-run while the comparison
errors out).
"""

from __future__ import annotations

import duckdb
import pytest

from aggregation_duckdb_spark import matrix

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


def test_driver_window_is_exactly_50_known_names():
    w = matrix._DRIVER_WINDOW_FIRST
    qs = matrix.queries()
    assert len(w) == 50
    assert len(set(w)) == 50, "duplicate names in the driver window"
    unknown = [n for n in w if n not in qs]
    assert not unknown, f"window names not registered: {unknown}"
    # _driver_order really puts them first
    assert list(qs)[:50] == w


def test_every_query_has_oracle_or_is_declared_rows_only():
    qs, oracles = matrix.queries(), matrix.oracle_sql()
    rows_only = {n for n in qs if n not in oracles}
    # the ONLY sanctioned rows-only entries (sketch/float-centroid
    # results are engine-specific by design); growing this set is a
    # deliberate decision, not an accident
    assert rows_only == {"hier_agg_closure_approx", "sim_ivf_topk",
                         "sim_pq_indexed"}
    # no orphan oracles
    assert not set(oracles) - set(qs)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS "
                  f"SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


@pytest.mark.parametrize("name", sorted(matrix.oracle_sql()))
def test_oracle_sql_binds_in_duckdb(con, name):
    """EXPLAIN-only: parses + binds every oracle against the real
    schemas without executing (the full execution is the driver's t2 /
    scripts/oracle_check.py; this catches fragment regressions in
    seconds)."""
    con.execute("EXPLAIN " + matrix.oracle_sql()[name])
