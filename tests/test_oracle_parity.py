"""Oracle-differential tests: every registered query with an oracle must
match DuckDB exactly (row count + order-insensitive values, columns
compared by sorted name) at sf0.01 — the same gate the driver applies."""

from __future__ import annotations

import pytest

from emails_to_vector_db_spark.plans import REGISTRY
from tests.conftest import SF_ORACLE, duck_con, rows_match

ORACLE_SPECS = sorted(
    (name for name, s in REGISTRY.items() if s.oracle is not None)
)


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF_ORACLE)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLE_SPECS)
def test_oracle_parity(spark, con, name):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, SF_ORACLE)
    # DuckDB column order must match Spark's sorted-by-name order; fetch
    # with original names and reorder via description.
    duck = con.execute(spec.oracle)
    duck_cols = [d[0] for d in duck.description]
    duck_rows = duck.fetchall()
    assert sorted(duck_cols) == sorted(
        sdf.columns
    ), f"column names differ: duck={duck_cols} spark={sdf.columns}"
    # align duck row tuples to duck_cols order == spark order mapping
    # rows_match sorts spark cols by name; re-map duck rows the same way
    dorder = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
    sorder = sorted(range(len(sdf.columns)), key=lambda i: sdf.columns[i])
    remapped = [tuple(r[i] for i in dorder) for r in duck_rows]
    cols_sorted = sorted(sdf.columns)
    sdf2 = sdf.select(*cols_sorted)
    ok, msg = rows_match(sdf2, remapped)
    assert ok, f"{name}: {msg}"


def test_all_queries_return_rows(spark):
    from tests.conftest import SF_SMOKE

    for name, spec in REGISTRY.items():
        n = spec.fn(spark, SF_SMOKE).count()
        assert n >= 0, name
