"""Guard against the DuckDB HUGEINT hash-mismatch class.

DuckDB widens ``sum()`` over any integer expression to HUGEINT (int128). The
driver's value hasher serializes a HUGEINT column differently from Spark's
BIGINT even when every value is equal, so the query hash-fails despite being
correct (all five round-1 hash failures were exactly this). The contract is:
every oracle must CAST integer aggregates to BIGINT.

Rather than regex-linting the SQL, run each registered oracle in DuckDB at
sf0.001 and assert the *actual* result schema contains no int128 column —
this catches every present and future instance regardless of how the
widening is spelled.
"""

from __future__ import annotations

import pytest

from f1_bigdata_pyspark_spark.queries.registry import _REGISTRY
from tests.oracle_harness import duckdb_connection

ORACLE_QUERIES = [q.name for q in _REGISTRY.values() if q.oracle is not None]

FORBIDDEN_TYPES = {"HUGEINT", "UHUGEINT"}


@pytest.fixture(scope="module")
def con(sf_smoke):
    c = duckdb_connection(sf_smoke)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_has_no_hugeint_columns(name, con):
    rel = con.sql(_REGISTRY[name].oracle)
    bad = [
        (col, str(typ))
        for col, typ in zip(rel.columns, rel.types)
        if str(typ).upper() in FORBIDDEN_TYPES
    ]
    assert not bad, (
        f"{name}: oracle produces int128 column(s) {bad}; wrap the integer "
        f"aggregate in CAST(... AS BIGINT) or the driver hash will mismatch "
        f"Spark's BIGINT even when values are equal"
    )
