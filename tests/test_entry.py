"""Smoke tests for the driver contract surface."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert df.columns[0] == "l_returnflag"


def test_registry_shape():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 20
    # every oracle key must be a declared query
    assert set(oracles) <= set(qs)
    # most queries should carry an oracle (rows-only is the exception)
    assert len(oracles) >= len(qs) * 0.6
