"""Guards on the grading-driver contract surface (__spark_entry__.py).

Round-3 shipped two driver-gate reds that the operators themselves did not
cause: an array-typed output column (the driver's pandas canonicalizer dies
on list cells) and a query registry that outgrew the driver's 50-entry
evaluation window. These tests make both rules load-bearing, plus the
zero-rows-only invariant (every registered query has a DuckDB oracle)."""

from __future__ import annotations

from pyspark.sql import types as T

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"


def test_registry_fits_driver_window():
    qs = entrymod.queries()
    assert len(qs) <= 50, f"driver evaluates only the first 50, got {len(qs)}"


def test_every_query_has_an_oracle():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    missing = [name for name in qs if name not in oracles]
    assert not missing, f"rows-only queries (weaker driver check): {missing}"


def test_no_container_columns_in_gate_outputs(spark):
    """No array/map/struct TOP-LEVEL column in any queries() output — the
    driver sorts results through pandas and raises 'unhashable type' on
    container cells (r3: inverted_index). Schema-only check: builds each
    plan at sf0.001 without executing it."""
    bad: list[tuple[str, str]] = []
    for name, fn in entrymod.queries().items():
        schema = fn(spark, SF_DIR).schema
        for f in schema.fields:
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
                bad.append((name, f.name))
    assert not bad, f"container-typed gate columns: {bad}"
