#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() twin on DuckDB at sf0.01, compare row count,
column names, and an order-insensitive value hash.

Canonicalization is FAITHFUL TO THE DRIVER (round-3 lesson — the old
fetchall()+repr canon passed two queries the driver gate rejected):

* Both engines are funneled through pandas (`DataFrame.toPandas()` /
  `duckdb.fetchdf()`), so engine-side dtype coercions are VISIBLE: e.g.
  DuckDB `SUM(BIGINT) OVER` yields HUGEINT which fetchdf coerces to float64
  — repr '0.0' — while Spark emits int64 — repr '0' — and the two MUST
  mismatch here exactly as they do in the driver.
* Rows are sorted via pandas `sort_values` over all columns; any array/map
  typed cell raises TypeError just like the driver's canonicalizer
  (rule: no array/map columns in queries() output — emit a scalar surface
  such as concat_ws/array_to_string for gate queries).
* Cell values are compared by dtype-sensitive repr (int 0 != float 0.0);
  floats ARE rounded to 6 decimals in `_cell` (matching the driver's hash
  canonicalization) — but dtype still distinguishes, so queries must STILL
  round to 4 on both sides themselves (repo convention: ROUND(x, 4) /
  F.round(x, 4)) to keep sub-1e-6 cross-engine float drift out of play.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

import __spark_entry__ as entrymod
from x5_ner_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def _cell(v) -> str:
    """Dtype-sensitive scalar repr: int64 0 -> '0', float64 0.0 -> '0.0'."""
    if v is None or v is pd.NaT:
        return "None"
    if isinstance(v, (np.bool_, bool)):
        return repr(bool(v))
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "nan"
        # round to 6: the driver's hash provably equates float32 artifacts
        # (cosine_topk was hash-green in r3 with DuckDB emitting float32
        # 0.263500005 vs Spark's double 0.2635) while still distinguishing
        # int64 0 from float64 0.0 (pack_documents was hash-red)
        f = round(f, 6)
        if f == 0.0:
            f = 0.0  # normalize -0.0
        return repr(f)
    if isinstance(v, (np.integer, int)):
        return repr(int(v))
    if isinstance(v, pd.Timestamp):
        return str(v)
    if isinstance(v, (bytes, bytearray)):
        return repr(bytes(v))
    if isinstance(v, str):
        return repr(v)
    if isinstance(v, (list, tuple, dict, set, np.ndarray)):
        raise TypeError(f"unhashable type: '{type(v).__name__}'")
    # NA scalars (pd.NA, Decimal, etc.)
    try:
        if pd.isna(v):
            return "None"
    except (TypeError, ValueError):
        pass
    return f"{type(v).__name__}:{v!r}"


def canon(pdf: pd.DataFrame):
    """Driver-style canon: sort columns by name, sort_values over all columns
    (raises on array cells like the driver), dtype-sensitive cell reprs,
    then an order-insensitive final sort."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    for c in cols:
        if pdf[c].dtype == object:
            for v in pdf[c]:
                if isinstance(v, (list, tuple, dict, set, np.ndarray)):
                    # same failure the driver's sort_values produces
                    raise TypeError(f"unhashable type: '{type(v).__name__}'")
    if len(pdf):
        pdf = pdf.sort_values(by=cols, kind="mergesort")
    rows = [
        tuple(_cell(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]
    rows.sort()
    return rows


def main() -> int:
    args = sys.argv[1:]
    # --ansi: run the gate under spark.sql.ansi.enabled=true — the DRIVER's
    # session default (Spark 4.1 ships ANSI on; our session.py pins it off).
    # The r8 gopher_filters regression (wrap-around long multiply, green
    # locally / ARITHMETIC_OVERFLOW at the driver) shipped precisely because
    # this replica only ever ran ANSI-off; both legs must be green before
    # committing changes to __spark_entry__.py or any operator a query
    # touches (CLAUDE.md verify section).
    ansi = "--ansi" in args
    args = [a for a in args if a != "--ansi"]
    only = args if args else None
    extra = {"spark.sql.ansi.enabled": "true"} if ansi else None
    spark = get_spark(master="local[8]", app_name="oracle-check",
                      shuffle_partitions=8, extra_conf=extra)
    if ansi:
        got = spark.conf.get("spark.sql.ansi.enabled")
        if got != "true":
            print(f"FATAL: --ansi requested but session has ansi={got}")
            return 1
    con = duckdb.connect()
    for t in entrymod.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            spdf = sdf.toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"OK?  {name}: rows-only ({len(spdf)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            dpdf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        ok_count = len(spdf) == len(dpdf)
        ok_cols = sorted(spdf.columns) == sorted(dpdf.columns)
        try:
            sc = canon(spdf)
        except Exception as e:
            print(f"FAIL {name}: spark canon error: {e}")
            n_fail += 1
            continue
        try:
            dc = canon(dpdf)
        except Exception as e:
            print(f"FAIL {name}: oracle canon error: {e}")
            n_fail += 1
            continue
        ok_vals = sc == dc
        if ok_count and ok_cols and ok_vals:
            print(f"PASS {name}: {len(spdf)} rows ({time.time()-t0:.1f}s)")
        else:
            n_fail += 1
            print(f"FAIL {name}: count={ok_count}({len(spdf)}/{len(dpdf)}) "
                  f"cols={ok_cols}({sorted(spdf.columns)}|{sorted(dpdf.columns)}) "
                  f"vals={ok_vals}")
            if ok_count and ok_cols and not ok_vals:
                diffs = [(a, b) for a, b in zip(sc, dc) if a != b][:3]
                for a, b in diffs:
                    print(f"   spark={a}\n   duck ={b}")
    print("FAILURES:", n_fail)
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
