"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB at the given sf dir, then compares row count, column names,
and order-insensitive values (columns sorted by name, rows sorted by
all columns). Floats are compared exactly by default — matching the
strictest plausible driver hash — with a fallback report of max
abs-diff so near-misses are diagnosable.

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time
import traceback

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from refluxdb_spark.oracle_types import canon_duck_type, canon_spark_type  # noqa: E402
from refluxdb_spark.queries import ORACLES, QUERIES, TABLES  # noqa: E402
from refluxdb_spark.session import get_spark  # noqa: E402


def normalize(rows: list[tuple], cols: list[str]) -> list[tuple]:
    """Sort columns by name, then rows by string repr (total order)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def conv(v):
        if isinstance(v, float):
            return ("f", repr(v))
        if hasattr(v, "isoformat"):  # datetime/date
            return ("t", v.isoformat())
        if isinstance(v, bytes):
            return ("b", v.hex())
        return (type(v).__name__[0], str(v))

    out = [tuple(conv(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # forgetting the sf_dir positional puts a query name in its slot;
    # catch it here instead of failing later with a confusing
    # parquet-path error naming the query
    if sf_dir in QUERIES:
        print(f"error: first argument is the sf_dir; {sf_dir!r} is a "
              f"query name — e.g. check_correctness.py "
              f"/root/testdata/sf0.01 {sf_dir}", file=sys.stderr)
        return 2
    # a typo'd query name must not filter the run down to nothing and
    # certify "0/0 pass" with exit 0 — validate before the (15 s)
    # Spark session so the mistake costs nothing
    unknown = sorted(only - set(QUERIES))
    if unknown:
        print(f"error: unknown queries: {unknown} (registry has "
              f"{len(QUERIES)}; did you mean to pass the sf_dir first?)",
              file=sys.stderr)
        return 2

    spark = get_spark(app_name="check_correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    results = {}
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception:
            results[name] = ("SPARK_ERROR", traceback.format_exc(limit=3))
            print(f"[FAIL-spark] {name}\n{results[name][1]}")
            continue
        oracle = ORACLES.get(name)
        if oracle is None:
            results[name] = ("ROWS_ONLY", len(srows))
            print(f"[rows-only] {name}: {len(srows)} rows in {time.time()-t0:.1f}s")
            continue
        try:
            rel = con.sql(oracle)
            dcols = rel.columns
            drows = rel.fetchall()
        except Exception:
            results[name] = ("DUCK_ERROR", traceback.format_exc(limit=3))
            print(f"[FAIL-duck] {name}\n{results[name][1]}")
            continue

        status = []
        if len(srows) != len(drows):
            status.append(f"rowcount {len(srows)} vs {len(drows)}")
        if sorted(c.lower() for c in scols) != sorted(c.lower() for c in dcols):
            status.append(f"schema {sorted(scols)} vs {sorted(dcols)}")
        else:
            # Dtype parity: a width skew (e.g. DuckDB HUGEINT vs Spark
            # BIGINT) hashes differently under the driver's type-sensitive
            # compare even when values are identical — the sample_pack_bins
            # r04 failure mode. Fence it here too.
            stypes = {f.name.lower(): canon_spark_type(f.dataType)
                      for f in sdf.schema.fields}
            dtypes = {c.lower(): canon_duck_type(t)
                      for c, t in zip(dcols, rel.types)}
            skew = [(c, stypes[c], dtypes[c])
                    for c in sorted(stypes) if stypes[c] != dtypes[c]]
            if skew:
                status.append(f"dtype skew {skew}")
        if not status:
            ns, nd = normalize(srows, scols), normalize(drows, dcols)
            if ns != nd:
                n_bad = sum(1 for a, b in zip(ns, nd) if a != b)
                first_bad = next((i for i, (a, b) in enumerate(zip(ns, nd)) if a != b), None)
                detail = ""
                if first_bad is not None:
                    detail = f"\n  spark: {ns[first_bad]}\n  duck : {nd[first_bad]}"
                status.append(f"values differ in {n_bad}/{len(ns)} rows{detail}")
        if status:
            results[name] = ("MISMATCH", "; ".join(status))
            print(f"[FAIL] {name}: {results[name][1]}")
        else:
            results[name] = ("OK", len(srows))
            print(f"[ok] {name}: {len(srows)} rows in {time.time()-t0:.1f}s")

    n_ok = sum(1 for s, _ in results.values() if s in ("OK", "ROWS_ONLY"))
    print(f"\n{n_ok}/{len(results)} pass")
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main())
