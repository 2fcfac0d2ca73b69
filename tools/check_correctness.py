"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its
oracle_sql() on DuckDB over the same parquet tables, comparing
row-count, sorted column names, and an order-insensitive value hash.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb

sys.path.insert(0, ".")
import __spark_entry__ as entrymod  # noqa: E402
from siren_spark.session import get_spark  # noqa: E402


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted(
        "\x1f".join(_norm(r[i]) for i in order) for r in rows
    )
    h = hashlib.md5()
    for line in canon:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def _norm(v) -> str:
    if v is None:
        return "\\N"
    if isinstance(v, float):
        return repr(v)
    return str(v)


# Spark simpleString dtype -> acceptable DuckDB type names. Anything not
# listed here (notably HUGEINT from an uncast SUM(BIGINT), or DECIMAL)
# is treated as a type mismatch: the driver's normalizer stringifies
# such values differently even when Python round-trips them equal.
_TYPE_COMPAT = {
    "bigint": {"BIGINT"},
    "int": {"INTEGER"},
    "smallint": {"SMALLINT"},
    "tinyint": {"TINYINT"},
    "double": {"DOUBLE"},
    "float": {"FLOAT"},
    "string": {"VARCHAR"},
    "boolean": {"BOOLEAN"},
    "date": {"DATE"},
    "timestamp": {"TIMESTAMP", "TIMESTAMP WITH TIME ZONE"},
    "timestamp_ntz": {"TIMESTAMP"},
    "binary": {"BLOB"},
}


def types_compatible(scols, stypes, dcols, dtypes) -> list[str]:
    """Return list of 'col: spark_type vs duck_type' mismatches."""
    smap = dict(zip(scols, stypes))
    dmap = dict(zip(dcols, [str(t).upper() for t in dtypes]))
    bad = []
    for c, st in smap.items():
        dt = dmap.get(c)
        if dt is None:
            continue  # schema check reports missing columns
        allowed = _TYPE_COMPAT.get(st)
        if allowed is not None and dt not in allowed:
            bad.append(f"{c}: spark={st} duck={dt}")
    return bad


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("local[8]", app_name="check_correctness",
                      shuffle_partitions=8)
    con = duckdb.connect()
    for t in entrymod.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            stypes = [t for _, t in sdf.dtypes]
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"weak  {name}: rows={len(srows)} (no oracle)")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = rel.columns
            dtypes = rel.types
            drows = [tuple(r) for r in rel.fetchall()]
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        ok_rows = len(srows) == len(drows)
        ok_schema = sorted(scols) == sorted(dcols)
        type_mismatches = types_compatible(scols, stypes, dcols, dtypes)
        ok_types = not type_mismatches
        sh = value_hash(scols, srows)
        dh = value_hash(dcols, drows)
        ok_hash = sh == dh
        status = "ok" if (ok_rows and ok_schema and ok_hash and ok_types) else "FAIL"
        dt = time.time() - t0
        print(f"{status:5} {name}: rows {len(srows)}/{len(drows)} "
              f"schema={'=' if ok_schema else scols} hash={'=' if ok_hash else (sh[:8]+'!='+dh[:8])} "
              f"types={'=' if ok_types else type_mismatches} "
              f"[{dt:.1f}s]")
        if status == "FAIL":
            failures.append(name)
            if not ok_hash and ok_rows and ok_schema:
                # print a few differing rows for debugging
                ss = set("\x1f".join(_norm(v) for v in r) for r in
                         [tuple(r[i] for i in sorted(range(len(scols)), key=lambda i: scols[i])) for r in srows])
                ds = set("\x1f".join(_norm(v) for v in r) for r in
                         [tuple(r[i] for i in sorted(range(len(dcols)), key=lambda i: dcols[i])) for r in drows])
                for x in list(ss - ds)[:3]:
                    print("   spark-only:", x[:160])
                for x in list(ds - ss)[:3]:
                    print("   duck-only: ", x[:160])
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
