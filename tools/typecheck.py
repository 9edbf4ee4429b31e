"""Oracle/Spark result-type sweep.

The driver's value hash is type-sensitive (it compares materialized
values, so DuckDB HUGEINT -> pandas float/object vs Spark BIGINT ->
int64 diverges even when the numbers are equal).  ``tools/check.py``'s
string-normalized hash is NOT sensitive to this, which let the class
recur (t7 -> s7 -> q12 across rounds).  This tool closes the gap
permanently: for every ``oracle_sql()`` entry it compares the DuckDB
result column types against the Spark DataFrame schema and fails on any
numeric-class divergence:

- DuckDB HUGEINT / UHUGEINT anywhere (Spark has no int128 -> always a
  driver hash risk): fix the oracle with CAST(... AS BIGINT).
- int-vs-float / decimal-vs-double class mismatches between the sides.
- ANY nested (array/struct/map) output column, on either side, for
  every query in ``queries()`` (oracled or not): the driver's pandas
  canonicalizer sorts the frame and dies on unhashable list cells
  (s11/geo_s13 in CORRECTNESS_r05).  Serialize nested outputs to a
  deterministic string (scaled-int concat_ws / to_json) instead.

Run: python tools/typecheck.py  (sf dir only affects data, not types).
"""

from __future__ import annotations

import argparse
import sys

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# DuckDB type name -> comparison class
_DUCK_CLASS = {
    "TINYINT": "int",
    "SMALLINT": "int",
    "INTEGER": "int",
    "BIGINT": "int",
    "UTINYINT": "int",
    "USMALLINT": "int",
    "UINTEGER": "int",
    "UBIGINT": "int",
    "HUGEINT": "hugeint",
    "UHUGEINT": "hugeint",
    "FLOAT": "float",
    "DOUBLE": "float",
    "VARCHAR": "str",
    "BOOLEAN": "bool",
    "DATE": "date",
    "BLOB": "binary",
}


def duck_class(tname: str) -> str:
    t = tname.upper()
    if t in _DUCK_CLASS:
        return _DUCK_CLASS[t]
    if t.startswith("DECIMAL"):
        return "decimal"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    if t.endswith("[]") or t.startswith("STRUCT") or t.startswith("MAP"):
        return "nested"
    return t.lower()


def spark_class(dt) -> str:
    from pyspark.sql import types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(dt, T.BinaryType):
        return "binary"
    if isinstance(dt, (T.ArrayType, T.StructType, T.MapType)):
        return "nested"
    return type(dt).__name__.lower()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--only", action="append", default=None)
    args = ap.parse_args()
    if args.only:
        # accept comma-separated lists (a single "a,b,c" element would
        # otherwise match nothing and vacuously pass)
        args.only = [n for part in args.only for n in part.split(",") if n]

    import __spark_entry__ as entry_mod
    from entwiner_spark.session import get_spark

    spark = get_spark("typecheck", master="local[4]", shuffle_partitions=4)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = 0
    checked = 0
    for name, fn in qs.items():
        if args.only and name not in args.only:
            continue
        try:
            schema = fn(spark, args.sf_dir).schema
            stypes = {f.name: spark_class(f.dataType) for f in schema.fields}
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        problems = []
        # nested Spark outputs break the driver canonicalizer even on
        # rows-only (no-oracle) checks — guard every query
        for c, sc in stypes.items():
            if sc == "nested":
                problems.append(
                    f"{c}: nested Spark output (driver canonicalizer cannot "
                    "hash list cells — serialize to string)"
                )
        if name in oracles:
            try:
                rel = con.sql(oracles[name])
                dtypes = {
                    c: duck_class(str(t)) for c, t in zip(rel.columns, rel.types)
                }
            except Exception as e:
                print(f"FAIL {name}: duckdb error: {e}")
                failures += 1
                continue
            checked += 1
            for c, dc in dtypes.items():
                if dc == "hugeint":
                    problems.append(f"{c}: DuckDB HUGEINT (cast oracle to BIGINT)")
                if dc == "nested":
                    problems.append(f"{c}: nested oracle output (serialize)")
                sc = stypes.get(c)
                if sc is not None and dc not in ("hugeint", "nested") and sc != dc:
                    # decimal-vs-float is the other known hash-divergence class
                    problems.append(f"{c}: spark={sc} duck={dc}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            failures += 1

    print(
        f"\n{'ALL TYPES OK' if failures == 0 else f'{failures} TYPE FAILURES'} "
        f"({checked} oracles checked)"
    )
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
