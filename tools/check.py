"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01 on Spark AND its
``oracle_sql()`` twin on DuckDB, then compares row count, sorted column
names, and an order-insensitive value hash.  Use ``--only name`` to
debug a single query; ``--sf-dir`` to change scale.
"""

from __future__ import annotations

import argparse
import hashlib
import math
import sys
import time
from datetime import datetime

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_value(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, datetime):
        return v.isoformat()
    return str(v)


def frame_fingerprint(cols: list[str], rows: list[tuple]) -> tuple[str, list[str]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(norm_value(r[i]) for i in order) for r in rows
    )
    h = hashlib.md5("\n".join(lines).encode()).hexdigest()
    return h, lines


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", action="append", default=None)
    ap.add_argument("--show-diff", action="store_true")
    args = ap.parse_args()
    if args.only:
        # accept comma-separated lists; refuse silently-matching-nothing
        args.only = [n for part in args.only for n in part.split(",") if n]
        import __spark_entry__ as _em

        unknown = [n for n in args.only if n not in _em.queries()]
        if unknown:
            ap.error(f"unknown query name(s) in --only: {', '.join(unknown)}")

    import __spark_entry__ as entry_mod
    from entwiner_spark.session import get_spark

    spark = get_spark("check", master="local[8]", shuffle_partitions=8)
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
        checked += 1
        t0 = time.time()
        try:
            sdf = fn(spark, args.sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok(rows-only) {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            cur = con.execute(oracles[name])
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rows spark={len(srows)} duck={len(drows)}")
        if not problems:
            sh, sl = frame_fingerprint(scols, srows)
            dh, dl = frame_fingerprint(dcols, drows)
            if sh != dh:
                problems.append("value-hash mismatch")
                if args.show_diff:
                    sset, dset = set(sl), set(dl)
                    for line in list(sset - dset)[:5]:
                        print("  spark-only:", line)
                    for line in list(dset - sset)[:5]:
                        print("  duck-only :", line)
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)} ({time.time()-t0:.1f}s)")
            failures += 1
        else:
            print(f"OK   {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")

    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'} "
          f"({checked} checked of {len(qs)} queries, {len(oracles)} with oracles)")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
