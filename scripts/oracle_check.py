"""Driver-style correctness gate, runnable locally: every entry query vs
its DuckDB oracle at sf0.01 — row count, column names, and a value hash
over column-name-sorted, row-sorted data (mirrors the driver compare).
"""

from __future__ import annotations

import hashlib
import importlib.util
import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from graph_loom_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if v is None:
        return "\x00"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    return str(v)


def _hash(cols, rows) -> str:
    h = hashlib.sha256()
    for r in sorted(tuple(_norm(x) for x in row) for row in rows):
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def main() -> None:
    spec = importlib.util.spec_from_file_location(
        "entry", os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    spark = get_spark(app_name="oracle-check", master="local[16]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs, oracles = m.queries(), m.oracle_sql()
    only = sys.argv[1:]
    bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            scols = sorted(sdf.columns)
            srows = [[r[c] for c in scols] for r in sdf.collect()]
        except Exception as e:
            print(f"{name}: SPARK FAIL {str(e)[:120]}", flush=True)
            bad += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"{name}: rows={len(srows)} (no_oracle)", flush=True)
            continue
        try:
            cur = con.execute(sql)
            ocols_raw = [d[0] for d in cur.description]
            orows_raw = cur.fetchall()
        except Exception as e:
            print(f"{name}: ORACLE FAIL {str(e)[:120]}", flush=True)
            bad += 1
            continue
        order = sorted(range(len(ocols_raw)), key=lambda i: ocols_raw[i])
        ocols = [ocols_raw[i] for i in order]
        orows = [[row[i] for i in order] for row in orows_raw]
        ok_rows = len(srows) == len(orows)
        ok_cols = scols == ocols
        ok_hash = _hash(scols, srows) == _hash(ocols, orows)
        status = "OK" if (ok_rows and ok_cols and ok_hash) else "MISMATCH"
        if status != "OK":
            bad += 1
        print(
            f"{name}: {status} rows={len(srows)}/{len(orows)} cols={ok_cols} hash={ok_hash}",
            flush=True,
        )
    spark.stop()
    print(f"DONE bad={bad}", flush=True)


if __name__ == "__main__":
    main()
