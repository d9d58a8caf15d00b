"""Local stand-in for the driver's t2 correctness gate: run every
queries() entry AND its oracle_sql() on the same sf dir, compare
row-count + column names + order-insensitive exact values."""

from __future__ import annotations

import importlib.util
import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")
from graph_loom_spark.io.tpch_graph import TABLES  # noqa: E402
from graph_loom_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = float(v)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple(repr(x) for x in t))
    return [cols[i] for i in order], out


def main():
    spec = importlib.util.spec_from_file_location("entrymod", "/root/repo/__spark_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    spark = get_spark(app_name="oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs, oracles = m.queries(), m.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = [tuple(r) for r in res.fetchall()]
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        sc, sr = norm_rows(scols, srows)
        dc, dr = norm_rows(dcols, drows)
        ok = True
        msgs = []
        if sc != dc:
            ok = False
            msgs.append(f"cols {sc} != {dc}")
        if len(sr) != len(dr):
            ok = False
            msgs.append(f"rowcount {len(sr)} != {len(dr)}")
        if ok:
            for i, (a, b) in enumerate(zip(sr, dr)):
                if a != b:
                    eq = len(a) == len(b) and all(
                        (isinstance(x, float) and isinstance(y, float) and math.isclose(x, y, rel_tol=1e-12))
                        or x == y
                        for x, y in zip(a, b)
                    )
                    if not eq:
                        ok = False
                        msgs.append(f"row {i}: spark={a} duck={b}")
                        break
                    msgs.append(f"row {i} float-close-not-exact: spark={a} duck={b}")
                    ok = False
                    break
        status = "PASS " if ok else "FAIL "
        n_pass += ok
        n_fail += not ok
        print(f"{status}{name}: {len(sr)} rows [{time.time()-t0:.1f}s] {'; '.join(msgs[:3])}")
    print(f"\n{n_pass} pass, {n_fail} fail")


if __name__ == "__main__":
    main()
