"""Dtype-parity scan: mimic the driver's pandas-side canonicalization.

The r6-r8 ``emb_pq_topk`` red row was caused by a dtype-class mismatch
invisible to ``check_oracle.py``'s ``fetchall()`` path: DuckDB
``list_sum`` returns HUGEINT, which ``fetchdf()`` materializes as
float64 while the Spark result is int64 — equal values, different
hashes once a canonicalizer serializes the pandas frames. This scan
runs every oracle through ``fetchdf()`` and every Spark query through
``toPandas()`` and flags any column whose dtype CLASS (int / float /
bool / datetime / object) differs between the two — the whole bug
class, not just the one instance.

Usage: python scripts/check_dtypes.py [SF_DIR] [only,names]
"""

from __future__ import annotations

import importlib.util
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")
from graph_loom_spark.io.tpch_graph import TABLES  # noqa: E402
from graph_loom_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None


def dclass(dtype) -> str:
    k = getattr(dtype, "kind", "O")
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "datetime"
    return "object"


def main() -> None:
    spec = importlib.util.spec_from_file_location(
        "entrymod", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    spark = get_spark(
        app_name="dtype-check", master="local[8]", shuffle_partitions=8
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    qs, oracles = m.queries(), m.oracle_sql()
    n_ok = n_bad = n_err = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        if name not in oracles:
            continue
        t0 = time.time()
        try:
            spdf = fn(spark, SF_DIR).toPandas()
            opdf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"ERR   {name}: {e}")
            n_err += 1
            continue
        scls = {c: dclass(spdf[c].dtype) for c in spdf.columns}
        ocls = {c: dclass(opdf[c].dtype) for c in opdf.columns}
        bad = [
            f"{c}: spark={scls.get(c, '?')} oracle={ocls.get(c, '?')}"
            for c in sorted(set(scls) | set(ocls))
            if scls.get(c) != ocls.get(c)
        ]
        # an all-NaN / empty-frame column can legitimately differ; only
        # flag frames that actually carry rows
        if bad and len(spdf) > 0 and len(opdf) > 0:
            print(f"DTYPE {name}: {'; '.join(bad)} [{time.time()-t0:.1f}s]")
            n_bad += 1
        else:
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} dtype-mismatched, {n_err} errors")


if __name__ == "__main__":
    main()
