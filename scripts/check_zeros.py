"""Signed-zero sweep (VERDICT r10 ask #2): prove the -0.0/+0.0 oracle
class is dead at runtime, the way check_dtypes.py killed the HUGEINT
class.

Two proofs:

1. **Planted probe** — DuckDB ``round(-6.9e-10, 6)`` really does yield
   ``-0.0`` (so this sweep is not vacuous under a DuckDB upgrade), and
   the same expression piped through ``_normalize_signed_zero`` yields
   ``+0.0``.
2. **Full-registry runtime sweep** — every ``oracle_sql()`` entry runs
   in DuckDB against the fixture; ANY float output equal to zero with
   a negative sign bit fails the sweep.  Spark's ``round()`` can never
   produce ``-0.0`` (BigDecimal HALF_UP), so a ``-0.0`` in oracle
   output is a guaranteed driver hash mismatch.

Usage:
    python scripts/check_zeros.py [SF_DIR] [name1,name2,...]

Exit 0 = class is dead on this fixture; exit 1 = at least one oracle
emits -0.0 (listed with row samples).
"""

from __future__ import annotations

import importlib.util
import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")
from graph_loom_spark.io.tpch_graph import TABLES  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None


def _neg_zero(v) -> bool:
    return isinstance(v, float) and v == 0.0 and math.copysign(1.0, v) < 0


def main() -> int:
    spec = importlib.util.spec_from_file_location(
        "entrymod", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    # Proof 1: the planted tiny-negative probe.
    raw = con.execute("SELECT round(-6.9e-10, 6) AS q").fetchone()[0]
    assert _neg_zero(raw), (
        f"DuckDB round() no longer yields -0.0 on tiny negatives (got {raw!r}) "
        "— the sweep below would be vacuous; re-audit the signed-zero seam"
    )
    fixed = con.execute(
        m._normalize_signed_zero("SELECT round(-6.9e-10, 6) AS q")
    ).fetchone()[0]
    assert fixed == 0.0 and not _neg_zero(fixed), f"normalizer failed: {fixed!r}"
    print("planted probe: raw -0.0 confirmed, normalized +0.0 confirmed")

    # Proof 2: the full-registry runtime sweep.
    bad: dict[str, list] = {}
    n = 0
    for name, sql in m.oracle_sql().items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            rows = con.execute(sql).fetchall()
        except Exception as e:  # oracle errors are check_oracle's job
            print(f"skip  {name}: duckdb error: {str(e)[:120]}")
            continue
        hits = [r for r in rows if any(_neg_zero(v) for v in r)]
        n += 1
        if hits:
            bad[name] = hits[:3]
            print(f"NEGZ  {name}: {len(hits)} rows with -0.0, e.g. {hits[0]} "
                  f"[{time.time()-t0:.1f}s]")
        else:
            print(f"ok    {name}: {len(rows)} rows [{time.time()-t0:.1f}s]")
    print(f"\nswept {n} oracles on {SF_DIR}: {len(bad)} emit -0.0")
    if bad:
        print("FAIL:", ", ".join(sorted(bad)))
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
