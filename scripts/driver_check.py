"""Local simulation of the driver's correctness gate: runs every queries()
entry against its oracle_sql() twin via DuckDB at sf0.01 and reports
row-count / schema / order-insensitive value-hash matches.

    python scripts/driver_check.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import sys
import time

sys.path.insert(0, ".")


def value_hash(df) -> str:
    import pandas as pd

    df = df[sorted(df.columns)].sort_values(by=sorted(df.columns)).reset_index(drop=True)
    return hashlib.sha256(
        pd.util.hash_pandas_object(df, index=False).values.tobytes()
    ).hexdigest()[:12]


def main() -> int:
    import duckdb
    import ray

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    ray.init(address="local", num_cpus=16, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import __ray_entry__ as E

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

    qs, oq = E.queries(), E.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        t0 = time.time()
        try:
            got = fn(sf)
            if hasattr(got, "to_pandas"):
                got = got.to_pandas()
        except Exception as ex:  # noqa: BLE001
            print(f"{name}: RAY FAIL {type(ex).__name__}: {str(ex)[:160]}")
            failures += 1
            continue
        t1 = time.time()
        if name not in oq:
            print(f"{name}: ray {t1 - t0:.1f}s rows {len(got)} (rows-only)")
            continue
        try:
            exp = con.sql(oq[name]).df()
        except Exception as ex:  # noqa: BLE001
            print(f"{name}: SQL FAIL {str(ex)[:160]}")
            failures += 1
            continue
        ok = len(got) == len(exp) and sorted(got.columns) == sorted(exp.columns)
        if ok:
            exp2 = exp[sorted(exp.columns)].astype(
                {c: str(got[c].dtype) for c in sorted(got.columns)}
            )
            ok = value_hash(got) == value_hash(exp2)
        print(f"{name}: ray {t1 - t0:.1f}s sql {time.time() - t1:.1f}s "
              f"rows {len(got)}/{len(exp)} {'MATCH' if ok else 'MISMATCH'}")
        failures += 0 if ok else 1
    ray.shutdown()
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
