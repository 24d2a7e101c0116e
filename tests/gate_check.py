"""Driver-gate mimic: run registered queries vs their DuckDB oracles at
sf0.01 using the DRIVER's canonicalization (pandas sort_values over all
columns — which cannot sort ARRAY cells; round 1 shipped the flagship
red because tests/parity.py tolerated arrays while the driver did not).

Usage:
    python tests/gate_check.py way_assembly image_features
    python tests/gate_check.py --all
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF = "/root/testdata/sf0.01"


def _canon(df: pd.DataFrame):
    """Mirror of the driver's canonicalizer: sort columns by name, sort
    rows by all columns (raises TypeError on unhashable cells — that IS
    the gate's behavior we must survive), then hash values."""
    cols = sorted(df.columns)
    out = df[cols].sort_values(by=cols).reset_index(drop=True)
    hashable = out.copy()
    for c in cols:
        if hashable[c].dtype == object:
            hashable[c] = hashable[c].astype(str)
    return pd.util.hash_pandas_object(hashable, index=False).sum(), out


def run(names: list[str]) -> int:
    from parity import duck_con

    import __spark_entry__ as E
    from osm2shp_spark.session import get_spark

    spark = get_spark(app_name="gate_check", master="local[8]")
    con = duck_con(SF)
    qs, os_ = E.queries(), E.oracle_sql()
    failed = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark err {type(e).__name__}: {e}")
            failed += 1
            continue
        if name not in os_:
            try:
                _canon(sdf)
                print(f"ROWS {name}: {len(sdf)} rows, no oracle "
                      f"({time.time() - t0:.1f}s)")
            except Exception as e:  # noqa: BLE001
                print(f"FAIL {name}: canonicalizer err {e}")
                failed += 1
            continue
        try:
            odf = con.sql(os_[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle err {type(e).__name__}: {e}")
            failed += 1
            continue
        ok_rows = len(sdf) == len(odf)
        ok_schema = sorted(sdf.columns) == sorted(odf.columns)
        try:
            hs, cs = _canon(sdf)
            ho, co = _canon(odf)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: canonicalizer err {e}")
            failed += 1
            continue
        ok_hash = hs == ho
        if ok_rows and ok_schema and ok_hash:
            print(f"PASS {name}: {len(sdf)} rows ({time.time() - t0:.1f}s)")
        else:
            failed += 1
            print(
                f"FAIL {name}: rows={len(sdf)}/{len(odf)} "
                f"schema={ok_schema} hash={ok_hash}"
            )
            if ok_schema and not ok_hash:
                neq = cs.compare(co) if len(cs) == len(co) else None
                if neq is not None and not neq.empty:
                    print(neq.head(10))
    spark.stop()
    return failed


if __name__ == "__main__":
    args = sys.argv[1:]
    import __spark_entry__ as E

    names = list(E.queries()) if args == ["--all"] else args
    sys.exit(1 if run(names) else 0)
