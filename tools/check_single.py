"""Run ONE query() entry against its DuckDB oracle at one or more
scale factors — the per-operator iteration loop (the full sweep lives
in check_oracle.py). Usage:

    python tools/check_single.py QUERY [QUERY...] [--sf SF_DIR ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_oracle import TABLES, _canon, _to_pandas, _value_hash  # noqa: E402


def main() -> None:
    import time

    import duckdb
    import ray

    argv = sys.argv[1:]
    sfs = []
    names = []
    i = 0
    while i < len(argv):
        if argv[i] == "--sf":
            i += 1
            # consume every following path operand (--sf A B works)
            while i < len(argv) and not argv[i].startswith("--"):
                sfs.append(argv[i])
                i += 1
        else:
            names.append(argv[i])
            i += 1
    sfs = sfs or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "16")),
                 include_dashboard=False, logging_level="ERROR")
    import __ray_entry__ as entrymod

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    rc = 0
    for sf in sfs:
        con = duckdb.connect()
        for t in TABLES:
            p = os.path.join(sf, f"{t}.parquet")
            if os.path.exists(p):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        for name in names:
            t0 = time.time()
            eng = _canon(_to_pandas(qs[name](sf)))
            sec = time.time() - t0
            if name not in oracles:
                print(f"{sf} {name}: rows={len(eng)} (no oracle) "
                      f"{sec:.2f}s")
                continue
            ora = _canon(con.execute(oracles[name]).df())
            ok = (len(eng) == len(ora)
                  and list(eng.columns) == list(ora.columns)
                  and _value_hash(eng) == _value_hash(ora))
            print(f"{sf} {name}: {'MATCH' if ok else 'MISMATCH'} "
                  f"eng={len(eng)} ora={len(ora)} {sec:.2f}s")
            if not ok:
                rc = 1
                print("  engine cols:", list(eng.columns))
                print("  oracle cols:", list(ora.columns))
                print(eng.head(8).to_string())
                print(ora.head(8).to_string())
    ray.shutdown()
    sys.exit(rc)


if __name__ == "__main__":
    main()
