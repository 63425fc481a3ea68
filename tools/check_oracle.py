"""Reproducible local mirror of the driver's correctness protocol:
run every oracle-backed queries() entry side-by-side with its
oracle_sql() under DuckDB and record rows/schema/value-hash matches.

    python tools/check_oracle.py [sf_dir ...] [--out FILE]

Columns are sorted by name before hashing (the driver's compare);
values hash via pandas util after float64 normalization. Rows-only
queries are executed and recorded with their row count (err
"no_oracle"), so the artifact also proves they run."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def _to_pandas(res):
    import pandas as pd
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()


def _canon(df):
    import pandas as pd

    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").round(9)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    # canonical row order: engine and oracle may return rows in any
    # order; sort by every column (the parity-test convention)
    if len(df.columns):
        df = df.sort_values(list(df.columns), kind="stable")
    return df.reset_index(drop=True)


def _value_hash(df) -> str:
    import hashlib

    import pandas as pd

    h = hashlib.sha256()
    for c in df.columns:
        h.update(pd.util.hash_pandas_object(df[c], index=False).values.tobytes())
    return h.hexdigest()


def check(sf_dir: str) -> dict:
    import duckdb

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    out = {}
    for name, fn in qs.items():
        rec = {"rows_match": None, "schema_match": None, "hash_match": None,
               "engine_rows": None, "oracle_rows": None, "sec": None,
               "err": None}
        t0 = time.time()
        try:
            eng = _canon(_to_pandas(fn(sf_dir)))
            rec["engine_rows"] = len(eng)
            rec["sec"] = round(time.time() - t0, 2)
            if name not in oracles:
                rec["err"] = "no_oracle"
            else:
                ora = _canon(con.execute(oracles[name]).df())
                rec["oracle_rows"] = len(ora)
                rec["rows_match"] = len(eng) == len(ora)
                rec["schema_match"] = list(eng.columns) == list(ora.columns)
                rec["hash_match"] = (
                    rec["rows_match"] and rec["schema_match"]
                    and _value_hash(eng) == _value_hash(ora)
                )
        except Exception as ex:  # noqa: BLE001 — recorded, not raised
            rec["err"] = f"{type(ex).__name__}: {ex}"[:300]
        out[name] = rec
        status = ("PASS" if rec["hash_match"]
                  else rec["err"] or "FAIL")
        print(f"  {name:24s} {status} ({rec['sec']}s)", flush=True)
    return out


def main():
    argv = sys.argv[1:]
    out_file = None
    if "--out" in argv:
        i = argv.index("--out")
        out_file = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    sf_dirs = ([a for a in argv if not a.startswith("--")]
               or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get(
            "RAY_GRAFT_CPUS", "32")), include_dashboard=False,
            logging_level="ERROR")
    report = {}
    for sf in sf_dirs:
        print(f"== {sf}", flush=True)
        report[sf] = check(sf)
    summary = {}
    for sf, recs in report.items():
        n_pass = sum(1 for r in recs.values() if r["hash_match"])
        n_fail = sum(
            1 for r in recs.values()
            if r["hash_match"] is False or (
                r["err"] and r["err"] != "no_oracle")
        )
        n_ro = sum(1 for r in recs.values() if r["err"] == "no_oracle")
        summary[sf] = {"pass": n_pass, "fail": n_fail, "rows_only": n_ro}
        print(f"{sf}: {n_pass} pass / {n_fail} fail / {n_ro} rows-only")
    report["_summary"] = summary
    if out_file:
        with open(out_file, "w") as f:
            json.dump(report, f, indent=1)
    ray.shutdown()
    return 1 if any(s["fail"] for s in summary.values()) else 0


if __name__ == "__main__":
    sys.exit(main())
