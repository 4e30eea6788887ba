#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: compare each query's
parquet output (written by graft.Verify) against its DuckDB oracle run on
the same testdata tables. Usage:
  python3 scripts/verify_local.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return round(float(v), 9)
    except Exception:
        pass
    return v


def rows_of(table):
    cols = sorted(table.column_names)
    data = [table.column(c).to_pylist() for c in cols]
    return cols, [tuple(norm(x) for x in row) for row in zip(*data)] if data else (cols, [])


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    # corpus-drift preflight written by graft.Verify: surface any schema
    # contract violations FIRST — a drifted column explains a swath of
    # downstream FAILs far better than their individual cast errors
    try:
        drift = json.load(open(f"{out_dir}/preflight.json"))
        for v in drift:
            print(f"DRIFT {v}")
    except FileNotFoundError:
        pass
    except Exception as e:  # a malformed report must not zero the gate
        print(f"DRIFT (preflight.json unreadable: {e})")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    import glob
    ok, bad, weak = [], [], []
    for name in sorted(oracle.keys() | {p.split("/")[-1] for p in glob.glob(f"{out_dir}/q*")}):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            bad.append((name, "NO SPARK OUTPUT"))
            continue
        spark_tbl = pq.read_table(files[0])
        if name not in oracle:
            n = spark_tbl.num_rows
            (weak if n > 0 else bad).append((name, f"rows-only: {n} rows"))
            continue
        try:
            duck_tbl = con.execute(oracle[name]).arrow()
        except Exception as e:
            bad.append((name, f"ORACLE SQL ERROR: {e}"))
            continue
        scols, srows = rows_of(spark_tbl)
        dcols, drows = rows_of(duck_tbl)
        if scols != dcols:
            bad.append((name, f"SCHEMA: spark={scols} duck={dcols}"))
            continue

        def dtype(t, c):
            s = str(t.schema.field(c).type)
            return {"large_string": "string", "large_binary": "binary",
                    "timestamp[us]": "ts", "timestamp[ns]": "ts",
                    "timestamp[ms]": "ts", "date32[day]": "date"}.get(s, s)
        tmis = [(c, dtype(spark_tbl, c), dtype(duck_tbl, c))
                for c in scols if dtype(spark_tbl, c) != dtype(duck_tbl, c)]
        if tmis:
            bad.append((name, f"DTYPES differ: {tmis}"))
            continue
        if len(srows) != len(drows):
            bad.append((name, f"ROWS: spark={len(srows)} duck={len(drows)}"))
            continue
        mismatches = [(i, a, b) for i, (a, b) in enumerate(zip(srows, drows)) if a != b]
        if mismatches:
            i, a, b = mismatches[0]
            bad.append((name, f"VALUES: {len(mismatches)}/{len(srows)} differ; "
                              f"first at row {i} (cols {scols}):\n  spark={a}\n  duck ={b}"))
        else:
            ok.append((name, f"{len(srows)} rows"))
    for name, msg in ok:
        print(f"PASS  {name} ({msg})")
    for name, msg in weak:
        print(f"WEAK  {name} ({msg})")
    for name, msg in bad:
        print(f"FAIL  {name}: {msg}")
    print(f"\n{len(ok)} pass, {len(weak)} weak, {len(bad)} fail")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
