#!/usr/bin/env python3
"""Runnable Python counterpart of the engine's external-engine handoff —
the reference's Python filesystem API surface (python/cdlake/filesystem.py:
44-74: sql_as_pandas / read_files / take; python/src/lib.rs:24-165).

The Scala facade (graft.Cdl / CdlFs) hands external engines two things:
`tableLocation` (the rootfs parquet directory) and `storageOptions`
(fs credentials/endpoint keys). Anything that reads parquet can consume
the table directly — this script does exactly that with DuckDB + pandas,
no JVM required:

  1. sql_as_pandas(query)      -> DuckDB over the rootfs table -> pandas
  2. read_files(condition)     -> reassemble file bytes from chunk rows
  3. take(indices, columns)    -> random access by the persistent row_id

Create a dataset first (one-time, from the repo root):

  sbt -batch "runMain graft.cli.Main cp /tmp/fixture /tmp/ds1"

then:  python3 scripts/python_handoff_demo.py [/tmp/ds1]
"""
import sys

import duckdb

ROOT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ds1"
TABLE_LOCATION = f"{ROOT}/rootfs"  # CdlFs.tableLocation for a local dataset

con = duckdb.connect()
# hive_partitioning picks up the p0 partition column the writer emits;
# union_by_name tolerates appends that predate optional columns (row_id)
con.execute(
    "CREATE VIEW rootfs AS SELECT * FROM read_parquet("
    f"'{TABLE_LOCATION}/*/*.parquet', hive_partitioning=true, union_by_name=true)")


def sql_as_pandas(query):
    """The reference's sql_as_pandas: full SQL over the rootfs table,
    materialized as one pandas DataFrame (the one-batch contract)."""
    return con.execute(query).df()


def read_files(condition):
    """The reference's read_files(condition): full records for every
    matching FILE (metadata rides on chunk 0), payload bytes reassembled
    from the file's chunk rows in chunk order."""
    rows = con.execute(
        "SELECT r.parent, r.name, r.chunk_id, r.data FROM rootfs r "
        "SEMI JOIN (SELECT parent, name FROM rootfs "
        f"          WHERE size IS NOT NULL AND ({condition})) m "
        "  ON r.parent = m.parent AND r.name = m.name "
        "ORDER BY r.parent, r.name, r.chunk_id").fetchall()
    chunks = {}
    for parent, name, _chunk, data in rows:
        key = f"{parent.rstrip('/')}/{name}"
        chunks.setdefault(key, []).append(bytes(data))
    # join once per file (bytes += is quadratic on chunk count)
    return {k: b"".join(v) for k, v in chunks.items()}


def take(indices, columns):
    """The reference's Lance-style take(indices, columns): random access
    by the persistent row_id stamp — a plain filter, no sort or window."""
    cols = ", ".join(["row_id"] + columns)
    idx = ", ".join(str(i) for i in indices)
    return con.execute(
        f"SELECT {cols} FROM rootfs WHERE row_id IN ({idx}) "
        "ORDER BY row_id").df()


if __name__ == "__main__":
    print("== sql_as_pandas: listing (data blanked, like list_by) ==")
    df = sql_as_pandas(
        "SELECT parent, name, size, octet_length(data) AS n_bytes "
        "FROM rootfs WHERE size IS NOT NULL ORDER BY parent, name")
    print(df.to_string(index=False))

    print("\n== read_files(\"name LIKE '%.txt'\") ==")
    for path, payload in sorted(read_files("name LIKE '%.txt'").items()):
        print(f"{path}: {len(payload)} bytes: {payload[:40]!r}")

    print("\n== take([0, 2], ['parent', 'name', 'chunk_id']) ==")
    print(take([0, 2], ["parent", "name", "chunk_id"]).to_string(index=False))

    n = sql_as_pandas("SELECT count(*) AS n FROM rootfs")["n"][0]
    assert n > 0, "empty rootfs table"
    print(f"\nOK — {n} chunk rows via the parquet handoff, no JVM involved.")
