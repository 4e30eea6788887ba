#!/usr/bin/env python3
"""End-to-end drive of the Python user API (scripts/cdlake.py): create a
dataset from a local tree, query it, random-access rows, reassemble file
bytes, time-travel — all from Python against the graft Spark engine.

Run from the repo root after `sbt compile`:

    python3 scripts/python_api_demo.py
"""
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(__file__))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CLASSES = f"{REPO}/target/scala-2.13/classes"

from pyspark.sql import SparkSession  # noqa: E402
from cdlake import Cdl  # noqa: E402

if not os.path.isdir(CLASSES):
    sys.exit(f"compiled classes not found at {CLASSES} — run `sbt compile`")

spark = (SparkSession.builder.master("local[4]")
         .config("spark.driver.extraClassPath", CLASSES)
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("WARN")

work = tempfile.mkdtemp(prefix="cdlake_demo_")
tree = f"{work}/tree"
os.makedirs(f"{tree}/sub")
with open(f"{tree}/hello.txt", "w") as f:
    f.write("hello from python")
with open(f"{tree}/sub/data.bin", "wb") as f:
    f.write(bytes(range(256)) * 10)  # 2560 bytes -> 3 chunks at 1024

fs = Cdl(spark, max_chunk_size="1024").open(f"{work}/ds")
fs.ingest(tree)

print("== sql (lazy pyspark DataFrame -> pandas) ==")
print(fs.sql_as_pandas(
    "SELECT parent, name, size, chunk_id, len(data) AS n "
    "FROM rootfs ORDER BY parent, name, chunk_id").to_string(index=False))

print("\n== sql_as_polars ==")
try:
    print(fs.sql_as_polars(
        "SELECT parent, count(*) AS n FROM rootfs GROUP BY parent "
        "ORDER BY parent"))
except ImportError as e:
    # this container has no polars wheel (see scripts/README.md);
    # the API degrades loudly, and pandas carries the same query
    print(f"polars unavailable ({e}); sql_as_pandas fallback:")
    print(fs.sql_as_pandas(
        "SELECT parent, count(*) AS n FROM rootfs GROUP BY parent "
        "ORDER BY parent").to_string(index=False))

print("\n== read_dir('/') ==")
print(fs.read_dir("/").select("name", "size").toPandas().to_string(index=False))

print("\n== take([0, 3], ['parent', 'name']) ==")
print(fs.take([0, 3], ["parent", "name"]).orderBy("row_id")
      .toPandas().to_string(index=False))

print("\n== read_files(\"parent = '/sub'\") ==")
files = fs.read_files("parent = '/sub'")
for path, payload in sorted(files.items()):
    print(f"{path}: {len(payload)} bytes (chunks reassembled)")
assert files["/sub/data.bin"] == bytes(range(256)) * 10, "byte round-trip"

print("\n== append + time travel ==")
tree2 = f"{work}/tree2"
os.makedirs(tree2)
with open(f"{tree2}/later.txt", "w") as f:
    f.write("v2")
fs.ingest(tree2)
print("versions:", fs.versions())
print("v1 rows:", fs.table_at(1).count(), "| v2 rows:", fs.table_at(2).count())

print("\n== external handoff ==")
print("table_location:", fs.table_location)
print("storage_options:", fs.storage_options)

print("\n== compact (OPTIMIZE) ==")
# NOTE: invalidates pre-compaction time travel (VACUUM(0) semantics),
# so it runs after the time-travel checks above
nfiles = fs.compact()
print("data files after compact:", nfiles, "| versions:", fs.versions())

n = fs.sql("SELECT count(*) AS n FROM rootfs").collect()[0]["n"]
assert n == 5, n
print(f"\nOK — full Python surface drive: {n} chunk rows, "
      "bytes verified, time travel consistent, compacted layout queried.")
shutil.rmtree(work)
spark.stop()
