#!/usr/bin/env python3
"""Collate OrchestrationBench per-run JSON files into one CSV.

Parity with the reference's results tabulation (benchmark/to_csv.py):
read every ``*.json`` in the output directory (sorted by name), build
one row per file, and write ``<last-file-stem>.csv`` next to them. The
reference uses a pandas DataFrame; the observable contract is the same
with the stdlib — an index column, the union of keys as the header (in
first-seen order, matching DataFrame column inference over a list of
dicts), empty cells where a run lacks a key. One deliberate
divergence: the reference drops the CSV in the process CWD
(``f'{files[-1].name[:-5]}.csv'``); we write it next to the JSONs so
the artifact stays with the run it tabulates.

Usage: ``python3 scripts/to_csv.py [output_dir]`` (default ``./outputs``).
"""

import csv
import json
import sys
from pathlib import Path
from typing import Optional


def main(output_dir: Path) -> Optional[Path]:
    """Returns the written CSV path, or None when there is nothing to
    collate (no per-run JSON files in the directory)."""
    if not output_dir.is_dir():
        raise FileNotFoundError('No output directory')

    # filter non-files BEFORE choosing the name source: a directory
    # named `*.json` must neither contribute a row nor name the CSV
    files = [f for f in sorted(output_dir.glob('*.json')) if f.is_file()]
    if not files:
        return None

    rows = [json.loads(file.read_text()) for file in files]

    # union of keys in first-seen order = pandas' column inference
    header = []
    for row in rows:
        for key in row:
            if key not in header:
                header.append(key)

    out = output_dir / f'{files[-1].stem}.csv'
    with out.open('w', newline='') as fp:
        w = csv.writer(fp)
        w.writerow([''] + header)
        for i, row in enumerate(rows):
            w.writerow([i] + [row.get(k, '') for k in header])
    return out


if __name__ == '__main__':
    out = main(Path(sys.argv[1]) if len(sys.argv) > 1 else Path('./outputs'))
    if out:
        print(out)
