"""Merge freshly measured rows into benchmark/artifacts/all.csv in place.

The muse_perf orchestrator APPENDS rows and skips cases already present, so
re-measuring an existing case (e.g. after a kernel lands) goes through a side
CSV: run `muse_perf.py --out /tmp/new_rows.csv --no-published`, then merge
with this script.  Rows match on (model, resolution, batch_size, timesteps);
a matching measured row is REPLACED in place (preserving row order, so diffs
stay reviewable), a new case is appended before the published rows.
Published-baseline rows (device contains "published") are never touched.

Usage: python scripts/merge_allcsv_rows.py NEW_ROWS.csv [NEW_ROWS2.csv ...]
                                           [--allcsv PATH]
"""

from __future__ import annotations

import argparse
import csv
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_ALLCSV = os.path.join(REPO, "benchmark", "artifacts", "all.csv")


def _key(row):
    return (row["model"], str(row["resolution"]), str(row["batch_size"]),
            str(row["timesteps"]))


def merge(allcsv_path: str, new_paths: list[str]) -> tuple[int, int]:
    new_rows: dict[tuple, dict] = {}
    for path in new_paths:
        with open(path) as f:
            for row in csv.DictReader(f):
                if "published" in row.get("device", ""):
                    continue
                new_rows[_key(row)] = row

    with open(allcsv_path) as f:
        reader = csv.DictReader(f)
        fields = reader.fieldnames
        rows = list(reader)

    replaced = 0
    for i, row in enumerate(rows):
        key = _key(row)
        if key in new_rows and "published" not in row.get("device", ""):
            rows[i] = new_rows.pop(key)
            replaced += 1

    # Append any genuinely new cases before the first published row so the
    # measured block stays contiguous.
    appended = len(new_rows)
    if new_rows:
        first_pub = next((i for i, r in enumerate(rows)
                          if "published" in r.get("device", "")), len(rows))
        rows[first_pub:first_pub] = list(new_rows.values())

    # Schema drift in the new rows (a future muse_perf column) must fail
    # BEFORE the tracked artifact is opened for writing; and the write itself
    # goes through a temp file + atomic rename so a mid-write crash can never
    # leave all.csv truncated (advisor round-4).
    for row in rows:
        extra = set(row) - set(fields)
        if extra:
            raise SystemExit(
                f"new rows carry columns absent from {allcsv_path}: "
                f"{sorted(extra)} — regenerate all.csv or extend its header")
    tmp_path = allcsv_path + ".tmp"
    with open(tmp_path, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=fields)
        writer.writeheader()
        writer.writerows(rows)
    os.replace(tmp_path, allcsv_path)
    return replaced, appended


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("new_csvs", nargs="+")
    parser.add_argument("--allcsv", default=DEFAULT_ALLCSV)
    args = parser.parse_args(argv)
    replaced, appended = merge(args.allcsv, args.new_csvs)
    print(f"merged into {args.allcsv}: {replaced} replaced, "
          f"{appended} appended")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
