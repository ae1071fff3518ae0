#!/usr/bin/env python3
"""Build a tier copy whose events.parquet is a multi-file DIRECTORY.

The driver tiers ship events as ONE parquet file, so a file-source
streaming query can never form more than one micro-batch (the file is
the batching unit). The bench's multi-micro-batch smoke (VERDICT r12
mandate #7) needs >= 3 batches to exercise watermark finalization
across batch boundaries, so this slices the events table into N files
under <out>/events.parquet/ (pyarrow preserves the physical schema,
including the ts timestamp type, so graft.util.Tables.normalizeTs
behaves identically on slices and original).

Usage: make_stream_slices.py <sfDir> <outDir> [nSlices=8]
"""
import os
import sys

import pyarrow.parquet as pq


def main():
    sf_dir, out = sys.argv[1], sys.argv[2]
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    t = pq.read_table(f"{sf_dir}/events.parquet")
    d = os.path.join(out, "events.parquet")
    os.makedirs(d, exist_ok=True)
    rows = t.num_rows
    step = (rows + n - 1) // n
    for i in range(n):
        sl = t.slice(i * step, step)
        if sl.num_rows == 0:
            break
        pq.write_table(sl, os.path.join(d, f"part-{i:04d}.parquet"))
    print(f"{d}: {rows} rows -> {min(n, (rows + step - 1) // step)} slices")


if __name__ == "__main__":
    main()
