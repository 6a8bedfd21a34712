#!/usr/bin/env python3
"""Zipf-skewed join workload for the SCALING.md skew measurement.

NOT driver data — writes inside the repo (gitignored), like gen_sf1.py.

Shape: a 40M-row fact table whose join key is a worst-case skewed
mixture — ONE pathological hot key holding 50% of all rows (the shape a
hash-partitioned join cannot spread: every hot row lands in one task)
over a uniform tail across 2M keys — joined to a 2M-row dim sized well
past the broadcast threshold (~50 MB of strings), so the join genuinely
plans as a shuffle join. A 64-byte INCOMPRESSIBLE payload (md5 hex)
per fact row makes the straggler carry real shuffle bytes — a
compressible payload kept the hot partition under AQE's 256 MB
skewedPartitionThresholdInBytes and hid the skew from both AQE and the
wall-clock.

graft.tools.SkewBench (Test/runMain) runs the three variants over this
data and SCALING.md records the numbers.
"""
import os
import sys

import duckdb
import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/tmp/skew"
N_FACT = 40_000_000
N_DIM = 2_000_000
HOT_FRACTION = 0.5

os.makedirs(OUT, exist_ok=True)
rng = np.random.default_rng(42)

n_hot = int(N_FACT * HOT_FRACTION)
keys = np.concatenate([
    np.zeros(n_hot, dtype=np.int64),
    rng.integers(0, N_DIM, size=N_FACT - n_hot, dtype=np.int64),
])
rng.shuffle(keys)
vals = rng.integers(0, 1_000_000, size=N_FACT, dtype=np.int64)

import pyarrow as pa

con = duckdb.connect()
fact_np = pa.table({"k": keys, "v": vals})
con.register("fact_np", fact_np)
con.sql(f"""
COPY (SELECT k, v,
        md5(CAST(v AS VARCHAR)) || md5(CAST(v + 7 AS VARCHAR)) AS payload
      FROM fact_np)
TO '{OUT}/fact.parquet' (FORMAT PARQUET)""")
con.sql(f"""
COPY (SELECT CAST(range AS BIGINT) AS k,
        md5(CAST(range AS VARCHAR)) AS dim_name,
        CAST(range % 97 AS BIGINT) AS dim_group
      FROM range({N_DIM}))
TO '{OUT}/dim.parquet' (FORMAT PARQUET)""")
for t in ("fact", "dim"):
    n, mb = con.sql(f"SELECT COUNT(*), 0 FROM '{OUT}/{t}.parquet'").fetchone()
    sz = os.path.getsize(f"{OUT}/{t}.parquet") / 1e6
    print(f"{t}: {n} rows, {sz:.1f} MB parquet")
