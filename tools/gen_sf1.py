#!/usr/bin/env python3
"""Generate a ~sf1 dataset (10x sf0.1) for local scaling measurements.

NOT driver data — writes to an output dir inside the repo (gitignored).
Design: 10 shards, each a key-offset copy of sf0.1, constructed so the
per-shard workload structure is IDENTICAL to sf0.1 and cross-shard
interactions are suppressed; total work then scales linearly by
construction, and any superlinear RUNTIME is an engine bottleneck, not
a data artifact.

 - documents: shard r>0 suffixes every NON-MARKER token with _r, so the
   vocabulary grows with the corpus the way real crawls do. This keeps
   PPJoin/containment token blocks shard-local (block sizes constant →
   candidate volume linear; a shared tiny vocab makes token blocks span
   all shards and candidate generation quadratic — the first generator
   OOM'd q21 that way). Marker stopwords stay unsuffixed so the
   quality/langid gates see the same ratios in every shard. Cross-shard
   replicas share only marker tokens → Jaccard/containment far below
   the 0.9/0.95 thresholds.
 - embeddings: shard r applies a seeded permutation of the 64 dims —
   norms/distributions preserved, within-shard geometry exact, and
   cross-shard cosine de-correlated (no 10x-twin blowup in semantic
   dedup).
 - relational/events tables: plain key offsets (join structure repeats
   per shard); region/nation copied as-is.
"""
import sys
import duckdb
import numpy as np

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/tmp/sf1"
SHARDS = 10

import os
os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()
# match the driver data's parquet timestamp annotation (UTC-adjusted):
# a bare DuckDB TIMESTAMP lands as TIMESTAMP_NTZ in Spark and breaks
# every ts arithmetic expression
con.sql("SET TimeZone='UTC'")

def copy(sql: str, table: str) -> None:
    con.sql(f"COPY ({sql}) TO '{OUT}/{table}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT COUNT(*) FROM '{OUT}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")

shard = f"CROSS JOIN range({SHARDS}) s(r)"

# ---- documents (5k -> 50k) ----
# markers = the engine's langid + stopword lists (kept global)
MARKERS = ("the", "a", "is", "and", "of", "to", "in", "that", "it", "for",
           "der", "die", "und", "das", "ist", "le", "la", "et", "les",
           "est", "el", "los", "y", "es", "las")
marker_sql = ",".join(f"'{m}'" for m in MARKERS)
copy(f"""
WITH base AS (
  SELECT doc_id,
    CASE WHEN r = 0 THEN text
      ELSE array_to_string(list_transform(string_split(text, ' '),
        t -> CASE WHEN t IN ({marker_sql}) THEN t
             ELSE t || '_' || r END), ' ') END AS text,
    lang, source, r
  FROM read_parquet('{SRC}/documents.parquet') {shard})
SELECT doc_id + r * 5000 AS doc_id, text, lang, source,
  length(text) AS n_chars
FROM base
""", "documents")

# ---- embeddings (2k -> 20k), per-shard dim permutation ----
perms = []
for r in range(SHARDS):
    p = np.arange(64) if r == 0 else np.random.RandomState(r).permutation(64)
    perms.append("[" + ",".join(str(int(i) + 1) for i in p) + "]")
perm_case = "CASE r " + " ".join(
    f"WHEN {r} THEN {perms[r]}" for r in range(SHARDS)) + " END"
copy(f"""
SELECT vec_id + r * 2000 AS vec_id,
  CAST(list_transform({perm_case}, i -> embedding[i]) AS FLOAT[]) AS embedding,
  label
FROM read_parquet('{SRC}/embeddings.parquet') {shard}
""", "embeddings")

# ---- events (100k -> 1M) ----
# written via pyarrow: the engine reads the driver's timestamp[ns]
# column as a nanosecond LONG (spark.sql.legacy.parquet.nanosAsLong),
# and DuckDB's parquet writer silently downgrades TIMESTAMP_NS to us
import pyarrow as pa
import pyarrow.parquet as pq
ev = con.sql(f"""
SELECT event_id + r * 100000 AS event_id, CAST(ts AS TIMESTAMP_NS) AS ts,
  user_id + r * 1000000 AS user_id, event_type, value, props
FROM read_parquet('{SRC}/events.parquet') {shard}
""").arrow()
ev = ev.set_column(ev.schema.get_field_index("ts"), "ts",
                   ev.column("ts").cast(pa.timestamp("ns")))
pq.write_table(ev, f"{OUT}/events.parquet")
print(f"events: {ev.num_rows} rows")

# ---- relational ----
copy(f"""
SELECT l_orderkey + r * 1000000 AS l_orderkey,
  l_partkey + r * 100000 AS l_partkey, l_suppkey + r * 10000 AS l_suppkey,
  l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
  l_returnflag, l_linestatus, CAST(l_shipdate AS TIMESTAMP_MS) AS l_shipdate
FROM read_parquet('{SRC}/lineitem.parquet') {shard}
""", "lineitem")
copy(f"""
SELECT o_orderkey + r * 1000000 AS o_orderkey,
  o_custkey + r * 100000 AS o_custkey, o_orderstatus, o_totalprice,
  CAST(o_orderdate AS TIMESTAMP_MS) AS o_orderdate, o_orderpriority
FROM read_parquet('{SRC}/orders.parquet') {shard}
""", "orders")
copy(f"""
SELECT c_custkey + r * 100000 AS c_custkey,
  c_name || '_' || r AS c_name, c_nationkey, c_acctbal, c_mktsegment
FROM read_parquet('{SRC}/customer.parquet') {shard}
""", "customer")
copy(f"""
SELECT p_partkey + r * 100000 AS p_partkey, p_name, p_brand, p_type,
  p_size, p_retailprice
FROM read_parquet('{SRC}/part.parquet') {shard}
""", "part")
copy(f"""
SELECT s_suppkey + r * 10000 AS s_suppkey, s_name || '_' || r AS s_name,
  s_nationkey, s_acctbal
FROM read_parquet('{SRC}/supplier.parquet') {shard}
""", "supplier")
for t in ("region", "nation"):
    copy(f"SELECT * FROM read_parquet('{SRC}/{t}.parquet')", t)
print("done:", OUT)
