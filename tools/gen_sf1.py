#!/usr/bin/env python3
"""Deterministic sf1 upsample of the driver's sf0.1 testdata (builder-side
confidence runs only — the driver's own data stays read-only, and this
output lives under /root/repo/tmp, never committed).

Star-schema tables are replicated 10x with dense key offsets (copy k adds
k * |sf0.1 keyspace| to every key column), so all FK joins stay exact and
every distribution is preserved per copy. `documents` and `embeddings` are
generated FRESH from the sf0.1 vocabulary / cluster structure instead of
replicated — naive 10x replication would create 10-cliques of exact
duplicates and quadratic (100x) candidate growth in the dedup/near-dup
query families, which is not what a 10x-larger real corpus looks like.
Dup/near-dup structure is injected at sf0.1-like per-document rates so the
banded candidate sets grow ~linearly, the shape the scale queries must be
judged against.

Usage: python3 tools/gen_sf1.py [out=/root/repo/tmp/testdata/sf1]
Seed is fixed; output is bit-identical across runs.
"""
import os, sys, duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/tmp/testdata/sf1"
COPIES = 10
os.makedirs(OUT, exist_ok=True)

con = duckdb.connect()
con.execute(f"SET threads TO 16")
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SRC}/{t}.parquet')")

K = "(SELECT unnest(range(%d)) AS k) c" % COPIES
# sf0.1 dense keyspace sizes (max key + 1), the per-copy offsets
CUST, ORD, PART, SUPP, USER, EVT = 15000, 150000, 20000, 1000, 1500, 100000


def copy_sql(name, sql):
    con.execute(f"COPY ({sql}) TO '{OUT}/{name}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{OUT}/{name}.parquet'").fetchone()[0]
    print(f"{name}: {n} rows")


copy_sql("region", "SELECT * FROM region")
copy_sql("nation", "SELECT * FROM nation")

copy_sql("customer", f"""
  SELECT c_custkey + c.k*{CUST} AS c_custkey,
         'Customer#' || lpad(CAST(c_custkey + c.k*{CUST} AS VARCHAR), 9, '0') AS c_name,
         c_nationkey, c_acctbal, c_mktsegment
  FROM customer, {K} ORDER BY c_custkey""")

copy_sql("supplier", f"""
  SELECT s_suppkey + c.k*{SUPP} AS s_suppkey,
         'Supplier#' || lpad(CAST(s_suppkey + c.k*{SUPP} AS VARCHAR), 9, '0') AS s_name,
         s_nationkey, s_acctbal
  FROM supplier, {K} ORDER BY s_suppkey""")

copy_sql("part", f"""
  SELECT p_partkey + c.k*{PART} AS p_partkey,
         p_name, p_brand, p_type, p_size,
         round(p_retailprice + c.k*0.01, 2) AS p_retailprice
  FROM part, {K} ORDER BY p_partkey""")

copy_sql("orders", f"""
  SELECT o_orderkey + c.k*{ORD} AS o_orderkey,
         o_custkey + c.k*{CUST} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM orders, {K} ORDER BY o_orderkey""")

copy_sql("lineitem", f"""
  SELECT l_orderkey + c.k*{ORD} AS l_orderkey,
         l_partkey + c.k*{PART} AS l_partkey,
         l_suppkey + c.k*{SUPP} AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM lineitem, {K} ORDER BY l_orderkey, l_linenumber""")

# ts shifted 13s per copy: keeps the 30-day window, avoids 10-deep
# identical-timestamp stacks in the sessionize/as-of queries
copy_sql("events", f"""
  SELECT event_id + c.k*{EVT} AS event_id,
         ts + to_seconds(CAST(c.k*13 AS BIGINT)) AS ts,
         user_id + c.k*{USER} AS user_id,
         event_type, value, props
  FROM events, {K} ORDER BY event_id""")

# ---- documents: fresh generation from the sf0.1 vocabulary ----
rng = np.random.default_rng(420001)
src_docs = con.sql("SELECT text, lang FROM documents ORDER BY doc_id").df()
vocab = sorted({w for t in src_docs["text"] for w in t.split()})
lens = np.array([len(t.split()) for t in src_docs["text"]])
langs, lang_counts = np.unique(src_docs["lang"], return_counts=True)
lang_p = lang_counts / lang_counts.sum()
N_DOC = 5000 * COPIES

texts, doc_langs = [], []
for i in range(N_DOC):
    r = rng.random()
    if r < 0.002 and i > 10:          # exact duplicate of an earlier doc
        j = int(rng.integers(0, i))
        texts.append(texts[j]); doc_langs.append(doc_langs[j])
    elif r < 0.012 and i > 10:        # near-duplicate: few word swaps
        j = int(rng.integers(0, i))
        w = texts[j].split()
        for _ in range(int(rng.integers(1, 4))):
            w[int(rng.integers(0, len(w)))] = vocab[int(rng.integers(0, len(vocab)))]
        texts.append(" ".join(w)); doc_langs.append(doc_langs[j])
    else:
        n = int(lens[int(rng.integers(0, len(lens)))])
        w = [vocab[int(x)] for x in rng.integers(0, len(vocab), n)]
        texts.append(" ".join(w))
        doc_langs.append(str(langs[int(rng.choice(len(langs), p=lang_p))]))

doc_schema = pq.read_schema(f"{SRC}/documents.parquet")
doc_tbl = pa.table({
    "doc_id": pa.array(range(N_DOC), type=pa.int64()),
    "text": pa.array(texts, type=pa.string()),
    "lang": pa.array(doc_langs, type=pa.string()),
    "source": pa.array([f"src{i % 20}" for i in range(N_DOC)], type=pa.string()),
    "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
}).cast(doc_schema)
pq.write_table(doc_tbl, f"{OUT}/documents.parquet")
print(f"documents: {N_DOC} rows ({len(set(texts))} distinct texts)")

# ---- embeddings: fresh unit vectors from the sf0.1 cluster structure ----
emb = con.sql("SELECT embedding, label FROM embeddings ORDER BY vec_id").df()
X = np.stack(emb["embedding"].values).astype(np.float64)
y = emb["label"].values
N_VEC = 2000 * COPIES
cents, spreads = {}, {}
for lab in np.unique(y):
    V = X[y == lab]
    c = V.mean(axis=0)
    cents[lab] = c
    spreads[lab] = (V - c).std()    # per-component residual std

labels = rng.choice(np.unique(y), size=N_VEC)
vecs = np.empty((N_VEC, X.shape[1]), dtype=np.float64)
for i, lab in enumerate(labels):
    if i > 10 and rng.random() < 0.01:  # near-dup pair for the neardup queries
        v = vecs[int(rng.integers(0, i))] + 0.02 * rng.standard_normal(X.shape[1])
    else:
        v = cents[lab] + spreads[lab] * rng.standard_normal(X.shape[1])
    vecs[i] = v / np.linalg.norm(v)

emb_schema = pq.read_schema(f"{SRC}/embeddings.parquet")
emb_tbl = pa.table({
    "vec_id": pa.array(range(N_VEC), type=pa.int64()),
    "embedding": pa.array([row.astype(np.float32) for row in vecs],
                          type=pa.list_(pa.float32())),
    "label": pa.array(labels.astype(np.int32), type=pa.int32()),
}).cast(emb_schema)
pq.write_table(emb_tbl, f"{OUT}/embeddings.parquet")
print(f"embeddings: {N_VEC} rows")

# schema parity check vs sf0.1
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    a = pq.read_schema(f"{SRC}/{t}.parquet")
    b = pq.read_schema(f"{OUT}/{t}.parquet")
    assert [f.name for f in a] == [f.name for f in b], (t, a, b)
    for fa, fb in zip(a, b):
        assert fa.type == fb.type, (t, fa, fb)
print("schema parity: OK")
