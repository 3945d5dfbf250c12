#!/usr/bin/env python3
"""Synthesize an sf1-scale dataset at /tmp/sf1 from /root/testdata/sf0.1.

10 deterministic copies of each fact table with disjoint key ranges
(copy 0 is the identity, so planted relationships in the source data are
preserved). Dimension tables (region, nation) keep their TPC-H-fixed
size. events.parquet is copied byte-for-byte to preserve its
TIMESTAMP(NANOS) physical type.

Text copies replace every 3rd token with a copy-specific marker so
cross-copy documents are NOT near-duplicates (organic Jaccard stays far
below the 0.7 LSH threshold); embedding copies get a smooth
deterministic perturbation so no two vectors tie in cosine.

Purely local tooling for the SCALE.md experiment — not part of the
library, and does not touch /root/testdata.
"""
import os
import shutil
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
# copies of sf0.1 (10 = sf1, 30 = sf3, ...) — for scaling-curve probes
K = int(sys.argv[2]) if len(sys.argv) > 2 else 10

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()

def copy_identity(name):
    shutil.copyfile(f"{SRC}/{name}.parquet", f"{DST}/{name}.parquet")
    print(f"{name}: copied unchanged")

def scale_sql(name, select_for_k):
    parts = [select_for_k(k) for k in range(K)]
    sql = " UNION ALL ".join(parts)
    con.execute(f"COPY ({sql}) TO '{DST}/{name}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{DST}/{name}.parquet'").fetchone()[0]
    print(f"{name}: {n} rows")

copy_identity("region")
copy_identity("nation")
copy_identity("events")  # preserves TIMESTAMP(NANOS) for the streaming reads

scale_sql("customer", lambda k: f"""
  SELECT c_custkey + {k}*1000000 AS c_custkey, c_name, c_nationkey,
         c_acctbal, c_mktsegment
  FROM '{SRC}/customer.parquet'""")

scale_sql("supplier", lambda k: f"""
  SELECT s_suppkey + {k}*100000 AS s_suppkey, s_name, s_nationkey, s_acctbal
  FROM '{SRC}/supplier.parquet'""")

scale_sql("part", lambda k: f"""
  SELECT p_partkey + {k}*1000000 AS p_partkey, p_name, p_brand, p_type,
         p_size, p_retailprice
  FROM '{SRC}/part.parquet'""")

scale_sql("orders", lambda k: f"""
  SELECT o_orderkey + {k}*10000000 AS o_orderkey,
         o_custkey + {k}*1000000 AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM '{SRC}/orders.parquet'""")

scale_sql("lineitem", lambda k: f"""
  SELECT l_orderkey + {k}*10000000 AS l_orderkey,
         l_partkey + {k}*1000000 AS l_partkey,
         l_suppkey + {k}*100000 AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM '{SRC}/lineitem.parquet'""")

# ---- documents: token-marker perturbation per copy (python side)
docs = pq.read_table(f"{SRC}/documents.parquet").to_pydict()
out = {c: [] for c in ["doc_id", "text", "lang", "source", "n_chars"]}
for k in range(K):
    for i in range(len(docs["doc_id"])):
        did = docs["doc_id"][i]
        text = docs["text"][i]
        if k > 0:
            toks = text.split()
            for j in range(0, len(toks), 3):
                toks[j] = f"z{k}q{(j * 7 + k) % 97}"
            text = " ".join(toks)
        out["doc_id"].append(did + k * 10000000)
        out["text"].append(text)
        out["lang"].append(docs["lang"][i])
        out["source"].append(docs["source"][i])
        out["n_chars"].append(len(text))
pq.write_table(pa.table({
    "doc_id": pa.array(out["doc_id"], pa.int64()),
    "text": pa.array(out["text"], pa.string()),
    "lang": pa.array(out["lang"], pa.string()),
    "source": pa.array(out["source"], pa.string()),
    "n_chars": pa.array(out["n_chars"], pa.int64()),
}), f"{DST}/documents.parquet")
print(f"documents: {len(out['doc_id'])} rows")

# ---- embeddings: strong seeded-Gaussian perturbation per copy, so copies
# of the same source vector are NOT near-duplicates of each other (the
# corpus invariant e39 documents: no organic pair reaches cosine 0.99).
# |perturbation| ~ 2 against unit vectors -> cross-copy cosine ~ 0.2.
emb = pq.read_table(f"{SRC}/embeddings.parquet").to_pydict()
dim = len(emb["embedding"][0])
nv = len(emb["vec_id"])
ids, vecs, labels = [], [], []
for k in range(K):
    pert = (np.random.default_rng(k).normal(0.0, 0.25, size=(nv, dim))
            if k > 0 else np.zeros((nv, dim)))
    for i in range(nv):
        vid = emb["vec_id"][i]
        v = np.asarray(emb["embedding"][i], dtype=np.float32)
        if k > 0:
            v = (v + pert[i]).astype(np.float32)
            v = (v / np.linalg.norm(v)).astype(np.float32)
        ids.append(vid + k * 10000000)
        vecs.append(v.tolist())
        labels.append(emb["label"][i])
pq.write_table(pa.table({
    "vec_id": pa.array(ids, pa.int64()),
    "embedding": pa.array(vecs, pa.list_(pa.float32())),
    "label": pa.array(labels, pa.int32()),
}), f"{DST}/embeddings.parquet")
print(f"embeddings: {len(ids)} rows")
print("done:", DST)
