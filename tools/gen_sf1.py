#!/usr/bin/env python3
"""Generate an sf1 tier (10x sf0.1) for LOCAL performance measurement.

/root/testdata is driver-owned and read-only, so sf1 lives under the
repo at testdata_sf1/ (gitignored). Facts and dims scale by 10
key-shifted copies with CONSISTENT strides (every reference to an
entity's key shifts by the same amount), so join selectivities and
group cardinalities scale the way a real 10x table would:

  - orders/lineitem/customer/supplier/part/events: pure key shifts;
  - documents: shifted doc_id plus a per-copy TEXT REWRITE
    (deterministic rotation + token substitution over the same
    31-word vocabulary) - a verbatim copy would make every document a
    10-way near-duplicate and degenerate the dedup workload;
  - embeddings: shifted vec_id plus seeded Gaussian noise.

Deterministic (seed fixed); region/nation stay unscaled (TPC-H rule).
Bench-tier only: the DuckDB correctness oracle keeps running at
sf0.01 against the driver's own tables.
"""
import os
import random

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "testdata_sf1")
COPIES = 10
SEED = 20260815

con = duckdb.connect()


def stride(table, col):
    return con.sql(
        f"SELECT max({col}) + 1 FROM '{SRC}/{table}.parquet'").fetchone()[0]


def scale_keyed(table, shifts):
    """Union COPIES key-shifted copies; `shifts` maps column -> stride."""
    cols = con.sql(
        f"DESCRIBE SELECT * FROM '{SRC}/{table}.parquet'").df()
    parts = []
    for i in range(COPIES):
        exprs = []
        for c in cols.column_name:
            if c in shifts and i > 0:
                exprs.append(f"{c} + {i * shifts[c]} AS {c}")
            else:
                exprs.append(c)
        parts.append(f"SELECT {', '.join(exprs)} FROM '{SRC}/{table}.parquet'")
    q = " UNION ALL ".join(parts)
    con.sql(f"COPY ({q}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{DST}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")


def main():
    os.makedirs(DST, exist_ok=True)

    ok = stride("orders", "o_orderkey")
    ck = stride("customer", "c_custkey")
    pk = stride("part", "p_partkey")
    sk = stride("supplier", "s_suppkey")
    ek = stride("events", "event_id")
    dk = stride("documents", "doc_id")
    vk = stride("embeddings", "vec_id")

    for t in ("region", "nation"):
        con.sql(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
                f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: copied unscaled")

    scale_keyed("customer", {"c_custkey": ck})
    scale_keyed("supplier", {"s_suppkey": sk})
    scale_keyed("part", {"p_partkey": pk})
    scale_keyed("orders", {"o_orderkey": ok, "o_custkey": ck})
    scale_keyed("lineitem",
                {"l_orderkey": ok, "l_partkey": pk, "l_suppkey": sk})
    # events.user_id references c_custkey (st3's join) - same stride
    scale_keyed("events", {"event_id": ek, "user_id": ck})

    # documents: rewrite text per copy so copies are NOT near-dups
    docs = con.sql(f"SELECT * FROM '{SRC}/{t}.parquet'".replace(
        f"{t}", "documents")).df()
    vocab = sorted({w for t_ in docs.text for w in t_.split(" ")})
    out = {k: [] for k in ("doc_id", "text", "lang", "source", "n_chars")}
    for i in range(COPIES):
        rnd = random.Random(SEED + i)
        for row in docs.itertuples(index=False):
            if i == 0:
                text = row.text
            else:
                toks = row.text.split(" ")
                # rotate by a copy-and-doc-seeded offset, then replace
                # ~15% of tokens - same vocabulary, same length, but
                # the shingle n-grams diverge enough that cross-copy
                # Jaccard sits far below any dedup threshold
                off = rnd.randrange(1, max(2, len(toks)))
                toks = toks[off:] + toks[:off]
                for j in range(len(toks)):
                    if rnd.random() < 0.15:
                        toks[j] = vocab[rnd.randrange(len(vocab))]
                text = " ".join(toks)
            out["doc_id"].append(row.doc_id + i * dk)
            out["text"].append(text)
            out["lang"].append(row.lang)
            out["source"].append(row.source)
            out["n_chars"].append(len(text))
    pq.write_table(pa.table({
        "doc_id": pa.array(out["doc_id"], pa.int64()),
        "text": pa.array(out["text"], pa.string()),
        "lang": pa.array(out["lang"], pa.string()),
        "source": pa.array(out["source"], pa.string()),
        "n_chars": pa.array(out["n_chars"], pa.int64()),
    }), f"{DST}/documents.parquet")
    n = con.sql(
        f"SELECT count(*) FROM '{DST}/documents.parquet'").fetchone()[0]
    print(f"documents: {n} rows")

    # embeddings: seeded noise per copy (keeps norm scale and label mix)
    emb = con.sql(f"SELECT * FROM '{SRC}/embeddings.parquet'").df()
    mat = np.stack(emb.embedding.values).astype(np.float32)
    ids, vecs, labels = [], [], []
    rng = np.random.default_rng(SEED)
    for i in range(COPIES):
        noisy = mat if i == 0 else (
            mat + rng.normal(0, 0.05, mat.shape).astype(np.float32))
        ids.append(emb.vec_id.values + i * vk)
        vecs.append(noisy)
        labels.append(emb.label.values)
    allv = np.concatenate(vecs)
    pq.write_table(pa.table({
        "vec_id": pa.array(np.concatenate(ids), pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(allv.reshape(-1), pa.float32()), allv.shape[1]).cast(
            pa.list_(pa.float32())),
        "label": pa.array(np.concatenate(labels), pa.int32()),
    }), f"{DST}/embeddings.parquet")
    n = con.sql(
        f"SELECT count(*) FROM '{DST}/embeddings.parquet'").fetchone()[0]
    print(f"embeddings: {n} rows")


if __name__ == "__main__":
    main()
