#!/usr/bin/env python3
"""Deterministic sf1.0 synthesis: scale the driver's read-only sf0.1
tables 10x for the large-sf operator-suite bench row.

Method (seedless — every byte is a pure function of the sf0.1 input,
so repeated runs are byte-identical and counts are reproducible across
core counts):

  * fact/dim tables that scale with sf (customer supplier part orders
    lineitem events documents embeddings): 10 replicas, replica 0
    verbatim, replicas 1-9 with entity keys shifted by
    replica * (max_parent_key + 1) — foreign keys shift by the SAME
    parent offset, so join fan-outs per key are IDENTICAL to sf0.1
    and query outputs grow linearly by construction.
  * region/nation: fixed dims (as in TPC-H), copied verbatim.
  * documents.text: replicas r > 0 suffix EVERY word form with
    'x<r>'.  The mutation is a bijection on word forms keyed on the
    word itself, not its position, so WITHIN a replica the corpus's
    duplicate structure is preserved EXACTLY (shared text mutates
    identically in both members; set-Jaccard, exact-text equality,
    and k-gram identity are all invariant under a word-form
    bijection); ACROSS replicas ZERO word forms coincide, so every
    word/k-gram-keyed pair op (exact, minhash, jaccard, winnowing,
    duplicate spans, simhash bands) contributes 0 cross-replica
    pairs.  Output pair counts are therefore linear by construction
    — 10 disjoint copies of the sf0.1 pair structure.  (An earlier
    ~1/3-of-forms mutation left (4/9)^k k-gram coincidence, which
    RATIO-thresholded ops ignore but ABSOLUTE-count ops — winnowing
    min_shared, duplicate-substring spans, short-doc exact dupes —
    turned into 3-13x superlinear row inflation at sf1.0.)
  * embeddings.embedding: replica r rolls the vector by r positions —
    norms and coordinate distributions preserved, cross-replica
    nearest-neighbor collisions broken.

Output: /root/repo/.bench/sf1.0/<table>.parquet
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.bench/sf1.0"
REPLICAS = int(os.environ.get("SF1_REPLICAS", "10"))


def _offsets(con) -> dict[str, int]:
    """Per-entity key offsets = max parent key + 1 (children shift by
    the parent's offset so referential structure is replica-local)."""
    q = lambda s: con.sql(s).fetchone()[0]
    return {
        "cust": q(f"SELECT MAX(c_custkey)+1 FROM '{SRC}/customer.parquet'"),
        "supp": q(f"SELECT MAX(s_suppkey)+1 FROM '{SRC}/supplier.parquet'"),
        "part": q(f"SELECT MAX(p_partkey)+1 FROM '{SRC}/part.parquet'"),
        "ord": q(f"SELECT MAX(o_orderkey)+1 FROM '{SRC}/orders.parquet'"),
        "event": q(f"SELECT MAX(event_id)+1 FROM '{SRC}/events.parquet'"),
        "user": q(f"SELECT MAX(user_id)+1 FROM '{SRC}/events.parquet'"),
        "doc": q(f"SELECT MAX(doc_id)+1 FROM '{SRC}/documents.parquet'"),
        "vec": q(f"SELECT MAX(vec_id)+1 FROM '{SRC}/embeddings.parquet'"),
    }


def _sql_replicate(con, table: str, shifted: dict[str, str]) -> None:
    """10 replicas via a range cross join; ``shifted`` maps column ->
    offset expression multiplied by the replica index r."""
    cols = [r[0] for r in con.sql(
        f"DESCRIBE SELECT * FROM '{SRC}/{table}.parquet'").fetchall()]
    sel = ", ".join(
        f"{c} + r * {shifted[c]} AS {c}" if c in shifted else c
        for c in cols)
    con.sql(
        f"COPY (SELECT {sel} FROM '{SRC}/{table}.parquet', "
        f"range({REPLICAS}) t(r) ORDER BY r) "
        f"TO '{DST}/{table}.parquet' (FORMAT PARQUET)")


def _mutate_text(text: str, r: int) -> str:
    if r == 0:
        return text
    return " ".join(f"{w}x{r}" for w in text.split(" "))


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    off = _offsets(con)

    for t in ("region", "nation"):
        con.sql(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
                f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    _sql_replicate(con, "customer", {"c_custkey": off["cust"]})
    _sql_replicate(con, "supplier", {"s_suppkey": off["supp"]})
    _sql_replicate(con, "part", {"p_partkey": off["part"]})
    _sql_replicate(con, "orders", {"o_orderkey": off["ord"],
                                   "o_custkey": off["cust"]})
    _sql_replicate(con, "lineitem", {"l_orderkey": off["ord"],
                                     "l_partkey": off["part"],
                                     "l_suppkey": off["supp"]})
    _sql_replicate(con, "events", {"event_id": off["event"],
                                   "user_id": off["user"]})

    docs = con.sql(f"SELECT * FROM '{SRC}/documents.parquet'").df()
    parts = []
    for r in range(REPLICAS):
        d = docs.copy()
        d["doc_id"] = d["doc_id"] + r * off["doc"]
        if r:
            d["text"] = [_mutate_text(t, r) for t in d["text"]]
            d["n_chars"] = d["text"].str.len().astype(docs["n_chars"].dtype)
        parts.append(d)
    all_docs = pd.concat(parts, ignore_index=True)
    con.register("docs1", all_docs)
    con.sql(f"COPY (SELECT * FROM docs1) TO '{DST}/documents.parquet' "
            f"(FORMAT PARQUET)")

    emb = con.sql(f"SELECT * FROM '{SRC}/embeddings.parquet'").df()
    parts = []
    for r in range(REPLICAS):
        e = emb.copy()
        e["vec_id"] = e["vec_id"] + r * off["vec"]
        if r:
            e["embedding"] = [np.roll(np.asarray(v), r).tolist()
                              for v in emb["embedding"]]
        parts.append(e)
    all_emb = pd.concat(parts, ignore_index=True)
    con.register("emb1", all_emb)
    # preserve the float32 element type of the source column
    con.sql(f"COPY (SELECT vec_id, CAST(embedding AS FLOAT[]) AS embedding,"
            f" label FROM emb1) TO '{DST}/embeddings.parquet' "
            f"(FORMAT PARQUET)")

    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        n = con.sql(f"SELECT COUNT(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n}")


if __name__ == "__main__":
    main()
