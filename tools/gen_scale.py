#!/usr/bin/env python3
"""Synthesize an sf1 dataset (10x the bench scale) for the scaling
curve, outside the read-only /root/testdata tree.

Usage:  python3 tools/gen_scale.py
        (writes .scaledata/sf1/*.parquet under the repo root; override
        with SPARK_GRAFT_SCALE_SRC / SPARK_GRAFT_SCALE_OUT /
        SPARK_GRAFT_SCALE_COPIES)

Construction — 10 deterministic copies of sf0.1, built so per-copy
STRUCTURE matches the source and copies stay decorrelated (a naive
10x clone would make every row a 10-way duplicate and turn the dedup
queries into a degenerate benchmark):

- Relational tables: copy c shifts every key by c * BASE (bases are
  multiples of 10, so doc_id % 10-style split semantics survive), with
  foreign keys shifted consistently — copy c of orders references copy
  c of customer, etc. region/nation stay fixed (dimensions don't scale
  in TPC-H either).
- documents: copy c shuffles each doc's words with a permutation
  seeded by (c, word_count). Unigram statistics are preserved exactly;
  trigram shingles decorrelate across copies; and because near-dup
  docs of EQUAL length get the SAME permutation, the source's
  intra-copy near-dup structure survives (positionwise-permuted docs
  keep their shingle overlap), so dedup outputs scale ~linearly
  instead of collapsing to zero or exploding to all-pairs.
- embeddings: copy c applies one random ORTHOGONAL rotation (QR of a
  seeded gaussian). All intra-copy inner products — hence the entire
  near-dup / top-k geometry — are preserved isometrically; cross-copy
  cosines are ~0, so copies don't alias each other in LSH buckets.

Everything is seeded; two runs produce byte-identical logical content.
"""

from __future__ import annotations

import os
import random
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SRC = os.environ.get("SPARK_GRAFT_SCALE_SRC", "/root/testdata/sf0.1")
OUT = os.environ.get("SPARK_GRAFT_SCALE_OUT", os.path.join(REPO, ".scaledata", "sf1"))
COPIES = int(os.environ.get("SPARK_GRAFT_SCALE_COPIES", "10"))

# Key offsets per copy (all multiples of 10; comfortably above the
# sf0.1 max of each key domain).
#
# CUST_BASE must ALSO clear the wiki fixture's QID namespaces: the
# wiki-slice queries derive customer QIDs as Q(100000 + c_custkey)
# (queries/wiki_slice.py), and the fixture packs its non-customer
# entities into fixed numeric ranges (categories Q300000+, specials
# Q370000+, types Q400000–Q500004, lists Q600000+, plus the Wikidata
# constants Q4167836/Q13406463). With the original 100_000 offset,
# copy ≥ 2 customers produced QIDs inside the category range
# (custkey 200031 → Q300031), fanning out the engine's qrank join
# where the oracle's arithmetic rank derivation has no join — the
# four wiki/rollup mismatches in the first sf1 sweep. 10_000_000 puts
# every shifted customer QID (≥ Q10,100,001) above every fixed
# namespace for any copy count, and copy-0 keys (≤ 15000) stay below
# them, so the fixture's namespace-disjointness invariant holds at
# every scale.
CUST_BASE = 10_000_000
SUPP_BASE = 100_000
PART_BASE = 100_000
ORDER_BASE = 1_000_000
EVENT_BASE = 1_000_000
USER_BASE = 10_000
DOC_BASE = 100_000
VEC_BASE = 100_000


def _copy_sql(con: duckdb.DuckDBPyConnection, table: str, select: str) -> None:
    src = f"{SRC}/{table}.parquet"
    dst = f"{OUT}/{table}.parquet"
    con.sql(
        f"""
        COPY (
          SELECT {select}
          FROM '{src}' CROSS JOIN (SELECT unnest(range({COPIES})) AS c)
          ORDER BY c
        ) TO '{dst}' (FORMAT PARQUET)
        """
    )
    n = con.sql(f"SELECT COUNT(*) FROM '{dst}'").fetchone()[0]
    print(f"{table}: {n} rows")


def _dims(con: duckdb.DuckDBPyConnection) -> None:
    for t in ("region", "nation"):
        con.sql(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: copied")


def _documents() -> None:
    tbl = pq.read_table(f"{SRC}/documents.parquet")
    doc_id = tbl.column("doc_id").to_pylist()
    text = tbl.column("text").to_pylist()
    lang = tbl.column("lang").to_pylist()
    source = tbl.column("source").to_pylist()
    perms: dict[tuple[int, int], list[int]] = {}

    def permute(c: int, words: list[str]) -> list[str]:
        key = (c, len(words))
        p = perms.get(key)
        if p is None:
            rng = random.Random(c * 1_000_003 + len(words))
            p = list(range(len(words)))
            rng.shuffle(p)
            perms[key] = p
        return [words[i] for i in p]

    ids, texts, langs, sources, n_chars = [], [], [], [], []
    for c in range(COPIES):
        for d, t, lg, s in zip(doc_id, text, lang, source):
            nt = t if c == 0 else " ".join(permute(c, t.split(" ")))
            ids.append(d + c * DOC_BASE)
            texts.append(nt)
            langs.append(lg)
            sources.append(s)
            n_chars.append(len(nt))
    out = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array(n_chars, pa.int64()),
        }
    )
    pq.write_table(out, f"{OUT}/documents.parquet")
    print(f"documents: {out.num_rows} rows")


def _embeddings() -> None:
    tbl = pq.read_table(f"{SRC}/embeddings.parquet")
    vec_id = np.asarray(tbl.column("vec_id").to_pylist(), dtype=np.int64)
    emb = np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float64)
    label = np.asarray(tbl.column("label").to_pylist(), dtype=np.int32)
    dim = emb.shape[1]
    ids, vecs, labels = [], [], []
    for c in range(COPIES):
        if c == 0:
            rotated = emb
        else:
            rs = np.random.RandomState(c)
            q, r = np.linalg.qr(rs.normal(size=(dim, dim)))
            q *= np.sign(np.diag(r))  # canonical, fully determined Q
            rotated = emb @ q
        ids.append(vec_id + c * VEC_BASE)
        vecs.append(rotated.astype(np.float32))
        labels.append(label)
    all_vecs = np.concatenate(vecs)
    out = pa.table(
        {
            "vec_id": pa.array(np.concatenate(ids), pa.int64()),
            "embedding": pa.array(list(all_vecs), pa.list_(pa.float32())),
            "label": pa.array(np.concatenate(labels), pa.int32()),
        }
    )
    pq.write_table(out, f"{OUT}/embeddings.parquet")
    print(f"embeddings: {out.num_rows} rows")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    _dims(con)
    _copy_sql(
        con,
        "customer",
        f"c_custkey + c*{CUST_BASE} AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment",
    )
    _copy_sql(con, "supplier", f"s_suppkey + c*{SUPP_BASE} AS s_suppkey, s_name, s_nationkey, s_acctbal")
    _copy_sql(
        con,
        "part",
        f"p_partkey + c*{PART_BASE} AS p_partkey, p_name, p_brand, p_type, p_size, p_retailprice",
    )
    _copy_sql(
        con,
        "orders",
        f"o_orderkey + c*{ORDER_BASE} AS o_orderkey, o_custkey + c*{CUST_BASE} AS o_custkey, "
        "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority",
    )
    _copy_sql(
        con,
        "lineitem",
        f"l_orderkey + c*{ORDER_BASE} AS l_orderkey, l_partkey + c*{PART_BASE} AS l_partkey, "
        f"l_suppkey + c*{SUPP_BASE} AS l_suppkey, l_linenumber, l_quantity, l_extendedprice, "
        "l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate",
    )
    _copy_sql(
        con,
        "events",
        f"event_id + c*{EVENT_BASE} AS event_id, ts, user_id + c*{USER_BASE} AS user_id, "
        "event_type, value, props",
    )
    _documents()
    _embeddings()
    print(f"wrote {OUT}")


if __name__ == "__main__":
    sys.exit(main())
