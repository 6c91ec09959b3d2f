"""Deterministic schema-compatible test-data synthesizer.

The driver provisions `/root/testdata/sf*` in this sandbox; outside it
(CI, a laptop) the oracle gate still needs the same ten tables. The
gate is SELF-RELATIVE — `tools/check_correctness.py` runs the Spark
query and its DuckDB twin over the SAME parquet and compares — so any
deterministic data with the right schemas exercises it fully. Schemas
mirror the driver's exactly (verified against `/root/testdata`);
seed-42 numpy, no RNG state leaks between tables.

Usage: python tools/gen_testdata.py <out_dir> [sf]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

EPOCH = np.datetime64("2024-01-01T00:00:00", "us")

WORDS = (
    "the of and to in is was for with that conversation model tool "
    "data stream event table merge spark json pointer capture turn "
    "le la et les des une pour avec dans est"
).split()


def _rng(name: str) -> np.random.Generator:
    return np.random.default_rng(abs(hash(("spark-graft", name, 42))) % 2**32)


def _ts(rng, n, span_days=30):
    return EPOCH + (rng.integers(0, span_days * 86400_000_000, n)).astype(
        "timedelta64[us]"
    )


def gen(out_dir: str, sf: float) -> None:
    os.makedirs(out_dir, exist_ok=True)
    k = sf / 0.001  # scale relative to the smallest tier

    def write(name, **cols):
        pq.write_table(pa.table(cols), os.path.join(out_dir, f"{name}.parquet"))

    r = _rng("region")
    write("region", r_regionkey=pa.array(range(5), pa.int32()),
          r_name=[f"REGION_{i}" for i in range(5)])
    write("nation", n_nationkey=pa.array(range(25), pa.int32()),
          n_name=[f"NATION_{i}" for i in range(25)],
          n_regionkey=pa.array([i % 5 for i in range(25)], pa.int32()))

    n = int(150 * k); r = _rng("customer")
    write("customer", c_custkey=np.arange(n, dtype=np.int64),
          c_name=[f"Customer#{i:09d}" for i in range(n)],
          c_nationkey=pa.array(r.integers(0, 25, n), pa.int32()),
          c_acctbal=np.round(r.uniform(-999, 9999, n), 2),
          c_mktsegment=np.array(["BUILDING", "AUTOMOBILE", "MACHINERY",
                                 "HOUSEHOLD", "FURNITURE"])[r.integers(0, 5, n)])

    n = max(int(10 * k), 10); r = _rng("supplier")
    write("supplier", s_suppkey=np.arange(n, dtype=np.int64),
          s_name=[f"Supplier#{i:09d}" for i in range(n)],
          s_nationkey=pa.array(r.integers(0, 25, n), pa.int32()),
          s_acctbal=np.round(r.uniform(-999, 9999, n), 2))

    n = int(200 * k); r = _rng("part")
    write("part", p_partkey=np.arange(n, dtype=np.int64),
          p_name=[f"part {i} {WORDS[i % len(WORDS)]}" for i in range(n)],
          p_brand=[f"Brand#{i % 5}{i % 4}" for i in range(n)],
          p_type=[f"TYPE {i % 7}" for i in range(n)],
          p_size=pa.array(r.integers(1, 50, n), pa.int32()),
          p_retailprice=np.round(r.uniform(900, 2000, n), 2))

    n_ord = int(1500 * k); r = _rng("orders")
    write("orders", o_orderkey=np.arange(n_ord, dtype=np.int64),
          o_custkey=r.integers(0, max(int(150 * k), 1), n_ord),
          o_orderstatus=np.array(["O", "F", "P"])[r.integers(0, 3, n_ord)],
          o_totalprice=np.round(r.uniform(1000, 400000, n_ord), 2),
          o_orderdate=_ts(r, n_ord, 365),
          o_orderpriority=np.array(["1-URGENT", "2-HIGH", "3-MEDIUM",
                                    "4-NOT SPECIFIED", "5-LOW"])[r.integers(0, 5, n_ord)])

    n = int(6000 * k); r = _rng("lineitem")
    write("lineitem", l_orderkey=r.integers(0, n_ord, n),
          l_partkey=r.integers(0, max(int(200 * k), 1), n),
          l_suppkey=r.integers(0, max(int(10 * k), 10), n),
          l_linenumber=pa.array(r.integers(1, 8, n), pa.int32()),
          l_quantity=np.round(r.uniform(1, 50, n), 0),
          l_extendedprice=np.round(r.uniform(900, 100000, n), 2),
          l_discount=np.round(r.uniform(0, 0.1, n), 2),
          l_tax=np.round(r.uniform(0, 0.08, n), 2),
          l_returnflag=np.array(["A", "N", "R"])[r.integers(0, 3, n)],
          l_linestatus=np.array(["O", "F"])[r.integers(0, 2, n)],
          l_shipdate=_ts(r, n, 365))

    # events: the CDC-derived stream source. event_id is the binlog
    # position (dense, unique), props a tiny JSON doc (capture input).
    n = int(1000 * k); r = _rng("events")
    write("events", event_id=np.arange(n, dtype=np.int64),
          ts=_ts(r, n),
          user_id=r.zipf(1.5, n).astype(np.int64) % max(n // 20, 5),
          event_type=np.array(["click", "view", "purchase", "signup",
                               "error"])[r.integers(0, 5, n)],
          # 2 decimals: the derived-CDC envelope applies ROUND(value, 2)
          # in both engines, and Spark rounds HALF_UP while DuckDB
          # rounds half-to-even — keep values off the .xx5 boundary so
          # the round is an identity in both (driver data shares this
          # property)
          value=np.round(r.uniform(0, 120, n), 2),
          props=[f'{{"k": {int(v)}}}' for v in r.integers(0, 100, n)])

    # documents: fixed-size corpus (dedup/text/PII operators); ~8%
    # exact dups, shared shingles for near-dup candidates.
    n = 500; r = _rng("documents")
    texts = []
    for i in range(n):
        w = r.integers(0, len(WORDS), 30 + int(r.integers(0, 120)))
        t = " ".join(WORDS[j] for j in w)
        texts.append(t)
    for i in range(0, n, 13):  # exact dups
        texts[i] = texts[(i + 7) % n]
    write("documents", doc_id=np.arange(n, dtype=np.int64), text=texts,
          lang=np.array(["en", "fr", "de", "ja"])[r.integers(0, 4, n)],
          source=np.array(["web", "chat", "wiki"])[r.integers(0, 3, n)],
          n_chars=np.array([len(t) for t in texts], dtype=np.int64))

    # embeddings: 64-dim float vectors with cluster structure.
    n, dim = 500, 64; r = _rng("embeddings")
    centers = r.normal(0, 1, (8, dim))
    labels = r.integers(0, 8, n)
    vecs = centers[labels] + r.normal(0, 0.3, (n, dim))
    write("embeddings", vec_id=np.arange(n, dtype=np.int64),
          embedding=pa.array([v.astype(np.float32) for v in vecs],
                             pa.list_(pa.float32())),
          label=pa.array(labels, pa.int32()))


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_testdata"
    sf = float(sys.argv[2]) if len(sys.argv) > 2 else 0.01
    gen(out, sf)
    print(f"wrote 10 tables to {out} at sf={sf}")
