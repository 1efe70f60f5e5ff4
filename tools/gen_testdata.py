"""Deterministic synthetic testdata generator (TPC-H-ish star schema).

Mirrors the schema and value distributions of the driver-generated parquet at
/root/testdata/sf{0.001,0.01,0.1} (see TESTDATA.md) so the engine can be
benched at scale factors the driver does not ship (sf1 = 10x sf0.1).  The
driver data is read-only; generated output lives under the repo
(default testdata/sf1/) and is .gitignore'd — rerun this tool to recreate it.

Distribution fidelity notes (measured from /root/testdata/sf0.1):
  - lineitem: l_orderkey/l_partkey/l_suppkey uniform over dims, l_linenumber
    uniform 1..7, quantity uniform 1..50, extendedprice ~ qty * U(900, 2100),
    discount U(0, .10) 2dp, tax U(0, .08) 2dp, shipdate uniform days
    1995-01-02..2001-11-04, flags A/N/R x F/O uniform.
  - documents: 30-word vocab, doc length U(10,100) words, lang
    en~41% / de,es,fr,zh ~15% each, source src0..src19 uniform, ~0.2% exact
    dups and ~2% near-dups (base doc with ~10% word substitutions + a 'dup'
    marker token, matching the sf0.1 'dup' token frequency).
  - embeddings: 64-dim unit vectors, 10 labels, weak cluster signal
    (within-label mean cosine ~= 0.005 at sf0.1 => signal amplitude ~0.07).
  - events: one month (2024-01) of microsecond timestamps, users = 1.5% of
    event count, 5 event types uniform, value U(0,560) 2dp, props '{"k": n}'.

Scale rule (10x sf0.1 for sf=1): lineitem 6M, orders 1.5M, customer 150k,
part 200k, supplier 10k, events 1M, documents 50k, embeddings 20k;
region/nation fixed dims.

Usage: python tools/gen_testdata.py [--sf 1.0] [--out testdata/sf1]
"""
from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "large", "join", "group", "order", "sort",
    "filter", "scan", "hash", "line", "part", "customer", "big", "slow",
    "fast", "the", "row", "agg", "key", "query", "a", "batch",
]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
SEGMENTS = ["AUTOMOBILE", "MACHINERY", "BUILDING", "HOUSEHOLD", "FURNITURE"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["signup", "purchase", "view", "click", "error"]
P_TYPES = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "MEDIUM", "PROMO"]
P_ADJ = ["large", "hot", "blue", "red", "green", "small", "cold", "dark"]
P_NOUN = ["ring", "bolt", "screw", "washer", "nut", "gear", "cap", "rod"]

DAY_US = 86_400_000_000


def _ts_days(rng, n, start, end):
    """Uniform day-granularity timestamps in [start, end] as us-epoch int64."""
    s = np.datetime64(start, "D").astype("datetime64[us]").astype(np.int64)
    e = np.datetime64(end, "D").astype("datetime64[us]").astype(np.int64)
    days = rng.integers(0, (e - s) // DAY_US + 1, n)
    return (s + days * DAY_US).astype("datetime64[us]")


def _write(out, name, cols):
    table = pa.table(cols)
    # Bounded row groups (r15): pyarrow's default (1M rows/group) writes
    # ~200 MB text row groups at sf30 — Spark then plans 32 byte-range
    # splits but only the splits containing a row-group START produce
    # rows, so a 1.5M-doc file executed downstream folds on TWO tasks
    # (measured: the sf30 probe's first simhash build ran 21 min on one
    # straggler).  32k rows/group keeps effective parallelism
    # proportional to byte splits at every sf this tool generates, the
    # same discipline Spark's own parquet sink applies via its 128 MB
    # block size.
    pq.write_table(
        table, os.path.join(out, f"{name}.parquet"), row_group_size=32_768
    )
    print(f"  {name}: {table.num_rows} rows")


def generate(
    sf: float, out: str, seed: int = 42, tables: set[str] | None = None
) -> None:
    """``tables`` — optional subset of the HEAVY tables to write
    (orders / lineitem / events / documents / embeddings); the fixed
    dims (region/nation/customer/supplier/part) are always written —
    they cost seconds at any feasible sf.  Used by the sf30 scaling
    probe, which only reads ``documents``.  NOTE: the single RNG stream
    advances only through the tables actually generated, so a subset
    run's table is NOT byte-identical to the same table from a full run
    at the same seed — fine for scaling probes (same distributions),
    wrong for cross-run correctness comparison; use full runs there."""
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(seed)

    def want(name: str) -> bool:
        return tables is None or name in tables
    n_li = int(6_000_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_cust = int(150_000 * sf)
    n_part = int(200_000 * sf)
    n_supp = int(10_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)

    _write(out, "region", {
        "r_regionkey": pa.array(np.arange(5, dtype=np.int32)),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    })
    _write(out, "nation", {
        "n_nationkey": pa.array(np.arange(25, dtype=np.int32)),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array((np.arange(25) % 5).astype(np.int32)),
    })
    _write(out, "customer", {
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": rng.integers(0, 25, n_cust).astype(np.int32),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, n_cust)],
    })
    _write(out, "supplier", {
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": rng.integers(0, 25, n_supp).astype(np.int32),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    })
    adj = np.array(P_ADJ)[rng.integers(0, len(P_ADJ), n_part)]
    noun = np.array(P_NOUN)[rng.integers(0, len(P_NOUN), n_part)]
    _write(out, "part", {
        "p_partkey": np.arange(n_part, dtype=np.int64),
        "p_name": np.char.add(np.char.add(adj, " "), noun),
        "p_brand": np.array([f"Brand#{b}" for b in range(1, 26)])[
            rng.integers(0, 25, n_part)],
        "p_type": np.array(P_TYPES)[rng.integers(0, len(P_TYPES), n_part)],
        "p_size": rng.integers(1, 51, n_part).astype(np.int32),
        "p_retailprice": 900.0 + (np.arange(n_part) % 1000) / 10.0,
    })
    if want("orders"):
        _write(out, "orders", {
            "o_orderkey": np.arange(n_ord, dtype=np.int64),
            "o_custkey": rng.integers(0, n_cust, n_ord),
            "o_orderstatus": np.array(["O", "P", "F"])[rng.integers(0, 3, n_ord)],
            "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
            "o_orderdate": _ts_days(rng, n_ord, "1995-01-01", "2001-08-01"),
            "o_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, n_ord)],
        })
    if want("lineitem"):
        qty = rng.integers(1, 51, n_li).astype(np.float64)
        _write(out, "lineitem", {
            "l_orderkey": rng.integers(0, n_ord, n_li),
            "l_partkey": rng.integers(0, n_part, n_li),
            "l_suppkey": rng.integers(0, n_supp, n_li),
            "l_linenumber": rng.integers(1, 8, n_li).astype(np.int32),
            "l_quantity": qty,
            "l_extendedprice": np.round(qty * rng.uniform(900, 2100, n_li), 2),
            "l_discount": np.round(rng.uniform(0, 0.10, n_li), 2),
            "l_tax": np.round(rng.uniform(0, 0.08, n_li), 2),
            "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)],
            "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, n_li)],
            "l_shipdate": _ts_days(rng, n_li, "1995-01-02", "2001-11-04"),
        })

    if want("events"):
        ev_start = np.datetime64("2024-01-01", "us").astype(np.int64)
        ev_end = np.datetime64("2024-01-31", "us").astype(np.int64)
        _write(out, "events", {
            "event_id": np.arange(n_ev, dtype=np.int64),
            "ts": rng.integers(ev_start, ev_end, n_ev).astype("datetime64[us]"),
            "user_id": rng.integers(0, max(1, int(n_ev * 0.015)), n_ev),
            "event_type": np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)],
            "value": np.round(rng.uniform(0, 560.25, n_ev), 2),
            "props": np.array([f'{{"k": {k}}}' for k in range(101)])[
                rng.integers(0, 101, n_ev)],
        })

    if want("documents"):
        # documents: base corpus + ~2% near-dups (~10% word swaps + 'dup' marker)
        # + ~0.2% exact dups, matching sf0.1's dup-token frequency and 8/5000
        # exact-dup rate.
        vocab = np.array(VOCAB)
        lens = rng.integers(10, 101, n_doc)
        docs = [" ".join(vocab[rng.integers(0, len(vocab), ln)]) for ln in lens]
        n_near = int(n_doc * 0.02)
        n_exact = max(1, int(n_doc * 0.002))
        near_ids = rng.choice(n_doc, n_near + n_exact, replace=False)
        for i in near_ids[:n_near]:
            base = docs[rng.integers(0, n_doc)].split(" ")
            k = max(1, len(base) // 10)
            pos = rng.choice(len(base), k, replace=False)
            for p in pos[:-1]:
                base[p] = vocab[rng.integers(0, len(vocab))]
            base[pos[-1]] = "dup"
            docs[i] = " ".join(base)
        for i in near_ids[n_near:]:
            docs[i] = docs[int(rng.integers(0, n_doc))]
        _write(out, "documents", {
            "doc_id": np.arange(n_doc, dtype=np.int64),
            "text": docs,
            "lang": rng.choice(LANGS, n_doc, p=LANG_P),
            "source": np.array([f"src{s}" for s in range(20)])[
                rng.integers(0, 20, n_doc)],
            "n_chars": np.array([len(t) for t in docs], dtype=np.int64),
        })

    if want("embeddings"):
        # embeddings: unit vectors with a weak 10-cluster label signal
        # (within-label mean cosine ~ a^2/(1+a^2) ~= 0.005 at a=0.07, as measured
        # on the driver's sf0.1 table).
        labels = rng.integers(0, 10, n_emb).astype(np.int32)
        centers = rng.standard_normal((10, 64)) / np.sqrt(64)
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        vecs = rng.standard_normal((n_emb, 64)) / np.sqrt(64) + 0.07 * centers[labels]
        vecs = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)).astype(np.float32)
        _write(out, "embeddings", {
            "vec_id": np.arange(n_emb, dtype=np.int64),
            "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
            "label": labels,
        })


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default=None)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument(
        "--tables",
        default=None,
        help="comma list of heavy tables to write (orders,lineitem,"
        "events,documents,embeddings); fixed dims are always written. "
        "Subset output is distribution-identical but not byte-identical "
        "to a full run (RNG stream position) — see generate().",
    )
    a = ap.parse_args()
    out = a.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "testdata", f"sf{a.sf:g}")
    subset = (
        {t.strip() for t in a.tables.split(",") if t.strip()}
        if a.tables
        else None
    )
    print(f"generating sf={a.sf} -> {out}"
          + (f" (tables: {sorted(subset)})" if subset else ""))
    generate(a.sf, out, a.seed, tables=subset)
