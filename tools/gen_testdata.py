"""Generate driver-shaped synthetic testdata at scale factors the
driver does not ship (sf1+), so the parity sweep and bench can run one
more 10x up.

Statistical twin of `/root/testdata/sf*` (TESTDATA.md): same schemas,
same column domains/distributions (measured from sf0.1), deterministic
under a fixed seed. NOT byte-identical to the driver's generator — it
does not need to be: the correctness check compares Spark vs DuckDB on
the SAME files, so any realistic data exercises the queries. The
documents table gets explicit duplicate structure (0.2% exact copies,
2% near-dup word-perturbed copies) so dedup/LSH queries do real work
at scale.

Usage: python tools/gen_testdata.py [sf] [outdir]
  default: sf=1 -> /root/repo/.localdata/sf1
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "spark batch part line column order small sort fast value scan a the "
    "vector query agg table hash slow filter customer stream big merge "
    "group key join plan shuffle"
).split()  # 31 words, matching the observed corpus vocabulary size

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PADJ = ["large", "hot", "blue", "old", "cold", "dark", "light", "new"]
PNOUN = ["ring", "bolt", "plate", "gear", "wheel", "cap", "rod", "pin"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["en", "zh", "es", "fr", "de"]  # en is ~2x any other


def _write(outdir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(outdir, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def _ts_col(arr_us: np.ndarray) -> pa.Array:
    return pa.array(arr_us.astype("datetime64[us]"), type=pa.timestamp("us"))


def _day_ts(rng: np.random.Generator, n: int, lo: str, hi: str) -> np.ndarray:
    days = (np.datetime64(hi) - np.datetime64(lo)).astype(int)
    off = rng.integers(0, days + 1, n).astype("timedelta64[D]")
    return (np.datetime64(lo) + off).astype("datetime64[us]").astype(np.int64)


def make_documents(
    rng: np.random.Generator,
    n_doc: int,
    near_frac: float = 0.02,
    exact_frac: float = 0.002,
    vocab_mult: int = 1,
) -> pa.Table:
    """Documents table: 10..100-word salads over the 31-word vocab,
    then ``near_frac`` near-dup copies (1-3 word positions perturbed)
    and ``exact_frac`` exact copies overwrite tail slots so dedup
    operators have real work; shuffled so duplicates are not clustered
    at the file tail. Shared by the sf generator and the curate-chain
    scale probe (tools/probe_curate_scale.py).

    ``vocab_mult`` grows the vocabulary with the corpus (numbered word
    variants). This matters above ~10k docs: a corpus 10x bigger over
    a FIXED 31-word vocab makes every 3-gram shingle shared by ~100+
    documents — candidate-pair generation (n-gram Jaccard, winnowing)
    goes quadratic in a way no real corpus does (vocabulary grows with
    corpus size; shingle collisions stay sparse). The generator scales
    it so per-shingle document counts stay roughly constant across sf."""
    vocab = (
        VOCAB
        if vocab_mult <= 1
        else [f"{w}{i}" if i else w for i in range(vocab_mult) for w in VOCAB]
    )
    lens = rng.integers(10, 101, n_doc)
    words = rng.integers(0, len(vocab), int(lens.sum()))
    texts: list[str] = []
    pos = 0
    varr = np.array(vocab)
    for L in lens:
        texts.append(" ".join(varr[words[pos:pos + L]]))
        pos += L
    n_near = int(near_frac * n_doc)
    n_exact = int(exact_frac * n_doc)
    base_pool = n_doc - n_near - n_exact
    for i in range(n_near):
        src = int(rng.integers(0, base_pool))
        toks = texts[src].split()
        for _ in range(int(rng.integers(1, 4))):
            toks[int(rng.integers(0, len(toks)))] = vocab[
                int(rng.integers(0, len(vocab)))
            ]
        texts[base_pool + i] = " ".join(toks)
    for i in range(n_exact):
        texts[base_pool + n_near + i] = texts[int(rng.integers(0, base_pool))]
    perm = rng.permutation(n_doc)
    texts = [texts[i] for i in perm]
    lang_idx = rng.choice(5, n_doc, p=[1 / 3, 1 / 6, 1 / 6, 1 / 6, 1 / 6])
    return pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": pa.array(np.array(LANGS)[lang_idx]),
        "source": pa.array([f"src{s}" for s in rng.integers(0, 20, n_doc)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def generate(sf: float, outdir: str, seed: int = 42) -> None:
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(seed)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(8_000 * sf)  # follows the 500 -> 2000 (4x/decade) ladder

    _write(outdir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int64()),
        "r_name": REGIONS,
    }))
    _write(outdir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int64()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int64()),
    }))
    _write(outdir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(0, 10_000, n_cust), 2),
        "c_mktsegment": pa.array(
            np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]
        ),
    }))
    _write(outdir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(0, 10_000, n_supp), 2),
    }))
    _write(outdir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": [
            f"{PADJ[a]} {PNOUN[b]}"
            for a, b in zip(
                rng.integers(0, len(PADJ), n_part),
                rng.integers(0, len(PNOUN), n_part),
            )
        ],
        "p_brand": pa.array(
            [f"Brand#{b}" for b in rng.integers(0, 25, n_part)]
        ),
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(900.0 + (np.arange(n_part) % 1000) * 0.1, 2),
    }))

    _write(outdir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(
            np.array(["F", "O", "P"])[rng.integers(0, 3, n_ord)]
        ),
        "o_totalprice": np.round(rng.uniform(1000, 500_000, n_ord), 2),
        "o_orderdate": _ts_col(_day_ts(rng, n_ord, "1995-01-01", "2001-08-01")),
        "o_orderpriority": pa.array(
            np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]
        ),
    }))

    # lineitem: 1..7 lines per order (TPC-H shape, avg ~4)
    per_order = rng.integers(1, 8, n_ord)
    l_okey = np.repeat(np.arange(n_ord), per_order)
    n_li = len(l_okey)
    linenum = np.concatenate([np.arange(1, k + 1) for k in per_order])
    _write(outdir, "lineitem", pa.table({
        "l_orderkey": pa.array(l_okey, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(linenum, pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) * 0.01, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) * 0.01, 2),
        "l_returnflag": pa.array(
            np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]
        ),
        "l_linestatus": pa.array(
            np.array(["F", "O"])[rng.integers(0, 2, n_li)]
        ),
        "l_shipdate": _ts_col(_day_ts(rng, n_li, "1995-01-02", "2001-11-04")),
    }))

    # events: exponential inter-arrival over a 30-day window, sorted ts
    gaps = rng.exponential(1.0, n_ev)
    span_us = 30 * 86_400 * 1_000_000
    ts = (np.datetime64("2024-01-01").astype("datetime64[us]").astype(np.int64)
          + np.cumsum(gaps) / gaps.sum() * span_us).astype(np.int64)
    _write(outdir, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": _ts_col(ts),
        "user_id": pa.array(rng.integers(0, max(n_cust // 10, 1), n_ev), pa.int64()),
        "event_type": pa.array(
            np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)]
        ),
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_ev)],
    }))

    _write(
        outdir,
        "documents",
        make_documents(rng, n_doc, vocab_mult=max(1, int(round(10 * sf)))),
    )

    # embeddings: 10 unit-norm cluster centers + noise, renormalized
    centers = rng.normal(0, 1, (10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, 10, n_emb)
    vecs = centers[labels] + rng.normal(0, 0.35, (n_emb, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(outdir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(
            [v for v in vecs.astype(np.float32)],
            pa.list_(pa.float32()),
        ),
        "label": pa.array(labels, pa.int32()),
    }))


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    sf_name = f"sf{sf:g}"
    out = sys.argv[2] if len(sys.argv) > 2 else f"/root/repo/.localdata/{sf_name}"
    print(f"generating {sf_name} -> {out}")
    generate(sf, out)
