#!/usr/bin/env python
"""Regeneration-robustness data generator.

The build driver regenerates /root/testdata every round (TESTDATA.md),
possibly with a different seed. Every oracle in the registry must stay
green on a fresh draw — any query whose correctness leans on a constant
tuned to the CURRENT draw (a band edge, a k-core k, a planted-duplicate
count) is a latent spurious red.

This tool synthesizes a schema-identical, domain-identical dataset at
sf0.01 scale from an arbitrary seed, so the full oracle harness can be
replayed against it:

    python tools/regen_data.py --seed 1337 --out /tmp/regen_sf0.01
    SPARK_GRAFT_TEST_SF_DIR=/tmp/regen_sf0.01 \
        python -m pytest tests/test_oracle.py -q

Schemas/domains mirror the driver's generator as observed (TESTDATA.md
tables at sf0.01): same column names and physical types, same categorical
domains (mktsegments, order priorities, event types, langs, sources,
brands, part types), same value ranges (dates, quantities, discount/tax
cent grids, account balances), same scale (row counts). Distributions are
matched to the observed quantiles (uniform keys/dates; lognormal-ish
event values); correctness of the replay does not depend on distribution
fidelity — both engines read the same files — but domain fidelity keeps
literal-predicate queries (p_type = 'ECONOMY', event_type = 'purchase',
lang = 'en') non-degenerate.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
ORDERSTATUS = ["F", "O", "P"]
RETURNFLAGS = ["A", "N", "R"]
LINESTATUS = ["F", "O"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["en", "de", "fr", "es", "zh"]
LANG_W = [0.44, 0.14, 0.13, 0.14, 0.15]
P_TYPES = ["ECONOMY", "PROMO", "MEDIUM", "STANDARD", "LARGE", "SMALL"]
P_ADJ = ["small", "red", "blue", "hot", "cold", "green", "shiny", "dull"]
P_NOUN = ["ring", "widget", "bolt", "gear", "cog", "pin", "plate", "tube"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
DOC_VOCAB = (
    "join hash row batch scan customer column filter small slow merge order "
    "vector line data table agg value key stream window spark a group part "
    "big sort query fast the and"
).split()


def _days(rng: np.random.Generator, lo: str, hi: str, n: int) -> np.ndarray:
    lo64 = np.datetime64(lo)
    span = int((np.datetime64(hi) - lo64) / np.timedelta64(1, "D"))
    return (lo64 + rng.integers(0, span + 1, n).astype("timedelta64[D]")).astype(
        "datetime64[us]"
    )


def generate(out: Path, seed: int, scale: float = 1.0) -> None:
    rng = np.random.default_rng(seed)
    out.mkdir(parents=True, exist_ok=True)
    n_cust = int(1500 * scale)
    n_ord = int(15000 * scale)
    n_li = int(60000 * scale)
    n_part = int(2000 * scale)
    n_supp = max(int(100 * scale), 10)
    n_ev = int(10000 * scale)
    n_doc = max(int(500 * scale), 60)
    n_users = max(int(150 * scale), 20)

    def write(name: str, cols: dict, schema: pa.Schema) -> None:
        pq.write_table(
            pa.Table.from_pydict(cols, schema=schema), out / f"{name}.parquet"
        )

    write(
        "region",
        {"r_regionkey": list(range(5)), "r_name": REGIONS},
        pa.schema([("r_regionkey", pa.int32()), ("r_name", pa.string())]),
    )
    write(
        "nation",
        {
            "n_nationkey": list(range(25)),
            "n_name": [f"NATION_{i}" for i in range(25)],
            "n_regionkey": [i % 5 for i in range(25)],
        },
        pa.schema(
            [
                ("n_nationkey", pa.int32()),
                ("n_name", pa.string()),
                ("n_regionkey", pa.int32()),
            ]
        ),
    )
    write(
        "customer",
        {
            "c_custkey": np.arange(n_cust, dtype=np.int64),
            "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
            "c_nationkey": rng.integers(0, 25, n_cust, dtype=np.int32),
            "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
            "c_mktsegment": rng.choice(SEGMENTS, n_cust),
        },
        pa.schema(
            [
                ("c_custkey", pa.int64()),
                ("c_name", pa.string()),
                ("c_nationkey", pa.int32()),
                ("c_acctbal", pa.float64()),
                ("c_mktsegment", pa.string()),
            ]
        ),
    )
    write(
        "supplier",
        {
            "s_suppkey": np.arange(n_supp, dtype=np.int64),
            "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
            "s_nationkey": rng.integers(0, 25, n_supp, dtype=np.int32),
            "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
        },
        pa.schema(
            [
                ("s_suppkey", pa.int64()),
                ("s_name", pa.string()),
                ("s_nationkey", pa.int32()),
                ("s_acctbal", pa.float64()),
            ]
        ),
    )
    write(
        "part",
        {
            "p_partkey": np.arange(n_part, dtype=np.int64),
            "p_name": [
                f"{rng.choice(P_ADJ)} {rng.choice(P_NOUN)}" for _ in range(n_part)
            ],
            "p_brand": [f"Brand#{rng.integers(1, 26)}" for _ in range(n_part)],
            "p_type": rng.choice(P_TYPES, n_part),
            "p_size": rng.integers(1, 51, n_part, dtype=np.int32),
            "p_retailprice": np.round(900.0 + 0.1 * np.arange(n_part) % 100, 2),
        },
        pa.schema(
            [
                ("p_partkey", pa.int64()),
                ("p_name", pa.string()),
                ("p_brand", pa.string()),
                ("p_type", pa.string()),
                ("p_size", pa.int32()),
                ("p_retailprice", pa.float64()),
            ]
        ),
    )
    write(
        "orders",
        {
            "o_orderkey": np.arange(n_ord, dtype=np.int64),
            "o_custkey": rng.integers(0, n_cust, n_ord),
            "o_orderstatus": rng.choice(ORDERSTATUS, n_ord, p=[0.48, 0.48, 0.04]),
            "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
            "o_orderdate": _days(rng, "1995-01-01", "2001-08-01", n_ord),
            "o_orderpriority": rng.choice(PRIORITIES, n_ord),
        },
        pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("o_custkey", pa.int64()),
                ("o_orderstatus", pa.string()),
                ("o_totalprice", pa.float64()),
                ("o_orderdate", pa.timestamp("us")),
                ("o_orderpriority", pa.string()),
            ]
        ),
    )
    ok = np.sort(rng.integers(0, n_ord, n_li))
    ln = np.ones(n_li, dtype=np.int32)
    for i in range(1, n_li):  # line numbers restart per order
        if ok[i] == ok[i - 1]:
            ln[i] = ln[i - 1] + 1
    write(
        "lineitem",
        {
            "l_orderkey": ok.astype(np.int64),
            "l_partkey": rng.integers(0, n_part, n_li),
            "l_suppkey": rng.integers(0, n_supp, n_li),
            "l_linenumber": ln,
            "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
            "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
            "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
            "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
            "l_returnflag": rng.choice(RETURNFLAGS, n_li),
            "l_linestatus": rng.choice(LINESTATUS, n_li),
            "l_shipdate": _days(rng, "1995-01-02", "2001-11-04", n_li),
        },
        pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("l_partkey", pa.int64()),
                ("l_suppkey", pa.int64()),
                ("l_linenumber", pa.int32()),
                ("l_quantity", pa.float64()),
                ("l_extendedprice", pa.float64()),
                ("l_discount", pa.float64()),
                ("l_tax", pa.float64()),
                ("l_returnflag", pa.string()),
                ("l_linestatus", pa.string()),
                ("l_shipdate", pa.timestamp("us")),
            ]
        ),
    )
    ts0 = np.datetime64("2024-01-01T00:00:00")
    span_us = int(30 * 86400 * 1e6)
    write(
        "events",
        {
            "event_id": np.arange(n_ev, dtype=np.int64),
            "ts": ts0 + rng.integers(0, span_us, n_ev).astype("timedelta64[us]"),
            "user_id": rng.integers(0, n_users, n_ev),
            "event_type": rng.choice(EVENT_TYPES, n_ev),
            "value": np.round(
                np.clip(np.exp(rng.normal(3.5, 1.0, n_ev)), 0.01, 490.02), 2
            ),
            "props": [f'{{"k": {rng.integers(0, 100)}}}' for _ in range(n_ev)],
        },
        pa.schema(
            [
                ("event_id", pa.int64()),
                ("ts", pa.timestamp("us")),
                ("user_id", pa.int64()),
                ("event_type", pa.string()),
                ("value", pa.float64()),
                ("props", pa.string()),
            ]
        ),
    )
    # documents: word salad over the observed vocab; plant a small block of
    # exact and near duplicates so dedup paths stay non-degenerate on any seed
    texts: list[str] = []
    for _ in range(n_doc):
        k = int(rng.integers(8, 101))
        texts.append(" ".join(rng.choice(DOC_VOCAB, k)))
    for i in range(0, min(20, n_doc // 10)):  # exact dups
        texts[n_doc - 1 - i] = texts[i]
    for i in range(20, min(40, n_doc // 5)):  # near dups (one word changed)
        w = texts[i].split()
        w[len(w) // 2] = "spark" if w[len(w) // 2] != "spark" else "batch"
        texts[n_doc - 1 - i] = " ".join(w)
    write(
        "documents",
        {
            "doc_id": np.arange(n_doc, dtype=np.int64),
            "text": texts,
            "lang": rng.choice(LANGS, n_doc, p=LANG_W),
            "source": [f"src{rng.integers(0, 20)}" for _ in range(n_doc)],
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        },
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("text", pa.string()),
                ("lang", pa.string()),
                ("source", pa.string()),
                ("n_chars", pa.int64()),
            ]
        ),
    )
    emb = rng.normal(0, 0.125, (n_doc, 64)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    write(
        "embeddings",
        {
            "vec_id": np.arange(n_doc, dtype=np.int64),
            "embedding": [row.tolist() for row in emb],
            "label": rng.integers(0, 10, n_doc, dtype=np.int32),
        },
        pa.schema(
            [
                ("vec_id", pa.int64()),
                ("embedding", pa.list_(pa.float32())),
                ("label", pa.int32()),
            ]
        ),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=1337)
    ap.add_argument("--out", type=Path, default=Path("/tmp/regen_sf0.01"))
    ap.add_argument("--scale", type=float, default=1.0, help="1.0 == sf0.01")
    args = ap.parse_args()
    generate(args.out, args.seed, args.scale)
    print(f"wrote 10 tables to {args.out} (seed={args.seed}, scale={args.scale})")


if __name__ == "__main__":
    main()
