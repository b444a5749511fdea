#!/usr/bin/env python
"""Adversarial-corpus generator: the regen-proofing sweep's sharper sibling.

tools/regen_data.py proves every oracle survives a DIFFERENT DRAW from the
same distribution. This tool proves the harder invariant: every oracle
survives a corpus that contains the DEGENERATE ROWS real pipelines carry —
the class of latent bug the round-6/7 advisories kept finding one at a
time (BM25's zero-token doc shifting n_docs/avgdl, sub-8-token documents
running `sequence(1, size-7)` DESCENDING through slice(ws, 0, 8), NULL
text turning F.size into -1 where DuckDB says NULL).

Appended edge rows, per table:

documents   empty text; whitespace-only; punctuation-only (zero [a-z0-9]
            tokens but n_chars > 0); 1..7-token docs (below every 8-gram
            threshold); digits-only; uppercase-only; unicode (accents +
            CJK — byte-vs-codepoint and regex-class parity); ONE NULL
            text; two docs sharing a long single-repeated-token run (the
            posting-list k(k-1)/2 worst case, bounded); an exact-dup pair
            of a short doc.
events      a brand-new user with exactly ONE event (singleton funnel /
            session / retention arms); three events with IDENTICAL ts for
            one user (ordering ties); a midnight-aligned ts (window edge);
            duplicated (ts, user, type, value) pair (stateful-dedup food).
orders      one order with NO lineitems (breaks the "every order has
            lines" generator invariant that inner-join spellings silently
            lean on); two orders tied on (orderdate, totalprice).
lineitem    one exact full-row duplicate pair.
customer    zero balance; most-negative balance; customer with no orders
            exists by construction already.
embeddings  one exact duplicate vector under a new vec_id (tie in every
            similarity ranking); one ALL-ZERO vector (norm 0 — division
            guards); one singleton label class.

Both engines read the same files, so every remaining failure mode is
real: a Spark-side crash (ANSI element_at, descending sequence) or a
dialect divergence (NaN vs NULL, size(-1) vs len(NULL)) that a guard in
BOTH the query and its oracle must close.

    python tools/edge_corpus.py --out /tmp/edge_corpus
    SPARK_GRAFT_TEST_SF_DIR=/tmp/edge_corpus \
        python -m pytest tests/test_oracle.py -q
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent))
from regen_data import generate  # noqa: E402


def _append(path: Path, rows: dict[str, list]) -> None:
    """Append rows (column dict) to a single-file parquet table, keeping
    the existing schema byte-for-byte."""
    tbl = pq.read_table(path)
    extra = pa.Table.from_pydict(rows, schema=tbl.schema)
    pq.write_table(pa.concat_tables([tbl, extra]), path)


def edge(out: Path, seed: int = 4242, scale: float = 0.5) -> None:
    generate(out, seed=seed, scale=scale)

    # ---- documents ------------------------------------------------------
    run_a = " ".join(["the"] * 400)  # two docs sharing one repeated gram
    run_b = " ".join(["the"] * 350)  # (bounded k(k-1)/2 posting stress)
    texts = [
        "",                             # zero tokens, zero chars
        "   ",                          # whitespace only
        "!!! ??? ... ---",              # punctuation only: no [a-z0-9] token
        "spark",                        # 1 token
        "join hash",                    # 2 tokens
        "a b c d e f g",                # 7 tokens: below every 8-gram op
        "123 456 789 0",                # digits only
        "JOIN HASH ROW BATCH SCAN",     # uppercase only (lowercasing parity)
        "naïve café 東京 data naïve café résumé over",  # unicode
        run_a,
        run_b,
        "tiny dup doc",                 # exact-dup pair
        "tiny dup doc",
        None,                           # NULL text
    ]
    n0 = pq.read_table(out / "documents.parquet").num_rows
    _append(
        out / "documents.parquet",
        {
            "doc_id": [10_000_000 + i for i in range(len(texts))],
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": [f"src{i % 20}" for i in range(len(texts))],
            "n_chars": [len(t) if t is not None else 0 for t in texts],
        },
    )

    # ---- events ---------------------------------------------------------
    t_tie = np.datetime64("2024-01-15T12:00:00.000000")
    t_mid = np.datetime64("2024-01-10T00:00:00.000000")
    _append(
        out / "events.parquet",
        {
            "event_id": [20_000_000 + i for i in range(6)],
            "ts": [t_tie, t_tie, t_tie, t_mid, t_mid, t_mid],
            "user_id": [9_000_001, 9_000_001, 9_000_001,
                        9_000_002, 9_000_003, 9_000_003],
            "event_type": ["view", "click", "purchase",
                           "signup", "view", "view"],
            "value": [0.01, 0.01, 490.02, 1.0, 2.5, 2.5],
            "props": ['{}', '{"k": 0}', '{"k": 99}',
                      '{"k": 1}', '{"k": 2}', '{"k": 2}'],
        },
    )

    # ---- orders (one childless) + lineitem full-row dup pair -------------
    li = pq.read_table(out / "lineitem.parquet")
    first = {c: [li.column(c)[0].as_py()] * 1 for c in li.schema.names}
    _append(out / "lineitem.parquet", first)  # exact duplicate of row 0
    _append(
        out / "orders.parquet",
        {
            "o_orderkey": [30_000_000, 30_000_001, 30_000_002],
            "o_custkey": [0, 1, 1],
            "o_orderstatus": ["O", "F", "F"],
            "o_totalprice": [1234.56, 777.77, 777.77],
            "o_orderdate": [np.datetime64("1997-06-15", "us"),
                            np.datetime64("1998-03-01", "us"),
                            np.datetime64("1998-03-01", "us")],
            "o_orderpriority": ["1-URGENT", "5-LOW", "5-LOW"],
        },
    )

    # ---- customer extremes ------------------------------------------------
    _append(
        out / "customer.parquet",
        {
            "c_custkey": [40_000_000, 40_000_001],
            "c_name": ["Customer#edge0000", "Customer#edge0001"],
            "c_nationkey": [0, 24],
            "c_acctbal": [0.0, -1000.0],
            "c_mktsegment": ["BUILDING", "MACHINERY"],
        },
    )

    # ---- embeddings: dup vector, zero vector, singleton label ------------
    emb = pq.read_table(out / "embeddings.parquet")
    v0 = emb.column("embedding")[1].as_py()  # duplicate of vec_id 1
    _append(
        out / "embeddings.parquet",
        {
            "vec_id": [50_000_000, 50_000_001, 50_000_002],
            "embedding": [v0, [0.0] * 64, v0],
            "label": [emb.column("label")[1].as_py(), 0, 99],  # 99: singleton
        },
    )
    print(f"edge corpus at {out}: documents {n0}+{len(texts)} rows, "
          f"6 edge events, childless order, dup lineitem row, "
          f"dup/zero/singleton vectors")


def ties(out: Path, scale: float = 0.3) -> None:
    """The ALL-TIES corpus: every non-key column constant, keys unique.

    With every value tied, any ordering that lacks a TOTAL tie-break is
    nondeterministic — the engines can (and do) pick different rows —
    so this corpus is the harshest determinism stress the oracle
    harness can run: 348 queries where every ROW_NUMBER, top-k cut,
    argmin, and LIMIT must be decided entirely by explicit tie-break
    columns. It also concentrates maximal skew on single keys (one
    user's events, identical documents, identical vectors), exercising
    the bounded-fan-out claims of the dedup/similarity family."""
    n_ord = max(int(15000 * scale), 100)
    n_li = max(int(60000 * scale), 200)
    n_ev = max(int(10000 * scale), 100)
    n_doc = max(int(500 * scale), 40)
    n_cust = max(int(1500 * scale), 20)
    n_supp = 10
    n_part = max(int(2000 * scale), 20)

    out.mkdir(parents=True, exist_ok=True)
    # Base corpus provides schemas + dims; fact tables are overwritten.
    generate(out, seed=1, scale=scale)

    doc_text = (
        "join hash row batch scan customer column filter small slow merge "
        "order vector line data table agg value key stream window spark a "
        "group part big sort query fast the and"
    )
    ts0 = np.datetime64("2024-01-15T12:00:00.000000")
    d0 = np.datetime64("1997-06-15", "us")

    def write_over(name: str, cols: dict) -> None:
        tbl = pq.read_table(out / f"{name}.parquet")
        pq.write_table(
            pa.Table.from_pydict(cols, schema=tbl.schema), out / f"{name}.parquet"
        )

    write_over("customer", {
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_name": ["Customer#tie"] * n_cust,
        "c_nationkey": np.zeros(n_cust, dtype=np.int32),
        "c_acctbal": [1234.56] * n_cust,
        "c_mktsegment": ["BUILDING"] * n_cust,
    })
    write_over("supplier", {
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": ["Supplier#tie"] * n_supp,
        "s_nationkey": np.zeros(n_supp, dtype=np.int32),
        "s_acctbal": [777.77] * n_supp,
    })
    write_over("part", {
        "p_partkey": np.arange(n_part, dtype=np.int64),
        "p_name": ["red widget"] * n_part,
        "p_brand": ["Brand#1"] * n_part,
        "p_type": ["ECONOMY"] * n_part,
        "p_size": np.ones(n_part, dtype=np.int32),
        "p_retailprice": [900.0] * n_part,
    })
    write_over("orders", {
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": np.zeros(n_ord, dtype=np.int64),  # ONE hot customer
        "o_orderstatus": ["O"] * n_ord,
        "o_totalprice": [1000.0] * n_ord,
        "o_orderdate": np.repeat(d0, n_ord),
        "o_orderpriority": ["1-URGENT"] * n_ord,
    })
    ok = np.arange(n_li, dtype=np.int64) % n_ord
    ok.sort()
    ln = np.ones(n_li, dtype=np.int32)
    for i in range(1, n_li):
        if ok[i] == ok[i - 1]:
            ln[i] = ln[i - 1] + 1
    write_over("lineitem", {
        "l_orderkey": ok,
        "l_partkey": np.zeros(n_li, dtype=np.int64),   # ONE hot part
        "l_suppkey": np.zeros(n_li, dtype=np.int64),   # ONE hot supplier
        "l_linenumber": ln,
        "l_quantity": [10.0] * n_li,
        "l_extendedprice": [5000.0] * n_li,
        "l_discount": [0.05] * n_li,
        "l_tax": [0.02] * n_li,
        "l_returnflag": ["N"] * n_li,
        "l_linestatus": ["O"] * n_li,
        "l_shipdate": np.repeat(d0 + np.timedelta64(30, "D").astype("timedelta64[us]"), n_li),
    })
    types = ["view", "click", "purchase", "signup", "error"]
    write_over("events", {
        "event_id": np.arange(n_ev, dtype=np.int64),
        "ts": np.repeat(ts0, n_ev),                    # ALL the same instant
        "user_id": np.zeros(n_ev, dtype=np.int64),     # ONE hot user
        "event_type": [types[i % 5] for i in range(n_ev)],
        "value": [9.99] * n_ev,
        "props": ['{"k": 7}'] * n_ev,
    })
    write_over("documents", {
        "doc_id": np.arange(n_doc, dtype=np.int64),
        "text": [doc_text] * n_doc,                    # ALL identical
        "lang": ["en"] * n_doc,
        "source": ["src0"] * n_doc,
        "n_chars": np.array([len(doc_text)] * n_doc, dtype=np.int64),
    })
    one_vec = [float(f"0.{(i * 7) % 97 + 1}") for i in range(64)]
    norm = sum(x * x for x in one_vec) ** 0.5
    one_vec = [x / norm for x in one_vec]
    write_over("embeddings", {
        "vec_id": np.arange(n_doc, dtype=np.int64),
        "embedding": [one_vec] * n_doc,                # ALL identical
        "label": np.zeros(n_doc, dtype=np.int32),
    })
    print(f"ties corpus at {out}: {n_ord} orders / {n_li} lines / "
          f"{n_ev} events / {n_doc} docs, all non-key values constant")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=Path, default=Path("/tmp/edge_corpus"))
    ap.add_argument("--seed", type=int, default=4242)
    ap.add_argument("--scale", type=float, default=0.5, help="1.0 == sf0.01")
    ap.add_argument("--ties", action="store_true",
                    help="generate the all-ties corpus instead")
    args = ap.parse_args()
    if args.ties:
        ties(args.out, scale=args.scale)
        return
    edge(args.out, seed=args.seed, scale=args.scale)


if __name__ == "__main__":
    main()
