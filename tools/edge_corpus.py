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


def nulls(out: Path, seed: int = 4242, scale: float = 0.3,
          frac: float = 0.3, key_frac: float = 0.05) -> None:
    """The NULL-FLOOD corpus: every nullable non-key column ~30% NULL,
    foreign keys ~5% NULL (orphan facts), event timestamps ~5% NULL.

    Real 100 TB pipelines carry NULLs in most columns; the synthetic
    generator emits none outside the one edge-corpus row. NULL floods
    stress a class no other sweep reaches:

    - expression totality under NULL operands (ANSI arithmetic is
      NULL-safe, but array/element/JSON paths and UDF boundaries can
      throw or diverge);
    - cross-engine NULL ORDERING divergence — Spark defaults ASC →
      NULLS FIRST where DuckDB defaults NULLS LAST, invisible in the
      sorted-row hash UNLESS the order decides which rows survive
      (top-k cuts, ROW_NUMBER filters, window frames, LAG defaults);
    - NULL group/join keys (grouped-together vs never-match semantics
      must agree in both spellings);
    - aggregates over all-NULL groups (SUM → NULL, COUNT → 0, AVG
      denominators).

    Keys kept non-null: primary keys (*_key ids, event_id, doc_id,
    vec_id, l_linenumber) — a NULL PK is a broken upstream, not a
    slice any query contracts over.
    """
    generate(out, seed=seed, scale=scale)
    rng = np.random.default_rng(seed + 7)

    def flood(name: str, cols: dict[str, float]) -> None:
        import pyarrow.compute as pc

        path = out / f"{name}.parquet"
        tbl = pq.read_table(path)
        arrays, fields = [], []
        for f in tbl.schema:
            col = tbl.column(f.name).combine_chunks()
            p = cols.get(f.name, 0.0)
            if p > 0:
                mask = pa.array(rng.random(len(col)) < p)
                col = pc.if_else(mask, pa.nulls(len(col), f.type), col)
            arrays.append(col)
            fields.append(pa.field(f.name, f.type, nullable=True))
        pq.write_table(
            pa.Table.from_arrays(arrays, schema=pa.schema(fields)), path
        )

    flood("customer", {"c_name": frac, "c_nationkey": key_frac,
                       "c_acctbal": frac, "c_mktsegment": frac})
    flood("supplier", {"s_name": frac, "s_nationkey": key_frac,
                       "s_acctbal": frac})
    flood("part", {"p_name": frac, "p_brand": frac, "p_type": frac,
                   "p_size": frac, "p_retailprice": frac})
    flood("orders", {"o_custkey": key_frac, "o_orderstatus": frac,
                     "o_totalprice": frac, "o_orderdate": frac,
                     "o_orderpriority": frac})
    flood("lineitem", {"l_partkey": key_frac, "l_suppkey": key_frac,
                       "l_quantity": frac, "l_extendedprice": frac,
                       "l_discount": frac, "l_tax": frac,
                       "l_returnflag": frac, "l_linestatus": frac,
                       "l_shipdate": frac})
    flood("events", {"ts": key_frac, "user_id": key_frac,
                     "event_type": frac, "value": frac, "props": frac})
    flood("documents", {"text": 0.1, "lang": frac, "source": frac,
                        "n_chars": frac})
    flood("embeddings", {"embedding": 0.1, "label": frac})
    print(f"null-flood corpus at {out}: frac={frac} key_frac={key_frac} "
          f"scale={scale}")


def extremes(out: Path, seed: int = 4242, scale: float = 0.3) -> None:
    """The EXTREME-VALUES corpus: representation edges appended to a
    normal draw — the inputs that crash jobs not by volume but by one
    row sitting at the edge of a type's domain.

    - doubles: NaN, +/-Inf, -0.0, the smallest denormal (5e-324), and
      1e308 in measure columns (NaN ordering, Inf-poisoned sums,
      -0.0 normalization, underflow in norms);
    - timestamps/dates at both ends: 1970-01-01 and 2262-01-01 — the
      far end sits just under pandas' datetime64[ns] ceiling
      (2262-04-11), which the COMPARE HARNESS itself rides through
      toPandas; 9999-12-31 was probed and is unrepresentable there, so
      the contract pins the representable-domain edge instead;
    - an INT64-max user_id (any salt/hash arithmetic that multiplies
      before taking a modulus overflows under ANSI);
    - malformed / deeply-nested JSON in events.props;
    - vectors with NaN / Inf / 1e200 components (norm overflow → Inf,
      cosine → NaN) and an all-denormal vector (norm underflows to 0);
    - a 100k-char document, a single 50k-char token, and a
      30k-distinct-token document (tokenizer/shingle buffer edges,
      bounded-posting claims).

    Money columns stay inside the EXACT-DOUBLE envelope of the money
    contract (|sum| * 1e4 < 2^53): 1e9 prices are ~2000x the normal
    domain but keep exact cents AND keep the double-accumulated BUILTIN
    moment paths (variance/regression/bootstrap — the documented
    order-sensitive twins of the exact-decimal moment rows) inside
    their 1e-6 rounding margin. Probed: 1e19 diverges in the
    decimal->double LAST ULP; 1e11 blows the builtin-moment margin
    (sums of squares ~1e22, ULP >> 1e-6). Both are representation
    limits, not plan defects.
    """
    generate(out, seed=seed, scale=scale)

    big_doc = " ".join(f"tok{i % 997}" for i in range(20_000))      # ~100k chars
    one_token = "x" * 50_000
    wide_vocab = " ".join(f"uniq{i}" for i in range(30_000))
    _append(
        out / "documents.parquet",
        {
            "doc_id": [60_000_000, 60_000_001, 60_000_002],
            "text": [big_doc, one_token, wide_vocab],
            "lang": ["en"] * 3,
            "source": ["srcx"] * 3,
            "n_chars": [len(big_doc), len(one_token), len(wide_vocab)],
        },
    )

    t_lo = np.datetime64("1970-01-01T00:00:00.000000")
    t_hi = np.datetime64("2262-01-01T00:00:00.000000")
    t_mid = np.datetime64("2024-02-01T00:00:00.000000")
    vals = [float("nan"), float("inf"), float("-inf"), -0.0, 5e-324,
            1e150, 42.0, 7.0]
    _append(
        out / "events.parquet",
        {
            "event_id": [61_000_000 + i for i in range(8)],
            "ts": [t_mid, t_mid, t_mid, t_mid, t_lo, t_hi, t_mid, t_mid],
            "user_id": [9_100_000, 9_100_000, 9_100_001, 9_100_001,
                        9_100_002, 9_100_002, 2**63 - 1, 2**63 - 1],
            "event_type": ["view", "click", "view", "click",
                           "view", "view", "view", "click"],
            "value": vals,
            "props": ["not json", '{"k": ',
                      '{"a": {"b": {"c": {"d": {"e": 1}}}}}',
                      '[]', '{"k": 1e999}', None, '{"k": 3}', '{"k": 4}'],
        },
    )

    d_lo = np.datetime64("1970-01-01", "us")
    d_hi = np.datetime64("2262-01-01", "us")
    _append(
        out / "orders.parquet",
        {
            "o_orderkey": [62_000_000, 62_000_001, 62_000_002],
            "o_custkey": [0, 1, 2],
            "o_orderstatus": ["O", "F", "O"],
            "o_totalprice": [1e9, -1_000_000.0, 0.0],
            "o_orderdate": [d_lo, d_hi, d_lo],
            "o_orderpriority": ["1-URGENT", "5-LOW", "3-MEDIUM"],
        },
    )
    _append(
        out / "lineitem.parquet",
        {
            "l_orderkey": [62_000_000, 62_000_001, 62_000_002],
            "l_partkey": [0, 1, 2],
            "l_suppkey": [0, 1, 2],
            "l_linenumber": [1, 1, 1],
            "l_quantity": [1e6, -5.0, 0.0],
            "l_extendedprice": [1e9, -5000.0, 0.0],
            "l_discount": [1.0, 0.0, 0.5],
            "l_tax": [0.0, 1.0, 0.0],
            "l_returnflag": ["N", "R", "A"],
            "l_linestatus": ["O", "F", "F"],
            "l_shipdate": [d_hi, d_lo, d_hi],
        },
    )
    _append(
        out / "customer.parquet",
        {
            "c_custkey": [63_000_000, 63_000_001],
            "c_name": ["Customer#xtreme00", "Customer#xtreme01"],
            "c_nationkey": [0, 24],
            "c_acctbal": [1e6, -0.0],
            "c_mktsegment": ["BUILDING", "MACHINERY"],
        },
    )

    dim = 64
    v_nan = [0.1] * dim
    v_nan[7] = float("nan")
    v_inf = [0.1] * dim
    v_inf[3] = float("inf")
    v_huge = [1e200] * dim                       # norm overflows to Inf
    v_denorm = [5e-324] * dim                    # norm underflows to 0.0
    _append(
        out / "embeddings.parquet",
        {
            "vec_id": [64_000_000 + i for i in range(4)],
            "embedding": [v_nan, v_inf, v_huge, v_denorm],
            "label": [0, 1, 2, 3],
        },
    )
    print(f"extremes corpus at {out}: NaN/Inf/-0.0/denormal measures, "
          f"1970/2262 date edges, INT64-max user, malformed JSON, "
          f"overflow/underflow vectors, 100k-char + 50k-token docs")


def multilingual(out: Path, seed: int = 4242, scale: float = 0.3) -> None:
    """The MULTILINGUAL corpus: substantially non-ASCII documents
    appended to a normal draw. A 100 TB web corpus is mostly NOT
    English; this sweep pins the cross-engine string-semantics edges
    that only show up off the ASCII page:

    - case mapping: JVM upper('ß') = 'SS', Turkish 'İ' lowers to
      'i' + COMBINING DOT — engines can disagree;
    - length semantics: n_chars (Python len = codepoints) vs engine
      length() over multibyte text, emoji surrogate pairs, ZWJ
      families, and combining sequences (NFC vs NFD spellings of the
      same visible text);
    - regex classes: Java \\w/\\s vs RE2 on non-ASCII letters and
      Unicode spaces (U+3000 ideographic space, NBSP);
    - tokenization: CJK text with no spaces at all (one giant
      "token"), mixed-script tokens, RTL text with embedded digits.
    """
    generate(out, seed=seed, scale=scale)

    texts = [
        # CJK, no spaces anywhere
        "東京都渋谷区の大規模言語モデルは分散処理基盤の上で学習される",
        "机器学习模型在大规模数据集上进行分布式训练以提高泛化能力",
        # Japanese with IDEOGRAPHIC SPACE U+3000 separators
        "分散　処理　基盤　学習",
        # Korean (has spaces)
        "대규모 언어 모델은 분산 시스템에서 학습된다",
        # Arabic (RTL) with embedded ASCII digits
        "تم تدريب النموذج على 100 مليون وثيقة في 3 أيام",
        # Hebrew (RTL)
        "המודל אומן על מיליוני מסמכים במערכת מבוזרת",
        # Russian
        "распределённая обработка данных на больших кластерах",
        # Greek
        "κατανεμημένη επεξεργασία δεδομένων μεγάλης κλίμακας",
        # German sharp-s (upper -> SS doubles the length in the JVM)
        "straße größe weiß fußball maßstab",
        # Turkish dotted/dotless i (case-mapping divergence probe)
        "İstanbul ısparta IĞDIR izmir DİYARBAKIR",
        # NFC vs NFD: same visible text, different codepoints
        "café résumé naïve",          # precomposed
        "café résumé naïve",      # combining marks
        # Emoji: surrogate pairs, ZWJ family, flag sequence
        "launch 🚀 day 👨‍👩‍👧 team 🇺🇸 results 📈 good",
        # NBSP + thin space as separators
        "data pipeline quality checks",
        # Mixed script single tokens
        "spark核心 data処理 модельtraining",
        # Vietnamese (dense diacritics, precomposed)
        "mô hình ngôn ngữ lớn được huấn luyện phân tán",
        # Thai (no spaces between words)
        "โมเดลภาษาขนาดใหญ่ฝึกบนระบบกระจาย",
        # Devanagari
        "वितरित प्रणाली पर बड़े भाषा मॉडल का प्रशिक्षण",
        # Fullwidth ASCII forms
        "ＤＡＴＡ　ＰＩＰＥＬＩＮＥ　ｑｕａｌｉｔｙ",
        # ASCII control row for contrast
        "plain ascii control document row",
    ]
    langs = ["ja", "zh", "ja", "ko", "ar", "he", "ru", "el", "de", "tr",
             "fr", "fr", "en", "en", "mul", "vi", "th", "hi", "en", "en"]
    _append(
        out / "documents.parquet",
        {
            "doc_id": [70_000_000 + i for i in range(len(texts))],
            "text": texts,
            "lang": langs,
            "source": [f"src{i % 5}" for i in range(len(texts))],
            "n_chars": [len(t) for t in texts],
        },
    )
    print(f"multilingual corpus at {out}: +{len(texts)} non-ASCII docs "
          f"(CJK/RTL/NFD/emoji/fullwidth/Unicode-space probes)")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=Path, default=Path("/tmp/edge_corpus"))
    ap.add_argument("--seed", type=int, default=4242)
    ap.add_argument("--scale", type=float, default=0.5, help="1.0 == sf0.01")
    ap.add_argument("--ties", action="store_true",
                    help="generate the all-ties corpus instead")
    ap.add_argument("--nulls", action="store_true",
                    help="generate the null-flood corpus instead")
    ap.add_argument("--extremes", action="store_true",
                    help="generate the extreme-values corpus instead")
    ap.add_argument("--multilingual", action="store_true",
                    help="generate the multilingual corpus instead")
    args = ap.parse_args()
    if args.ties:
        ties(args.out, scale=args.scale)
        return
    if args.nulls:
        nulls(args.out, seed=args.seed, scale=args.scale)
        return
    if args.extremes:
        extremes(args.out, seed=args.seed, scale=args.scale)
        return
    if args.multilingual:
        multilingual(args.out, seed=args.seed, scale=args.scale)
        return
    edge(args.out, seed=args.seed, scale=args.scale)


if __name__ == "__main__":
    main()
