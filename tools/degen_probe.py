#!/usr/bin/env python
"""Degenerate-distribution probe: the crash-class hunt.

The regen probe (tools/regen_data.py) redraws the SAME distributions;
this probe collapses them — constant money values, a single event day,
one market segment dominating, identical document texts, identical
embeddings — and runs every driver-registry query against BOTH engines.
What it hunts is not wrong answers but DIVERGENT DEGENERACY HANDLING:
Spark under ANSI mode raises where DuckDB returns NULL (the corr
zero-variance class found in round 4), empty intermediates, and
tie-classes that only exist when a distribution collapses.

    python tools/degen_probe.py            # build + run, prints a report

Exit code 1 if any query crashes or mismatches.
"""

from __future__ import annotations

import sys
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = Path("/tmp/degen_data")


def degenerate(out: Path, seed: int = 3) -> None:
    """Start from a normal small draw, then collapse distributions."""
    from regen_data import generate

    generate(out, seed=seed, scale=0.2)
    # constant event values on a single day (zero variance, one group)
    t = pq.read_table(out / "events.parquet")
    n = t.num_rows
    rng = np.random.default_rng(seed)
    ts0 = np.datetime64("2024-01-15T00:00:00")
    ts = ts0 + rng.integers(0, int(86400 * 1e6), n).astype("timedelta64[us]")
    t = t.set_column(t.schema.get_field_index("ts"), "ts",
                     pa.array(ts, pa.timestamp("us")))
    t = t.set_column(t.schema.get_field_index("value"), "value",
                     pa.array(np.full(n, 5.0), pa.float64()))
    pq.write_table(t, out / "events.parquet")
    # constant balances + one segment
    c = pq.read_table(out / "customer.parquet")
    nc = c.num_rows
    c = c.set_column(c.schema.get_field_index("c_acctbal"), "c_acctbal",
                     pa.array(np.full(nc, 100.0), pa.float64()))
    c = c.set_column(c.schema.get_field_index("c_mktsegment"), "c_mktsegment",
                     pa.array(["BUILDING"] * nc))
    pq.write_table(c, out / "customer.parquet")
    # constant quantities/prices/discounts
    li = pq.read_table(out / "lineitem.parquet")
    nl = li.num_rows
    for col, val in (("l_quantity", 1.0), ("l_extendedprice", 1000.0),
                     ("l_discount", 0.05), ("l_tax", 0.02)):
        li = li.set_column(li.schema.get_field_index(col), col,
                           pa.array(np.full(nl, val), pa.float64()))
    pq.write_table(li, out / "lineitem.parquet")
    # all parts same price and size (pareto: one giant tie class)
    p = pq.read_table(out / "part.parquet")
    npr = p.num_rows
    p = p.set_column(p.schema.get_field_index("p_retailprice"), "p_retailprice",
                     pa.array(np.full(npr, 950.0), pa.float64()))
    p = p.set_column(p.schema.get_field_index("p_size"), "p_size",
                     pa.array(np.full(npr, 10, dtype=np.int32), pa.int32()))
    pq.write_table(p, out / "part.parquet")
    # identical documents (every pair an exact dup) + one lang
    d = pq.read_table(out / "documents.parquet")
    nd = d.num_rows
    text = "spark batch row scan the a join hash merge window table value"
    d = d.set_column(d.schema.get_field_index("text"), "text",
                     pa.array([text] * nd))
    d = d.set_column(d.schema.get_field_index("n_chars"), "n_chars",
                     pa.array(np.full(nd, len(text), dtype=np.int64)))
    d = d.set_column(d.schema.get_field_index("lang"), "lang",
                     pa.array(["en"] * nd))
    pq.write_table(d, out / "documents.parquet")
    # identical embeddings (every cosine == 1, every LSH bucket collides)
    e = pq.read_table(out / "embeddings.parquet")
    ne = e.num_rows
    one = (np.ones(64) / 8.0).astype(np.float32)
    e = e.set_column(e.schema.get_field_index("embedding"), "embedding",
                     pa.array([one.tolist()] * ne, pa.list_(pa.float32())))
    pq.write_table(e, out / "embeddings.parquet")


def main() -> int:
    import shutil

    shutil.rmtree(OUT, ignore_errors=True)
    degenerate(OUT)
    from vault_8_hive_spark.oracle import compare, run_oracle
    from vault_8_hive_spark.queries import driver_queries
    from vault_8_hive_spark.session import get_spark

    spark = get_spark(cpus=8)
    failures = []
    for name, q in sorted(driver_queries().items()):
        try:
            spdf = q.fn(spark, str(OUT)).toPandas()
        except Exception:
            failures.append((name, "SPARK RAISES", traceback.format_exc(limit=2)))
            print(f"{name}: SPARK RAISES")
            continue
        if q.oracle is None:
            print(f"{name}: rows-only ok ({len(spdf)})")
            continue
        try:
            opdf = run_oracle(q.oracle, str(OUT))
        except Exception:
            failures.append((name, "ORACLE RAISES", traceback.format_exc(limit=2)))
            print(f"{name}: ORACLE RAISES (spark ok, {len(spdf)} rows)")
            continue
        rep = compare(name, spdf, opdf)
        status = "ok" if (rep.ok and rep.exact and not rep.zero_sign_drift) else "MISMATCH"
        if status != "ok":
            failures.append((name, "MISMATCH", rep.detail))
        print(f"{name}: {status} ({len(spdf)} rows)")
    print(f"\n{len(failures)} failures")
    for name, kind, detail in failures:
        print("----", name, kind)
        print(detail[:1500])
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
