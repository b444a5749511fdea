"""Local DuckDB-oracle harness — mirrors the driver's t2 correctness gate.

Runs a registered query's Spark plan and its DuckDB oracle SQL on the same
parquet tables, canonicalizes both results (columns sorted by name, rows
sorted by all columns, tz-aware timestamps normalized to naive UTC) and
compares values with a tight float tolerance. The driver does the same with
an order-insensitive value hash, so anything that passes here only with
tolerance (not exactly) is flagged by `assert_matches(strict=...)`.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pandas as pd

from .catalog import TABLES


def duckdb_conn(sf_dir: str):
    import duckdb

    conn = duckdb.connect()
    for name in TABLES:
        conn.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return conn


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    conn = duckdb_conn(sf_dir)
    try:
        return conn.execute(sql).df()
    finally:
        conn.close()


def canonicalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Column order by name; rows sorted by every column; naive-UTC times.

    Signed zeros are normalized to +0.0 before the sort: DuckDB's ROUND
    returns -0.0 for tiny negatives where Spark returns +0.0, and the
    repr-keyed row sort would otherwise pair the two frames' rows
    differently ('-0.0' != '0.0' as strings) and report a spurious
    full-row mismatch. IEEE equality already treats them equal, so this
    only stabilizes the pairing. (Queries in the DRIVER registry must
    not rely on this: the driver's value hash is not ours to normalize —
    composites add `+ 0.0` to every double slot on both engines, and
    tests/test_regen.py is the evidence it suffices.)"""
    out, _ = _canonicalize_with_order(pdf)
    return out


def _canonicalize_with_order(pdf: pd.DataFrame):
    """Canonicalized frame + the row permutation that produced it (so a
    raw, un-normalized view can be re-aligned to the same pairing)."""
    out = pdf.copy()
    for c in out.columns:
        if isinstance(out[c].dtype, pd.DatetimeTZDtype):
            out[c] = out[c].dt.tz_convert("UTC").dt.tz_localize(None)
        if np.issubdtype(out[c].dtype, np.floating):
            out[c] = out[c] + 0.0
    out = out[sorted(out.columns)]
    order = None
    if len(out):
        # Sort on a stringified view so floats/None/lists sort stably.
        key = out.apply(lambda row: tuple(repr(v) for v in row), axis=1)
        order = key.argsort(kind="mergesort")
        out = out.iloc[order].reset_index(drop=True)
    return out, order


@dataclass
class MatchReport:
    name: str
    row_match: bool
    col_match: bool
    exact: bool  # values identical (what the driver's hash needs)
    close: bool  # values within tolerance (semantics right, repr drifts)
    detail: str = ""
    # True when the two engines emit a different NUMBER of -0.0 values in
    # some float column: IEEE == treats -0.0 == 0.0 (so `exact` passes),
    # but a bit-level value hash — the driver's, potentially — would not.
    # Driver-registry queries must keep this False on every data draw
    # (tests/test_regen.py); fine-grained-only queries may ignore it.
    zero_sign_drift: bool = False

    @property
    def ok(self) -> bool:
        return self.row_match and self.col_match and self.close


def _values_equal(a, b, rtol: float, atol: float) -> tuple[bool, bool, str]:
    """Returns (exact, close, detail) for two canonicalized frames."""
    exact = True
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            af = a[c].astype(float).to_numpy()
            bf = b[c].astype(float).to_numpy()
            both_nan = np.isnan(af) & np.isnan(bf)
            same = (af == bf) | both_nan
            if not same.all():
                exact = False
                if not np.allclose(af, bf, rtol=rtol, atol=atol, equal_nan=True):
                    i = int(np.argmin(np.isclose(af, bf, rtol=rtol, atol=atol, equal_nan=True)))
                    return False, False, f"col {c} row {i}: {af[i]!r} != {bf[i]!r}"
        else:
            sa = a[c].astype(object).where(pd.notna(a[c]), None)
            sb = b[c].astype(object).where(pd.notna(b[c]), None)
            neq = [
                i
                for i, (x, y) in enumerate(zip(sa, sb))
                if not _scalar_eq(x, y)
            ]
            if neq:
                i = neq[0]
                return False, False, f"col {c} row {i}: {sa.iloc[i]!r} != {sb.iloc[i]!r}"
    return exact, True, ""


def _scalar_eq(x, y) -> bool:
    if x is None and y is None:
        return True
    if isinstance(x, (list, tuple, np.ndarray)) and isinstance(y, (list, tuple, np.ndarray)):
        return len(x) == len(y) and all(_scalar_eq(a, b) for a, b in zip(x, y))
    if isinstance(x, float) and isinstance(y, float):
        return x == y or (math.isnan(x) and math.isnan(y))
    try:
        return bool(x == y)
    except Exception:
        return repr(x) == repr(y)


def compare(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame,
            rtol: float = 1e-9, atol: float = 1e-9) -> MatchReport:
    a, b = canonicalize(spark_pdf), canonicalize(oracle_pdf)
    col_match = list(a.columns) == list(b.columns)
    row_match = len(a) == len(b)
    if not col_match or not row_match:
        return MatchReport(
            name, row_match, col_match, False, False,
            f"cols {list(a.columns)} vs {list(b.columns)}; rows {len(a)} vs {len(b)}",
        )
    exact, close, detail = _values_equal(a, b, rtol, atol)
    drift = _zero_sign_drift(spark_pdf, oracle_pdf)
    if drift and not detail:
        detail = drift
    return MatchReport(name, True, True, exact, close, detail,
                       zero_sign_drift=bool(drift))


def _zero_sign_drift(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> str:
    """Driver-hash-equivalence check on the RAW (pre-normalization)
    frames: the driver's value hash is md5 over the SORTED multiset of
    repr-tuple rows (columns ordered by name), so two results it calls
    equal must have identical raw repr-row multisets — which
    distinguishes -0.0 from +0.0 wherever it appears. Comparing the
    sorted multisets (rather than counting or positionally pairing
    zeros) matches that contract exactly: same number of -0.0s on
    DIFFERENT rows still flags, while duplicate rows with swapped zero
    signs across the frames — repr-multiset-equal, hash-equal — do not."""
    if len(spark_pdf) != len(oracle_pdf) or not len(spark_pdf):
        return ""
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        return ""

    def norm(v):
        # Python-native reprs so numpy-2 scalar wrappers ('np.int64(5)')
        # and dtype width can't fake a diff — but float zero SIGN (and
        # full float precision) survives: repr(float(-0.0)) == '-0.0'.
        if isinstance(v, (bool, np.bool_)):
            return repr(bool(v))
        if isinstance(v, (np.floating, float)):
            return repr(float(v))
        if isinstance(v, (np.integer, int)):
            return repr(int(v))
        if isinstance(v, (np.ndarray, list, tuple)):
            return repr([norm(x) for x in v])
        return repr(v)

    def rows(pdf):
        view = pdf.copy()
        for c in view.columns:
            if isinstance(view[c].dtype, pd.DatetimeTZDtype):
                view[c] = view[c].dt.tz_convert("UTC").dt.tz_localize(None)
        view = view[sorted(view.columns)]
        return sorted(
            tuple(norm(v) for v in r) for r in view.itertuples(index=False)
        )

    ra, rb = rows(spark_pdf), rows(oracle_pdf)
    for i, (x, y) in enumerate(zip(ra, rb)):
        if x != y:
            return f"repr-row multiset differs at sorted row {i}: {x} vs {y}"
    return ""
