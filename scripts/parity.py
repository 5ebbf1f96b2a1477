#!/usr/bin/env python3
"""Driver-faithful local oracle-parity check (round-3 rewrite).

Usage: python3 scripts/parity.py <sfDir> <verifyOutDir> [query ...]

Round-2 lesson: the old mirror read BOTH sides through DuckDB, which
erased pandas dtype differences — it reported 93/93 while the driver's
pandas-based hash failed 39 queries on DECIMAL-vs-float64 dtype alone.
This rewrite reproduces the driver's representation path exactly:

  * Spark side:  pandas.read_parquet(<outDir>/<name>/*.parquet)
  * oracle side: duckdb con.execute(sql).df()
  * columns sorted by name (the driver's compare does this)
  * compare canonical dtypes, row count, pandas-style per-row hash,
    and exact canonical values

Canonicalization mirrors what the r2 driver results prove it tolerates
(those queries passed): integer WIDTH (int8/32/64 hash identically in
pandas — fn_bitwise, win_rank, text_langid all passed r2 with width
mismatches) and DATE representation (datetime.date objects vs
datetime64 midnights — filter_cmp/fn_date/join_theta passed r2).
It stays strict on what the driver provably fails: numeric KIND
mismatches (float64 vs object[decimal.Decimal] — the 38-query r2
root cause; int64 vs float64 — the win_sessionize HUGEINT case) and
any value difference at float bit level (repr round-trip).
"""
import datetime
import decimal
import glob
import json
import sys

import duckdb
import numpy as np
import pandas as pd


def canon_dtype(s: pd.Series) -> str:
    """Collapse dtypes to the equivalence classes the driver's pandas
    hash actually distinguishes."""
    k = s.dtype.kind
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "date"
    if k == "O":
        for v in s:
            if v is None or v is pd.NaT or (isinstance(v, float) and v != v):
                continue
            if isinstance(v, decimal.Decimal):
                return "object[Decimal]"  # the r2 failure mode — keep loud
            if isinstance(v, (datetime.date, datetime.datetime, pd.Timestamp)):
                return "date"
            if isinstance(v, str):
                return "str"
            if isinstance(v, (list, tuple, np.ndarray)):
                return "seq"
            if isinstance(v, dict):
                return "map"
            if isinstance(v, bytes):
                return "bytes"
            return f"object[{type(v).__name__}]"
        return "all-null"
    return str(s.dtype)


def cell_repr(v):
    """Deterministic canonical repr of one cell (exact, bit-level floats;
    dates collapse to ISO day when there is no time-of-day part)."""
    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, (float, np.floating)):
        if v != v:
            return "NaN"
        return repr(float(v))
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return repr(int(v))
    if isinstance(v, (np.bool_, bool)):
        return repr(bool(v))
    if isinstance(v, np.ndarray):
        return "[" + ",".join(cell_repr(x) for x in v.tolist()) + "]"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(cell_repr(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(
            f"{cell_repr(k)}:{cell_repr(x)}" for k, x in sorted(
                v.items(), key=lambda kv: str(kv[0]))) + "}"
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        if (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0) \
                and v.tzinfo is None:
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return "Decimal(" + str(v) + ")"  # kept distinct from float on purpose
    return repr(v)


def canon_frame(df: pd.DataFrame) -> pd.DataFrame:
    """Column-sort by name; widen ints to int64; stringify object/date
    columns via cell_repr so the hash is width/representation neutral
    exactly where the driver's is."""
    df = df[sorted(df.columns)].reset_index(drop=True)
    out = {}
    for c in df.columns:
        s = df[c]
        if s.dtype.kind in "iu":
            out[c] = s.astype("int64")
        elif s.dtype.kind == "M":
            out[c] = s.map(lambda v: cell_repr(pd.Timestamp(v))
                           if not pd.isna(v) else "NULL")
        elif s.dtype.kind == "O":
            out[c] = s.map(cell_repr)
        else:
            out[c] = s
    return pd.DataFrame(out)


def compare(want: pd.DataFrame, got: pd.DataFrame) -> list:
    """Return list of failure strings (empty = pass)."""
    fails = []
    want = want[sorted(want.columns)].reset_index(drop=True)
    got = got[sorted(got.columns)].reset_index(drop=True)
    if list(want.columns) != list(got.columns):
        return [f"cols want={list(want.columns)} got={list(got.columns)}"]
    dt_mismatch = {
        c: (canon_dtype(want[c]), canon_dtype(got[c]))
        for c in want.columns
        if canon_dtype(want[c]) != canon_dtype(got[c])
        and "all-null" not in (canon_dtype(want[c]), canon_dtype(got[c]))
    }
    if dt_mismatch:
        fails.append(f"dtype {dt_mismatch}")
    if len(want) != len(got):
        fails.append(f"rows want={len(want)} got={len(got)}")
        return fails
    cw, cg = canon_frame(want), canon_frame(got)
    # pandas-style per-row hash over the canonicalized frame — the
    # driver's signal shape
    try:
        hw = pd.util.hash_pandas_object(cw, index=False)
        hg = pd.util.hash_pandas_object(cg, index=False)
        if not (hw.values == hg.values).all():
            bad = int((hw.values != hg.values).sum())
            fails.append(f"hash {bad}/{len(want)} rows differ")
    except Exception as e:  # pragma: no cover - diagnostic only
        fails.append(f"hash error: {e}")
    # Exact canonical value compare, vectorized per column (a per-cell
    # .iloc loop took ~10 min on the 600k-row sf0.1 dumps). Strictness
    # is unchanged: float columns compare at the BIT level (−0.0 ≠ 0.0,
    # any-NaN == any-NaN, matching the repr compare this replaces);
    # canon_frame has already stringified object/date columns.
    mism = np.zeros(len(cw), dtype=bool)
    for c in cw.columns:
        a, b = cw[c], cg[c]
        if a.dtype.kind == "f" and b.dtype.kind == "f":
            av = a.to_numpy(dtype="float64", copy=True)
            bv = b.to_numpy(dtype="float64", copy=True)
            neq = av.view("int64") != bv.view("int64")
            neq &= ~(np.isnan(av) & np.isnan(bv))
        else:
            an, bn = a.isna().to_numpy(), b.isna().to_numpy()
            neq = (a != b).to_numpy(dtype=bool) | (an ^ bn)
            neq &= ~(an & bn)
        mism |= neq
    if mism.any():
        fails.append("values differ:")
        for i in np.flatnonzero(mism)[:3]:
            rw = tuple(cell_repr(cw.iloc[int(i)][c]) for c in cw.columns)
            rg = tuple(cell_repr(cg.iloc[int(i)][c]) for c in cg.columns)
            fails.append(f"  row {i}: want={rw}")
            fails.append(f"  row {i}:  got={rg}")
    return fails


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        if "{sfDir}" in sql:
            print(f"FAIL {name}: unsubstituted {{sfDir}} in oracle_sql.json")
            n_fail += 1
            continue
        try:
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = pd.concat([pd.read_parquet(f) for f in files],
                            ignore_index=True)
        except Exception as e:
            print(f"FAIL {name}: spark read error: {e}")
            n_fail += 1
            continue
        fails = compare(want, got)
        if not fails:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}:")
            for f in fails:
                print(f"  {f}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
