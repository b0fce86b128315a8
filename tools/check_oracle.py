#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <out_dir>/<name> parquet (written by graft.Verify), runs the
matching SQL from <out_dir>/oracle_sql.json in DuckDB over the sf_dir
parquet tables, and compares: column names (sorted), row counts, and
values (sorted columns, sorted rows, float-tolerant then exact-hash).
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize ints/floats
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif isinstance(df[c].dtype, pd.DatetimeTZDtype) or pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]" if not isinstance(df[c].dtype, pd.DatetimeTZDtype) else "datetime64[us, UTC]")
    df = df.sort_values(by=list(df.columns), ignore_index=True) if len(df.columns) else df
    return df


def compare(name, got: pd.DataFrame, exp: pd.DataFrame):
    if sorted(got.columns) != sorted(exp.columns):
        return f"COLS got={sorted(got.columns)} exp={sorted(exp.columns)}"
    if len(got) != len(exp):
        return f"ROWS got={len(got)} exp={len(exp)}"
    g, e = canon(got), canon(exp)
    for c in g.columns:
        gv, ev = g[c], e[c]
        if pd.api.types.is_float_dtype(gv) and pd.api.types.is_float_dtype(ev):
            gq, eq = gv.fillna(-1e308).values, ev.fillna(-1e308).values
            if not np.allclose(gq, eq, rtol=1e-9, atol=1e-9):
                bad = int(np.argmax(~np.isclose(gq, eq, rtol=1e-9, atol=1e-9)))
                return f"VAL col={c} row={bad} got={gv[bad]} exp={ev[bad]}"
            if not np.array_equal(gv.fillna(-1e308).values, ev.fillna(-1e308).values):
                bad = int(np.argmax(gv.fillna(-1e308).values != ev.fillna(-1e308).values))
                return f"EXACT-FLOAT col={c} row={bad} got={gv[bad]!r} exp={ev[bad]!r} (allclose ok, bit mismatch)"
        else:
            if not gv.astype(str).equals(ev.astype(str)):
                bad = (gv.astype(str) != ev.astype(str)).idxmax()
                return f"VAL col={c} row={bad} got={gv[bad]!r} exp={ev[bad]!r}"
    return None


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(set(d for d in os.listdir(out_dir)
                       if os.path.isdir(os.path.join(out_dir, d))) | set(oracles))
    n_ok = n_bad = n_weak = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"  {name}: NO OUTPUT"); n_bad += 1; continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
        if name not in oracles:
            status = "rows-only" + (" OK" if len(got) > 0 else " EMPTY!")
            print(f"  {name}: {status} ({len(got)} rows)")
            n_weak += 1
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as ex:
            print(f"  {name}: ORACLE SQL ERROR: {ex}"); n_bad += 1; continue
        err = compare(name, got, exp)
        if err:
            print(f"  {name}: MISMATCH {err}"); n_bad += 1
        else:
            print(f"  {name}: OK ({len(got)} rows)"); n_ok += 1
    print(f"== {n_ok} ok, {n_weak} rows-only, {n_bad} bad ==")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
