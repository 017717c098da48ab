#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
SQL from <verifyOutDir>/oracle_sql.json in DuckDB over <sfDir>'s tables,
sorts columns by name + rows by all columns, and compares exactly.
Exit 1 on any mismatch. This is a builder-side tool only (python/duckdb are
driver-side); the shipped library is pure Scala.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

ORDERED = os.environ.get("CHECK_ORDERED", "") == "1"

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
    if not ORDERED:
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    failures = 0
    spark_dirs = {os.path.basename(d) for d in glob.glob(f"{outdir}/*") if os.path.isdir(d)}
    for name in sorted(spark_dirs):
        if name not in oracle:
            n = len(pd.read_parquet(f"{outdir}/{name}"))
            print(f"[rows-only] {name}: {n} rows {'OK' if n > 0 else 'EMPTY!'}")
            failures += 0 if n > 0 else 1
            continue
        try:
            got = canon(pd.read_parquet(f"{outdir}/{name}"))
            want = canon(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"[FAIL] {name}: exception {e}")
            failures += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"[FAIL] {name}: columns spark={list(got.columns)} duckdb={list(want.columns)}")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"[FAIL] {name}: rows spark={len(got)} duckdb={len(want)}")
            failures += 1
            continue
        # Dtype gate: the driver's hash is type-sensitive (it canonicalizes
        # integer widths but NOT type families), so a value-equal result in
        # a different family still fails there. The one observed escape
        # (q97, round 3): DuckDB sum(BIGINT) returns HUGEINT, which pandas
        # surfaces as dtype=object — hash-diverging from Spark's int64 even
        # though astype(str) compared equal. Fail on any family mismatch,
        # and on object-dtype numerics from DuckDB (uncast HUGEINT/DECIMAL
        # signature), so this gate is at least as strict as the driver.
        tbad = []
        for c in got.columns:
            a, b = got[c], want[c]
            if b.dtype == object and a.dtype != object:
                tbad.append(f"{c}: duckdb dtype=object (uncast HUGEINT/DECIMAL?) vs spark={a.dtype}")
            elif a.dtype.kind != b.dtype.kind and {a.dtype.kind, b.dtype.kind} != {"i", "u"}:
                tbad.append(f"{c}: dtype family spark={a.dtype} duckdb={b.dtype}")
        if tbad:
            print(f"[FAIL] {name}: TYPE " + "; ".join(tbad))
            failures += 1
            continue
        bad = []
        for c in got.columns:
            a, b = got[c], want[c]
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                af, bf = a.astype(float), b.astype(float)
                neq = ~((af == bf) | (af.isna() & bf.isna()))
                if neq.any():
                    d = (af - bf).abs().max()
                    bad.append(f"{c}: {int(neq.sum())} diffs, max|Δ|={d}")
            else:
                astr, bstr = a.astype(str), b.astype(str)
                neq = astr != bstr
                if neq.any():
                    i = int(np.argmax(neq.values))
                    bad.append(f"{c}: {int(neq.sum())} diffs, first row {i}: spark={astr.iloc[i]!r} duckdb={bstr.iloc[i]!r}")
        if bad:
            print(f"[FAIL] {name}: " + "; ".join(bad))
            failures += 1
        else:
            print(f"[OK]   {name}: {len(got)} rows x {len(got.columns)} cols")
    for name in sorted(set(oracle) - spark_dirs):
        print(f"[FAIL] {name}: oracle declared but no spark output")
        failures += 1
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main()
