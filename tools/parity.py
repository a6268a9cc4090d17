#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Runs each oracle SQL from Verify's oracle_sql.json in DuckDB against the
same scale-factor parquet tables, and diffs against the Spark result
parquet dumped by `sbt "runMain graft.Verify <sfdir> <outdir>"`.

Usage: python3 tools/parity.py <sfdir> <verify_outdir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

def canonical(df: pd.DataFrame) -> pd.DataFrame:
    """Dtype-sensitive string canonicalization mirroring the driver's
    value hash: int64 566 and float64 566.0 must NOT compare equal
    (DuckDB HUGEINT sums land as float64 in pandas and the driver's
    hash sees the trailing `.0`). Every cell becomes `str(value)` with
    NaN/None mapped to a shared sentinel."""
    def _canon(v):
        try:
            if v is None or pd.isna(v):
                return "\x00NULL"
        except (TypeError, ValueError):
            pass  # array-valued cell: handled element-wise below
        # element-wise for list/ndarray cells: numpy's str() elides long
        # arrays with '...', which would canonicalize two arrays equal
        # when they differ only in the elided middle
        if isinstance(v, (list, tuple)) or hasattr(v, "tolist"):
            return "[" + ",".join(_canon(x) for x in
                                  (v.tolist() if hasattr(v, "tolist") else v)) + "]"
        return str(v)
    out = pd.DataFrame(index=df.index)
    for c in df.columns:
        out[c] = df[c].map(_canon)
    return out

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    ok, bad, noracle = [], [], []
    for qdir in sorted(glob.glob(f"{outdir}/*/")):
        name = os.path.basename(qdir.rstrip("/"))
        spark_df = pd.concat([pd.read_parquet(f)
                              for f in glob.glob(f"{qdir}/*.parquet")])
        if name not in oracle:
            noracle.append((name, len(spark_df)))
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            bad.append((name, f"oracle SQL error: {e}"))
            continue
        s, d = normalize(spark_df), normalize(duck_df)
        if list(s.columns) != list(d.columns):
            bad.append((name, f"columns spark={list(s.columns)} duck={list(d.columns)}"))
            continue
        if len(s) != len(d):
            bad.append((name, f"rows spark={len(s)} duck={len(d)}"))
            continue
        cs, cd = canonical(s), canonical(d)
        try:
            pd.testing.assert_frame_equal(cs, cd, check_exact=True)
            ok.append(name)
        except AssertionError as e:
            # find first differing cell for the report
            diffmsg = str(e).split("\n")[0]
            for c in cs.columns:
                neq = ~cs[c].eq(cd[c])
                if neq.any():
                    i = neq.idxmax()
                    diffmsg = (f"col {c} row {i}: spark={cs[c][i]!r} "
                               f"duck={cd[c][i]!r} ({int(neq.sum())} diffs)")
                    break
            bad.append((name, diffmsg))
    print(f"== PARITY {len(ok)} ok / {len(bad)} bad / {len(noracle)} rows-only ==")
    for n in ok: print(f"  OK   {n}")
    for n, r in noracle: print(f"  ROWS {n} ({r} rows)")
    for n, m in bad: print(f"  BAD  {n}: {m}")
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
