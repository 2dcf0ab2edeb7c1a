#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark output), runs the matching
oracle SQL from oracle_sql.json in DuckDB over <sfDir>'s tables, and
compares: schema (column names), row count, and values (sorted by all
columns; exact for non-floats, 1e-9-relative tolerance for floats, plus a
strict-equality flag so we can see hash-risk even when tolerant-equal).
"""
import json, math, sys
import duckdb

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            odf = con.execute(sql).fetchdf()
            sdf = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: load/exec error: {e}"); n_fail += 1; continue
        ocols, scols = sorted(odf.columns), sorted(sdf.columns)
        if ocols != scols:
            print(f"FAIL {name}: columns differ\n  oracle: {ocols}\n  spark : {scols}")
            n_fail += 1; continue
        # dtype drift surfaces as a schema-check risk driver-side
        for c in ocols:
            if str(odf[c].dtype) != str(sdf[c].dtype):
                print(f"  note {name}.{c}: dtype oracle={odf[c].dtype} spark={sdf[c].dtype}")
        odf, sdf = odf[ocols], sdf[ocols]
        if len(odf) != len(sdf):
            print(f"FAIL {name}: rows oracle={len(odf)} spark={len(sdf)}")
            n_fail += 1; continue
        o = odf.sort_values(ocols, kind="mergesort").reset_index(drop=True)
        s = sdf.sort_values(ocols, kind="mergesort").reset_index(drop=True)
        exact = True; tol_ok = True; first_diff = None
        for c in ocols:
            for i, (a, b) in enumerate(zip(o[c], s[c])):
                if a is None and b is None: continue
                if isinstance(a, float) or isinstance(b, float):
                    fa, fb = float(a), float(b)
                    if fa != fb and not (math.isnan(fa) and math.isnan(fb)):
                        exact = False
                        if not math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9):
                            tol_ok = False
                            first_diff = first_diff or (c, i, a, b)
                else:
                    if str(a) != str(b):
                        exact = tol_ok = False
                        first_diff = first_diff or (c, i, a, b)
        if tol_ok:
            n_pass += 1
            note = "" if exact else "  (float-tolerant only — HASH RISK)"
            print(f"PASS {name}: {len(o)} rows{note}")
        else:
            n_fail += 1
            c, i, a, b = first_diff
            print(f"FAIL {name}: value diff col={c} row={i} oracle={a!r} spark={b!r}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
