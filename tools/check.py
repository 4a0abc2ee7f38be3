#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate (dev tooling only; the
shipped engine is the Scala library).

Usage: tools/check.py <sfDir> <verifyOutDir>

Runs each oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the
sf parquet tables, loads the corresponding Spark result parquet, sorts
columns by name and rows by value, and diffs.
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                # round to 12 significant digits, not 9 decimals: for
                # magnitudes above ~1e7 a 1-ULP engine difference survives
                # decimal-place rounding and causes a spurious FAIL
                v = float(f"{v:.12g}")
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    results = sorted(glob.glob(f"{out_dir}/*/"))
    dumped = [p.rstrip("/").split("/")[-1] for p in results]
    # iterate the UNION of dumped dirs and oracle keys: a query that
    # crashed inside Verify leaves no dump, and must show up as a FAIL
    # here, not silently drop out of the denominator
    names = sorted(set(dumped) | set(oracle))
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output");  n_fail += 1;  continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchall()
        got_cols = [d[0] for d in con.description]
        if name not in oracle:
            print(f"SKIP {name}: rows-only ({len(got)} rows)")
            continue
        try:
            want = con.execute(oracle[name]).fetchall()
            want_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: oracle error {str(e).splitlines()[0]}")
            n_fail += 1; continue
        gc, g = canon(got, got_cols)
        wc, w = canon(want, want_cols)
        if gc != wc:
            print(f"FAIL {name}: columns {gc} vs {wc}");  n_fail += 1; continue
        if g != w:
            diff_g = [r for r in g if r not in set(w)][:3]
            diff_w = [r for r in w if r not in set(g)][:3]
            print(f"FAIL {name}: {len(g)} vs {len(w)} rows; "
                  f"spark-only={diff_g} oracle-only={diff_w}")
            n_fail += 1; continue
        print(f"PASS {name} ({len(g)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, "
          f"{len(names) - n_pass - n_fail} rows-only ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
