#!/usr/bin/env python3
"""Builder-side rehearsal of the driver's t2 gate: for each dumped query
result under target/verify_r06/<name>/, run the oracle SQL from
oracle_sql.json in DuckDB over the same sf tables and compare
(rows, schema, values) after sorting columns by name and rows by value.

Two strictness guards beyond value equality, mirroring the driver's hasher:

* HUGEINT guard — DuckDB widens sum(BIGINT) to int128; the driver hashes
  the serialized type, so an un-cast HUGEINT oracle column hash-mismatches
  an identical-valued Spark BIGINT (round-6 verdict: 5 red rows from exactly
  this). Every oracle's DESCRIBE must be HUGEINT-free — oracle authors wrap
  integer sums in CAST(... AS BIGINT).
* rows are sorted on non-float columns only (floats rounded to the 1e-9
  comparison tolerance first), so sub-tolerance cross-engine float noise on
  near-tied rows cannot reorder the frames differently; nulls are
  normalized before stringification so NaN vs None cannot diverge.
* type-drift guard — the driver's hasher serializes the COLUMN TYPE, so a
  Spark DOUBLE vs an oracle BIGINT hash-mismatches even when every value is
  numerically equal (round-7 verdict: zorder_cluster red from exactly this;
  check.py's 12-sig-digit float canon erases it). Each Spark dump's parquet
  types (via DuckDB DESCRIBE over the part-files) must land in the same
  numeric class (int / float / decimal / other) as the oracle's DESCRIBE,
  column by column.
"""
import json, sys, glob
import duckdb
import numpy as np
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "target/verify_r06"

oracle = json.load(open(f"{out}/oracle_sql.json"))
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

def hugeint_cols(sql):
    """Column names whose DuckDB type is (or contains) HUGEINT."""
    desc = con.execute(f"DESCRIBE {sql}").df()
    return [r["column_name"] for _, r in desc.iterrows()
            if "HUGEINT" in str(r["column_type"]).upper()]

def type_class(t):
    """Collapse a DuckDB type name to the class the driver's hasher keys on:
    int-family vs float-family vs decimal vs everything-else verbatim."""
    t = str(t).upper()
    if "HUGEINT" in t:
        return "hugeint"
    if any(k in t for k in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "INT")):
        return "int"
    if any(k in t for k in ("DOUBLE", "FLOAT", "REAL")):
        return "float"
    if "DECIMAL" in t:
        return "decimal"
    return t

def describe_types(sql):
    desc = con.execute(f"DESCRIBE {sql}").df()
    return {r["column_name"]: type_class(r["column_type"])
            for _, r in desc.iterrows()}

def type_drift(name):
    """Per-column numeric-class diff between the Spark dump and the oracle."""
    spark_t = describe_types(f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')")
    oracle_t = describe_types(oracle[name])
    return [(c, spark_t[c], oracle_t[c]) for c in sorted(set(spark_t) & set(oracle_t))
            if spark_t[c] != oracle_t[c]]

def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            # round to comparison tolerance so sort order is stable across engines
            df[c] = df[c].round(9)
        elif df[c].dtype == object:
            df[c] = df[c].where(pd.notna(df[c]), None).astype(str)
    # sort on non-float columns FIRST, then the (already-rounded) float
    # columns as tiebreakers: a nullable int column arrives as float64+NaN
    # in pandas, and leaving every float out of the keys let rows tied on
    # the remaining columns align differently between engines (cube/rollup
    # null-grouping rows, outer-join null keys). Rounded floats sort
    # identically across engines; NaN consistently sorts last.
    nonf = [c for c in df.columns if df[c].dtype.kind != "f"]
    flt = [c for c in df.columns if df[c].dtype.kind == "f"]
    df = df.sort_values(by=nonf + flt, kind="mergesort").reset_index(drop=True)
    return df

fails = []
names = sorted(g.split("/")[-1] for g in glob.glob(f"{out}/*") if not g.endswith(".json"))
for name in names:
    try:
        huge = hugeint_cols(oracle[name])
        if huge:
            fails.append((name, f"oracle emits HUGEINT cols {huge} — wrap in CAST(... AS BIGINT)"))
            continue
        drift = type_drift(name)
        if drift:
            fails.append((name, "type drift " + ", ".join(
                f"{c}: spark={s} oracle={o}" for c, s, o in drift)))
            continue
        got = pd.read_parquet(f"{out}/{name}")
        want = con.execute(oracle[name]).df()
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            fails.append((name, f"schema {list(g.columns)} vs {list(w.columns)}")); continue
        if len(g) != len(w):
            fails.append((name, f"rows {len(g)} vs {len(w)}")); continue
        # exact compare with float tolerance fallback
        bad = None
        for c in g.columns:
            if g[c].dtype.kind == "f" or w[c].dtype.kind == "f":
                if not np.allclose(g[c].astype(float), w[c].astype(float),
                                   rtol=0, atol=1e-9, equal_nan=True):
                    bad = c; break
            else:
                if not (g[c].astype(str) == w[c].astype(str)).all():
                    bad = c; break
        if bad: fails.append((name, f"values differ in col {bad}")); continue
        print(f"PASS {name} ({len(g)} rows)")
    except Exception as e:
        fails.append((name, f"ERR {type(e).__name__}: {e}"))

for name, why in fails:
    print(f"FAIL {name}: {why}")
print(f"\n{len(names)-len(fails)}/{len(names)} green")
sys.exit(1 if fails else 0)
