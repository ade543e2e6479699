#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python scripts/local_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<query>/ parquet produced by graft.Verify, runs the
matching oracle from oracle_sql.json in DuckDB against the raw testdata
tables, and compares: columns sorted by name, rows sorted by all columns,
exact value equality (with a tiny float report if not).
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) > 0:
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    n_pass = n_fail = 0
    # an oracle with NO output dir means the Spark query THREW in Verify
    # (it logs and moves on) — that must be a failure here, not silence
    present = {d for d in os.listdir(out_dir)
               if os.path.isdir(os.path.join(out_dir, d))}
    only = os.environ.get("GRAFT_VERIFY_ONLY")
    expected = set(only.split(",")) & set(oracles) if only else set(oracles)
    for name in sorted(expected - present):
        print(f"FAIL {name}: no output (query failed in Verify)")
        n_fail += 1
    # dtype guard: DuckDB silently widens sum(BIGINT) -> HUGEINT (int128),
    # which pandas materializes as float and the driver's hasher formats
    # differently from Spark's BIGINT — a value-equal result then hash-
    # mismatches (the curation_pipeline_v2 r05/r06 red row). Fail fast on
    # any oracle (of the run's scope) whose output schema contains a type
    # the driver's hasher can't round-trip losslessly through pandas. A
    # DESCRIBE failure is counted HERE only; the compare loop skips the
    # name so one defect is one failure.
    BAD_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")
    guard_failed = set()
    for name in sorted(expected):
        try:
            desc = con.execute(f"DESCRIBE {oracles[name]}").fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle DESCRIBE error: {e}")
            n_fail += 1; guard_failed.add(name); continue
        bad = [(c, t) for (c, t, *_) in desc if any(b in t.upper() for b in BAD_TYPES)]
        if bad:
            print(f"FAIL {name}: oracle dtype guard: {bad} — add explicit CASTs")
            n_fail += 1; guard_failed.add(name)
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no parquet output"); n_fail += 1; continue
        got = pd.concat([pd.read_parquet(p) for p in sorted(files)], ignore_index=True)
        if name not in oracles:
            print(f"SKIP {name}: no oracle ({len(got)} rows)"); continue
        if name in guard_failed:
            continue
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}"); n_fail += 1; continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); n_fail += 1; continue
        mismatched = []
        for c in g.columns:
            gc, ec = g[c], e[c]
            # dtype-kind strictness: an int column on one side and a float
            # on the other can be value-equal here yet hash-mismatch in the
            # driver (formatting differs). Catch the class, not the instance.
            kinds = {gc.dtype.kind, ec.dtype.kind}
            if gc.dtype.kind != ec.dtype.kind and not (
                    kinds <= {"i", "u"} or kinds == {"M", "O"}):
                mismatched.append(f"{c}: dtype kind {gc.dtype} vs {ec.dtype}")
                continue
            try:
                if gc.dtype.kind in "fc" or ec.dtype.kind in "fc":
                    import numpy as np
                    eq = (gc.values == ec.values) | (pd.isna(gc.values) & pd.isna(ec.values))
                    if not eq.all():
                        idx = (~eq).argmax()
                        mismatched.append(f"{c}[{idx}]: {gc.iloc[idx]!r} vs {ec.iloc[idx]!r} "
                                          f"(maxabs={abs(gc - ec).max()})")
                else:
                    if not gc.astype(str).equals(ec.astype(str)):
                        neq = gc.astype(str) != ec.astype(str)
                        idx = neq.idxmax()
                        mismatched.append(f"{c}[{idx}]: {gc.iloc[idx]!r} vs {ec.iloc[idx]!r}")
            except Exception as ex:
                mismatched.append(f"{c}: compare error {ex}")
        if mismatched:
            print(f"FAIL {name}: " + "; ".join(mismatched[:3])); n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows, {len(g.columns)} cols)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
