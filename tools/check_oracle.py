#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs graft.Verify (Spark) for a scale dir, then executes each oracle SQL in
DuckDB over the same corpus and compares: column names, row count, and
values (exact for ints/strings; exact-or-report-maxdiff for floats;
timestamps normalized to naive UTC).

Usage: python3 tools/check_oracle.py [sfdir] [--skip-verify] [query ...]
"""
import json, os, subprocess, sys, glob

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SFDIR = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else "/root/testdata/sf0.01"
OUT = os.path.join(REPO, "target", "verify_out")
ONLY = [a for a in sys.argv[2:] if not a.startswith("--")]

ADD_OPENS = [f"--add-opens={p}=ALL-UNNAMED" for p in (
    "java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect "
    "java.base/java.io java.base/java.net java.base/java.nio java.base/java.util "
    "java.base/java.util.concurrent java.base/java.util.concurrent.atomic "
    "java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action "
    "java.base/sun.util.calendar").split()]


def run_verify():
    cp = os.path.join(REPO, "target", "scala-2.13", "classes") + ":" + "/opt/spark/jars/*"
    env = dict(os.environ, SPARK_GRAFT_CPUS=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    cmd = ["java"] + ADD_OPENS + [
        "-Xmx8g", "-Dspark.ui.enabled=false",
        "-Dspark.sql.session.timeZone=UTC",
        "-cp", cp, "graft.Verify", SFDIR, OUT]
    print("[check] running Verify ...", flush=True)
    r = subprocess.run(cmd, env=env, capture_output=True, text=True)
    for line in r.stderr.splitlines():
        if "[verify]" in line or "Exception" in line:
            print("  ", line)
    if r.returncode != 0:
        print(r.stderr[-3000:])
        sys.exit(1)


def normalize(df):
    import pandas as pd, numpy as np
    df = df[sorted(df.columns)]
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            try:
                df[c] = df[c].dt.tz_localize(None)
            except TypeError:
                df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
        elif df[c].dtype == object:
            # decimals → float-safe string; bytes → hex; arrays/lists →
            # tuples (hashable, so sort_values/factorize don't choke)
            df[c] = df[c].map(
                lambda v: v.hex() if isinstance(v, (bytes, bytearray))
                else tuple(v.tolist()) if isinstance(v, np.ndarray)
                else tuple(v) if isinstance(v, list) else v)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(name, con):
    import pandas as pd, numpy as np
    res_dir = os.path.join(OUT, name)
    files = glob.glob(os.path.join(res_dir, "*.parquet"))
    if not files:
        return ("NO_OUTPUT", "")
    mine = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
    sql = oracle[name]
    try:
        theirs = con.sql(sql).df()
    except Exception as e:
        return ("ORACLE_ERR", str(e).splitlines()[0][:200])
    a, b = normalize(mine), normalize(theirs)
    if list(a.columns) != list(b.columns):
        return ("COLS", f"mine={list(a.columns)} oracle={list(b.columns)}")
    if len(a) != len(b):
        return ("ROWS", f"mine={len(a)} oracle={len(b)}")
    msgs = []
    for c in a.columns:
        va, vb = a[c], b[c]
        if np.issubdtype(va.dtype, np.floating) or np.issubdtype(vb.dtype, np.floating):
            va = va.astype(float); vb = vb.astype(float)
            both_nan = va.isna() & vb.isna()
            eq = (va == vb) | both_nan
            if not eq.all():
                d = (va - vb).abs().max()
                msgs.append(f"{c}: {int((~eq).sum())} diffs, maxabs={d}")
        else:
            va2 = va.astype(str); vb2 = vb.astype(str)
            if not (va2 == vb2).all():
                i = (va2 != vb2).idxmax()
                msgs.append(f"{c}: first diff @row{i}: {va2[i]!r} vs {vb2[i]!r}")
    return ("OK", "") if not msgs else ("VALUES", "; ".join(msgs[:4]))


if __name__ == "__main__":
    if "--skip-verify" not in sys.argv:
        run_verify()
    import duckdb
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SFDIR}/{t}.parquet'")
    oracle = json.load(open(os.path.join(OUT, "oracle_sql.json")))
    names = ONLY or sorted(oracle)
    fails = 0
    for name in names:
        status, msg = compare(name, con)
        mark = "PASS" if status == "OK" else "FAIL"
        if status != "OK":
            fails += 1
        print(f"[{mark}] {name} {status if status != 'OK' else ''} {msg}")
    # rows-only queries (no oracle): just confirm output exists
    for name in sorted(os.listdir(OUT) if os.path.isdir(OUT) else []):
        p = os.path.join(OUT, name)
        if os.path.isdir(p) and name not in oracle:
            n = len(glob.glob(os.path.join(p, "*.parquet")))
            print(f"[{'PASS' if n else 'FAIL'}] {name} ROWS_ONLY files={n}")
    print(f"\n{fails} oracle failures / {len(names)} checked")
    sys.exit(1 if fails else 0)
