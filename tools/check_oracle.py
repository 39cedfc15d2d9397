#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/<name>/ parquet (written by `graft.Verify`), runs
<verifyOutDir>/oracle_sql.json queries in DuckDB against the sfDir tables,
and compares row count, column names, and values (columns sorted by name,
rows sorted, cell-normalized). Exit 1 if any query mismatches.
"""
import sys, os, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return f"{float(v):.10g}"
    except Exception:
        pass
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    # version telemetry: a hash mismatch that reproduces nowhere else is
    # usually an engine-version drift — record both sides' versions in
    # the run log (Verify writes its JVM/Spark twin to _env.json, and
    # the env_canary gate names the drifted construct)
    print(f"duckdb={duckdb.__version__} python={sys.version.split()[0]}")
    env_path = os.path.join(out_dir, "_env.json")
    if os.path.exists(env_path):
        with open(env_path, encoding="utf-8") as f:
            print("spark_env=" + f.read().strip())
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/oracle_sql.json", encoding="utf-8") as f:
        oracle = json.load(f)
    failures, checked, rows_only = [], 0, []
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            failures.append((name, "no parquet output"))
            continue
        got = con.sql(f"SELECT * FROM '{d}/*.parquet'")
        got_cols = got.columns
        got_rows = got.fetchall()
        if name not in oracle:
            rows_only.append((name, len(got_rows)))
            continue
        checked += 1
        try:
            exp = con.sql(oracle[name])
            exp_cols = exp.columns
            exp_rows = exp.fetchall()
        except Exception as e:
            failures.append((name, f"oracle SQL error: {e}"))
            continue
        if sorted(c.lower() for c in got_cols) != sorted(c.lower() for c in exp_cols):
            failures.append((name, f"schema mismatch: {got_cols} vs {exp_cols}"))
            continue
        gi = sorted(range(len(got_cols)), key=lambda i: got_cols[i].lower())
        ei = sorted(range(len(exp_cols)), key=lambda i: exp_cols[i].lower())
        g = sorted(tuple(norm(r[i]) for i in gi) for r in got_rows)
        e = sorted(tuple(norm(r[i]) for i in ei) for r in exp_rows)
        if len(g) != len(e):
            failures.append((name, f"row count: {len(g)} vs {len(e)}"))
        elif g != e:
            diff = next((a, b) for a, b in zip(g, e) if a != b)
            failures.append((name, f"value mismatch, first diff: {diff[0]} vs {diff[1]}"))
    seen = {d.rstrip("/").split("/")[-1] for d in glob.glob(f"{out_dir}/*/")}
    for name in sorted(set(oracle) - seen):
        failures.append((name, "query produced no output directory"))
    print(f"checked={checked} rows_only={[(n, r) for n, r in rows_only]}")
    for n, r in rows_only:
        if r == 0:
            failures.append((n, "rows-only check: 0 rows"))
    if failures:
        for n, m in failures:
            print(f"FAIL {n}: {m}")
        sys.exit(1)
    print("ALL MATCH")

if __name__ == "__main__":
    main()
