#!/usr/bin/env python3
"""Local predictor of the driver's correctness gate.

Runs DuckDB oracle SQL (from Verify's oracle_sql.json) against the shared
parquet tables and diffs against the Spark-produced parquet dumps,
cell-by-cell after normalization (sorted rows, sorted column names).
Exact match expected — floats are compared bit-for-bit since both engines
round computed values identically by construction.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    # datetimes/dates → isoformat; duckdb may hand back ns-precision
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return repr(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_noora = 0
    names = sorted(set(
        p.split("/")[-1] for p in glob.glob(f"{out_dir}/*") if "." not in p.split("/")[-1]))
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchall()
        got_cols = [d[0] for d in con.description]
        if name not in oracle:
            print(f"ROWS-ONLY {name}: {len(got)} rows")
            n_noora += 1
            continue
        try:
            exp = con.execute(oracle[name]).fetchall()
            exp_cols = [d[0] for d in con.description]
        except Exception as ex:
            print(f"FAIL {name}: oracle error {ex}")
            n_fail += 1
            continue
        gc, g = norm_rows(got_cols, got)
        ec, e = norm_rows(exp_cols, exp)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} vs oracle {ec}")
            n_fail += 1
        elif g != e:
            n_fail += 1
            print(f"FAIL {name}: {len(g)} vs {len(e)} rows; first diffs:")
            shown = 0
            for i in range(max(len(g), len(e))):
                a = g[i] if i < len(g) else None
                b = e[i] if i < len(e) else None
                if a != b:
                    print(f"  spark: {a}\n  duck : {b}")
                    shown += 1
                    if shown >= 3:
                        break
        else:
            print(f"PASS {name}: {len(g)} rows")
            n_pass += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_noora} rows-only ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
