#!/usr/bin/env python3
"""Local pre-check of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/local_verify.py [sfDir] [outDir]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` was already run (or
runs it when --run is passed). For every query parquet in outDir, runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sfDir tables
and compares: schema (column names), row count, and values both in-order
and order-insensitive (sorted by all columns).
"""
import json, math, sys, subprocess

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def type_class(t):
    """Collapse DuckDB type names into the equivalence classes the
    driver's hasher treats identically. Widths it provably normalizes
    (int32 vs int64) share a class; HUGEINT (int128 / Arrow decimal128)
    does NOT — it hashed differently from BIGINT in round 6 despite
    equal values, so it must be its own class. Same for DECIMAL vs
    float: silent type drift between the Spark output and the oracle is
    exactly what this gate exists to catch before the driver does."""
    t = t.upper()
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER"):
        return "int"
    if t in ("HUGEINT", "UBIGINT", "UHUGEINT"):
        return "int128"
    if t.startswith("DECIMAL"):
        return "decimal"
    if t in ("FLOAT", "REAL", "DOUBLE"):
        return "float"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    return t


def col_types(con, query):
    """name -> type_class for a query's output columns, via DESCRIBE."""
    rows = con.execute(f"DESCRIBE {query}").fetchall()
    return {r[0]: type_class(r[1]) for r in rows}


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # 17 significant digits round-trips IEEE doubles exactly, matching
        # the driver's bit-level comparison (10g was looser than the gate)
        return f"{v:.17g}"
    return str(v)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    out_dir = args[1] if len(args) > 1 else "/tmp/verify_out"
    if "--run" in sys.argv:
        subprocess.run(
            ["sbt", "-batch", f'runMain graft.Verify {sf_dir} {out_dir}'],
            cwd="/root/repo", check=True)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchall()
            got_cols = [d[0] for d in con.description]
            exp = con.execute(sql).fetchall()
            exp_cols = [d[0] for d in con.description]
            got_types = col_types(
                con, f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            exp_types = col_types(con, f"({sql})")
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        type_mismatch = [
            (c, got_types[c], exp_types[c])
            for c in sorted(set(got_types) & set(exp_types))
            if got_types[c] != exp_types[c]]
        # driver sorts columns by name before hashing values
        gi = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
        ei = sorted(range(len(exp_cols)), key=lambda i: exp_cols[i])
        g = [tuple(norm(r[i]) for i in gi) for r in got]
        e = [tuple(norm(r[i]) for i in ei) for r in exp]
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: cols {sorted(got_cols)} vs {sorted(exp_cols)}")
            n_fail += 1
        elif type_mismatch:
            print(f"FAIL {name}: type mismatch (spark vs oracle): "
                  f"{type_mismatch}")
            n_fail += 1
        elif len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
            n_fail += 1
        elif g != e:
            n_fail += 1
            if sorted(g) == sorted(e):
                print(f"FAIL {name}: values match only after row sort")
            else:
                diff = [(i, a, b) for i, (a, b) in enumerate(zip(g, e)) if a != b][:3]
                print(f"FAIL {name}: value mismatch, first diffs: {diff}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(g)} rows)")
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
