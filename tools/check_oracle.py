#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query result parquet under <outDir>, runs the matching oracle
SQL from oracle_sql.json in DuckDB (with the fixture tables registered
as views), then compares row count, column names, and a hash of the
row-sorted, column-name-sorted values.

Usage: python3 tools/check_oracle.py <sfDir> <outDir> [--json <path>]

--json writes the per-query result map in the driver's
CORRECTNESS_r{N}.json format (rows_match/schema_match/hash_match/
spark_rows/oracle_rows/err) — used to commit the standing full-board
sf0.1 artifact (CORRECTNESS_sf01.json).
"""
import sys, os, json, hashlib
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize cell values to stable strings
    def cell(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "NULL"
        if pd.api.types.is_scalar(v) and pd.isna(v):
            return "NULL"
        if isinstance(v, float):
            return repr(v)
        return str(v)
    out = df.map(cell)
    out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    return out


def h(df: pd.DataFrame) -> str:
    m = hashlib.sha256()
    m.update(("|".join(df.columns) + "\n").encode())
    for row in df.itertuples(index=False):
        m.update(("\x1f".join(row) + "\n").encode())
    return m.hexdigest()


def main(sf_dir: str, out_dir: str, json_out: str = None):
    results = {}
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = 0
    for name in names:
        got = con.sql(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        if name not in oracle:
            print(f"[rows-only] {name}: rows={len(got)}")
            results[name] = {"rows_match": None, "schema_match": None,
                             "hash_match": None, "spark_rows": len(got),
                             "oracle_rows": None, "err": None}
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"[FAIL] {name}: oracle error: {e}")
            results[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "spark_rows": len(got),
                             "oracle_rows": None, "err": str(e)[:500]}
            n_fail += 1
            continue
        gc, ec = canon(got), canon(exp)
        ok_schema = list(gc.columns) == list(ec.columns)
        ok_rows = len(gc) == len(ec)
        ok_hash = ok_schema and ok_rows and h(gc) == h(ec)
        results[name] = {"rows_match": ok_rows, "schema_match": ok_schema,
                         "hash_match": ok_hash, "spark_rows": len(gc),
                         "oracle_rows": len(ec), "err": None}
        if ok_hash:
            print(f"[ok]   {name}: rows={len(gc)}")
            n_pass += 1
        else:
            print(f"[FAIL] {name}: schema={ok_schema} rows={len(gc)}/{len(ec)} hash={ok_hash}")
            if not ok_schema:
                print(f"       got cols: {list(gc.columns)}\n       exp cols: {list(ec.columns)}")
            if ok_schema and ok_rows:
                diff = gc.compare(ec) if gc.shape == ec.shape else None
                if diff is not None and not diff.empty:
                    print(diff.head(10).to_string())
            elif ok_schema:
                print("       got head:\n", gc.head(5).to_string())
                print("       exp head:\n", ec.head(5).to_string())
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, {len(names)} total")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
        print(f"== wrote {json_out}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    args = sys.argv[1:]
    jpath = None
    if "--json" in args:
        i = args.index("--json")
        jpath = args[i + 1]
        args = args[:i] + args[i + 2:]
    main(args[0], args[1], jpath)
