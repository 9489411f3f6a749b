"""Replicate the driver's correctness gate locally: run every
queries() entry on Spark at sf0.01 and compare row count, sorted
column names, and an order-insensitive value hash against the DuckDB
oracle_sql(). Usage:

    python tools/check_contract.py [sf_dir] [query ...]

Extra args restrict the run to the named queries. Set
CONTRACT_OUT=/path/file.json to also write the results as a
driver-format JSON artifact ({name: {rows_match, schema_match,
hash_match, spark_rows, oracle_rows, err}}) covering EVERY query run
— the per-round driver snapshot truncates at 50 dict entries, so the
committed full artifact is this file's output (VERDICT r4 item 2).
Per-query exceptions are recorded in `err` instead of aborting the
sweep.
"""

import hashlib
import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def value_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(_norm(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return f"{v:.6g}"
    return str(v)


def _norm_lines(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_norm(r[i]) for i in order) for r in rows)


def dump_hash_diff(name, srows, scols, orows, ocols, limit=20):
    """Self-diagnosing hash mismatch (VERDICT r5 item 1): print the
    first `limit` normalized lines present on only one side, so a
    driver-side failure identifies the differing VALUES instead of
    just a hash pair. Sorted-merge over the two sorted line lists —
    no quadratic set work on big results."""
    sl, ol = _norm_lines(srows, scols), _norm_lines(orows, ocols)
    i = j = shown = 0
    print(f"{name}: hash diff (spark-only '<', oracle-only '>'):")
    while (i < len(sl) or j < len(ol)) and shown < limit:
        a = sl[i] if i < len(sl) else None
        b = ol[j] if j < len(ol) else None
        if a == b:
            i += 1
            j += 1
            continue
        if b is None or (a is not None and a < b):
            print(f"  < {a}")
            i += 1
        elif a is None or b < a:
            print(f"  > {b}")
            j += 1
        shown += 1
    if shown == limit:
        print("  ... (diff truncated)")


def main():
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("contract-check")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    qs = entrymod.queries()
    only = set(sys.argv[2:])
    if only:
        unknown = only - set(qs)
        if unknown:
            sys.exit(f"unknown queries: {sorted(unknown)}")
        qs = {k: v for k, v in qs.items() if k in only}
    oracles = entrymod.oracle_sql()
    results = {}
    failures = 0
    for name, fn in qs.items():
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception:
            failures += 1
            err = traceback.format_exc(limit=3)
            results[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": None,
                "oracle_rows": None, "err": err.strip().splitlines()[-1],
            }
            print(f"{name}: FAIL (spark error) {results[name]['err']}")
            continue
        if name not in oracles:
            results[name] = {
                "rows_match": None, "schema_match": None,
                "hash_match": None, "spark_rows": len(srows),
                "oracle_rows": None, "err": None,
                "note": "rows-only: no oracle (estimator query; "
                        "bounds pytest-asserted)",
            }
            print(f"{name}: rows-only check — spark rows={len(srows)}")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception:
            failures += 1
            err = traceback.format_exc(limit=3)
            results[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": len(srows),
                "oracle_rows": None, "err": err.strip().splitlines()[-1],
            }
            print(f"{name}: FAIL (oracle error) {results[name]['err']}")
            continue
        ok_schema = sorted(scols) == sorted(ocols)
        ok_rows = len(srows) == len(orows)
        sh, oh = value_hash(srows, scols), value_hash(orows, ocols)
        ok_hash = sh == oh
        status = "OK" if (ok_schema and ok_rows and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
        results[name] = {
            "rows_match": ok_rows, "schema_match": ok_schema,
            "hash_match": ok_hash, "spark_rows": len(srows),
            "oracle_rows": len(orows), "err": None,
        }
        print(
            f"{name}: {status} rows {len(srows)}/{len(orows)} "
            f"schema {sorted(scols)}=={sorted(ocols)}:{ok_schema} hash {sh}/{oh}"
        )
        if ok_schema and not ok_hash:
            dump_hash_diff(name, srows, scols, orows, ocols)
    out = os.environ.get("CONTRACT_OUT")
    if out:
        with open(out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {out}: {len(results)} queries, {failures} failures")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
