#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/oracle_check.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet dir written by graft.Verify plus oracle_sql.json,
runs every oracle statement in DuckDB with the sf tables registered as views,
and compares: row count, column-name set, and exact values after sorting
columns by name and rows by all columns (strictest plausible interpretation
of the driver's hash compare — if this passes, any sane hash passes).
"""
import json
import sys
import glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = []
    for name, sql in sorted(oracle.items()):
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            failures.append((name, "no spark output"))
            print(f"FAIL {name}: no spark output parquet")
            continue
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet({files!r})").df()
            exp = con.sql(sql).df()
            gt = {r[0]: r[1] for r in con.sql(
                f"DESCRIBE SELECT * FROM read_parquet({files!r})").fetchall()}
            et = {r[0]: r[1] for r in con.sql(f"DESCRIBE {sql}").fetchall()}
        except Exception as e:
            failures.append((name, f"query error: {e}"))
            print(f"FAIL {name}: {e}")
            continue
        # type-parity gate (round-4 verdict item #2): the driver's hash is
        # type/byte-sensitive — a HUGEINT-vs-BIGINT or DATE-vs-TIMESTAMP skew
        # red-flags a query whose VALUES match. Assert DuckDB-level types of
        # the Spark parquet output == the oracle result, exactly.
        tdiff = [(c, gt.get(c), et.get(c)) for c in sorted(set(gt) | set(et))
                 if type_key(gt.get(c)) != type_key(et.get(c))]
        if tdiff:
            msg = "type skew: " + ", ".join(
                f"{c} spark={g} oracle={e}" for c, g, e in tdiff)
            print(f"FAIL {name}: {msg}")
            failures.append((name, msg))
            continue
        ok, msg = compare(got, exp)
        status = "ok  " if ok else "FAIL"
        print(f"{status} {name}: {msg}")
        if not ok:
            failures.append((name, msg))
    print(f"\n{len(oracle) - len(failures)}/{len(oracle)} queries match")
    sys.exit(1 if failures else 0)


def type_key(t):
    # strict identity, no widening tolerance: INTEGER != BIGINT != HUGEINT,
    # DATE != TIMESTAMP. Only notational aliases collapse.
    return None if t is None else str(t).upper().replace(
        "TIMESTAMP WITH TIME ZONE", "TIMESTAMPTZ")


def compare(got, exp):
    import pandas as pd
    gc, ec = sorted(got.columns), sorted(exp.columns)
    if gc != ec:
        return False, f"columns differ: spark={gc} oracle={ec}"
    if len(got) != len(exp):
        return False, f"row count differs: spark={len(got)} oracle={len(exp)}"
    g = got[gc].sort_values(by=gc, ignore_index=True)
    e = exp[ec].sort_values(by=ec, ignore_index=True)
    for c in gc:
        gv, ev = g[c], e[c]
        if str(gv.dtype) != str(ev.dtype):
            # tolerate dtype mismatch (e.g. int32 vs int64) but compare values
            try:
                gv = gv.astype(ev.dtype)
            except Exception:
                gv = gv.astype(str)
                ev = ev.astype(str)
        neq = ~((gv == ev) | (gv.isna() & ev.isna()))
        if neq.any():
            i = neq.idxmax()
            return False, (f"col {c}: {int(neq.sum())} mismatches, first at "
                           f"row {i}: spark={gv[i]!r} oracle={ev[i]!r}")
    return True, f"{len(got)} rows, {len(gc)} cols exact"


if __name__ == "__main__":
    main()
