#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: verify_local.py <verify_out_dir> <sf_dir> [query ...]

Reads <out>/oracle_sql.json, runs each oracle in DuckDB with views over
the sf_dir parquet tables, loads the Spark result parquet from
<out>/<name>/, and compares: columns sorted by name, rows sorted by all
columns, values compared exactly (floats to 1e-9 relative, with an
exact-equality flag reported too, since the driver hash-compares).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(rows):
    out = []
    for r in rows:
        out.append(tuple(str(v) if not isinstance(v, float) else f"{v!r}"
                         for v in r))
    return sorted(out)


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            exp = con.sql(sql)
            exp_cols = sorted(exp.columns)
            # the driver loads the oracle through pandas: HUGEINT /
            # DECIMAL columns become float64/object there and the hash
            # compare fails even when values match (bit us on
            # d05_simhash: DuckDB SUM(BIGINT) -> HUGEINT). Flag them.
            bad_types = [(c, str(t)) for c, t in zip(exp.columns, exp.types)
                         if str(t) in ("HUGEINT", "UHUGEINT")
                         or str(t).startswith("DECIMAL(")]
            if bad_types:
                print(f"FAIL {name}: oracle column types unsafe for the "
                      f"driver's pandas hash compare: {bad_types} — add "
                      f"CAST(... AS BIGINT/DOUBLE) in the oracle SQL")
                n_fail += 1
                continue
            exp_rows = con.sql(
                f"SELECT {', '.join(exp_cols)} FROM exp").fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:300]}")
            n_fail += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = sorted(got.columns)
            got_rows = con.sql(
                f"SELECT {', '.join(got_cols)} FROM got").fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {str(e)[:200]}")
            n_fail += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns differ: spark={got_cols} oracle={exp_cols}")
            n_fail += 1
            continue
        if len(got_rows) != len(exp_rows):
            print(f"FAIL {name}: row count spark={len(got_rows)} oracle={len(exp_rows)}")
            n_fail += 1
            continue
        g, e = norm(got_rows), norm(exp_rows)
        if g == e:
            print(f"PASS {name} ({len(g)} rows, exact)")
            n_pass += 1
            continue
        # float-tolerant second pass (sort via stringified key: raw
        # tuples with None are unorderable in Python 3)
        def skey(r):
            return tuple(str(v) for v in r)
        bad = None
        for gr, er in zip(sorted(got_rows, key=skey),
                          sorted(exp_rows, key=skey)):
            for gv, ev in zip(gr, er):
                if gv == ev:
                    continue
                if isinstance(gv, float) and isinstance(ev, float):
                    if math.isclose(gv, ev, rel_tol=1e-9, abs_tol=1e-12):
                        continue
                bad = (gv, ev)
                break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: value mismatch e.g. spark={bad[0]!r} oracle={bad[1]!r}")
            n_fail += 1
        else:
            print(f"WARN {name}: float-close but NOT bit-exact ({len(g)} rows)"
                  f" — driver hash compare may fail")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
