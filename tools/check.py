#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), registers the
sfDir parquet tables as DuckDB views, runs each oracle SQL, and compares to
the Spark-written parquet under <verifyOutDir>/<name>/ — columns sorted by
name, values compared exactly (after the queries' own round()), rows compared
as sorted multisets.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(rows):
    out = []
    for r in rows:
        vals = []
        for v in r:
            if hasattr(v, "tolist"):  # numpy array from list columns
                v = tuple(v.tolist())
            elif isinstance(v, list):
                v = tuple(v)
            elif isinstance(v, float) and v != v:  # NaN/NULL double
                v = None
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = con.execute(sql).fetch_df()
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetch_df()
            want = want[sorted(want.columns)]
            got = got[sorted(got.columns)]
            if list(want.columns) != list(got.columns):
                print(f"FAIL {name}: columns {list(got.columns)} != "
                      f"{list(want.columns)}")
                n_fail += 1
                continue
            # The driver's gate hashes VALUE REPRS, so an int column on one
            # side vs float on the other (DuckDB HUGEINT -> pandas float64)
            # or a Decimal-object column (Spark DECIMAL output) mismatches
            # even when numerically equal — the r03 q92/q100 failure mode
            # this == -based compare missed. int32-vs-int64 is benign
            # (both render as Python ints).
            kind_bad = []
            for c in want.columns:
                kw, kg = want[c].dtype.kind, got[c].dtype.kind
                if ("f" in (kw, kg)) and ({kw, kg} & set("iu")):
                    kind_bad.append(f"{c}: oracle {want[c].dtype} "
                                    f"vs spark {got[c].dtype}")
                for side, col in (("oracle", want[c]), ("spark", got[c])):
                    if col.dtype.kind == "O" and any(
                            type(v).__name__ == "Decimal"
                            for v in col.dropna().head(1)):
                        kind_bad.append(f"{c}: {side} is DECIMAL")
            if kind_bad:
                print(f"FAIL {name}: dtype divergence {kind_bad}")
                n_fail += 1
                continue
            w = norm(want.itertuples(index=False, name=None))
            g = norm(got.itertuples(index=False, name=None))
            if len(w) != len(g):
                print(f"FAIL {name}: rows {len(g)} != {len(w)}")
                n_fail += 1
                continue
            bad = [(a, b) for a, b in zip(g, w) if a != b]
            if bad:
                print(f"FAIL {name}: {len(bad)} mismatched rows; first: "
                      f"got={bad[0][0]} want={bad[0][1]}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(w)} rows)")
                n_pass += 1
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
