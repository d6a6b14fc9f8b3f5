#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the raw testdata tables, load the Verify.scala parquet dump of the
same query, canonicalize (sort columns by name, round floats to 6dp), and
hash-compare. Usage: check_oracle.py <sfDir> <verifyOutDir>"""
import json, sys, math
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(v):
    if isinstance(v, float):
        # bit-exact: every declared query is engineered to produce identical
        # doubles in Spark and DuckDB (decimal-routed sums, fixed fold
        # order); comparing full precision catches association regressions
        if math.isnan(v): return "NaN"
        return repr(v)
    if isinstance(v, dict):
        # the DRIVER's canonicalizer (pandas sort_values) cannot order dict
        # cells — a struct-typed output column fails its gate even when
        # values match. Surface that here instead of silently passing.
        raise TypeError("struct-typed output column (driver-incompatible); "
                        "render structs with to_json on both sides")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return repr(v)

# Types the DRIVER's pandas canonicalizer renders lossily: DuckDB HUGEINT and
# DECIMAL become float64 in pandas (3 -> 3.0), so the driver's hash can NEVER
# match Spark's integer/double rendering even when values are identical (this
# is exactly how dq66 shipped red in round 3 while this script passed — its
# fetchall() yields Python ints, not pandas floats). Gate them at the schema.
DRIVER_LOSSY = ("HUGEINT", "UHUGEINT", "DECIMAL")

fails = 0
for name, sql in sorted(oracle.items()):
    try:
        rel = con.sql(sql)
        lossy = [(c[0], str(t)) for c, t in zip(rel.description, rel.types)
                 if str(t).upper().startswith(DRIVER_LOSSY)]
        if lossy:
            fails += 1
            print(f"FAIL {name}: oracle column(s) {lossy} have driver-lossy "
                  f"types (pandas renders HUGEINT/DECIMAL as float64; "
                  f"CAST to BIGINT/DOUBLE in the SQL)")
            continue
        want = rel.fetchall()
        want_cols = [d[0] for d in rel.description]
        got_rel = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
        got_cols = [d[0] for d in got_rel.description]
        got = got_rel.fetchall()
        # sort columns by name (driver behavior)
        wi = sorted(range(len(want_cols)), key=lambda i: want_cols[i])
        gi = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
        if sorted(want_cols) != sorted(got_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(want_cols)}")
            fails += 1
            continue
        wrows = [tuple(canon(r[i]) for i in wi) for r in want]
        grows = [tuple(canon(r[i]) for i in gi) for r in got]
        if wrows == grows:
            print(f"OK   {name} ({len(grows)} rows)")
        else:
            fails += 1
            print(f"FAIL {name}: rows {len(grows)} vs {len(wrows)}")
            for j, (w, g) in enumerate(zip(wrows, grows)):
                if w != g:
                    print(f"  first diff at row {j}:\n    oracle: {w}\n    spark:  {g}")
                    break
    except Exception as e:
        fails += 1
        print(f"ERROR {name}: {e}")
print(f"\n{'ALL GREEN' if fails == 0 else str(fails) + ' FAILURES'}")
sys.exit(1 if fails else 0)
