#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare (builder tooling,
not engine code). Reads Verify output parquet + oracle_sql.json, runs each
SQL in DuckDB over the sf tables, and diffs: row count, schema (sorted
column names), and per-column values (exact after the queries' own
rounding). Usage: check_oracle.py <sfDir> <verifyOut>"""
import sys, json, glob
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fail += 1; continue
    try:
        got = con.sql(f"SELECT * FROM '{files[0]}'").fetchall()
        gotrel = con.sql(f"SELECT * FROM '{files[0]}' LIMIT 0")
        gotcols, gottypes = list(gotrel.columns), [str(t) for t in gotrel.types]
        exp = con.sql(sql).fetchall()
        exprel = con.sql(f"SELECT * FROM ({sql}) LIMIT 0")
        expcols, exptypes = list(exprel.columns), [str(t) for t in exprel.types]
    except Exception as e:
        print(f"FAIL {name}: {e}"); fail += 1; continue
    if sorted(gotcols) != sorted(expcols):
        print(f"FAIL {name}: cols {sorted(gotcols)} != {sorted(expcols)}"); fail += 1; continue
    # The driver's hash is TYPED, but only as far as pandas dtypes
    # stringify: INTEGER/BIGINT/UBIGINT all print the same value, so
    # width mismatches are benign (10 long-green queries have them).
    # HUGEINT is the killer — pandas degrades int128 to float64, so the
    # stringified value changes and the hash breaks (q_incr_mv, rounds
    # 9-10). DECIMAL-vs-DOUBLE and FLOAT-vs-DOUBLE also change the
    # printed value, so those stay flagged too.
    def norm(t):
        return ("INT" if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
                               "UTINYINT", "USMALLINT", "UINTEGER",
                               "UBIGINT") else t)
    gottypes = [norm(t) for t in gottypes]
    exptypes = [norm(t) for t in exptypes]
    gt = dict(zip(gotcols, gottypes)); et = dict(zip(expcols, exptypes))
    typebad = [(c, gt[c], et[c]) for c in sorted(gotcols) if gt[c] != et[c]]
    if typebad:
        print(f"FAIL {name}: column types differ (spark-parquet vs oracle): " +
              ", ".join(f"{c} {g}!={e}" for c, g, e in typebad))
        fail += 1; continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} != {len(exp)}"); fail += 1; continue
    gi = [gotcols.index(c) for c in sorted(gotcols)]
    ei = [expcols.index(c) for c in sorted(expcols)]
    bad = None
    for r, (g, e) in enumerate(zip(got, exp)):
        gv = tuple(g[i] for i in gi); ev = tuple(e[i] for i in ei)
        if gv != ev:
            bad = (r, gv, ev); break
    if bad:
        print(f"FAIL {name}: row {bad[0]}\n  got {bad[1]}\n  exp {bad[2]}"); fail += 1
    else:
        print(f"OK   {name} ({len(got)} rows)")
print(f"{'ALL OK' if fail == 0 else str(fail) + ' FAILURES'}")
sys.exit(1 if fail else 0)
