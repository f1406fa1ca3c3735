#!/usr/bin/env python3
"""Bounded sf1 truth replay for the quadratic-oracle rows (builder
tooling). The all-pairs similarity oracles are O(n^2 * dim) in DuckDB at
sf1 — hours of CPU — so the full-corpus ENGINE output is attested on a
deterministic id sample instead: for a pairwise-independent miner (pair
presence depends only on the two endpoints), the engine's pairs
restricted to S x S must EQUAL the oracle's exact pairs computed on the
S-restricted corpus. Precision and recall are both exact on the sample;
values (jaccard/cos/hamming) compare exactly too.

Handled rows and why restriction is sound:
  q_dedup_jaccard / q_dedup_minhash  exact Jaccard >= t (minhash output
                                     is exact-verified => same truth)
  q_dedup_simhash                    pairwise Hamming <= 6
  q_cross_lang_dups                  pairwise Jaccard + per-doc langs
  q_cosine_pairs                     pairwise cosine >= t
  q_dedup_prefix                     pairwise prefix containment; the
                                     oracle's synthetic truncations
                                     (doc_id+1000000) sample with their
                                     base doc

Derived rows (clusters, dup matrix, curation funnel, preference pairs,
span coverage) consume these attested pair layers through plain
deterministic plan code already pinned by specs at sf0.01/0.1.

Usage: sampled_truth.py <sfDir> <verifyOut> [modulus]
"""
import sys, json, glob
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
M = int(sys.argv[3]) if len(sys.argv) > 3 else 10

con = duckdb.connect()
# S-restricted corpus views: the oracle SQL runs UNCHANGED on these
con.sql(f"""CREATE VIEW documents AS
  SELECT * FROM '{sfdir}/documents.parquet' WHERE doc_id % {M} = 0""")
con.sql(f"""CREATE VIEW embeddings AS
  SELECT * FROM '{sfdir}/embeddings.parquet' WHERE vec_id % {M} = 0""")
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

# (query, key columns, id->sample-base mapping SQL expr template)
HANDLED = [
    ("q_dedup_jaccard",  ("doc_a", "doc_b"), "({c} % 1000000)"),
    ("q_dedup_minhash",  ("doc_a", "doc_b"), "({c} % 1000000)"),
    ("q_dedup_simhash",  ("doc_a", "doc_b"), "({c} % 1000000)"),
    ("q_cross_lang_dups", ("doc_a", "doc_b"), "({c} % 1000000)"),
    ("q_dedup_prefix",   ("doc_a", "doc_b"), "({c} % 1000000)"),
    ("q_cosine_pairs",   ("vec_a", "vec_b"), "{c}"),
]

fail = 0
results = {}
for name, keys, basemap in HANDLED:
    if name not in oracle:
        print(f"SKIP {name}: no oracle registered"); continue
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no engine output"); fail += 1
        results[name] = "fail"; continue
    ka, kb = keys
    pa, pb = basemap.format(c=ka), basemap.format(c=kb)
    got = con.sql(
        f"""SELECT * FROM '{files[0]}'
            WHERE {pa} % {M} = 0 AND {pb} % {M} = 0
            ORDER BY {ka}, {kb}""").fetchall()
    try:
        exp = con.sql(
            f"SELECT * FROM ({oracle[name]}) ORDER BY {ka}, {kb}"
        ).fetchall()
    except Exception as e:
        print(f"FAIL {name}: oracle on sample: {e}"); fail += 1
        results[name] = "fail"; continue
    if got == exp:
        print(f"OK   {name} sampled-truth ({len(got)} pairs, M={M})")
        results[name] = "ok"
    else:
        extra = set(map(tuple, got)) - set(map(tuple, exp))
        missing = set(map(tuple, exp)) - set(map(tuple, got))
        print(f"FAIL {name}: engine^S={len(got)} truth(S)={len(exp)} "
              f"extra={len(extra)} missing={len(missing)} "
              f"e.g. extra={list(extra)[:2]} missing={list(missing)[:2]}")
        fail += 1
        results[name] = "fail"

print("ALL OK" if fail == 0 else f"{fail} FAILURES")
# Durable attestation record (r16): check_oracle_budget.py consults
# this file so a QUAD-deferred row without a sampled-truth result in
# the SAME output dir fails the budget sweep's exit code — the
# deferred attestation can no longer be silently skipped.
json.dump({"modulus": M, "results": results},
          open(f"{outdir}/sampled_truth.json", "w"), indent=1)
sys.exit(1 if fail else 0)
