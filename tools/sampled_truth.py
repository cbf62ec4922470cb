#!/usr/bin/env python3
"""Sampled-truth verification for the two entries whose full oracles are
deliberately all-pairs and therefore sf0.01-only (d05 n-gram Jaccard,
d19 containment): exact brute-force DuckDB truth over a FIXED hash
sample of documents (md5_32(doc_id) % 50 == 0, ~2% — density-
independent, so it covers every ScaleUp replica, unlike an id prefix),
compared cell-exactly against the full engine pipeline's output
restricted to pairs touching the sample. This is d14_lsh_eval's
fixed-probe discipline applied as a verification protocol: the engine
runs the COMPLETE corpus-scale pipeline; only the *truth* is sampled.

The brute force keeps d05's lossless length bound (theta*|a| <= |b| <=
|a|/theta follows from jac >= theta) purely as a cost cut — it cannot
change the answer.

Usage: tools/sampled_truth.py <sfDir> <engineOutDir>
  where <engineOutDir> holds graft.Verify's d05_ngram_jaccard.parquet /
  d19_containment.parquet for the same sfDir.
Exit code = number of mismatching entries.
"""
import sys
import duckdb

SAMPLE = "(('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 8))::BIGINT % 50 = 0)"

D05_TRUTH = """
WITH sh AS (
  SELECT doc_id, list_sort(list_distinct(
           [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
            for i in range(1, len(toks) - 1)])) AS s,
         {sample} AS samp
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
  WHERE len(toks) >= 3)
SELECT a.doc_id AS i, b.doc_id AS j,
  len(list_intersect(a.s, b.s)) /
    (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jac
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE (a.samp OR b.samp)
  AND len(b.s) >= ceil(len(a.s) * 0.6) AND len(b.s) <= floor(len(a.s) / 0.6)
  AND len(list_intersect(a.s, b.s)) /
    (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.6
ORDER BY i, j
""".format(sample=SAMPLE.format(col="doc_id"))

D19_TRUTH = """
WITH sh AS (
  SELECT doc_id, list_sort(list_distinct(
           [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
            for i in range(1, len(toks) - 1)])) AS s,
         {sample} AS samp
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
  WHERE len(toks) >= 3)
SELECT a.doc_id AS i, b.doc_id AS j,
  len(list_intersect(a.s, b.s))::DOUBLE / len(a.s) AS containment
FROM sh a JOIN sh b ON a.doc_id <> b.doc_id
WHERE (a.samp OR b.samp)
  AND len(b.s) >= ceil(len(a.s) * 0.9)
  AND len(list_intersect(a.s, b.s))::DOUBLE / len(a.s) >= 0.9
ORDER BY i, j
""".format(sample=SAMPLE.format(col="doc_id"))

ENGINE_RESTRICT = """
SELECT * FROM '{out}/{name}/*.parquet'
WHERE {si} OR {sj}
ORDER BY i, j
"""


def check(con, name, truth_sql, out_dir):
    truth = con.execute(truth_sql).fetchall()
    got = con.execute(ENGINE_RESTRICT.format(
        out=out_dir, name=name,
        si=SAMPLE.format(col="i"), sj=SAMPLE.format(col="j"))).fetchall()
    ok = truth == got
    n_sample = con.execute(
        "SELECT count(*) FROM documents WHERE "
        + SAMPLE.format(col="doc_id")).fetchone()[0]
    print(f"{'OK  ' if ok else 'FAIL'} {name}: sample_docs={n_sample} "
          f"truth_pairs={len(truth)} engine_pairs={len(got)} exact={ok}")
    if not ok:
        ts, gs = set(truth), set(got)
        for r in list(ts - gs)[:5]:
            print("  missing from engine:", r)
        for r in list(gs - ts)[:5]:
            print("  extra in engine:   ", r)
    return ok


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for pat in (f"{sf_dir}/documents.parquet", f"{sf_dir}/documents.parquet/*.parquet"):
        try:
            con.execute(f"CREATE OR REPLACE VIEW documents AS SELECT * FROM '{pat}'")
            con.execute("SELECT count(*) FROM documents").fetchone()
            break
        except duckdb.IOException:
            continue
    bad = 0
    bad += 0 if check(con, "d05_ngram_jaccard", D05_TRUTH, out_dir) else 1
    bad += 0 if check(con, "d19_containment", D19_TRUTH, out_dir) else 1
    sys.exit(bad)


if __name__ == "__main__":
    main()
