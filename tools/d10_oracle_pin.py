#!/usr/bin/env python3
"""Pin d10's recursive-CTE oracle against a driver-loop replica of the
quantizer spec, level by level, on a deterministic fixture.

Why: d10's oracle is the catalog's most intricate DuckDB text — a
depth-recursive CTE whose per-level windows, argmin tie-breaks
(self-preference first, then score, then cell id) and descent joins must
keep matching the Spark engine's driver-loop. The sf0.01 correctness
gate compares oracle vs engine on real data, but a DuckDB semantic
shift that changed oracle AND happened to change it consistently with
nothing else would surface only as an opaque hash mismatch. This tool
re-derives each CTE level (lv cells, ed parent edges, a1 assignment,
final output) in plain Python — integer-valued vectors make every dot
product exact, so the replica is bit-faithful — and diffs them against
DuckDB's evaluation of the ORACLE'S OWN TEXT (read from a Verify dump's
oracle_sql.json, so the pinned text is exactly what ships).

Fixture: 16384 vectors, dim 4, components = small LCG integers
=> k = 64, lmax = 1 (the recursion actually runs one level).

Usage: tools/d10_oracle_pin.py <oracle_sql.json>
Exit 0 iff every level matches.
"""
import hashlib
import json
import math
import sys

import duckdb

N, DIM = 16384, 4


def gen():
    rows, x = [], 1234567
    for vid in range(N):
        v = []
        for _ in range(DIM):
            x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            v.append(float((x >> 33) % 10))
        rows.append((vid, v))
    return rows


def md5h(vid):
    return int(hashlib.md5(str(vid).encode()).hexdigest()[:8], 16)


def dot(a, b):
    return sum(x * y for x, y in zip(a, b))


def replica(rows):
    k = max(8, N // 256)
    lmax = next(j for j in range(13) if k <= 32 ** (j + 1))
    # centroids: per cell, member with (min h, then min vec_id)
    best = {}
    for vid, v in rows:
        h = md5h(vid)
        cell = h % k
        key = (h, vid)
        if cell not in best or key < best[cell][0]:
            best[cell] = (key, vid)
    c0 = []  # (cell, c, cn) ordered by cell -> rank r is list index
    vecs = dict(rows)
    for cell in sorted(best):
        c = vecs[best[cell][1]]
        c0.append((cell, c, dot(c, c)))
    lv = {j: [(cell, c, cn) for r, (cell, c, cn) in enumerate(c0)
              if r % (32 ** j) == 0] for j in range(lmax + 1)}
    # parent edges j -> j+1 with explicit self-preference on ties
    ed = {}
    for j in range(lmax):
        for cell, c, _ in lv[j]:
            cand = [((pc != cell), -dot(c, pv) / math.sqrt(pn), pc)
                    for pc, pv, pn in lv[j + 1]]
            ed[(j, cell)] = min(cand)[2]
    # descent
    a = {}
    for vid, v in rows:
        cur = min((-dot(v, c) / math.sqrt(cn), cell)
                  for cell, c, cn in lv[lmax])[1]
        for j in range(lmax - 1, -1, -1):
            kids = [(cell, c, cn) for cell, c, cn in lv[j]
                    if ed[(j, cell)] == cur]
            cur = min((-dot(v, c) / math.sqrt(cn), cell)
                      for cell, c, cn in kids)[1]
        a[vid] = cur
    # dups + final
    members = {}
    for vid, v in rows:
        members.setdefault(a[vid], []).append(vid)
    out = []
    for cell in sorted(members):
        vids = sorted(members[cell])
        dup = set()
        for ai in range(len(vids)):
            va = vecs[vids[ai]]
            na = math.sqrt(dot(va, va))
            for bi in range(ai):
                vb = vecs[vids[bi]]
                nb = math.sqrt(dot(vb, vb))
                cos = (min(1.0, max(-1.0, dot(va, vb) / (na * nb)))
                       if na > 0 and nb > 0 else 0.0)
                if cos > 0.35:
                    dup.add(vids[ai])
                    break
        out.append((cell, len(vids), len(vids) - len(dup)))
    lv_rows = sorted((j, cell) for j in lv for cell, _, _ in lv[j])
    ed_rows = sorted((j, cell, p) for (j, cell), p in ed.items())
    return lv_rows, ed_rows, sorted(a.items()), out


def cte_prefix(sql, upto):
    """Truncate the oracle's WITH chain right after `upto`'s body."""
    i = sql.index(f"{upto} AS (")
    j = sql.index("(", i)
    depth = 0
    while True:
        if sql[j] == "(":
            depth += 1
        elif sql[j] == ")":
            depth -= 1
            if depth == 0:
                break
        j += 1
    return sql[:j + 1]


def main():
    oracle = json.load(open(sys.argv[1]))["d10_semantic_dedup"]
    con = duckdb.connect()
    rows = gen()
    con.execute("CREATE TABLE embeddings AS SELECT * FROM (VALUES "
                + ",".join(f"({vid}, {v})" for vid, v in rows)
                + ") t(vec_id, embedding)")
    lv_r, ed_r, a1_r, out_r = replica(rows)
    bad = 0

    def cmp(name, got, want):
        nonlocal bad
        ok = got == want
        print(f"{'OK  ' if ok else 'FAIL'} {name}: duckdb={len(got)} "
              f"replica={len(want)} exact={ok}")
        if not ok:
            bad += 1
            for r in list(set(map(tuple, want)) - set(map(tuple, got)))[:5]:
                print("  missing in duckdb:", r)
            for r in list(set(map(tuple, got)) - set(map(tuple, want)))[:5]:
                print("  extra in duckdb:  ", r)

    lv_sql = cte_prefix(oracle, "lv") + " SELECT j, cell FROM lv ORDER BY j, cell"
    cmp("lv (level cells)",
        [tuple(r) for r in con.execute(lv_sql).fetchall()],
        [tuple(r) for r in lv_r])
    ed_sql = cte_prefix(oracle, "ed") + " SELECT j, cell, parent FROM ed ORDER BY j, cell"
    cmp("ed (parent edges)",
        [tuple(r) for r in con.execute(ed_sql).fetchall()],
        [tuple(r) for r in ed_r])
    a1_sql = cte_prefix(oracle, "a1") + " SELECT vec_id, cell FROM a1 ORDER BY vec_id"
    cmp("a1 (final assignment)",
        [tuple(r) for r in con.execute(a1_sql).fetchall()],
        [tuple(r) for r in a1_r])
    cmp("final (cell, n_members, n_kept)",
        [tuple(r) for r in con.execute(oracle).fetchall()],
        [tuple(r) for r in out_r])
    sys.exit(bad)


if __name__ == "__main__":
    main()
