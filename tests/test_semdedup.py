"""SemDeDup semantic dedup vs a brute-force Python oracle."""

from __future__ import annotations

import math


def _cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))


def _oracle(rows, threshold):
    # pairs intra-cell on the ROUNDED cosine (the pinned semantics)
    ids = [i for i, _, _ in rows]
    by_id = {i: (c, v) for i, c, v in rows}
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in ids:
        for j in ids:
            if i < j and by_id[i][0] == by_id[j][0]:
                if round(_cos(by_id[i][1], by_id[j][1]), 6) >= threshold:
                    ri, rj = find(i), find(j)
                    parent[max(ri, rj)] = min(ri, rj)
    comp = {i: min(j for j in ids if find(j) == find(i)) for i in ids}

    cells = {}
    for i, c, v in rows:
        cells.setdefault(c, []).append(v)
    cent = {
        c: [sum(col) / len(vs) for col in zip(*vs)] for c, vs in cells.items()
    }
    cc = {i: round(_cos(by_id[i][1], cent[by_id[i][0]]), 6) for i in ids}
    keep = {}
    for i in ids:
        grp = [j for j in ids if comp[j] == comp[i]]
        keep[i] = min(grp, key=lambda j: (cc[j], j))
    return comp, cc, keep


ROWS = [
    # cell "a": 1/2 near-identical, 3 orthogonal-ish
    (1, "a", [1.0, 0.0, 0.1]),
    (2, "a", [0.99, 0.01, 0.1]),
    (3, "a", [0.0, 1.0, 0.0]),
    # cell "b": a 3-chain 4~5, 5~6 (4-6 below threshold -> one component)
    (4, "b", [1.0, 0.2, 0.0]),
    (5, "b", [1.0, 0.45, 0.0]),
    (6, "b", [1.0, 0.75, 0.0]),
    # cell "c": singleton
    (7, "c", [0.0, 0.0, 1.0]),
]


def test_semantic_dedup_matches_oracle(spark):
    from eget_spark.operators.semdedup import semantic_dedup

    thr = 0.97
    comp, cc, keep = _oracle(ROWS, thr)
    df = spark.createDataFrame(
        ROWS, "vec_id long, label string, embedding array<double>"
    )
    got = {r["id"]: r for r in semantic_dedup(df, threshold=thr).collect()}
    assert len(got) == len(ROWS)
    for i, _, _ in ROWS:
        r = got[i]
        assert r["component"] == comp[i], i
        assert abs(r["centroid_cosine"] - cc[i]) < 1e-9, i
        assert r["keep_id"] == keep[i], i
        assert r["is_kept"] == (keep[i] == i), i
    # the 4~5~6 chain actually merged transitively (4-6 alone is below
    # threshold), and exactly one member per component survives
    assert comp[6] == 4 and round(_cos(ROWS[3][2], ROWS[5][2]), 6) < thr
    for c in set(comp.values()):
        assert sum(1 for i in comp if comp[i] == c and got[i]["is_kept"]) == 1


def test_semantic_dedup_no_python_no_cartesian(spark):
    from eget_spark.operators.semdedup import semantic_dedup

    df = spark.createDataFrame(
        ROWS, "vec_id long, label string, embedding array<double>"
    )
    plan = (
        semantic_dedup(df, threshold=0.97)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
