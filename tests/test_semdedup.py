"""SemDeDup (Abbas et al. 2023): cluster-scoped semantic dedup.

The pairs arm is hash-gated in the ``dedup_embedding_cosine`` registry
entry (k-means training included, via the unrolled CTE twin); these
tests pin the parts the oracle can't see — that planted semantic dups
are actually found through the cluster scoping, and that the survivor
rule (keep the cluster member LEAST similar to its centroid) matches
an in-Python reference bit-for-bit.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from haensel_ams_data_engineer_challenge_spark.operators import similarity as S


def _unit(v):
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v]


def _planted_df(spark, n_groups: int = 12, seed: int = 11):
    """n_groups base vectors, each with a near-identical twin
    (cos ~0.999) — the semantic-dup regime."""
    import numpy as np

    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n_groups, S.EMBEDDING_DIM))
    rows = []
    for i, v in enumerate(base):
        rows.append((2 * i, _unit(v.tolist())))
        w = v + rng.normal(scale=0.02, size=S.EMBEDDING_DIM)
        rows.append((2 * i + 1, _unit(w.tolist())))
    return spark.createDataFrame(
        pd.DataFrame({"vec_id": [r[0] for r in rows],
                      "embedding": [r[1] for r in rows]})
    )


def _py_cos(a, b):
    """Bit-exact twin of cosine_expr: sequential fold in index order."""
    def dot(x, y):
        acc = 0.0
        for p, q in zip(x, y):
            acc = acc + float(p) * float(q)
        return acc
    return dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))


def test_semdedup_finds_planted_pairs(spark):
    """Near-identical twins land in the same k-means cell (their
    centroid margins dwarf the 0.02 perturbation), so cluster scoping
    must not lose them: every planted pair comes back at cos >= 0.9."""
    df = _planted_df(spark)
    pairs = S.semdedup_pairs(df, threshold=0.9, k=4, iters=2)
    found = {(r.id_a, r.id_b) for r in pairs.collect()}
    planted = {(2 * i, 2 * i + 1) for i in range(12)}
    assert planted <= found


def test_semdedup_pairs_are_cell_scoped(spark):
    """Every emitted pair shares its reported cell with BOTH members'
    assignments — the defining SemDeDup restriction."""
    df = _planted_df(spark, n_groups=8, seed=3)
    assign, _ = S.ivf_kmeans(df, k=4, iters=2)
    cell = {r.vec_id: r.cell for r in assign.collect()}
    for r in S.semdedup_pairs(df, threshold=0.5, k=4, iters=2).collect():
        assert cell[r.id_a] == r.cell and cell[r.id_b] == r.cell


def test_semdedup_keep_matches_python_reference(spark):
    """The survivor rule end-to-end vs an in-Python reference over the
    SAME trained quantizer: groups = connected components of the
    >= threshold same-cell graph; keep = argmin of the 1e-6-quantized
    centroid cosine (ties -> lowest id); singletons survive."""
    df = _planted_df(spark, n_groups=10, seed=5)
    k, iters, thr = 4, 2, 0.9

    got = {
        r.vec_id: (r.component, r.is_survivor)
        for r in S.semdedup_keep(df, threshold=thr, k=k, iters=iters).collect()
    }

    # reference computation over the operator's own (deterministic,
    # separately hash-checked) quantizer output
    assign, cents = S.ivf_kmeans(df, k=k, iters=iters)
    cell = {r.vec_id: r.cell for r in assign.collect()}
    cvec = {r.cell: list(r.cvec) for r in cents.collect()}
    vecs = {r.vec_id: list(r.embedding) for r in df.collect()}

    # dup graph: same-cell pairs at >= threshold
    ids = sorted(vecs)
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in ids:
        for j in ids:
            if i < j and cell[i] == cell[j] and _py_cos(vecs[i], vecs[j]) >= thr:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    comp = {i: find(i) for i in ids}

    csim_q = {
        i: math.floor(_py_cos(vecs[i], cvec[cell[i]]) * 1e6) for i in ids
    }
    expected = {}
    for i in ids:
        members = [j for j in ids if comp[j] == comp[i]]
        keep = min(members, key=lambda j: (csim_q[j], j))
        expected[i] = (comp[i], i == keep)

    assert got == expected


def test_semdedup_keep_one_survivor_per_component(spark):
    df = _planted_df(spark, n_groups=6, seed=9)
    rows = S.semdedup_keep(df, threshold=0.9, k=3, iters=2).collect()
    by_comp: dict[int, list] = {}
    for r in rows:
        by_comp.setdefault(r.component, []).append(r.is_survivor)
    assert len(rows) == 12  # every input id present
    for flags in by_comp.values():
        assert sum(flags) == 1


def test_semdedup_threshold_one_only_exact(spark):
    """A threshold above every off-diagonal cosine yields zero pairs
    and all-survivors — the degenerate-but-legal configuration."""
    df = _planted_df(spark, n_groups=4, seed=2)
    assert S.semdedup_pairs(df, threshold=1.0001, k=2, iters=1).count() == 0
    keep = S.semdedup_keep(df, threshold=1.0001, k=2, iters=1)
    assert all(r.is_survivor for r in keep.collect())


@pytest.mark.parametrize("k", [2, 6])
def test_semdedup_pairs_subset_of_bruteforce(spark, k):
    """Cluster scoping can only DROP cross-cell pairs, never invent
    one: the pair set is a subset of brute-force all-pairs at the same
    threshold, and within-cell recall is exact."""
    df = _planted_df(spark, n_groups=8, seed=13)
    sd = {(r.id_a, r.id_b) for r in
          S.semdedup_pairs(df, threshold=0.6, k=k, iters=2).collect()}
    brute = {(r.id_a, r.id_b) for r in
             S.embedding_dup_pairs(df, threshold=0.6).collect()}
    assert sd <= brute


def test_semdedup_sampled_train_split(spark):
    """train_vectors= (the production large-k shape): the quantizer
    trains on a sample, the full corpus is only assigned — planted
    near-identical twins must still land in one cell and be found."""
    df = _planted_df(spark, n_groups=12, seed=21)
    sample = df.filter("vec_id % 3 = 0")  # every 3rd vector
    pairs = S.semdedup_pairs(
        df, threshold=0.9, k=4, iters=2, train_vectors=sample
    )
    found = {(r.id_a, r.id_b) for r in pairs.collect()}
    planted = {(2 * i, 2 * i + 1) for i in range(12)}
    assert planted <= found
    brute = {(r.id_a, r.id_b)
             for r in S.embedding_dup_pairs(df, threshold=0.9).collect()}
    assert found <= brute
