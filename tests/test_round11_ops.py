"""Round-11 conversion tests: independent (pure-Python/numpy)
references for the three rows-only → oracle-paired conversions —
minhash_near_dups (exact all-pairs Jaccard), knn_lsh_multiprobe
(Hamming-1 probe enumeration + int-scaled scoring), and the
embedding_project_literal companion (literal-components projection
with per-term integer scaling).
"""

from __future__ import annotations

import numpy as np


def _py_shingles(text: str, n: int = 3) -> set[str]:
    toks = text.split(" ")
    if len(toks) <= n - 1:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _away_from_zero(t: np.ndarray) -> np.ndarray:
    return np.sign(t) * np.floor(np.abs(t) + 0.5)


def test_minhash_near_dups_matches_pure_python(spark):
    """minhash_near_dups re-derived with set algebra: every pair with
    exact 3-gram Jaccard >= 0.5 and nothing else — certifies the xxhash
    MinHash+LSH band recall/precision independently of the new DuckDB
    oracle (the split_contamination_audit r10 pattern). Pinned on BOTH
    gate fixtures (the k-core precedent): the driver's oracle gate runs
    at sf0.01, so corpus drift there must surface HERE as a recall
    failure before it can red the gate."""
    from technical_test_data_engineer_spark.plans.dedup_queries import (
        minhash_near_dups,
    )
    from technical_test_data_engineer_spark.sources.parquet_source import (
        load_table,
    )

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        docs = {
            r.doc_id: r.text
            for r in load_table(spark, sf_dir, "documents").collect()
        }
        sh = {d: _py_shingles(t) for d, t in docs.items()}
        ids = sorted(docs)
        expected = {}
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                inter = len(sh[a] & sh[b])
                if inter == 0:
                    continue
                j = inter / (len(sh[a]) + len(sh[b]) - inter)
                if j >= 0.5:
                    expected[(a, b)] = j
        got = {
            (r.id_a, r.id_b): r.jaccard
            for r in minhash_near_dups(spark, sf_dir).collect()
        }
        assert got == expected, sf_dir
        assert expected, f"vacuous fixture: no near-dup pairs in {sf_dir}"


def test_multiprobe_query_matches_pure_python(spark, sf_dir):
    """knn_lsh_multiprobe re-derived end-to-end in numpy/python: seeded
    SRP signatures from the SAME plane literals, full Hamming-1 probe
    enumeration (bucket XOR m), candidate union across 8 tables,
    integer-scaled exact scoring, (score desc, vec_id asc) top-5 —
    independent of both the Spark plan and the generated oracle."""
    from technical_test_data_engineer_spark.plans.similarity_queries import (
        EXACT_BOUND,
        N_QUERIES,
        TOP_K,
        _seeded_planes,
        knn_lsh_multiprobe,
    )
    from technical_test_data_engineer_spark.sources.parquet_source import (
        load_table,
    )

    rows = (
        load_table(spark, sf_dir, "embeddings")
        .filter(f"vec_id < {EXACT_BOUND}")
        .collect()
    )
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in rows}
    planes = np.asarray(_seeded_planes(8, 6), dtype=np.float64)  # (8,6,64)
    ids = sorted(vecs)
    mat = np.vstack([vecs[i] for i in ids])
    bits = (mat @ planes.reshape(48, 64).T) >= 0
    weights = 1 << np.arange(6)
    sigs = (bits.reshape(len(ids), 8, 6) * weights).sum(axis=2)  # (n, 8)
    sig_of = {i: sigs[p] for p, i in enumerate(ids)}

    expected = {}
    for q in range(N_QUERIES):
        probe = [
            {int(sig_of[q][t]) ^ m for m in [0] + [1 << j for j in range(6)]}
            for t in range(8)
        ]
        cands = {
            i
            for i in ids
            if i != q
            and any(int(sig_of[i][t]) in probe[t] for t in range(8))
        }
        scored = []
        for c in cands:
            terms = _away_from_zero(vecs[q] * vecs[c] * 1e10)
            scored.append((int(terms.sum()), c))
        scored.sort(key=lambda s: (-s[0], s[1]))
        for rank, (score, c) in enumerate(scored[:TOP_K], start=1):
            expected[(q, rank)] = (c, score)

    got = {
        (r.query_id, r.rank): (r.vec_id, r.score_e10)
        for r in knn_lsh_multiprobe(spark, sf_dir).collect()
    }
    assert got == expected
    assert expected, "vacuous fixture: no candidates probed"


def test_project_literal_matches_pure_numpy(spark, sf_dir):
    """embedding_project_literal re-derived with plain numpy loops:
    per-term away-from-zero rounding at 1e10 then int64 sums over the
    SAME literal mean/components — independent of the Arrow-batched
    grouped projection and of the generated oracle."""
    from technical_test_data_engineer_spark.plans.similarity_queries import (
        _PROJ_COMPS,
        _PROJ_MEAN,
        embedding_project_literal,
    )
    from technical_test_data_engineer_spark.sources.parquet_source import (
        load_table,
    )

    rows = load_table(spark, sf_dir, "embeddings").collect()
    mean = np.asarray(_PROJ_MEAN)
    comps = np.asarray(_PROJ_COMPS)
    expected = {}
    for r in rows:
        x = np.asarray(r.embedding, dtype=np.float64)
        for c in range(comps.shape[0]):
            t = _away_from_zero((x - mean) * comps[c] * 1e10)
            expected[(r.vec_id, c)] = int(t.sum())
    got = {
        (r.vec_id, r.component): r.value_e10
        for r in embedding_project_literal(spark, sf_dir).collect()
    }
    assert got == expected
