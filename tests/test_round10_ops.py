"""Round-10 operator tests: independent references and invariants for
the integer-scaled score migration (metric="int" across the ANN stack,
the all-integer MMR unroll) and the two rows-only → oracle-paired
conversions (k-core fixpoint vs unrolled-peel oracle depth, the
contamination audit vs a pure-Python Jaccard/md5 ground truth).
"""

from __future__ import annotations

import hashlib


def _py_shingles(text: str, n: int = 3) -> set[str]:
    toks = text.split(" ")
    if len(toks) <= n - 1:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _py_split(text: str) -> str:
    bucket = int(hashlib.md5(text.encode()).hexdigest()[:8], 16) % 100
    return "train" if bucket < 90 else "val"


def test_kcore_fixpoint_within_oracle_rounds(spark):
    """part_copurchase_kcore's oracle unrolls the peel a FIXED number
    of rounds; the pairing is exact only while the true fixpoint is
    reached within that depth. Pin it on BOTH gate fixtures so corpus
    drift surfaces here before it can redden the driver gate."""
    from technical_test_data_engineer_spark.operators.graph import (
        k_core,
        k_core_peel_rounds,
    )
    from technical_test_data_engineer_spark.plans.relational_breadth_queries import (
        _KCORE_ORACLE_ROUNDS,
        _copurchase_edges,
    )

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        edges = _copurchase_edges(spark, sf)
        fix = {tuple(r) for r in k_core(edges, k=2).collect()}
        unrolled = {
            tuple(r)
            for r in k_core_peel_rounds(
                edges, k=2, rounds=_KCORE_ORACLE_ROUNDS
            ).collect()
        }
        assert fix == unrolled, f"fixpoint deeper than oracle at {sf}"


def test_contamination_audit_matches_pure_python(spark, sf_dir):
    """split_contamination_audit re-derived with hashlib + set algebra:
    every leaking pair (exact Jaccard >= 0.5, md5 split sides differ)
    and nothing else — certifies the xxhash MinHash+LSH pipeline's
    recall/precision independently of the DuckDB oracle."""
    from technical_test_data_engineer_spark.plans.dedup_queries import (
        split_contamination_audit,
    )
    from technical_test_data_engineer_spark.sources.parquet_source import (
        load_table,
    )

    docs = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    sh = {d: _py_shingles(t) for d, t in docs.items()}
    split = {d: _py_split(t) for d, t in docs.items()}
    ids = sorted(docs)
    expected = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sh[a] & sh[b])
            if inter == 0:
                continue
            j = inter / (len(sh[a]) + len(sh[b]) - inter)
            if j >= 0.5 and split[a] != split[b]:
                expected[(a, b)] = (split[a], split[b], j)
    got = {
        (r.id_a, r.id_b): (r.split_a, r.split_b, r.jaccard)
        for r in split_contamination_audit(spark, sf_dir).collect()
    }
    assert got == expected
    assert expected, "vacuous fixture: no leaking pairs"


def test_int_metric_ranking_matches_decimal(spark, sf_dir):
    """brute_force_topk metric='int' must produce the same neighbor
    ranking as the decimal-exact metric wherever no two scores are
    within the 1e-10 scaling quantum (true for this fixture)."""
    from pyspark.sql import functions as F

    from technical_test_data_engineer_spark.operators.similarity import (
        brute_force_topk,
    )
    from technical_test_data_engineer_spark.sources.parquet_source import (
        load_table,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 3)
    dec = brute_force_topk(emb, probes, k=5, metric="dot").collect()
    intr = brute_force_topk(emb, probes, k=5, metric="int").collect()
    dec_rank = {(r.query_id, r.rank): r.vec_id for r in dec}
    int_rank = {(r.query_id, r.rank): r.vec_id for r in intr}
    assert dec_rank == int_rank
    # and the int score is the rounded-scaled image of the decimal one
    dec_score = {(r.query_id, r.vec_id): r.score for r in dec}
    for r in intr:
        assert abs(r.score - dec_score[(r.query_id, r.vec_id)] * 1e10) <= 64


def test_mmr_e11_matches_pure_python(spark, sf_dir):
    """knn_mmr_exact3 re-derived in pure Python from the collected
    embeddings: integer-scaled dots (round half-away like Spark's
    F.round on doubles), 3 greedy picks, mmr_e11 = 7*rel - 3*maxsim."""
    from technical_test_data_engineer_spark.plans.similarity_queries import (
        N_QUERIES,
        _MMR_SHORT,
        knn_mmr_exact3,
    )
    from technical_test_data_engineer_spark.sources.parquet_source import (
        load_table,
    )

    vecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }

    def idot(a, b):
        # mirror F.round(x, 0).cast(bigint): HALF_UP on the magnitude
        tot = 0
        for x, y in zip(a, b):
            p = x * y * 1e10
            tot += int(p + 0.5) if p >= 0 else -int(-p + 0.5)
        return tot

    expected = {}
    for q in range(N_QUERIES):
        rels = sorted(
            ((idot(vecs[q], v), -i) for i, v in vecs.items() if i != q),
            reverse=True,
        )[:_MMR_SHORT]
        short = {-ni: rel for rel, ni in rels}
        picked = []
        for pick in (1, 2, 3):
            best = None
            for i, rel in short.items():
                if i in picked:
                    continue
                if picked:
                    msim = max(idot(vecs[i], vecs[s]) for s in picked)
                    mmr = 7 * rel - 3 * msim
                else:
                    mmr = 7 * rel
                key = (mmr, -i)
                if best is None or key > best[0]:
                    best = (key, i, mmr)
            picked.append(best[1])
            expected[(q, pick)] = (best[1], best[2])
    got = {
        (r.query_id, r.pick): (r.vec_id, r.mmr_e11)
        for r in knn_mmr_exact3(spark, sf_dir).collect()
    }
    assert got == expected
