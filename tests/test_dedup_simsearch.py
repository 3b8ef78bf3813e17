"""Dedup + similarity-search semantics beyond the oracle gate:
MinHash-LSH recall vs exact Jaccard, SimHash Hamming bounds, ANN
candidate quality vs brute force."""

from __future__ import annotations

import pytest

from deepseek_ocr_2_spark.functions import textstats
from deepseek_ocr_2_spark.operators import dedup, simsearch

from .conftest import SF_SMALL


@pytest.fixture(scope="module")
def exact_pairs(spark):
    rows = dedup.ngram_jaccard_pairs(spark, SF_SMALL).collect()
    return {(r.doc_a, r.doc_b): r.jaccard for r in rows}


def test_exact_pairs_are_real_near_dups(exact_pairs):
    assert len(exact_pairs) > 0, "sf0.01 documents contain planted near-dups"
    assert all(j >= dedup.JACCARD_THRESHOLD for j in exact_pairs.values())


def test_minhash_lsh_finds_every_exact_pair(spark, exact_pairs):
    """32-band/4-row LSH (threshold ~0.42): at J>=0.8 collision prob is
    1-(1-0.8^4)^32 > 0.9999 even under short-doc signature variance, so
    recall on the planted dups must be total."""
    lsh = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.minhash_lsh_dedup(spark, SF_SMALL).collect()
    }
    missed = set(exact_pairs) - set(lsh)
    assert not missed, f"LSH missed exact pairs: {missed}"
    # and LSH never invents pairs below threshold (verify step prunes)
    assert all(j >= dedup.JACCARD_THRESHOLD for j in lsh.values())


def test_simhash_pairs_respect_hamming_bound(spark):
    rows = dedup.simhash_near_dups(spark, SF_SMALL).collect()
    assert len(rows) > 0
    assert all(r.hamming <= 3 for r in rows)


def test_simhash_kernel_agrees_with_spark_column(spark):
    sig = {
        r.doc_id: r.simhash
        for r in dedup.simhash_signatures(spark, SF_SMALL).limit(50).collect()
    }
    import duckdb

    texts = dict(
        duckdb.sql(
            f"SELECT doc_id, text FROM '{SF_SMALL}/documents.parquet' LIMIT 500"
        ).fetchall()
    )
    for doc_id, signed in list(sig.items())[:10]:
        h = textstats.simhash(textstats.tokenize(texts[doc_id]))
        expect = h - (1 << 64) if h >= (1 << 63) else h
        assert signed == expect


def test_ann_topk_overlaps_brute_force(spark):
    exact = [r.vec_id for r in simsearch.cosine_topk(spark, SF_SMALL).collect()]
    ann = [r.vec_id for r in simsearch.lsh_ann_topk(spark, SF_SMALL).collect()]
    assert len(ann) > 0
    # every ANN hit is scored identically to brute force (same rerank),
    # so ANN results must be a subset-by-rank of the exact candidates it
    # found; require non-trivial recall on the test corpus.
    overlap = len(set(exact) & set(ann))
    assert overlap >= 3, f"ANN recall too low: {overlap}/10"
