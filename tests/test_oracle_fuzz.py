"""Seeded RANDOMIZED differential fuzzing of the oracle-backed queries
(VERDICT r05 #3 — extends the single crafted boundary corpus of
``test_oracle_edgecases.py`` to N pseudo-random corpora).

Each seed deterministically generates a small ``documents.parquet``
whose rows randomize exactly the dimensions the crafted corpus pins by
hand, so a modeling divergence BETWEEN the named boundary points (a
fold position the crafted corpus never lands on, a Jaccard value
sitting right on the 0.8 threshold, a stopword-vote tie) fails here:

* doc_id drawn uniformly -> random combinations of the payload-type
  (%4), anchor (%3), image (%5) and EOS-failure (%10) residues;
* text shapes: empty, single word, exact-length trailing paragraphs
  targeted at the MIN_CONTENT_CHARS boundary (20..30 chars), long
  multi-page streams, stopword-heavy docs per language, and
  punctuation-heavy docs (token-extraction boundary);
* word separators drawn from the full RE2 whitespace class
  ``[\\t\\n\\f\\r ]`` including runs — probing word-splitter parity,
  not just single spaces;
* planted exact duplicates AND one-word-edited near duplicates (3-gram
  Jaccard of a one-word edit in a ~30-word doc lands within a few
  hundredths of the 0.8 threshold — both engines must make the same
  call);
* all content stays inside the documented corpus contract (printable
  ASCII 33..126 minus ``"\\<>&`` — pinned by
  ``test_corpus.test_oracle_text_assumptions_pinned``), because the
  payload-rebuild oracles are only specified over that alphabet.

The 16 queries under test are the same documents-only oracle set the
crafted-corpus gate runs.  Seeds are fixed for CI reproducibility; set
``SPARK_GRAFT_FUZZ_SEEDS=1,2,3,...`` for a deeper sweep.
"""

from __future__ import annotations

import os
import random

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entrymod

from .test_oracle_edgecases import _EDGE_QUERIES, frame_rowset

SEEDS = [
    int(s)
    for s in os.environ.get("SPARK_GRAFT_FUZZ_SEEDS", "11,23,37").split(",")
]

_ALPHABET = "abcdefghijklmnopqrstuvwxyz" "ABCDEFGHIJKLMNOPQRSTUVWXYZ" "0123456789"
# in-contract punctuation: printable ASCII minus the json/HTML-active
# characters the payload oracles exclude by corpus contract
_PUNCT = ".,!?;:()'*+-=_/[]{}|~^%$#@"
_WS = [" ", " ", " ", " ", "\t", "\n", "\r", "\f", "  ", " \n"]
_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"],
    "fr": ["le", "la", "les", "et", "est", "pas", "une", "des", "que", "pour"],
    "es": ["el", "la", "los", "las", "y", "es", "no", "una", "que", "por"],
}


def _word(rng: random.Random, lo: int = 1, hi: int = 12) -> str:
    n = rng.randint(lo, hi)
    w = "".join(rng.choice(_ALPHABET) for _ in range(n))
    if rng.random() < 0.12:
        w += rng.choice(_PUNCT)
    return w


def _join(rng: random.Random, words: list) -> str:
    if not words:
        return ""
    out = [words[0]]
    for w in words[1:]:
        out.append(rng.choice(_WS))
        out.append(w)
    return "".join(out)


def _tail_words(rng: random.Random, target: int) -> list:
    """Words whose single-space join is EXACTLY ``target`` chars —
    aimed at the trailing-paragraph keep/drop threshold."""
    words = []
    left = target
    while left > 0:
        if left <= 13:
            words.append("t" * left)
            break
        n = rng.randint(3, min(12, left - 2))
        words.append("".join(rng.choice(_ALPHABET.lower()) for _ in range(n)))
        left -= n + 1  # the joining space
    return words


def _gen_text(rng: random.Random) -> str:
    r = rng.random()
    if r < 0.06:
        return ""
    if r < 0.12:
        return _word(rng)
    if r < 0.30:
        # body of len-7 words (fold-aligned like the crafted corpus)
        # plus an exact-length tail straddling the 25-char threshold
        body = ["w" * 7 for _ in range(50 * rng.randint(0, 3))]
        tail = _tail_words(rng, rng.randint(20, 30))
        return " ".join(body + tail)
    if r < 0.42:
        lang = rng.choice(list(_STOPWORDS))
        words = [
            rng.choice(_STOPWORDS[lang]) if rng.random() < 0.6 else _word(rng)
            for _ in range(rng.randint(20, 100))
        ]
        return _join(rng, words)
    if r < 0.52:
        words = [
            rng.choice(_PUNCT) * rng.randint(1, 3)
            if rng.random() < 0.5
            else _word(rng)
            for _ in range(rng.randint(5, 60))
        ]
        return _join(rng, words)
    if r < 0.75:
        # long stream: crosses paragraph folds and (for %4 ids) page
        # boundaries at arbitrary positions; may exceed the pdf
        # frame-sample budget
        return _join(rng, [_word(rng) for _ in range(rng.randint(150, 700))])
    return _join(rng, [_word(rng) for _ in range(rng.randint(2, 120))])


def _near_dup(rng: random.Random, text: str) -> str:
    words = text.split()
    if len(words) < 10:
        return text + " extraword"
    i = rng.randrange(len(words))
    if rng.random() < 0.5:
        words[i] = _word(rng)
    else:
        del words[i]
    return " ".join(words)


def gen_embeddings(seed: int):
    """Random embeddings table with adversarial plants for the
    similarity oracles: exact duplicates (identical rows — rank ties
    at cosine 1.0 probe the top-k tie-break), scaled copies (*2 is
    exact in float32, cosine exactly 1.0 at a different norm),
    near-parallel vectors (cosine ~0.99), and mixed vectors aimed near
    the 0.35 near-dup threshold.  vec_id 0 (QUERY_VEC_ID) always
    exists; all ids stay far below the t=0.9 plant offsets."""
    import numpy as np

    rng = np.random.RandomState(seed)
    n = 60
    dim = 64
    base = rng.standard_normal((n, dim)).astype(np.float32)
    ids = [0] + sorted(rng.choice(np.arange(1, 9999), n - 1, replace=False).tolist())
    vecs = [base[i] for i in range(n)]
    extra_id = 20000
    plants = []
    q = vecs[0]
    plants.append(vecs[3].copy())                    # exact duplicate
    plants.append((vecs[4] * np.float32(2.0)))       # scaled copy, cos=1
    plants.append(
        (vecs[5] + rng.standard_normal(dim).astype(np.float32) * np.float32(0.05))
    )                                                # near-parallel
    # aimed near the 0.35 threshold vs the QUERY vector: unit mix
    u = q / np.linalg.norm(q)
    r = rng.standard_normal(dim).astype(np.float32)
    r -= (r @ u) * u
    r /= np.linalg.norm(r)
    for t in (0.33, 0.36):
        plants.append((u * np.float32(t) + r * np.float32((1 - t * t) ** 0.5)))
    for j, v in enumerate(plants):
        ids.append(extra_id + j)
        vecs.append(v.astype(np.float32))
    labels = rng.randint(0, 10, size=len(ids)).tolist()
    return ids, [v.tolist() for v in vecs], labels


_EMB_QUERIES = [
    "cosine_topk",
    "knn_self_join",
    "embedding_near_dup_lsh",
    "embedding_near_dup_lsh_scale",
]


def gen_corpus(seed: int) -> list:
    rng = random.Random(seed)
    n = rng.randint(35, 55)
    ids = rng.sample(range(1, 4000), n + 8)
    docs = [(ids[i], _gen_text(rng)) for i in range(n)]
    # plants: exact duplicates and one-word-edit near duplicates of
    # already-generated rows, under fresh doc_ids
    donors = [d for d in docs if len((d[1] or "").split()) >= 10]
    k = len(docs)
    for j in range(min(4, len(donors))):
        src = rng.choice(donors)
        if j % 2 == 0:
            docs.append((ids[k + j], src[1]))
        else:
            docs.append((ids[k + j], _near_dup(rng, src[1])))
    # top-ups: the probabilistic branches leave a small per-seed chance
    # (~1% for the multi-page shape) of missing a claimed dimension, so
    # GUARANTEE them by construction — otherwise a deep
    # SPARK_GRAFT_FUZZ_SEEDS sweep false-alarms on the generator
    # self-check for an unlucky seed (seed 717 drew no >450-word doc)
    spare = ids[k + 4:]
    texts_now = [t for _, t in docs]
    if not any(len((t or "").split()) > 450 for t in texts_now):
        docs.append(
            (spare.pop(), _join(rng, [_word(rng) for _ in range(500)]))
        )
    if not (
        any(t == "" for t in texts_now)
        or any(len(t.split()) == 1 for t in texts_now)
    ):
        docs.append((spare.pop(), ""))
    langs = ["en", "de", "fr", "es", "it", "nl"]
    return [(d, t, rng.choice(langs)) for d, t in docs]


@pytest.fixture(scope="module", params=SEEDS, ids=lambda s: f"seed{s}")
def fuzz_dir(request, tmp_path_factory):
    rows = gen_corpus(request.param)
    d = tmp_path_factory.mktemp(f"fuzz_corpus_{request.param}")
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "text": pa.array([r[1] for r in rows], type=pa.string()),
            "lang": pa.array([r[2] for r in rows], type=pa.string()),
        }
    )
    pq.write_table(tbl, str(d / "documents.parquet"))
    ids, vecs, labels = gen_embeddings(request.param)
    etbl = pa.table(
        {
            "vec_id": pa.array(ids, type=pa.int64()),
            "embedding": pa.array(vecs, type=pa.list_(pa.float32())),
            "label": pa.array(labels, type=pa.int32()),
        }
    )
    pq.write_table(etbl, str(d / "embeddings.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def fuzz_duck(fuzz_dir):
    con = duckdb.connect()
    for table in ("documents", "embeddings"):
        con.sql(
            f"CREATE VIEW {table} AS SELECT * FROM "
            f"'{fuzz_dir}/{table}.parquet'"
        )
    yield con
    con.close()


def test_generator_covers_the_claimed_dimensions():
    """Guard the generator (mirrors the crafted-corpus fixture guard):
    every seed must actually produce the shapes the docstring claims,
    or the suite silently fuzzes nothing."""
    for seed in SEEDS:
        rows = gen_corpus(seed)
        ids = [r[0] for r in rows]
        texts = [r[1] for r in rows]
        assert len(ids) == len(set(ids))
        assert any(i % 4 == 0 for i in ids), "no pdf docs"
        assert any(i % 4 != 0 for i in ids), "no html docs"
        assert any(t == "" for t in texts) or any(
            len(t.split()) == 1 for t in texts
        ), "no empty/single-word docs"
        assert len(texts) != len(set(texts)), "no exact-duplicate plant"
        assert any(len(t.split()) > 450 for t in texts), "no multi-page doc"
        # contract: printable ASCII minus json/HTML-active chars
        for t in texts:
            for c in t:
                assert c in "\t\n\f\r " or (
                    33 <= ord(c) <= 126 and c not in '"\\<>&'
                ), repr(c)


@pytest.mark.parametrize("name", _EDGE_QUERIES + _EMB_QUERIES)
def test_oracle_agrees_on_fuzz_corpus(spark, fuzz_dir, fuzz_duck, name):
    spdf = entrymod.queries()[name](spark, fuzz_dir).toPandas()
    opdf = fuzz_duck.sql(entrymod.oracle_sql()[name]).df()
    assert sorted(spdf.columns) == sorted(opdf.columns), name
    assert len(spdf) == len(opdf), (name, len(spdf), len(opdf))
    assert frame_rowset(spdf) == frame_rowset(opdf), name
