"""Text-analysis kernel tests: lang-id, quality, fingerprint, minhash, simhash."""

from hypothesis import given, settings
from hypothesis import strategies as st

from deepseek_ocr_2_spark.functions.textstats import (
    detect_language,
    fingerprint,
    hamming64,
    jaccard,
    minhash_bands,
    minhash_signature,
    quality_score,
    rolling_hashes,
    shingles,
    simhash,
    tokenize,
    winnow,
)


class TestLangId:
    def test_english(self):
        assert detect_language("the cat sat on the mat and it is warm") == "en"

    def test_german(self):
        assert detect_language("der Hund ist nicht mit der Katze und das Haus") == "de"

    def test_chinese(self):
        assert detect_language("这是一个中文文档，包含足够的汉字内容。") == "zh"

    def test_unknown(self):
        assert detect_language("") == "und"
        assert detect_language("zzz qqq xxx") == "und"


class TestQuality:
    def test_empty(self):
        assert quality_score("") == 0.0

    def test_bounded(self):
        for t in ["short", "a" * 1000, "!!! ??? ...", "normal sentence here."]:
            assert 0.0 <= quality_score(t) <= 1.0

    def test_long_clean_beats_punct_soup(self):
        clean = "A perfectly ordinary sentence with words. " * 20
        soup = '.,;:!?"\'()[]{}' * 60
        assert quality_score(clean) > quality_score(soup)


class TestFingerprint:
    def test_whitespace_invariant(self):
        assert fingerprint("a  b\tc") == fingerprint("A b C ")

    def test_differs(self):
        assert fingerprint("doc one") != fingerprint("doc two")


class TestRollingHash:
    def test_shift_invariance(self):
        # the same window content yields the same hash at any position
        h1 = rolling_hashes("XXabcdefgh", window=4)
        h2 = rolling_hashes("YYabcdefgh", window=4)
        assert h1[2:] == h2[2:]

    def test_short_doc(self):
        assert rolling_hashes("ab", window=4) == []

    def test_winnow_subset(self):
        hs = rolling_hashes("the quick brown fox jumps over the lazy dog" * 3, window=8)
        fp = winnow(hs, w=4)
        assert fp and set(fp) <= set(hs)


class TestMinHash:
    def test_identical_docs_identical_sig(self):
        t = tokenize("the quick brown fox jumps over the lazy dog")
        assert minhash_signature(t) == minhash_signature(list(t))

    def test_similar_docs_share_most_mins(self):
        a = tokenize("the quick brown fox jumps over the lazy dog " * 5)
        b = tokenize("the quick brown fox jumps over the lazy cat " * 5)
        sa, sb = minhash_signature(a), minhash_signature(b)
        agree = sum(1 for x, y in zip(sa, sb) if x == y) / len(sa)
        assert agree > 0.3

    def test_disjoint_docs_rarely_agree(self):
        a = tokenize("alpha beta gamma delta epsilon zeta eta theta " * 3)
        b = tokenize("one two three four five six seven eight nine ten " * 3)
        sa, sb = minhash_signature(a), minhash_signature(b)
        agree = sum(1 for x, y in zip(sa, sb) if x == y) / len(sa)
        assert agree < 0.1

    def test_band_keys(self):
        sig = minhash_signature(tokenize("some document text here"))
        keys = minhash_bands(sig, bands=16)
        assert len(keys) == 16
        assert all(k.split(":")[0] == str(i) for i, k in enumerate(keys))

    def test_empty_doc_sentinel(self):
        sig = minhash_signature([])
        assert len(set(sig)) == 1

    def test_agreement_tracks_jaccard_unbiased(self):
        """Signature agreement must be an UNBIASED Jaccard estimator
        (binomial with p = J over num_perm trials).  Regression for the
        round-6 fuzz find (seed 505): the old (a*x+b) mod 2^61-1 family
        over 32-bit x was monotone for ~25% of the drawn a, so the
        whole signature was dominated by each document's single
        smallest shingle hash — a one-word edit near that shingle
        collapsed agreement to 0.15 at true J = 0.875, and banded LSH
        degenerated into an exact-dup detector.  Tolerance 0.12 is ~4
        binomial sigmas at 128 perms; the broken family missed by 0.7."""
        import random as _random

        rng = _random.Random(7)
        for trial in range(4):
            n_shared = rng.randint(25, 60)
            n_only = rng.randint(2, 8)
            shared = [f"s{trial}w{i} a{i} b{i}" for i in range(n_shared)]
            a_doc = shared + [f"ua{trial}x{i} y{i} z{i}" for i in range(n_only)]
            b_doc = shared + [f"ub{trial}x{i} y{i} z{i}" for i in range(n_only)]
            jac = n_shared / (n_shared + 2 * n_only)
            # drive through the public API: fabricate token streams
            # whose 3-shingles are exactly these sets is awkward, so
            # sample the family directly at the signature layer
            from deepseek_ocr_2_spark.functions.textstats import (
                _MINHASH_P,
                _hash32,
                _perm_params,
            )
            import numpy as np

            def sig(shs):
                a, b = _perm_params(128, 42)
                x = np.array(
                    [_hash32(s) for s in shs], dtype=np.uint64
                ) % np.uint64(_MINHASH_P)
                v = (a[:, None] * x[None, :] + b[:, None]) % np.uint64(
                    _MINHASH_P
                )
                return v.min(axis=1)
            agree = float(np.mean(sig(a_doc) == sig(b_doc)))
            assert abs(agree - jac) < 0.12, (trial, jac, agree)


class TestSimHash:
    def test_similar_docs_close(self):
        a = simhash(tokenize("the quick brown fox jumps over the lazy dog " * 5))
        b = simhash(tokenize("the quick brown fox jumps over the lazy cat " * 5))
        c = simhash(tokenize("completely different content about spark engines " * 5))
        assert hamming64(a, b) < hamming64(a, c)

    def test_empty(self):
        assert simhash([]) == 0

    @given(st.text(max_size=200))
    @settings(max_examples=100, deadline=None)
    def test_property_64bit(self, text):
        h = simhash(tokenize(text))
        assert 0 <= h < (1 << 64)


class TestJaccard:
    def test_basics(self):
        assert jaccard(["a", "b"], ["a", "b"]) == 1.0
        assert jaccard(["a"], ["b"]) == 0.0
        assert jaccard([], []) == 1.0
        assert jaccard(["a", "b", "c"], ["b", "c", "d"]) == 0.5


class TestShingles:
    def test_k3(self):
        assert shingles(["a", "b", "c", "d"], k=3) == ["a b c", "b c d"]

    def test_short(self):
        assert shingles(["a"], k=3) == ["a"]
        assert shingles([], k=3) == []


class TestLangIdParity:
    """The JVM lang-id query, the Python kernel, and the DuckDB oracle
    implement ONE decision rule — pin all three against each other so a
    drift in any implementation fails loudly."""

    def test_jvm_query_equals_python_kernel(self, spark):
        from deepseek_ocr_2_spark.operators import textops

        from .conftest import SF_SMALL

        jvm = {
            r.doc_id: r.lang_detected
            for r in textops.lang_id_heuristic(spark, SF_SMALL).collect()
        }
        ker = {
            r.doc_id: r.lang_detected
            for r in textops.lang_id_kernel(spark, SF_SMALL).collect()
        }
        assert jvm == ker and len(jvm) == 500

    def test_decision_rule_edge_cases(self):
        from deepseek_ocr_2_spark.functions.textstats import detect_language

        assert detect_language("") == "und"
        assert detect_language("12345 67890") == "und"  # tokens, no votes
        assert detect_language("一二三四五") == "zh"  # 5 CJK chars
        assert detect_language("the of and to in") == "en"
        # tie-break: en/es/fr all score 1 -> alphabetically-first wins
        assert detect_language("the la") == "en"

    def test_marker_set_extension_keeps_all_three_in_lockstep(
        self, spark, monkeypatch
    ):
        """ADVICE r03: the argmax cascade used to hardcode
        {de,en,es,fr}; it is now GENERATED from the sorted marker keys.
        Adding a language must keep the JVM query, the DuckDB oracle,
        and the Python kernel agreeing without touching any of them."""
        import duckdb

        from deepseek_ocr_2_spark.functions import textstats
        from deepseek_ocr_2_spark.operators import textops

        from .conftest import SF_TINY

        extended = dict(textstats._LANG_MARKERS)
        extended["it"] = frozenset(
            {"il", "di", "che", "e", "per", "con", "non", "della"}
        )
        monkeypatch.setattr(textstats, "_LANG_MARKERS", extended)

        jvm = {
            r.doc_id: r.lang_detected
            for r in textops.lang_id_heuristic(spark, SF_TINY).collect()
        }
        ker = {
            r.doc_id: textstats.detect_language(r.text or "")
            for r in spark.read.parquet(
                f"{SF_TINY}/documents.parquet"
            ).collect()
        }
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF_TINY}/documents.parquet')"
        )
        dk = {
            int(r[0]): r[1]
            for r in con.execute(textops.lang_id_oracle()).fetchall()
        }
        assert jvm == ker == dk and len(jvm) > 0
