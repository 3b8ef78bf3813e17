"""Text-analysis kernels for the training-data pipeline.

Language ID (n-gram/stopword heuristic), quality scoring, token
counting, document fingerprinting (rolling hash), shingling, MinHash
signatures and SimHash — all pure Python/numpy, deterministic, and
designed to be called from Arrow-batched pandas UDFs.

Where an operator also needs a DuckDB oracle, the DataFrame layer
(``operators/textops.py``) re-expresses the same arithmetic with Spark
built-ins instead of calling these kernels, keeping the hot path
JVM-side; the kernels here back the genuinely non-SQL paths (MinHash,
SimHash) and the unit tests.
"""

from __future__ import annotations

import hashlib
import re
from functools import lru_cache
from typing import Dict, Iterable, List, Sequence, Tuple

import numpy as np

WORD_RE = re.compile(r"[a-z0-9]+")

# Tiny per-language stopword marker sets for the heuristic language ID.
# Deliberately small and fixed: deterministic, dependency-free, and good
# enough to route documents; a real model slots in behind the same API.
_LANG_MARKERS: Dict[str, frozenset] = {
    "en": frozenset({"the", "and", "of", "to", "in", "is", "that", "it", "for", "with"}),
    "de": frozenset({"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"}),
    "fr": frozenset({"le", "la", "les", "et", "est", "pas", "une", "des", "que", "pour"}),
    "es": frozenset({"el", "la", "los", "las", "y", "es", "no", "una", "que", "por"}),
}

# CJK unified ideographs + kana + hangul ranges for the zh/ja/ko branch.
_CJK_RE = re.compile(r"[一-鿿぀-ヿ가-힯]")


def tokenize(text: str) -> List[str]:
    """Lowercase alnum tokens; the BPE-ish regex token proxy."""
    return WORD_RE.findall(text.lower())


def detect_language(text: str) -> str:
    """Heuristic language ID: CJK char ratio first, then stopword votes.

    Returns an ISO 639-1 code from {zh, en, de, fr, es} or 'und' when no
    signal clears the floor.  Pure function of the text bytes.
    """
    if not text:
        return "und"
    cjk = len(_CJK_RE.findall(text))
    if cjk >= 5 or (len(text) > 0 and cjk / len(text) > 0.05):
        return "zh"
    tokens = tokenize(text)
    if not tokens:
        return "und"
    votes = {
        lang: sum(1 for t in tokens if t in markers)
        for lang, markers in _LANG_MARKERS.items()
    }
    best = max(sorted(votes), key=lambda k: votes[k])
    if votes[best] == 0:
        return "und"
    return best


def quality_score(text: str) -> float:
    """Composite [0,1] quality score from cheap surface statistics.

    mean of three clamped ratios: length signal (chars/500 capped),
    alpha ratio, and non-punctuation ratio.  The same arithmetic is
    re-expressed in Spark built-ins + SQL by the oracle query, so keep
    this formula in sync with ``operators/textops.py``.
    """
    n = len(text)
    if n == 0:
        return 0.0
    length_signal = min(1.0, n / 500.0)
    alpha = sum(1 for c in text if c.isalpha())
    punct = sum(1 for c in text if c in ".,;:!?\"'()[]{}")
    alpha_ratio = alpha / n
    non_punct_ratio = 1.0 - punct / n
    return (length_signal + alpha_ratio + non_punct_ratio) / 3.0


def fingerprint(text: str) -> str:
    """Whitespace-normalized md5 document fingerprint (hex).

    Oracle-friendly: DuckDB computes the identical value as
    ``md5(regexp_replace(lower(text), '\\s+', ' ', 'g'))`` after trim.
    """
    normalized = re.sub(r"\s+", " ", text.lower()).strip()
    return hashlib.md5(normalized.encode("utf-8")).hexdigest()


def rolling_hashes(text: str, window: int = 64, base: int = 257, mod: int = (1 << 61) - 1) -> List[int]:
    """Karp-Rabin rolling hashes over character windows (winnowing input)."""
    n = len(text)
    if n < window:
        return []
    out: List[int] = []
    h = 0
    power = pow(base, window - 1, mod)
    for i, c in enumerate(text):
        h = (h * base + ord(c)) % mod
        if i >= window:
            h = (h - ord(text[i - window]) * power * base) % mod
        if i >= window - 1:
            out.append(h)
    return out


def winnow(hashes: Sequence[int], w: int = 16) -> List[int]:
    """Winnowing (Schleimer et al. 2003): min hash per window, deduped."""
    if not hashes:
        return []
    out: List[int] = []
    last = None
    for i in range(max(1, len(hashes) - w + 1)):
        window = hashes[i : i + w]
        m = min(window)
        if m != last:
            out.append(m)
            last = m
    return out


def shingles(tokens: Sequence[str], k: int = 3) -> List[str]:
    """Word k-shingles joined by a space; short docs yield one shingle."""
    if len(tokens) < k:
        return [" ".join(tokens)] if tokens else []
    return [" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]


def _hash64(value: str) -> int:
    return int.from_bytes(hashlib.md5(value.encode("utf-8")).digest()[:8], "big")


def _hash32(value: str) -> int:
    return int.from_bytes(hashlib.md5(value.encode("utf-8")).digest()[:4], "big")


# MinHash permutation-family modulus: the Mersenne prime 2^31 - 1.
# The modulus must sit JUST ABOVE the hashed-shingle universe for
# (a*x + b) mod p to behave like a random permutation.  The original
# choice of 2^61 - 1 over 32-bit x was a real statistical bug found by
# the round-6 seeded oracle fuzz (seed 505): with a < 2^31 the product
# a*x < 2^63 wraps the modulus at most 3 times — and for ~25% of the
# drawn a it never wraps at all, making the map MONOTONE in x.  Every
# such "permutation" selects the document's globally smallest shingle
# hash, so the whole signature was dominated by one shingle: a
# one-word edit near that shingle collapsed measured agreement to
# 0.15 at true Jaccard 0.875, and the banded LSH silently degenerated
# into an exact-duplicate detector (it only looked correct on corpora
# whose planted near-dups sat at J≈0.99).  Reducing x into Z_p first
# makes a*x < 2^62 (exact in uint64) and guarantees heavy wrapping.
_MINHASH_P = (1 << 31) - 1
# empty-doc sentinel: one value >= p (unreachable — all real mins are
# mod p), so empty docs never band-collide with real content
_MERSENNE = (1 << 61) - 1


@lru_cache(maxsize=16)
def _perm_params(num_perm: int, seed: int = 42) -> Tuple[np.ndarray, np.ndarray]:
    """(a, b) with a in [1, p-1], b in [0, p-1] for p = 2^31 - 1: a
    proper universal family over Z_p whose product a*x stays < 2^62 —
    exact inside uint64.  Cached: a pure function of (num_perm, seed)
    called once per document in the signature hot loop."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MINHASH_P, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MINHASH_P, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(tokens: Sequence[str], num_perm: int = 128, k: int = 3, seed: int = 42) -> List[int]:
    """MinHash signature over word k-shingles, (a*x+b) mod p family
    with p = 2^31 - 1 (see the _MINHASH_P note for why the modulus
    must hug the universe — the earlier 2^61-1 variant was a
    degenerate family).

    Shingles hash to 32 bits and are reduced into Z_p; the affine map
    then wraps the modulus ~2^30 times, so the min over each
    permutation row is an honest min-wise sample and one exact
    vectorized numpy reduction (the Python-loop version was the hot
    spot of the LSH dedup stage at bench scale).

    Empty docs get the all-max sentinel so they never collide with real
    content.
    """
    shs = shingles(tokens, k)
    a, b = _perm_params(num_perm, seed)
    if not shs:
        return [int(_MERSENNE)] * num_perm
    x = np.array([_hash32(s) for s in shs], dtype=np.uint64) % np.uint64(
        _MINHASH_P
    )
    vals = (a[:, None] * x[None, :] + b[:, None]) % np.uint64(_MINHASH_P)
    return [int(v) for v in vals.min(axis=1)]


def minhash_bands(signature: Sequence[int], bands: int = 16) -> List[str]:
    """LSH band keys: '{band_idx}:{md5(band values)}'."""
    rows = len(signature) // bands
    keys = []
    for bidx in range(bands):
        chunk = signature[bidx * rows : (bidx + 1) * rows]
        digest = hashlib.md5(",".join(str(v) for v in chunk).encode()).hexdigest()[:16]
        keys.append(f"{bidx}:{digest}")
    return keys


def simhash(tokens: Sequence[str]) -> int:
    """64-bit SimHash over unigram features (md5-based, deterministic)."""
    if not tokens:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for tok in tokens:
        h = _hash64(tok)
        for bit in range(64):
            acc[bit] += 1 if (h >> bit) & 1 else -1
    out = 0
    for bit in range(64):
        if acc[bit] > 0:
            out |= 1 << bit
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def jaccard(a: Iterable[str], b: Iterable[str]) -> float:
    sa, sb = set(a), set(b)
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)
