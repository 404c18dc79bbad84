"""Text analysis primitives for the large-scale training-data operators:
tokenization, quality stats, language-ID heuristic, fingerprints, shingles,
minhash/simhash.  All pure functions over strings/numpy — used inside
map_batches stages (stages/dedup.py, pipelines/queries.py).

The reference has per-document text machinery (BM25 content filters,
content_filter_strategy.py:507-530; chunkers, chunking_strategy.py:28-256);
corpus-level dedup/fingerprinting is our extension required by the task
brief (training-data pipeline operators).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

from ..hashing import h64, h64_with_seed, md5_64

_WS_SPLIT = re.compile(r"\s+")
_NON_ALPHA = re.compile(r"[^a-zA-Z]")
_ANY_WS = re.compile(r"\s")
# BPE-ish word/punct splitter: words, numbers, or single punctuation marks
_BPE_RE = re.compile(r"[A-Za-z]+(?:'[a-z]+)?|\d+|[^\sA-Za-z\d]")


def tokens(text: str) -> list[str]:
    """Whitespace tokens (empty-safe)."""
    return [t for t in _WS_SPLIT.split(text) if t]


def token_count(text: str) -> int:
    return len(tokens(text))


def bpe_ish_tokens(text: str) -> list[str]:
    """Regex token split approximating BPE pre-tokenization granularity."""
    return _BPE_RE.findall(text)


def quality_stats(text: str) -> dict:
    """Length/punctuation/stopword-style quality features."""
    n_chars = len(text)
    toks = tokens(text)
    n_tokens = len(toks)
    # non-whitespace char count == Σ len(token) (cheaper than a regex sub)
    compact_len = sum(map(len, toks))
    alpha_len = sum(len(m) for m in re.findall(r"[a-zA-Z]+", text))
    from .numeric import duck_round

    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "avg_token_len": float(duck_round(compact_len / n_tokens, 3)) if n_tokens else 0.0,
        "alpha_ratio": float(duck_round(alpha_len / n_chars, 3)) if n_chars else 0.0,
    }


def repetition_stats(text: str) -> dict:
    """Gopher/RefinedWeb-style token-repetition features (Rae et al. 2021
    §A1.1 "repetition removal"; public heuristic family — the reference has
    no corpus-quality machinery, this is a training-data-pipeline extension):

    - ``distinct_ratio``  — type/token ratio (distinct tokens / tokens)
    - ``top_token_frac``  — fraction of tokens that are the single most
      frequent token
    - ``top_bigram_frac`` — fraction of token bigrams that are the most
      frequent bigram
    - ``repetitive``      — flag: top_bigram_frac > 0.18 or
      distinct_ratio < 0.2 (Gopher-style cutoffs)

    Tokenization is lower(text) split on whitespace, identical to the SQL
    oracle's regexp_split_to_array(lower(text), '\\s+')."""
    from collections import Counter

    from .numeric import duck_round

    toks = tokens(text.lower())
    n = len(toks)
    if n == 0:
        return {
            "n_tokens": 0,
            "distinct_ratio": 0.0,
            "top_token_frac": 0.0,
            "top_bigram_frac": 0.0,
            "repetitive": False,
        }
    counts = Counter(toks)
    distinct_ratio = float(duck_round(len(counts) / n, 4))
    top_token_frac = float(duck_round(max(counts.values()) / n, 4))
    if n >= 2:
        gram_counts = Counter(
            " ".join((toks[i], toks[i + 1])) for i in range(n - 1)
        )
        top_bigram_frac = float(duck_round(max(gram_counts.values()) / (n - 1), 4))
    else:
        top_bigram_frac = 0.0
    return {
        "n_tokens": n,
        "distinct_ratio": distinct_ratio,
        "top_token_frac": top_token_frac,
        "top_bigram_frac": top_bigram_frac,
        "repetitive": top_bigram_frac > 0.18 or distinct_ratio < 0.2,
    }


# ---------------------------------------------------------------- language ID
# tiny stopword profiles (top function words per language); the heuristic
# scores each language by stopword hits per token and returns the argmax.
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "in", "is", "it", "that", "for", "with", "was", "on", "a"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "von", "zu", "den"},
    "fr": {"le", "la", "les", "et", "est", "une", "des", "dans", "que", "pour", "pas", "du"},
    "es": {"el", "la", "los", "las", "y", "es", "una", "en", "que", "por", "con", "del", "no"},
    "zh": set(),  # han-script detection below
}


def detect_language(text: str) -> str:
    """n-gram/stopword heuristic language ID; 'und' when undecidable."""
    if not text:
        return "und"
    han = sum(1 for c in text[:400] if "一" <= c <= "鿿")
    if han > len(text[:400]) * 0.2:
        return "zh"
    toks = [t.lower() for t in tokens(text)[:200]]
    if not toks:
        return "und"
    best, best_score = "und", 0.0
    for lang, sw in _STOPWORDS.items():
        if not sw:
            continue
        score = sum(1 for t in toks if t in sw) / len(toks)
        if score > best_score:
            best, best_score = lang, score
    return best if best_score > 0.02 else "und"


# --------------------------------------------------------------- fingerprints
def md5_fingerprint(text: str) -> str:
    return hashlib.md5(text.encode("utf-8", "surrogatepass")).hexdigest()


def rolling_fingerprint(text: str, base: int = 1_000_003, mod: int = (1 << 61) - 1) -> int:
    """Polynomial rolling hash over whitespace tokens (document fingerprint).

    Token hash is ``md5_64`` so the DuckDB oracle can recompute the identical
    fingerprint in SQL (list_reduce over hex-parsed md5 prefixes)."""
    h = 0
    for t in tokens(text):
        h = (h * base + md5_64(t)) % mod
    return h


def shingles(text: str, k: int = 3) -> set[str]:
    """k-token shingles (n-gram units for jaccard/minhash)."""
    toks = tokens(text.lower())
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Distinct md5_64 hashes of the k-token shingles, sorted ascending.

    The dedup join ships these (8 bytes/shingle) instead of the text; jaccard
    over distinct hash sets equals jaccard over shingle sets (and the DuckDB
    oracle computes the very same hash values, so even a collision agrees)."""
    sh = shingles(text, k)
    if not sh:
        return np.empty(0, dtype=np.uint64)
    arr = np.fromiter((md5_64(s) for s in sh), dtype=np.uint64, count=len(sh))
    arr.sort()
    return arr


def shingle_hash_rows(
    texts: list[str], k: int = 3
) -> tuple[np.ndarray, np.ndarray]:
    """Batch unique-first shingle hashing: ``md5_64`` runs once per
    batch-DISTINCT shingle (Zipf repetition across documents makes this
    3-8× fewer digests than hashing per document — measured 7.7× on the
    benchmark corpus), then hashes scatter back to per-document rows.
    The md5 digest is ~50× the cost of the dict probe that replaces it,
    so the dedup is nearly free.

    Returns ``(base, offs)``: ``base`` is every document's DISTINCT
    (unsorted) shingle hashes concatenated in document order;
    ``base[offs[i]:offs[i+1]]`` are document i's rows (empty documents
    are zero-width slices).  ``np.sort`` of a slice equals
    ``shingle_hashes(texts[i], k)`` exactly — same md5_64 values, so the
    DuckDB oracle contract is untouched."""
    sets = [shingles(t or "", k) for t in texts]
    offs = np.zeros(len(sets) + 1, dtype=np.int64)
    np.cumsum([len(s) for s in sets], out=offs[1:])
    index: dict[str, int] = {}
    inv = np.empty(int(offs[-1]), dtype=np.int64)
    pos = 0
    for s in sets:
        for x in s:
            j = index.get(x)
            if j is None:
                j = index[x] = len(index)
            inv[pos] = j
            pos += 1
    if not index:
        return np.empty(0, dtype=np.uint64), offs
    uniq_h = np.fromiter(
        (md5_64(x) for x in index), dtype=np.uint64, count=len(index)
    )
    return uniq_h[inv], offs


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    union = len(a) + len(b) - inter
    return inter / union if union else 0.0


# ------------------------------------------------------------------- minhash
class MinHasher:
    """64-perm minhash via seeded rehash of a base 64-bit hash (build once
    per worker — classic stateful map_batches setup).

    Every ingredient is DuckDB-recomputable so the LSH dedup pipeline has a
    full SQL oracle: base hash = ``md5_64`` (hex-parse in SQL), permutations
    = (base·a + b) mod 2⁶⁴ with a < 2³¹ odd and b < 2³¹ (so the SQL-side
    HUGEINT product base·a < 2⁹⁵ never overflows INT128 before the mod, while
    numpy gets the identical value from native uint64 wraparound), and band
    keys = '-'-joined decimal strings of the band's signature slots."""

    def __init__(self, num_perm: int = 64, seed: int = 1):
        self.num_perm = num_perm
        rng = np.random.RandomState(seed)
        self.a = (rng.randint(1, 2**30, size=num_perm).astype(np.uint64)
                  * np.uint64(2) + np.uint64(1))  # odd, < 2^31
        self.b = rng.randint(0, 2**31, size=num_perm).astype(np.uint64)

    def signature_from_hashes(self, hashes: np.ndarray) -> np.ndarray:
        if len(hashes) == 0:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        # multiply-shift permutations, vectorized over (shingles × perms);
        # uint64 arithmetic wraps mod 2^64 by construction
        vals = hashes[:, None] * self.a[None, :] + self.b[None, :]
        return vals.min(axis=0)

    def signature(self, shingle_set: set[str]) -> np.ndarray:
        if not shingle_set:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        base = np.fromiter(
            (md5_64(s) for s in shingle_set), dtype=np.uint64, count=len(shingle_set)
        )
        return self.signature_from_hashes(base)

    def signatures_from_rows(
        self, base: np.ndarray, offs: np.ndarray
    ) -> np.ndarray:
        """Vectorized batch form of ``signature_from_hashes``: one
        (rows × perms) permutation matrix + ``np.minimum.reduceat`` at the
        per-document offsets replaces the per-document Python loop.
        ``(base, offs)`` come from ``shingle_hash_rows``; row i of the
        result equals ``signature_from_hashes(base[offs[i]:offs[i+1]])``
        bit-for-bit (empty documents get the all-max sentinel signature,
        matching ``signature(set())``)."""
        n = len(offs) - 1
        out = np.full(
            (n, self.num_perm), np.iinfo(np.uint64).max, dtype=np.uint64
        )
        if len(base) == 0 or n == 0:
            return out
        vals = base[:, None] * self.a[None, :] + self.b[None, :]
        nonempty = np.flatnonzero(np.diff(offs) > 0)
        # starts are strictly increasing and empty docs contribute no rows,
        # so each reduceat segment is exactly one document's rows
        out[nonempty] = np.minimum.reduceat(vals, offs[nonempty], axis=0)
        return out

    def bands(self, sig: np.ndarray, band_rows: int = 8) -> list[str]:
        """LSH band keys: the band's signature slots as a joined decimal
        string (SQL: array_to_string(array_agg(sig ORDER BY pid), '-'))."""
        n_bands = self.num_perm // band_rows
        return [
            "-".join(str(int(v)) for v in sig[b * band_rows : (b + 1) * band_rows])
            for b in range(n_bands)
        ]

    def bands_bytes(self, sig: np.ndarray, band_rows: int = 8) -> list[bytes]:
        """Band keys as the band's raw 8 uint64 slots (little-endian bytes)
        — injectively equivalent to ``bands()`` (two docs share a byte key
        iff they share the decimal-string key), so LSH bucket groupings are
        identical while skipping per-slot Python int→str formatting.  The
        engine groups on these internally; the SQL oracle rebuilds its OWN
        band keys from the same signature slots, so the key format never
        crosses the comparison."""
        n_bands = self.num_perm // band_rows
        return [
            sig[b * band_rows : (b + 1) * band_rows].tobytes()
            for b in range(n_bands)
        ]


# -------------------------------------------------------------------- simhash
def simhash64(text: str) -> int:
    """64-bit simhash over whitespace tokens (token-frequency weighted).

    Vectorized: unique tokens hash once, the (n_tokens × 64) bit matrix is a
    single numpy broadcast — constant Python overhead per document."""
    toks = tokens(text.lower())
    if not toks:
        return 0
    uniq, counts = np.unique(np.asarray(toks, dtype=object), return_counts=True)
    # md5_64 so the DuckDB oracle can recompute bit-identical signatures
    hashes = np.fromiter((md5_64(t) for t in uniq), dtype=np.uint64, count=len(uniq))
    bits = (hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
    weights = np.where(bits.astype(bool), counts[:, None], -counts[:, None])
    acc = weights.sum(axis=0)
    out = np.uint64(0)
    mask = acc > 0
    out = int((np.uint64(1) << np.arange(64, dtype=np.uint64))[mask].sum())
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")
