"""Vectorized text-analysis kernels for the training-data operators:
token counting, quality stats, language-ID heuristic, winnowing
fingerprints. All pure functions over Arrow/numpy batches — used inside
``map_batches`` (stage classes precompile regexes once per actor).

Regex parity note: pyarrow.compute and DuckDB both use RE2, so
``\\S+``-style patterns count identically on both sides of the driver's
oracle comparison.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_RE = r"\S+"
WORDISH_RE = r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"  # BPE-ish: words + solo punct
PUNCT_RE = r"[.!?,;:]"

# tiny per-language stopword profiles (public common-word lists)
_LANG_STOPS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "zu"},
    "fr": {"le", "la", "et", "les", "des", "est", "un", "une"},
    "es": {"el", "la", "y", "los", "las", "es", "un", "una", "de"},
    "zh": set(),  # CJK handled by script detection
}


def token_counts(texts: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Whitespace token count = number of ``\\S+`` matches (RE2)."""
    return pc.count_substring_regex(texts, TOKEN_RE)


def wordish_counts(texts) -> pa.Array:
    return pc.count_substring_regex(texts, WORDISH_RE)


def punct_counts(texts) -> pa.Array:
    return pc.count_substring_regex(texts, PUNCT_RE)


def text_stats_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    """Integer text statistics (exactly SQL-reproducible)."""
    texts = t.column(text_col)
    return pa.table(
        {
            "doc_id": t.column("doc_id"),
            "n_chars_computed": pc.utf8_length(texts).cast(pa.int64()),
            "n_tokens": token_counts(texts).cast(pa.int64()),
            "n_wordish": wordish_counts(texts).cast(pa.int64()),
            "n_punct": punct_counts(texts).cast(pa.int64()),
        }
    )


def quality_scores(texts: list[str]) -> np.ndarray:
    """Heuristic quality in [0,1]: length band + stopword ratio + low
    punct/upper noise. Vectorized per batch (python split per doc — string
    work is inherently per-doc; the batch loop runs inside the pool)."""
    out = np.zeros(len(texts), dtype=np.float64)
    all_stops = set().union(*_LANG_STOPS.values())
    for i, s in enumerate(texts):
        toks = s.split()
        n = len(toks)
        if n == 0:
            continue
        stop_ratio = sum(1 for w in toks if w.lower() in all_stops) / n
        upper_ratio = sum(1 for c in s if c.isupper()) / max(1, len(s))
        mean_len = sum(len(w) for w in toks) / n
        len_score = min(1.0, n / 50.0)
        word_score = 1.0 if 3.0 <= mean_len <= 10.0 else 0.5
        out[i] = (0.4 * len_score + 0.3 * min(1.0, stop_ratio * 4)
                  + 0.2 * word_score + 0.1 * (1.0 - min(1.0, upper_ratio * 5)))
    return out


def lang_id(texts: list[str]) -> list[str]:
    """n-gram/stopword heuristic language guess (rows-only operator; the
    sf `lang` column is synthetic noise, so this is a real classifier, not
    a label reproduction)."""
    out = []
    for s in texts:
        # CJK script short-circuit
        if any("一" <= c <= "鿿" for c in s[:200]):
            out.append("zh")
            continue
        toks = [w.lower() for w in s.split()[:80]]
        best, best_n = "en", -1
        for lang, stops in _LANG_STOPS.items():
            if not stops:
                continue
            n = sum(1 for w in toks if w in stops)
            if n > best_n:
                best, best_n = lang, n
        out.append(best)
    return out


_FP_BASE = np.uint64(1099511628211)


def winnow_fingerprint(texts: list[str], k: int = 8, w: int = 16) -> np.ndarray:
    """Winnowing document fingerprint (Schleimer et al., SIGMOD'03 style):
    rolling k-gram hashes, min per sliding window, xor of selected mins.
    numpy-vectorized per document via stride tricks."""
    out = np.zeros(len(texts), dtype=np.uint64)
    for i, s in enumerate(texts):
        b = np.frombuffer(s.encode("utf-8"), dtype=np.uint8)
        if len(b) < k:
            out[i] = np.uint64(len(b))
            continue
        n = len(b) - k + 1
        with np.errstate(over="ignore"):
            h = np.zeros(n, dtype=np.uint64)
            for j in range(k):  # k small constant → k vector ops
                h = h * _FP_BASE + b[j: j + n].astype(np.uint64)
        if n <= w:
            out[i] = np.uint64(h.min())
            continue
        sw = np.lib.stride_tricks.sliding_window_view(h, w)
        mins = sw.min(axis=1)
        sel = np.unique(mins)
        out[i] = np.bitwise_xor.reduce(sel)
    return out


def json_int_field(strings: list[str], key: str) -> np.ndarray:
    """Extract an integer field from a column of JSON strings,
    vectorized-first: one compiled-C regex pass (``pandas .str.extract``)
    handles the common flat layout; only rows the regex misses fall back
    to ``json.loads`` (and rows without the key, or unparseable, yield
    the int64 sentinel ``iinfo(int64).min``). Mirrors DuckDB's
    ``json_extract_string(props, '$.key')`` for flat objects so the
    oracle comparison is value-exact.
    """
    import json
    import re

    import pandas as pd

    s = pd.Series(strings, dtype="object")
    pat = re.compile(r'"%s"\s*:\s*(-?\d+)' % re.escape(key))
    ext = s.str.extract(pat, expand=False)
    out = pd.to_numeric(ext, errors="coerce")
    sentinel = np.iinfo(np.int64).min
    miss = out.isna().to_numpy()
    vals = out.fillna(sentinel).to_numpy(dtype=np.int64)
    if miss.any():
        for i in np.flatnonzero(miss):
            try:
                v = json.loads(s.iloc[i]).get(key)
            except (TypeError, ValueError):
                v = None
            if isinstance(v, int) and not isinstance(v, bool):
                vals[i] = v
    return vals
