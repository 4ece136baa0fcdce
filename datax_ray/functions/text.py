"""Text-analysis operators for large-scale training-data pipelines:
token counting, quality scoring, language ID, document fingerprinting.

All are stateless vectorized `map_batches` transforms over Arrow batches
(language ID is a callable class so its stopword tables build once per
actor). No reference counterpart — DataX has no text ops (SURVEY.md §2A) —
these belong to the training-data uplift the engine must carry.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def add_token_count(t: pa.Table, col: str = "text", out: str = "n_tokens") -> pa.Table:
    """Whitespace token count, defined as count(' ') + 1 on the raw string —
    exactly `len(string_split(text, ' '))` so the DuckDB oracle matches."""
    spaces = pc.count_substring(t[col], pattern=" ")
    n = pc.add(spaces, 1)
    return t.append_column(out, pc.cast(n, pa.int64()))


def add_quality_signals(t: pa.Table, col: str = "text") -> pa.Table:
    """Cheap quality signals: char count, token count, period count, mean
    token length, uppercase-char count. All exact-arithmetic (ints/ratios of
    ints) so the SQL oracle hashes identically."""
    s = t[col]
    n_chars = pc.cast(pc.utf8_length(s), pa.int64())
    t = t.append_column("n_chars_calc", n_chars)
    t = add_token_count(t, col, "n_tokens")
    periods = pc.cast(pc.count_substring(s, pattern="."), pa.int64())
    t = t.append_column("n_periods", periods)
    upper = pc.cast(
        pc.subtract(
            pc.utf8_length(s), pc.count_substring_regex(s, pattern="[^A-Z]")
        ),
        pa.int64(),
    )
    t = t.append_column("n_upper", upper)
    return t


# Per-language stopword seeds for the n-gram/stopword heuristic language ID.
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "for", "it", "with", "was", "on"},
    "fr": {"le", "la", "les", "de", "des", "et", "un", "une", "est", "que", "pour", "dans", "il"},
    "de": {"der", "die", "das", "und", "ist", "ein", "eine", "nicht", "mit", "für", "auf", "den"},
    "es": {"el", "la", "los", "las", "de", "y", "un", "una", "es", "que", "por", "para", "con"},
}


class LangId:
    """Stopword-hit-rate language classifier (deterministic heuristic).

    Callable class => actor pool: the token regex compiles and the stopword
    tables intern once per actor (`__init__`), per-batch work is a pandas
    str split + set lookups.
    """

    def __init__(self, col: str = "text", out: str = "lang_pred"):
        import re

        self.col = col
        self.out = out
        self.word_re = re.compile(r"[a-zA-ZäöüßéèêàâçñíóúÄÖÜ]+")
        self.tables = {lang: frozenset(ws) for lang, ws in _STOPWORDS.items()}

    def _classify(self, text: str | None) -> str:
        if not text:
            return "unknown"
        toks = self.word_re.findall(text.lower())[:200]
        if not toks:
            return "unknown"
        best, best_hits = "unknown", 0
        for lang, table in self.tables.items():
            hits = sum(1 for w in toks if w in table)
            if hits > best_hits:
                best, best_hits = lang, hits
        return best

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t[self.col].to_pylist()
        preds = pa.array([self._classify(x) for x in texts], pa.string())
        return t.append_column(self.out, preds)


def add_fingerprint(t: pa.Table, col: str = "text", out: str = "fingerprint") -> pa.Table:
    """MD5-hex document fingerprint (matches DuckDB's md5(text))."""
    texts = t[col].to_pylist()
    fp = pa.array(
        [
            hashlib.md5(x.encode("utf-8")).hexdigest() if x is not None else None
            for x in texts
        ],
        pa.string(),
    )
    return t.append_column(out, fp)


def content_hash64(texts) -> np.ndarray:
    """Stable uint64 content hash — dedup keys, bucket keys, shingles.

    Vectorized via pandas' hash_array (siphash with the library's fixed
    default key — deterministic across processes, runs and nodes; the same
    primitive partitioning.py routes part_ids with). None hashes to 0.
    Round 1 used a per-row Python md5 loop here — the hot loop of the
    exact-dedup path; the outputs (dedup survivors, LSH buckets) are
    invariant to which stable hash function is used."""
    import pandas as pd

    arr = np.asarray(texts, dtype=object)
    if arr.size == 0:
        return np.empty(0, dtype=np.uint64)
    mask = pd.isna(arr)
    if mask.any():
        out = np.zeros(arr.size, dtype=np.uint64)
        out[~mask] = pd.util.hash_array(arr[~mask], categorize=False)
        return out
    return pd.util.hash_array(arr, categorize=False)
