"""Text-analysis kernels for the documents table: token counting,
quality stats, n-gram language ID, rolling-hash fingerprints.

These are the large-scale-training-data operators the engine adds
beyond the reference (which has no text path); all are vectorized or
cheap-per-row map_batches kernels over Arrow batches.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

_PUNCT = re.compile(r"[.,!?]")
_WORD = re.compile(r"[A-Za-z]+")

# tiny trigram profiles for a deterministic, dependency-free language
# heuristic (en/de/fr/es-ish); scores are counts of highly-indicative
# character trigrams. This is a heuristic — no SQL oracle.
_LANG_TRIGRAMS = {
    "en": (" th", "the", "ing", " an", "and", "ion", " of", "of "),
    "de": ("der", "ein", "sch", "ich", "und", " de", "die", "en "),
    "fr": (" le", "les", "que", " de", "ent", "tion", "é", "à "),
    "es": (" el", " de", "que", "ión", "los", "ar ", "o d", "a d"),
}


def md5_hex(texts: list[str]) -> list[str]:
    """Content hash matching DuckDB's md5() (utf-8, lowercase hex) —
    the exact-dedup key."""
    return [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]


def ws_token_count(texts: list[str]) -> np.ndarray:
    """Non-empty chunks when splitting on single spaces (SQL-mirrorable:
    list_filter(str_split(text, ' '), x -> x <> ''))."""
    return np.asarray([sum(1 for t in s.split(" ") if t) for s in texts], dtype=np.int64)


def bpe_ish_token_count(texts: list[str]) -> np.ndarray:
    """A BPE-flavored token estimate: words + digits + punctuation
    runs, via one compiled regex (no SQL oracle — heuristic)."""
    pat = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]")
    return np.asarray([len(pat.findall(s)) for s in texts], dtype=np.int64)


def punct_count(texts: list[str]) -> np.ndarray:
    return np.asarray([len(_PUNCT.findall(s)) for s in texts], dtype=np.int64)


def quality_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append n_tokens / n_punct / n_chars_actual / mean_word_len-free
    integer quality columns (integers only: exact cross-engine)."""
    texts = batch[text_col].to_pylist()
    return (
        batch.append_column("n_tokens", pa.array(ws_token_count(texts)))
        .append_column("n_punct", pa.array(punct_count(texts)))
        .append_column(
            "n_chars_actual", pa.array(np.asarray([len(s) for s in texts], dtype=np.int64))
        )
    )


def lang_id(texts: list[str]) -> list[str]:
    """n-gram heuristic language ID; 'und' when nothing matches."""
    out = []
    for s in texts:
        low = s.lower()
        best, best_score = "und", 0
        for lang, grams in _LANG_TRIGRAMS.items():
            score = sum(low.count(g) for g in grams)
            if score > best_score:
                best, best_score = lang, score
        out.append(best)
    return out


def rolling_fingerprint(texts: list[str], window: int = 16) -> np.ndarray:
    """Document fingerprint: min of a Rabin-Karp rolling hash over
    byte windows (a winnowing-lite sketch; equal for equal documents,
    robust to position shifts of shared substrings)."""
    MOD = (1 << 61) - 1
    BASE = 257
    pw = pow(BASE, window - 1, MOD)
    out = np.empty(len(texts), dtype=np.int64)
    for i, s in enumerate(texts):
        b = s.encode("utf-8")
        if len(b) < window:
            out[i] = int(hashlib.md5(b).hexdigest()[:15], 16)
            continue
        h = 0
        best = MOD
        for j, ch in enumerate(b):
            if j >= window:
                h = (h - b[j - window] * pw) % MOD
            h = (h * BASE + ch) % MOD
            if j >= window - 1 and h < best:
                best = h
        out[i] = best
    return out
