"""Text-analysis operators for training-data pipelines.

Not present in the reference (sqlgrep's text ops stop at regex capture +
``length/upper/lower``, SURVEY §2.3); these are the large-scale curation
additions the north_star calls for. Each is a stateless vectorized
``map_batches`` stage over the ``text`` column:

* ``token_stats``      — whitespace tokens + BPE-ish word/punct pieces.
* ``quality_score``    — length / punctuation / stopword / alpha heuristics.
* ``language_id``      — character n-gram profile match (en/de/fr/es here;
                         profiles are tiny and embedded — swap for real
                         profiles at scale).
* ``fingerprint``      — 64-bit content fingerprint (normalized rolling hash)
                         for exact-ish duplicate detection and lineage.

All outputs append columns; nothing materializes the dataset.
"""

from __future__ import annotations

import hashlib
import re
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# BPE-ish piece splitter: word-with-leading-space pieces, numbers, punct runs
_BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]+")

_STOPWORDS = frozenset(
    "the a an and or of to in is are was were be been for on with as at by it "
    "this that from not have has had but they you we he she i".split()
)

# character-trigram profiles per language (top distinctive trigrams; a tiny
# embedded stand-in for a real fastText-style model, which isn't in this
# container). Heuristic, deterministic, good enough for routing/filters.
_LANG_PROFILES: dict[str, frozenset[str]] = {
    "en": frozenset(
        [" th", "the", "he ", " an", "and", "nd ", "ing", "ng ", " of", "of ",
         "ion", " to", "to ", "ent", " in", "ed ", "is ", " is", "at ", "er "]
    ),
    "de": frozenset(
        [" de", "der", "er ", "ie ", "die", "ein", "ich", "ch ", "sch", "und",
         " un", "nd ", "en ", "ung", "cht", " ge", "das", "as ", "ber", "ten"]
    ),
    "fr": frozenset(
        [" de", "de ", "es ", " le", "le ", "ent", "la ", " la", "ion", "que",
         " qu", "ue ", "re ", " pa", "ais", "eur", "our", " et", "et ", "ons"]
    ),
    "es": frozenset(
        [" de", "de ", "os ", " la", "la ", "ión", "que", " qu", "ue ", "el ",
         " el", "ar ", " co", "es ", "ado", "con", "ent", "cio", " en", "en "]
    ),
}
_LANGS = sorted(_LANG_PROFILES)


def _trigrams(text: str) -> list[str]:
    t = f" {text.lower()} "
    return [t[i : i + 3] for i in range(len(t) - 2)]


def detect_language(text: Optional[str]) -> str:
    """Best-matching language code, or 'und' when nothing matches."""
    if not text:
        return "und"
    tris = _trigrams(text[:2000])  # cap work per doc
    if not tris:
        return "und"
    best_lang, best = "und", 0.0
    for lang in _LANGS:
        prof = _LANG_PROFILES[lang]
        hits = sum(1 for t in tris if t in prof)
        score = hits / len(tris)
        if score > best:
            best, best_lang = score, lang
    return best_lang if best >= 0.04 else "und"


def fingerprint64(text: Optional[str]) -> int:
    """Deterministic 64-bit fingerprint of whitespace-normalized text."""
    norm = " ".join((text or "").split()).lower().encode()
    return int.from_bytes(hashlib.blake2b(norm, digest_size=8).digest(), "little")


class TextStats:
    """map_batches stage appending token/quality/lang/fingerprint columns.

    Column set is opt-in so pipelines only pay for what they use.
    """

    def __init__(
        self,
        text_col: str = "text",
        tokens: bool = True,
        quality: bool = True,
        language: bool = True,
        fingerprint: bool = True,
    ):
        self.text_col = text_col
        self.tokens = tokens
        self.quality = quality
        self.language = language
        self.fingerprint = fingerprint

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        texts = col.to_pylist()
        n = len(texts)

        if self.tokens:
            ws = np.empty(n, dtype=np.int64)
            bpe = np.empty(n, dtype=np.int64)
            for i, t in enumerate(texts):
                s = t or ""
                ws[i] = len(s.split())
                bpe[i] = len(_BPE_RE.findall(s))
            batch = batch.append_column("n_tokens_ws", pa.array(ws))
            batch = batch.append_column("n_tokens_bpe", pa.array(bpe))

        if self.quality:
            # vectorized char-class ratios via Arrow kernels
            n_chars = pc.utf8_length(col).cast(pa.float64())
            safe_len = pc.max_element_wise(n_chars, 1.0)
            alpha = np.empty(n, dtype=np.float64)
            punct = np.empty(n, dtype=np.float64)
            stop = np.empty(n, dtype=np.float64)
            for i, t in enumerate(texts):
                s = t or ""
                if not s:
                    alpha[i] = punct[i] = stop[i] = 0.0
                    continue
                alpha[i] = sum(c.isalpha() or c.isspace() for c in s) / len(s)
                punct[i] = sum(not c.isalnum() and not c.isspace() for c in s) / len(s)
                toks = s.lower().split()
                stop[i] = (
                    sum(tk.strip(".,!?;:'\"") in _STOPWORDS for tk in toks) / len(toks)
                    if toks
                    else 0.0
                )
            # composite score in [0,1]: long enough, alphabetic, some stopwords,
            # not punctuation soup — the C4/Gopher-style cheap filters
            length_ok = np.minimum(
                np.asarray(safe_len) / 200.0, 1.0
            )
            score = (
                0.35 * length_ok + 0.30 * alpha + 0.25 * np.minimum(stop * 3, 1.0)
                + 0.10 * (1.0 - np.minimum(punct * 4, 1.0))
            )
            batch = batch.append_column("alpha_ratio", pa.array(alpha))
            batch = batch.append_column("punct_ratio", pa.array(punct))
            batch = batch.append_column("stopword_ratio", pa.array(stop))
            batch = batch.append_column("quality_score", pa.array(score))

        if self.language:
            langs = pa.array([detect_language(t) for t in texts], pa.string())
            batch = batch.append_column("lang_pred", langs)

        if self.fingerprint:
            fps = np.fromiter(
                (fingerprint64(t) for t in texts), dtype=np.uint64, count=n
            )
            batch = batch.append_column("fingerprint", pa.array(fps, pa.uint64()))
        return batch


_STATS_CACHE: dict = {}  # per-worker-process stage state (stateless tasks)


def text_stats(
    ds: "ray.data.Dataset", text_col: str = "text", **kwargs
) -> "ray.data.Dataset":
    key = (text_col, tuple(sorted(kwargs.items())))

    def stats_batch(t: pa.Table, key=key):
        st = _STATS_CACHE.get(key)
        if st is None:
            st = _STATS_CACHE[key] = TextStats(text_col, **dict(key[1]))
        return st(t)

    return ds.map_batches(
        stats_batch,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
