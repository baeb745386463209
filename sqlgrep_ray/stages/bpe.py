"""BPE tokenizer training and encoding over a Ray Dataset corpus.

The canonical tokenizer-training shape (Sennrich et al. 2016; what
HF/SentencePiece trainers do): ONE distributed pass reduces the corpus to
its word-frequency table, and the merge loop then iterates over that
table — work per merge is bounded by VOCABULARY size, not corpus size, so
the corpus-scale part is exactly ``vocab.token_frequencies`` (combiner-
first, one vocabulary-bounded shuffle) and the loop runs wherever the
table fits (driver here; prune with ``min_count`` for web-scale vocabs).

Encoding rides the same trick in reverse: merges are applied once per
UNIQUE word (dictionary-encode), then per-document piece counts are one
segment sum over the occurrence stream.

Determinism: merge selection breaks count ties by lexicographic pair
order, so identical corpora give identical merge tables everywhere.
"""

from __future__ import annotations

from collections import Counter
from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from sqlgrep_ray.stages.textnorm import split_whitespace

_EOW = "</w>"  # end-of-word marker, standard BPE


def _word_to_symbols(word: str) -> tuple:
    return tuple(word) + (_EOW,)


def bpe_merge_loop(
    word_counts: "dict[str, int]", n_merges: int
) -> "list[tuple[str, str]]":
    """Greedy BPE merges over a word-frequency table (pure local compute,
    vocabulary-bounded)."""
    words = {w: _word_to_symbols(w) for w in word_counts}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: Counter = Counter()
        for w, syms in words.items():
            c = word_counts[w]
            for i in range(len(syms) - 1):
                pair_counts[(syms[i], syms[i + 1])] += c
        if not pair_counts:
            break
        # deterministic: highest count, ties to the lexicographically
        # smallest pair
        top = max(pair_counts.values())
        best_pair = min(p for p, c in pair_counts.items() if c == top)
        merges.append(best_pair)
        a, b = best_pair
        ab = a + b
        new_words = {}
        for w, syms in words.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words[w] = tuple(out)
        words = new_words
    return merges


def apply_merges(word: str, merges: Sequence[tuple]) -> "list[str]":
    """Encode one word with a trained merge table (reference kernel)."""
    syms = list(_word_to_symbols(word))
    rank = {tuple(m): i for i, m in enumerate(merges)}
    while len(syms) > 1:
        pairs = [(rank.get((syms[i], syms[i + 1])), i) for i in range(len(syms) - 1)]
        cand = [(r, i) for r, i in pairs if r is not None]
        if not cand:
            break
        r, i = min(cand)
        syms[i : i + 2] = [syms[i] + syms[i + 1]]
    return syms


def train_bpe(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    n_merges: int = 100,
    min_count: int = 1,
    max_vocab: "int | None" = None,
    lower: bool = True,
) -> "list[tuple[str, str]]":
    """Distributed word-count pass + local merge loop → merge table.

    The collected table is vocabulary-bounded; for web-scale corpora cap
    it with ``min_count`` and/or ``max_vocab`` (keep only the most
    frequent words — combiner-first top-k, the standard trainer
    truncation), so the driver never holds the long tail."""
    if max_vocab is not None:
        from sqlgrep_ray.stages.vocab import top_tokens

        freqs = top_tokens(ds, max_vocab, text_col=text_col, lower=lower)
    else:
        from sqlgrep_ray.stages.vocab import token_frequencies

        freqs = token_frequencies(
            ds, text_col=text_col, lower=lower, min_count=min_count
        )
    wc: dict[str, int] = {}
    for batch in freqs.iter_batches(batch_format="pyarrow"):
        for w, c in zip(batch["token"].to_pylist(), batch["count"].to_pylist()):
            wc[w] = c
    return bpe_merge_loop(wc, n_merges)


def bpe_token_counts(
    ds: "ray.data.Dataset",
    merges: Sequence[tuple],
    id_col: str = "doc_id",
    text_col: str = "text",
    lower: bool = True,
) -> "ray.data.Dataset":
    """(id, n_words, n_pieces) per document: BPE applied once per UNIQUE
    word in the batch (dictionary-encode), piece counts segment-summed
    back to rows. Text never leaves the stage."""
    merges = [tuple(m) for m in merges]

    def count(t: pa.Table) -> pa.Table:
        col = t[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        filled = pc.fill_null(col, "")
        if lower:
            filled = pc.utf8_lower(filled)
        splits = split_whitespace(filled)
        if isinstance(splits, pa.ChunkedArray):
            splits = splits.combine_chunks()
        flat = splits.flatten()
        offsets = splits.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(nonempty))
        cum = np.concatenate([[0], np.cumsum(nonempty, dtype=np.int64)])
        offs = cum[offsets]
        starts, ends = offs[:-1], offs[1:]
        n_words = ends - starts
        enc = pc.dictionary_encode(flat)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        piece_per_uniq = np.fromiter(
            (len(apply_merges(w, merges)) for w in enc.dictionary.to_pylist()),
            dtype=np.int64,
            count=len(enc.dictionary),
        )
        per_occ = piece_per_uniq[codes] if len(codes) else np.array([], np.int64)
        cs = np.concatenate([[0], np.cumsum(per_occ, dtype=np.int64)])
        n_pieces = cs[ends] - cs[starts]
        return pa.table(
            {
                id_col: t[id_col],
                "n_words": pa.array(n_words),
                "n_pieces": pa.array(n_pieces),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        count, batch_format="pyarrow", zero_copy_batch=True
    )
