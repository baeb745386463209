"""BPE tokenizer training/encoding (stages/bpe.py)."""

import pyarrow as pa


def _ds(texts):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


def test_merge_loop_reference():
    """Classic Sennrich toy example: low/lower/newest/widest."""
    from sqlgrep_ray.stages.bpe import bpe_merge_loop

    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = bpe_merge_loop(wc, 4)
    # 'es' appears 9x (newest+widest) -> first; then 'es'+'t' 9x; then
    # 'est'+'</w>' 9x; then 'l'+'o' 7x
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", "</w>")
    assert merges[3] == ("l", "o")


def test_apply_merges_matches_training_segmentation():
    from sqlgrep_ray.stages.bpe import apply_merges, bpe_merge_loop

    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = bpe_merge_loop(wc, 10)
    # a trained word encodes to few pieces; an unseen word decomposes
    assert apply_merges("newest", merges) == ["newest</w>"] or len(
        apply_merges("newest", merges)
    ) <= 3
    assert len(apply_merges("zzz", merges)) == 4  # z z z </w> (no merges)


def test_train_and_count_distributed(ray_session):
    from sqlgrep_ray.stages.bpe import apply_merges, bpe_token_counts, train_bpe

    corpus = _ds(
        ["low low lower", "newest widest newest", "", "the newest low"]
    )
    merges = train_bpe(corpus, n_merges=6)
    out = {r["doc_id"]: r for r in bpe_token_counts(corpus, merges).take_all()}
    assert out[2]["n_words"] == 0 and out[2]["n_pieces"] == 0
    # per-doc piece count equals the per-word reference sum
    for i, text in enumerate(["low low lower", "newest widest newest", "", "the newest low"]):
        want = sum(len(apply_merges(w, merges)) for w in text.lower().split())
        assert out[i]["n_pieces"] == want, (i, text)
    # determinism across retrains
    assert merges == train_bpe(corpus, n_merges=6)


def test_train_bpe_max_vocab(ray_session):
    """max_vocab truncation keeps the most frequent words and still trains."""
    from sqlgrep_ray.stages.bpe import train_bpe

    corpus = _ds(["low low low lower rare1 rare2", "newest newest widest"])
    full = train_bpe(corpus, n_merges=4)
    capped = train_bpe(corpus, n_merges=4, max_vocab=3)
    assert len(capped) == 4
    # merges trained on {low, newest, widest|lower} — deterministic
    assert capped == train_bpe(corpus, n_merges=4, max_vocab=3)
    assert isinstance(full, list)


def test_bpe_oracle_equivalences():
    """Pins the two facts the bpe_counts self-training DuckDB oracle
    (contract._bpe_counts_oracle_sql) rests on: (1) greedy rank-priority
    ENCODING of a training word equals that word's training END STATE;
    (2) merging one LEFTMOST occurrence repeatedly (the recursive-CTE
    step) equals the engine's single left-to-right pass per merge —
    neither holds by accident: the merged token ab can never recreate
    the pair (a,b) adjacent to itself (ab != a and ab != b)."""
    import random

    from sqlgrep_ray.stages.bpe import (
        _word_to_symbols,
        apply_merges,
        bpe_merge_loop,
    )

    rng = random.Random(3)
    words: dict[str, int] = {}
    for _ in range(400):
        w = "".join(
            rng.choices("abcdef", k=rng.randint(1, 9))
        )
        words[w] = words.get(w, 0) + rng.randint(1, 30)
    merges = bpe_merge_loop(words, 40)

    def l2r(syms, a, b):
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return tuple(out)

    def leftmost_repeat(syms, a, b):
        syms = list(syms)
        while True:
            for i in range(len(syms) - 1):
                if syms[i] == a and syms[i + 1] == b:
                    syms[i : i + 2] = [a + b]
                    break
            else:
                return tuple(syms)

    state = {w: _word_to_symbols(w) for w in words}
    state_lr = dict(state)
    for a, b in merges:
        for w in words:
            state[w] = l2r(state[w], a, b)
            state_lr[w] = leftmost_repeat(state_lr[w], a, b)
    assert state == state_lr  # (2)
    for w in words:  # (1)
        assert tuple(apply_merges(w, merges)) == state[w], w
