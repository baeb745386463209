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
