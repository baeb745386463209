"""CCNet-style char-trigram LM quality scoring (stages/lmscore.py)."""

import numpy as np
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


def test_lm_counts_and_oov(ray_session):
    from sqlgrep_ray.stages.lmscore import lm_score, train_char_lm

    ref = _ds(["the cat sat on the mat", "the dog sat on the log"])
    model = train_char_lm(ref)
    assert model[2] == sum(model[1])  # total == sum of counts
    scored = {
        r["doc_id"]: r
        for r in lm_score(
            _ds(["the cat sat", "zq#x@v!!", "ab", ""]), model
        ).take_all()
    }
    # doc 2 (< 3 normalized bytes) and doc 3 (empty) are dropped
    assert set(scored) == {0, 1}
    # "the cat sat" normalizes to 11 chars -> 9 trigrams, all seen in ref
    assert scored[0]["n_trigrams"] == 9 and scored[0]["n_oov"] == 0
    # junk doc: every trigram OOV, far higher bits/char than in-domain text
    assert scored[1]["n_oov"] == scored[1]["n_trigrams"]
    assert scored[1]["bits_per_char"] > scored[0]["bits_per_char"]


def test_lm_bits_per_char_reference(ray_session):
    """bits_per_char matches a direct python reference computation."""
    from sqlgrep_ray.stages.lmscore import _V, lm_score, train_char_lm

    ref_texts = ["abcabcabc", "abcd abcd"]
    model = train_char_lm(_ds(ref_texts))
    codes, counts, total = model
    lut = {int(c): int(k) for c, k in zip(codes, counts)}

    def py_bits(text):
        s = " ".join(text.split()).lower()
        tris = [s[i : i + 3] for i in range(len(s) - 2)]
        lps = []
        for t in tris:
            b = t.encode()
            code = (b[0] << 16) | (b[1] << 8) | b[2]
            lps.append(-np.log2((lut.get(code, 0) + 1) / (total + _V)))
        return sum(lps) / len(lps)

    target = "abc abcd xyz"
    got = lm_score(_ds([target]), model).take_all()[0]
    assert abs(got["bits_per_char"] - py_bits(target)) < 1e-9


def test_lm_score_orders_quality(ray_session):
    """In-domain text scores lower (better) than shuffled-character junk."""
    from sqlgrep_ray.stages.lmscore import lm_score, train_char_lm

    rng = np.random.default_rng(5)
    words = ["data", "pipeline", "ray", "arrow", "batch", "stream", "shuffle"]
    ref = _ds(
        [" ".join(rng.choice(words, 12)) for _ in range(50)]
    )
    model = train_char_lm(ref)
    good = " ".join(rng.choice(words, 10))
    junk = "".join(rng.choice(list("qzxjvkw#@"), 40))
    rows = {r["doc_id"]: r for r in lm_score(_ds([good, junk]), model).take_all()}
    assert rows[0]["bits_per_char"] < rows[1]["bits_per_char"]
