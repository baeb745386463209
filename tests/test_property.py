"""Hypothesis property tests: every vectorized batch kernel is
exact-equivalent to its per-row reference implementation.

These pin the equivalences the performance work relies on (LUT language
matcher, dictionary-encoded SimHash/MinHash, global-buffer winnowing,
shared gram kernel) against arbitrary unicode/whitespace inputs — not
just the fixture corpus."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from hypothesis import given, settings
from hypothesis import strategies as st

# words + assorted whitespace + unicode letters + punctuation
_token = st.text(
    alphabet=st.characters(
        whitelist_categories=("Ll", "Lu", "Nd", "Po"), max_codepoint=0x2FF
    ),
    min_size=1,
    max_size=8,
)
_ws = st.sampled_from([" ", "  ", "\t", "\n", " \t ", " "])
_doc = st.lists(
    st.one_of(_token, _ws), min_size=0, max_size=30
).map("".join)
_docs = st.lists(_doc, min_size=1, max_size=12)


def _arr(texts):
    return pc.fill_null(pa.array(texts, pa.string()), "")


@settings(max_examples=60, deadline=None)
@given(_docs, st.integers(min_value=1, max_value=5))
def test_doc_grams_matches_python(texts, k):
    from sqlgrep_ray.stages.decontam import _doc_grams

    grams, rows, ntok = _doc_grams(_arr([t.lower() for t in texts]), k)
    got = sorted(zip(rows.tolist(), grams.to_pylist()))
    ref = []
    for i, t in enumerate(texts):
        toks = t.lower().split()
        if not toks:
            continue
        if len(toks) < k:
            ref.append((i, " ".join(toks)))
        else:
            ref.extend(
                (i, " ".join(toks[j : j + k])) for j in range(len(toks) - k + 1)
            )
    assert got == sorted(ref)
    assert ntok.tolist() == [len(t.lower().split()) for t in texts]


@settings(max_examples=40, deadline=None)
@given(_docs)
def test_simhash_batch_matches_per_row(texts):
    from sqlgrep_ray.stages.dedup import SimHasher

    t = pa.table({"text": pa.array(texts, pa.string())})
    out = SimHasher(with_msfp=True)(t)
    for i, txt in enumerate(texts):
        assert out["simhash"][i].as_py() == SimHasher.simhash64(txt)
        assert out["msfp"][i].as_py() == SimHasher.multiset_fp(txt)


@settings(max_examples=30, deadline=None)
@given(_docs)
def test_minhash_batch_matches_per_row(texts):
    from sqlgrep_ray.stages.dedup import MinHasher

    mh = MinHasher(n_perm=16)
    t = pa.table({"text": pa.array(texts, pa.string())})
    got = mh(t)["minhash"]
    for i, txt in enumerate(texts):
        want = mh.signature(txt)
        assert np.array_equal(
            np.array(got[i].as_py(), dtype=np.uint64), want
        ), txt


@settings(max_examples=30, deadline=None)
@given(_docs, st.integers(min_value=2, max_value=8), st.integers(min_value=2, max_value=6))
def test_winnow_batch_matches_per_row(texts, k, w):
    from sqlgrep_ray.stages.winnow import _winnow_batch, winnow_doc

    rows, fps = _winnow_batch(_arr(texts), k, w)
    got = {}
    for r, f in zip(rows, fps):
        got.setdefault(int(r), set()).add(int(f))
    for i, txt in enumerate(texts):
        assert got.get(i, set()) == set(int(v) for v in winnow_doc(txt, k, w)), (
            i,
            txt,
        )


@settings(max_examples=40, deadline=None)
@given(_docs)
def test_language_batch_matches_per_row(texts):
    from sqlgrep_ray.stages.textstats import detect_language, detect_language_batch

    got = detect_language_batch(_arr(texts)).to_pylist()
    assert got == [detect_language(t) for t in texts]


@settings(max_examples=40, deadline=None)
@given(_docs)
def test_textstats_token_count_matches_split(texts):
    from sqlgrep_ray.stages.textstats import TextStats

    t = pa.table({"text": pa.array(texts, pa.string())})
    out = TextStats(
        tokens=True, quality=False, language=False, fingerprint=False
    )(t)
    assert out["n_tokens_ws"].to_pylist() == [len(x.split()) for x in texts]


# ---------------------------------------------------------------------------
# parse stage: RE2 batch path vs python re path
# ---------------------------------------------------------------------------

_atom = st.sampled_from([r"(\d+)", r"([a-z]+)", r"(\w+)"])
_sep = st.sampled_from([" ", "=", ":", "x", ", "])
_pattern = st.tuples(_sep, _atom, _sep, _atom).map(
    lambda t: t[0] + t[1] + t[2] + t[3]
)
_line = st.text(alphabet="abz019 =:x,", min_size=0, max_size=24)


@settings(max_examples=80, deadline=None)
@given(_pattern, st.lists(_line, min_size=1, max_size=10))
def test_parse_re2_path_matches_python_path(pattern, lines):
    """The Arrow RE2 extract path and the python `re` fallback agree on
    groups and match masks (for patterns whose groups can't match '' —
    the documented ''-to-NULL normalization boundary)."""
    from sqlgrep_ray.schema import PatternDef
    from sqlgrep_ray.stages.parse import _CompiledPattern

    cp = _CompiledPattern(PatternDef("p", pattern))
    if cp.named_pattern is None:
        return  # RE2-incompatible: only one path exists
    text = pa.array(lines, pa.string())
    g_re2, m_re2 = cp.extract(text)
    g_py, m_py = cp._extract_python(text)
    assert m_re2.to_pylist() == m_py.to_pylist(), pattern
    for g in range(1, cp.n_groups + 1):
        assert g_re2[g].to_pylist() == g_py[g].to_pylist(), (pattern, g)


@settings(max_examples=60, deadline=None)
@given(_docs)
def test_fingerprint_batch_matches_scalar(texts):
    """fingerprint64_batch over a multi-row array == the scalar reference
    per row (pins the offsets/buffer-slicing logic of the vectorized
    normalize-then-hash path), and both match the classic Python
    `" ".join(t.split()).lower()` blake2b on this ASCII-ish alphabet."""
    import hashlib

    from sqlgrep_ray.stages.textstats import fingerprint64, fingerprint64_batch

    batch = fingerprint64_batch(_arr(texts)).to_pylist()
    assert batch == [fingerprint64(t) for t in texts]

    def python_ref(t):
        norm = " ".join(t.split()).lower().encode()
        return int.from_bytes(
            hashlib.blake2b(norm, digest_size=8).digest(), "little", signed=True
        )

    from sqlgrep_ray.stages.textnorm import arrow_lower

    for t, fp in zip(texts, batch):
        # utf8proc's SIMPLE case mapping diverges from python's full
        # mapping on a few codepoints (e.g. 'İ' → 'i' vs 'i̇') — the
        # fingerprint is an opaque key, so only cross-check rows where the
        # two lowercase semantics agree
        if t.lower() == arrow_lower(t):
            assert fp == python_ref(t)


@settings(max_examples=40, deadline=None)
@given(_docs)
def test_fingerprint_batch_sliced_and_chunked(texts):
    """Zero-copy slices and multi-chunk inputs hash identically — the
    buffer-offset arithmetic must respect array offsets."""
    from sqlgrep_ray.stages.textstats import fingerprint64_batch

    arr = _arr(texts)
    whole = fingerprint64_batch(arr).to_pylist()
    if len(arr) > 1:
        lo = fingerprint64_batch(arr.slice(1)).to_pylist()
        assert lo == whole[1:]
    chunked = pa.chunked_array([arr, arr])
    assert fingerprint64_batch(chunked).to_pylist() == whole + whole
