"""Property-based tests (hypothesis) for the pure rule/decode kernels and
seeded randomized equivalence checks for the distributed operators."""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

# ---------------------------------------------------------------------------
# decode kernels
# ---------------------------------------------------------------------------

_tag = st.sampled_from(["O", "B-person", "I-person", "B-org", "I-org"])


@given(st.lists(_tag, max_size=40))
@settings(max_examples=200, deadline=None)
def test_decode_bi_spans_wellformed(tags):
    from split_ner_ray.functions.decode import decode_bi_spans

    spans = decode_bi_spans(tags)
    prev_end = -1
    for s, e in spans:
        assert 0 <= s <= e < len(tags)
        assert s > prev_end  # ordered, non-overlapping
        assert tags[s].startswith("B-")
        for i in range(s + 1, e + 1):
            assert tags[i].startswith("I-")
        prev_end = e


@given(
    st.integers(min_value=0, max_value=30),
    st.lists(
        st.tuples(st.integers(0, 29), st.integers(0, 29), st.sampled_from(["person", "org"])),
        max_size=8,
    ),
)
@settings(max_examples=200, deadline=None)
def test_first_wins_never_overwrites(n, raw_props):
    from split_ner_ray.functions.decode import PAD_TAG, first_wins_assign

    props = [(min(a, b), max(a, b), e) for a, b, e in raw_props]
    tags = first_wins_assign(n, props)
    assert len(tags) == n
    # replay: once a token is non-O it never changes entity
    state = [None] * n
    for s, e, ent in props:
        for i in range(max(s, 0), min(e, n - 1) + 1):
            if state[i] is None:
                state[i] = ent
    for i, t in enumerate(tags):
        assert t != PAD_TAG
        if t == "O":
            assert state[i] is None
        else:
            assert t[2:] == state[i]


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["person", "org"]),
            st.lists(st.lists(st.sampled_from(["B", "I", "E", "S", "O"]), min_size=1, max_size=1), min_size=0, max_size=6),
        ),
        max_size=4,
    )
)
@settings(max_examples=150, deadline=None)
def test_mapping2_equals_mapping1_on_atomic_tokens(contexts):
    """With exactly one sub-token per token, consistency voting cannot
    fire: mapping2 == the first-wins grid replay."""
    from split_ner_ray.functions.decode import consistency_vote_assign

    n = max((len(tp) for _e, tp in contexts), default=0)
    got = consistency_vote_assign(n, contexts)
    # replay mapping1 semantics on the same head predictions
    state = [None] * n
    for ent, tok_preds in contexts:
        for i, subs in enumerate(tok_preds[:n]):
            if state[i] is not None and state[i][2:] != ent and state[i] != "O":
                continue
            head = subs[0]
            assign = ("B-" + ent if head in ("B", "S")
                      else "I-" + ent if head in ("I", "E") else "O")
            if state[i] is None or state[i] == "O":
                if state[i] is None:
                    state[i] = assign
                elif assign != "O":
                    state[i] = assign
    want = [s if s is not None else "O" for s in state]
    assert got == want


# ---------------------------------------------------------------------------
# linking kernels
# ---------------------------------------------------------------------------

_surface = st.text(
    alphabet=st.sampled_from("abcXYZ 019-_.,"), min_size=0, max_size=20
)


@given(st.lists(_surface, min_size=1, max_size=30))
@settings(max_examples=100, deadline=None)
def test_normalize_series_matches_scalar(surfs):
    from split_ner_ray.rules import normalize_series, normalize_surface

    got = normalize_series(pd.Series(surfs, dtype="object")).tolist()
    assert got == [normalize_surface(s) for s in surfs]


@given(_surface, _surface)
@settings(max_examples=150, deadline=None)
def test_containment_bounds(a, b):
    from split_ner_ray.rules import char_ngrams, containment_sim

    ga, gb = char_ngrams(a.lower()), char_ngrams(b.lower())
    c = containment_sim(ga, gb)
    assert 0.0 <= c <= 1.0
    assert containment_sim(ga, ga) == (1.0 if ga else 0.0)


def test_cosine_dominated_by_containment_on_real_surfaces():
    """Embedding cosine tracks containment up to sign-hash noise — the
    documented reason EMB_SIM_THRESHOLD sits below the containment
    threshold. The relationship is STATISTICAL, not universal (hypothesis
    found adversarial 3-n-gram pairs whose collision cosine reaches
    1/sqrt(3) at containment 0), so this asserts the noise DISTRIBUTION
    over a fixed-seed sample instead of a per-pair bound."""
    import random

    from split_ner_ray.rules import char_ngrams, containment_sim
    from split_ner_ray.stages.embed import embed_surface

    rng = random.Random(7)
    alphabet = "abcdefgh "
    gaps = []
    for _ in range(300):
        a = "".join(rng.choice(alphabet) for _ in range(rng.randint(6, 20)))
        b = "".join(rng.choice(alphabet) for _ in range(rng.randint(6, 20)))
        ga, gb = char_ngrams(a.lower()), char_ngrams(b.lower())
        if min(len(ga), len(gb)) < 4:
            continue
        c = containment_sim(ga, gb)
        cos = float(embed_surface(a) @ embed_surface(b))
        gaps.append(cos - c)
    gaps.sort()
    assert len(gaps) > 200
    # 95th percentile of the sign-hash noise stays inside the margin the
    # linker's threshold ordering relies on
    assert gaps[int(0.95 * len(gaps))] <= 0.5
    assert max(gaps) <= 0.9


@given(st.lists(st.tuples(st.sampled_from(["person", "org", "id"]), _surface), max_size=12))
@settings(max_examples=100, deadline=None)
def test_cluster_block_is_idempotent_partition(members):
    """cluster_block output is a valid partition: every key maps to a norm
    of some member of its own etype, non-linkable keys map to themselves,
    and the map is stable under re-clustering the canonical forms."""
    from split_ner_ray.rules import LINKABLE_ETYPES, cluster_block

    canon = cluster_block(members)
    by_et = {}
    for et, norm in canon:
        by_et.setdefault(et, set()).add(norm)
    for (et, norm), cn in canon.items():
        if et not in LINKABLE_ETYPES:
            assert cn == norm
        else:
            assert cn in by_et[et]
            assert cn <= norm  # min-root: canonical is lexicographically <=


# ---------------------------------------------------------------------------
# dedup kernels
# ---------------------------------------------------------------------------

@given(st.text(alphabet=st.sampled_from("ab c"), max_size=60))
@settings(max_examples=100, deadline=None)
def test_minhash_signature_deterministic_and_shaped(text):
    from split_ner_ray.stages.dedup import MinHasher

    mh = MinHasher(num_perm=16)
    s1, s2 = mh.signature(text), MinHasher(num_perm=16).signature(text)
    assert s1.shape == (16,) and (s1 == s2).all()


@given(st.text(alphabet=st.sampled_from("abc XYZ"), max_size=60))
@settings(max_examples=100, deadline=None)
def test_simhash_deterministic_64bit(text):
    from split_ner_ray.stages.dedup import simhash64

    v = simhash64(text)
    assert 0 <= v < (1 << 64)
    assert v == simhash64(text)


# ---------------------------------------------------------------------------
# distributed operators vs pandas (seeded randomized, one Ray session)
# ---------------------------------------------------------------------------

def test_hash_aggregate_matches_pandas_random(ray_session):
    import ray.data as rd

    from split_ner_ray.stages.relational import hash_aggregate

    rng = random.Random(7)
    df = pd.DataFrame(
        {
            "k": [rng.choice("abcdefgh") for _ in range(5000)],
            "k2": [rng.randint(0, 5) for _ in range(5000)],
            "v": [rng.random() for _ in range(5000)],
        }
    )

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["k", "k2"], as_index=False)["v"].sum()

    got = (
        hash_aggregate(rd.from_pandas(df).repartition(7), ["k", "k2"], agg)
        .to_pandas()
        .sort_values(["k", "k2"])
        .reset_index(drop=True)
    )
    want = agg(df).sort_values(["k", "k2"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_exact=False)


def test_topk_matches_pandas_random_with_ties(ray_session):
    import ray.data as rd

    from split_ner_ray.stages.relational import topk

    rng = random.Random(11)
    # heavy ties: values drawn from a tiny domain
    df = pd.DataFrame(
        {"x": [rng.randint(0, 3) for _ in range(2000)], "id": range(2000)}
    )
    got = topk(rd.from_pandas(df).repartition(9), [("x", True), ("id", False)], 25).to_pandas()
    want = df.sort_values(["x", "id"], ascending=[False, True]).head(25).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)


# ---------------------------------------------------------------------------
# round-4 kernels: SimHash batch, window hashes, packing arithmetic
# ---------------------------------------------------------------------------

_word = st.text(alphabet="abcdefg", min_size=1, max_size=4)
_doc = st.lists(_word, max_size=12).map(" ".join)


@given(st.lists(_doc, max_size=15))
@settings(max_examples=60, deadline=None)
def test_simhash_batch_matches_naive(texts):
    """The vectorized batch kernel equals the naive per-doc majority vote
    over the SAME token hashes, for any batch composition."""
    from split_ner_ray.stages.dedup import _hash_strings, simhash_batch

    got = simhash_batch(texts)
    for t, g in zip(texts, got):
        toks = t.split()
        if not toks:
            assert int(g) == 0
            continue
        th = _hash_strings(toks)
        acc = np.zeros(64, dtype=np.int64)
        for h in th:
            bits = (np.uint64(h) >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            acc += np.where(bits.astype(bool), 1, -1)
        want = 0
        for i in range(64):
            if acc[i] > 0:
                want |= 1 << i
        assert int(g) == want


@given(st.lists(_doc, max_size=12), st.integers(min_value=1, max_value=4))
@settings(max_examples=60, deadline=None)
def test_window_hashes_counts_and_segmentation(texts, ngram):
    """Window counts are max(0, T-n+1) per doc, win_doc segments line up,
    and window hashes equal the naive per-doc polynomial mix."""
    from split_ner_ray.stages.dedup import _hash_strings
    from split_ner_ray.stages.text import _window_hashes

    mix, win_doc, n_win = _window_hashes(texts, ngram)
    a = np.uint64(0x9E3779B97F4A7C15)
    assert len(mix) == len(win_doc) == int(n_win.sum())
    pos = 0
    for d, t in enumerate(texts):
        toks = t.split()
        expect = max(0, len(toks) - ngram + 1)
        assert n_win[d] == expect
        th = _hash_strings(toks) if toks else np.empty(0, np.uint64)
        for w in range(expect):
            m = th[w] * a
            for j in range(1, ngram):
                m = (m + th[w + j]) * a
            assert mix[pos] == m and win_doc[pos] == d
            pos += 1


@given(st.lists(st.integers(min_value=0, max_value=9), min_size=1, max_size=20),
       st.integers(min_value=1, max_value=7))
@settings(max_examples=60, deadline=None)
def test_pack_arithmetic_covers_stream(counts, seq_len):
    """Doc spans tile the token stream exactly; packs are contiguous."""
    starts = np.cumsum([0] + counts[:-1])
    ends = starts + np.array(counts)
    last = np.maximum(ends - 1, starts)
    pf, pl = starts // seq_len, last // seq_len
    assert (pf <= pl).all()
    # consecutive docs abut exactly
    assert (ends[:-1] == starts[1:]).all()
    # every pack index within a doc's [pack_first, pack_last] is covered
    for s, e, a, b in zip(starts, ends, pf, pl):
        if e > s:
            assert a == s // seq_len and b == (e - 1) // seq_len
