"""Numpy Viterbi decode — the reference's CRF decode semantics
(`/root/reference/splitner/model_crf.py:151-155`, which calls
``torchcrf.CRF.decode``) without torch: max-sum dynamic programming over
(start_transitions, transitions, end_transitions, emissions), backpointer
recovery, first-index tie-break (argmax), exactly the torchcrf Viterbi
contract for a single unmasked sequence.

The engine exposes this as the third ``decode_mode`` ("crf",
config.py): where mapping1/mapping2 decode each token's class
independently (first-wins / consistency-vote over sub-token proposals), the
CRF decode picks the globally best TAG PATH under a transition matrix, so
structurally invalid sequences (I- without a B-, B-x followed by I-y) can
never be emitted. ``bioe_transition_matrix`` builds the standard
BIOE-constrained matrix the reference's trained CRF converges to.
"""

from __future__ import annotations

import numpy as np

NEG_INF = -1e9


def viterbi_decode(emissions: np.ndarray, transitions: np.ndarray,
                   start_transitions: np.ndarray | None = None,
                   end_transitions: np.ndarray | None = None) -> list[int]:
    """Best tag path for ONE sequence.

    emissions: (T, K) per-token tag scores; transitions: (K, K) score of
    tag i -> tag j; start/end_transitions: (K,) boundary scores (zeros if
    omitted). Returns the argmax path as a list of T tag indices —
    identical to torchcrf.CRF.decode's Viterbi (model_crf.py:151-155) on
    an all-ones mask.
    """
    em = np.asarray(emissions, dtype=np.float64)
    T, K = em.shape
    if T == 0:
        return []
    tr = np.asarray(transitions, dtype=np.float64)
    st = np.zeros(K) if start_transitions is None else np.asarray(start_transitions, dtype=np.float64)
    en = np.zeros(K) if end_transitions is None else np.asarray(end_transitions, dtype=np.float64)

    score = st + em[0]
    history = np.empty((T - 1, K), dtype=np.int64)
    for t in range(1, T):
        # broadcast: prev tag i (rows) -> next tag j (cols)
        cand = score[:, None] + tr + em[t][None, :]
        history[t - 1] = np.argmax(cand, axis=0)
        score = cand[history[t - 1], np.arange(K)]
    score = score + en
    best = int(np.argmax(score))
    path = [best]
    for t in range(T - 2, -1, -1):
        best = int(history[t, best])
        path.append(best)
    path.reverse()
    return path


def bioe_transition_matrix(tag_names: list[str]) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(transitions, start, end) with NEG_INF on structurally invalid BIOE
    moves, 0 elsewhere — the hard-constraint matrix for a tag vocabulary of
    'O' / 'B-x' / 'I-x' / 'E-x' strings:

    - O    -> O or B-* (never into a span interior);
    - B-x  -> I-x / E-x (continue its own span) or O / B-* (a lone B- is a
      complete single-token span, matching decode_bi_spans' acceptance of
      a bare B-);
    - I-x  -> I-x / E-x only (an open span must close);
    - E-x  -> O or B-*;
    - start: O or B-*; end: anything except I-* (open span at the end).
    """
    K = len(tag_names)
    tr = np.zeros((K, K))
    st = np.zeros(K)
    en = np.zeros(K)

    def kind(t: str) -> tuple[str, str]:
        return (t[:1], t[2:]) if t != "O" else ("O", "")

    for i, a in enumerate(tag_names):
        ka, ea = kind(a)
        if ka == "I":
            en[i] = NEG_INF
        if ka in ("I", "E"):
            st[i] = NEG_INF
        for j, b in enumerate(tag_names):
            kb, eb = kind(b)
            ok = False
            if kb in ("O", "B"):
                ok = ka in ("O", "B", "E")
            elif kb in ("I", "E"):
                ok = ka in ("B", "I") and ea == eb
            if not ok:
                tr[i, j] = NEG_INF
    return tr, st, en


def crf_decode_tags(emissions: np.ndarray, tag_names: list[str]) -> list[str]:
    """Per-token tag strings for one sequence via the BIOE-constrained
    Viterbi — the config-selectable ``decode_mode='crf'`` entry point."""
    tr, st, en = bioe_transition_matrix(tag_names)
    return [tag_names[i] for i in viterbi_decode(emissions, tr, st, en)]
