"""Shared rule core: span detection, typing, predicates, linking keys.

This is the sandbox stand-in for the reference's two transformer models
(SpanDetector `splitner/model.py:11-354`, SpanClassifier
`splitner/model_span.py:9-71`): torch/transformers are not installed here,
so the scorer backend is a deterministic pattern + gazetteer system that
implements the SAME span semantics — first-wins tag assignment
(`main_qa.py:112-160`), B/I adjacency decode (`dataset_span.py:156-190`),
truncation at max_tokens (`dataset_qa.py:298-307` max_seq_len analog) — see
SURVEY.md §7. Both the distributed Ray pipeline and the single-process
oracle (oracle.py) call these functions, so model semantics are identical
by construction and the tests exercise the *pipeline* (shuffles, windowing,
dedup, resume), not the model.

The production path swaps this backend for HF-transformer actors behind the
same interface (stages/detect.py registry).
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass

from .functions.decode import decode_bi_spans, first_wins_assign
from .functions.tokenize import TOKEN_RE

# ---------------------------------------------------------------------------
# Entity type system (FIXTURES.md F2: 6 types, BIO layout like data/dummy/)
# ---------------------------------------------------------------------------

ETYPES = ["person", "organization", "location", "product", "id", "tool"]

PERSON_FIRST = [
    "Alice", "Bob", "Carol", "David", "Erin", "Frank", "Grace", "Henry",
    "Irene", "Jack", "Karen", "Liam", "Mona", "Nate", "Olga", "Pete",
    "Quinn", "Rosa", "Sam", "Tina", "Ulrich", "Vera", "Walt", "Xena",
    "Yusuf", "Zoe",
]
PERSON_LAST = [
    "Johnson", "Smith", "Garcia", "Chen", "Patel", "Kim", "Novak",
    "Okafor", "Silva", "Tanaka", "Weber", "Ivanov", "Dubois", "Rossi",
    "Haddad", "Larsen", "Moreno", "Nakamura", "Osei", "Petrov",
]
ORGS = [
    "Acme Corp", "Acme Corporation", "Globex", "Initech", "Umbrella Corp",
    "Stark Industries", "Wayne Enterprises", "Cyberdyne Systems", "Tyrell Corp",
    "Wonka Industries", "Hooli", "Pied Piper", "Vandelay Industries",
    "Soylent Corp", "Massive Dynamic", "Aperture Science", "Black Mesa",
    "Oscorp", "LexCorp", "Gringotts Bank", "Duff Brewing", "Sirius Cybernetics",
    "Weyland Yutani", "Omni Consumer Products", "Virtucon", "Zorg Industries",
]
LOCATIONS = [
    "Springfield", "Gotham City", "Metropolis", "Riverdale", "Smallville",
    "Sunnydale", "Hill Valley", "Twin Peaks", "Bedrock", "Quahog",
    "South Park", "Pawnee", "Stars Hollow", "Hawkins", "Derry",
    "Castle Rock", "Emerald City", "Atlantis", "Eldorado", "Shangri La",
    "Neo Tokyo", "New Vegas", "Night City", "Rapture", "Columbia",
]
PRODUCTS = [
    "HyperDrive X1", "QuantumDB", "FluxCapacitor", "NimbusBoard",
    "WarpCore 7", "TurboEncabulator", "OmniLens", "EchoSphere",
    "NanoForge", "SkyBeam", "PulseTracker", "VoltaCell", "AeroPod",
    "CryoVault", "HoloDesk", "MechaArm", "SolarWeave", "TerraScan",
    "VortexDrive", "ZenithOS",
]
TOOLS = [
    "search", "calculator", "browser", "code_exec", "sql_query",
    "file_read", "image_gen", "translator",
]

GAZETTEER: dict[str, str] = {}
for _f in PERSON_FIRST:
    GAZETTEER[_f] = "person"
for _f in PERSON_FIRST:
    for _l in PERSON_LAST:
        GAZETTEER[f"{_f} {_l}"] = "person"
for _o in ORGS:
    GAZETTEER[_o] = "organization"
for _loc in LOCATIONS:
    GAZETTEER[_loc] = "location"
for _p in PRODUCTS:
    GAZETTEER[_p] = "product"

# Alphanumeric ID tokens (CVE-2015-8431 style) — the pattern-feature case
# the reference's char/pattern CNNs target (dataset.py:206-313, paper §2.3).
ID_RE = re.compile(r"(?:[A-Z]{2,6}-)+\d{2,7}(?:-\d{1,7})?")

MAX_TOKENS_DEFAULT = 256  # max_seq_len analog (M9 truncation contract)

# Token-scan gazetteer matcher state: leftmost-longest non-overlapping
# matching is done by trying the longest phrase first at each token position
# (set lookups are ~50x faster than a 1000-alternative regex scan — the
# detector UDF dominated pipeline wall time before this). Multi-word
# lookups are gated on a FIRST-WORD set so the common case (token starts
# no phrase) costs one slice + one membership test instead of
# GAZ_MAX_PHRASE substring builds per position.
GAZ_SURFACES = frozenset(GAZETTEER)
GAZ_MAX_PHRASE = max(len(s.split()) for s in GAZETTEER)
GAZ_FIRST_WORDS = frozenset(s.split(" ", 1)[0] for s in GAZETTEER if " " in s)
GAZ_SINGLE = frozenset(s for s in GAZETTEER if " " not in s)


@dataclass(frozen=True)
class Mention:
    start: int  # char offset, inclusive
    end: int  # char offset, exclusive
    surface: str
    etype: str
    score: float = 1.0


# ---------------------------------------------------------------------------
# Stage 1 — span detection (SpanDetector semantics, S1 + S4)
# ---------------------------------------------------------------------------

def detect_spans(text: str, max_tokens: int = MAX_TOKENS_DEFAULT) -> list[tuple[int, int]]:
    """Entity-agnostic span detection -> [(start_char, end_char), ...].

    Pipeline: regex proposals (gazetteer alternation + ID pattern) -> align
    to token boundaries -> first-wins tag grid (main_qa.py:112-160) ->
    truncate at max_tokens (M9) -> B/I adjacency decode
    (dataset_span.py:156-190) -> char spans.
    """
    token_spans = [m.span() for m in TOKEN_RE.finditer(text)]
    if not token_spans:
        return []
    n = len(token_spans)

    # leftmost-longest non-overlapping gazetteer scan over token positions:
    # at each token try the longest phrase first; on a hit, jump past it
    # (the token-aligned equivalent of a longest-first alternation regex)
    proposals: list[tuple[int, int, str]] = []
    i = 0
    while i < n:
        tok = text[token_spans[i][0] : token_spans[i][1]]
        matched = 0
        if tok in GAZ_FIRST_WORDS:
            for L in range(min(GAZ_MAX_PHRASE, n - i), 1, -1):
                cand = text[token_spans[i][0] : token_spans[i + L - 1][1]]
                if cand in GAZ_SURFACES:
                    proposals.append((i, i + L - 1, "ENTITY"))
                    matched = L
                    break
        if not matched and tok in GAZ_SINGLE:
            proposals.append((i, i, "ENTITY"))
            matched = 1
        if matched:
            i += matched
            continue
        # single-token alphanumeric ID (pattern-feature case)
        if ID_RE.fullmatch(tok):
            proposals.append((i, i, "ENTITY"))
        i += 1

    tags = first_wins_assign(n, proposals)
    # Truncation: tokens beyond max_tokens never receive model output
    # (dataset_qa.py:298-307) -> treated as O before decode.
    for i in range(max_tokens, len(tags)):
        tags[i] = "O"
    tok_spans = decode_bi_spans(tags)
    return [(token_spans[i][0], token_spans[j][1]) for i, j in tok_spans]


# ---------------------------------------------------------------------------
# Stage 2 — span classification (SpanClassifier semantics, S2 + S5)
# ---------------------------------------------------------------------------

def classify_mention(surface: str) -> str:
    """Type a detected span: "What is {mention}?" (dataset_span.py:82-87)
    answered by deterministic rules instead of a BERT head."""
    if ID_RE.fullmatch(surface):
        return "id"
    et = GAZETTEER.get(surface)
    if et is not None:
        return et
    # shape fallback (mirrors word-type features M2 feeding the classifier)
    toks = surface.split()
    if all(t[:1].isupper() and t[1:].islower() for t in toks if t):
        return "person" if len(toks) <= 2 else "organization"
    return "product"


def detect_typed_mentions(text: str, max_tokens: int = MAX_TOKENS_DEFAULT) -> list[Mention]:
    """Fused stage-1 -> stage-2: typed mentions for one turn."""
    out = []
    for s, e in detect_spans(text, max_tokens):
        surface = text[s:e]
        out.append(Mention(s, e, surface, classify_mention(surface)))
    return out


# ---------------------------------------------------------------------------
# Predicate extraction (pattern-based, S9 analog)
# ---------------------------------------------------------------------------

PRED_PATTERNS: dict[str, str] = {
    "works at": "works_at", "works for": "works_at", "worked at": "works_at",
    "is employed by": "works_at", "joined": "member_of", "is part of": "member_of",
    "is based in": "based_in", "based in": "based_in", "lives in": "based_in",
    "located in": "based_in", "moved to": "based_in",
    "uses": "uses", "used": "uses", "is using": "uses", "runs": "uses",
    "ran": "uses", "deployed": "uses", "installed": "uses",
    "met": "met", "met with": "met", "spoke with": "met",
    "acquired": "acquired", "bought": "acquired",
    "reported": "reported", "filed": "reported",
    "fixed": "fixed", "resolved": "fixed", "patched": "fixed",
    "visited": "visited", "traveled to": "visited",
    "shipped": "shipped", "released": "shipped", "launched": "shipped",
}
_MAX_GAP_TOKENS = 4
PRONOUNS = {"He", "She", "They"}
LOOKBACK_TURNS = 3  # pronoun-coref window; bounds the reassembly carry


def _between_pred(text: str, left_end: int, right_start: int) -> str | None:
    gap = text[left_end:right_start]
    toks = gap.split()
    if not 1 <= len(toks) <= _MAX_GAP_TOKENS:
        return None
    return PRED_PATTERNS.get(" ".join(toks).lower())


def extract_turn_triples(
    text: str,
    tool: str,
    mentions: list[Mention],
    prev_person: str | None,
) -> list[tuple[str, str, str, str, str, str]]:
    """Raw triples for one turn given its typed mentions.

    Returns [(subj_surface, subj_etype, pred, obj_surface, obj_etype), ...]
    as 6-tuples (..., provenance handled by caller). Rules:

    - consecutive mention pairs whose between-text matches PRED_PATTERNS;
    - pronoun coreference: a turn starting with He/She/They followed by a
      pattern and the turn's first mention resolves the subject to the most
      recent *person* mention within LOOKBACK_TURNS previous turns (the
      structural analog of the reference's next-sentence context retriever,
      utils/next_sent_prediction.py:15-60 — see SURVEY.md S8);
    - tool provenance: a turn with a non-empty ``tool`` links each of its
      mentions to the tool node via ``extracted_via``.
    """
    triples = []
    ms = sorted(mentions, key=lambda m: m.start)
    for a, b in zip(ms, ms[1:]):
        pred = _between_pred(text, a.end, b.start)
        if pred is not None:
            triples.append((a.surface, a.etype, pred, b.surface, b.etype))
    # pronoun rule: "He works at Globex ."
    first_tok = text.split(maxsplit=1)
    if ms and prev_person is not None and first_tok and first_tok[0] in PRONOUNS:
        m0 = ms[0]
        pron_end = len(first_tok[0])
        pred = _between_pred(text, pron_end, m0.start)
        if pred is not None:
            triples.append((prev_person, "person", pred, m0.surface, m0.etype))
    if tool:
        for m in ms:
            triples.append((m.surface, m.etype, "extracted_via", tool, "tool"))
    return triples


def precompute_turn_preds(
    text: str, mentions: list[Mention]
) -> tuple[list[str | None], str | None]:
    """Per-turn predicate precomputation: (pair_preds, pron_pred).

    ``pair_preds[i]`` is the predicate matched by the gap text between
    sorted mentions i and i+1 (or None); ``pron_pred`` is the predicate
    between a leading pronoun and the first mention (or None). Both are
    pure functions of one turn, so the pipeline computes them in the
    parallel map stage and the reassembly shuffle never carries the turn
    text — only these small columns (extract_turn_triples recomputes the
    same values from text; equality is tested)."""
    ms = sorted(mentions, key=lambda m: m.start)
    pair_preds = [_between_pred(text, a.end, b.start) for a, b in zip(ms, ms[1:])]
    pron_pred = None
    first_tok = text.split(maxsplit=1)
    if ms and first_tok and first_tok[0] in PRONOUNS:
        pron_pred = _between_pred(text, len(first_tok[0]), ms[0].start)
    return pair_preds, pron_pred


def triples_from_precomputed(
    mentions_sorted: list[Mention],
    pair_preds: list[str | None],
    pron_pred: str | None,
    tool: str,
    prev_person: str | None,
) -> list[tuple[str, str, str, str, str]]:
    """extract_turn_triples, fed from precompute_turn_preds outputs instead
    of the raw text — identical results by construction (the gap matching
    already happened in the parallel stage)."""
    triples = []
    ms = mentions_sorted
    for (a, b), pred in zip(zip(ms, ms[1:]), pair_preds):
        if pred is not None:
            triples.append((a.surface, a.etype, pred, b.surface, b.etype))
    if ms and prev_person is not None and pron_pred is not None:
        m0 = ms[0]
        triples.append((prev_person, "person", pron_pred, m0.surface, m0.etype))
    if tool:
        for m in ms:
            triples.append((m.surface, m.etype, "extracted_via", tool, "tool"))
    return triples


def last_person(mentions: list[Mention]) -> str | None:
    p = [m for m in sorted(mentions, key=lambda m: m.start) if m.etype == "person"]
    return p[-1].surface if p else None


# S8 context retrieval modes: "recency" picks the most recent person
# antecedent within LOOKBACK_TURNS (the structural analog of the
# reference's previous-sentence context); "scored" re-ranks the SAME
# candidate set by embedding similarity between the candidate surface and
# the current turn text — the sandbox stand-in for the reference's
# NSP-model-scored best-context selection
# (utils/next_sent_prediction.py:15-60: score every candidate sentence
# with a next-sentence-prediction head, argmax, known-text excluded).
# Both the distributed pipeline and the oracle call select_antecedent, so
# the channel cannot diverge between them.
CONTEXT_MODES = ("recency", "scored")


def context_query_embedding(text: str):
    """Query-side embedding for scored context retrieval (computed in the
    parallel map stage; only ~64 floats ride the reassembly shuffle, and
    only for pronoun-initial turns)."""
    from .stages.embed import embed_surface  # lazy: avoids import cycle

    return embed_surface(text)


def select_antecedent(
    recent: list[tuple[int, str]],
    turn_idx: int,
    mode: str = "recency",
    q_emb=None,
) -> str | None:
    """Pick the pronoun antecedent from the per-turn (turn_idx, last person
    surface) history. Candidates = entries within LOOKBACK_TURNS.
    recency: nearest turn. scored: argmax cosine(embed(candidate), q_emb),
    ties resolved toward the more recent candidate; falls back to recency
    when no query embedding is available (e.g. empty turn text)."""
    cands = [(ti, s) for ti, s in recent if turn_idx - ti <= LOOKBACK_TURNS]
    if not cands:
        return None
    if mode != "scored" or q_emb is None:
        return cands[-1][1]
    from .stages.embed import embed_surface  # lazy: avoids import cycle

    import numpy as np

    q = np.asarray(q_emb, dtype=np.float32)
    best_surf, best = cands[-1][1], -np.inf
    for _ti, s in cands:  # oldest -> newest; >= lets recency break ties
        sc = float(embed_surface(s) @ q)
        if sc >= best:
            best, best_surf = sc, s
    return best_surf


# ---------------------------------------------------------------------------
# Linking / canonicalization keys (S6/S7/D6 analogs)
# ---------------------------------------------------------------------------

_NORM_RE = re.compile(r"[^a-z0-9]+")


def normalize_surface(surface: str) -> str:
    """Case/punct-insensitive linking key."""
    return " ".join(_NORM_RE.sub(" ", surface.lower()).split())


def normalize_series(s):
    """Vectorized normalize_surface over a pandas Series (same semantics:
    lower, non-alnum runs -> single space, strip)."""
    return s.str.lower().str.replace(_NORM_RE, " ", regex=True).str.split().str.join(" ")


def char_ngrams(s: str, n: int = 3) -> set[str]:
    """Character n-gram shingles — the sandbox stand-in for the reference's
    BERT mention embeddings (utils/mention_clustering.py:23-41)."""
    padded = f" {s} "
    if len(padded) <= n:
        return {padded}
    return {padded[i : i + n] for i in range(len(padded) - n + 1)}


def containment_sim(a: set[str], b: set[str]) -> float:
    """|A∩B| / min(|A|,|B|) — links abbreviations to full forms
    ('acme corp' ⊂ 'acme corporation'), replacing the reference's
    nearest-medoid reassignment (utils/mention_clustering.py:56-58)."""
    if not a or not b:
        return 0.0
    return len(a & b) / min(len(a), len(b))


LINK_SIM_THRESHOLD = 0.8

# Second linking channel: cosine over the S6 hashed-n-gram embedding
# vectors (stages/embed.embed_surface — the sandbox stand-in for the
# reference's BERT mention embeddings, utils/mention_clustering.py:23-41).
# Containment (o/min(|a|,|b|)) catches abbreviation ⊂ full-form; cosine
# (≈ o/sqrt(|a||b|), always <= containment on these vectors) scores
# comparable-length variants symmetrically, so its threshold sits BELOW
# the containment threshold: it links equal-size typo variants (e.g.
# 'springfield'~'sprincfield', containment 0.73) that containment@0.8
# misses, without inheriting containment's subset-leniency. Both the
# oracle and the distributed linker run this through the shared
# cluster_block, so parity is structural.
EMB_SIM_THRESHOLD = 0.72

# Exact-identifier types never fuzzy-link: an alphanumeric ID or a tool name
# is its own canonical form (CVE-2015-8431 != CVE-2015-8432 at any string
# similarity). This also removes the one quadratic hot block (all IDs share
# a prefix) — profiled: the id block dominated canon-map build time.
LINKABLE_ETYPES = {"person", "organization", "location", "product"}


def block_key(norm: str, etype: str) -> str:
    """Linking blocking key: co-partitions candidate matches. Two surfaces
    can only link if they share etype + the first 2 chars of the normalized
    first word — documented partitioning assumption of the linker. Every
    similarity edge therefore lives inside exactly one block, so connected
    components never cross blocks (see stages/linking.py)."""
    first = norm.split(" ", 1)[0] if norm else ""
    return f"{etype}|{first[:2]}"


def cluster_block(
    members: list[tuple[str, str]],
    threshold: float | None = None,
    emb_threshold: float | None = None,
) -> dict[tuple[str, str], str]:
    """Canonicalize ONE block of distinct (etype, norm) keys -> canonical
    norm per key: blocking + TWO similarity channels (n-gram containment
    OR embedding cosine) + union-find with min-root — the north star's
    "blocking + embedding-similarity entity linking".

    THE shared implementation: both the single-process oracle and the
    distributed per-block map_groups call this, so linking semantics cannot
    diverge. Non-LINKABLE_ETYPES keys are their own canonical form.
    """
    from .stages.embed import embed_surface  # lazy: avoids import cycle

    threshold = LINK_SIM_THRESHOLD if threshold is None else threshold
    emb_threshold = EMB_SIM_THRESHOLD if emb_threshold is None else emb_threshold
    members = sorted(set(members))
    parent = {k: k for k in members}

    def find(k):
        while parent[k] != k:
            parent[k] = parent[parent[k]]
            k = parent[k]
        return k

    linkable = [k for k in members if k[0] in LINKABLE_ETYPES]
    grams = {k: char_ngrams(k[1]) for k in linkable}
    embs = {k: embed_surface(k[1]) for k in linkable}
    for i in range(len(linkable)):
        for j in range(i + 1, len(linkable)):
            a, b = linkable[i], linkable[j]
            if a[0] != b[0]:
                continue
            hit = containment_sim(grams[a], grams[b]) >= threshold
            if not hit:
                hit = float(embs[a] @ embs[b]) >= emb_threshold
            if hit:
                ra, rb = find(a), find(b)
                if ra != rb:
                    lo, hi = (ra, rb) if ra <= rb else (rb, ra)
                    parent[hi] = lo
    return {k: find(k)[1] for k in members}


def entity_id(etype: str, canonical_norm: str) -> str:
    h = hashlib.sha1(f"{etype}|{canonical_norm}".encode()).hexdigest()[:16]
    return f"e_{h}"
