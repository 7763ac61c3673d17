"""Extraction stages: span detection, span classification, windowed
predicate extraction (reference ops S1-S5, S8-S9 — SURVEY.md §2.3).

Architecture (SURVEY.md §7 stage graph): the reference's two models hand off
through TSV files copied by hand (README.md "SplitNER Pipeline"); here the
hand-off is pipeline fusion — the detector adds a ``spans`` column, the
classifier types those spans into a ``mentions`` list<struct> column, and
predicate extraction consumes whole (conv_id, window) groups. No
materialization between stages; blocks stream with backpressure.

Stateful setup (compiled alternation regex over the gazetteer = the sandbox
"model weights") happens once per actor in ``__init__`` — the Ray analog of
loading BERT weights per worker (main_qa.py:41-45).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import rules
from ..schemas import MENTIONS

MENTION_STRUCT = pa.struct(
    [
        ("start", pa.int32()),
        ("end", pa.int32()),
        ("surface", pa.string()),
        ("etype", pa.string()),
        ("score", pa.float32()),
    ]
)

WINDOW_TURNS = 64  # turns per predicate-extraction window (hot-conv salt)
_CARRY = rules.LOOKBACK_TURNS


class SpanDetector:
    """Actor-pool stage 1: entity-agnostic span detection (S1 + S4).

    Sandbox backend for the reference's QA span-detection model
    (model.py:11-354) behind the same batch interface: text column in,
    ``spans`` list<struct<start,end>> column out. A production HF backend
    drops in here by overriding ``_detect_batch`` (registry in SURVEY §2.10).
    """

    def __init__(self, max_tokens: int = rules.MAX_TOKENS_DEFAULT):
        self.max_tokens = max_tokens
        # touch the module-level compiled patterns so the regex "weights"
        # are built in this worker before the first batch
        rules.detect_spans("warmup Acme Corp", max_tokens)

    def _detect_batch(self, texts: list, mask: np.ndarray) -> list[list[tuple[int, int]]]:
        out: list[list[tuple[int, int]]] = []
        for i, t in enumerate(texts):
            out.append(rules.detect_spans(t, self.max_tokens) if mask[i] else [])
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        # vectorized prefilter: every gazetteer/ID proposal contains an
        # uppercase char — skip the per-row regex walk for the rest
        mask = pc.match_substring_regex(batch.column("text"), "[A-Z]").to_numpy(
            zero_copy_only=False
        )
        spans = self._detect_batch(texts, mask)
        col = pa.array(
            [[{"start": s, "end": e} for s, e in row] for row in spans],
            type=pa.list_(pa.struct([("start", pa.int32()), ("end", pa.int32())])),
        )
        return batch.append_column("spans", col)


class SpanClassifier:
    """Actor-pool stage 2: mention typing (S2 + S5).

    The reference fans out one model input per mention ("What is {m}?",
    dataset_span.py:82-136) and scatters predictions back per sentence
    (main_span.py:98-119); fused here: one pass over the batch types every
    span and emits the final ``mentions`` column, dropping ``spans``.
    """

    def __init__(self):
        self.gazetteer = rules.GAZETTEER  # per-actor broadcast dict (J2/J3)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        spans = batch.column("spans").to_pylist()
        mentions = []
        for text, row in zip(texts, spans):
            ms = []
            for sp in row:
                s, e = sp["start"], sp["end"]
                surface = text[s:e]
                ms.append(
                    {
                        "start": s,
                        "end": e,
                        "surface": surface,
                        "etype": rules.classify_mention(surface),
                        "score": 1.0,
                    }
                )
            mentions.append(ms)
        out = batch.drop_columns(["spans"])
        return out.append_column("mentions", pa.array(mentions, type=pa.list_(MENTION_STRUCT)))


def detect_and_classify(
    ds,
    *,
    max_tokens: int = rules.MAX_TOKENS_DEFAULT,
    concurrency=None,
    batch_size: int = 4096,
    num_cpus: float = 0.5,
    backend: str = "tasks",
    scorer: str = "rules",
    num_gpus: float = 0,
    decode_mode: str = "first_wins",
):
    """read columns (conv_id, turn_idx, text, tool, ...) -> + mentions col.

    ``scorer`` selects the model backend from the registry in
    stages/detect.py (rules / oracle / hf — the reference's model_mode
    registry, SURVEY §2.10); ``backend`` selects the execution shape:

    - ``tasks`` (default for cheap-state scorers): scoring FUSED into one
      stateless map_batches task — the rules backend's per-call state
      (compiled patterns, gazetteer set) is cheap to hold per worker
      process, and an elastic task pool uses every free CPU (measured 2.3x
      faster and near-linear 8->32 scaling vs a fixed actor pool at this
      state size).
    - ``actors``: an actor pool constructing the backend ONCE per actor in
      ``__init__`` — the shape a heavy backend (HF transformer weights,
      GPU) requires. Pass a fixed int ``concurrency`` sized ~num_cpus/4;
      autoscaling (min, max) ramps too slowly for batch jobs; set
      ``num_gpus=1`` for GPU scorers.
    """
    if backend == "tasks":
        if scorer == "rules":
            # fused fast path with the vectorized uppercase prefilter
            det = SpanDetector(max_tokens)
            clf = SpanClassifier()

            def detect_classify(batch: pa.Table) -> pa.Table:
                return clf(det(batch))

            fn = detect_classify
        else:
            from .detect import ScorerActor

            fn = ScorerActor(scorer=scorer, max_tokens=max_tokens,
                             decode_mode=decode_mode)
        return ds.map_batches(
            fn,
            batch_format="pyarrow",
            batch_size=batch_size,
            zero_copy_batch=True,
        )
    from .detect import ScorerActor

    kwargs = {"num_cpus": num_cpus}
    if num_gpus:
        kwargs = {"num_gpus": num_gpus}
    return ds.map_batches(
        ScorerActor,
        fn_constructor_kwargs={"scorer": scorer, "max_tokens": max_tokens,
                               "decode_mode": decode_mode},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        zero_copy_batch=True,
        **kwargs,
    )


def flatten_mentions(ds):
    """Turn-level mentions column -> one row per mention (MENTIONS schema)."""

    def explode(batch: pa.Table) -> pa.Table:
        conv = batch.column("conv_id").to_pylist()
        turn = batch.column("turn_idx").to_pylist()
        ms = batch.column("mentions").to_pylist()
        cols = {
            "conv_id": [], "turn_idx": [], "start": [], "end": [],
            "surface": [], "etype": [], "score": [],
        }
        for c, t, row in zip(conv, turn, ms):
            for m in row:
                cols["conv_id"].append(c)
                cols["turn_idx"].append(t)
                cols["start"].append(m["start"])
                cols["end"].append(m["end"])
                cols["surface"].append(m["surface"])
                cols["etype"].append(m["etype"])
                cols["score"].append(m["score"])
        # NOTE: MENTIONS must be bound at module level, not imported here:
        # this closure runs on workers, where a runtime relative import
        # fails when the package was loaded by path from a non-repo cwd
        # (the by-value pickling fallback covers globals, not imports).
        return pa.Table.from_pydict(cols, schema=MENTIONS)

    return ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)


def add_windows_with_carry(ds, window_turns: int = WINDOW_TURNS):
    """Assign ``win = turn_idx // W`` and duplicate the last LOOKBACK_TURNS
    rows of each window into the next one flagged ``carry=True``.

    This is the skew salt for hot conversations (SURVEY §4): predicate
    extraction groups on (conv_id, win) instead of whole conversations, so a
    10^5-turn conversation becomes ~10^3 bounded groups. Pronoun lookback is
    contractually bounded at LOOKBACK_TURNS (rules.py), so the carry rows
    give every window the full context it needs; carry rows never emit
    triples themselves.
    """

    def assign(batch: pa.Table) -> pa.Table:
        turn = batch.column("turn_idx").to_numpy(zero_copy_only=False)
        win = (turn // window_turns).astype(np.int64)
        base = batch.append_column("win", pa.array(win)).append_column(
            "carry", pa.array(np.zeros(len(turn), dtype=bool))
        )
        carry_mask = (turn % window_turns) >= (window_turns - _CARRY)
        if carry_mask.any():
            idx = np.nonzero(carry_mask)[0]
            dup = batch.take(pa.array(idx))
            dup = dup.append_column("win", pa.array(win[idx] + 1)).append_column(
                "carry", pa.array(np.ones(len(idx), dtype=bool))
            )
            return pa.concat_tables([base, dup])
        return base

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


# Fused single-pass output: mention rows and raw-triple rows share one
# superset schema tagged by ``kind`` so the whole extraction is ONE lazy
# pipeline ending in ONE shuffle — no mid-pipeline materialization of the
# full classified corpus, and the per-group pass emits both tables at once.
COMBINED = pa.schema(
    [
        ("kind", pa.int8()),  # 0 = mention, 1 = triple, 2 = occ partial
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("start", pa.int32()),
        ("end", pa.int32()),
        ("surface", pa.string()),
        ("etype", pa.string()),
        ("score", pa.float32()),
        ("subj_surface", pa.string()),
        ("subj_etype", pa.string()),
        ("pred", pa.string()),
        ("obj_surface", pa.string()),
        ("obj_etype", pa.string()),
        ("occ_n", pa.int64()),  # kind=2: occurrence count for (etype, surface)
    ]
)


def extract_combined(ds, *, concurrency=None, batch_size: int = 4096,
                     window_turns: int = WINDOW_TURNS, num_buckets: int = 128,
                     max_tokens: int = rules.MAX_TOKENS_DEFAULT,
                     scorer: str = "rules", decode_mode: str = "first_wins",
                     context_mode: str = "recency"):
    """read -> detect -> classify -> window -> bucketed group extraction ->
    tagged mention+triple rows (COMBINED schema).

    Grouping is BUCKETED, not per-group: (conv_id, win) groups are hashed
    into ``num_buckets`` int buckets, ONE int-key shuffle co-locates them,
    and each bucket task processes its thousands of groups in a single
    sorted sweep (group boundaries found on sorted columns). A naive
    groupby(conv_id, win).map_groups paid per-group UDF + Table overhead —
    ~0.5 ms x 170k groups at bench scale dominated the whole job and grew
    linearly with corpus size.
    """
    if scorer == "rules":
        # ONE fused pass: detect + classify + predicate precompute. The
        # text column is materialized to Python exactly once (three
        # separate map stages each re-copied it — measured as inflated
        # per-core memory traffic at high parallelism), and the turn TEXT
        # is dropped before the shuffle — only mentions + two small
        # predicate columns move.
        def fused(batch: pa.Table) -> pa.Table:
            texts = batch.column("text").to_pylist()
            mask = pc.match_substring_regex(batch.column("text"), "[A-Z]").to_numpy(
                zero_copy_only=False
            )
            ments_col, pair_preds, pron_preds, pron_embs = [], [], [], []
            for i, text in enumerate(texts):
                ms = rules.detect_typed_mentions(text, max_tokens) if mask[i] else []
                ments_col.append(
                    [
                        {"start": m.start, "end": m.end, "surface": m.surface,
                         "etype": m.etype, "score": m.score}
                        for m in ms
                    ]
                )
                pp, pron = rules.precompute_turn_preds(text, ms)
                pair_preds.append(pp)
                pron_preds.append(pron)
                # scored S8: the query embedding is a pure function of the
                # turn text, computed HERE so the reassembly shuffle still
                # never carries text — only ~64 floats, and only for
                # pronoun-initial turns
                pron_embs.append(
                    [float(x) for x in rules.context_query_embedding(text)]
                    if (context_mode == "scored" and pron is not None)
                    else None
                )
            out = batch.drop_columns(["text"])
            return out.append_column(
                "mentions", pa.array(ments_col, type=pa.list_(MENTION_STRUCT))
            ).append_column(
                "pair_preds", pa.array(pair_preds, type=pa.list_(pa.string()))
            ).append_column(
                "pron_pred", pa.array(pron_preds, type=pa.string())
            ).append_column(
                "pron_emb", pa.array(pron_embs, type=pa.list_(pa.float32()))
            )

        ds = ds.map_batches(fused, batch_format="pyarrow", zero_copy_batch=True,
                            batch_size=batch_size)
    else:
        ds = detect_and_classify(ds, concurrency=concurrency, batch_size=batch_size,
                                 max_tokens=max_tokens, scorer=scorer,
                                 decode_mode=decode_mode)

        def precompute(batch: pa.Table) -> pa.Table:
            texts = batch.column("text").to_pylist()
            ments = batch.column("mentions").to_pylist()
            pair_preds, pron_preds, pron_embs = [], [], []
            for text, row in zip(texts, ments):
                mentions = [
                    rules.Mention(m["start"], m["end"], m["surface"], m["etype"], m["score"])
                    for m in row
                ]
                pp, pron = rules.precompute_turn_preds(text, mentions)
                pair_preds.append(pp)
                pron_preds.append(pron)
                pron_embs.append(
                    [float(x) for x in rules.context_query_embedding(text)]
                    if (context_mode == "scored" and pron is not None)
                    else None
                )
            out = batch.drop_columns(["text"])
            return out.append_column(
                "pair_preds", pa.array(pair_preds, type=pa.list_(pa.string()))
            ).append_column(
                "pron_pred", pa.array(pron_preds, type=pa.string())
            ).append_column(
                "pron_emb", pa.array(pron_embs, type=pa.list_(pa.float32()))
            )

        ds = ds.map_batches(precompute, batch_format="pyarrow", zero_copy_batch=True,
                            batch_size=batch_size)
    ds = add_windows_with_carry(ds, window_turns)

    def bucketize(batch: pa.Table) -> pa.Table:
        import pandas as pd

        keyframe = pd.DataFrame(
            {"c": batch.column("conv_id").to_pandas(), "w": batch.column("win").to_pandas()}
        )
        # vectorized row hash (C-speed, process-stable) — no string concat
        bucket = (
            pd.util.hash_pandas_object(keyframe, index=False).to_numpy() % num_buckets
        ).astype("int64")
        return batch.append_column("bucket", pa.array(bucket))

    ds = ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True,
                        batch_size=batch_size)

    def per_bucket(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group,
            sort_keys=[("conv_id", "ascending"), ("win", "ascending"),
                       ("turn_idx", "ascending")],
        )
        group = group.take(order)
        conv = group.column("conv_id").to_pylist()
        win = group.column("win").to_pylist()
        turn = group.column("turn_idx").to_pylist()
        tool = group.column("tool").to_pylist()
        carry = group.column("carry").to_pylist()
        ments = group.column("mentions").to_pylist()
        pair_preds = group.column("pair_preds").to_pylist()
        pron_preds = group.column("pron_pred").to_pylist()
        pron_embs = group.column("pron_emb").to_pylist()
        n = len(turn)
        cols = {name: [] for name in COMBINED.names}

        def emit(kind, conv_id, turn_idx, **kw):
            cols["kind"].append(kind)
            cols["conv_id"].append(conv_id)
            cols["turn_idx"].append(turn_idx)
            for name in ("start", "end", "surface", "etype", "score",
                         "subj_surface", "subj_etype", "pred", "obj_surface",
                         "obj_etype", "occ_n"):
                cols[name].append(kw.get(name))

        from collections import Counter

        occ: Counter = Counter()  # (etype, surface) occurrence partials
        i = 0
        while i < n:
            # one (conv_id, win) group = a run of identical key values
            j = i
            while j < n and conv[j] == conv[i] and win[j] == win[i]:
                j += 1
            recent: list[tuple[int, str]] = []
            for r in range(i, j):
                mentions = sorted(
                    (
                        rules.Mention(m["start"], m["end"], m["surface"], m["etype"], m["score"])
                        for m in ments[r]
                    ),
                    key=lambda m: m.start,
                )
                if not carry[r]:
                    for m in mentions:
                        emit(0, conv[r], turn[r], start=m.start, end=m.end,
                             surface=m.surface, etype=m.etype, score=m.score)
                        occ[(m.etype, m.surface)] += 1
                prev_person = rules.select_antecedent(
                    recent, turn[r], context_mode, pron_embs[r]
                )
                if not carry[r]:
                    for s_surf, s_et, pred, o_surf, o_et in rules.triples_from_precomputed(
                        mentions, pair_preds[r], pron_preds[r], tool[r], prev_person
                    ):
                        emit(1, conv[r], turn[r], subj_surface=s_surf, subj_etype=s_et,
                             pred=pred, obj_surface=o_surf, obj_etype=o_et)
                        occ[(s_et, s_surf)] += 1
                        occ[(o_et, o_surf)] += 1
                lp = rules.last_person(mentions)
                if lp is not None:
                    recent.append((turn[r], lp))
            i = j
        # kind=2: occurrence-count partials for the linking stage, computed
        # here so no later pass rescans the corpus-shaped rows
        for (et, surf), cnt in occ.items():
            emit(2, "", -1, etype=et, surface=surf, occ_n=cnt)
        return pa.Table.from_pydict(cols, schema=COMBINED)

    return ds.groupby("bucket").map_groups(per_bucket, batch_format="pyarrow")


def mentions_from_combined(combined):
    from ..schemas import MENTIONS

    def project(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.equal(batch.column("kind"), 0))
        return pa.Table.from_pydict(
            {n: pc.cast(b.column(n), MENTIONS.field(n).type) for n in MENTIONS.names},
            schema=MENTIONS,
        )

    return combined.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


def triples_from_combined(combined):
    from ..schemas import RAW_TRIPLES

    def project(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.equal(batch.column("kind"), 1))
        return pa.Table.from_pydict(
            {n: pc.cast(b.column(n), RAW_TRIPLES.field(n).type) for n in RAW_TRIPLES.names},
            schema=RAW_TRIPLES,
        )

    return combined.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
