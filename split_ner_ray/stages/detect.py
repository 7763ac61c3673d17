"""Scorer-backend registry (reference `model_mode` registry,
`/root/reference/splitner/main_qa.py:238-250`, `main.py:178-201`,
`main_span.py:121-128` — SURVEY.md §2.10).

The reference selects among five torch model variants by a config string;
this module is the engine's equivalent: every backend implements ONE batch
interface,

    score_batch(texts: list[str]) -> list[list[rules.Mention]]

and the extraction stage (stages/extract.py) wraps whichever backend the
PipelineConfig names in either a fused task pool (cheap state) or an actor
pool (heavy state — weights loaded once per actor in ``__init__``, the
reference's `NerModel.from_pretrained` shape at `main_qa.py:41-45`, with a
``num_gpus`` knob for GPU scheduling).

Backends:
- ``rules``  — the deterministic pattern+gazetteer system (sandbox default).
- ``oracle`` — an independently-written scorer with the same span
  semantics; tests run the pipeline under both to prove the distributed
  machinery is backend-agnostic.
- ``hf``     — the production HF-transformer pair (SpanDetector QA model +
  SpanClassifier, `model.py:11-354` / `model_span.py:9-71`). torch and
  transformers are not installed in this sandbox, so construction raises a
  loud ImportError describing exactly what it would load; the actor
  plumbing (construction kwargs, num_gpus, batch shape) is real.
"""

from __future__ import annotations

import pyarrow as pa

from .. import rules
from .extract import MENTION_STRUCT


class ScorerBackend:
    """Abstract batch scorer: texts in, typed mentions out."""

    name = "abstract"

    def score_batch(self, texts: list[str]) -> list[list[rules.Mention]]:
        raise NotImplementedError


class RulesBackend(ScorerBackend):
    """Deterministic pattern + gazetteer scorer — the shared rule core
    (rules.py), i.e. the same span semantics as the oracle by construction:
    first-wins assignment, B/I adjacency decode, M9 truncation.

    ``decode_mode`` is accepted for interface parity: this backend
    tokenizes atomically (one class per token, no sub-token grid), so
    mapping1 / mapping2 / crf decode all coincide — the mode only
    differentiates sub-token scorers (HFTransformerBackend)."""

    name = "rules"

    def __init__(self, max_tokens: int = rules.MAX_TOKENS_DEFAULT,
                 decode_mode: str = "first_wins"):
        self.max_tokens = max_tokens
        self.decode_mode = decode_mode
        # compile the pattern/gazetteer "weights" in this worker up front
        rules.detect_spans("warmup Acme Corp", max_tokens)

    def score_batch(self, texts: list[str]) -> list[list[rules.Mention]]:
        return [rules.detect_typed_mentions(t, self.max_tokens) for t in texts]


class OracleBackend(ScorerBackend):
    """Independent composition of the detect->classify stages (no fusion,
    no prefilter): used by tests to show the pipeline produces identical
    output under a different backend implementation."""

    name = "oracle"

    def __init__(self, max_tokens: int = rules.MAX_TOKENS_DEFAULT,
                 decode_mode: str = "first_wins"):
        self.max_tokens = max_tokens
        self.decode_mode = decode_mode  # atomic tokenization: see RulesBackend

    def score_batch(self, texts: list[str]) -> list[list[rules.Mention]]:
        out = []
        for t in texts:
            ms = []
            for s, e in rules.detect_spans(t, self.max_tokens):
                surface = t[s:e]
                ms.append(rules.Mention(s, e, surface, rules.classify_mention(surface)))
            out.append(ms)
        return out


class HFTransformerBackend(ScorerBackend):
    """Production two-model scorer: QA-framed span detector
    (`[CLS] query [SEP] sentence [SEP]`, BIOE head — model.py:11-354)
    followed by a per-mention span classifier ("What is {m}?" —
    model_span.py:9-71, dataset_span.py:82-136). Weights load once per
    actor in __init__; schedule with num_gpus=1 per actor.

    Sub-token -> token projection for this backend uses the alignment
    structure in functions/wordpiece.py (align_subtokens / subtoken_grid)
    with the decode selected by PipelineConfig.decode_mode: mapping1
    (first_wins_assign), mapping2 (consistency_vote_assign), or crf
    (functions/crf.crf_decode_tags — numpy Viterbi over the BIOE
    transition matrix, the model_crf.py:151-155 path).

    Import-gated: this sandbox has no torch/transformers, so construction
    fails loudly instead of silently running a fake."""

    name = "hf"

    def __init__(self, detector_model: str = "bert-base-uncased",
                 classifier_model: str = "bert-base-uncased",
                 max_tokens: int = rules.MAX_TOKENS_DEFAULT,
                 device: str = "cuda", decode_mode: str = "first_wins"):
        try:
            import torch  # noqa: F401
            import transformers  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "HFTransformerBackend needs torch+transformers (not installed "
                "in this sandbox). It would load the SplitNER detector "
                f"({detector_model!r}, QA token-classification head per "
                "reference model.py:11-354) and classifier "
                f"({classifier_model!r}, pooled-CLS head per model_span.py:9-71) "
                "once per actor; run the stage with map_batches(..., "
                "concurrency=N, num_gpus=1)."
            ) from e
        raise NotImplementedError(
            "HF weights loading is environment-specific; subclass and "
            "implement score_batch with the two-model pipeline."
        )


BACKENDS: dict[str, type[ScorerBackend]] = {
    "rules": RulesBackend,
    "oracle": OracleBackend,
    "hf": HFTransformerBackend,
}


def make_backend(name: str, **kwargs) -> ScorerBackend:
    try:
        cls = BACKENDS[name]
    except KeyError:
        raise ValueError(f"unknown scorer backend {name!r}; known: {sorted(BACKENDS)}")
    return cls(**kwargs)


def mentions_column(ms_rows: list[list[rules.Mention]]) -> pa.Array:
    return pa.array(
        [
            [
                {"start": m.start, "end": m.end, "surface": m.surface,
                 "etype": m.etype, "score": m.score}
                for m in row
            ]
            for row in ms_rows
        ],
        type=pa.list_(MENTION_STRUCT),
    )


class ScorerActor:
    """Actor-pool wrapper around any registered backend: backend state is
    built ONCE per actor in __init__ (model-loading shape); __call__ scores
    a pyarrow batch into the ``mentions`` column."""

    def __init__(self, scorer: str = "rules", **backend_kwargs):
        self.backend = make_backend(scorer, **backend_kwargs)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        return batch.append_column(
            "mentions", mentions_column(self.backend.score_batch(texts))
        )
