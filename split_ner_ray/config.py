"""Pipeline configuration (reference op R6).

The reference drives every behavior from a JSON config file parsed into
dataclasses (`splitner/utils/general.py:118-131`,
`splitner/additional_args.py:10-103` — 60+ knobs). Our analog is one
dataclass covering the KG job's knobs; ``from_json`` accepts a path or a
JSON string, unknown keys are rejected (typo safety).
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass


@dataclass
class PipelineConfig:
    input_path: str = ""
    output_dir: str = ""
    # extraction
    max_tokens: int = 256          # M9 truncation (max_seq_len analog)
    window_turns: int = 64         # predicate-extraction window (skew salt)
    batch_size: int = 1024
    detector_backend: str = "rules"  # scorer registry (stages/detect.py)
    # decode variant for sub-token scorers: "first_wins" (mapping1),
    # "consistency" (mapping2, functions/decode.consistency_vote_assign),
    # or "crf" (functions/crf.crf_decode_tags — numpy Viterbi over the
    # BIOE transition matrix, the model_crf.py:151-155 decode). Plumbed
    # through detect_and_classify -> ScorerActor -> backend; the rules /
    # oracle backends tokenize atomically and emit structurally valid
    # spans directly, so all three coincide there (asserted by tests) —
    # the hf backend is the consumer that differentiates them.
    decode_mode: str = "first_wins"
    # S8 context retrieval: "recency" (nearest person antecedent) or
    # "scored" (embedding-similarity re-ranked candidates — the sandbox
    # analog of the reference's NSP-scored previous-sentence selection,
    # utils/next_sent_prediction.py:15-60). rules.select_antecedent.
    context_retrieval: str = "recency"
    # actor pools
    min_actors: int = 1
    max_actors: int = 8
    # checkpointing
    files_per_group: int = 4
    resume: bool = True
    # linking
    link_sim_threshold: float = 0.8

    def __post_init__(self):
        from .stages.detect import BACKENDS

        if self.detector_backend not in BACKENDS:
            raise ValueError(
                f"detector_backend={self.detector_backend!r}; known: {sorted(BACKENDS)}"
            )
        if self.decode_mode not in ("first_wins", "consistency", "crf"):
            raise ValueError(
                f"decode_mode={self.decode_mode!r}; known: first_wins, consistency, crf"
            )
        from . import rules as _rules

        if self.context_retrieval not in _rules.CONTEXT_MODES:
            raise ValueError(
                f"context_retrieval={self.context_retrieval!r}; known: {_rules.CONTEXT_MODES}"
            )
        if not 0.0 < self.link_sim_threshold <= 1.0:
            raise ValueError(f"link_sim_threshold out of (0, 1]: {self.link_sim_threshold}")

    @classmethod
    def from_json(cls, src: str) -> "PipelineConfig":
        if os.path.exists(src):
            with open(src) as f:
                raw = json.load(f)
        else:
            raw = json.loads(src)
        known = {f.name for f in dataclasses.fields(cls)}
        unknown = set(raw) - known
        if unknown:
            raise ValueError(f"unknown config keys: {sorted(unknown)}")
        return cls(**raw)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, sort_keys=True)
