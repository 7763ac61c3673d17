"""Deterministic synthetic transcripts generator (FIXTURES.md F1).

The engine's primary input (BASELINE.json ``input_hint``) is a Parquet table
of multi-turn transcripts ``(conv_id, turn_idx, role, text, tool, ts)``
which the driver's testdata does not ship — so we synthesize it, exactly as
the reference ships its own conformance corpus (``data/dummy/``, SURVEY.md
§5). Everything is a pure function of (seed, conv index): generation
parallelizes over conversation ranges with identical output at any
parallelism, and no wall-clock anywhere.

Exercised properties (FIXTURES.md F1): power-law conversation sizes with hot
conversations (skew/salting), rows shuffled across conversations (so
reassembly is load-bearing), plantable entities + relation patterns +
pronoun coreference (so extraction is checkable), empty/unicode/punctuation
turns, and turns longer than the truncation limit.
"""

from __future__ import annotations

import os
import random
from datetime import datetime, timedelta

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from . import rules
from .schemas import TRANSCRIPTS

_EPOCH = datetime(2025, 1, 1)
ROLES = ["user", "assistant", "system", "tool"]

_NOISE_WORDS = (
    "the quick brown fox jumps over a lazy dog while many small tasks "
    "run in parallel across worker nodes and results stream back to the "
    "driver for final aggregation without blocking"
).split()

# (pattern, subj pool, obj pool) — patterns drawn from rules.PRED_PATTERNS
# so the extractor finds them; pools keep types plausible.
_REL_TEMPLATES = [
    ("works at", "person", "organization"),
    ("worked at", "person", "organization"),
    ("is based in", "organization", "location"),
    ("lives in", "person", "location"),
    ("uses", "person", "product"),
    ("deployed", "organization", "product"),
    ("met", "person", "person"),
    ("acquired", "organization", "organization"),
    ("reported", "person", "id"),
    ("fixed", "person", "id"),
    ("visited", "person", "location"),
    ("launched", "organization", "product"),
]
_ID_PREFIXES = ["CVE", "BUG", "TKT", "REQ", "INC"]


def _pick_surface(rng: random.Random, etype: str) -> str:
    if etype == "person":
        if rng.random() < 0.25:
            return rng.choice(rules.PERSON_FIRST)
        return f"{rng.choice(rules.PERSON_FIRST)} {rng.choice(rules.PERSON_LAST)}"
    if etype == "organization":
        return rng.choice(rules.ORGS)
    if etype == "location":
        return rng.choice(rules.LOCATIONS)
    if etype == "product":
        return rng.choice(rules.PRODUCTS)
    if etype == "id":
        return f"{rng.choice(_ID_PREFIXES)}-{rng.randint(2010, 2029)}-{rng.randint(100, 99999)}"
    raise ValueError(etype)


def _turn_text(rng: random.Random, turn_idx: int) -> str:
    r = rng.random()
    if r < 0.02:
        return ""  # empty turn
    if r < 0.04:
        return "café naïve résumé — 你好 мир ☃"  # unicode turn
    if r < 0.06:
        return "?!?? ... ;; ---- (()) [..] !!"  # punctuation-heavy
    if r < 0.08:
        # longer than the truncation limit; an entity planted past
        # max_tokens must NOT be detected (M9 contract test)
        words = [rng.choice(_NOISE_WORDS) for _ in range(rules.MAX_TOKENS_DEFAULT + 40)]
        words.append(rng.choice(rules.ORGS))
        return " ".join(words)
    if r < 0.45:
        pat, st, ot = rng.choice(_REL_TEMPLATES)
        a = _pick_surface(rng, st)
        b = _pick_surface(rng, ot)
        return f"{a} {pat} {b} ."
    if r < 0.55 and turn_idx > 0:
        # pronoun follow-up — resolved against a previous person mention
        pron = rng.choice(["He", "She", "They"])
        pat, _st, ot = rng.choice([t for t in _REL_TEMPLATES if t[1] == "person"])
        b = _pick_surface(rng, ot)
        return f"{pron} {pat} {b} ."
    if r < 0.65:
        ident = _pick_surface(rng, "id")
        return f"Please take a look at {ident} before the rollout ."
    # noise sentence, occasionally mentioning a lone entity
    n = rng.randint(4, 14)
    words = [rng.choice(_NOISE_WORDS) for _ in range(n)]
    if rng.random() < 0.3:
        words.insert(rng.randint(0, n), _pick_surface(rng, rng.choice(["person", "organization", "location", "product"])))
    return " ".join(words) + " ."


def _conv_size(rng: random.Random, conv_index: int, n_convs: int) -> int:
    # power-law sizes; first few conversations are "hot" (skew exercise)
    if conv_index < max(2, n_convs // 200):
        return rng.randint(300, 500)
    return min(int(rng.paretovariate(1.3) * 6) + 2, 160)


def gen_conversation(seed: int, conv_index: int, n_convs: int) -> list[dict]:
    rng = random.Random(1_000_003 * seed + conv_index)
    conv_id = f"conv-{conv_index:08d}"
    size = _conv_size(rng, conv_index, n_convs)
    base = _EPOCH + timedelta(seconds=conv_index * 3600)
    rows = []
    for t in range(size):
        role = rng.choices(ROLES, weights=[40, 40, 5, 15])[0]
        tool = rng.choice(rules.TOOLS) if (role == "tool" or rng.random() < 0.08) else ""
        rows.append(
            {
                "conv_id": conv_id,
                "turn_idx": t,
                "role": role,
                "text": _turn_text(rng, t),
                "tool": tool,
                "ts": base + timedelta(seconds=7 * t + (t % 3)),
            }
        )
    return rows


def gen_conv_range(seed: int, lo: int, hi: int, n_convs: int, shuffle: bool = True) -> pa.Table:
    """All turns for conversations [lo, hi) as one Arrow table, row order
    deterministically shuffled so conversations interleave on disk."""
    rows: list[dict] = []
    for ci in range(lo, hi):
        rows.extend(gen_conversation(seed, ci, n_convs))
    if shuffle:
        random.Random(seed * 7 + lo).shuffle(rows)
    cols = {name: [r[name] for r in rows] for name in TRANSCRIPTS.names}
    return pa.Table.from_pydict(cols, schema=TRANSCRIPTS)


def n_convs_for_sf(sf: float) -> int:
    # ~18 turns/conv mean + hot conversations: sf0.001 ~5k turns (smoke),
    # sf0.01 ~45k (correctness), sf0.1 ~450k (bench) — FIXTURES.md F1 scales
    return max(20, int(250_000 * sf))


def sf_of_dir(sf_dir: str) -> float:
    """Parse the scale factor out of a '/root/testdata/sf0.01' style path."""
    name = os.path.basename(os.path.normpath(sf_dir))
    if name.startswith("sf"):
        try:
            return float(name[2:])
        except ValueError:
            pass
    return 0.01


def transcripts_path(sf_dir: str, seed: int = 42, n_convs: int | None = None) -> str:
    """Materialize (once) and return the transcripts parquet dir for a
    testdata sf dir. Cached under /tmp keyed by (sf, n_convs, seed); safe to
    call from many processes (atomic rename commit). ``n_convs`` overrides
    the sf-derived size (bench scaling uses a larger corpus)."""
    sf = sf_of_dir(sf_dir)
    if n_convs is None:
        n_convs = n_convs_for_sf(sf)
    out = f"/tmp/graft_transcripts/sf{sf}_n{n_convs}_seed{seed}"
    done = os.path.join(out, "_SUCCESS")
    if os.path.exists(done):
        return out
    tmp = out + f".tmp.{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    # shard into files of ~500 conversations (conv-disjoint shards — the
    # documented input-layout assumption); generate via Ray when a session
    # is live and the corpus is big, else driver-side
    step = 500
    import ray

    if n_convs >= 2000 and ray.is_initialized():
        gen_transcripts_dataset(n_convs, seed, convs_per_block=step).write_parquet(tmp)
    else:
        for i, lo in enumerate(range(0, n_convs, step)):
            tbl = gen_conv_range(seed, lo, min(lo + step, n_convs), n_convs)
            pq.write_table(tbl, os.path.join(tmp, f"part-{i:05d}.parquet"))
    os.makedirs(os.path.dirname(out), exist_ok=True)
    try:
        os.rename(tmp, out)
    except OSError:
        pass  # another process won the race; its output is identical
    with open(done, "w") as f:
        f.write("ok")
    return out


def gen_transcripts_dataset(n_convs: int, seed: int = 42, convs_per_block: int = 250):
    """Distributed generation as a Ray Data pipeline (for bench-scale data):
    range over conversation indices -> map_batches expands each index range
    into its turns. Deterministic at any parallelism."""
    import ray.data as rd

    def expand(batch: dict[str, np.ndarray]) -> pa.Table:
        ids = batch["id"]
        tables = [gen_conv_range(seed, int(i), int(i) + 1, n_convs) for i in ids]
        return pa.concat_tables(tables)

    return rd.range(n_convs, override_num_blocks=max(1, n_convs // convs_per_block)).map_batches(
        expand, batch_format="numpy", batch_size=convs_per_block
    )
