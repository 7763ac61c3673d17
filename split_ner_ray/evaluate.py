"""Metrics ops: span micro/macro F1 and triple-set P/R (reference op A1).

Mirrors the reference's mention-level metric exactly
(`splitner/analysis.py:32-91` calc_micro_f1 + get_spans): spans decode with
B- starting, I- continuing only while adjacent AND same-typed; span
equality is (etype, sentence, start, end); P/R/F1 use the 1e-7 epsilon
denominators. The distributed version accumulates per-batch TP/FP/FN
counter partials and reduces with one small groupby — the partial+final
pattern (SURVEY.md §2.5 A1), which is also the north-rule P/R>=0.95
checker for triples.
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa

EPS = 1e-7


def decode_typed_spans(tags: list[str]) -> list[tuple[str, int, int]]:
    """BIO tags -> [(etype, start, end)] with the reference's typed
    continuation rule (analysis.py:80-95): I- extends only if adjacent and
    the type matches the open span."""
    spans: list[tuple[str, int, int]] = []
    can_continue = False
    for i, tag in enumerate(tags):
        if tag.startswith("B-"):
            spans.append((tag[2:], i, i))
            can_continue = True
        elif (
            tag.startswith("I-")
            and can_continue
            and spans
            and spans[-1][0] == tag[2:]
        ):
            spans[-1] = (spans[-1][0], spans[-1][1], i)
        else:
            can_continue = False
    return spans


def sentence_counts(gold: list[str], pred: list[str]) -> Counter:
    """Per-sentence (etype, kind) -> count partials, kind in tp/fp/fn."""
    g = set(decode_typed_spans(gold))
    p = set(decode_typed_spans(pred))
    c: Counter = Counter()
    for s in g:
        c[(s[0], "tp" if s in p else "fn")] += 1
    for s in p:
        if s not in g:
            c[(s[0], "fp")] += 1
    return c


def prf(tp: int, fp: int, fn: int) -> tuple[float, float, float]:
    """The reference's epsilon-smoothed P/R/F1 (analysis.py:52-56)."""
    p = tp * 1.0 / (tp + fp + EPS)
    r = tp * 1.0 / (tp + fn + EPS)
    f1 = 2.0 * p * r / (p + r + EPS)
    return p, r, f1


def finalize(counts: Counter) -> dict:
    """Counter partials -> {"micro": {...}, "macro_f1": .., "per_tag": {...}}."""
    per_tag: dict[str, dict] = {}
    for (tag, kind), n in counts.items():
        per_tag.setdefault(tag, {"tp": 0, "fp": 0, "fn": 0})[kind] += n
    total = {"tp": 0, "fp": 0, "fn": 0}
    tag_f1_sum = 0.0
    for tag, c in per_tag.items():
        for k in total:
            total[k] += c[k]
        p, r, f1 = prf(c["tp"], c["fp"], c["fn"])
        c.update({"precision": p, "recall": r, "f1": f1})
        tag_f1_sum += f1
    p, r, f1 = prf(total["tp"], total["fp"], total["fn"])
    return {
        "micro": {**total, "precision": p, "recall": r, "f1": f1},
        "macro_f1": tag_f1_sum / (len(per_tag) + EPS),
        "per_tag": per_tag,
    }


def span_f1_dataset(ds, gold_col: str = "gold_tags", pred_col: str = "pred_tags") -> dict:
    """Distributed micro/macro span F1 over a Dataset of sentences with
    list<string> gold/pred tag columns. Per-batch partials -> one tiny
    groupby-free reduction (the partial tables are a few rows each)."""

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for g, p in zip(batch.column(gold_col).to_pylist(), batch.column(pred_col).to_pylist()):
            c.update(sentence_counts(g, p))
        tags = [k[0] for k in c]
        kinds = [k[1] for k in c]
        ns = [int(v) for v in c.values()]
        return pa.Table.from_pydict(
            {"tag": tags, "kind": kinds, "n": ns},
            schema=pa.schema([("tag", pa.string()), ("kind", pa.string()), ("n", pa.int64())]),
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    from ray.data.aggregate import Sum

    reduced = parts.groupby(["tag", "kind"]).aggregate(Sum("n", alias_name="n")).take_all()
    counts: Counter = Counter({(r["tag"], r["kind"]): r["n"] for r in reduced})
    return finalize(counts)


def triple_set_pr(got_ds, want_ds, key_cols=("subj_id", "pred", "obj_id")) -> dict:
    """North-rule checker: P/R of one triple Dataset vs a reference one.

    Distributed set compare: tag each side, groupby the triple key, count
    per-group side membership — no driver-side set materialization.
    """

    def tag(side: str):
        def fn(batch: pa.Table) -> pa.Table:
            key = [
                "\x00".join(vals)
                for vals in zip(*(batch.column(c).to_pylist() for c in key_cols))
            ]
            return pa.Table.from_pydict(
                {"key": key, "side": [side] * len(key)},
                schema=pa.schema([("key", pa.string()), ("side", pa.string())]),
            )

        return fn

    both = got_ds.map_batches(tag("got"), batch_format="pyarrow").union(
        want_ds.map_batches(tag("want"), batch_format="pyarrow")
    )

    def per_key(group: pa.Table) -> pa.Table:
        sides = set(group.column("side").to_pylist())
        kind = "tp" if len(sides) == 2 else ("fp" if "got" in sides else "fn")
        return pa.Table.from_pydict(
            {"kind": [kind], "n": [1]},
            schema=pa.schema([("kind", pa.string()), ("n", pa.int64())]),
        )

    from ray.data.aggregate import Sum

    rows = (
        both.groupby("key")
        .map_groups(per_key, batch_format="pyarrow")
        .groupby("kind")
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    c = {r["kind"]: r["n"] for r in rows}
    tp, fp, fn = c.get("tp", 0), c.get("fp", 0), c.get("fn", 0)
    p, r, f1 = prf(tp, fp, fn)
    return {"tp": tp, "fp": fp, "fn": fn, "precision": p, "recall": r, "f1": f1}
