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
    n_gold_tags = 0
    for tag, c in per_tag.items():
        for k in total:
            total[k] += c[k]
        p, r, f1 = prf(c["tp"], c["fp"], c["fn"])
        c.update({"precision": p, "recall": r, "f1": f1})
        # macro averages over tags PRESENT IN GOLD only (tp+fn > 0) — the
        # reference iterates the gold-derived tag list (analysis.py:60-72),
        # so a type that appears only as false positives never enters the
        # macro denominator
        if c["tp"] + c["fn"] > 0:
            tag_f1_sum += f1
            n_gold_tags += 1
    p, r, f1 = prf(total["tp"], total["fp"], total["fn"])
    return {
        "micro": {**total, "precision": p, "recall": r, "f1": f1},
        "macro_f1": tag_f1_sum / (n_gold_tags + EPS),
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


def overlap_category(gold: tuple[str, int, int], pred: tuple[str, int, int]) -> str:
    """Classify a gold-vs-pred span relationship (op A5, the reference's
    boundary/overlap error segregation, analysis.py:155-254 — same
    taxonomy, compacted): exact / type_mismatch / missed_prefix /
    extra_prefix / missed_suffix / extra_suffix / contained / contains /
    overlap / disjoint."""
    get, gs, ge = gold
    pet, ps, pe = pred
    if (gs, ge) == (ps, pe):
        return "exact" if get == pet else "type_mismatch"
    if pe < gs or ps > ge:
        return "disjoint"
    if ps >= gs and pe <= ge:
        out = []
        if ps > gs:
            out.append("missed_prefix")
        if pe < ge:
            out.append("missed_suffix")
        return "+".join(out) or "contained"
    if ps <= gs and pe >= ge:
        out = []
        if ps < gs:
            out.append("extra_prefix")
        if pe > ge:
            out.append("extra_suffix")
        return "+".join(out) or "contains"
    return "overlap"


def boundary_error_counts(ds, gold_col: str = "gold_tags", pred_col: str = "pred_tags") -> dict:
    """Distributed A5: per-sentence best-overlap categorization of every
    gold span vs pred spans, reduced to a category histogram."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for g, p in zip(batch.column(gold_col).to_pylist(), batch.column(pred_col).to_pylist()):
            gold = decode_typed_spans(g)
            pred = decode_typed_spans(p)
            for gs in gold:
                overlapping = [
                    ps for ps in pred if not (ps[2] < gs[1] or ps[1] > gs[2])
                ]
                if not overlapping:
                    c["missed"] += 1
                    continue
                # best = the overlap with the largest intersection (ties:
                # leftmost), mirroring the reference's per-span pairing
                best = max(
                    overlapping,
                    key=lambda ps: (min(ps[2], gs[2]) - max(ps[1], gs[1]), -ps[1]),
                )
                c[overlap_category(gs, best)] += 1
            for ps in pred:
                if all(ps[2] < gs[1] or ps[1] > gs[2] for gs in gold):
                    c["spurious"] += 1
        return pa.Table.from_pydict(
            {"category": list(c.keys()), "n": [int(v) for v in c.values()]},
            schema=pa.schema([("category", pa.string()), ("n", pa.int64())]),
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    rows = parts.groupby("category").aggregate(Sum("n", alias_name="n")).take_all()
    return {r["category"]: r["n"] for r in rows}


def compare_predictions(ds_a, ds_b, key_cols=("conv_id", "turn_idx", "start", "end")) -> dict:
    """Prediction-diff (op D4, utils/general.py:608-647): rows present in
    only one of two mention tables, keyed by exact span.

    Distributed: each side projects to (key cols, in_a/in_b indicator),
    ONE groupby sums the indicators per distinct key, and only the
    DIFF rows (small by construction when two runs mostly agree) plus a
    3-long count table ever reach the driver — neither input is
    materialized (this was the last full-corpus take_all outside the
    acknowledged parity harness)."""
    import numpy as np

    from ray.data.aggregate import Sum

    full_key = list(key_cols) + ["etype"]

    def tag(which: str):
        def fn(batch: "pd.DataFrame") -> "pd.DataFrame":
            out = batch[full_key].copy()
            out["in_a"] = np.int64(1 if which == "a" else 0)
            out["in_b"] = np.int64(1 if which == "b" else 0)
            return out

        return fn

    both = ds_a.map_batches(tag("a"), batch_format="pandas").union(
        ds_b.map_batches(tag("b"), batch_format="pandas"))
    # materialize: three consumers below (two take_alls + a count) would
    # otherwise each re-execute the union+groupby over both full inputs
    per_key = both.groupby(full_key).aggregate(
        Sum("in_a", alias_name="n_a"),
        Sum("in_b", alias_name="n_b")).materialize()
    only_a = per_key.filter(lambda r: r["n_a"] > 0 and r["n_b"] == 0)
    only_b = per_key.filter(lambda r: r["n_b"] > 0 and r["n_a"] == 0)
    common = per_key.filter(lambda r: r["n_a"] > 0 and r["n_b"] > 0).count()
    key_of = lambda r: tuple(r[c] for c in full_key)
    return {
        "only_a": sorted(key_of(r) for r in only_a.take_all()),
        "only_b": sorted(key_of(r) for r in only_b.take_all()),
        "common": int(common),
    }


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


def multi_seed_summary(run_metrics: list[dict]) -> dict:
    """Multi-seed aggregation (op A4, analysis_multirun.py:427-447): per
    metric the per-run values plus mean and population std. The reference
    averages micro P/R/F1 across its 4 seeds; we carry macro too."""
    import numpy as np

    def agg(vals: list[float]) -> dict:
        return {
            "runs": [float(v) for v in vals],
            "mean": float(np.mean(vals)),
            "std": float(np.std(vals)),
        }

    return {
        "n_runs": len(run_metrics),
        "micro_p": agg([m["micro"]["precision"] for m in run_metrics]),
        "micro_r": agg([m["micro"]["recall"] for m in run_metrics]),
        "micro_f1": agg([m["micro"]["f1"] for m in run_metrics]),
        "macro_f1": agg([m["macro_f1"] for m in run_metrics]),
    }


def span_based_view(ds, gold_col: str = "pos", pred_col: str = "dep"):
    """convert_to_span_based (analysis_multirun.py:389-399): GOLD typed
    tags collapse to {B,I}-ENTITY (first tag character + '-ENTITY'); the
    prediction column is left untouched — span-detector prediction files
    are already entity-agnostic. Used by multirun_comparison's
    span_based mode. Arrow in/out: ragged list<string> columns don't
    survive a pandas round-trip in Ray's block conversion."""
    import pyarrow as pa

    def conv(b: "pa.Table") -> "pa.Table":
        tags = b.column(gold_col).to_pylist()
        new = [[t if t == "O" else f"{t[0]}-ENTITY" for t in ts]
               for ts in tags]
        idx = b.schema.get_field_index(gold_col)
        return b.set_column(idx, gold_col,
                            pa.array(new, type=pa.list_(pa.string())))

    return ds.map_batches(conv, batch_format="pyarrow")


def multirun_comparison(experiment_dir: str, datasets: list[str],
                        models: list[str], *,
                        seeds=(142, 242, 342, 442), file: str = "test",
                        span_based: bool = False):
    """Per-dataset/per-model multi-run comparison tables — the reference's
    analysis_multirun.py main flow (analysis_multirun.py:427-447): for
    each (dataset, model) read
    ``{experiment_dir}/{dataset}/{model}/run-{seed}/predictions/{file}.tsv``
    per seed (3-column token/gold/pred TSV; the reference's fixed seed set
    142/242/342/442 is the default), score span micro P/R/F1 per run, and
    emit one row per experiment with the per-seed values, mean/std of F1,
    and the reference's pipe-table row ('| id | f1 ... | mean |', values
    in percent). Missing run files are skipped, matching parse_file's
    empty return. ``span_based`` applies convert_to_span_based to gold
    first (span-detector experiments).

    Returns a pandas DataFrame (diagnostic-tool scale: file parsing runs
    through the Ray TSV reader, metric reduction through
    span_f1_dataset's distributed counts)."""
    import os

    import numpy as np
    import pandas as pd

    from .sources.tsv import read_tsv_corpus

    rows = []
    for dataset in datasets:
        for model in models:
            per_seed, used = [], []
            for seed in seeds:
                p = os.path.join(experiment_dir, dataset, model,
                                 f"run-{seed}", "predictions", f"{file}.tsv")
                if not os.path.exists(p):
                    continue
                ds = read_tsv_corpus(p)
                if span_based:
                    ds = span_based_view(ds)
                m = span_f1_dataset(ds, gold_col="pos", pred_col="dep")
                per_seed.append(m["micro"])
                used.append(int(seed))
            f1s = [m["f1"] for m in per_seed]
            mean_f1 = float(np.mean(f1s)) if f1s else float("nan")
            std_f1 = float(np.std(f1s)) if f1s else float("nan")
            md = "| {0}/{1} | {2} | {3:.2f} |".format(
                dataset, model,
                " | ".join(f"{100 * v:.2f}" for v in f1s),
                100 * mean_f1 if f1s else float("nan"),
            )
            rows.append({
                "dataset": dataset,
                "model": model,
                "n_runs": len(per_seed),
                "seeds": used,
                "p_runs": [m["precision"] for m in per_seed],
                "r_runs": [m["recall"] for m in per_seed],
                "f1_runs": f1s,
                "mean_f1": mean_f1,
                "std_f1": std_f1,
                "markdown": md,
            })
    return pd.DataFrame(rows)


def oov_error_analysis(train_ds, test_ds, *, tokens_col: str = "tokens",
                       gold_col: str = "pos", pred_col: str = "dep"):
    """analyse_oov_errors parity (analysis_multirun.py:309-350): segment
    the FALSE-NEGATIVE spans of a prediction run by unigram-ness and by
    train-vocabulary membership — the diagnostic separating "model misses
    unseen terms" from genuine modeling errors.

    Per tag: n_errors (FN spans), n_unigram_errors (single-token FNs),
    n_oov_unigram_errors (the token unseen in train), n_oov_error_terms /
    n_in_vocab_error_terms (DISTINCT FN-span terms by membership); plus a
    'TOTAL' row carrying the reference's two ratios (x100, float).

    Distribution: the train vocabulary is vocabulary-bounded -> ONE
    distinct-token aggregate broadcast to the scorers (never the corpus);
    FN spans are decoded per batch and reduced as (tag, counter) integer
    partials + a (tag, term, oov) distinct-set aggregate."""
    import ray
    import pandas as pd

    from .stages.relational import hash_aggregate

    def vocab_partial(b: pa.Table) -> pa.Table:
        toks = sorted({t for row in b.column(tokens_col).to_pylist()
                       for t in row})
        return pa.Table.from_pydict(
            {"tok": toks}, schema=pa.schema([("tok", pa.string())]))

    vocab_df = hash_aggregate(
        train_ds.map_batches(vocab_partial, batch_format="pyarrow"),
        ["tok"], lambda g: g.drop_duplicates("tok")).to_pandas()
    vref = ray.put(frozenset(vocab_df["tok"]))

    def fn_rows(b: pa.Table) -> pd.DataFrame:
        vocab = ray.get(vref)
        tags_, uni_, oovu_, terms_, oov_ = [], [], [], [], []
        for toks, g, p in zip(b.column(tokens_col).to_pylist(),
                              b.column(gold_col).to_pylist(),
                              b.column(pred_col).to_pylist()):
            gold = decode_typed_spans(g)
            pred = set(decode_typed_spans(p))
            for span in gold:
                if span in pred:
                    continue
                tag, s, e = span
                span_toks = toks[s:e + 1]
                tags_.append(tag)
                uni_.append(int(len(span_toks) == 1))
                oovu_.append(int(len(span_toks) == 1
                                 and span_toks[0] not in vocab))
                for t in span_toks:
                    terms_.append((tag, t))
                    oov_.append(int(t not in vocab))
        counts = pd.DataFrame({"tag": tags_, "uni": uni_, "oovu": oovu_})
        term_rows = pd.DataFrame({
            "tag": [t[0] for t in terms_],
            "term": [t[1] for t in terms_],
            "oov": oov_,
        })
        cagg = counts.groupby("tag", as_index=False).agg(
            n_errors=("tag", "size"), n_uni=("uni", "sum"),
            n_oov_uni=("oovu", "sum")) if len(counts) else pd.DataFrame(
            {"tag": [], "n_errors": [], "n_uni": [], "n_oov_uni": []})
        cagg["kind"] = "c"
        term_rows = term_rows.drop_duplicates(["tag", "term"])
        term_rows["kind"] = "t"
        return pd.concat([cagg, term_rows], ignore_index=True)

    parts = test_ds.map_batches(fn_rows, batch_format="pyarrow")

    def reduce_tag(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for tag, sub in g.groupby("tag", sort=False):
            c = sub[sub["kind"] == "c"]
            t = sub[sub["kind"] == "t"].drop_duplicates(["tag", "term"])
            out.append({
                "tag": tag,
                "n_errors": int(c["n_errors"].sum()),
                "n_unigram_errors": int(c["n_uni"].sum()),
                "n_oov_unigram_errors": int(c["n_oov_uni"].sum()),
                "n_oov_error_terms": int((t["oov"] == 1).sum()),
                "n_in_vocab_error_terms": int((t["oov"] == 0).sum()),
            })
        return pd.DataFrame(out)

    per_tag = hash_aggregate(parts, ["tag"], reduce_tag).to_pandas()
    per_tag = per_tag.sort_values("tag").reset_index(drop=True)
    tot_err = int(per_tag["n_errors"].sum())
    tot_uni = int(per_tag["n_unigram_errors"].sum())
    tot_oov = int(per_tag["n_oov_unigram_errors"].sum())
    total = pd.DataFrame([{
        "tag": "TOTAL", "n_errors": tot_err, "n_unigram_errors": tot_uni,
        "n_oov_unigram_errors": tot_oov,
        "n_oov_error_terms": int(per_tag["n_oov_error_terms"].sum()),
        "n_in_vocab_error_terms": int(per_tag["n_in_vocab_error_terms"].sum()),
        "unigram_error_ratio": 100.0 * tot_uni / tot_err if tot_err else 0.0,
        "oov_unigram_error_ratio": 100.0 * tot_oov / tot_err if tot_err else 0.0,
    }])
    return pd.concat([per_tag, total], ignore_index=True)
