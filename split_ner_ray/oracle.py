"""Single-process oracle extractor (SURVEY.md §5 test plan, FIXTURES.md F4).

Plain-Python reference implementation of the whole KG build: same rule core
(rules.py) as the distributed pipeline, but executed as simple loops over an
in-memory table — no Ray, no shuffles, no windows. Pipeline output must
match this (triples P/R >= 0.95, target exact) on the deterministic
synthetic transcripts; what the comparison exercises is the distributed
machinery (reassembly shuffle, windowed carry, linking blocks, union-find
passes, dedup, resume), since the extraction rules are shared by
construction.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import pyarrow as pa

from . import rules
from .schemas import MENTIONS, NODES, RAW_TRIPLES, TRIPLES


def commit_oracle_dir(tmp: str, out: str) -> None:
    """Atomically promote a fully-written oracle tmp dir to ``out``.

    Only a lost promotion race (another caller already renamed an
    identical output into place — ENOTEMPTY/EEXIST) is tolerated, and the
    loser's tmp dir is cleaned up; any other OSError (EXDEV, EACCES, …)
    re-raises so a partial/stale dir is never blessed with _SUCCESS."""
    import errno
    import os
    import shutil

    try:
        os.rename(tmp, out)
    except OSError as e:
        if e.errno not in (errno.ENOTEMPTY, errno.EEXIST):
            raise
        shutil.rmtree(tmp, ignore_errors=True)


def extract_mentions(transcripts: pa.Table, max_tokens: int = rules.MAX_TOKENS_DEFAULT) -> pa.Table:
    cols = {n: [] for n in MENTIONS.names}
    conv = transcripts.column("conv_id").to_pylist()
    turn = transcripts.column("turn_idx").to_pylist()
    text = transcripts.column("text").to_pylist()
    for c, t, x in zip(conv, turn, text):
        for m in rules.detect_typed_mentions(x, max_tokens):
            cols["conv_id"].append(c)
            cols["turn_idx"].append(t)
            cols["start"].append(m.start)
            cols["end"].append(m.end)
            cols["surface"].append(m.surface)
            cols["etype"].append(m.etype)
            cols["score"].append(m.score)
    return pa.Table.from_pydict(cols, schema=MENTIONS)


def extract_raw_triples(transcripts: pa.Table, max_tokens: int = rules.MAX_TOKENS_DEFAULT,
                        context_mode: str = "recency") -> pa.Table:
    """Conversation-ordered extraction with pronoun lookback (S8 analog;
    ``context_mode`` selects recency vs embedding-scored antecedents via
    the SAME rules.select_antecedent the distributed pipeline calls)."""
    rows = transcripts.select(["conv_id", "turn_idx", "text", "tool"]).to_pylist()
    by_conv: dict[str, list[dict]] = defaultdict(list)
    for r in rows:
        by_conv[r["conv_id"]].append(r)
    cols = {n: [] for n in RAW_TRIPLES.names}
    for conv_id in sorted(by_conv):
        turns = sorted(by_conv[conv_id], key=lambda r: r["turn_idx"])
        recent: list[tuple[int, str]] = []  # (turn_idx, last person surface)
        for r in turns:
            mentions = rules.detect_typed_mentions(r["text"], max_tokens)
            q_emb = (
                rules.context_query_embedding(r["text"])
                if context_mode == "scored"
                else None
            )
            prev_person = rules.select_antecedent(
                recent, r["turn_idx"], context_mode, q_emb
            )
            for s_surf, s_et, pred, o_surf, o_et in rules.extract_turn_triples(
                r["text"], r["tool"], mentions, prev_person
            ):
                cols["subj_surface"].append(s_surf)
                cols["subj_etype"].append(s_et)
                cols["pred"].append(pred)
                cols["obj_surface"].append(o_surf)
                cols["obj_etype"].append(o_et)
                cols["conv_id"].append(conv_id)
                cols["turn_idx"].append(r["turn_idx"])
            lp = rules.last_person(mentions)
            if lp is not None:
                recent.append((r["turn_idx"], lp))
    return pa.Table.from_pydict(cols, schema=RAW_TRIPLES)


def link_entities(
    mention_keys: list[tuple[str, str]],
    threshold: float | None = None,
    emb_threshold: float | None = None,
) -> dict[tuple[str, str], str]:
    """(etype, norm_surface) -> canonical norm: block then canonicalize each
    block with the SHARED rules.cluster_block (identical to the distributed
    linker's per-block map_groups by construction)."""
    keys = sorted(set(mention_keys))
    blocks: dict[str, list[tuple[str, str]]] = defaultdict(list)
    for et, norm in keys:
        blocks[rules.block_key(norm, et)].append((et, norm))
    out: dict[tuple[str, str], str] = {}
    for bk in sorted(blocks):
        out.update(rules.cluster_block(blocks[bk], threshold, emb_threshold))
    return out


def build_graph(transcripts: pa.Table, max_tokens: int = rules.MAX_TOKENS_DEFAULT,
                context_mode: str = "recency"):
    """Full oracle build -> (triples, nodes) Arrow tables (FIXTURES.md F4)."""
    mentions = extract_mentions(transcripts, max_tokens)
    raw = extract_raw_triples(transcripts, max_tokens, context_mode)

    ment_rows = mentions.to_pylist()
    raw_rows = raw.to_pylist()
    keys = [(r["etype"], rules.normalize_surface(r["surface"])) for r in ment_rows]
    keys += [(r["subj_etype"], rules.normalize_surface(r["subj_surface"])) for r in raw_rows]
    keys += [(r["obj_etype"], rules.normalize_surface(r["obj_surface"])) for r in raw_rows]
    canon = link_entities(keys)

    def eid(et: str, surface: str) -> str:
        norm = rules.normalize_surface(surface)
        return rules.entity_id(et, canon[(et, norm)])

    # nodes: canonical_surface = lexicographically smallest original surface
    # whose normalized form equals the canonical norm (falls back to min
    # surface in the component); n_mentions counts mention occurrences.
    comp_surfaces: dict[str, list[str]] = defaultdict(list)
    comp_etype: dict[str, str] = {}
    comp_count: Counter = Counter()
    comp_canon_norm: dict[str, str] = {}
    seen_occurrences = []
    for r in ment_rows:
        seen_occurrences.append((r["etype"], r["surface"]))
    for r in raw_rows:
        seen_occurrences.append((r["subj_etype"], r["subj_surface"]))
        seen_occurrences.append((r["obj_etype"], r["obj_surface"]))
    for et, surf in seen_occurrences:
        norm = rules.normalize_surface(surf)
        cn = canon[(et, norm)]
        node = rules.entity_id(et, cn)
        comp_surfaces[node].append(surf)
        comp_etype[node] = et
        comp_count[node] += 1
        comp_canon_norm[node] = cn

    node_cols = {n: [] for n in NODES.names}
    for node in sorted(comp_surfaces):
        surfs = comp_surfaces[node]
        cn = comp_canon_norm[node]
        exact = sorted(s for s in surfs if rules.normalize_surface(s) == cn)
        node_cols["entity_id"].append(node)
        node_cols["canonical_surface"].append(exact[0] if exact else min(surfs))
        node_cols["etype"].append(comp_etype[node])
        node_cols["n_mentions"].append(comp_count[node])
    nodes = pa.Table.from_pydict(node_cols, schema=NODES)

    # dedup triples on (subj_id, pred, obj_id); provenance = min occurrence
    agg: dict[tuple[str, str, str], dict] = {}
    for r in raw_rows:
        sid = eid(r["subj_etype"], r["subj_surface"])
        oid = eid(r["obj_etype"], r["obj_surface"])
        key = (sid, r["pred"], oid)
        prov = (r["conv_id"], r["turn_idx"], r["subj_surface"], r["obj_surface"])
        cur = agg.get(key)
        if cur is None:
            agg[key] = {"prov": prov, "support": 1}
        else:
            cur["support"] += 1
            if prov < cur["prov"]:
                cur["prov"] = prov
    tri_cols = {n: [] for n in TRIPLES.names}
    for (sid, pred, oid) in sorted(agg):
        e = agg[(sid, pred, oid)]
        tri_cols["subj_id"].append(sid)
        tri_cols["pred"].append(pred)
        tri_cols["obj_id"].append(oid)
        tri_cols["conv_id"].append(e["prov"][0])
        tri_cols["turn_idx"].append(e["prov"][1])
        tri_cols["subj_surface"].append(e["prov"][2])
        tri_cols["obj_surface"].append(e["prov"][3])
        tri_cols["support"].append(e["support"])
    triples = pa.Table.from_pydict(tri_cols, schema=TRIPLES)
    return triples, nodes


def materialized_kg_path(sf_dir: str, seed: int = 42) -> str:
    """Materialize (once, cached) the serial-oracle KG over the synthetic
    transcripts for ``sf_dir``; returns a directory holding
    ``triples.parquet`` / ``nodes.parquet`` / ``mentions.parquet``.

    This promotes the pytest parity oracle (FIXTURES.md F4) to a
    driver-visible artifact: ``queries.oracle_sql_catalog`` points DuckDB at
    these files, so the flagship KG outputs get full row-count + schema +
    value-hash checks instead of rows-only. The oracle is an independent
    single-process execution strategy — plain loops over an in-memory
    table, no Ray — sharing only the rule core (rules.py) with the
    pipeline, so the comparison exercises the distributed machinery
    (reassembly shuffle, windowed pronoun carry, linking blocks,
    distributed canonicalization, triple dedup) end to end.

    Cache key matches synth.transcripts_path: (sf, n_convs, seed), atomic
    rename commit, safe under concurrent callers.
    """
    import glob as _glob
    import os

    import pyarrow.parquet as pq

    from .synth import n_convs_for_sf, sf_of_dir, transcripts_path

    sf = sf_of_dir(sf_dir)
    n_convs = n_convs_for_sf(sf)
    out = f"/tmp/graft_oracle_kg/sf{sf}_n{n_convs}_seed{seed}"
    done = os.path.join(out, "_SUCCESS")
    if os.path.exists(done):
        return out
    src = transcripts_path(sf_dir, seed=seed)
    tbl = pa.concat_tables(
        [pq.read_table(f) for f in sorted(_glob.glob(os.path.join(src, "*.parquet")))]
    )
    mentions = extract_mentions(tbl)
    triples, nodes = build_graph(tbl)
    tmp = out + f".tmp.{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(triples, os.path.join(tmp, "triples.parquet"))
    pq.write_table(nodes, os.path.join(tmp, "nodes.parquet"))
    pq.write_table(mentions, os.path.join(tmp, "mentions.parquet"))
    os.makedirs(os.path.dirname(out), exist_ok=True)
    commit_oracle_dir(tmp, out)
    with open(done, "w") as f:
        f.write("ok")
    return out


def materialized_kg_aux_path(sf_dir: str, seed: int = 42) -> str:
    """Materialize (once, cached) the serial oracles for the
    transcripts-derived auxiliary ops: mined intrinsic pattern-tag
    distributions, mined predicate-gap patterns, and distinct-mention
    embedding norms. Same promotion as materialized_kg_path — plain
    serial loops sharing only the kernels (_token_tags / make_pattern /
    detect_typed_mentions / embed_surface) with the distributed stages,
    so the hash compare exercises the partial-count map_batches, the
    bucketed count aggregation and the distinct-surface groupby."""
    import glob as _glob
    import os

    import pandas as pd
    import pyarrow.parquet as pq

    from .functions.patterns import make_pattern
    from .stages.embed import embed_surface
    from .stages.mining import _token_tags
    from .synth import n_convs_for_sf, sf_of_dir, transcripts_path

    sf = sf_of_dir(sf_dir)
    n_convs = n_convs_for_sf(sf)
    out = f"/tmp/graft_oracle_kg_aux/sf{sf}_n{n_convs}_seed{seed}"
    done = os.path.join(out, "_SUCCESS")
    if os.path.exists(done):
        return out
    src = transcripts_path(sf_dir, seed=seed)
    tbl = pa.concat_tables(
        [pq.read_table(f, columns=["conv_id", "turn_idx", "text"])
         for f in sorted(_glob.glob(os.path.join(src, "*.parquet")))]
    )
    texts = tbl.column("text").to_pylist()

    # intrinsic pattern-tag distributions (stages/mining.py thresholds:
    # support >= 10, share >= 10%, drop {O}-only)
    c: Counter = Counter()
    for text in texts:
        toks, tags = _token_tags(text)
        for t, g in zip(toks, tags):
            c[(make_pattern(t, "0"), g)] += 1
    idf = pd.DataFrame(
        [(p, t, n) for (p, t), n in c.items()], columns=["pattern", "tag", "n"]
    )
    frames = []
    for _p, sub in idf.groupby("pattern", sort=False):
        d = int(sub["n"].sum())
        if d < 10:
            continue
        keep = sub[sub["n"] / d >= 0.1].copy()
        if len(keep) == 1 and keep["tag"].iloc[0] == "O":
            continue
        keep["share_pct"] = (keep["n"] * 100.0 / d).round(1)
        frames.append(keep)
    intr = (
        pd.concat(frames, ignore_index=True)
        if frames
        else pd.DataFrame({"pattern": [], "tag": [], "n": [], "share_pct": []})
    )
    intr["n"] = intr["n"].astype("int64")

    # predicate-gap mining (between-text of consecutive typed mentions,
    # 1..4 gap tokens, support >= 2)
    g: Counter = Counter()
    for text in texts:
        ms = sorted(rules.detect_typed_mentions(text), key=lambda m: m.start)
        for a, b in zip(ms, ms[1:]):
            gap = " ".join(text[a.end : b.start].split()).lower()
            if gap and 1 <= len(gap.split()) <= 4:
                g[(gap, a.etype, b.etype)] += 1
    pred = pd.DataFrame(
        [(k[0], k[1], k[2], n) for k, n in g.items() if n >= 2],
        columns=["gap", "subj_etype", "obj_etype", "n"],
    )
    pred["n"] = pred["n"].astype("int64")

    # distinct-mention embedding norms (S6 projection): distinct
    # (surface, etype) over the serial mentions, norm of the shared
    # deterministic hashed char-n-gram embedding
    mtbl = extract_mentions(tbl)
    seen = sorted(set(zip(mtbl.column("surface").to_pylist(),
                          mtbl.column("etype").to_pylist())))
    import numpy as np

    norms = pd.DataFrame(
        {
            "surface": [s for s, _e in seen],
            "etype": [e for _s, e in seen],
            "norm_mille": [
                int(round(1000 * float(np.linalg.norm(embed_surface(s)))))
                for s, _e in seen
            ],
        }
    )
    norms["norm_mille"] = norms["norm_mille"].astype("int64")

    tmp = out + f".tmp.{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(pa.Table.from_pandas(intr, preserve_index=False),
                   os.path.join(tmp, "intrinsic_patterns.parquet"))
    pq.write_table(pa.Table.from_pandas(pred, preserve_index=False),
                   os.path.join(tmp, "pred_patterns.parquet"))
    pq.write_table(pa.Table.from_pandas(norms, preserve_index=False),
                   os.path.join(tmp, "mention_norms.parquet"))
    os.makedirs(os.path.dirname(out), exist_ok=True)
    commit_oracle_dir(tmp, out)
    with open(done, "w") as f:
        f.write("ok")
    return out


def materialized_kg_graph_path(sf_dir: str, seed: int = 42) -> str:
    """Materialize (once, cached) the serial PageRank oracle over the
    serial-oracle KG triple graph: a plain dict-based integer recurrence
    (no numpy vectorization, no Ray) sharing only the fixed-point
    constants with stages/graph.pagerank, so the hash compare exercises
    the distributed triple build AND the iterative rank dataflow.
    Writes ``pagerank.parquet`` (entity_id, rank) with the usual atomic
    rename commit."""
    import os

    import pyarrow.parquet as pq

    from .stages.graph import PR_UNIT, _pr_step_base
    from .synth import n_convs_for_sf, sf_of_dir

    sf = sf_of_dir(sf_dir)
    n_convs = n_convs_for_sf(sf)
    out = f"/tmp/graft_oracle_kg_graph/sf{sf}_n{n_convs}_seed{seed}"
    done = os.path.join(out, "_SUCCESS")
    if os.path.exists(done):
        return out

    kg_dir = materialized_kg_path(sf_dir, seed=seed)
    tri = pq.read_table(
        os.path.join(kg_dir, "triples.parquet"), columns=["subj_id", "obj_id"]
    )
    edges = sorted(
        set(zip(tri.column("subj_id").to_pylist(),
                tri.column("obj_id").to_pylist()))
    )
    outdeg: dict[int, int] = {}
    nodes: set[int] = set()
    for s, d in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
        nodes.add(s)
        nodes.add(d)
    rank = {n: PR_UNIT for n in nodes}
    base = _pr_step_base(85)
    for _ in range(10):
        acc = {n: 0 for n in nodes}
        for s, d in edges:
            acc[d] += rank[s] // outdeg[s]
        rank = {n: base + (85 * acc[n]) // 100 for n in nodes}
    ordered = sorted(nodes)
    pr = pa.table(
        {
            "entity_id": pa.array(ordered),
            "rank": pa.array([rank[n] for n in ordered], type=pa.int64()),
        }
    )
    tmp = out + f".tmp.{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(pr, os.path.join(tmp, "pagerank.parquet"))
    os.makedirs(os.path.dirname(out), exist_ok=True)
    commit_oracle_dir(tmp, out)
    with open(done, "w") as f:
        f.write("ok")
    return out
