"""Single-process oracles for the documents-table dedup/fingerprint ops.

Companion to oracle.py (the KG parity oracle, SURVEY.md §5): plain serial
programs — dict grouping, union-find, per-doc loops, no Ray — that share
only the kernel definitions (MinHasher, simhash64, band folds, tokens_ws)
with the distributed stages. The comparison therefore exercises the
distributed machinery those stages are built on: the band-explode
map_batches, the hash_aggregate bucket shuffles, the broadcast /
shard-gather signature verification, and connected components.

``materialized_docs_path`` caches the oracle outputs as parquet so
``queries.oracle_sql_catalog`` can point DuckDB at them — turning
dedup_minhash_docs / dedup_simhash_docs / doc_fingerprints from rows-only
driver checks into full row-count + schema + value-hash entries
(VERDICT r2 "what's missing" #5).
"""

from __future__ import annotations

import hashlib
import os
from collections import defaultdict

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .stages.dedup import BUCKET_PAIR_CAP, MinHasher, _band_hashes, simhash64
from .stages.text import tokens_ws


class _UnionFind:
    def __init__(self):
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        p = self.parent.setdefault(x, x)
        while p != x:
            self.parent[x] = p = self.parent[p]
            x = p
            p = self.parent[x]
        return x

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # root at the smaller id so labels are min-of-component
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            self.parent[hi] = lo


def _bucket_pairs(bucket_ids: list[int], cap: int = BUCKET_PAIR_CAP):
    """Candidate pairs for one LSH bucket under the engine's bucket
    semantics: all pairs below the cap, star-to-minimum above it
    (stages/dedup.candidate_pairs_from_bands)."""
    ids = sorted(set(bucket_ids))
    if len(ids) <= 1:
        return
    if len(ids) > cap:
        m = ids[0]
        for i in ids[1:]:
            yield (m, i)
    else:
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                yield (ids[x], ids[y])


def serial_minhash_clusters(
    doc_ids: list[int],
    texts: list[str],
    *,
    num_perm: int = 64,
    bands: int = 16,
    ngram: int = 3,
    seed: int = 7,
    verify_threshold: float = 0.7,
) -> "pa.Table":
    """MinHash-LSH near-dup clusters, serially: signatures -> dict banding
    -> capped bucket pairs -> estimated-Jaccard verify -> union-find.
    Returns (node:int64, label:int64), label = min doc id of component —
    the exact contract of stages.dedup.minhash_clusters."""
    mh = MinHasher(num_perm, ngram, seed)
    sig = mh.signature_batch(list(texts))  # (D, P) uint64
    bh = _band_hashes(sig, bands)  # (D, bands) int64
    idx_of = {int(d): i for i, d in enumerate(doc_ids)}
    buckets: dict[tuple[int, int], list[int]] = defaultdict(list)
    for i, d in enumerate(doc_ids):
        for b in range(bands):
            buckets[(b, int(bh[i, b]))].append(int(d))
    seen: set[tuple[int, int]] = set()
    uf = _UnionFind()
    nodes: set[int] = set()
    for key in sorted(buckets):
        for a, bid in _bucket_pairs(buckets[key]):
            if (a, bid) in seen:
                continue
            seen.add((a, bid))
            est = float(np.mean(sig[idx_of[a]] == sig[idx_of[bid]]))
            if est >= verify_threshold:
                uf.union(a, bid)
                nodes.add(a)
                nodes.add(bid)
    out_nodes = sorted(nodes)
    labels = [uf.find(n) for n in out_nodes]
    return pa.table(
        {
            "node": pa.array(out_nodes, type=pa.int64()),
            "label": pa.array(labels, type=pa.int64()),
        }
    )


def serial_simhash_pairs(
    doc_ids: list[int], texts: list[str], *, max_hamming: int = 3
) -> "pa.Table":
    """SimHash near-dup pairs, serially: 4 x 16-bit pigeonhole banding with
    the engine's bucket cap, hamming verify, (src < dst) dedup — the exact
    contract of stages.dedup.simhash_dup_pairs."""
    sims = {int(d): simhash64(t) for d, t in zip(doc_ids, texts)}
    buckets: dict[tuple[int, int], list[int]] = defaultdict(list)
    for d, s in sims.items():
        for b in range(4):
            buckets[(b, (s >> (16 * b)) & 0xFFFF)].append(d)
    pairs: set[tuple[int, int]] = set()
    for key in sorted(buckets):
        ids = sorted(set(buckets[key]))
        if len(ids) <= 1:
            continue
        if len(ids) > BUCKET_PAIR_CAP:
            cand = [(ids[0], i) for i in ids[1:]]
        else:
            cand = [
                (ids[x], ids[y])
                for x in range(len(ids))
                for y in range(x + 1, len(ids))
            ]
        for a, bid in cand:
            ham = bin((sims[a] ^ sims[bid]) & ((1 << 64) - 1)).count("1")
            if ham <= max_hamming:
                pairs.add((a, bid))
    src_dst = sorted(pairs)
    return pa.table(
        {
            "src": pa.array([p[0] for p in src_dst], type=pa.int64()),
            "dst": pa.array([p[1] for p in src_dst], type=pa.int64()),
        }
    )


def serial_delta_pairs(doc_ids: list[int], texts: list[str], *,
                       split_mod: int = 10, threshold: float = 0.9,
                       bands: int = 16, cap: int = 256) -> "pa.Table":
    """Incremental-dedup oracle, serially: docs with id % split_mod == 0
    are the DELTA, the rest the indexed corpus. Candidates = any shared
    band hash, capped at the first ``cap`` ascending delta ids per
    (corpus row, band) — the exact contract of
    stages.dedup.minhash_dups_against_index over an index built with the
    default parameters; est = signature-component match fraction
    (a dyadic rational, so the float compares exactly)."""
    from collections import defaultdict

    from .stages.dedup import MinHasher, _band_hashes

    ids = np.asarray(doc_ids, dtype=np.int64)
    mh = MinHasher(64, 3, 7)
    sig = mh.signature_batch(list(texts))
    bh = _band_hashes(sig, bands)
    is_delta = (ids % split_mod) == 0
    new_idx = np.nonzero(is_delta)[0]
    old_idx = np.nonzero(~is_delta)[0]
    id_row = {int(ids[i]): i for i in range(len(ids))}
    cands: set[tuple[int, int]] = set()
    for b in range(bands):
        by_hash: dict[int, list[int]] = defaultdict(list)
        for i in new_idx:
            by_hash[int(bh[i, b])].append(int(ids[i]))
        for h in by_hash:
            by_hash[h].sort()
        for j in old_idx:
            lst = by_hash.get(int(bh[j, b]))
            if lst:
                for nid in lst[:cap]:
                    cands.add((nid, int(ids[j])))
    rows = []
    for nid, oid in sorted(cands):
        est = float((sig[id_row[nid]] == sig[id_row[oid]]).mean())
        if est >= threshold:
            rows.append((nid, oid, est))
    return pa.table({
        "new_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "old_id": pa.array([r[1] for r in rows], type=pa.int64()),
        "est": pa.array([r[2] for r in rows], type=pa.float64()),
    })



def serial_fingerprints(doc_ids: list[int], texts: list[str], *, ngram: int = 3) -> "pa.Table":
    """Order-insensitive XOR-of-shingle-hash fingerprints, per-doc serial —
    the contract of stages.text.add_fingerprint."""
    fps = []
    for t in texts:
        toks = tokens_ws(t)
        fp = 0
        for i in range(max(0, len(toks) - ngram + 1)):
            sh = " ".join(toks[i : i + ngram])
            fp ^= int.from_bytes(
                hashlib.blake2b(sh.encode(), digest_size=8).digest(), "big"
            )
        fps.append(fp - (1 << 63))
    return pa.table(
        {
            "doc_id": pa.array([int(d) for d in doc_ids], type=pa.int64()),
            "fingerprint": pa.array(fps, type=pa.int64()),
        }
    )


def serial_cosine_lsh_pairs(
    vec_ids: list[int],
    vecs: np.ndarray,
    *,
    threshold: float,
    num_planes: int = 4,
    num_tables: int = 8,
    seed: int = 11,
) -> "pa.Table":
    """Hyperplane-LSH cosine near-dup pairs, serially: the same seeded
    plane matrix, per-table bucketing, the engine's duplicate-heavy-bucket
    star rule (> 4*BUCKET_PAIR_CAP), cosine verify, (src < dst) dedup —
    the contract of stages.dedup.cosine_dup_pairs(lsh=True)."""
    rng = np.random.RandomState(seed)
    dim = vecs.shape[1]
    planes = rng.randn(num_tables, num_planes, dim)
    buckets: dict[int, list[int]] = defaultdict(list)  # key -> row indices
    for t in range(num_tables):
        bits = (vecs @ planes[t].T) > 0
        bucket = bits @ (1 << np.arange(num_planes, dtype=np.int64))
        for row, b in enumerate(bucket):
            buckets[int(b) * num_tables + t].append(row)
    ids_arr = np.asarray(vec_ids, dtype=np.int64)
    pairs: set[tuple[int, int]] = set()
    for key in sorted(buckets):
        rows = buckets[key]
        if len(rows) <= 1:
            continue
        order = np.argsort(ids_arr[rows])
        ids_l = ids_arr[rows][order]
        sub = vecs[rows][order]
        n = np.linalg.norm(sub, axis=1)
        n[n == 0] = 1.0
        vn = sub / n[:, None]
        if len(ids_l) > BUCKET_PAIR_CAP * 4:
            sims0 = vn[1:] @ vn[0]
            for j in np.nonzero(sims0 >= threshold)[0]:
                if ids_l[0] != ids_l[j + 1]:
                    pairs.add((int(ids_l[0]), int(ids_l[j + 1])))
        else:
            sims = vn @ vn.T
            for x in range(len(ids_l)):
                for y in range(x + 1, len(ids_l)):
                    if sims[x, y] >= threshold and ids_l[x] != ids_l[y]:
                        a, b = sorted((int(ids_l[x]), int(ids_l[y])))
                        pairs.add((a, b))
    src_dst = sorted(pairs)
    return pa.table(
        {
            "src": pa.array([p[0] for p in src_dst], type=pa.int64()),
            "dst": pa.array([p[1] for p in src_dst], type=pa.int64()),
        }
    )


def materialized_docs_path(sf_dir: str) -> str:
    """Materialize (once, cached) the serial documents/embeddings-table
    oracles for ``sf_dir``; returns a directory holding
    ``minhash_clusters.parquet`` (verify_threshold=0.9, the
    dedup_minhash_docs setting), ``simhash_pairs.parquet``
    (max_hamming=3), ``fingerprints.parquet`` and
    ``cosine_lsh_pairs.parquet`` (the dedup_cosine_lsh_docs setting:
    threshold=queries.COSINE_PAIR_THRESHOLD, 4 planes x 8 tables).
    Atomic rename commit, safe under concurrent callers."""
    docs = os.path.join(sf_dir, "documents.parquet")
    name = os.path.basename(os.path.normpath(sf_dir))
    # _v3: SimHash token hash moved from per-string blake2b to the shared
    # vectorized _hash_strings kernel, changing near-dup (hamming>0) pairs.
    # _v4: adds delta_pairs.parquet (incremental-dedup oracle).
    out = f"/tmp/graft_oracle_docs/{name}_v4"
    done = os.path.join(out, "_SUCCESS")
    if os.path.exists(done):
        return out
    tbl = pq.read_table(docs, columns=["doc_id", "text"])
    ids = [int(x) for x in tbl.column("doc_id").to_pylist()]
    texts = tbl.column("text").to_pylist()
    tmp = out + f".tmp.{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    clusters = serial_minhash_clusters(ids, texts, verify_threshold=0.9)
    clusters = clusters.rename_columns(["doc_id", "cluster_rep"])
    pq.write_table(clusters, os.path.join(tmp, "minhash_clusters.parquet"))
    pq.write_table(
        serial_simhash_pairs(ids, texts), os.path.join(tmp, "simhash_pairs.parquet")
    )
    pq.write_table(
        serial_fingerprints(ids, texts), os.path.join(tmp, "fingerprints.parquet")
    )
    pq.write_table(
        serial_delta_pairs(ids, texts), os.path.join(tmp, "delta_pairs.parquet")
    )
    from .queries import COSINE_PAIR_THRESHOLD

    etbl = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    vec_ids = [int(x) for x in etbl.column("vec_id").to_pylist()]
    vmat = np.array(etbl.column("embedding").to_pylist(), dtype=np.float64)
    pq.write_table(
        serial_cosine_lsh_pairs(vec_ids, vmat, threshold=COSINE_PAIR_THRESHOLD),
        os.path.join(tmp, "cosine_lsh_pairs.parquet"),
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    from .oracle import commit_oracle_dir

    commit_oracle_dir(tmp, out)
    with open(done, "w") as f:
        f.write("ok")
    return out
