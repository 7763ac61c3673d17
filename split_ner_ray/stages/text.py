"""Text-analysis operators over document tables: token counting, quality
scoring, language-ID, orthographic pattern stats, fingerprinting.

These are the large-scale training-data-pipeline ops the engine adds beyond
the reference's inventory (driver instructions), built on the same pattern
kernels as the detector (functions/patterns.py). Every op is a stateless
vectorized map_batches or a partial+final aggregate; all thresholds are
integers so the DuckDB oracles compare exactly (no float hashing).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.patterns import pattern_type2
# module-level: _window_hashes runs INSIDE worker batches, and a
# function-body relative import fails under cloudpickle by-value
# serialization (non-repo-cwd drivers, where workers can't import the
# package by path)
from .dedup import _hash_strings, _ranges

_WS = re.compile(r"\s+")
_PUNCT = re.compile(r"[^\w\s]", re.A)
_UPPER = re.compile(r"[A-Z]")
_DIGIT = re.compile(r"[0-9]")

# marker-word sets for the deterministic language-ID heuristic; over real
# corpora these are per-language stopwords — the rule (argmax of marker
# hits, ties by fixed language order) is the operator contract
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "value", "row"),
    "de": ("der", "die", "und", "table"),
    "fr": ("le", "la", "et", "join"),
    "es": ("el", "los", "y", "query"),
}
LANG_ORDER = ["en", "de", "fr", "es", "und"]  # 'und' = undetermined

STOPWORDS = ("the", "a", "and", "of", "to", "in")


def tokens_ws(text: str) -> list[str]:
    """Whitespace tokens of trimmed text ('' -> []) — deliberately the
    simplest splitter so the SQL oracle (regexp_split_to_array) matches."""
    t = text.strip()
    return _WS.split(t) if t else []


def _token_count_series(s: pd.Series) -> pd.Series:
    """Vectorized ``len(tokens_ws(t))``: whitespace-run count + 1 on the
    trimmed string, 0 for all-whitespace/empty (one C pass, no row loop)."""
    stripped = s.str.strip()
    n = stripped.str.count(_WS) + 1
    return n.where(stripped.str.len() > 0, 0).astype("int64")


def _whole_token_re(words: tuple[str, ...]) -> re.Pattern:
    """Case-insensitive whole-whitespace-token alternation: matches a
    maximal non-whitespace run exactly equal (ASCII-casefolded) to one of
    ``words`` — the vectorized equivalent of ``w.lower() in words`` over
    ``tokens_ws``. re.A keeps IGNORECASE ASCII-only, mirroring
    ``str.lower`` on the ASCII marker/stopword sets."""
    alt = "|".join(re.escape(w) for w in sorted(words, key=len, reverse=True))
    return re.compile(rf"(?<!\S)(?:{alt})(?!\S)", re.I | re.A)


_STOPWORD_RE = _whole_token_re(STOPWORDS)
_LANG_MARKER_RE = {lang: _whole_token_re(ws) for lang, ws in LANG_MARKERS.items()}


def add_token_counts(ds, text_col: str = "text"):
    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["n_tokens"] = _token_count_series(batch[text_col])
        return batch

    return ds.map_batches(fn, batch_format="pandas")


def add_quality_stats(ds, text_col: str = "text"):
    """Integer quality features: n_chars, n_punct, n_upper, n_digit,
    n_stopwords, n_tokens + is_quality flag (all-integer thresholds).

    First full-corpus pass of the curation pipeline, so every counter is a
    pandas ``str``-accessor C-loop (str.len / str.count with compiled
    regexes) — no Python row iteration."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        s = batch[text_col]
        batch["n_chars"] = s.str.len().astype("int64")
        batch["n_punct"] = s.str.count(_PUNCT).astype("int64")
        batch["n_upper"] = s.str.count(_UPPER).astype("int64")
        batch["n_digit"] = s.str.count(_DIGIT).astype("int64")
        batch["n_tokens"] = _token_count_series(s)
        batch["n_stopwords"] = s.str.count(_STOPWORD_RE).astype("int64")
        # quality: >=10 tokens and punctuation below 20% of chars (integer math)
        batch["is_quality"] = (
            (batch["n_tokens"].to_numpy() >= 10)
            & (5 * batch["n_punct"].to_numpy() <= batch["n_chars"].to_numpy())
        ).astype("int64")
        return batch

    return ds.map_batches(fn, batch_format="pandas")


def add_langid(ds, text_col: str = "text", out_col: str = "lang_pred"):
    """Deterministic language-ID: argmax of marker-word hits, ties broken
    by LANG_ORDER; no hits -> 'und'. One compiled whole-token str.count
    pass per language, then a single argmax over the count matrix."""

    langs = LANG_ORDER[:-1]

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        s = batch[text_col]
        counts = np.stack(
            [s.str.count(_LANG_MARKER_RE[lang]).to_numpy() for lang in langs]
        )
        # argmax returns the FIRST max -> LANG_ORDER tie-break for free;
        # strictly-positive requirement maps all-zero rows to 'und'
        best = counts.argmax(axis=0)
        preds = np.array(langs, dtype=object)[best]
        preds[counts.max(axis=0) == 0] = "und"
        batch[out_col] = preds
        return batch

    return ds.map_batches(fn, batch_format="pandas")


def pattern_counts(ds, text_col: str = "text", top_k: int = 20):
    """Global orthographic-pattern histogram (op M1 as a corpus statistic):
    whitespace tokens -> pattern_type2 -> partial counts per batch -> one
    small groupby -> top-k by (count desc, pattern)."""
    from collections import Counter

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            for w in tokens_ws(t):
                c[pattern_type2(w)] += 1
        return pa.Table.from_pydict(
            {"pattern": list(c.keys()), "n": [int(v) for v in c.values()]},
            schema=pa.schema([("pattern", pa.string()), ("n", pa.int64())]),
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = parts.groupby("pattern").aggregate(Sum("n", alias_name="n"))
    from .relational import topk

    return topk(agg, [("n", True), ("pattern", False)], top_k)


def add_fingerprint(ds, text_col: str = "text", ngram: int = 3,
                    out_col: str = "fingerprint"):
    """Document fingerprint: order-insensitive 64-bit XOR of word n-gram
    hashes (rolling-hash analog); near-identical token streams collide."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        fps = []
        for t in batch[text_col]:
            toks = tokens_ws(t)
            fp = 0
            for i in range(max(0, len(toks) - ngram + 1)):
                sh = " ".join(toks[i : i + ngram])
                fp ^= int.from_bytes(
                    hashlib.blake2b(sh.encode(), digest_size=8).digest(), "big"
                )
            fps.append(fp - (1 << 63))  # signed int64 range
        batch[out_col] = pd.array(fps, dtype="int64")
        return batch

    return ds.map_batches(fn, batch_format="pandas")


def _window_hashes(texts: list[str], ngram: int):
    """Per-doc token n-gram window hashes, fully vectorized: ONE batched
    token-hash call (dedup._hash_strings), window values combined from
    shifted views with a polynomial mix, windows never crossing doc
    boundaries. Returns (mix uint64 per window, win_doc int64 per window,
    n_windows int64 per doc). Window identity is the 64-bit mix — two
    distinct n-grams colliding within one doc (odds ~n^2/2^64) would
    undercount a distinct count by one; accepted and documented where
    used."""
    tok_lists = [t.split() for t in texts]
    tok_counts = np.array([len(t) for t in tok_lists], dtype=np.int64)
    n_win = np.maximum(tok_counts - ngram + 1, 0)
    total = int(n_win.sum())
    if total == 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64), n_win
    th = _hash_strings([w for toks in tok_lists for w in toks])
    starts_of_doc = np.cumsum(tok_counts) - tok_counts
    win_doc = np.repeat(np.arange(len(texts), dtype=np.int64), n_win)
    win_start = _ranges(n_win) + np.repeat(starts_of_doc, n_win)
    a = np.uint64(0x9E3779B97F4A7C15)
    mix = th[win_start] * a
    for j in range(1, ngram):
        mix = (mix + th[win_start + j]) * a
    return mix, win_doc, n_win


def _distinct_per_doc(mix: np.ndarray, win_doc: np.ndarray, n_docs: int) -> np.ndarray:
    """Distinct window count per doc: one lexsort + run-boundary scan."""
    if len(mix) == 0:
        return np.zeros(n_docs, dtype=np.int64)
    order = np.lexsort((mix, win_doc))
    wd, mx = win_doc[order], mix[order]
    new = np.ones(len(wd), dtype=bool)
    new[1:] = (wd[1:] != wd[:-1]) | (mx[1:] != mx[:-1])
    return np.bincount(wd[new], minlength=n_docs).astype(np.int64)


def add_repetition_stats(ds, text_col: str = "text", *, ngram: int = 3):
    """Gopher-style within-document repetition signal: adds
    ``rep_ngrams`` (token n-gram window count, max(0, T-n+1)) and
    ``rep_distinct`` (distinct windows) — the duplicate-n-gram fraction
    quality filters threshold on is (rep_ngrams - rep_distinct) /
    rep_ngrams. Integer columns, exactly SQL-checkable (the oracle counts
    DISTINCT space-joined n-gram strings; join-injectivity holds because
    tokens contain no spaces)."""

    def stats(b: pd.DataFrame) -> pd.DataFrame:
        texts = list(b[text_col])
        mix, win_doc, n_win = _window_hashes(texts, ngram)
        out = b.copy()
        out["rep_ngrams"] = n_win
        out["rep_distinct"] = _distinct_per_doc(mix, win_doc, len(texts))
        return out

    return ds.map_batches(stats, batch_format="pandas")


def flag_contaminated(ds, bench_shingles, *, text_col: str = "text",
                      ngram: int = 3, min_overlap: int = 1):
    """Benchmark-contamination flagging (the pre-training hygiene pass):
    each document is scored by how many DISTINCT token n-grams it shares
    with a benchmark shingle set. ``bench_shingles``: an iterable of
    space-joined n-gram strings (the benchmark side is eval-set-sized —
    ray.put once, hashed once per worker, NEVER shuffled; the corpus
    streams through one map_batches). Adds ``contam_ngrams`` (distinct
    doc windows), ``contam_overlap`` (distinct windows also in the
    benchmark set) and ``contaminated`` (overlap >= min_overlap).
    Same 64-bit window-identity note as add_repetition_stats."""
    import ray

    def shingle_hash(strs: list[str]) -> np.ndarray:
        a = np.uint64(0x9E3779B97F4A7C15)
        out = None
        tok_lists = [s.split() for s in strs]
        th = _hash_strings([w for toks in tok_lists for w in toks])
        # benchmark shingles are exactly ngram tokens wide
        th = th.reshape(-1, ngram)
        out = th[:, 0] * a
        for j in range(1, ngram):
            out = (out + th[:, j]) * a
        return out

    bench = [s for s in bench_shingles if len(s.split()) == ngram]
    bref = ray.put(np.unique(shingle_hash(bench)) if bench
                   else np.empty(0, np.uint64))

    def flag(b: pd.DataFrame) -> pd.DataFrame:
        bh = ray.get(bref)
        texts = list(b[text_col])
        mix, win_doc, _ = _window_hashes(texts, ngram)
        out = b.copy()
        if len(mix) == 0:
            out["contam_ngrams"] = np.zeros(len(texts), dtype=np.int64)
            out["contam_overlap"] = np.zeros(len(texts), dtype=np.int64)
        else:
            # distinct windows once, then one sorted-membership test
            order = np.lexsort((mix, win_doc))
            wd, mx = win_doc[order], mix[order]
            new = np.ones(len(wd), dtype=bool)
            new[1:] = (wd[1:] != wd[:-1]) | (mx[1:] != mx[:-1])
            wd, mx = wd[new], mx[new]
            out["contam_ngrams"] = np.bincount(
                wd, minlength=len(texts)).astype(np.int64)
            hit = np.isin(mx, bh)
            out["contam_overlap"] = np.bincount(
                wd[hit], minlength=len(texts)).astype(np.int64)
        out["contaminated"] = (
            out["contam_overlap"] >= min_overlap).astype("int64")
        return out

    return ds.map_batches(flag, batch_format="pandas")


def tfidf_topk(ds, *, id_col: str = "doc_id", text_col: str = "text",
               k: int = 3, num_buckets: int = 64, broadcast_df: bool = True):
    """Per-document top-k TF-IDF terms, exact-integer checkable.

    Shape (3 passes over token rows, no global sort):
    1. TF: each input row is one whole document, so a per-batch
       lowercase-split + explode + groupby((id, tok)) count is globally
       correct with NO shuffle.
    2. DF: one bucketed hash_aggregate over the (id, tok) rows counts
       documents per token. The result is VOCABULARY-sized; by default it
       is driver-collected and broadcast (ray.put once, worker-cached)
       onto the TF rows — at a vocabulary too large to broadcast, pass
       broadcast_df=False for a partitioned join on tok instead.
    3. One bucketed pass on id co-locates each document's scored terms
       and fuses top-k + rank assignment (vectorized over every doc in
       the bucket).

    Ranking key is the ratio tf/df as an IEEE double of two int64s —
    bit-identical in any engine, so the DuckDB oracle can reproduce the
    ordering exactly — with the token string as tie-break. Output rows
    (id, rank, tok, tf, df) are all integers/strings: no float hashing.
    """
    from .relational import broadcast_join, hash_aggregate, partitioned_join

    def tf_rows(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].str.lower().str.split()
        # positional construction (np.repeat + dropna'd explode), NOT
        # index-aligned Series: an empty-text doc explodes to a NaN row
        # with no id partner, and pandas alignment then reindexes over
        # duplicate labels and raises
        lens = toks.str.len().fillna(0).astype(int).to_numpy()
        e = pd.DataFrame({
            id_col: np.repeat(batch[id_col].to_numpy(), lens),
            "tok": toks.explode().dropna().to_numpy(dtype=object),
        })
        out = e.groupby([id_col, "tok"], as_index=False, sort=False).size()
        return out.rename(columns={"size": "tf"}).astype({"tf": "int64"})

    tf = ds.map_batches(tf_rows, batch_format="pandas")

    def df_agg(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("tok", as_index=False).size()
        return out.rename(columns={"size": "df"}).astype({"df": "int64"})

    # each (id, tok) pair appears exactly once in tf, so a row count per
    # tok IS the document frequency
    df_ds = hash_aggregate(tf.select_columns(["tok"]), ["tok"], df_agg,
                           num_buckets=num_buckets)

    if broadcast_df:
        scored = broadcast_join(tf, df_ds.to_pandas(), ["tok"])
    else:
        scored = partitioned_join(tf, df_ds, ["tok"], num_buckets=num_buckets)

    def per_doc(g: pd.DataFrame) -> pd.DataFrame:
        g = g.assign(
            __s=g["tf"].to_numpy(dtype="float64") / g["df"].to_numpy(dtype="float64")
        )
        g = g.sort_values([id_col, "__s", "tok"], ascending=[True, False, True],
                          kind="mergesort")
        g = g.groupby(id_col, sort=False).head(k)
        g = g.assign(rank=(g.groupby(id_col, sort=False).cumcount() + 1).astype("int64"))
        return g[[id_col, "rank", "tok", "tf", "df"]]

    return hash_aggregate(scored, [id_col], per_doc, num_buckets=num_buckets)


# GPT-2-style pretokenizer shape, restricted to ASCII classes so Python
# re and DuckDB's RE2 (regexp_extract_all) agree exactly: a leading
# optional space glued to a letter-run / digit-run / punct-run. The
# branches have disjoint first characters, so leftmost-first (re) and
# any alternation order RE2 picks yield the same match set.
_BPE_RE = re.compile(r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+", re.A)
BPE_PATTERN_SQL = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+"


def add_bpe_token_counts(ds, text_col: str = "text",
                         out_col: str = "n_bpe_tokens"):
    """BPE-ish subword-piece counts (the driver brief's 'whitespace + a
    BPE-ish regex' token-counting op; whitespace counting is
    add_token_counts). One compiled-regex findall per doc, vectorized by
    batch via pandas str.count."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch[out_col] = (
            batch[text_col].str.count(_BPE_RE).fillna(0).astype("int64")
        )
        return batch

    return ds.map_batches(fn, batch_format="pandas")


# ---------------------------------------------------------------------------
# unigram-LM quality scoring (CCNet-style: score each doc by corpus LM)
# ---------------------------------------------------------------------------

LM_QUANT = 1_000_000


def unigram_lm_scores(ds, *, id_col: str = "doc_id", text_col: str = "text",
                      quant: int = LM_QUANT, num_buckets: int = 64,
                      broadcast_counts: bool = True):
    """Per-document unigram language-model score — the CCNet-style
    curation signal (KenLM perplexity's shuffle-shape without the model
    dependency): train unigram counts over the corpus, score each doc by
    its tokens' log-probabilities.

    Shape: pass 1 counts tokens with per-batch value_counts partials +
    ONE bucketed aggregate — the result is VOCABULARY-sized and
    broadcast by default (ray.put once, worker-cached); pass 2 maps each
    batch's exploded tokens through the count table and reduces per doc
    with NO shuffle (each input row is one whole doc). At a vocabulary
    too large to broadcast, ``broadcast_counts=False`` joins exploded
    token rows against the count table on tok (partitioned join) and
    reduces per doc in one id-bucketed aggregate.

    Scores are INTEGER-quantized so the result is hash-exact vs SQL:
    lm_q = sum over tokens of floor(quant * ln(c_tok / N)). Output rows
    (id, n_tokens, lm_q); zero-token docs are excluded (same contract as
    the SQL oracle's join). More-negative lm_q per token = rarer tokens;
    consumers divide by n_tokens for a length-normalized quality score.
    """
    import ray

    from .relational import hash_aggregate, partitioned_join

    def tok_counts(batch: pd.DataFrame) -> pd.DataFrame:
        vc = batch[text_col].str.split().explode().dropna().value_counts()
        return pd.DataFrame({"tok": vc.index.to_numpy(dtype=object),
                             "c": vc.to_numpy().astype("int64")})

    def merge_counts(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("tok", as_index=False)["c"].sum()
        return out.astype({"c": "int64"})

    counts_ds = hash_aggregate(
        ds.map_batches(tok_counts, batch_format="pandas"), ["tok"],
        merge_counts, num_buckets=num_buckets).materialize()
    total = int(counts_ds.sum("c") or 0)

    def explode_rows(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].str.split()
        lens = toks.str.len().fillna(0).astype(int).to_numpy()
        return pd.DataFrame({
            id_col: np.repeat(batch[id_col].to_numpy(), lens),
            "tok": toks.explode().dropna().to_numpy(dtype=object),
        })

    if broadcast_counts:
        cdf = counts_ds.to_pandas()
        cnt_ref = ray.put(dict(zip(cdf["tok"], cdf["c"].astype(int))))

        def score(batch: pd.DataFrame) -> pd.DataFrame:
            cnt = ray.get(cnt_ref)
            e = explode_rows(batch)
            if not len(e):
                return pd.DataFrame({id_col: pd.array([], dtype="int64"),
                                     "n_tokens": pd.array([], dtype="int64"),
                                     "lm_q": pd.array([], dtype="int64")})
            c = e["tok"].map(cnt).to_numpy(dtype="float64")
            q = np.floor(quant * np.log(c / total)).astype("int64")
            g = pd.DataFrame({id_col: e[id_col], "q": q}).groupby(
                id_col, as_index=False).agg(n_tokens=("q", "size"),
                                            lm_q=("q", "sum"))
            return g.astype({"n_tokens": "int64", "lm_q": "int64"})

        return ds.map_batches(score, batch_format="pandas")

    # distributed fallback: join exploded rows to counts on tok, then one
    # id-bucketed reduce — nothing driver-sized
    rows = ds.map_batches(explode_rows, batch_format="pandas")
    joined = partitioned_join(rows, counts_ds, ["tok"],
                              num_buckets=num_buckets)

    def per_doc(g: pd.DataFrame) -> pd.DataFrame:
        q = np.floor(quant * np.log(
            g["c"].to_numpy(dtype="float64") / total)).astype("int64")
        out = pd.DataFrame({id_col: g[id_col], "q": q}).groupby(
            id_col, as_index=False).agg(n_tokens=("q", "size"),
                                        lm_q=("q", "sum"))
        return out.astype({"n_tokens": "int64", "lm_q": "int64"})

    return hash_aggregate(joined, [id_col], per_doc, num_buckets=num_buckets)


# ---------------------------------------------------------------------------
# PII redaction (curation scrub pass)
# ---------------------------------------------------------------------------

# ASCII-only patterns shared VERBATIM with the DuckDB oracle (RE2), same
# discipline as BPE_PATTERN_SQL: \b is an ASCII word boundary in both
# engines (re.A), classes are explicit. Replacement is sequential in
# tuple order; counts are measured on the ORIGINAL text (both sides).
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9_.+-]+@[A-Za-z0-9-]+\.[A-Za-z0-9.-]+", "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+[0-9][0-9 ()-]{6,}[0-9]", "<PHONE>"),
)


def redact_pii(ds, text_col: str = "text"):
    """Scrub emails / IPv4s / +intl phone numbers from ``text_col`` —
    the pre-training privacy pass. Vectorized: one compiled-regex
    str.count per pattern for the per-doc counts (on the original text)
    and chained str.replace for the rewrite; no per-row Python loop.
    Adds n_email / n_ipv4 / n_phone and rewrites the text in place."""
    pats = [(name, re.compile(pat, re.A), sub) for name, pat, sub in PII_PATTERNS]

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        s = batch[text_col]
        for name, rx, _sub in pats:
            batch[f"n_{name}"] = s.str.count(rx).fillna(0).astype("int64")
        red = s
        for _name, rx, sub in pats:
            red = red.str.replace(rx, sub, regex=True)
        batch[text_col] = red
        return batch

    return ds.map_batches(fn, batch_format="pandas")


# ---------------------------------------------------------------------------
# BM25 lexical top-k search (the keyword-retrieval complement to
# stages/ann's embedding similarity search)
# ---------------------------------------------------------------------------

def bm25_topk(ds, queries, *, id_col: str = "doc_id", text_col: str = "text",
              k: int = 5, k1: float = 1.2, b: float = 0.75,
              quant: int = 1_000_000, num_buckets: int = 32):
    """Top-k documents per keyword query by BM25 — the lexical retrieval
    op a training-data pipeline runs next to embedding ANN (benchmark
    decontamination lookups, eval-set retrieval, boolean-ish corpus
    probes). ``queries`` is [(qid, query_text)].

    Shape: pass 1 computes the corpus stats BM25 needs — N, total token
    count (for avgdl as the exact rational T/N), and document frequency
    for QUERY terms only (the partial table is query-vocabulary-sized,
    never corpus-sized) — as per-batch partials with one tiny driver
    merge. Pass 2 rescans the corpus once: each input row is a whole
    doc, so per-(doc, query) scores need NO shuffle; only docs matching
    >=1 query term emit rows, and ONE bucketed grouped_topk per qid
    finishes (tie-break: score desc, doc_id asc).

    Scores are INTEGER-quantized PER TERM — floor(quant * term_score)
    with idf = ln((N - df + 0.5)/(df + 0.5)) — then summed as integers
    per (doc, query): associative, so hash-exact vs the SQL oracle
    whatever order either engine sums in; ranking uses the integer
    score. Query terms are treated as a set (duplicate terms in a query
    count once)."""
    from .relational import grouped_topk

    import ray

    qtoks = {int(qid): qt.lower().split() for qid, qt in queries}
    qterms = sorted({t for ts in qtoks.values() for t in ts})

    def stats(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].str.lower().str.split()
        lens = toks.str.len().fillna(0).astype(int).to_numpy()
        e = pd.DataFrame({
            "doc": np.repeat(batch[id_col].to_numpy(), lens),
            "tok": toks.explode().dropna().to_numpy(dtype=object),
        })
        dfp = (e[e["tok"].isin(qterms)].drop_duplicates()
               .groupby("tok", as_index=False).size())
        out = pd.DataFrame({"tok": dfp["tok"],
                            "df": dfp["size"].astype("int64")})
        out.loc[len(out)] = ["__N__", int(len(batch))]
        out.loc[len(out)] = ["__T__", int(lens.sum())]
        return out

    parts = ds.map_batches(stats, batch_format="pandas").to_pandas()
    tot = parts.groupby("tok")["df"].sum()
    n_docs = int(tot.pop("__N__"))
    n_toks = int(tot.pop("__T__"))
    df_map = {t: int(c) for t, c in tot.items()}
    const_ref = ray.put((df_map, n_docs, n_toks))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        df_map, n_docs, n_toks = ray.get(const_ref)
        toks = batch[text_col].str.lower().str.split()
        lens = toks.str.len().fillna(0).astype(int).to_numpy()
        e = pd.DataFrame({
            id_col: np.repeat(batch[id_col].to_numpy(), lens),
            "dl": np.repeat(lens, lens),
            "tok": toks.explode().dropna().to_numpy(dtype=object),
        })
        e = e[e["tok"].isin(df_map)]
        if not len(e):
            return pd.DataFrame({"qid": pd.array([], dtype="int64"),
                                 id_col: pd.array([], dtype="int64"),
                                 "score_q": pd.array([], dtype="int64")})
        tf = e.groupby([id_col, "dl", "tok"], as_index=False).size()
        frames = []
        for qid, terms in qtoks.items():
            m = tf[tf["tok"].isin(terms)]
            if not len(m):
                continue
            tfv = m["size"].to_numpy(dtype="float64")
            dl = m["dl"].to_numpy(dtype="float64")
            dfv = np.array([df_map[t] for t in m["tok"]], dtype="float64")
            idf = np.log((n_docs - dfv + 0.5) / (dfv + 0.5))
            denom = tfv + k1 * (1.0 - b + b * dl * n_docs / n_toks)
            # quantize PER TERM, then sum INTEGERS: a float per-doc sum
            # is reduction-order-dependent and SQL's SUM order is
            # arbitrary (the grouped_vector_sum lesson) — the per-term
            # value is a pure function of (tf, dl, df), identical in
            # both engines
            s_q = np.floor(quant * idf * tfv * (k1 + 1.0) / denom
                           ).astype("int64")
            g = pd.DataFrame({id_col: m[id_col], "s": s_q}).groupby(
                id_col, as_index=False)["s"].sum()
            frames.append(pd.DataFrame({
                "qid": np.full(len(g), qid, dtype=np.int64),
                id_col: g[id_col].to_numpy(),
                "score_q": g["s"].to_numpy(dtype="int64"),
            }))
        if not frames:
            return pd.DataFrame({"qid": pd.array([], dtype="int64"),
                                 id_col: pd.array([], dtype="int64"),
                                 "score_q": pd.array([], dtype="int64")})
        return pd.concat(frames, ignore_index=True)

    scored = ds.map_batches(score, batch_format="pandas")
    top = grouped_topk(scored, ["qid"], [("score_q", True), (id_col, False)],
                       k, num_buckets=num_buckets)

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["qid", "score_q", id_col],
                          ascending=[True, False, True], kind="mergesort")
        g = g.assign(rank=(g.groupby("qid", sort=False).cumcount() + 1)
                     .astype("int64"))
        return g

    return top.map_batches(rank, batch_format="pandas")
