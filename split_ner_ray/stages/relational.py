"""Relational operators: broadcast join, partitioned hash join, top-k.

The reference has no relational joins (its lookups are driver dicts —
SURVEY.md §2.4); these operators are the engine's general-purpose
equivalents, used by the TPC-H-style queries() entries and by linking's
large-canon-map fallback.

Design notes for 100 TB:
- broadcast_join: small side is ray.put ONCE; each actor resolves the ref
  in __init__ and merges per batch (never re-shipped per batch).
- cogroup / partitioned_join: both sides get a bucket column
  (hash(key) % B); one groupby on (bucket) co-locates matching keys. The
  combined per-bucket block is ARROW-NATIVE and side-tagged: a side's
  missing columns are TYPED null arrays, so int/float/binary/list columns
  keep their native Arrow dtype through the shuffle (an NA-padded pandas
  union degrades them to pickled object columns — measured as the dominant
  cost when signature bytes rode a join). B sizes the shuffle granularity;
  salt hot keys upstream if a single key exceeds a bucket's memory.
- topk / grouped_topk: per-batch (per-bucket) local partials, never a
  global sort of the full dataset; grouped_topk handles MANY keys per
  dispatch (no per-group UDF on user-cardinality keys).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _normalize_keys(frame: pd.DataFrame) -> pd.DataFrame:
    """Normalize key-column dtypes before hashing: pd.util.hash_pandas_object
    is dtype-sensitive, so the same logical key at int32 vs int64 (or a
    float-promoted int) would land in different buckets and silently miss
    join matches. Numerics are cast to int64 when lossless else float64;
    everything else to object."""
    out = {}
    for c in frame.columns:
        s = frame[c]
        if pd.api.types.is_integer_dtype(s) or pd.api.types.is_bool_dtype(s):
            out[c] = s.astype("int64")
        elif pd.api.types.is_float_dtype(s):
            f = s.astype("float64")
            try:
                i = f.astype("int64")
                out[c] = i if (i == f).all() else f
            except (ValueError, OverflowError, pd.errors.IntCastingNaNError):
                out[c] = f
        else:
            out[c] = s.astype(object)
    return pd.DataFrame(out)


def _row_hash(batch: pd.DataFrame, keys: list[str]):
    """Deterministic per-row uint64 hash of the key columns. Uses pandas'
    vectorized row hashing (C-speed for numeric/string dtypes) — measured
    >2x faster than string-concatenating keys on million-row batches, and
    stable across worker processes (fixed hash key). Key dtypes are
    normalized first so logically-equal keys hash equally regardless of
    the storage dtype a particular batch arrived with."""
    return pd.util.hash_pandas_object(
        _normalize_keys(batch[keys]), index=False
    ).to_numpy()


def _table_key_hash(tbl: pa.Table, keys: list[str]) -> np.ndarray:
    """_row_hash for an Arrow table: only the KEY columns are converted to
    pandas (cheap relative to the payload, which stays Arrow)."""
    return _row_hash(tbl.select(keys).to_pandas(), keys)


# per-worker-process cache of the deserialized broadcast table (one
# resolve per worker, not per batch; elastic task pool instead of a
# fixed-size actor pool so the stage scales with free CPUs)
_SMALL_CACHE: dict[str, pd.DataFrame] = {}


def _small_frame(small_ref) -> pd.DataFrame:
    import ray

    key = small_ref.hex()
    df = _SMALL_CACHE.get(key)
    if df is None:
        small = ray.get(small_ref)
        df = small.to_pandas() if isinstance(small, pa.Table) else small
        if len(_SMALL_CACHE) > 8:
            _SMALL_CACHE.clear()
        _SMALL_CACHE[key] = df
    return df


def broadcast_join(big_ds, small, on, *, how: str = "inner", concurrency=None,
                   suffix: str = "_r"):
    """Join a big Dataset against a small in-memory table (pandas/Arrow).

    ``small`` is placed in the object store once; each worker process
    resolves + caches the deserialized table once and merges per batch.
    """
    import ray

    small_ref = ray.put(small)

    def merge(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.merge(_small_frame(small_ref), on=on, how=how,
                           suffixes=("", suffix))

    kwargs = {}
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return big_ds.map_batches(merge, batch_format="pandas", **kwargs)


def sides(tbl: pa.Table) -> tuple[pa.Table, pa.Table]:
    """Split a cogroup bucket table into its (left, right) Arrow tables,
    dropping the bookkeeping columns."""
    side = tbl.column("__side")
    keep = [n for n in tbl.column_names if n not in ("__side", "__bucket")]
    lt = tbl.filter(pc.equal(side, 0)).select(keep)
    rt = tbl.filter(pc.equal(side, 1)).select(keep)
    return lt, rt


def cogroup(left_ds, right_ds, on: list[str], per_bucket, *, num_buckets: int = 32):
    """Hash-partitioned co-group, Arrow end to end: both sides bucketized
    on hash(key) % B, ONE shuffle co-locates buckets, and ``per_bucket``
    receives the combined ``pa.Table`` for each bucket (``__side`` int8,
    0 = left / 1 = right; use :func:`sides` to split). A side's missing
    columns are TYPED null arrays, so every column keeps its native Arrow
    dtype through the shuffle — fixed-width binary / list columns ride as
    buffers, never per-element pickles. This is the primitive behind
    partitioned_join and any join variant that fuses downstream work into
    the merge (verify-and-project, aggregate-after-join) so the joined
    payload never materializes.

    Caveat: a side backed by PANDAS blocks types its missing-column
    padding from the numpy dtype, and ``object`` maps to ``pa.string()``
    — correct for string columns, wrong for object columns holding
    lists/bytes. Feed Arrow-native datasets (or string/numeric pandas
    columns) through cogroup; wide binary/list payloads belong in
    build_shard_lookup, not in a join shuffle."""
    l_schema = left_ds.schema()
    r_schema = right_ds.schema()
    lcols = list(l_schema.names)
    extra_r = [c for c in r_schema.names if c not in lcols]
    all_cols = lcols + extra_r

    def _arrow_type(schema, name):
        base = schema.base_schema
        if isinstance(base, pa.Schema):
            return base.field(name).type
        # pandas-backed block schema: map the numpy dtype
        dtype = dict(zip(base.names, base.types))[name]
        try:
            return pa.from_numpy_dtype(dtype)
        except (pa.ArrowNotImplementedError, TypeError):
            return pa.string()

    def _type_of(c):
        if c in l_schema.names:
            return _arrow_type(l_schema, c)
        return _arrow_type(r_schema, c)

    def bucketize(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            n = len(batch)
            bucket = (_table_key_hash(batch, on) % num_buckets).astype("int64")
            cols = {}
            for c in all_cols:
                if c in batch.column_names:
                    cols[c] = batch.column(c)
                else:
                    cols[c] = pa.nulls(n, type=_type_of(c))
            cols["__bucket"] = pa.array(bucket)
            cols["__side"] = pa.array(np.full(n, side, dtype=np.int8))
            return pa.table(cols)

        return fn

    both = left_ds.map_batches(
        bucketize(0), batch_format="pyarrow", zero_copy_batch=True
    ).union(
        right_ds.map_batches(bucketize(1), batch_format="pyarrow", zero_copy_batch=True)
    )
    return both.groupby("__bucket").map_groups(per_bucket, batch_format="pyarrow")


def partitioned_join(left_ds, right_ds, on: list[str], *, num_buckets: int = 32,
                     how: str = "inner"):
    """Explicit partitioned hash join: Arrow cogroup + per-bucket pandas
    merge. Each side is converted to pandas only AFTER the side split, so
    the frames are side-pure (no padding nulls) and keep native dtypes."""
    rcols = list(right_ds.schema().names)

    lcols = list(left_ds.schema().names)

    def merge_bucket(group: pa.Table) -> pd.DataFrame:
        lt, rt = sides(group)
        lg = lt.select(lcols).to_pandas()
        rg = rt.select(rcols).to_pandas()
        return lg.merge(rg, on=on, how=how, suffixes=("", "_r"))

    return cogroup(left_ds, right_ds, on, merge_bucket, num_buckets=num_buckets)


def hash_aggregate(ds, keys: list[str], agg_fn, *, num_buckets: int = 64,
                   batch_format: str = "pandas"):
    """Grouped aggregation via explicit hash bucketing: bucket = hash(key)
    % B as an int column, ONE cheap int-key shuffle, then a pandas hash
    groupby per bucket (C-speed). Avoids Ray's sort-based groupby, which
    global-sorts the whole dataset by string keys — profiled 10x slower on
    many-group aggregations (70k groups / 357k rows: 41s sort-based vs ~4s
    bucketed).

    ``agg_fn``: DataFrame -> DataFrame, applied per bucket; it must itself
    group by ``keys`` (each key lives in exactly one bucket, so per-bucket
    results are globally correct).

    ``batch_format='pyarrow'`` keeps blocks Arrow end to end — ``agg_fn``
    receives a ``pa.Table``. Required whenever rows carry wide fixed-width
    payloads (embedding ``fixed_size_list`` columns): the pandas path would
    convert them to object-of-ndarray cells, i.e. pickled-object shuffle
    bytes. Only the KEY columns are ever converted for hashing.
    """
    if batch_format == "pyarrow":

        def bucketize_a(batch: pa.Table) -> pa.Table:
            h = _table_key_hash(batch, keys)
            return batch.append_column(
                "__bucket", pa.array((h % num_buckets).astype(np.int64))
            )

        def per_bucket_a(group: pa.Table):
            return agg_fn(group.drop_columns(["__bucket"]))

        return (
            ds.map_batches(bucketize_a, batch_format="pyarrow", batch_size=16384)
            .groupby("__bucket")
            .map_groups(per_bucket_a, batch_format="pyarrow")
        )

    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["__bucket"] = (_row_hash(batch, keys) % num_buckets).astype("int64")
        return batch

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        return agg_fn(group.drop(columns="__bucket"))

    return (
        ds.map_batches(bucketize, batch_format="pandas", batch_size=16384)
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def asof_join(left_ds, right_ds, *, left_by: str, right_by: str, left_on: str,
              right_on: str, tie_break: str | None = None, how: str = "inner",
              num_buckets: int = 32):
    """As-of join (Ray Data has no native one): each left row is matched
    to the single right row with the greatest ``right_on`` <=
    ``left_on`` within the same ``by`` key — the temporal lookup shape
    ("state as of this event's timestamp").

    Composition: one bucketed cogroup on the by-key co-locates each key's
    rows, then a per-bucket ``pd.merge_asof`` (vectorized sorted-merge)
    handles every key in the bucket at once — no per-key dispatch, and the
    only shuffle is the same int-bucket exchange every other wide op here
    uses. Partitioning assumption: a single by-key's rows fit one bucket
    task (salt hot keys upstream if not).

    Ties on equal ``right_on`` are broken toward the largest
    ``tie_break`` column value, which makes the result deterministic and
    lets an SQL oracle mirror it exactly (ORDER BY ts DESC, tie DESC
    LIMIT 1). ``how='inner'`` drops unmatched left rows; ``'left'`` keeps
    them with nulls."""
    lcols = list(left_ds.schema().names)
    rcols = list(right_ds.schema().names)

    def per_bucket(group: pa.Table) -> pd.DataFrame:
        lt, rt = sides(group)
        lg = lt.select(lcols).to_pandas()
        rg = rt.select(rcols).to_pandas()
        if not len(lg):
            return pd.DataFrame(columns=lcols + [c for c in rcols if c not in lcols])
        lg = lg.sort_values(left_on, kind="mergesort")
        sort_r = [right_on] + ([tie_break] if tie_break else [])
        rg = rg.sort_values(sort_r, kind="mergesort")
        # sentinel match indicator: filtering on right_on would silently
        # test a LEFT column whenever right_on collides with a left
        # column name (merge_asof suffixes the right copy away)
        rg = rg.assign(__matched=np.int8(1))
        out = pd.merge_asof(
            lg, rg, left_on=left_on, right_on=right_on,
            left_by=left_by, right_by=right_by, direction="backward",
            suffixes=("", "_r"),
        )
        if how == "inner":
            out = out[out["__matched"].notna()]
        return out.drop(columns="__matched")

    # the cogroup joins on a synthetic shared key name so both sides
    # bucketize identically despite different by-column names
    def tag(col):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.append_column("__by", batch.column(col).cast(pa.int64()))

        return fn

    left_t = left_ds.map_batches(tag(left_by), batch_format="pyarrow",
                                 zero_copy_batch=True)
    right_t = right_ds.map_batches(tag(right_by), batch_format="pyarrow",
                                   zero_copy_batch=True)

    return cogroup(left_t, right_t, ["__by"], per_bucket,
                   num_buckets=num_buckets)


def range_join_count(left_ds, right_ds, *, left_by: str, right_by: str,
                     left_lo: str, right_on: str, hi_offset,
                     count_as: str = "n_in_range", num_buckets: int = 32):
    """Range (interval) join reduced to per-left-row counts: for each left
    row, the number of same-key right rows with ``right_on`` in
    ``[left_lo, left_lo + hi_offset)``. Ray Data has no non-equi join;
    this is the bucketed-cogroup composition: co-locate by key, then one
    vectorized double-searchsorted per bucket (sort right timestamps once
    per key-bucket, count = upper_bound - lower_bound) — no pair
    materialization, so a wide interval cannot explode the intermediate
    the way the equivalent SQL range join does. Left rows with no match
    count 0 (left-join semantics)."""
    lcols = list(left_ds.schema().names)

    def per_bucket(group: pa.Table) -> pd.DataFrame:
        lt, rt = sides(group)
        lg = lt.select(lcols + ["__by"]).to_pandas()
        if not len(lg):
            return pd.DataFrame(columns=lcols + [count_as])
        rg = pd.DataFrame(
            {
                "k": rt.column("__by").to_numpy(zero_copy_only=False),
                "t": rt.select([right_on]).to_pandas()[right_on],
            }
        ).sort_values(["k", "t"], kind="mergesort")
        rk = rg["k"].to_numpy()
        rtv = rg["t"].to_numpy()
        lk = lg["__by"].to_numpy()
        lo_t = lg[left_lo].to_numpy()
        hi_t = lo_t + hi_offset
        # count within [lo, hi) inside each key's segment of the sorted
        # (k, t) right array: probes are argsorted by key once, then each
        # unique key's CONTIGUOUS probe run is served by one pair of C
        # searchsorteds over its right segment — total work
        # O(n log n + sum(seg)), no per-key full-array scans
        counts = np.zeros(len(lg), dtype=np.int64)
        order = np.argsort(lk, kind="stable")
        lk_s = lk[order]
        run_starts = np.concatenate(
            [[0], np.nonzero(lk_s[1:] != lk_s[:-1])[0] + 1, [len(lk_s)]]
        )
        for r in range(len(run_starts) - 1):
            p, q = run_starts[r], run_starts[r + 1]
            probe = order[p:q]
            key = lk_s[p]
            a, b = np.searchsorted(rk, [key, key + 1], side="left")
            seg = rtv[a:b]
            counts[probe] = (
                np.searchsorted(seg, hi_t[probe], side="left")
                - np.searchsorted(seg, lo_t[probe], side="left")
            )
        out = lg.drop(columns=["__by"])
        out[count_as] = counts
        return out

    def tag(col):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.append_column("__by", batch.column(col).cast(pa.int64()))

        return fn

    left_t = left_ds.map_batches(tag(left_by), batch_format="pyarrow",
                                 zero_copy_batch=True)
    right_t = right_ds.map_batches(tag(right_by), batch_format="pyarrow",
                                   zero_copy_batch=True)
    return cogroup(left_t, right_t, ["__by"], per_bucket,
                   num_buckets=num_buckets)


# per-worker-process cache of resolved lookup shards (ref.hex -> (keys, values))
_SHARD_CACHE: dict[str, tuple] = {}


def _resolve_shard(ref):
    import ray

    k = ref.hex()
    hit = _SHARD_CACHE.get(k)
    if hit is None:
        hit = ray.get(ref)
        if len(_SHARD_CACHE) > 512:
            _SHARD_CACHE.clear()
        _SHARD_CACHE[k] = hit
    return hit


def build_shard_lookup(ds, key_col: str, value_col: str, *,
                       num_shards: int | None = None):
    """Materialize a (key, value) Dataset into hash-sharded, key-sorted
    object-store shards — the lookup side of a shard-gather join.

    This is the alternative to shipping a wide ``value_col`` through
    pair-join shuffles (measured: a 512-byte signature payload attached to
    9.8M pairs made the second join's sort shuffle a 15.7 GB all-to-all
    that dominated the whole dedup run). Here the payload is shuffled
    ZERO times: the table is materialized once, B remote tasks each
    filter-and-sort their hash shard, and consumers gather rows by key
    inside ``map_batches`` (:func:`gather_from_shards`) with a per-worker
    shard cache. On one node every cache hit is a zero-copy plasma read;
    on a multi-node cluster each node pulls each shard at most once
    (object locality), i.e. node-level-broadcast network cost with
    per-task heap bounded by the shards actually touched. When the lookup
    table exceeds node object-store memory, bucket the probe side by
    hash(key) % num_shards first so each task touches one shard.

    Keys must be integral (gathers use sorted int64 + searchsorted).
    Returns (shard_refs, num_shards).
    """
    import ray

    mat = ds.materialize()
    if num_shards is None:
        n = mat.count()
        num_shards = int(min(256, max(4, n // 500_000 + 1)))
    val_type = None
    base = mat.schema().base_schema
    if isinstance(base, pa.Schema):
        val_type = base.field(value_col).type
    block_refs = mat.to_arrow_refs()

    @ray.remote
    def build(shard_id: int, *blocks):
        parts = []
        for t in blocks:
            if isinstance(t, pd.DataFrame):
                # Ray passes pandas blocks through to_arrow_refs
                # unconverted — in practice empty/schema-less passthrough
                # blocks; normalize (or skip) here
                if len(t) == 0 or key_col not in t.columns:
                    continue
                t = pa.Table.from_pandas(
                    t[[key_col, value_col]], preserve_index=False
                )
                if val_type is not None and t.schema.field(value_col).type != val_type:
                    t = t.set_column(
                        t.schema.get_field_index(value_col), value_col,
                        t.column(value_col).cast(val_type),
                    )
            elif t.num_rows == 0:
                continue
            t = t.select([key_col, value_col])
            h = _table_key_hash(t, [key_col]) % num_shards
            mask = h == shard_id
            if mask.any():
                parts.append(t.filter(pa.array(mask)))
        if not parts:
            empty = (
                pa.array([], type=val_type)
                if val_type is not None
                else pa.array([])
            )
            return np.empty(0, dtype=np.int64), empty
        t = pa.concat_tables(parts)
        keys = t.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(keys, kind="stable")
        skeys = keys[order]
        # gather_from_shards resolves each probe key to exactly ONE payload
        # row (searchsorted): a duplicate key would silently drop rows and
        # change join semantics on dirty inputs — fail loudly instead
        if len(skeys) > 1 and bool((np.diff(skeys) == 0).any()):
            dup = int(skeys[1:][np.diff(skeys) == 0][0])
            raise ValueError(
                f"build_shard_lookup: duplicate key {dup} in shard {shard_id} "
                f"({key_col!r}); the lookup side of a shard-gather join must "
                "be unique per key — dedup it explicitly first"
            )
        vals = t.column(value_col).combine_chunks().take(pa.array(order))
        return skeys, vals

    refs = [build.remote(s, *block_refs) for s in range(num_shards)]
    return refs, num_shards


def gather_from_shards(keys: np.ndarray, shard_refs, num_shards: int):
    """Probe a shard lookup (see :func:`build_shard_lookup`) for ``keys``.

    Returns ``(values, found)``: ``found`` is a bool mask over ``keys``;
    ``values`` is a ``pa.Array`` holding one payload row per FOUND key, in
    original key order (``None`` when nothing was found). Missing keys are
    simply absent — the caller filters with ``found`` (inner-join
    semantics)."""
    keys = np.asarray(keys, dtype=np.int64)
    h = (_row_hash(pd.DataFrame({"k": keys}), ["k"]) % num_shards).astype(np.int64)
    found = np.zeros(len(keys), dtype=bool)
    parts: list[pa.Array] = []
    idxs: list[np.ndarray] = []
    for s in np.unique(h):
        shard_keys, vals = _resolve_shard(shard_refs[s])
        if len(shard_keys) == 0:
            continue
        idx = np.nonzero(h == s)[0]
        pos = np.searchsorted(shard_keys, keys[idx])
        pos = np.clip(pos, 0, len(shard_keys) - 1)
        ok = shard_keys[pos] == keys[idx]
        if not ok.any():
            continue
        found[idx[ok]] = True
        take = vals.take(pa.array(pos[ok]))
        parts.append(take.combine_chunks() if isinstance(take, pa.ChunkedArray) else take)
        idxs.append(idx[ok])
    if not parts:
        return None, found
    combined = pa.concat_arrays(parts)
    order = np.argsort(np.concatenate(idxs), kind="stable")
    return combined.take(pa.array(order)), found


def topk(ds, by: list[tuple[str, bool]], k: int):
    """Top-k rows without a global sort: local per-batch top-k, then one
    final top-k over the concatenated partials.

    ``by`` is [(column, descending), ...]; include a unique tie-break
    column for determinism.
    """
    cols = [c for c, _ in by]
    asc = [not d for _, d in by]

    def local(batch: pd.DataFrame) -> pd.DataFrame:
        # tie-safe partial: keep every row tied with the k-th row on the
        # full by-spec, so truncation can never drop a row the final sort
        # would keep even if the caller's by-spec is not a total order
        s = batch.sort_values(cols, ascending=asc)
        if len(s) <= k:
            return s
        kth = s[cols].iloc[k - 1]
        tied = (s[cols] == kth.values).all(axis=1)
        cut = max(k, int(tied.to_numpy().nonzero()[0].max()) + 1)
        return s.head(cut)

    def final_cut(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(cols, ascending=asc).head(k)

    partials = ds.map_batches(local, batch_format="pandas")
    return partials.repartition(1).map_batches(
        final_cut, batch_format="pandas", batch_size=None
    )


def grouped_topk(ds, group_keys: list[str], by: list[tuple[str, bool]], k: int,
                 *, num_buckets: int = 64):
    """Top-k rows PER GROUP without per-group UDF dispatch: one bucketed
    shuffle co-locates each group, then a single vectorized
    sort + groupby.head pass handles every group in the bucket (the
    O4-per-key shape at user-cardinality keys — a
    groupby(key).map_groups(head) pays per-group task/Table overhead that
    dominates at 10^6+ keys)."""
    cols = [c for c, _ in by]
    asc = [not d for _, d in by]

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values(group_keys + cols,
                          ascending=[True] * len(group_keys) + asc)
        return s.groupby(group_keys, sort=False).head(k)

    return hash_aggregate(ds, group_keys, per_bucket, num_buckets=num_buckets)


def rollup_counts(ds, keys: list[str], sum_cols: list[str], *,
                  num_buckets: int = 64, all_token: str = "ALL") -> pd.DataFrame:
    """GROUP BY ROLLUP(keys): counts + sums at every prefix level of
    ``keys``, rolled-up key slots holding ``all_token``.

    Only the FINEST level touches the input (one distributed
    hash_aggregate pass); every coarser level re-aggregates the finest
    RESULT — valid for decomposable aggregates (count/sum) and the
    reason this stays cheap at 10^12 rows: the driver holds only
    distinct-finest-key rows, never input. Returns a small DataFrame
    (grouping-key cardinality by construction)."""

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        specs = {"n": (keys[0], "size")}
        specs.update({c: (c, "sum") for c in sum_cols})
        return g.groupby(keys, as_index=False).agg(**specs)

    finest = hash_aggregate(ds, keys, agg).to_pandas()
    finest["n"] = finest["n"].astype("int64")
    out = [finest.assign(level=len(keys))]
    for i in range(len(keys) - 1, -1, -1):
        sub, dropped = keys[:i], keys[i:]
        if sub:
            lvl = finest.groupby(sub, as_index=False)[["n"] + sum_cols].sum()
        else:
            lvl = finest[["n"] + sum_cols].sum().to_frame().T
        for c in dropped:
            lvl[c] = all_token
        out.append(lvl.assign(level=i))
    res = pd.concat(out, ignore_index=True)[keys + ["level", "n"] + sum_cols]
    res["n"] = res["n"].astype("int64")
    res["level"] = res["level"].astype("int64")
    return res.sort_values(["level"] + keys).reset_index(drop=True)


def salted_join(left_ds, right_ds, on: list[str], hot_keys, *, salt: int = 8,
                num_buckets: int = 32):
    """Skew-safe inner partitioned join: hot join keys (e.g. from
    ``sketch.frequent_items``) are spread over ``salt`` sub-buckets.

    Left rows on a hot key get a cycling salt in [0, salt); right rows on
    a hot key are REPLICATED once per salt value; cold rows join at salt
    0. The bucket hash covers (keys + salt), so one hot key's rows land
    in up to ``salt`` buckets instead of one — the standard fix when a
    single key's cogroup exceeds a bucket worker's memory (a 10^8-row
    key would otherwise serialize one straggler task). The result set is
    identical to ``partitioned_join(..., how="inner")`` — only the
    partitioning changes; replicate the SMALLER side as ``right``.
    Inner-join only (an unmatched replicated right row would surface
    ``salt`` times under outer semantics).

    ``hot_keys``: small collection of key values (tuples for multi-column
    keys), ray.put once and worker-cached — never re-shipped per batch.
    """
    import ray

    hot_ref = ray.put(pd.DataFrame(
        list(hot_keys) if len(on) > 1 else [(k,) for k in hot_keys],
        columns=on,
    ))

    def _is_hot(b: pd.DataFrame) -> np.ndarray:
        hot = _small_frame(hot_ref)
        if len(on) == 1:
            return b[on[0]].isin(hot[on[0]]).to_numpy()
        idx = pd.MultiIndex.from_frame(b[on])
        return np.asarray(idx.isin(pd.MultiIndex.from_frame(hot)))

    def salt_left(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        hot = _is_hot(b)
        s = np.zeros(len(b), dtype="int64")
        s[hot] = np.arange(int(hot.sum()), dtype="int64") % salt
        b["__salt"] = s
        return b

    def salt_right(b: pd.DataFrame) -> pd.DataFrame:
        hot = _is_hot(b)
        cold = b[~hot].copy()
        cold["__salt"] = np.int64(0)
        hb = b[hot]
        rep = hb.loc[hb.index.repeat(salt)].copy()
        rep["__salt"] = np.tile(np.arange(salt, dtype="int64"), len(hb))
        return pd.concat([cold, rep], ignore_index=True)

    joined = partitioned_join(
        left_ds.map_batches(salt_left, batch_format="pandas"),
        right_ds.map_batches(salt_right, batch_format="pandas"),
        on + ["__salt"], num_buckets=num_buckets, how="inner",
    )
    return joined.drop_columns(["__salt"])


# 16-byte keys for pd.util.hash_pandas_object: two independent hash
# streams drive the Bloom filter's double hashing (h1 + i*h2).
_BLOOM_KEY1 = "bloomfilterkey01"
_BLOOM_KEY2 = "bloomfilterkey02"


def _bloom_hashes(batch: pd.DataFrame, keys: list[str]):
    norm = _normalize_keys(batch[keys])
    h1 = pd.util.hash_pandas_object(norm, index=False, hash_key=_BLOOM_KEY1).to_numpy()
    # second stream: splitmix64 finalizer of h1. pandas' hash_key only
    # perturbs OBJECT/string hashing, so two hash_key calls return the
    # SAME values for numeric key columns (verified) and double hashing
    # would silently degenerate to one probe sequence
    h2 = h1 + np.uint64(0x9E3779B97F4A7C15)
    h2 = (h2 ^ (h2 >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    h2 = (h2 ^ (h2 >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    h2 = h2 ^ (h2 >> np.uint64(31))
    # odd stride so the probe sequence cycles through all table slots
    return h1, (h2 | np.uint64(1))


def build_bloom(ds, on: list[str], *, bits: int = 1 << 22, probes: int = 4):
    """Build a Bloom filter (packed uint64 bitset) of a dataset's key
    columns. Each block emits one m/8-byte partial bitset; the driver ORs
    them (a partial per BLOCK, not per row — at 2^22 bits that is 512 KiB
    x block count; for 100 TB inputs raise the block size or interpose one
    `repartition` level so the driver OR stays tree-shaped in cost)."""
    mask64 = np.uint64(bits - 1) if bits & (bits - 1) == 0 else None

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        arr = np.zeros(bits // 64, dtype=np.uint64)
        h1, h2 = _bloom_hashes(batch, on)
        for i in range(probes):
            p = h1 + np.uint64(i) * h2
            p = (p & mask64) if mask64 is not None else p % np.uint64(bits)
            np.bitwise_or.at(arr, p >> np.uint64(6),
                             np.uint64(1) << (p & np.uint64(63)))
        return pd.DataFrame({"bits": [arr.tobytes()]})

    merged = np.zeros(bits // 64, dtype=np.uint64)
    for row in ds.map_batches(partial, batch_format="pandas").take_all():
        merged |= np.frombuffer(row["bits"], dtype=np.uint64)
    return merged


def bloom_semi_join(left_ds, right_ds, on: list[str], *, how: str = "semi",
                    bits: int = 1 << 22, probes: int = 4, exact: bool = True,
                    num_buckets: int = 32):
    """Semi / anti join with a broadcast Bloom-filter pre-filter.

    The 100 TB primitive the plain semi-join lacks: instead of shuffling
    the ENTIRE left side into a partitioned join (or collecting the whole
    right key set onto the driver for a broadcast), a ~512 KiB bitset of
    the right side's keys is ray.put once and each left batch is pruned
    in place — only Bloom-POSITIVE rows (true matches + the small
    false-positive tail) enter the exact cogroup verify, so the shuffle
    moves a selectivity-sized fraction of the input. Bloom negatives are
    EXACT non-members, which makes the anti side precise too:

    - how="semi": positives -> exact per-bucket semi merge (false
      positives die there); result == ``left ⋉ right``.
    - how="anti": Bloom negatives are emitted directly (no shuffle at
      all for them); positives go through an exact anti check; result
      == ``left ▷ right``.

    ``exact=False`` skips the verify shuffle and returns the raw Bloom
    survivors (semi only) — an approximate pre-filter stage for callers
    that will verify downstream anyway.
    """
    import ray

    if how not in ("semi", "anti"):
        raise ValueError(f"how must be semi|anti, got {how!r}")
    bitset_ref = ray.put(build_bloom(right_ds, on, bits=bits, probes=probes))
    mask64 = np.uint64(bits - 1) if bits & (bits - 1) == 0 else None

    def _member_mask(batch: pd.DataFrame) -> np.ndarray:
        bs = _small_frame(bitset_ref)
        h1, h2 = _bloom_hashes(batch, on)
        mask = np.ones(len(batch), dtype=bool)
        for i in range(probes):
            p = h1 + np.uint64(i) * h2
            p = (p & mask64) if mask64 is not None else p % np.uint64(bits)
            mask &= ((bs[p >> np.uint64(6)] >> (p & np.uint64(63)))
                     & np.uint64(1)).astype(bool)
        return mask

    def keep_pos(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[_member_mask(batch)]

    positives = left_ds.map_batches(keep_pos, batch_format="pandas")
    if how == "semi" and not exact:
        return positives

    lcols = list(left_ds.schema().names)
    rkeys = right_ds.select_columns(on)

    def semi_bucket(group: pa.Table):
        lt, rt = sides(group)
        lg = lt.select(lcols).to_pandas()
        rk = rt.select(on).to_pandas().drop_duplicates()
        merged = lg.merge(rk, on=on, how="left", indicator=True)
        keep = merged["_merge"] == ("both" if how == "semi" else "left_only")
        return merged.loc[keep, lcols]

    checked = cogroup(positives, rkeys, on, semi_bucket, num_buckets=num_buckets)
    if how == "semi":
        return checked

    def keep_neg(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[~_member_mask(batch)]

    negatives = left_ds.map_batches(keep_neg, batch_format="pandas")
    return negatives.union(checked)


def deterministic_shuffle(ds, key_cols: list[str], *, seed: str = "0",
                          num_blocks: int | None = None):
    """Seeded, reproducible global shuffle: order rows by
    md5(seed || key) — the reproducible-training-data contract (same
    seed -> byte-identical shard order on any cluster size, unlike
    random_shuffle whose layout depends on block boundaries). One
    distributed sort on the 16-byte hash; the hash column is dropped on
    output. Change ``seed`` per epoch for a fresh permutation.

    Cost note: the md5-vs-SQL contract (oracle: ``md5(seed || '|' ||
    key)``) forces one digest PER ROW — that per-row call is the measured
    ceiling (~1.5M rows/s/core for the digest loop after vectorizing the
    key concat + encode, which had been a python-level ``agg(axis=1)``;
    whole-batch C digests exist only for non-per-row contracts like
    ``_row_hash``)."""
    import hashlib

    def add_key(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        s = seed + "|" + batch[key_cols[0]].astype(str)
        for c in key_cols[1:]:
            s = s + "|" + batch[c].astype(str)
        md5 = hashlib.md5
        batch["__shuf"] = [
            md5(v).hexdigest() for v in s.str.encode("utf-8").to_numpy()
        ]
        return batch

    out = ds.map_batches(add_key, batch_format="pandas").sort("__shuf")
    if num_blocks is not None:
        out = out.repartition(num_blocks)
    return out.drop_columns(["__shuf"])


def global_prefix_sums(ds, key_col: str, weight_col: str, *,
                       num_ranges: int = 256):
    """Exclusive global prefix sum of ``weight_col`` in ``key_col`` order
    (the zipWithIndex / global-offset primitive Ray Data lacks; weights
    of 1 give a global row number). Keys must be unique integers.

    Distributed two-level scan, NO global sort: keys are range-partitioned
    by value (range id = key * R // (max+1) — contiguous key ranges, so
    per-range local prefix sums compose with the tiny cross-range offsets),
    stage 1 computes per-range partial sums inside map_batches (a
    num_ranges-sized table reaches the driver — B rows, not corpus rows),
    the driver prefix-sums THAT, and stage 2 cumsums each range in one
    bucketed pass and adds its range offset. The only shuffle carries
    (key, weight) pairs. Returns a Dataset (key_col, weight_col,
    "offset") where offset = sum of weights over all smaller keys.
    """
    import ray

    def key_minmax(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame({"mx": pd.array([], dtype="int64"),
                                 "mn": pd.array([], dtype="int64")})
        return pd.DataFrame({"mx": [int(b[key_col].max())],
                             "mn": [int(b[key_col].min())]})

    stats = ds.map_batches(key_minmax, batch_format="pandas").to_pandas()
    if not len(stats):  # empty input: empty typed result
        import ray.data as rd

        return rd.from_pandas(pd.DataFrame({
            key_col: pd.array([], dtype="int64"),
            weight_col: pd.array([], dtype="int64"),
            "offset": pd.array([], dtype="int64")}))
    lo, hi = int(stats["mn"].min()), int(stats["mx"].max())
    # all range arithmetic in uint64 with WRAPPING subtraction: for int64
    # keys the true difference always fits uint64, whereas the naive
    # (key - lo) * num_ranges overflows int64 for spans over ~2^55
    # (hash-derived keys) and produced negative/non-monotone range ids
    # scalar negative-int -> uint64 construction is deprecated (error under
    # numpy>=2); wrap through an int64 array view instead
    lo_u, hi_u = np.array([lo, hi], dtype=np.int64).view(np.uint64)
    span_u = (hi_u - lo_u) + np.uint64(1)  # 0 == 2^64
    if span_u == np.uint64(0):  # keys span the full 2^64 domain
        step = np.uint64((1 << 64) // num_ranges)
    else:
        step = span_u // np.uint64(num_ranges) + np.uint64(1)

    def rng_of(keys: np.ndarray) -> np.ndarray:
        diff = keys.astype(np.int64).view(np.uint64) - lo_u
        return np.minimum(diff // step,
                          np.uint64(num_ranges - 1)).astype(np.int64)

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        r = rng_of(b[key_col].to_numpy())
        w = b[weight_col].to_numpy()
        sums = np.bincount(r, weights=w, minlength=num_ranges)
        nz = np.nonzero(sums)[0]
        return pd.DataFrame({"r": nz.astype("int64"),
                             "s": sums[nz].astype("int64")})

    pr = ds.map_batches(partials, batch_format="pandas").to_pandas()
    totals = np.zeros(num_ranges, dtype=np.int64)
    if len(pr):
        np.add.at(totals, pr["r"].to_numpy(), pr["s"].to_numpy())
    range_off = np.concatenate([[0], np.cumsum(totals)[:-1]])
    off_ref = ray.put(range_off)

    def add_range(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__rng"] = rng_of(b[key_col].to_numpy()).astype("int64")
        return b

    def per_range(g: pd.DataFrame) -> pd.DataFrame:
        offs = ray.get(off_ref)
        # a __rng hash bucket may hold several ranges; cumsum per range
        g = g.sort_values([ "__rng", key_col], kind="mergesort")
        w = g[weight_col].to_numpy().astype(np.int64)
        cs = np.cumsum(w) - w
        r = g["__rng"].to_numpy()
        starts = np.zeros(len(g), dtype=bool)
        starts[0] = True
        starts[1:] = r[1:] != r[:-1]
        # rebase the running cumsum at each range boundary (forward-fill
        # the index of the segment start, then gather its cumsum)
        seg_start = np.maximum.accumulate(
            np.where(starts, np.arange(len(g)), -1))
        seg_base = cs[seg_start]
        out = pd.DataFrame({
            key_col: g[key_col].astype("int64"),
            weight_col: w,
            "offset": (cs - seg_base + offs[r]).astype("int64"),
        })
        return out

    return hash_aggregate(ds.map_batches(add_range, batch_format="pandas"),
                          ["__rng"], per_range)


def weighted_sample(ds, weight_col: str, k: int, *, id_cols: list[str],
                    seed: str = "0", quant: int = 1_000_000_000):
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis A-ES): each row draws a seeded uniform u from
    md5(seed || id) and the k rows with the largest ln(u)/w survive —
    inclusion probability proportional to ``weight_col``, reproducible
    at any parallelism (the per-row key is a pure function of (seed,
    id)), and single-pass mergeable: local per-batch top-k partials +
    one final top-k IS the reservoir, so nothing corpus-sized moves.
    The quality-weighted subcorpus draw (sample ∝ quality score) of a
    training-data pipeline.

    Hash-exact vs SQL: u is the dyadic ((md5_64 >> 11) + 1) / 2^53 —
    exactly representable, identical in DuckDB — and the sort key is
    floor(quant * ln(u)/w) kept as a FLOORED DOUBLE (DuckDB's FLOOR
    returns DOUBLE too): exact-integer-valued below 2^53, and for
    tiny weights (|key| beyond int64) the floored double still orders
    correctly where an int64 cast would overflow to INT64_MIN and
    collapse all such rows onto one key. Id columns tie-break.
    Zero/negative weights are excluded (their ln(u)/w is undefined /
    order-inverted). Same per-row-md5 cost contract as
    deterministic_shuffle (~1.5M rows/s/core ceiling)."""
    import hashlib

    def add_key(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[batch[weight_col] > 0].copy()
        if not len(batch):
            batch["__wkey"] = pd.array([], dtype="float64")
            return batch
        s = seed + "|" + batch[id_cols[0]].astype(str)
        for c in id_cols[1:]:
            s = s + "|" + batch[c].astype(str)
        md5 = hashlib.md5
        h = np.array(
            [int(md5(v).hexdigest()[:16], 16) for v in
             s.str.encode("utf-8").to_numpy()],
            dtype=np.uint64,
        )
        u = ((h >> np.uint64(11)).astype(np.float64) + 1.0) / float(1 << 53)
        w = batch[weight_col].to_numpy(dtype="float64")
        batch["__wkey"] = np.floor(quant * np.log(u) / w)
        return batch

    keyed = ds.map_batches(add_key, batch_format="pandas")
    out = topk(keyed, [("__wkey", True)] + [(c, False) for c in id_cols], k)
    return out.drop_columns(["__wkey"])
