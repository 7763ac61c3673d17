"""Generic iterative connected components (distributed union-find analog).

The KG linker never needs this (its similarity edges are block-partitioned
by construction — stages/linking.py), but near-dup clustering does: LSH
candidate pairs cross blocks. This operator is the engine's iterative
dataflow: min-label propagation as a driver loop of groupby passes with a
cheap convergence check (labels are monotonically non-increasing, so an
unchanged label-sum means a fixed point). Reference analog: the k-medoids
remap loop in utils/mention_clustering.py:44-65, lifted to dataflow.

Convergence is O(component diameter) rounds; for the short-diameter
similarity graphs this engine builds (near-dup clusters, linked surfaces)
that is 2-4 rounds. A large-star/small-star scheme would cut worst cases to
O(log n) at the cost of two shuffles per round — documented trade-off.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_PAIR = pa.schema([("node", pa.int64()), ("label", pa.int64())])


def connected_components(edges_ds, *, max_iter: int = 20):
    """edges (src:int64, dst:int64) -> Dataset (node:int64, label:int64)
    where label = min node id of the component."""

    def to_pairs(batch: pa.Table) -> pa.Table:
        fwd = pa.Table.from_pydict(
            {"node": batch.column("src"), "label": batch.column("dst")}, schema=_PAIR
        )
        rev = pa.Table.from_pydict(
            {"node": batch.column("dst"), "label": batch.column("src")}, schema=_PAIR
        )
        return pa.concat_tables([fwd, rev])

    # symmetric neighbor candidates + self labels, iterated to fixed point
    sym = edges_ds.map_batches(to_pairs, batch_format="pyarrow", zero_copy_batch=True).materialize()

    def min_per_node(group: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "node": group.column("node").slice(0, 1),
                "label": pa.array([pc.min(group.column("label")).as_py()], pa.int64()),
            },
            schema=_PAIR,
        )

    labels = sym.groupby("node").map_groups(min_per_node, batch_format="pyarrow").materialize()

    def label_sum(ds) -> int:
        from ray.data.aggregate import Sum

        row = ds.aggregate(Sum("label", alias_name="s"))
        return int(row["s"]) if row and row.get("s") is not None else 0

    prev = label_sum(labels)
    for _ in range(max_iter):
        # propagate: each node's current label is offered to its neighbors
        def attach(group: pa.Table) -> pa.Table:
            # group rows: one 'lab' row (kind=0, the node's label) and the
            # node's neighbors (kind=1); offer the label to every neighbor
            kinds = group.column("kind").to_pylist()
            vals = group.column("val").to_pylist()
            node = group.column("key").to_pylist()[0]
            lab = min(vals[i] for i in range(len(kinds)) if kinds[i] == 0)
            nbrs = [vals[i] for i in range(len(kinds)) if kinds[i] == 1]
            return pa.Table.from_pydict(
                {"node": nbrs + [node], "label": [lab] * (len(nbrs) + 1)},
                schema=_PAIR,
            )

        def lab_rows(batch: pa.Table) -> pa.Table:
            return pa.Table.from_pydict(
                {
                    "key": batch.column("node"),
                    "val": batch.column("label"),
                    "kind": pa.array([0] * batch.num_rows, pa.int8()),
                },
            )

        def edge_rows(batch: pa.Table) -> pa.Table:
            return pa.Table.from_pydict(
                {
                    "key": batch.column("node"),
                    "val": batch.column("label"),
                    "kind": pa.array([1] * batch.num_rows, pa.int8()),
                },
            )

        msgs = labels.map_batches(lab_rows, batch_format="pyarrow").union(
            sym.map_batches(edge_rows, batch_format="pyarrow")
        )
        candidates = msgs.groupby("key").map_groups(attach, batch_format="pyarrow")
        labels = (
            candidates.groupby("node").map_groups(min_per_node, batch_format="pyarrow").materialize()
        )
        cur = label_sum(labels)
        if cur == prev:
            break
        prev = cur
    return labels
