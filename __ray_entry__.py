"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01
and compares it against the matching ``oracle_sql()[name]`` via DuckDB
(row-count + schema + order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Catalog lives in split_ner_ray/queries.py (one entry per operator family
from SURVEY.md §2 plus the training-data ops); this module only adapts it.
Nothing here (or in the library) calls ray.init/ray.shutdown.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: full KG construction (detect -> classify ->
    predicates -> link -> canonicalize -> dedup) over the deterministic
    synthetic transcripts at sf0.001; returns the triples Dataset."""
    import ray.data as rd

    from split_ner_ray.pipelines.kg import build_graph_datasets
    from split_ner_ray.synth import transcripts_path

    path = transcripts_path("/root/testdata/sf0.001")
    ds = rd.read_parquet(path, columns=["conv_id", "turn_idx", "text", "tool"])
    triples, _nodes, _edges, _mentions = build_graph_datasets(ds, concurrency=(1, 4))
    return triples


def queries() -> dict[str, Callable[[str], Any]]:
    from split_ner_ray.queries import QUERIES

    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from split_ner_ray.queries import oracle_sql_catalog

    return oracle_sql_catalog()
