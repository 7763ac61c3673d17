"""split_ner_ray — a Ray-Data-native knowledge-graph construction engine.

A from-scratch re-expression of the semantics of c3sr/split-ner (SplitNER,
ACL 2023: two-stage span-detection + span-classification NER) as streaming
Ray Data pipelines over Parquet transcript tables, extended with the KG
stages the north rule requires: predicate extraction, blocking + similarity
entity linking, union-find canonicalization, and deduplicated triple /
node / edge materialization with per-partition checkpoint manifests.

Nothing here is a port: the reference is a single-node PyTorch program; this
package is organised around ``ray.data.Dataset`` -> ``map_batches`` over
zero-copy Arrow batches, actor pools for stateful stages, and explicit
shuffle keys (see SURVEY.md section 7 for the stage graph).
"""

__version__ = "0.1.0"
