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

# Ray serializes our stage classes by reference; worker processes must be
# able to import this package. Exporting PYTHONPATH before ray.init (tests,
# bench, CLI all import us first) makes spawned workers inherit it; when the
# harness inits Ray first, workers inherit its cwd (/root/repo) instead.
import os as _os

_parent = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _parent not in _os.environ.get("PYTHONPATH", "").split(_os.pathsep):
    _os.environ["PYTHONPATH"] = (
        _parent + _os.pathsep + _os.environ["PYTHONPATH"]
        if _os.environ.get("PYTHONPATH")
        else _parent
    )
del _os, _parent
