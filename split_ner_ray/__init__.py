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

# Ray serializes our stage classes/functions by reference; worker processes
# must be able to resolve them. Two layers of defense:
#
# 1. Export PYTHONPATH before ray.init (tests, bench, CLI import us first,
#    so their workers inherit it).
# 2. Register every split_ner_ray module for cloudpickle BY-VALUE
#    serialization: when the harness calls ray.init() BEFORE importing us
#    (the driver contract), its workers have neither PYTHONPATH nor a
#    useful cwd — by-value pickling makes our code travel inside the task
#    spec instead (cached per stage by Ray, so the cost is per-stage, not
#    per-batch).
import os as _os

_parent = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _parent not in _os.environ.get("PYTHONPATH", "").split(_os.pathsep):
    _os.environ["PYTHONPATH"] = (
        _parent + _os.pathsep + _os.environ["PYTHONPATH"]
        if _os.environ.get("PYTHONPATH")
        else _parent
    )
del _os, _parent


def _register_by_value() -> None:
    import importlib
    import sys

    try:
        from ray import cloudpickle
    except Exception:  # pragma: no cover - ray not installed
        return
    submodules = [
        "schemas", "rules", "synth", "oracle", "evaluate", "config", "queries",
        "functions", "functions.patterns", "functions.tokenize", "functions.decode",
        "sources", "sources.tsv",
        "stages", "stages.extract", "stages.linking", "stages.relational",
        "stages.dedup", "stages.ann", "stages.windows", "stages.graph",
        "stages.text", "stages.embed", "stages.multimodal",
        "pipelines", "pipelines.kg", "pipelines.checkpointed",
        "state", "state.manifest",
    ]
    for name in submodules:
        try:
            mod = importlib.import_module(f"{__name__}.{name}")
            cloudpickle.register_pickle_by_value(mod)
        except Exception:  # pragma: no cover - best effort per module
            pass
    mod = sys.modules.get(__name__)
    if mod is not None:
        try:
            cloudpickle.register_pickle_by_value(mod)
        except Exception:
            pass


def _workers_can_import() -> bool:
    """Probe whether Ray workers can resolve this package by reference.

    The probe is a NESTED function, so cloudpickle ships it by value —
    it runs on a worker regardless of the worker's import path.
    """
    import ray

    @ray.remote(num_cpus=0)
    def _probe() -> bool:
        import importlib

        try:
            importlib.import_module("split_ner_ray")
            return True
        except ImportError:
            return False

    try:
        return bool(ray.get(_probe.remote(), timeout=30))
    except Exception:
        return False


def _maybe_register_by_value() -> None:
    """By-value pickling costs ~60% task-dispatch overhead (measured), so
    only enable it when it is the difference between working and
    ModuleNotFoundError: i.e. Ray was initialised before this import from a
    cwd whose workers cannot import the package (the driver-contract
    scenario)."""
    import os

    if os.environ.get("SNR_NO_BY_VALUE") == "1":
        return
    try:
        import ray
    except Exception:  # pragma: no cover
        return
    if not ray.is_initialized():
        return  # our PYTHONPATH export reaches any later-started workers
    try:
        # NEVER probe from inside a Ray worker: the probe task would block
        # on ray.get, spawn a replacement worker, which imports this module
        # and probes again — a recursive worker storm (observed).
        from ray._private.worker import WORKER_MODE, global_worker

        if global_worker.mode == WORKER_MODE:
            return
    except Exception:  # pragma: no cover - private API moved; stay safe
        return
    if not _workers_can_import():
        _register_by_value()


_maybe_register_by_value()
