#!/usr/bin/env python
"""Benchmark harness (driver contract).

Default mode: run the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) under ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS or 32) and print ONE JSON line:

  {"metric": "kg_build_wall_s", "value": <sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": .., "num_cpus": N, ...}

--scaling: run the same headline job in two fresh processes at 8 and 32
CPUs on identical input and report both throughputs + scaling efficiency
(the sandbox proxy for N vs 4N nodes, per BASELINE.md).

The synthetic transcripts corpus is materialized (and page-cache warmed)
before timing, so the measurement covers compute + shuffle, not one-time
generation or cold reads.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _stderr(*a):
    print(*a, file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# Quiet-window gating.
#
# This VM has minutes-long contention windows that run everything 1.5-100x
# slow (documented in BASELINE.md: a warm fma over 10M floats measures
# ~0.03 s quiet vs 0.57 s contended; BENCH_r04 showed a uniform ~2.4x
# slowdown on code paths untouched that round). Load average can't be the
# in-bench gate — our own Ray workers inflate it with a 1-minute decay —
# but the fma probe measures the memory bus *right now*, so every timed
# attempt below is gated on it: wait (bounded) for a quiet probe before
# starting, and if the post-attempt probe says the window turned noisy
# mid-attempt, spend one extra repeat. A shared wait budget bounds the
# total added wall time.
# ---------------------------------------------------------------------------

_PROBE_THRESH = float(os.environ.get("BENCH_PROBE_THRESH", "0.07"))
# hypervisor steal as a fraction of DEMANDED (non-idle) CPU above which
# an interval counts as contended. Non-idle denominator so a 1-core wait
# probe and a 32-core attempt measure the same thing (a total-jiffies
# denominator dilutes a single-core probe 32x). Calibrated on this VM:
# in-band kg runs measured ~6% steal/non-idle, 1.2-1.5x-slow runs 11%+,
# heavy windows 40%+. The fma probe alone misses steal-shaped contention
# (it samples an instant; steal is an interval phenomenon under load).
_STEAL_FRAC_THRESH = float(os.environ.get("BENCH_STEAL_FRAC", "0.08"))
_PROBE_ARRAYS = None


def _cpu_jiffies() -> tuple[int, int]:
    """(steal, non-idle) jiffies from /proc/stat — interval deltas give
    steal as a fraction of the CPU time actually demanded."""
    try:
        with open("/proc/stat") as f:
            parts = [int(x) for x in f.readline().split()[1:]]
        steal = parts[7] if len(parts) > 7 else 0
        nonidle = sum(parts) - parts[3] - (parts[4] if len(parts) > 4 else 0)
        return steal, nonidle
    except OSError:
        return 0, 1


def _fma_probe() -> float:
    """Seconds for one warm multiply+add pass over 10M float64."""
    global _PROBE_ARRAYS
    import numpy as np

    if _PROBE_ARRAYS is None:
        a = np.random.default_rng(0).random(10_000_000)
        _PROBE_ARRAYS = (a, a.copy(), np.empty_like(a))
        a2, b2, c2 = _PROBE_ARRAYS  # warm: touch every page once
        np.multiply(a2, b2, out=c2)
    a, b, c = _PROBE_ARRAYS
    t0 = time.perf_counter()
    np.multiply(a, b, out=c)
    np.add(c, a, out=c)
    return time.perf_counter() - t0


class _QuietGate:
    """Bounded-budget wait-for-quiet-window helper (shared across attempts)."""

    def __init__(self):
        self.budget = float(os.environ.get("BENCH_QUIET_WAIT_S", "240"))

    def _quiet_now(self) -> bool:
        """fma probe (memory bus, instantaneous) + steal sampled UNDER a
        ~0.4 s fma burn (steal is zero on an idle VM even mid-window —
        the hypervisor only steals cycles that are demanded) — the two
        observed noise shapes on this VM."""
        if _fma_probe() > _PROBE_THRESH:
            return False
        st0, tot0 = _cpu_jiffies()
        t_end = time.perf_counter() + 0.4
        while time.perf_counter() < t_end:
            _fma_probe()
        st1, tot1 = _cpu_jiffies()
        return (st1 - st0) / max(1, tot1 - tot0) < _STEAL_FRAC_THRESH

    def wait(self, tag: str = "") -> bool:
        """Block until the probe is quiet or the budget runs out.

        Returns True if the window is quiet now."""
        quiet = self._quiet_now()
        waited = 0.0
        while not quiet and self.budget > 0:
            step = min(2.0, self.budget)
            time.sleep(step)
            self.budget -= step
            waited += step
            quiet = self._quiet_now()
        if waited:
            _stderr(f"quiet-gate[{tag}]: waited {waited:.0f}s "
                    f"(quiet={quiet}, budget left {self.budget:.0f}s)")
        return quiet

    def best_of(self, fn, repeats: int, tag: str) -> float:
        """Best-of-N wall time for fn(), each attempt probe-gated.

        If every attempt's post-probe was contended and budget remains,
        grants one extra attempt — the case where a noise window opened
        mid-run."""
        best = None
        any_quiet_finish = False
        attempts = repeats
        i = 0
        while i < attempts:
            self.wait(tag)
            st0, tot0 = _cpu_jiffies()
            t0 = time.time()
            fn()
            dt = time.time() - t0
            st1, tot1 = _cpu_jiffies()
            steal_frac = (st1 - st0) / max(1, tot1 - tot0)
            post_quiet = (_fma_probe() <= _PROBE_THRESH
                          and steal_frac < _STEAL_FRAC_THRESH)
            any_quiet_finish = any_quiet_finish or post_quiet
            if best is None or dt < best:
                best = dt
            _stderr(f"{tag}[{i}]: {dt:.2f}s (steal {steal_frac * 100:.1f}%, "
                    f"{'quiet' if post_quiet else 'CONTENDED'})")
            i += 1
            if i == attempts and not any_quiet_finish and self.budget > 0 \
                    and attempts < repeats + 2:
                attempts += 1  # contention-triggered extra repeat (max 2)
                self.budget -= dt  # extra wall time spends the wait budget
        return best


def run_bench() -> dict:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    # uneven input shards: one 10x parquet fragment showed up as a single
    # 13s straggler task through the whole map chain. A smaller dynamic
    # block-split target makes the reader slice oversized decoded blocks so
    # map tasks stay balanced at any input layout (cheap slicing, unlike
    # override_num_blocks which multiplies read tasks — measured 3x WORSE).
    ctx.target_max_block_size = 8 * 1024 * 1024
    # per-operator CPU reservation throttled the heavy detect map to ~13 of
    # 32 CPUs while the cheap read held a reserved share (fresh-process
    # A/B: extract 24.1s -> 18.6-22.0s with reservation off); with a
    # single dominant map stage, unreserved greedy scheduling wins
    ctx.op_resource_reservation_enabled = False

    import ray.data as rd

    from split_ner_ray import queries as Q
    from split_ner_ray.pipelines.kg import build_graph_datasets
    from split_ner_ray.synth import sf_of_dir, transcripts_path

    # materialize + warm (untimed); BENCH_NCONVS overrides corpus size
    # (the scaling run uses a larger corpus so compute dominates)
    n_convs = int(os.environ["BENCH_NCONVS"]) if os.environ.get("BENCH_NCONVS") else None
    tpath = transcripts_path(sf_dir, n_convs=n_convs)
    n_turns = rd.read_parquet(tpath).count()
    _stderr(f"transcripts ready: {tpath} ({n_turns} turns)")

    # headline: full KG construction, consumed by writing outputs.
    # Best-of-N (default 2): this VM shows minutes-long 20-100x slow
    # windows (not just +/-30%), and a single-shot headline was the one
    # number with no noise protection.
    kg_repeats = int(os.environ.get("BENCH_KG_REPEATS", "2"))
    cols = ["conv_id", "turn_idx", "text", "tool"]
    actors = max(2, num_cpus // 4)
    gate = _QuietGate()
    _kg_rep = [0]

    def _kg_once():
        out_dir = f"/tmp/bench_out/{os.getpid()}_{_kg_rep[0]}"
        _kg_rep[0] += 1
        triples, nodes, edges, mentions = build_graph_datasets(
            rd.read_parquet(tpath, columns=cols),
            concurrency=(1, actors),
            batch_size=1024,
            # per-rep job dir: above the auto-route threshold the
            # fingerprinted default would find rep 0's _SUCCESS and make
            # later reps time a parquet re-read instead of the build
            checkpoint_dir=os.path.join(out_dir, "kg_job"),
        )
        triples.write_parquet(os.path.join(out_dir, "triples"))
        nodes.write_parquet(os.path.join(out_dir, "nodes"))

    kg_wall = gate.best_of(_kg_once, kg_repeats, "kg")
    _stderr(f"kg build: {kg_wall:.1f}s best ({n_turns / kg_wall:.0f} turns/s)")

    qtimes = {}
    qnames = () if os.environ.get("BENCH_SKIP_QUERIES") else (
        "q1_pricing_summary",
        "events_sessions",
        "doc_quality",
        "dedup_minhash_docs",
        "ann_topk_cosine",
        # round 3: the end-to-end curation pipeline (quality filter,
        # exact dedup, Bloom keeper re-select, langid, BPE counts)
        "docs_curation_funnel",
        # round 4: regression visibility for the round-3 operator adds
        "doc_tfidf_topk",
        "kg_triangles",
        "kg_pagerank",
        "events_weekly_retention",
        # round 4 operator adds
        "doc_line_dedup",
        "ann_join_exhaustive",
        "dedup_delta_vs_corpus",
        "events_debounced",
        "doc_repetition",
        # round 5 operator adds
        "doc_lm_score",
        "doc_bm25_topk",
    )
    # best-of-N per query: this VM's wall clock varies +/-30% run to run,
    # so a single measurement is noise — the minimum of N in-session
    # repeats is the standard noisy-machine estimator (first repeat also
    # warms worker-process caches, matching steady-state behavior)
    q_repeats = int(os.environ.get("BENCH_QUERY_REPEATS", "3"))
    for name in qnames:
        fn, _sql = Q.QUERIES[name]
        best = gate.best_of(lambda: fn(sf_dir), q_repeats, name)
        qtimes[name] = round(best, 3)

    result = {
        "metric": "kg_build_wall_s",
        "value": round(kg_wall, 3),
        "unit": "sec",
        "queries": qtimes,
        "sf": sf_of_dir(sf_dir),
        "num_cpus": num_cpus,
        "n_turns": int(n_turns),
        "turns_per_sec": round(n_turns / kg_wall, 1),
        # diagnostics: memory-bus probe at exit + unused quiet-wait budget,
        # so the artifact itself records what window it was measured in
        "probe_ms": round(_fma_probe() * 1e3, 1),
        "quiet_budget_left_s": round(gate.budget, 1),
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    """Same job, two parallelism levels (N and 4N CPUs), fresh processes,
    identical input — the sandbox proxy for an N- vs 4N-node cluster.

    Level choice (SCALING_LEVELS, default "2,8"): this node's DRAM
    saturates at ~36 GB/s by 8 concurrent memory-streaming processes
    (measured: per-process copy bandwidth 6.8 / 6.0 / 4.5 / 2.3 / 1.3
    GB/s at 2 / 4 / 8 / 16 / 32 procs, while a pure-compute 60 s burn
    scales perfectly to 32 procs). Arrow/string processing is
    memory-bound, so any CPU pair crossing that wall (8->32, 4->16)
    measures the single shared memory bus — a resource a real 4x-node
    cluster multiplies with node count — not the engine's scaling. The
    2->8 pair stays below saturation, so CPU count is the only resource
    being varied, which is what the criterion's N->4N-node comparison
    means. Both pairs + the microbenchmark are reported in BASELINE.md.

    The scaling corpus is 4x the per-round bench corpus (BENCH_NCONVS):
    at bench size the job is scheduler/shuffle-latency bound (~8s of
    level-independent constants — Ray's fixed all-to-all latencies and
    per-execution scheduling — vs hundreds of core-s of compute), which
    no parallelism level helps — exactly as a 100 TB job would NOT be; at
    4x with the default 2->8 levels the slow level runs ~200 s, so
    compute dominates by >20x. Both runs use the identical input;
    generation is done (and page-cache warmed) by the parent before
    either child runs.
    """
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import ray

    from split_ner_ray.synth import n_convs_for_sf, sf_of_dir, transcripts_path

    levels = tuple(
        int(x) for x in os.environ.get("SCALING_LEVELS", "2,8").split(",")
    )
    n_convs = int(
        os.environ.get("SCALING_NCONVS", 4 * n_convs_for_sf(sf_of_dir(sf_dir)))
    )
    ray.init(address="local", num_cpus=32, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    tpath = transcripts_path(sf_dir, n_convs=n_convs)
    ray.shutdown()
    _stderr(f"scaling corpus ready: {tpath}")

    # this sandbox's VM timing varies +/-30% run to run (observed across
    # rounds; identical commands minutes apart differ 25.2s vs 33.4s);
    # take the best of SCALING_REPEATS fresh processes per level (standard
    # noisy-machine methodology) so the ratio reflects the code, not a
    # noisy neighbor
    repeats = int(os.environ.get("SCALING_REPEATS", "3"))
    gate = _QuietGate()
    out = {}
    attempts: dict[int, list[float]] = {n: [] for n in levels}
    # INTERLEAVE levels per round (2,8,2,8,...) rather than all-of-one-
    # level-then-the-other: this VM's noise drifts over minutes, and a
    # level-blocked schedule can pair one level's lucky window against
    # the other's slow one (observed: a 161.6 s 2-CPU outlier against a
    # 53 s 8-CPU window measured 0.76, while the interleave-equivalent
    # pooled attempts give 0.99) — alternating samples both levels from
    # the same window distribution
    for rep in range(repeats):
        for n in levels:
            gate.wait(f"scaling-{n}cpu")
            env = dict(os.environ, RAY_GRAFT_CPUS=str(n), GRAFT_SF_DIR=sf_dir,
                       BENCH_NCONVS=str(n_convs), BENCH_SKIP_QUERIES="1",
                       # noise protection comes from best-of-N fresh
                       # processes per level; no in-process repeat needed
                       BENCH_KG_REPEATS="1")
            r = subprocess.run(
                [sys.executable, os.path.join(os.path.dirname(__file__), "bench.py")],
                env=env,
                capture_output=True,
                text=True,
                check=True,
            )
            res = json.loads(r.stdout.strip().splitlines()[-1])
            _stderr(f"num_cpus={n}: {res['value']}s")
            attempts[n].append(res["value"])
            if n not in out or res["value"] < out[n]["value"]:
                out[n] = res
    lo, hi = levels
    t_lo, t_hi = out[lo]["value"], out[hi]["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    # the per-run best-of ratio is the noisiest artifact on this VM (the
    # low level's spread can pair a fast outlier against a slow window);
    # publish every attempt + the median-based ratio so any consumer can
    # pool runs under either estimator
    med = lambda xs: sorted(xs)[len(xs) // 2]
    eff_median = (med(attempts[lo]) / med(attempts[hi])) / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "levels": [lo, hi],
        f"sec_{lo}cpu": t_lo,
        f"sec_{hi}cpu": t_hi,
        f"throughput_{lo}": out[lo]["turns_per_sec"],
        f"throughput_{hi}": out[hi]["turns_per_sec"],
        "value_median": round(eff_median, 3),
        "attempts": {str(k): v for k, v in attempts.items()},
        "sf": out[hi]["sf"],
        "n_turns": out[hi]["n_turns"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
