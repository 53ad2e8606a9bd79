"""Experiment-suite manager.

The TPU equivalent of ``sgrl_master_controller`` (sgrl_run_manager.py:105-181):
consumes the same suite JSON schema (``{"datasets": {id: {ds_params:
{runs, seeds, dataset}, hyperparams_per_run: {...}}}}``), loops runs x seeds,
aggregates mean ± std of runtime / best test AUC / prep time / per-epoch
train & inference time / params, and writes the same results-JSON shape.

CLI: ``python -m s3grl_tpu.manager --config suite.json --results_json out.json``
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

from s3grl_tpu.config import ExperimentSuite
from s3grl_tpu.runner import run_sgrl_learning
from s3grl_tpu.utils.seeding import seed_everything


def _mean_std(arr) -> str:
    arr = np.asarray(arr, dtype=np.float64)
    if arr.size == 0:
        return "0.00 ± 0.00"
    std = arr.std() if arr.size > 1 else 0.0
    return f"{arr.mean():.2f} ± {std:.2f}"


# Transient failure classes of the shared single-chip remote-TPU backend.
# RESOURCE_EXHAUSTED is what chip contention with a concurrent process
# produces (it killed all nine remaining round-3 queue groups in one
# cascade); the rest are tunnel/transport flakes. Anything else (shape
# errors, NaNs, OOM with a genuine cause) re-raises immediately.
_RETRYABLE_TOKENS = (
    "RESOURCE_EXHAUSTED",
    "DEADLINE_EXCEEDED",
    "UNAVAILABLE",
    "ABORTED",
    "CANCELLED",
    "connection",
)


def _run_with_retry(cfg, max_attempts: int = 3):
    """One seeded run under the chip lock, retrying transient TPU-backend
    failures with exponential backoff.

    In-process retries are capped low: after a RESOURCE_EXHAUSTED the
    backend handle may be permanently wedged, in which case only a fresh
    process recovers — raising lets the queue driver restart the group
    subprocess (seed-granular ``skip_existing`` makes that cheap).

    A daemon heartbeat keeps the queue log fresh during long silent runs
    (cold attributed prep can exceed the wrapper watchdog's 40 min): the
    runner only prints at run END, so without it a legitimately long run
    is indistinguishable from a tunnel hang. The heartbeat deliberately
    STOPS at ``deadline_s`` — past that, silence lets the watchdog kill
    and restart the group, bounding the loss from a genuine hang."""
    import contextlib
    import threading

    # Only the real TPU is a contended singleton; CPU runs (tests, virtual
    # meshes) must not queue behind a multi-minute TPU seed run. Decided
    # from the ENV via the shared affirmative-signal check (ADVICE r4 #3),
    # not jax.default_backend(): initializing the backend client here —
    # i.e. before acquiring the lock — is itself a device touch that can
    # OOM the current lock holder (observed r4).
    from s3grl_tpu.utils.chiplock import chip_is_contended

    if not chip_is_contended():
        def chip_lock():
            return contextlib.nullcontext()
    else:
        from s3grl_tpu.utils.chiplock import chip_lock

    stop = threading.Event()

    def _heartbeat(deadline_s: float = 5400.0, period_s: float = 600.0):
        t0 = time.monotonic()
        while not stop.wait(period_s):
            elapsed = time.monotonic() - t0
            if elapsed > deadline_s:
                return  # go silent; the wrapper watchdog takes over
            print(f"[hb] run in progress ({elapsed:.0f}s, "
                  f"{cfg.dataset} seed {cfg.seed})", flush=True)

    hb = threading.Thread(target=_heartbeat, daemon=True)
    hb.start()
    delay = 30.0
    try:
        for attempt in range(1, max_attempts + 1):
            try:
                with chip_lock():
                    # First device touch of the process happens HERE, under
                    # the lock (seed_everything creates a device PRNGKey).
                    seed_everything(cfg.seed)
                    return run_sgrl_learning(cfg)
            except Exception as e:  # noqa: BLE001 — classified below
                msg = f"{type(e).__name__}: {e}"
                retryable = any(tok.lower() in msg.lower()
                                for tok in _RETRYABLE_TOKENS)
                if not retryable or attempt == max_attempts:
                    raise
                print(f"retryable backend failure (attempt {attempt}/"
                      f"{max_attempts}), sleeping {delay:.0f}s: "
                      f"{msg[:200]}", flush=True)
                time.sleep(delay)
                delay = min(delay * 2, 600.0)
    finally:
        stop.set()


def sgrl_master_controller(
    config_path: str,
    results_json: str,
    only: str | None = None,
    max_seeds: int | None = None,
    skip_existing: bool = False,
) -> dict:
    """Run a suite JSON; ``only`` is a comma-separated identifier filter and
    ``max_seeds`` truncates each experiment's seed list (both are harness
    conveniences; the reference controller always runs the full grid).

    ``skip_existing`` resumes a partially-written results_json: identifiers
    already present with their full seed count are not rerun — lets one
    long-lived process work through a group of experiments (amortizing the
    remote-TPU pool claim + compile costs) and survive restarts.

    NOTE: no device touch happens here — the first device access (the
    runner's warm_transfer_async) is under the per-run chip lock. A
    controller-level warmup outside the lock allocated HBM while another
    process held the chip and OOM'd it mid-run (observed r4: a waiting
    1-seed verify run killed the queue's 43-min CiteSeer prep)."""
    suite = ExperimentSuite.load(config_path)
    exp_results: dict = {}
    if skip_existing and os.path.exists(results_json):
        with open(results_json) as f:
            exp_results = json.load(f)
    wanted = set(only.split(",")) if only else None
    # Index of the first run THIS process executes per experiment: it pays
    # every XLA compile (and the remote-TPU pool-claim stall), so it must
    # be excluded from the warm-prep mean even after a seed-granular
    # resume, where it is not index 0 (ADVICE r3 #3).
    process_virgin = True

    by_identifier: dict = {}
    for identifier, dataset, seed, cfg in suite.runs():
        if wanted is not None and identifier not in wanted:
            continue
        runs = by_identifier.setdefault(identifier, [])
        if max_seeds is not None and len(runs) >= max_seeds:
            continue
        runs.append((dataset, seed, cfg))

    for identifier, runs in by_identifier.items():
        done = 0
        if skip_existing and identifier in exp_results:
            done = exp_results[identifier].get("n_runs", 0)
            if done >= len(runs):
                print(f"skip {identifier} (already {done} runs)")
                continue
        best_test_scores, prep_times, total_run_times = [], [], []
        all_train_times, all_inference_times, total_params_arr = [], [], []
        cold_indices: list[int] = []
        ds_config = suite.experiments[identifier]
        if done:
            # Seed-granular resume: restore the per-run raw series the
            # previous process flushed and continue at seed done+1 instead
            # of redoing the whole experiment (a watchdog restart used to
            # lose up to seeds-1 finished runs).
            raw = exp_results[identifier].get("raw")
            if raw:
                best_test_scores = list(raw["best_test_scores"])[:done]
                prep_times = list(raw["prep_times"])[:done]
                total_run_times = list(raw["total_run_times"])[:done]
                all_train_times = list(raw["train_times"])
                all_inference_times = list(raw["inference_times"])
                total_params_arr = list(raw["total_params"])[:done]
                cold_indices = [i for i in raw.get("cold_indices", [0])
                                if i < done]
                print(f"resume {identifier} at run {done + 1}")
            else:  # old-format entry without raw series: restart it
                done = 0

        for run_no, (dataset, seed, cfg) in enumerate(runs, start=1):
            if run_no <= done:
                continue
            print(f"Run {run_no} of {dataset} with id {identifier}")
            if process_virgin:
                cold_indices.append(run_no - 1)
                process_virgin = False
            start = time.perf_counter()
            (
                total_prep_time,
                best_test_score,
                train_times,
                inference_times,
                total_params,
            ) = _run_with_retry(cfg)
            total_run_times.append(time.perf_counter() - start)
            prep_times.append(total_prep_time)
            best_test_scores.append(best_test_score)
            all_train_times.extend(train_times)
            all_inference_times.extend(inference_times)
            total_params_arr.append(total_params)

            # Checkpoint the aggregate after every seeded run (the reference
            # only writes at the end, sgrl_run_manager.py:169-181; per-run
            # flushes make long suites salvageable under a wall-clock cap).
            exp_results[identifier] = {
                "results": {
                    "Average Runtime": _mean_std(total_run_times),
                    "Average Test AUC": _mean_std(best_test_scores),
                    "Average Dataset Prep Time": _mean_std(prep_times),
                    # Marginal per-seed prep with one-off costs excluded:
                    # the FIRST seeded run pays every XLA compile (and, on
                    # the remote-TPU tunnel, the pool-claim stall); later
                    # seeds hit identical shapes and reuse every program.
                    # Reporting them pooled produced std ~ 2x mean rows that
                    # could anchor nothing (VERDICT r2 #3 / weak #3). After
                    # a seed-granular resume the restarted process's first
                    # run is cold too, whatever its index — cold_indices
                    # records every such resume boundary (ADVICE r3 #3).
                    "Average Dataset Prep Time (warm)": _mean_std(
                        [t for i, t in enumerate(prep_times)
                         if i != 0 and i not in cold_indices]
                        or prep_times
                    ),
                    "Average Train time per epoch": _mean_std(all_train_times),
                    "Average Inf time per epoch": _mean_std(
                        all_inference_times),
                    "Total Model Parameters": _mean_std(total_params_arr),
                },
                "config_dump": ds_config,
                # Sibling of the reference's results dict (not inside it, so
                # the schema stays field-for-field compatible): how many
                # seeded runs actually contributed, for BASELINE.md's seeds
                # column.
                "n_runs": run_no,
                # Raw per-run series so a restarted process can resume at
                # the next seed with exact aggregate continuity.
                "raw": {
                    "best_test_scores": best_test_scores,
                    "prep_times": prep_times,
                    "total_run_times": total_run_times,
                    "train_times": all_train_times,
                    "inference_times": all_inference_times,
                    "total_params": total_params_arr,
                    "cold_indices": cold_indices,
                },
            }
            tmp = results_json + ".tmp"
            with open(tmp, "w") as f:
                json.dump(exp_results, f)
            os.replace(tmp, results_json)
    return exp_results


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--results_json", type=str, default="result.json")
    parser.add_argument("--only", type=str, default=None)
    parser.add_argument("--max_seeds", type=int, default=None)
    parser.add_argument("--skip_existing", action="store_true")
    args = parser.parse_args()
    sgrl_master_controller(
        args.config, args.results_json, only=args.only,
        max_seeds=args.max_seeds, skip_existing=args.skip_existing,
    )


if __name__ == "__main__":
    main()
