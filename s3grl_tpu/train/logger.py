"""Run logger with highest-valid test selection.

Replicates the reference `Logger` (utils.py:745-792): per run a series of
(valid, test) metric pairs; statistics select the test score at the epoch with
the highest validation score, then mean ± std across runs.
"""
from __future__ import annotations

import sys
from typing import IO, List, Optional, Tuple

import numpy as np


class Logger:
    def __init__(self, runs: int, info=None):
        self.info = info
        self.results: List[List[Tuple[float, float]]] = [[] for _ in range(runs)]
        self.epochs: Optional[int] = None
        self.runs_count: Optional[int] = None

    def add_result(self, run: int, result: Tuple[float, float]) -> None:
        assert len(result) == 2
        assert 0 <= run < len(self.results)
        self.results[run].append(tuple(float(v) for v in result))

    def add_info(self, epochs: int, runs: int) -> None:
        self.epochs = epochs
        self.runs_count = runs

    def print_statistics(self, run: Optional[int] = None, f: IO = sys.stdout):
        """Per-run or all-run stats; returns best test (first run) for the
        all-run variant (reference parity: utils.py:759-792)."""
        if run is not None:
            result = 100 * np.asarray(self.results[run])
            argmax = int(result[:, 0].argmax())
            print(f"Run {run + 1:02d}:", file=f)
            print(f"Highest Valid: {result[:, 0].max():.2f}", file=f)
            print(f"Highest Eval Point: {argmax + 1}", file=f)
            print(f"Highest Test: {result[argmax, 1]:.2f}", file=f)
            print(
                f"Average Test: {result[:, 1].mean():.2f} ± {result[:, 1].std(ddof=1) if len(result) > 1 else 0.0:.2f}",
                file=f,
            )
            return None

        result = 100 * np.asarray(self.results)
        best_results = []
        for r in result:
            r = np.asarray(r)
            valid = r[:, 0].max()
            test = r[int(r[:, 0].argmax()), 1]
            best_results.append((valid, test))
        best = np.asarray(best_results)
        print("All runs:", file=f)
        v = best[:, 0]
        std_v = v.std(ddof=1) if len(v) > 1 else 0.0
        print(f"Highest Valid: {v.mean():.2f} ± {std_v:.2f}", file=f)
        t = best[:, 1]
        std_t = t.std(ddof=1) if len(t) > 1 else 0.0
        print(f"Highest Test: {t.mean():.2f} ± {std_t:.2f}", file=f)
        best_test = float(t[0])
        print(f"\n(Precision of 5)Highest Test: {t.mean():.5f} ± {std_t:.5f}\n", file=f)
        if self.epochs is not None:
            flat = result.reshape(-1, 2)[:, 1]
            std_f = flat.std(ddof=1) if len(flat) > 1 else 0.0
            print(f"Average Test: {flat.mean():.2f} ± {std_f:.2f}", file=f)
        return best_test

    def best_valid_test(self) -> Tuple[float, float]:
        """(mean highest-valid, mean selected-test) across runs, in [0, 1]."""
        best = []
        for r in self.results:
            if not r:
                continue
            arr = np.asarray(r)
            best.append((arr[:, 0].max(), arr[int(arr[:, 0].argmax()), 1]))
        arr = np.asarray(best)
        return float(arr[:, 0].mean()), float(arr[:, 1].mean())
