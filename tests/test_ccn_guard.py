"""CCN truncation accuracy guard (VERDICT r4 weak #5 / next #8).

The PoS+ CCN row pad can truncate below the measured per-link maximum in
two shipped situations: an explicit ``max_ccn_nodes`` cap below the
measured width, and the device-tier halving under HBM pressure
(operators/pos.py). Both only warn. This test backs the policy with a
measured AUC differential on a DENSE configuration — Celegans under the
union node-set strategy, where the measured width is large and a hard cap
drops many links' furthest CCN rows — asserting that end-to-end test AUC
moves by at most a couple of points. The paper grid itself (intersection
strategy, |CCN| ~ 1) is far below any cap and unaffected.

Reference semantics being guarded: tuned_SIGN.py:238 keeps exactly |CCN|
rows per link (no cap, no pad).
"""
import warnings

import numpy as np
import pytest

pytest.importorskip("jax")

from s3grl_tpu.config import RunConfig
from s3grl_tpu.runner import run_sgrl_learning
from s3grl_tpu.utils.seeding import seed_everything


def _cfg(max_ccn: int) -> RunConfig:
    return RunConfig(
        dataset="Celegans", model="SIGN", sign_type="PoS", optimize_sign=True,
        init_features="degree", use_feature=True, node_label="zo",
        sign_k=2, num_hops=1, epochs=15, hidden_channels=32,
        batch_size=32, lr=1e-3, k_heuristic=1, k_node_set_strategy="union",
        k_pool_strategy="mean",
        max_ccn_nodes=max_ccn, train_percent=20.0, val_percent=50.0,
        test_percent=50.0, max_subgraph_nodes=128,
        subgraph_buckets=(32, 64, 128), delete_dataset=True, seed=1,
    )


def test_ccn_truncation_auc_guard():
    from s3grl_tpu.operators import pos as pos_mod

    pos_mod._EFF_CCN_STICKY.clear()
    seed_everything(1)
    with warnings.catch_warnings():
        warnings.simplefilter("error", UserWarning)
        # full width: cap far above any Celegans union count -> exact,
        # silent (the measure_ccn_width contract)
        _, full_auc, *_ = run_sgrl_learning(_cfg(max_ccn=10_000))

    pos_mod._EFF_CCN_STICKY.clear()
    seed_everything(1)
    with pytest.warns(UserWarning, match="CCN width capped"):
        _, capped_auc, *_ = run_sgrl_learning(_cfg(max_ccn=32))

    assert np.isfinite(full_auc) and np.isfinite(capped_auc)
    # DIRECTIONAL tripwire: truncation's risk is LOSING accuracy. The
    # single-seed noise band at this reduced protocol is ~±3 AUC (observed
    # across runs: capped-minus-full swung from +2.2 to -3.1), so this
    # test only catches CATASTROPHIC degradation; the quantitative
    # 10-seed differential is the ccn_guard protocol suite
    # (configs/guard/ccn_guard.json -> results/guard/ccn_guard.json),
    # which asserts the mean delta. The shipped defaults (pct=100, device
    # halving only under real HBM pressure) truncate far less than this
    # cap-32 stress.
    assert capped_auc >= full_auc - 4.0, (
        f"CCN cap-32 truncation dropped Celegans union AUC "
        f"{full_auc:.2f} -> {capped_auc:.2f}"
    )
