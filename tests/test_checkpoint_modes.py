"""Checkpoint / resume / only_test / test_multiple_models flows."""
import numpy as np

from s3grl_tpu.operators.common import OperatorDataset
from s3grl_tpu.train.loop import fit_signnet


def _toy_ds(rng, n=64, k=2, r=2, f=6):
    xs = rng.normal(size=(n, k + 1, r, f)).astype(np.float32)
    y = rng.integers(0, 2, n).astype(np.float32)
    # make it learnable: shift positives
    xs[y > 0.5] += 0.8
    return OperatorDataset(xs=xs, row_mask=np.ones((n, r), bool), y=y)


def test_checkpoint_resume_only_test_and_multi(tmp_path):
    rng = np.random.default_rng(0)
    tr, va, te = _toy_ds(rng), _toy_ds(rng, 32), _toy_ds(rng, 32)
    res_dir = str(tmp_path)
    kw = dict(sign_k=2, hidden_channels=16, batch_size=16, lr=1e-2,
              dropout=0.0, seed=1, res_dir=res_dir)

    fit = fit_signnet(tr, va, te, epochs=3, checkpoint_training=True, **kw)
    assert len(fit.results_per_epoch) == 3

    # resume from epoch 2: runs only 1 more epoch
    fit2 = fit_signnet(tr, va, te, epochs=3, continue_from=2, **kw)
    assert len(fit2.train_times) == 1

    # only_test: no training, single eval of the restored checkpoint
    fit3 = fit_signnet(tr, va, te, epochs=3, continue_from=3, only_test=True,
                       **kw)
    assert fit3.train_times == [] and len(fit3.results_per_epoch) == 1
    # restored final checkpoint must reproduce the final eval exactly
    assert np.isclose(
        fit3.results_per_epoch[0][0]["AUC"][1],
        fit.results_per_epoch[-1][0]["AUC"][1],
    )

    # test_multiple_models: one eval per saved checkpoint
    fit4 = fit_signnet(tr, va, te, epochs=3, test_multiple_models=True, **kw)
    assert len(fit4.results_per_epoch) == 3
    assert np.isclose(
        fit4.results_per_epoch[-1][0]["AUC"][1],
        fit.results_per_epoch[-1][0]["AUC"][1],
    )
