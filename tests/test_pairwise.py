"""End-to-end pairwise training (reference train_pairwise,
sgrl_link_pred.py:475-526) with the three PLNLP losses
(custom_losses.py:5-21)."""
import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from s3grl_tpu.config import RunConfig
from s3grl_tpu.runner import run_sgrl_learning
from s3grl_tpu.utils.seeding import seed_everything


def _cfg(loss_fn, epochs=12):
    return RunConfig(
        dataset="USAir", model="SIGN", sign_type="PoS", optimize_sign=True,
        init_features="degree", use_feature=True, node_label="zo",
        sign_k=2, num_hops=1, epochs=epochs, hidden_channels=32,
        batch_size=32, lr=1e-3, pairwise=True, loss_fn=loss_fn, neg_ratio=1,
        train_percent=20.0, val_percent=50.0, test_percent=50.0,
        max_subgraph_nodes=128, subgraph_buckets=(32, 64, 128),
        delete_dataset=True, seed=1,
    )


@pytest.mark.parametrize("loss_fn", ["auc_loss", "weighted_auc_loss"])
def test_pairwise_end_to_end_learns(loss_fn):
    seed_everything(1)
    prep, best, tts, its, params = run_sgrl_learning(_cfg(loss_fn))
    assert np.isfinite(best)
    # pairwise AUC losses directly optimize ranking: clearly above chance
    assert best > 55.0, f"{loss_fn}: best test {best}"


def test_pairwise_hinge_trains():
    """hinge_auc_loss optimizes its objective (loss decreases); its ranking
    quality on this tiny config is weak in the reference formulation too
    (per-class forward passes), so only the optimization is asserted."""
    from s3grl_tpu.runner import build_split_links, precompute_split
    from s3grl_tpu.data.io import load_dataset
    from s3grl_tpu.data.split import do_edge_split
    from s3grl_tpu.data.features import init_features
    from s3grl_tpu.sampling.extraction import DeviceGraph
    from s3grl_tpu.train.loop import fit_signnet

    cfg = _cfg("hinge_auc_loss")
    rng, _ = seed_everything(1)
    full = load_dataset(cfg.dataset, cfg.data_root)
    graph, es = do_edge_split(full, rng=rng)
    graph = init_features(graph, "degree", seed=1)
    dg = DeviceGraph.from_graph(graph)
    ds = {}
    for split, pct in (("train", 20.0), ("valid", 50.0), ("test", 50.0)):
        links, y = build_split_links(split, es, pct, rng)
        ds[split] = precompute_split(dg, links, y, cfg)
    losses = []
    fit = fit_signnet(
        ds["train"], ds["valid"], ds["test"], sign_k=2, hidden_channels=32,
        batch_size=32, lr=1e-3, epochs=12, pairwise=True,
        loss_fn="hinge_auc_loss", neg_ratio=1, seed=1,
        logger_hook=lambda e, l, r: losses.append(l),
    )
    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses


def test_pairwise_matches_loss_formulas():
    """The jitted pairwise losses equal the PLNLP formulas on fixed logits."""
    pos = jnp.asarray([0.5, 1.5, -0.2]).reshape(-1, 1)
    neg = jnp.asarray([0.1, 2.0, 0.3]).reshape(-1, 1)
    auc = float(((1 - (pos - neg)) ** 2).sum())
    hinge = float((jnp.clip(1 - (pos - neg), min=0) ** 2).sum())
    weighted = float((2.0 * (1 - (pos - neg)) ** 2).sum())
    np.testing.assert_allclose(auc, ((1 - (0.5 - 0.1)) ** 2 + (1 - (1.5 - 2.0)) ** 2 + (1 - (-0.2 - 0.3)) ** 2), rtol=1e-6)
    assert hinge <= auc
    np.testing.assert_allclose(weighted, 2.0 * auc, rtol=1e-6)
