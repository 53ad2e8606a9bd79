"""Tests: WalkPool, baselines (MF/GNN/n2v), GAE/GIC init-representation,
heuristics, ScaLed, tuning, checkpointing."""
import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax

from s3grl_tpu.config import RunConfig
from s3grl_tpu.data.io import load_seal_txt
from s3grl_tpu.data.split import do_edge_split
from s3grl_tpu.runner import run_sgrl_learning
from s3grl_tpu.utils.seeding import seed_everything

DATA_ROOT = "/root/reference/data"


def small_setup(seed=1):
    rng, _ = seed_everything(seed)
    g = load_seal_txt(DATA_ROOT, "USAir")
    tg, split = do_edge_split(g, rng=rng)
    return tg, split, rng


def test_walkpool_learns():
    cfg = RunConfig(
        dataset="USAir", model="WalkPool", num_hops=1, hidden_channels=8,
        batch_size=32, lr=1e-3, epochs=2, seed=1, train_percent=15.0,
        val_percent=40.0, test_percent=40.0, max_subgraph_nodes=128,
        node_label="",
    )
    prep, best, tt, it, nparams = run_sgrl_learning(cfg)
    assert nparams > 0
    assert best > 60.0


def test_walkpool_drnl_variant():
    cfg = RunConfig(
        dataset="USAir", model="WalkPool", num_hops=1, hidden_channels=8,
        batch_size=32, lr=1e-3, epochs=1, seed=1, train_percent=10.0,
        val_percent=30.0, test_percent=30.0, max_subgraph_nodes=128,
        node_label="drnl",
    )
    _, best, _, _, _ = run_sgrl_learning(cfg)
    assert best > 50.0


def test_heuristics():
    tg, split, _ = small_setup()
    from s3grl_tpu.heuristics import run_heuristic

    for name, floor in (("CN", 0.80), ("AA", 0.80), ("PPR", 0.80)):
        cfg = RunConfig(dataset="USAir", use_heuristic=name)
        _, auc, _, _, _ = run_heuristic(tg, split, cfg)
        assert auc > floor, f"{name}: {auc}"


def test_heuristic_oracle_cn_aa():
    """CN/AA scores match scipy row-product formulas (utils.py:681-706)."""
    tg, split, _ = small_setup()
    from s3grl_tpu.heuristics import heuristic_scores

    A = tg.scipy_csr()
    links = split.test_pos[:50]
    got = heuristic_scores(tg, links, "CN")
    exp = np.array(
        [A[s].multiply(A[d]).sum() for s, d in links]
    )
    assert np.allclose(got, exp, atol=1e-4)

    got_aa = heuristic_scores(tg, links, "AA")
    mult = 1.0 / np.log(np.asarray(A.sum(axis=0)).ravel())
    mult[~np.isfinite(mult)] = 0.0
    A_ = A.multiply(mult).tocsr()
    exp_aa = np.array([A[s].multiply(A_[d]).sum() for s, d in links])
    assert np.allclose(got_aa, exp_aa, atol=1e-4)


def test_mf_baseline():
    tg, split, _ = small_setup()
    from s3grl_tpu.models.baselines import train_mf

    best, _ = train_mf(
        tg, split, hidden_channels=32, epochs=10, lr=0.01, seed=1
    )
    assert best > 50.0


def test_gnn_link_pred_baseline():
    tg, split, _ = small_setup()
    from s3grl_tpu.models.baselines import train_gnn

    best, _ = train_gnn(
        tg, split, layer="GCN", hidden_channels=32, epochs=15, lr=0.01, seed=1
    )
    assert best > 60.0


def test_gae_init_representation():
    tg, split, _ = small_setup()
    from s3grl_tpu.models.gae import run_gae

    sd = split.as_dict()
    tv = (
        sd["test"]["edge"].T, sd["test"]["edge_neg"].T,
        sd["valid"]["edge"].T, sd["valid"]["edge_neg"].T,
    )
    best, z = run_gae(
        tg, sd["train"]["edge"].T, tv, model="GAE",
        embedding_dim=16, hidden_channels=8, lr=0.01, epochs=20,
    )
    assert z.shape == (tg.num_nodes, 16)
    assert best > 55.0


def test_gic_runs():
    tg, split, _ = small_setup()
    from s3grl_tpu.models.gic import run_gic

    sd = split.as_dict()
    tv = (
        sd["test"]["edge"].T, sd["test"]["edge_neg"].T,
        sd["valid"]["edge"].T, sd["valid"]["edge_neg"].T,
    )
    best, z = run_gic(
        tg, sd["train"]["edge"].T, tv, embedding_dim=16, epochs=5, lr=0.01,
    )
    assert z.shape == (tg.num_nodes, 16)
    assert np.isfinite(z).all()


def test_scaled_rw_extraction():
    from s3grl_tpu.sampling.extraction import DeviceGraph
    from s3grl_tpu.sampling.random_walk import extract_rw_subgraphs

    tg, split, _ = small_setup()
    dg = DeviceGraph.from_graph(tg)
    links = jnp.asarray(split.train_pos[:8].astype(np.int32))
    seeds = jnp.asarray(np.arange(8, dtype=np.int32))
    sub = extract_rw_subgraphs(dg, links, seeds, rw_m=3, rw_M=5, max_nodes=64)
    nm = np.asarray(sub.node_mask)
    nodes = np.asarray(sub.nodes)
    # src/dst in front, valid, and walk-visited only
    assert nm[:, :2].all()
    assert np.array_equal(nodes[:, 0], np.asarray(links)[:, 0])
    # bound: 2 * M * (m + 1) nodes max
    assert nm.sum(axis=1).max() <= 2 * 5 * 4
    # deterministic per-link seeds
    sub2 = extract_rw_subgraphs(dg, links, seeds, rw_m=3, rw_M=5, max_nodes=64)
    assert np.array_equal(nodes, np.asarray(sub2.nodes))


def test_scaled_pos_end_to_end():
    cfg = RunConfig(
        dataset="USAir", model="SIGN", sign_type="PoS", optimize_sign=True,
        init_features="degree", use_feature=True, sign_k=2, node_label="zo",
        hidden_channels=16, batch_size=32, lr=1e-3, epochs=1, seed=1,
        m=3, M=5, train_percent=15.0, val_percent=40.0, test_percent=40.0,
        max_subgraph_nodes=64, subgraph_buckets=(64,),
    )
    _, best, _, _, _ = run_sgrl_learning(cfg)
    assert best > 55.0


def test_checkpoint_resume(tmp_path):
    base = dict(
        dataset="USAir", model="SIGN", sign_type="PoS", optimize_sign=True,
        init_features="degree", use_feature=True, sign_k=2, node_label="zo",
        hidden_channels=16, batch_size=32, lr=1e-3, seed=1,
        train_percent=15.0, val_percent=40.0, test_percent=40.0,
        max_subgraph_nodes=128, subgraph_buckets=(64, 128),
        res_dir=str(tmp_path), checkpoint_training=True,
    )
    cfg = RunConfig(**base, epochs=2)
    run_sgrl_learning(cfg)
    import os

    assert os.path.exists(tmp_path / "run1_model_checkpoint2.msgpack")
    cfg2 = RunConfig(**base, epochs=3, continue_from=2)
    _, best, _, _, _ = run_sgrl_learning(cfg2)
    assert best > 50.0


def test_tuning_harness():
    from s3grl_tpu.tuning import ray_tune_helper

    base = RunConfig(
        dataset="USAir", model="SIGN", sign_type="PoS", optimize_sign=True,
        init_features="degree", use_feature=True, node_label="zo", seed=1,
        train_percent=10.0, val_percent=30.0, test_percent=30.0,
        max_subgraph_nodes=128, subgraph_buckets=(64, 128),
    )
    calls = []

    def fake_run(cfg):
        calls.append(cfg)
        return 50.0 + cfg.hidden_channels / 100.0

    result = ray_tune_helper(
        base, num_samples=4, max_epochs=4, grace_period=2,
        results_json="/tmp/tune_test.json", run_fn=fake_run,
    )
    assert result["best_config"]["hidden_channels"] == max(
        c.hidden_channels for c in calls
    )
    assert len(calls) >= 4


def test_n2v_pretrain_finite_when_saturated():
    """Regression: the skip-gram negative loss must stay finite even when
    sigmoid saturates. The reference's log(1 - sigmoid + eps) form
    (PyG Node2Vec.loss) fuses to log(0) = -inf under XLA and NaN-poisons
    the embeddings within one epoch on USAir (n2v_prep.py:10-48 semantics)."""
    from s3grl_tpu.models.n2v import node2vec_pretrain

    tg, _, _ = small_setup()
    emb = node2vec_pretrain(tg, 16, epochs=2, seed=1)
    assert np.isfinite(emb).all(), "n2v embeddings contain NaN/inf"
    # embeddings must carry signal, not stay at init: columns uncorrelated
    # with N(0,1) init would keep ~unit std; training shifts the scale.
    assert emb.std() > 0


@pytest.mark.parametrize("m", [9, 17, 65, 129])
def test_svgae_vmf_numerics_vs_scipy(m):
    """bessel_ratio / log_iv / vmf_kl against scipy.special.ive oracles
    (the quantities the torch reference gets from s-vae-pytorch's ive),
    across the full claimed range: m in 9..129, kappa up to 1000
    (the bessel_ratio docstring's <=1e-4 relative-error claim; m=65 is the
    reference latent dim Z_DIM=64 + 1 in vmf mode, svgae.py:155)."""
    from scipy.special import ive, gammaln

    from s3grl_tpu.models.svgae import bessel_ratio, log_iv, vmf_kl

    nu = m / 2.0 - 1.0
    kappa = np.array([0.5, 1.0, 5.0, 20.0, 80.0, 300.0, 650.0, 1000.0])

    ours_ratio = np.asarray(bessel_ratio(nu + 1.0, jnp.asarray(kappa)))
    ref_ratio = ive(nu + 1.0, kappa) / ive(nu, kappa)
    np.testing.assert_allclose(ours_ratio, ref_ratio, rtol=1e-4)

    ours_logiv = np.asarray(log_iv(nu, jnp.asarray(kappa)))
    ref_logiv = np.log(ive(nu, kappa)) + kappa
    # Olver's expansion (+u1 term) is least accurate at small nu & small
    # kappa: worst observed ~9.6e-4 abs at m=9, kappa<=1 (m=65 — the
    # protocol's only m — stays under 2e-4).
    atol = 2e-4 if m >= 33 else 2e-3
    np.testing.assert_allclose(ours_logiv, ref_logiv, rtol=0, atol=atol)

    # full KL against the exact formula assembled from scipy parts
    ref_kl = (
        kappa * ref_ratio
        + (nu * np.log(kappa) - (nu + 1) * np.log(2 * np.pi) - ref_logiv)
        + (np.log(2.0) + (m / 2.0) * np.log(np.pi) - gammaln(m / 2.0))
    )
    ours_kl = np.asarray(vmf_kl(jnp.asarray(kappa), m))
    # dominant error is kappa * ratio_err (<=1e-4 rel) at large kappa:
    # ~0.05 abs at kappa=1000, up to ~1.6e-3 relative at small m
    np.testing.assert_allclose(ours_kl, ref_kl, rtol=3e-3, atol=1e-3)
    assert (ours_kl >= -1e-4).all()  # KL is nonnegative


def test_svgae_vmf_sampler():
    """Samples are unit-norm and concentrate around mu as kappa grows."""
    from s3grl_tpu.models.svgae import vmf_sample

    key = jax.random.PRNGKey(0)
    N, m = 256, 17
    mu = jax.random.normal(key, (N, m))
    mu = mu / jnp.linalg.norm(mu, axis=1, keepdims=True)
    for kap, min_cos in ((2.0, 0.0), (200.0, 0.9)):
        z = vmf_sample(
            jax.random.PRNGKey(1), mu, jnp.full((N, 1), kap)
        )
        nrm = np.asarray(jnp.linalg.norm(z, axis=1))
        np.testing.assert_allclose(nrm, 1.0, atol=1e-5)
        cos = np.asarray(jnp.sum(z * mu, axis=1))
        assert cos.mean() > min_cos


def test_svgae_init_representation_learns():
    tg, split, _ = small_setup()
    from s3grl_tpu.models.svgae import run_svgae

    sd = split.as_dict()
    tv = (
        sd["test"]["edge"].T, sd["test"]["edge_neg"].T,
        sd["valid"]["edge"].T, sd["valid"]["edge_neg"].T,
    )
    best, z = run_svgae(
        tg, sd["train"]["edge"].T, tv, embedding_dim=16, epochs=150,
        eval_every=25,
    )
    assert z.shape == (tg.num_nodes, 17)  # S^{m-1} with m = dim + 1
    np.testing.assert_allclose(np.linalg.norm(z, axis=1), 1.0, atol=1e-4)
    # reaches ~90 at 400 epochs (reference runs 2000); 150 is the fast check
    assert best > 65.0
