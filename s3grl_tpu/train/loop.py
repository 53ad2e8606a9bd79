"""Training / evaluation engines for the SIGN scorer.

Replaces the reference's torch loops (``train_bce`` sgrl_link_pred.py:440-472,
``test`` :538-587) with a single jitted train step over padded link batches:
the whole precomputed operator dataset lives on device, each step gathers a
shuffled batch, computes masked-mean BCE-with-logits, and applies Adam with
additive weight decay 1e-4 (torch Adam ``weight_decay`` semantics:
grad + wd * p before the moment updates — sgrl_link_pred.py:1317).
"""
from __future__ import annotations

import functools
import os
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from s3grl_tpu.models.signnet import SIGNNet
from s3grl_tpu.operators.common import OperatorDataset
from s3grl_tpu.train.metrics import evaluate_auc


def bce_with_logits(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Elementwise BCEWithLogitsLoss (numerically stable torch formula)."""
    return (
        jnp.maximum(logits, 0.0)
        - logits * labels
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def make_optimizer(lr: float, weight_decay: float = 1e-4) -> optax.GradientTransformation:
    """torch.optim.Adam(lr, weight_decay): L2 added to grads, then Adam."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8),
    )


@dataclass
class FitResult:
    results_per_epoch: list  # [(results_dict, inference_time_s)]
    train_times: list
    inference_times: list
    num_params: int
    final_variables: dict = field(default=None, repr=False)


def _count_params(params) -> int:
    return int(sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params)))


def fit_signnet(
    train_ds: OperatorDataset,
    val_ds: OperatorDataset,
    test_ds: OperatorDataset,
    *,
    sign_k: int,
    hidden_channels: int = 256,
    num_layers: Optional[int] = None,
    batch_size: int = 32,
    lr: float = 1e-4,
    epochs: int = 50,
    dropout: float = 0.5,
    k_heuristic: int = 0,
    k_pool_strategy: str = "",
    pool_operatorwise: bool = False,
    last_only: bool = False,
    seed: int = 1,
    eval_steps: int = 1,
    eval_fn: Callable = evaluate_auc,
    loss_fn: str = "",
    neg_ratio: int = 1,
    logger_hook: Optional[Callable] = None,
    pairwise: bool = False,
    checkpoint_training: bool = False,
    continue_from: Optional[int] = None,
    only_test: bool = False,
    test_multiple_models: bool = False,
    res_dir: str = "",
    run: int = 1,
    log_steps: int = 1,
) -> FitResult:
    """Train SIGNNet on precomputed operator datasets; returns FitResult."""
    if num_layers is None:
        num_layers = sign_k
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)

    # ---- Assemble device-resident arrays ----
    # Datasets stay in their [L, O, R, F] precompute layout (possibly already
    # device-resident, possibly bf16): the operator concat the model wants
    # ([L, R, O*F], OperatorDataset.model_inputs) would be a second full-size
    # copy of the dataset — for paper-scale attributed datasets that copy is
    # gigabytes. Instead each BATCH is reshaped inside the jitted step
    # (a transpose XLA fuses into the gather).
    def to_dev(ds: OperatorDataset):
        xs = ds.xs
        n_ops = xs.shape[1]
        if last_only:
            if n_ops > 1:
                xs = xs[:, n_ops - 1 :]
        elif sign_k + 1 < n_ops:
            xs = xs[:, : sign_k + 1]
        return (
            jnp.asarray(xs),
            jnp.asarray(ds.row_mask),
            jnp.asarray(ds.y, dtype=jnp.float32),
        )

    def flat(xb):
        """[B, O, R, F] -> [B, R, O*F] feature-wise operator concat
        (sgrl_link_pred.py:449-459 xs assembly), in f32."""
        B_, O_, R_, F_ = xb.shape
        out = jnp.transpose(xb, (0, 2, 1, 3)).reshape(B_, R_, O_ * F_)
        return out.astype(jnp.float32)

    x_tr, m_tr, y_tr = to_dev(train_ds)
    x_va, m_va, y_va = to_dev(val_ds)
    x_te, m_te, y_te = to_dev(test_ds)
    L = x_tr.shape[0]

    model = SIGNNet(
        hidden_channels=hidden_channels,
        num_layers=num_layers,
        dropout=dropout,
        pool_operatorwise=pool_operatorwise,
        k_heuristic=k_heuristic,
        k_pool_strategy=k_pool_strategy,
    )
    key, init_key, drop_key = jax.random.split(key, 3)
    variables = model.init(
        {"params": init_key, "dropout": drop_key},
        flat(x_tr[:2]),
        m_tr[:2],
        train=True,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(lr)
    opt_state = tx.init(params)
    n_params = _count_params(params)

    steps = (L + batch_size - 1) // batch_size
    L_pad = steps * batch_size

    # Dataset tensors are explicit jit ARGUMENTS, never closure captures:
    # captured device arrays get baked into the jaxpr as constants, which
    # bloats the program and defeats the persistent compilation cache.
    @jax.jit
    def train_epoch(params, batch_stats, opt_state, x_tr, m_tr, y_tr, perm, w, key):
        """One full epoch as a single device program: lax.scan over batches.

        The reference dispatches one optimizer step per DataLoader batch from
        the host (train_bce, sgrl_link_pred.py:440-472); over a TPU tunnel
        that per-step round trip dominates, so the whole epoch runs device-side.
        """

        def body(carry, s):
            params, batch_stats, opt_state = carry
            idx = jax.lax.dynamic_slice(perm, (s * batch_size,), (batch_size,))
            wb = jax.lax.dynamic_slice(w, (s * batch_size,), (batch_size,))
            xb, mb, yb = flat(x_tr[idx]), m_tr[idx], y_tr[idx]
            dkey = jax.random.fold_in(key, s)

            def loss_fn_(p):
                out, mut = model.apply(
                    {"params": p, "batch_stats": batch_stats},
                    xb,
                    mb,
                    train=True,
                    rngs={"dropout": dkey},
                    mutable=["batch_stats"],
                )
                losses = bce_with_logits(out, yb)
                loss = (losses * wb).sum() / jnp.maximum(wb.sum(), 1.0)
                return loss, mut["batch_stats"]

            (loss, new_bs), grads = jax.value_and_grad(loss_fn_, has_aux=True)(
                params
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, new_bs, opt_state), loss * wb.sum()

        (params, batch_stats, opt_state), losses = jax.lax.scan(
            body, (params, batch_stats, opt_state), jnp.arange(steps)
        )
        return params, batch_stats, opt_state, losses.sum()

    # --- pairwise training (reference train_pairwise, sgrl_link_pred.py:
    # 475-526, with the PLNLP losses of custom_losses.py:5-16) ---
    pos_idx_np = np.nonzero(np.asarray(y_tr) == 1)[0]
    neg_idx_np = np.nonzero(np.asarray(y_tr) == 0)[0]
    p_steps = max(len(pos_idx_np) // batch_size, 1) if pairwise else 0
    neg_bsz = batch_size * neg_ratio

    @jax.jit
    def train_epoch_pairwise(
        params, batch_stats, opt_state, x_tr, m_tr, pos_perm, neg_perm, key
    ):
        def body(carry, s):
            params, batch_stats, opt_state = carry
            pidx = jax.lax.dynamic_slice(pos_perm, (s * batch_size,), (batch_size,))
            nidx = jax.lax.dynamic_slice(neg_perm, (s * neg_bsz,), (neg_bsz,))
            dkey = jax.random.fold_in(key, s)

            def loss_fn_(p):
                pos_out, mut = model.apply(
                    {"params": p, "batch_stats": batch_stats},
                    flat(x_tr[pidx]), m_tr[pidx], train=True,
                    rngs={"dropout": dkey}, mutable=["batch_stats"],
                )
                neg_out, mut2 = model.apply(
                    {"params": p, "batch_stats": mut["batch_stats"]},
                    flat(x_tr[nidx]), m_tr[nidx], train=True,
                    rngs={"dropout": dkey}, mutable=["batch_stats"],
                )
                pos_out = pos_out.reshape(-1, 1)
                if loss_fn == "weighted_auc_loss":
                    # custom_losses.py:18-21; the run loop passes neg_ratio
                    # as the weight and reshapes neg_out to (-1, 1)
                    # (sgrl_link_pred.py:521-522).
                    loss = (
                        float(neg_ratio)
                        * (1 - (pos_out - neg_out.reshape(-1, 1))) ** 2
                    ).sum()
                elif loss_fn == "hinge_auc_loss":
                    neg_out = neg_out.reshape(-1, neg_ratio)
                    loss = (jnp.clip(1 - (pos_out - neg_out), min=0) ** 2).sum()
                else:  # auc_loss (default)
                    neg_out = neg_out.reshape(-1, neg_ratio)
                    loss = ((1 - (pos_out - neg_out)) ** 2).sum()
                return loss, mut2["batch_stats"]

            (loss, new_bs), grads = jax.value_and_grad(loss_fn_, has_aux=True)(
                params
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, new_bs, opt_state), loss

        (params, batch_stats, opt_state), losses = jax.lax.scan(
            body, (params, batch_stats, opt_state), jnp.arange(p_steps)
        )
        return params, batch_stats, opt_state, losses.sum()

    @jax.jit
    def predict(params, batch_stats, xb, mb):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            flat(xb), mb, train=False,
        )

    def predict_all(x, m, bsz: int = 1024):
        outs = []
        n = x.shape[0]
        for s in range(0, n, bsz):
            xb, mb = x[s : s + bsz], m[s : s + bsz]
            pad = 0
            if xb.shape[0] < bsz:
                pad = bsz - xb.shape[0]
                xb = jnp.pad(xb, ((0, pad), (0, 0), (0, 0), (0, 0)))
                mb = jnp.pad(mb, ((0, pad), (0, 0)))
            o = predict(params, batch_stats, xb, mb)
            outs.append(np.asarray(o)[: bsz - pad])
        return np.concatenate(outs)

    # ---- checkpointed resume (reference: sgrl_link_pred.py:1328-1338) ----
    start_epoch = 1
    if continue_from is not None:
        from s3grl_tpu.train.checkpoint import load_checkpoint

        params, batch_stats, opt_state = load_checkpoint(
            res_dir, run, continue_from, params, batch_stats, opt_state
        )
        start_epoch = continue_from + 1
        epochs = epochs - continue_from  # reference: sgrl_link_pred.py:1338

    if only_test:
        # Evaluate the restored checkpoint, no training
        # (reference: sgrl_link_pred.py:1340-1352).
        val_pred = predict_all(x_va, m_va)
        t1 = time.perf_counter()
        test_pred = predict_all(x_te, m_te)
        t_inf = time.perf_counter() - t1
        results = eval_fn(val_pred, np.asarray(y_va), test_pred, np.asarray(y_te))
        return FitResult(
            results_per_epoch=[(results, t_inf)],
            train_times=[],
            inference_times=[t_inf],
            num_params=n_params,
            final_variables={"params": params, "batch_stats": batch_stats},
        )

    if test_multiple_models:
        # Evaluate every saved checkpoint in res_dir
        # (reference: sgrl_link_pred.py:1354-1380).
        import glob
        import re

        from s3grl_tpu.train.checkpoint import load_checkpoint

        results_per_epoch = []
        inference_times = []
        pattern = os.path.join(res_dir, f"run{run}_model_checkpoint*.msgpack")
        epochs_found = sorted(
            int(m.group(1))
            for p in glob.glob(pattern)
            if (m := re.search(r"checkpoint(\d+)", p))
        )
        for ckpt_epoch in epochs_found:
            params, batch_stats, opt_state = load_checkpoint(
                res_dir, run, ckpt_epoch, params, batch_stats, opt_state
            )
            val_pred = predict_all(x_va, m_va)
            t1 = time.perf_counter()
            test_pred = predict_all(x_te, m_te)
            t_inf = time.perf_counter() - t1
            inference_times.append(t_inf)
            results_per_epoch.append(
                (eval_fn(val_pred, np.asarray(y_va), test_pred,
                         np.asarray(y_te)), t_inf)
            )
        return FitResult(
            results_per_epoch=results_per_epoch,
            train_times=[],
            inference_times=inference_times,
            num_params=n_params,
            final_variables={"params": params, "batch_stats": batch_stats},
        )

    # ---- epochs ----
    results_per_epoch = []
    train_times, inference_times = [], []
    w_full = np.zeros(L_pad, dtype=np.float32)
    w_full[:L] = 1.0
    w_dev = jnp.asarray(w_full)
    for epoch in range(start_epoch, start_epoch + epochs):
        t0 = time.perf_counter()
        key, ekey = jax.random.split(key)
        if pairwise:
            pperm = pos_idx_np[rng.permutation(len(pos_idx_np))]
            npad = p_steps * neg_bsz
            nperm = neg_idx_np[
                rng.permutation(len(neg_idx_np))[:npad]
                if len(neg_idx_np) >= npad
                else rng.choice(len(neg_idx_np), npad)
            ]
            if len(pperm) < p_steps * batch_size:
                pperm = np.concatenate(
                    [pperm, pperm[: p_steps * batch_size - len(pperm)]]
                )
            params, batch_stats, opt_state, loss_sum = train_epoch_pairwise(
                params, batch_stats, opt_state, x_tr, m_tr,
                jnp.asarray(pperm), jnp.asarray(nperm), ekey,
            )
        else:
            perm = rng.permutation(L)
            perm_pad = np.concatenate(
                [perm, np.zeros(L_pad - L, dtype=perm.dtype)]
            )
            params, batch_stats, opt_state, loss_sum = train_epoch(
                params, batch_stats, opt_state, x_tr, m_tr, y_tr,
                jnp.asarray(perm_pad), w_dev, ekey,
            )
        total = float(loss_sum)
        train_times.append(time.perf_counter() - t0)

        if checkpoint_training and epoch % log_steps == 0 and res_dir:
            from s3grl_tpu.train.checkpoint import save_checkpoint

            save_checkpoint(res_dir, run, epoch, params, batch_stats, opt_state)

        if epoch % eval_steps == 0:
            val_pred = predict_all(x_va, m_va)
            t1 = time.perf_counter()
            test_pred = predict_all(x_te, m_te)
            t_inf = time.perf_counter() - t1
            inference_times.append(t_inf)
            results = eval_fn(
                val_pred, np.asarray(y_va), test_pred, np.asarray(y_te)
            )
            results_per_epoch.append((results, t_inf))
            if logger_hook is not None:
                logger_hook(epoch, total / L, results)

    return FitResult(
        results_per_epoch=results_per_epoch,
        train_times=train_times,
        inference_times=inference_times,
        num_params=n_params,
        final_variables={"params": params, "batch_stats": batch_stats},
    )
