"""Micro-bench: the staircase PoS kernel alone, under the chip flock.

Times `pos_pallas_stair_large` (B=16, S=1024, D=3424, F=40, sign_k=3 — the
BlogCatalog bucket shape pinned in bench.py) with the chained-in-jit
marginal protocol, holding the shared chip flock so it never overlaps a
queue run. Prints one JSON line compatible with BENCH kernel_efficiency
rows (honest useful-FLOP units, VERDICT r4 next #6).
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main() -> None:
    from s3grl_tpu.utils.chiplock import chip_lock

    lock = chip_lock()
    import jax
    import jax.numpy as jnp

    from bench import _PEAK_BF16_FLOPS, _PEAK_HBM_BPS, _time_op
    from s3grl_tpu.ops.pos_pallas import _round_up, pos_power_rows

    assert jax.default_backend() == "tpu", jax.default_backend()
    import os

    B, S, D, F, R, K = 16, 1024, 3424, 40, 2, 3
    id_dt = jnp.int16 if os.environ.get("STAIR_COMPACT") == "1" else jnp.int32
    rng = np.random.default_rng(0)
    nbr = jnp.asarray(rng.integers(0, S, (B, S, D)), dtype=id_dt)
    deg = np.sort(np.minimum(
        D, ((rng.pareto(1.2, (B, S)) + 1) * 8).astype(np.int32)
    ), axis=1)[:, ::-1]
    w = jnp.asarray(
        (np.arange(D)[None, None, :] < deg[:, :, None]).astype(np.float32)
    )
    dc = D // 8
    n_c = (deg[:, None, :] > (np.arange(dc) * 8)[None, :, None]).sum(-1)
    tiles = jnp.asarray((n_c + 127) // 128, dtype=jnp.int32)
    x0 = jnp.asarray(rng.normal(size=(B, S, F)).astype(np.float32))
    sel = jnp.zeros((B, R), dtype=jnp.int32)

    def step(x, x0, sel, nbr, w, tiles, K=K):
        x = x0 if x is None else x
        out = pos_power_rows(sel, nbr, w, x, sign_k=K, chunk_tiles=tiles)
        return x + 1e-30 * jnp.sum(out)

    t0 = time.time()
    dt = _time_op(step, (x0, sel, nbr, w, tiles))
    f_pad = _round_up(F, 128)
    d_pad = _round_up(D, 8)
    # Useful FLOPs: the MXU power chain only (densify compares are VPU
    # bookkeeping, not matmul work); HBM bytes: one pass over the inputs.
    mm_flops = 2 * B * K * S * S * f_pad
    hbm_bytes = B * (2 * S * d_pad + S * f_pad) * 4
    out = {
        "tag": "pos_pallas_stair_large",
        "shape": {"B": B, "S": S, "D": D, "F": F, "sign_k": K},
        "wall_us": None if dt is None else round(dt * 1e6, 1),
        "elapsed_s": round(time.time() - t0, 1),
    }
    if dt is not None:
        out["mxu_f32_utilization"] = round(mm_flops / dt / _PEAK_BF16_FLOPS, 3)
        out["hbm_utilization"] = round(hbm_bytes / dt / _PEAK_HBM_BPS, 3)
        out["achieved_hbm_gbps"] = round(hbm_bytes / dt / 1e9, 1)
    print(json.dumps(out), flush=True)
    del lock


if __name__ == "__main__":
    main()
