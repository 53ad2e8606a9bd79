"""S3GRL-TPU: a TPU-native subgraph representation learning framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
venomouscyanide/S3GRL (Scalable Simplified Subgraph Representation Learning,
arXiv:2301.12562): link prediction via enclosing-subgraph extraction,
SIGN-style diffusion-operator precomputation (PoS / PoS+ / SoP / hybrid),
center + common-neighbor pooling and an MLP scorer — plus the SEAL-style GNN
baselines, heuristics, feature-initialization zoo and experiment tooling.

Design stance (vs the reference's per-link Python loops over scipy CSR):
everything is batched, padded, statically shaped and link-sharded so that XLA
can tile the work onto the MXU and `pjit` can scale it over a device mesh.
"""

__version__ = "0.1.0"

import os as _os


def _setup_compilation_cache() -> None:
    """Persistent XLA compilation cache: TPU compiles are tens of seconds, and
    the precompute pipeline uses a bounded family of (batch, bucket) shapes —
    caching them across processes removes recompilation from steady-state runs.
    Opt out with S3GRL_TPU_NO_COMPILE_CACHE=1."""
    if _os.environ.get("S3GRL_TPU_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        cache_dir = _os.environ.get(
            "S3GRL_TPU_COMPILE_CACHE", _os.path.expanduser("~/.cache/s3grl_tpu_xla")
        )
        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is an optimization, never a hard dependency
        pass


def _honor_platform_env() -> None:
    """Make JAX_PLATFORMS authoritative: on this image the experimental
    'axon' TPU plugin otherwise wins over the env var, so CPU-mesh runs
    (tests, virtual multi-device dry runs) would silently land on the TPU."""
    plat = _os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    try:
        import jax

        jax.config.update("jax_platforms", plat)
    except Exception:
        pass


_setup_compilation_cache()
_honor_platform_env()

from s3grl_tpu.config import RunConfig

__all__ = ["RunConfig", "__version__"]
