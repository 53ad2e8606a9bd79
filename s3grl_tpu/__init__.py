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

from s3grl_tpu.config import RunConfig

__all__ = ["RunConfig", "__version__"]
