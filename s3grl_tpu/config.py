"""Typed run configuration.

Mirrors the flat flag namespace of the reference's three equivalent config
facades (argparse CLI `sgrl_link_pred.py:1478-1580`, `SGRLArgumentParser`
`sgrl_run_manager.py:12-102`, and the experiment-suite JSON under
`configs/paper/`), with the same field names and defaults, plus TPU-specific
knobs (padding/bucketing, dtype, mesh axes) that have no reference analog.
"""
from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence


@dataclass
class RunConfig:
    # ---- Data settings (reference: sgrl_link_pred.py:1479-1481) ----
    dataset: str = "USAir"
    fast_split: bool = False
    delete_dataset: bool = False

    # ---- Model settings (reference: sgrl_link_pred.py:1483-1487) ----
    model: str = "SIGN"  # SIGN | DGCNN | GCN | SAGE | GIN
    sortpool_k: float = 0.6
    num_layers: int = 3
    hidden_channels: int = 256
    batch_size: int = 32

    # ---- Subgraph extraction (reference: sgrl_link_pred.py:1489-1497) ----
    num_hops: int = 2
    ratio_per_hop: float = 1.0
    max_nodes_per_hop: Optional[int] = None
    node_label: str = "zo"  # drnl | hop | zo | de | de+ | degree
    use_feature: bool = True
    use_edge_weight: bool = False

    # ---- Training settings (reference: sgrl_link_pred.py:1499-1514) ----
    lr: float = 1e-4
    epochs: int = 50
    runs: int = 1
    train_percent: float = 100.0
    val_percent: float = 100.0
    test_percent: float = 100.0
    dynamic_train: bool = False
    dynamic_val: bool = False
    dynamic_test: bool = False
    num_workers: int = 0
    train_node_embedding: bool = False
    pretrained_node_embedding: Optional[str] = None

    # ---- Testing settings (reference: sgrl_link_pred.py:1516-1537) ----
    use_valedges_as_input: bool = False
    eval_steps: int = 1
    log_steps: int = 1
    checkpoint_training: bool = False
    data_appendix: str = ""
    save_appendix: str = ""
    keep_old: bool = False
    continue_from: Optional[int] = None
    only_test: bool = False
    test_multiple_models: bool = False
    use_heuristic: Optional[str] = None  # CN | AA | PPR
    dataset_stats: bool = False

    # ---- ScaLed random-walk sampling (reference: sgrl_link_pred.py:1538-1540) ----
    m: int = 0  # walk length
    M: int = 0  # number of walks
    dropedge: float = 0.0

    # ---- Misc run control (reference: sgrl_link_pred.py:1541-1560) ----
    cuda_device: int = 0  # kept for config-file compatibility; ignored on TPU
    calc_ratio: bool = False
    pairwise: bool = False
    loss_fn: str = ""  # auc_loss | hinge_auc_loss
    neg_ratio: int = 1
    profile: bool = False
    split_val_ratio: float = 0.05
    split_test_ratio: float = 0.1
    train_mlp: bool = False
    train_gae: bool = False
    base_gae: str = ""
    dropout: float = 0.5
    seed: int = 1
    dataset_split_num: int = 1
    train_n2v: bool = False
    train_mf: bool = False

    # ---- SIGN / S3GRL settings (reference: sgrl_link_pred.py:1565-1578) ----
    sign_k: int = 3
    sign_type: str = ""  # PoS | SoP | hybrid
    pool_operatorwise: bool = False
    optimize_sign: bool = False
    init_features: str = ""  # degree | eye | n2v
    n2v_dim: int = 256
    k_heuristic: int = 0
    k_node_set_strategy: str = ""  # union | intersection
    k_pool_strategy: str = ""  # mean | sum | concat
    init_representation: str = ""  # GIC | ARGVA | GAE | VGAE | SVGAE

    # ---- TPU-native knobs (no reference analog) ----
    # Subgraph node-count pad. Per-link subgraphs are padded to the smallest
    # bucket >= their size so XLA compiles one kernel per bucket, not per
    # shape. The cap must cover the k-hop neighborhoods of the target
    # datasets (the reference never truncates); 4096 covers every paper
    # dataset at hops<=3 except the largest Pubmed tails.
    max_subgraph_nodes: int = 4096
    subgraph_buckets: Sequence[int] = (32, 64, 128, 256, 512, 1024, 2048, 4096)
    # Max CCN (common/combined neighbor) rows kept for PoS+ pooling.
    max_ccn_nodes: int = 32
    # Labeling BFS iteration cap (distances beyond are treated unreachable).
    max_label_dist: int = 32
    # Precompute link-batch size (how many links are extracted per device step).
    extract_batch_size: int = 512
    # Compute dtype for diffusion matmuls ("float32" or "bfloat16").
    operator_dtype: str = "float32"
    # Use the Pallas SpMM kernel for global power chains (else XLA segment-sum).
    use_pallas_spmm: bool = True
    # Mesh axis sizes; data axis shards the link batch. 0 = use all devices.
    mesh_data_axis: int = 0
    # Where dataset files live (reference repo layout is honored).
    data_root: str = "/root/reference/data"
    results_dir: str = "results"

    # ---- Derived / bookkeeping ----
    eval_metric: str = "auc"
    res_dir: str = ""

    def validate(self) -> None:
        """Cross-flag invariants (reference: sgrl_link_pred.py:1587-1600)."""
        if self.model == "SIGN" and not self.init_features and not self.use_feature:
            raise ValueError(
                "Need to init features to have SIGN work. (X) cannot be None. "
                "Choose between eye, degree and n2v."
            )
        if self.model == "SIGN" and any(
            [self.dynamic_train, self.dynamic_test, self.dynamic_val]
        ):
            raise ValueError("SIGN does not support dynamic datasets.")
        if self.sign_type in ("SoP", "hybrid") and not self.pool_operatorwise:
            raise ValueError(
                f"Cannot run SoP with pool_operatorwise: {self.pool_operatorwise}"
            )
        if self.sign_type == "hybrid" and not self.optimize_sign:
            raise ValueError(
                f"Cannot run hybrid mode with optimize_sign set to {self.optimize_sign}"
            )
        if self.node_label not in ("drnl", "hop", "zo", "de", "de+", "degree", ""):
            raise ValueError(f"Unknown node_label {self.node_label}")
        if self.only_test and self.continue_from is None:
            raise ValueError(
                "only_test evaluates a restored checkpoint; set continue_from "
                "to the checkpoint epoch (otherwise a freshly initialized "
                "model would be scored)"
            )

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "RunConfig":
        """Build from a reference-style hyperparams dict, ignoring unknown keys."""
        names = {f.name for f in dataclasses.fields(cls)}
        known = {k: v for k, v in d.items() if k in names}
        # Reference JSON uses None for loss_fn etc.; normalize.
        for k in ("loss_fn", "sign_type", "init_features", "init_representation",
                  "k_node_set_strategy", "k_pool_strategy", "data_appendix",
                  "save_appendix", "base_gae"):
            if known.get(k) is None:
                known[k] = ""
        if known.get("use_heuristic") == "":
            known["use_heuristic"] = None
        return cls(**known)

    def to_dict(self) -> dict[str, Any]:
        return dataclasses.asdict(self)

    def replace(self, **kw: Any) -> "RunConfig":
        return dataclasses.replace(self, **kw)


@dataclass
class ExperimentSuite:
    """One experiment-suite JSON: {datasets: {id: {ds_params, hyperparams_per_run}}}.

    Same schema as the reference's `configs/paper/*.json`
    (consumed by `sgrl_master_controller`, sgrl_run_manager.py:105-181).
    """

    experiments: dict[str, dict[str, Any]] = field(default_factory=dict)

    @classmethod
    def load(cls, path: str) -> "ExperimentSuite":
        if not os.path.exists(path) and os.sep + "paper" + os.sep in path:
            # Paper suites are generated artifacts; build them on first use.
            import importlib.util

            gen_py = os.path.join(
                os.path.dirname(os.path.dirname(path)), "generate_paper_suites.py"
            )
            if os.path.exists(gen_py):
                spec = importlib.util.spec_from_file_location("gen_suites", gen_py)
                mod = importlib.util.module_from_spec(spec)
                spec.loader.exec_module(mod)
                mod.main(os.path.dirname(path))
        with open(path) as f:
            raw = json.load(f)
        return cls(experiments=raw["datasets"])

    def runs(self):
        """Yield (identifier, dataset, seed, RunConfig) for every (run, seed)."""
        for identifier, ds_config in self.experiments.items():
            ds_params = ds_config["ds_params"]
            n_runs = ds_params["runs"]
            seeds = ds_params["seeds"]
            dataset = ds_params["dataset"]
            kwargs = dict(ds_config["hyperparams_per_run"])
            for run, seed in zip(range(1, n_runs + 1), seeds):
                kwargs.update({"dataset": dataset, "seed": seed})
                yield identifier, dataset, seed, RunConfig.from_dict(kwargs)
