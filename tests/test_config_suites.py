"""Paper config-suite corpus: generation, schema, and RunConfig round-trip."""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PAPER = os.path.join(REPO, "configs", "paper")

EXPECTED = {
    "auc_s3grl": 42,
    "table_2": 30,
    "scaled": 8,
    "profiling_attr": 30,
    "profiling_non": 25,
}


@pytest.fixture(scope="module", autouse=True)
def generated():
    subprocess.run(
        [sys.executable, os.path.join(REPO, "configs", "generate_paper_suites.py")],
        check=True,
        capture_output=True,
    )


REFERENCE_PAPER = "/root/reference/configs/paper"


@pytest.mark.parametrize("name", sorted(EXPECTED))
def test_suite_equals_reference_exactly(name):
    """Generated suites are field-for-field EQUAL to the reference's
    (/root/reference/configs/paper/*.json) — full parsed-JSON equality,
    no exception list (VERDICT r2 item 8; includes cuda_device, which the
    TPU runner accepts and ignores, config.py:74)."""
    ref_path = os.path.join(REFERENCE_PAPER, f"{name}.json")
    if not os.path.exists(ref_path):
        pytest.skip("reference config corpus not available")
    with open(os.path.join(PAPER, f"{name}.json")) as f:
        ours = json.load(f)
    with open(ref_path) as f:
        ref = json.load(f)
    assert ours == ref


@pytest.mark.parametrize("name,count", sorted(EXPECTED.items()))
def test_suite_sizes_and_schema(name, count):
    with open(os.path.join(PAPER, f"{name}.json")) as f:
        suite = json.load(f)
    assert len(suite["datasets"]) == count
    for exp in suite["datasets"].values():
        ds = exp["ds_params"]
        assert set(ds) == {"runs", "seeds", "dataset"}
        assert len(ds["seeds"]) == ds["runs"]
        assert "model" in exp["hyperparams_per_run"]


def test_all_experiments_validate_as_runconfigs():
    from s3grl_tpu.config import ExperimentSuite

    for name in EXPECTED:
        suite = ExperimentSuite.load(os.path.join(PAPER, f"{name}.json"))
        runs = list(suite.runs())
        for identifier, dataset, seed, cfg in runs:
            cfg.validate()
        # one RunConfig per (run, seed): every suite pins seeds 1..runs
        per_run = {i: d["ds_params"]["runs"] for i, d in suite.experiments.items()}
        assert len(runs) == sum(per_run.values())


def test_auc_suite_grid_semantics():
    """Spot-check the canonical grid (SURVEY.md §6): hyperparams + variants."""
    from s3grl_tpu.config import ExperimentSuite

    suite = ExperimentSuite.load(os.path.join(PAPER, "auc_s3grl.json"))
    by_id = {i: d for i, d in suite.experiments.items()}

    pos = by_id["USAir_PoS"]["hyperparams_per_run"]
    assert pos["sign_k"] == 3 and pos["node_label"] == "zo"
    assert pos["hidden_channels"] == 256 and pos["batch_size"] == 32
    assert pos["init_features"] == "n2v" and pos["n2v_dim"] == 16
    assert pos["num_hops"] == 2 and pos["optimize_sign"]

    plus = by_id["Cora_PoS_Plus"]["hyperparams_per_run"]
    assert plus["k_heuristic"] == 1
    assert plus["k_node_set_strategy"] == "intersection"
    assert plus["k_pool_strategy"] == "mean"
    assert plus["num_hops"] == 3 and plus["init_features"] == ""

    sop = by_id["Yeast_SoP"]["hyperparams_per_run"]
    assert sop["sign_type"] == "SoP" and sop["num_hops"] == -1
