"""Sidecar subsystems: manager, tuning harness, calc_ratio, profiler."""
import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_suite(tmp_path_factory):
    d = tmp_path_factory.mktemp("suite")
    suite = {
        "datasets": {
            "USAir_PoS": {
                "ds_params": {"runs": 1, "seeds": [1], "dataset": "USAir"},
                "hyperparams_per_run": {
                    "model": "SIGN", "sign_type": "PoS", "optimize_sign": True,
                    "pool_operatorwise": True, "init_features": "degree",
                    "use_feature": True, "sign_k": 2, "num_hops": 1,
                    "epochs": 2, "train_percent": 20, "val_percent": 50,
                    "test_percent": 50, "delete_dataset": True,
                    "max_subgraph_nodes": 256, "hidden_channels": 32,
                },
            },
            "USAir_AA": {
                "ds_params": {"runs": 1, "seeds": [1], "dataset": "USAir"},
                "hyperparams_per_run": {
                    "model": "SIGN", "use_heuristic": "AA", "epochs": 1,
                },
            },
        }
    }
    path = str(d / "suite.json")
    with open(path, "w") as f:
        json.dump(suite, f)
    return path, str(d / "out.json")


def test_master_controller_results_schema(tiny_suite):
    """Suite runner aggregates mean±std per experiment
    (reference: sgrl_master_controller, sgrl_run_manager.py:105-181)."""
    from s3grl_tpu.manager import sgrl_master_controller

    config_path, results_path = tiny_suite
    out = sgrl_master_controller(config_path, results_path)
    assert set(out) == {"USAir_PoS", "USAir_AA"}
    res = out["USAir_PoS"]["results"]
    for key in ("Average Runtime", "Average Test AUC",
                "Average Dataset Prep Time",
                "Average Dataset Prep Time (warm)",
                "Total Model Parameters"):
        assert key in res and "±" in res[key] or "±" in res[key]
    assert os.path.exists(results_path)
    # heuristic row reports AUC too
    assert "Average Test AUC" in out["USAir_AA"]["results"]


def test_per_run_results_dir_log_and_cmd_input(tmp_path):
    """Every run writes log.txt + cmd_input.txt into its results dir
    (reference protocol sgrl_link_pred.py:808-823, 1419-1443): cmd line
    appended to both, per-epoch 'Run/Epoch/Loss/Valid/Test' lines, final
    statistics block."""
    from s3grl_tpu.config import RunConfig
    from s3grl_tpu.runner import run_sgrl_learning

    cfg = RunConfig(
        dataset="USAir", model="SIGN", sign_type="PoS", optimize_sign=True,
        pool_operatorwise=True, init_features="degree", use_feature=True,
        sign_k=2, num_hops=1, epochs=2, seed=1, train_percent=20,
        val_percent=50, test_percent=50, max_subgraph_nodes=256,
        results_dir=str(tmp_path),
    )
    run_sgrl_learning(cfg)
    run_dirs = [d for d in os.listdir(tmp_path) if d.startswith("USAir_")]
    assert len(run_dirs) == 1, "one timestamped res_dir per run"
    res_dir = os.path.join(str(tmp_path), run_dirs[0])
    with open(os.path.join(res_dir, "cmd_input.txt")) as f:
        assert f.read().startswith("python ")
    with open(os.path.join(res_dir, "log.txt")) as f:
        log = f.read()
    assert "python " in log  # header = cmd input (reference :822-823)
    assert "Run: 01, Epoch: 01," in log and "Valid:" in log and "Test:" in log
    assert "Highest Valid:" in log  # final statistics block


def test_tuning_harness_reports_best_trial(tmp_path):
    from s3grl_tpu.config import RunConfig
    from s3grl_tpu.tuning import ray_tune_helper

    cfg = RunConfig(
        dataset="USAir", model="SIGN", sign_type="PoS", optimize_sign=True,
        pool_operatorwise=True, init_features="degree", use_feature=True,
        sign_k=2, num_hops=1, epochs=2, seed=1, train_percent=20,
        val_percent=50, test_percent=50, max_subgraph_nodes=256,
        results_dir=str(tmp_path),
    )
    results_json = os.path.join(str(tmp_path), "tuning_result.json")
    best = ray_tune_helper(
        cfg, num_samples=2, max_epochs=2, grace_period=1,
        results_json=results_json,
    )
    assert "best_config" in best and best["best_score"] is not None
    assert os.path.exists(results_json), \
        "best-trial JSON must be dumped (ray_tuning.py:145-152)"


def test_calc_ratio_emits_stats(tmp_path):
    from s3grl_tpu.analysis import calc_ratio_helper
    from s3grl_tpu.data.io import load_dataset
    from s3grl_tpu.data.split import do_edge_split, get_pos_neg_edges
    from s3grl_tpu.sampling.extraction import DeviceGraph
    from s3grl_tpu.utils.seeding import seed_everything

    rng, _ = seed_everything(1)
    g, split = do_edge_split(load_dataset("USAir"), rng=rng)
    pos, neg = get_pos_neg_edges("train", split, percent=10, rng=rng)
    dg = DeviceGraph.from_graph(g)
    out = None
    for seed in (1, 2):
        out = calc_ratio_helper(
            pos, neg, dg, num_hops=1, max_nodes=256, rw_m=2, rw_M=5,
            dataset_name="USAir", seed=seed, final_seed=2,
            out_dir=str(tmp_path), scratch_dir=str(tmp_path),
        )
    assert out and "train" in out
    files = [f for f in os.listdir(tmp_path) if "preprocessing_stats" in f]
    assert files


def test_profile_helper_schema(tmp_path):
    from s3grl_tpu.profiling import parse_profiling_data, profile_helper

    params = {"w": np.zeros((4, 4), np.float32)}
    stats = profile_helper(
        [0.1, 0.2], [0.05], 1.5, params, dataset_num_links=10,
        stats_suffix="SIGN_USAir_x_seed_1", out_dir=str(tmp_path),
    )
    assert stats["num_parameters"] == 16
    assert "train_time_per_epoch_s" in stats
    stats2 = profile_helper(
        [0.3], [0.07], 1.0, params, dataset_num_links=10,
        stats_suffix="SIGN_USAir_x_seed_2", out_dir=str(tmp_path),
    )
    combined = parse_profiling_data(str(tmp_path))
    assert combined


def test_cli_bool_flags_round_trip():
    """True-default bools must be disableable from the CLI (reference
    argparse takes explicit values, sgrl_link_pred.py:1478-1580)."""
    from s3grl_tpu.runner import _build_arg_parser

    parser = _build_arg_parser()
    args = parser.parse_args([])
    assert args.use_feature is True  # the True default survives
    args = parser.parse_args(["--use_feature", "false"])
    assert args.use_feature is False
    args = parser.parse_args(["--use_feature", "true", "--optimize_sign"])
    assert args.use_feature is True
    assert args.optimize_sign is True  # bare flag still means True
    args = parser.parse_args(["--optimize_sign", "0", "--sign_k", "2"])
    assert args.optimize_sign is False and args.sign_k == 2


def test_only_test_requires_continue_from():
    from s3grl_tpu.config import RunConfig
    import pytest as _pytest

    cfg = RunConfig(only_test=True)
    with _pytest.raises(ValueError, match="continue_from"):
        cfg.validate()
    RunConfig(only_test=True, continue_from=3).validate()


def test_master_controller_only_and_max_seeds_filters(tiny_suite):
    """--only restricts identifiers; --max_seeds truncates each seed list."""
    from s3grl_tpu.manager import sgrl_master_controller

    config_path, results_path = tiny_suite
    out = sgrl_master_controller(
        config_path, results_path, only="USAir_AA", max_seeds=1
    )
    assert set(out) == {"USAir_AA"}
    # one seed -> zero std in every aggregated field
    assert out["USAir_AA"]["results"]["Average Test AUC"].endswith("0.00")


def test_collect_baseline_merges_rows(tmp_path):
    """scripts/collect_baseline.py merges fresh results into BASELINE.md's
    marked table, replacing same-id rows and keeping unsuperseded ones."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import collect_baseline as cb

    payload = {
        "results": {
            "Average Runtime": "10.00 ± 1.00",
            "Average Test AUC": "95.00 ± 0.50",
            "Average Dataset Prep Time": "5.00 ± 0.10",
            "Average Train time per epoch": "0.05 ± 0.00",
            "Average Inf time per epoch": "0.02 ± 0.00",
            "Total Model Parameters": "100 ± 0",
        },
        "n_runs": 3,
    }
    rdir = tmp_path / "results"
    rdir.mkdir()
    with open(rdir / "a.json", "w") as f:
        json.dump({"USAir_PoS": payload}, f)
    merged = cb.collect(str(rdir))
    rows = {k: cb.row_for(k, v) for k, v in merged.items()}
    assert "| USAir_PoS | 3 | 95.00 ± 0.50 |" in rows["USAir_PoS"]

    md = tmp_path / "B.md"
    md.write_text(
        "pre\n<!-- RESULTS_TABLE_START -->\n"
        "| Experiment | Seeds | Test AUC | Prep (s) | Train/epoch (s) | "
        "Inf/epoch (s) | Runtime (s) |\n|---|---|---|---|---|---|---|\n"
        "| USAir_PoS | 5 | 90.00 ± 1.00 | 1 | 1 | 1 | 1 |\n"
        "| Power_SoP | 10 | 88.00 ± 1.00 | 1 | 1 | 1 | 1 |\n"
        "<!-- RESULTS_TABLE_END -->\npost\n"
    )
    cb.update_markdown(dict(rows), path=str(md))
    text = md.read_text()
    assert "95.00 ± 0.50" in text          # replaced
    assert "90.00 ± 1.00" not in text      # old row superseded
    assert "Power_SoP | 10 | 88.00" in text  # unsuperseded row kept
    assert text.startswith("pre\n") and text.rstrip().endswith("post")


def test_master_controller_flushes_after_each_run(tmp_path, monkeypatch):
    """Results JSON is (re)written after every seeded run, so a wall-clock
    kill mid-experiment salvages the completed seeds."""
    import s3grl_tpu.manager as mgr

    suite = {
        "datasets": {
            "Fake_PoS": {
                "ds_params": {"runs": 3, "seeds": [1, 2, 3], "dataset": "USAir"},
                "hyperparams_per_run": {"model": "SIGN", "sign_type": "PoS",
                                        "optimize_sign": True},
            }
        }
    }
    cfg_path = tmp_path / "suite.json"
    cfg_path.write_text(json.dumps(suite))
    out_path = str(tmp_path / "out.json")

    seen = []

    def fake_run(cfg):
        # Snapshot what was on disk BEFORE this run's flush.
        if os.path.exists(out_path):
            with open(out_path) as f:
                seen.append(json.load(f)["Fake_PoS"]["n_runs"])
        else:
            seen.append(0)
        return 1.0, 0.9, [0.1], [0.05], 123

    monkeypatch.setattr(mgr, "run_sgrl_learning", fake_run)
    res = mgr.sgrl_master_controller(str(cfg_path), out_path)
    assert seen == [0, 1, 2]          # flush happened after run 1 and run 2
    assert res["Fake_PoS"]["n_runs"] == 3
    with open(out_path) as f:
        assert json.load(f)["Fake_PoS"]["n_runs"] == 3


def test_master_controller_seed_granular_resume(tmp_path, monkeypatch):
    """skip_existing resumes a partially-done experiment at the NEXT seed,
    restoring the flushed raw per-run series (a watchdog restart used to
    redo the whole experiment from seed 1)."""
    import s3grl_tpu.manager as mgr

    suite = {
        "datasets": {
            "Fake_PoS": {
                "ds_params": {"runs": 3, "seeds": [1, 2, 3], "dataset": "USAir"},
                "hyperparams_per_run": {"model": "SIGN", "sign_type": "PoS",
                                        "optimize_sign": True},
            }
        }
    }
    cfg_path = tmp_path / "suite.json"
    cfg_path.write_text(json.dumps(suite))
    out_path = str(tmp_path / "out.json")

    calls = []

    def fake_run(cfg):
        calls.append(cfg.seed)
        if len(calls) == 2:  # die mid-experiment after seed 2's flush...
            raise KeyboardInterrupt
        return 1.0, 0.90 + 0.01 * cfg.seed, [0.1], [0.05], 123

    monkeypatch.setattr(mgr, "run_sgrl_learning", fake_run)
    try:
        mgr.sgrl_master_controller(str(cfg_path), out_path)
    except KeyboardInterrupt:
        pass
    assert calls == [1, 2]
    with open(out_path) as f:
        assert json.load(f)["Fake_PoS"]["n_runs"] == 1  # seed 2 died pre-flush

    def fake_run2(cfg):
        calls.append(cfg.seed)
        return 1.0, 0.90 + 0.01 * cfg.seed, [0.1], [0.05], 123

    monkeypatch.setattr(mgr, "run_sgrl_learning", fake_run2)
    res = mgr.sgrl_master_controller(str(cfg_path), out_path, skip_existing=True)
    assert calls == [1, 2, 2, 3]  # resumed at seed 2, not seed 1
    assert res["Fake_PoS"]["n_runs"] == 3
    # aggregate continuity: mean over all three seeds' scores
    assert res["Fake_PoS"]["results"]["Average Test AUC"].startswith("0.92")
