"""End-to-end example-workflow smoke tests (subprocess, tiny configs).

These guard the user-facing workflows (SURVEY.md section 2.7 script layer)
against API drift. They run the actual example scripts, so they are slower
than unit tests; each uses minimal epochs/steps.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

EXAMPLES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"
)


def run_example(script, *args, timeout=420):
    env = dict(os.environ)
    # Force the subprocess onto CPU: the environment pins
    # JAX_PLATFORMS=axon (remote TPU tunnel), which would make these
    # smoke tests contend with any concurrent hardware runs and depend
    # on tunnel availability. JAX_PLATFORMS beats JAX_PLATFORM_NAME.
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_PLATFORM_NAME"] = "cpu"
    env.pop("XLA_FLAGS", None)
    r = subprocess.run(
        [sys.executable, os.path.join(EXAMPLES, script), *args],
        capture_output=True,
        text=True,
        timeout=timeout,
        env=env,
        cwd=EXAMPLES,
    )
    assert r.returncode == 0, f"{script} failed:\n{r.stdout}\n{r.stderr}"
    return r.stdout


class TestExampleWorkflows:
    def test_train(self, tmp_path):
        out = run_example(
            "train.py", "--epochs", "1", "--batch-size", "64",
            "--model-file", str(tmp_path / "m"),
        )
        assert "saved model" in out
        assert os.path.exists(tmp_path / "m.pkl")

    def test_train_spherical(self, tmp_path):
        # The s2cnn-equivalent workflow (reference examples/train_torch.py).
        out = run_example(
            "train_spherical.py", "--epochs", "1", "--batch-size", "16",
            "--truncation", "6", "--features", "4",
            "--model-file", str(tmp_path / "s"),
        )
        assert "saved model" in out
        assert "prediction shape: (16, 4, 37, 72)" in out
        assert os.path.exists(tmp_path / "s.pkl")

    def test_run_barotropic(self, tmp_path):
        out = run_example(
            "run_barotropic.py", "--n-init", "1", "--hours", "12",
            "--output-file", str(tmp_path / "b.h5"),
        )
        assert "saved" in out
        assert os.path.exists(tmp_path / "b.h5")

    def test_run_barotropic_pallas_single_member(self, tmp_path):
        """--step-impl pallas engages the fused kernel for one init time
        (interpret mode on CPU) and writes the same output layout."""
        out = run_example(
            "run_barotropic.py", "--n-init", "1", "--hours", "6",
            "--step-impl", "pallas",
            "--output-file", str(tmp_path / "bp.h5"),
        )
        assert "saved" in out
        import h5py
        with h5py.File(tmp_path / "bp.h5") as f:
            assert f["z"].shape[1] == 1  # member axis restored

    def test_write_predictors_and_thickness(self, tmp_path):
        p = str(tmp_path / "p.h5")
        run_example("write_predictors.py", "--output-file", p)
        out = run_example(
            "add_thickness.py", p, "--upper", "HGT/500",
            "--lower", "THICK/300-700",
            "--output-file", str(tmp_path / "p2.h5"),
        )
        assert "added" in out

    def test_acquisition_dry_runs(self):
        out = run_example("write_cfs.py", "--dry-run")
        assert "nomads.ncdc.noaa.gov" in out
        out = run_example("retrieve_era5.py", "--dry-run")
        assert "reanalysis" in out
        out = run_example("write_cfs_reforecast.py", "--dry-run")
        assert "cfsr-rfl-ts45" in out and "z500" in out

    def test_validate(self, tmp_path):
        out = run_example(
            "validate.py", "--forecast-steps", "4",
            "--barotropic-form", "vrt",  # exercise the selectable core
            "--plot-file", str(tmp_path / "v.png"),
            "--output-file", str(tmp_path / "v.pkl"),
            timeout=600,
        )
        assert "RMSE vs forecast hour" in out
        # Sub-year synthetic archive -> the monthly-climatology baseline
        # falls back to the constant-climo row, with a notice.
        assert "monthly climatology baseline skipped" in out
        assert os.path.exists(tmp_path / "v.pkl")

    def test_validate_monthly_climo(self, tmp_path):
        """A multi-year archive gains the month-aware climatology baseline
        (reference validate.py:319-325)."""
        import pickle

        p = str(tmp_path / "long.h5")
        run_example("write_predictors.py", "--n-samples", "1560",
                    "--output-file", p)
        out = run_example(
            "validate.py", "--predictor-file", p,
            "--forecast-steps", "2",
            "--plot-file", str(tmp_path / "vm.png"),
            "--output-file", str(tmp_path / "vm.pkl"),
            timeout=600,
        )
        assert "monthly" in out
        with open(tmp_path / "vm.pkl", "rb") as f:
            results = pickle.load(f)
        assert "monthly_climo_rmse" in results
        assert np.all(np.isfinite(results["monthly_climo_rmse"]))
        # The synthetic source has a seasonal cycle, so the month-aware
        # climatology must beat the constant one.
        assert (results["monthly_climo_rmse"][0]
                < results["climatology_rmse"][0])

    def test_train_convlstm_checkpoint_resume(self, tmp_path):
        """A killed multi-epoch run continues from its checkpoint: the
        canonical workflow trains 1 epoch with --checkpoint-dir (simulating
        the kill by just stopping there), then a second invocation with
        --resume picks up at epoch 2 instead of restarting. This is the
        flaky-tunnel insurance the paper run depends on (mid-training
        checkpointing the reference lacks, util.py:126-192)."""
        ck = str(tmp_path / "ck")
        common = [
            "--batch-size", "16", "--device-resident",
            "--checkpoint-dir", ck,
            "--model-file", str(tmp_path / "m"),
        ]
        run_example("train_convlstm.py", "--epochs", "1", *common)
        out = run_example(
            "train_convlstm.py", "--epochs", "2", "--resume", *common,
        )
        assert "resumed from epoch 1" in out
        assert "epoch 2/2" in out and "epoch 1/2" not in out
        assert os.path.exists(tmp_path / "m.pkl")

    def test_train_then_validate(self, tmp_path):
        """The cross-script user flow: a model trained by train.py (whose
        demo default adds the insolation channel) must validate via
        validate.py's auto insolation detection -- regression for the
        hardware-e2e failure where the validation sampler rebuilt 4-channel
        inputs against a 6-channel trained model."""
        run_example(
            "train.py", "--epochs", "1", "--batch-size", "64",
            "--model-file", str(tmp_path / "m"),
        )
        out = run_example(
            "validate.py", "--forecast-steps", "2",
            "--model-file", str(tmp_path / "m"),
            "--plot-file", str(tmp_path / "v2.png"),
            "--output-file", str(tmp_path / "v2.pkl"),
            timeout=600,
        )
        assert "trained with an insolation channel" in out
        assert "RMSE vs forecast hour" in out

    def test_train_distributed_virtual(self):
        out = run_example(
            "train_distributed.py", "--virtual", "4", "--data-shards", "2",
            "--lat-shards", "2", "--epochs", "1", timeout=600,
        )
        assert "mesh" in out
