"""The dataset/ command-line scripts, driven in-process via runpy."""

import os
import pickle
import runpy
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(script, argv, monkeypatch):
    monkeypatch.setattr(sys, "argv", [script] + argv)
    runpy.run_path(os.path.join(REPO, script), run_name="__main__")


@pytest.fixture
def raw_pickle(tmp_path, rng):
    """A raw recording pickle with plausible AR(1) calcium."""
    spikes = (rng.uniform(size=(5, 800)) < 0.05).astype(np.float32)
    sig = np.zeros_like(spikes)
    for t in range(1, 800):
        sig[:, t] = 0.95 * sig[:, t - 1] + spikes[:, t]
    sig += 0.1 * rng.normal(size=sig.shape).astype(np.float32)
    path = str(tmp_path / "raw" / "rec.pkl")
    os.makedirs(os.path.dirname(path))
    with open(path, "wb") as f:
        pickle.dump({"signals": sig.astype(np.float32)}, f)
    return path


def test_spike_train_inference_cli(raw_pickle, monkeypatch):
    run_cli("dataset/spike_train_inference.py",
            ["--input_dir", os.path.dirname(raw_pickle)], monkeypatch)
    with open(raw_pickle, "rb") as f:
        data = pickle.load(f)
    assert "oasis" in data
    assert data["oasis"].shape == data["signals"].shape
    assert set(np.unique(data["oasis"])).issubset({0.0, 1.0})
    # --clean removes the key
    run_cli("dataset/spike_train_inference.py",
            ["--input_dir", os.path.dirname(raw_pickle), "--clean"],
            monkeypatch)
    with open(raw_pickle, "rb") as f:
        assert "oasis" not in pickle.load(f)


def test_generate_tfrecords_cli(raw_pickle, tmp_path, monkeypatch):
    run_cli("dataset/spike_train_inference.py",
            ["--input_dir", os.path.dirname(raw_pickle)], monkeypatch)
    out = str(tmp_path / "records")
    run_cli("dataset/generate_tfrecords.py",
            ["--input", raw_pickle, "--output_dir", out,
             "--sequence_length", "32", "--stride", "8", "--normalize",
             "--is_dg_data", "--validation_size", "8", "--verbose", "0"],
            monkeypatch)
    import glob
    assert os.path.exists(os.path.join(out, "info.pkl"))
    assert glob.glob(os.path.join(out, "train-*.record"))
    assert glob.glob(os.path.join(out, "validation-*.record"))
    # refuses to overwrite without --replace
    with pytest.raises(SystemExit):
        run_cli("dataset/generate_tfrecords.py",
                ["--input", raw_pickle, "--output_dir", out,
                 "--sequence_length", "32", "--stride", "8", "--verbose",
                 "0"], monkeypatch)


def test_generate_dg_data_cli(raw_pickle, tmp_path, monkeypatch):
    run_cli("dataset/spike_train_inference.py",
            ["--input_dir", os.path.dirname(raw_pickle)], monkeypatch)
    out = str(tmp_path / "dg" / "data.pkl")
    run_cli("dataset/generate_dg_data.py",
            ["--input", raw_pickle, "--output", out], monkeypatch)
    with open(out, "rb") as f:
        data = pickle.load(f)
    assert set(data) == {"signals", "oasis", "mean", "covariance"}
    # first 2 neurons dropped -> 3 remain, full duration
    assert data["signals"].shape == (3, 800)
    assert data["oasis"].shape == (3, 800)
    assert np.isfinite(data["signals"]).all()
