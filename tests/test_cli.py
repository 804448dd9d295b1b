"""CLI + config surface tests (in-process, CPU mesh)."""

import json

import numpy as np
import pytest

from pcseg_tpu.cli import main
from pcseg_tpu.core.config import Config, apply_overrides


def test_config_overrides_roundtrip():
    cfg = Config()
    apply_overrides(
        cfg,
        [
            "optim.lr=3e-4",
            "data.batch_size=32",
            "train.sync_batchnorm=true",
            "data.buckets=128,256",
            "model.name=voxel_unet3d",
        ],
    )
    assert cfg.optim.lr == 3e-4
    assert cfg.data.batch_size == 32
    assert cfg.train.sync_batchnorm is True
    assert cfg.data.buckets == (128, 256)
    assert cfg.model.name == "voxel_unet3d"

    back = Config.from_dict(json.loads(cfg.to_json()))
    assert back.optim.lr == 3e-4
    assert tuple(back.data.buckets) == (128, 256)


def test_config_rejects_unknown_key():
    with pytest.raises(KeyError):
        apply_overrides(Config(), ["optim.does_not_exist=1"])
    with pytest.raises(ValueError):
        apply_overrides(Config(), ["no_equals_sign"])


def test_cli_synth_train_infer_convert(tmp_path, capsys):
    data = str(tmp_path / "d.h5")
    labels = str(tmp_path / "l.h5")
    assert main([
        "synth", "--data", data, "--labels", labels,
        "--events", "32", "--min-points", "50", "--max-points", "200",
    ]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["events"] == 32

    ckdir = str(tmp_path / "ck")
    assert main([
        "train", "--data", data, "--labels", labels,
        "data.batch_size=8", "data.buckets=256",
        "train.num_epochs=1", f"train.checkpoint_dir={ckdir}",
    ]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["best_epoch"] == 0
    ckpt = out["checkpoint"]

    assert main([
        "infer", "--checkpoint", ckpt, "--data", data, "--labels", labels,
        "--event", "1",
    ]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["num_points"] > 0 and 0 <= out["accuracy"] <= 100

    # convert to .pth and back, and predict from the .pth
    pth = str(tmp_path / "model.pth")
    assert main(["convert", ckpt, pth]) == 0
    capsys.readouterr()
    back = str(tmp_path / "ck2")
    assert main(["convert", pth, back]) == 0
    capsys.readouterr()

    from pcseg_tpu.infer import Predictor

    pa = Predictor.from_checkpoint(ckpt)
    pb = Predictor.from_checkpoint(pth)
    pts = np.random.default_rng(0).normal(size=(64, 4)).astype(np.float32)
    np.testing.assert_allclose(
        pa.logits(pts), pb.logits(pts), atol=1e-4, rtol=1e-4
    )
