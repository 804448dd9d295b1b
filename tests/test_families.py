"""All three model families through the full train->checkpoint->predict
pipeline (family-agnostic plumbing)."""

import numpy as np
import pytest

from pcseg_tpu.api import ArrayDataset, fit
from pcseg_tpu.core.config import Config
from pcseg_tpu.infer import Predictor


@pytest.mark.parametrize(
    "family", ["pointnet_seg", "voxel_unet3d", "sparse_voxelnet"]
)
def test_family_end_to_end(tmp_path, small_events, family):
    cfg = Config()
    cfg.model.name = family
    cfg.model.grid_size = 16
    cfg.model.unet_width = 8
    cfg.data.batch_size = 8
    cfg.data.buckets = (512,)
    cfg.train.num_epochs = 1
    cfg.train.checkpoint_dir = str(tmp_path)
    res = fit(small_events, config=cfg, log=lambda *a: None)
    assert res.best_epoch == 0

    p = Predictor.from_checkpoint(res.checkpoint_path)
    assert type(p.model).__name__ in (
        "PointNetSeg", "VoxelUNet3d", "SparseVoxelNet"
    )
    preds = p.predict(small_events[0][0])
    assert preds.shape == (small_events[0][0].shape[0],)
    assert preds.min() >= 0 and preds.max() < res.num_classes


def test_evaluate_api(tmp_path, small_events):
    from pcseg_tpu.api import evaluate, fit
    from pcseg_tpu.core.config import Config

    cfg = Config()
    cfg.data.batch_size = 8
    cfg.data.buckets = (512,)
    cfg.train.num_epochs = 1
    cfg.train.checkpoint_dir = str(tmp_path)
    res = fit(small_events, config=cfg, log=lambda *a: None)

    m = evaluate(
        res.checkpoint_path, small_events, batch_size=8, buckets=(512,)
    )
    assert 0 <= m["accuracy"] <= 100
    assert len(m["f1_per_class"]) == res.num_classes
    assert np.asarray(m["confusion"]).sum() == sum(
        e[0].shape[0] for e in small_events
    )
