"""train.parallelism / train.model_parallel: every strategy reachable
from the user-facing config (and therefore the CLI's section.field=value
overrides), not just the parallel/* library APIs."""

import numpy as np
import pytest

from pcseg_tpu.api import fit
from pcseg_tpu.core.config import Config
from pcseg_tpu.infer import Predictor


def _cfg(tmp_path, strategy, family="pointnet_seg"):
    cfg = Config()
    cfg.model.name = family
    cfg.model.grid_size = 16
    cfg.model.unet_width = 8
    cfg.data.batch_size = 8
    cfg.data.buckets = (512,)
    cfg.train.num_epochs = 1
    cfg.train.checkpoint_dir = str(tmp_path)
    cfg.train.parallelism = strategy
    cfg.train.model_parallel = 2      # 4x2 mesh on the 8-device fixture
    return cfg


@pytest.mark.parametrize(
    "strategy,family",
    [pytest.param("sp", "pointnet_seg", marks=pytest.mark.slow),
     pytest.param("tp", "pointnet_seg", marks=pytest.mark.slow),
     pytest.param("gp", "voxel_unet3d", marks=pytest.mark.slow)],
)
def test_strategy_end_to_end(tmp_path, small_events, strategy, family):
    res = fit(small_events, config=_cfg(tmp_path, strategy, family),
              log=lambda *a: None)
    assert res.best_epoch == 0
    assert np.isfinite(res.history[0]["train_loss"])

    # checkpoints gather sharded state to host; prediction loads them
    # back onto the default (single) device like any other run
    p = Predictor.from_checkpoint(res.checkpoint_path)
    preds = p.predict(small_events[0][0])
    assert preds.shape == (small_events[0][0].shape[0],)


def test_strategy_family_guards(tmp_path, small_events):
    with pytest.raises(ValueError, match="pointnet_seg"):
        fit(small_events,
            config=_cfg(tmp_path, "sp", family="voxel_unet3d"),
            log=lambda *a: None)
    with pytest.raises(ValueError, match="voxel_unet3d"):
        fit(small_events, config=_cfg(tmp_path, "gp"),
            log=lambda *a: None)
    with pytest.raises(ValueError, match="unknown train.parallelism"):
        fit(small_events, config=_cfg(tmp_path, "pp"),
            log=lambda *a: None)
