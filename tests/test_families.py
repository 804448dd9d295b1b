"""All three model families through the full train->checkpoint->predict
pipeline (family-agnostic plumbing)."""

import numpy as np
import pytest

from pcseg_tpu.api import ArrayDataset, fit
from pcseg_tpu.core.config import Config
from pcseg_tpu.infer import Predictor


@pytest.mark.parametrize(
    "family",
    [
        "pointnet_seg",
        pytest.param("voxel_unet3d", marks=pytest.mark.slow),
        pytest.param("sparse_voxelnet", marks=pytest.mark.slow),
    ],
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


def test_model_knobs_plumbed_through_config():
    """depth/max_active/impl/levels/remat reach the model families."""
    from pcseg_tpu.core.config import ModelConfig
    from pcseg_tpu.models.factory import build_model

    m = build_model(
        ModelConfig(name="sparse_voxelnet", levels=2, depth=3,
                    max_active=4096, impl="gather"),
        num_classes=4,
    )
    assert (m.levels, m.depth, m.max_active, m.impl) == (2, 3, 4096, "gather")

    m = build_model(
        ModelConfig(name="voxel_unet3d", levels=2, remat=True), num_classes=4
    )
    assert (m.levels, m.remat) == (2, True)
    # 0 = family default
    m = build_model(ModelConfig(name="voxel_unet3d"), num_classes=4)
    assert m.levels == 3


@pytest.mark.slow
def test_sparse_levels_from_cli_config(tmp_path, small_events):
    """model.name=sparse_voxelnet model.levels=2 trains via the config
    path (VERDICT r1 item 4)."""
    cfg = Config()
    cfg.model.name = "sparse_voxelnet"
    cfg.model.grid_size = 16
    cfg.model.unet_width = 8
    cfg.model.levels = 2
    cfg.model.max_active = 512
    cfg.data.batch_size = 8
    cfg.data.buckets = (512,)
    cfg.train.num_epochs = 1
    cfg.train.checkpoint_dir = str(tmp_path)
    res = fit(small_events, config=cfg, log=lambda *a: None)
    p = Predictor.from_checkpoint(res.checkpoint_path)
    assert p.model.levels == 2
    preds = p.predict(small_events[0][0])
    assert preds.shape == (small_events[0][0].shape[0],)


def test_fused_guards():
    """bn_stats='fused' fails fast on masked stats and warns on
    cross-device BN instead of silently changing semantics."""
    import warnings

    import jax
    import jax.numpy as jnp
    import pytest

    from pcseg_tpu.models.pointnet import PointNetSeg

    with pytest.raises(ValueError, match="mask_norm_and_pool"):
        PointNetSeg(num_classes=4, bn_stats="fused", mask_norm_and_pool=True)

    import pcseg_tpu.models.pointnet as pn

    pn._warned_fused_fallback = False
    model = PointNetSeg(num_classes=4, bn_stats="fused", dropout=0.0)
    variables = model.init(jax.random.key(0))
    pts = jnp.zeros((4, 64, 4), jnp.float32)

    def fwd(v, p):
        return model.apply(v, p, train=True, axis_name="data")[0]

    from jax.sharding import Mesh, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    with pytest.warns(UserWarning, match="falls back"):
        jax.jit(
            jax.shard_map(
                fwd, mesh=mesh, in_specs=(P(), P()), out_specs=P()
            )
        )(variables, pts)
