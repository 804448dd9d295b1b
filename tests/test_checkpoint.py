"""Checkpoint save/restore + best_model.pth interop."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pcseg_tpu.ckpt.checkpoint import load_checkpoint, save_checkpoint
from pcseg_tpu.models.pointnet import PointNetSeg
from pcseg_tpu.train.optim import make_optimizer
from pcseg_tpu.train.steps import create_train_state


def test_save_load_roundtrip(tmp_path):
    model = PointNetSeg(num_classes=4)
    tx = make_optimizer()
    state = create_train_state(model, jax.random.key(0), tx)
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state, {"epoch": 3, "num_classes": 4})
    restored, meta = load_checkpoint(path, target=state)
    assert meta["epoch"] == 3
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_save_is_atomic_overwrite(tmp_path):
    model = PointNetSeg(num_classes=2)
    tx = make_optimizer()
    state = create_train_state(model, jax.random.key(0), tx)
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state, {"epoch": 0})
    save_checkpoint(path, state, {"epoch": 1})
    _, meta = load_checkpoint(path)
    assert meta["epoch"] == 1


def test_best_model_pth_load(tmp_path):
    """A reference-format .pth (torch.save of the pcs.py:373-382 dict,
    with DataParallel prefix) loads into a working Predictor."""
    torch = pytest.importorskip("torch")
    from tests.torch_ref import RefPointNetSeg

    from pcseg_tpu.infer import Predictor

    tmodel = RefPointNetSeg(num_classes=4)
    sd = {f"module.{k}": v for k, v in tmodel.state_dict().items()}
    pth = str(tmp_path / "best_model.pth")
    torch.save(
        {
            "epoch": 5,
            "model_state_dict": sd,
            "optimizer_state_dict": {},
            "train_loss": 0.5,
            "val_loss": 0.6,
            "f1_class2": 0.7,
            "f1_per_class": [0.9, 0.8, 0.7, 0.6],
            "num_classes": 4,
        },
        pth,
    )

    predictor = Predictor.from_checkpoint(pth)
    rng = np.random.default_rng(0)
    points = rng.normal(size=(100, 4)).astype(np.float32)
    preds = predictor.predict(points)
    assert preds.shape == (100,)

    # logits parity against the torch model itself
    tmodel.eval()
    with torch.no_grad():
        tout = tmodel(torch.tensor(points[None])).numpy()[0]
    np.testing.assert_allclose(
        predictor.logits(points), tout, atol=1e-4, rtol=1e-4
    )


def test_framework_checkpoint_predictor(tmp_path):
    model = PointNetSeg(num_classes=3)
    tx = make_optimizer()
    state = create_train_state(model, jax.random.key(1), tx)
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state, {"num_classes": 3})

    from pcseg_tpu.infer import Predictor

    p = Predictor.from_checkpoint(path)
    preds = p.predict(np.zeros((10, 4), np.float32))
    assert preds.shape == (10,)


def test_resume_from_checkpoint(tmp_path, small_events):
    """True mid-training resume (the reference saves optimizer state but
    never loads it, pcs.py:376 vs :401-430)."""
    from pcseg_tpu.api import ArrayDataset
    from pcseg_tpu.core.config import Config
    from pcseg_tpu.train.loop import train_model

    cfg = Config()
    cfg.data.batch_size = 8
    cfg.data.buckets = (512,)
    cfg.train.num_epochs = 2
    cfg.train.patience = 10
    cfg.train.checkpoint_dir = str(tmp_path)
    ds = ArrayDataset(small_events)
    res1 = train_model(cfg, ds, log=lambda *a: None)
    assert res1.history[-1]["epoch"] == 1

    # resume: continues at the checkpointed epoch + 1
    cfg.train.num_epochs = 3
    res2 = train_model(
        cfg, ds, resume_from=res1.checkpoint_path, log=lambda *a: None
    )
    start = res2.history[0]["epoch"]
    assert start >= 1  # did not restart from scratch
    assert res2.history[-1]["epoch"] == 2
    assert int(res2.state.step) > 0


def test_latest_checkpoint_written(tmp_path, small_events):
    from pcseg_tpu.api import ArrayDataset
    from pcseg_tpu.core.config import Config
    from pcseg_tpu.train.loop import train_model

    cfg = Config()
    cfg.data.batch_size = 8
    cfg.data.buckets = (512,)
    cfg.train.num_epochs = 1
    cfg.train.checkpoint_dir = str(tmp_path)
    train_model(cfg, ArrayDataset(small_events), log=lambda *a: None)
    _, meta = load_checkpoint(str(tmp_path / "latest"))
    assert meta["epoch"] == 0


def test_predict_batch_matches_single(tmp_path, small_events):
    from pcseg_tpu.infer import Predictor
    from pcseg_tpu.models.pointnet import PointNetSeg
    from pcseg_tpu.train.optim import make_optimizer
    from pcseg_tpu.train.steps import create_train_state

    model = PointNetSeg(num_classes=4)
    state = create_train_state(model, jax.random.key(7), make_optimizer())
    save_checkpoint(str(tmp_path / "ck"), state, {"num_classes": 4})
    p = Predictor.from_checkpoint(str(tmp_path / "ck"))
    events = [e[0] for e in small_events[:5]]
    batched = p.predict_batch(events, batch_size=4)
    for e, got in zip(events, batched):
        np.testing.assert_array_equal(got, p.predict(e))


def test_predictor_padding_invariant(tmp_path, small_events):
    """Bucket padding must not influence predictions: the serving path
    masks the global max pool, so the same event predicted through two
    different pad buckets gives identical results (folded and unfolded)."""
    from pcseg_tpu.infer import Predictor
    from pcseg_tpu.models.pointnet import PointNetSeg
    from pcseg_tpu.train.optim import make_optimizer
    from pcseg_tpu.train.steps import create_train_state

    model = PointNetSeg(num_classes=4)
    state = create_train_state(model, jax.random.key(3), make_optimizer())
    save_checkpoint(str(tmp_path / "ck"), state, {"num_classes": 4})
    event = small_events[0][0]
    n = event.shape[0]
    for fold in (True, False):
        p_tight = Predictor.from_checkpoint(
            str(tmp_path / "ck"), buckets=(n,), fold=fold
        )
        p_padded = Predictor.from_checkpoint(
            str(tmp_path / "ck"), buckets=(4 * n,), fold=fold
        )
        lg_t = p_tight.logits(event)
        lg_p = p_padded.logits(event)
        np.testing.assert_allclose(lg_p, lg_t, rtol=2e-2, atol=1e-3)
        np.testing.assert_array_equal(
            p_padded.predict(event), p_tight.predict(event)
        )


def test_resume_restores_selection_state(tmp_path, small_events):
    """A resumed run must not overwrite a better best checkpoint with a
    worse epoch, and the early-stop clock must keep counting: the 'latest'
    checkpoint carries best_f1_target / best_val_loss / patience_counter
    and train_model restores them."""
    from pcseg_tpu.api import ArrayDataset
    from pcseg_tpu.core.config import Config
    from pcseg_tpu.train.loop import train_model

    cfg = Config()
    cfg.data.batch_size = 8
    cfg.data.buckets = (512,)
    cfg.train.num_epochs = 1
    cfg.train.checkpoint_dir = str(tmp_path)
    ds = ArrayDataset(small_events)
    train_model(cfg, ds, log=lambda *a: None)

    latest = str(tmp_path / "latest")
    raw, meta = load_checkpoint(latest)
    assert {"best_f1_target", "best_val_loss", "best_epoch",
            "patience_counter"} <= meta.keys()

    # Doctor the selection state to an unbeatable best so the next epoch
    # is guaranteed "worse" — the resumed run must leave best_model alone.
    meta["best_f1_target"] = 0.99
    meta["best_val_loss"] = 0.0
    meta["patience_counter"] = 2
    save_checkpoint(latest, raw, meta)
    _, best_meta_before = load_checkpoint(str(tmp_path / "best_model"))

    cfg.train.num_epochs = 2
    res = train_model(cfg, ds, resume_from=latest, log=lambda *a: None)
    assert res.best_f1_target == 0.99          # restored, not reset to 0
    assert res.best_epoch == 0                 # unchanged
    _, best_meta_after = load_checkpoint(str(tmp_path / "best_model"))
    assert best_meta_after == best_meta_before  # best NOT overwritten
    # patience kept counting: 2 restored + 1 non-improving epoch
    _, latest_meta = load_checkpoint(latest)
    assert latest_meta["patience_counter"] == 3


@pytest.mark.slow
def test_cli_train_resume(tmp_path, small_events):
    """--resume on the CLI train subcommand continues a run end-to-end."""
    import json

    from pcseg_tpu.cli import main
    from pcseg_tpu.data.hdf5 import write_event_files

    data = str(tmp_path / "d.h5")
    labels = str(tmp_path / "l.h5")
    write_event_files(data, labels, small_events)
    ckdir = str(tmp_path / "ck")
    common = [
        "train", "--data", data, "--labels", labels,
        "data.batch_size=8", "data.buckets=512",
        f"train.checkpoint_dir={ckdir}",
    ]
    assert main(common + ["train.num_epochs=1"]) == 0
    assert main(
        common + ["train.num_epochs=2", "--resume", "auto"]
    ) == 0
    _, meta = load_checkpoint(str(tmp_path / "ck" / "latest"))
    assert meta["epoch"] == 1  # resumed into epoch 2, not restarted
