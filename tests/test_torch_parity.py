"""Numerical parity with PyTorch: the 'bit-comparable' contract.

Each test pits one of our ops / the full model against real torch kernels
on identical weights and data (SURVEY.md §7 hard parts 2, 3, 5).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pcseg_tpu.ckpt.torch_import import (  # noqa: E402
    export_torch_state_dict,
    import_torch_state_dict,
)
from pcseg_tpu.models.pointnet import PointNetSeg  # noqa: E402
from pcseg_tpu.ops.batchnorm import (  # noqa: E402
    batchnorm_eval,
    batchnorm_train,
    bn_param_init,
    bn_state_init,
)
from pcseg_tpu.ops.losses import weighted_masked_cross_entropy  # noqa: E402
from tests.torch_ref import RefPointNetSeg  # noqa: E402


def _rand_batch(rng, b=4, m=256, d=4, c=4, pad_frac=0.3):
    points = rng.normal(size=(b, m, d)).astype(np.float32)
    labels = rng.integers(0, c, size=(b, m))
    masks = np.ones((b, m), bool)
    n_pad = int(m * pad_frac)
    if n_pad:
        masks[:, -n_pad:] = False
        points[~masks] = 0.0
        labels = np.where(masks, labels, -1)
    return points, labels.astype(np.int64), masks


def test_batchnorm_train_matches_torch(rng):
    c = 32
    x = rng.normal(size=(4, 100, c)).astype(np.float32) * 3 + 1
    tbn = torch.nn.BatchNorm1d(c)
    with torch.no_grad():
        tbn.weight.copy_(torch.tensor(rng.normal(size=c).astype(np.float32)))
        tbn.bias.copy_(torch.tensor(rng.normal(size=c).astype(np.float32)))
    bn_p = {
        "scale": jnp.asarray(tbn.weight.detach().numpy()),
        "bias": jnp.asarray(tbn.bias.detach().numpy()),
    }
    bn_s = bn_state_init(c)

    tbn.train()
    ty = tbn(torch.tensor(x).transpose(1, 2)).transpose(1, 2)
    y, new_s = batchnorm_train(bn_p, bn_s, jnp.asarray(x))

    np.testing.assert_allclose(np.asarray(y), ty.detach().numpy(), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(new_s["mean"]), tbn.running_mean.numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(new_s["var"]), tbn.running_var.numpy(), rtol=1e-5
    )

    # second step: running-stat recursion must track too
    x2 = rng.normal(size=(4, 100, c)).astype(np.float32)
    ty2 = tbn(torch.tensor(x2).transpose(1, 2))
    _, new_s2 = batchnorm_train(bn_p, new_s, jnp.asarray(x2))
    np.testing.assert_allclose(
        np.asarray(new_s2["mean"]), tbn.running_mean.numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(new_s2["var"]), tbn.running_var.numpy(), rtol=1e-5
    )

    # eval mode
    tbn.eval()
    ty3 = tbn(torch.tensor(x).transpose(1, 2)).transpose(1, 2)
    y3 = batchnorm_eval(bn_p, new_s2, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y3), ty3.detach().numpy(), atol=2e-5)


def test_weighted_ce_matches_torch(rng):
    c = 5
    logits = rng.normal(size=(6, 50, c)).astype(np.float32) * 2
    labels = rng.integers(0, c, size=(6, 50))
    labels[:, -15:] = -1  # padding
    weights = rng.uniform(0.2, 3.0, size=c).astype(np.float32)

    tloss = torch.nn.CrossEntropyLoss(
        ignore_index=-1, weight=torch.tensor(weights)
    )(torch.tensor(logits).reshape(-1, c), torch.tensor(labels).reshape(-1))
    ours = weighted_masked_cross_entropy(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(weights)
    )
    np.testing.assert_allclose(float(ours), float(tloss), rtol=1e-6)

    # unweighted path too
    tloss2 = torch.nn.CrossEntropyLoss(ignore_index=-1)(
        torch.tensor(logits).reshape(-1, c), torch.tensor(labels).reshape(-1)
    )
    ours2 = weighted_masked_cross_entropy(jnp.asarray(logits), jnp.asarray(labels))
    np.testing.assert_allclose(float(ours2), float(tloss2), rtol=1e-6)


def test_model_eval_forward_matches_torch(rng):
    """Our init -> torch state_dict -> torch forward == our forward (eval)."""
    model = PointNetSeg(num_classes=4)
    variables = model.init(jax.random.key(1))
    # make running stats non-trivial
    variables["batch_stats"] = jax.tree.map(
        lambda x: x + 0.1 * jnp.arange(x.shape[0], dtype=x.dtype) / x.shape[0],
        variables["batch_stats"],
    )

    tmodel = RefPointNetSeg(num_classes=4)
    sd = {k: torch.tensor(v) for k, v in export_torch_state_dict(variables).items()}
    tmodel.load_state_dict(sd)
    tmodel.eval()

    points, _, _ = _rand_batch(rng)
    with torch.no_grad():
        tout = tmodel(torch.tensor(points)).numpy()
    ours = np.asarray(model.apply(variables, jnp.asarray(points), train=False))
    np.testing.assert_allclose(ours, tout, atol=1e-4, rtol=1e-4)


def test_model_train_forward_and_stats_match_torch(rng):
    """Train-mode forward (dropout off): logits AND updated running stats."""
    model = PointNetSeg(num_classes=4, dropout=0.0)
    variables = model.init(jax.random.key(2))

    tmodel = RefPointNetSeg(num_classes=4)
    sd = {k: torch.tensor(v) for k, v in export_torch_state_dict(variables).items()}
    tmodel.load_state_dict(sd)
    tmodel.train()
    tmodel.dropout.p = 0.0

    points, _, _ = _rand_batch(rng)
    tout = tmodel(torch.tensor(points)).detach().numpy()
    ours, new_bn = model.apply(variables, jnp.asarray(points), train=True)
    np.testing.assert_allclose(np.asarray(ours), tout, atol=2e-4, rtol=1e-3)

    # BN running stats after the step (padding included — reference quirk)
    np.testing.assert_allclose(
        np.asarray(new_bn["bn1"]["mean"]), tmodel.bn1.running_mean.numpy(),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(new_bn["bn_seg3"]["var"]), tmodel.bn_seg3.running_var.numpy(),
        rtol=1e-4,
    )


def test_state_dict_roundtrip(rng):
    model = PointNetSeg(num_classes=7)
    variables = model.init(jax.random.key(3))
    back = import_torch_state_dict(export_torch_state_dict(variables))
    flat_a = jax.tree.leaves(variables)
    flat_b = jax.tree.leaves(back)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_module_prefix_import(rng):
    """DataParallel 'module.'-prefixed checkpoints import identically
    (pcs.py:407-428)."""
    model = PointNetSeg(num_classes=3)
    variables = model.init(jax.random.key(4))
    sd = export_torch_state_dict(variables)
    prefixed = {f"module.{k}": v for k, v in sd.items()}
    a = import_torch_state_dict(sd)
    b = import_torch_state_dict(prefixed)
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_adam_with_l2_matches_torch(rng):
    """Our optax chain == torch.optim.Adam(weight_decay=1e-4), 5 steps."""
    import optax

    from pcseg_tpu.train.optim import make_optimizer

    w0 = rng.normal(size=(16, 8)).astype(np.float32)
    tparam = torch.nn.Parameter(torch.tensor(w0.copy()))
    topt = torch.optim.Adam([tparam], lr=1e-3, weight_decay=1e-4)

    tx = make_optimizer(weight_decay=1e-4)
    params = {"w": jnp.asarray(w0)}
    opt_state = tx.init(params)

    for step in range(5):
        g = rng.normal(size=w0.shape).astype(np.float32)
        topt.zero_grad()
        tparam.grad = torch.tensor(g.copy())
        topt.step()

        updates, opt_state = tx.update({"w": jnp.asarray(g)}, opt_state, params)
        params = optax.apply_updates(
            params, jax.tree.map(lambda u: -1e-3 * u, updates)
        )
    np.testing.assert_allclose(
        np.asarray(params["w"]), tparam.detach().numpy(), atol=1e-6
    )


def test_f1_matches_sklearn(rng):
    sklearn_metrics = pytest.importorskip("sklearn.metrics")
    from pcseg_tpu.ops.metrics import confusion_matrix, f1_from_confusion

    c = 5
    y_true = rng.integers(0, c, size=2000)
    y_pred = np.where(rng.uniform(size=2000) < 0.6, y_true, rng.integers(0, c, size=2000))
    # make one class absent from predictions to exercise zero-division
    y_pred[y_pred == 4] = 3

    cm = confusion_matrix(
        jnp.asarray(y_pred), jnp.asarray(y_true),
        jnp.ones_like(jnp.asarray(y_true), bool), c,
    )
    ours = f1_from_confusion(np.asarray(cm))
    ref_per = sklearn_metrics.f1_score(y_true, y_pred, average=None, labels=range(c))
    ref_macro = sklearn_metrics.f1_score(y_true, y_pred, average="macro")
    ref_weighted = sklearn_metrics.f1_score(y_true, y_pred, average="weighted")
    np.testing.assert_allclose(ours.per_class, ref_per, atol=1e-12)
    np.testing.assert_allclose(ours.macro, ref_macro, atol=1e-12)
    np.testing.assert_allclose(ours.weighted, ref_weighted, atol=1e-12)


def test_fast_bn_stats_close_to_exact(rng):
    """fast (single-pass) BN variance stays within float32 noise of the
    exact two-pass variance on realistic activation magnitudes."""
    model_e = PointNetSeg(num_classes=4, dropout=0.0, bn_stats="exact")
    model_f = PointNetSeg(num_classes=4, dropout=0.0, bn_stats="fast")
    variables = model_e.init(jax.random.key(0))
    points = jnp.asarray(
        rng.normal(size=(4, 256, 4)).astype(np.float32) * 5
    )
    le, bne = model_e.apply(variables, points, train=True)
    lf, bnf = model_f.apply(variables, points, train=True)
    np.testing.assert_allclose(
        np.asarray(le), np.asarray(lf), atol=1e-3, rtol=1e-3
    )
    for a, b in zip(jax.tree.leaves(bne), jax.tree.leaves(bnf)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3
        )


def test_folded_forward_matches_eval(rng):
    """BN-folded serving forward == eval-mode forward (f32)."""
    from pcseg_tpu.models.pointnet import pointnet_apply_folded
    from pcseg_tpu.ops.fold import fold_pointnet

    model = PointNetSeg(num_classes=4)
    variables = model.init(jax.random.key(5))
    variables["batch_stats"] = jax.tree.map(
        lambda x: x + 0.05 * jnp.arange(x.shape[0], dtype=x.dtype) / x.shape[0],
        variables["batch_stats"],
    )
    points, _, _ = _rand_batch(rng)
    ref = model.apply(variables, jnp.asarray(points), train=False)
    folded = fold_pointnet(variables)
    got = pointnet_apply_folded(folded, jnp.asarray(points),
                                compute_dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-4, rtol=1e-4
    )
