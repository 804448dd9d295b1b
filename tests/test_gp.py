"""Grid-parallel (depth-sharded) voxel U-Net vs the unsharded forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcseg_tpu.models.voxel_unet import VoxelUNet3d
from pcseg_tpu.parallel.gp import make_gp_forward
from pcseg_tpu.parallel.mesh import MeshSpec, make_mesh


def _inputs(rng, b=2, m=256):
    pts = jnp.asarray(rng.normal(size=(b, m, 4)), jnp.float32)
    mask = jnp.asarray(rng.random((b, m)) < 0.9)
    return pts, mask


@pytest.mark.parametrize("nshards", [2, 4])
def test_gp_forward_matches_unsharded(nshards):
    rng = np.random.default_rng(0)
    pts, mask = _inputs(rng)
    model = VoxelUNet3d(num_classes=4, grid_size=16, width=16, levels=2,
                        compute_dtype="float32", conv_impl="xla")
    variables = model.init(jax.random.key(0))

    mesh = make_mesh(
        MeshSpec(data=1, model=nshards), devices=jax.devices()[:nshards]
    )
    gp = make_gp_forward(model, mesh)
    y_gp = gp(variables, pts, mask)
    y_ref = model.apply(variables, pts, mask=mask)
    # identical math modulo GN two-pass-vs-sumsq variance and reduction
    # order across shards
    np.testing.assert_allclose(
        np.asarray(y_gp), np.asarray(y_ref), atol=2e-3, rtol=2e-3
    )


def test_gp_shard_count_guard():
    model = VoxelUNet3d(num_classes=4, grid_size=16, width=16, levels=3)
    mesh = make_mesh(MeshSpec(data=1, model=8), devices=jax.devices()[:8])
    # deepest level grid 4 cannot split over 8 shards
    with pytest.raises(ValueError, match="shard depth"):
        make_gp_forward(model, mesh)


def test_gp_train_step_matches_single_device():
    """One GP train step (identity optimizer: param delta == gradient)
    must reproduce the unsharded gradient step."""
    import optax

    from pcseg_tpu.parallel.gp import make_gp_train_step
    from pcseg_tpu.train.steps import create_train_state

    rng = np.random.default_rng(1)
    pts, mask = _inputs(rng)
    labels = jnp.asarray(rng.integers(0, 4, size=pts.shape[:2]))
    model = VoxelUNet3d(num_classes=4, grid_size=16, width=16, levels=2,
                        compute_dtype="float32", conv_impl="xla")
    tx = optax.identity()
    cw = jnp.ones((4,), jnp.float32)

    mesh4 = make_mesh(MeshSpec(data=1, model=4), devices=jax.devices()[:4])
    state = create_train_state(model, jax.random.key(0), tx)
    gp_step = make_gp_train_step(model, mesh4, tx)
    gp_state, gp_metrics = gp_step(
        state, (pts, labels, mask), jnp.float32(1e-3), jax.random.key(1), cw
    )

    # unsharded reference gradient
    from pcseg_tpu.ops.losses import cross_entropy_sums

    def loss(params):
        logits = model.apply({"params": params}, pts, mask=mask)
        num, den = cross_entropy_sums(logits, labels, cw)
        return num / den

    l_ref, g_ref = jax.value_and_grad(loss)(state.params)
    np.testing.assert_allclose(
        float(gp_metrics["loss"]), float(l_ref), rtol=1e-4
    )
    delta = jax.tree.map(lambda new, old: old - new,
                         gp_state.params, state.params)
    for d, g in zip(jax.tree.leaves(delta), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(
            np.asarray(d) / 1e-3, np.asarray(g), atol=5e-3, rtol=5e-3
        )


@pytest.mark.slow
def test_dp_x_gp_train_step_matches_single_device():
    """Composed topology: batch over 'data' x depth over 'model' (2x2).
    The identity-optimizer param delta must equal the unsharded global
    gradient, and the loss the global weighted CE (VERDICT r2 #4)."""
    import optax

    from pcseg_tpu.parallel.gp import make_gp_train_step
    from pcseg_tpu.train.steps import create_train_state

    rng = np.random.default_rng(3)
    pts, mask = _inputs(rng, b=4)
    labels = jnp.asarray(rng.integers(0, 4, size=pts.shape[:2]))
    model = VoxelUNet3d(num_classes=4, grid_size=16, width=16, levels=2,
                        compute_dtype="float32", conv_impl="xla")
    tx = optax.identity()
    cw = jnp.asarray([1.0, 2.0, 0.5, 1.0], jnp.float32)

    mesh22 = make_mesh(MeshSpec(data=2, model=2), devices=jax.devices()[:4])
    state = create_train_state(model, jax.random.key(0), tx)
    step = make_gp_train_step(model, mesh22, tx)
    new_state, metrics = step(
        state, (pts, labels, mask), jnp.float32(1e-3), jax.random.key(1), cw
    )

    from pcseg_tpu.ops.losses import cross_entropy_sums

    def loss(params):
        logits = model.apply({"params": params}, pts, mask=mask)
        num, den = cross_entropy_sums(logits, labels, cw)
        return num / den

    l_ref, g_ref = jax.value_and_grad(loss)(state.params)
    np.testing.assert_allclose(
        float(metrics["loss"]), float(l_ref), rtol=1e-4
    )
    delta = jax.tree.map(lambda new, old: old - new,
                         new_state.params, state.params)
    for d, g in zip(jax.tree.leaves(delta), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(
            np.asarray(d) / 1e-3, np.asarray(g), atol=5e-3, rtol=5e-3
        )


@pytest.mark.slow
def test_gp_remat_matches_no_remat():
    """model.remat must be honored inside the GP core (ADVICE r2): same
    forward values and gradients as remat=False."""
    import dataclasses

    import optax

    from pcseg_tpu.parallel.gp import make_gp_train_step
    from pcseg_tpu.train.steps import create_train_state

    rng = np.random.default_rng(4)
    pts, mask = _inputs(rng, b=2)
    labels = jnp.asarray(rng.integers(0, 4, size=pts.shape[:2]))
    model = VoxelUNet3d(num_classes=4, grid_size=16, width=16, levels=2,
                        compute_dtype="float32", conv_impl="xla")
    tx = optax.identity()
    cw = jnp.ones((4,), jnp.float32)
    mesh2 = make_mesh(MeshSpec(data=1, model=2), devices=jax.devices()[:2])
    state = create_train_state(model, jax.random.key(0), tx)

    outs = {}
    for remat in (False, True):
        m = dataclasses.replace(model, remat=remat)
        step = make_gp_train_step(m, mesh2, tx)
        st, metrics = step(
            state, (pts, labels, mask), jnp.float32(1e-3),
            jax.random.key(1), cw,
        )
        outs[remat] = (float(metrics["loss"]), st.params)
    np.testing.assert_allclose(outs[True][0], outs[False][0], rtol=1e-6)
    for a, b in zip(jax.tree.leaves(outs[True][1]),
                    jax.tree.leaves(outs[False][1])):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-6
        )


@pytest.mark.slow
def test_gp_fused_forward_matches_unsharded():
    """The lane-packed Pallas core, depth-sharded (halo-concat around
    each fused conv, psum'd lane stats) vs the unsharded fused core."""
    rng = np.random.default_rng(2)
    pts, mask = _inputs(rng)
    model = VoxelUNet3d(num_classes=4, grid_size=16, width=16, levels=2,
                        compute_dtype="bfloat16", conv_impl="fused")
    variables = model.init(jax.random.key(0))

    mesh = make_mesh(MeshSpec(data=1, model=2), devices=jax.devices()[:2])
    gp = make_gp_forward(model, mesh)
    y_gp = gp(variables, pts, mask)
    y_ref = model.apply(variables, pts, mask=mask)
    np.testing.assert_allclose(
        np.asarray(y_gp), np.asarray(y_ref), atol=0.05, rtol=0.05
    )


def test_gp_eval_step_matches_replicated_and_shards():
    """VERDICT r3 item 2: validation under parallelism='gp' must run
    depth-sharded. The GP eval step's metrics match the replicated eval
    step, and its lowered program really contains the halo collectives
    (collective-permute) — i.e. eval shards the grid instead of
    gathering it."""
    import optax

    from pcseg_tpu.parallel.gp import make_gp_eval_step
    from pcseg_tpu.train.steps import create_train_state, make_eval_step

    rng = np.random.default_rng(5)
    pts, mask = _inputs(rng, b=4)
    labels = jnp.asarray(rng.integers(0, 4, size=pts.shape[:2]))
    labels = jnp.where(mask, labels, -1)
    model = VoxelUNet3d(num_classes=4, grid_size=16, width=16, levels=2,
                        compute_dtype="float32", conv_impl="xla")
    state = create_train_state(model, jax.random.key(0), optax.identity())
    cw = jnp.asarray([1.0, 2.0, 0.5, 1.0], jnp.float32)
    batch = (pts, labels, mask)

    mesh22 = make_mesh(MeshSpec(data=2, model=2), devices=jax.devices()[:4])
    gp_eval = make_gp_eval_step(model, mesh22, 4)
    m_gp = gp_eval(state, batch, cw)

    mesh1 = make_mesh(MeshSpec(data=1, model=1), devices=jax.devices()[:1])
    ref_eval = make_eval_step(model, mesh1, 4)
    m_ref = ref_eval(state, batch, cw)

    np.testing.assert_allclose(
        float(m_gp["loss"]), float(m_ref["loss"]), rtol=1e-4
    )
    assert float(m_gp["total"]) == float(m_ref["total"])
    np.testing.assert_allclose(
        np.asarray(m_gp["confusion"]), np.asarray(m_ref["confusion"])
    )
    np.testing.assert_allclose(
        float(m_gp["correct"]), float(m_ref["correct"])
    )

    hlo = gp_eval.lower(state, batch, cw).as_text()
    assert "collective_permute" in hlo or "collective-permute" in hlo


def test_predictor_gp_mesh_matches_plain():
    """Depth-sharded serving (Predictor gp_mesh) returns the same
    per-point logits as the plain single-device Predictor."""
    from pcseg_tpu.infer import Predictor

    rng = np.random.default_rng(6)
    model = VoxelUNet3d(num_classes=4, grid_size=16, width=16, levels=2,
                        compute_dtype="float32", conv_impl="xla")
    variables = model.init(jax.random.key(0))
    event = rng.normal(size=(300, 4)).astype(np.float32)

    plain = Predictor(variables, 4, model=model, fold=False)
    mesh = make_mesh(MeshSpec(data=2, model=2), devices=jax.devices()[:4])
    gp = Predictor(variables, 4, model=model, fold=False, gp_mesh=mesh)

    np.testing.assert_allclose(
        gp.logits(event), plain.logits(event), atol=2e-3, rtol=2e-3
    )
    assert np.array_equal(gp.predict(event), plain.predict(event))

    # batched serving shards the batch over 'data' while each event's
    # grid stays depth-sharded
    events = [rng.normal(size=(n, 4)).astype(np.float32)
              for n in (120, 300, 77, 512)]
    out_gp = gp.predict_batch(events, batch_size=4)
    out_plain = plain.predict_batch(events, batch_size=4)
    for a, b in zip(out_gp, out_plain):
        assert np.mean(a == b) > 0.99
