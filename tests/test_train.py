"""Training runtime tests: schedules, optimizer grouping, train step on a
single device and on an 8-device data mesh, checkpoint round trip.

Multi-device coverage the reference never had (SURVEY.md §4): the mesh tests
run on the 8 virtual CPU devices from conftest.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from complex_yolov4_tpu import train as T
from complex_yolov4_tpu.models import get_model_spec
from complex_yolov4_tpu.models import network as net
from complex_yolov4_tpu.parallel import make_mesh, replicate_tree, shard_batch


def test_multi_step_schedule_shape():
    f = T.multi_step_factor(50, (1500, 4000))
    assert f(0) == 0
    assert f(25) == pytest.approx((25 / 50) ** 4)
    assert f(50) == 1.0 and f(1499) == 1.0
    assert f(1500) == 0.1 and f(3999) == 0.1
    assert f(4000) == 0.01


def test_cosine_schedule_shape():
    f = T.cosine_factor(300)
    assert f(0) == pytest.approx(1.0)
    assert f(300) == pytest.approx(0.1)
    assert f(150) == pytest.approx(0.55)


def test_weight_decay_mask():
    spec = get_model_spec("complex_yolov4_tiny")
    params, _ = net.init_params(spec, jax.random.PRNGKey(0))
    mask = T.weight_decay_mask(params)
    for layer, entry in params.items():
        for name in entry:
            assert mask[layer][name] == (name == "w"), (layer, name)


def _tiny_setup(batch=2, size=64, subdivisions=1, mesh=None):
    spec = get_model_spec("complex_yolov4_tiny", width=size, height=size)
    params, bn_state = net.init_params(spec, jax.random.PRNGKey(0))
    tx = T.create_optimizer(params, optimizer_type="sgd", subdivisions=subdivisions)
    state = T.TrainState.create(params, bn_state, tx)
    step = T.make_train_step(spec, tx, compute_dtype=jnp.float32, mesh=mesh)
    rng = np.random.default_rng(0)
    batch_data = {
        "image": rng.uniform(size=(batch, size, size, 3)).astype(np.float32),
        "targets": np.zeros((batch, 8, 7), np.float32),
        "target_mask": np.zeros((batch, 8), np.float32),
    }
    for b in range(batch):
        batch_data["targets"][b, 0] = [0, 0.5, 0.5, 0.1, 0.2, 0.0, 1.0]
        batch_data["target_mask"][b, 0] = 1
    return spec, state, step, batch_data


def test_train_step_updates_params_and_decreases_loss():
    _, state, step, batch = _tiny_setup()
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jnp.float32(1e-3))
        losses.append(float(metrics["loss"]))
    assert int(state.global_step) == 8
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # overfits a fixed batch quickly


def test_train_step_bf16_custom_bn_learns():
    """The production bf16 train step routes BatchNorm through the
    bf16-residual custom VJP (models/bn_train.py, network.apply train
    branch): it must stay finite, actually learn on a fixed batch, and
    track the f32 step's loss closely at init (same math, bf16 rounding)."""
    spec, state, _, batch = _tiny_setup()
    tx = T.create_optimizer(state.params, optimizer_type="sgd")
    step16 = T.make_train_step(spec, tx, compute_dtype=jnp.bfloat16)
    step32 = T.make_train_step(spec, tx, compute_dtype=jnp.float32)
    # the step donates its state: give the f32 arm its own buffer copies
    copy = lambda t: jax.tree_util.tree_map(jnp.array, t)  # noqa: E731
    _, m32 = step32(
        T.TrainState.create(copy(state.params), copy(state.bn_state), tx),
        batch, jnp.float32(1e-3))
    losses = []
    st = T.TrainState.create(state.params, state.bn_state, tx)
    for _ in range(8):
        st, m = step16(st, batch, jnp.float32(1e-3))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # step-1 loss: bf16 vs f32 forward on the same init (loose: bf16 convs)
    assert abs(losses[0] - float(m32["loss"])) / float(m32["loss"]) < 0.05
    # BN running stats moved and stayed finite
    flat = jax.tree_util.tree_leaves(st.bn_state)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in flat)


def test_bn_train_packed_stats_and_grads_match():
    """bn_train with p>1 (packed activations, models/bpack.py layout) must
    reproduce the unpacked batch statistics and gradients exactly: the packed
    stats reduce over the frame-block axis via a minor-dim reshape, so the
    set of summands is identical (only the reduction shape changes)."""
    from complex_yolov4_tpu.models import bn_train as bnt
    from complex_yolov4_tpu.models import bpack

    rng = jax.random.PRNGKey(7)
    k1, k2, k3 = jax.random.split(rng, 3)
    h = jax.random.normal(k1, (4, 6, 6, 5), jnp.float32)
    scale = jax.random.normal(k2, (5,)) * 0.5 + 1.0
    bias = jax.random.normal(k3, (5,)) * 0.1
    hp = bpack.pack(h, 2)  # (2, 6, 6, 10)

    y0, m0, v0 = bnt.bn_train(h, scale, bias)
    yp, mp, vp = bnt.bn_train(hp, scale, bias, 2)
    np.testing.assert_allclose(np.asarray(mp), np.asarray(m0),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(vp), np.asarray(v0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(bpack.unpack(yp, 2)),
                               np.asarray(y0), atol=1e-6)

    # gradients: an arbitrary smooth scalar of y, identical under packing
    w = jnp.sin(jnp.arange(h.size, dtype=jnp.float32)).reshape(h.shape)

    def loss_plain(h_, s_, b_):
        y, _, _ = bnt.bn_train(h_, s_, b_)
        return jnp.sum(jnp.sin(y) * w)

    def loss_packed(h_, s_, b_):
        y, _, _ = bnt.bn_train(bpack.pack(h_, 2), s_, b_, 2)
        return jnp.sum(jnp.sin(bpack.unpack(y, 2)) * w)

    g0 = jax.grad(loss_plain, argnums=(0, 1, 2))(h, scale, bias)
    gp = jax.grad(loss_packed, argnums=(0, 1, 2))(h, scale, bias)
    for a, b in zip(g0, gp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-5)

    # bf16 activations follow the custom-VJP path in both layouts
    hb = h.astype(jnp.bfloat16)
    gb0 = jax.grad(loss_plain)(hb, scale, bias)
    gbp = jax.grad(loss_packed)(hb, scale, bias)
    np.testing.assert_allclose(np.asarray(gbp.astype(jnp.float32)),
                               np.asarray(gb0.astype(jnp.float32)),
                               rtol=1e-2, atol=1e-3)


def test_train_step_batch_pack_matches_plain():
    """Full train step with the batch-packed early backbone == plain step:
    same loss, same updated params, same BN running stats (f32: tight —
    block-diagonal packing only reorders reductions; bf16: loose, covers the
    packed bn_train custom-VJP path end-to-end)."""
    from complex_yolov4_tpu.models import bpack

    spec, state, _, batch = _tiny_setup(batch=4)
    assert bpack.plan_segment(spec, 2) is not None
    tx = T.create_optimizer(state.params, optimizer_type="sgd")
    copy = lambda t: jax.tree.map(jnp.array, t)  # noqa: E731

    for dtype, rtol, atol in ((jnp.float32, 2e-4, 2e-5),
                              (jnp.bfloat16, 0.08, 0.02)):
        step_p = T.make_train_step(spec, tx, compute_dtype=dtype,
                                   batch_pack=2)
        step_0 = T.make_train_step(spec, tx, compute_dtype=dtype)
        s_p = T.TrainState.create(copy(state.params), copy(state.bn_state), tx)
        s_0 = T.TrainState.create(copy(state.params), copy(state.bn_state), tx)
        s_p, m_p = step_p(s_p, batch, jnp.float32(1e-3))
        s_0, m_0 = step_0(s_0, batch, jnp.float32(1e-3))
        np.testing.assert_allclose(float(m_p["loss"]), float(m_0["loss"]),
                                   rtol=rtol)
        for a, b in zip(jax.tree.leaves(s_p.params),
                        jax.tree.leaves(s_0.params)):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32),
                                       rtol=rtol, atol=atol)
        for a, b in zip(jax.tree.leaves(s_p.bn_state),
                        jax.tree.leaves(s_0.bn_state)):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32),
                                       rtol=rtol, atol=atol)


def test_metrics_cond_step_matches_full():
    """metrics_cond step: want_metrics=True reproduces the always-metrics
    step exactly; want_metrics=False yields identical loss/params with the
    gated metrics zeroed (the lax.cond skips the IoU geometry)."""
    spec, state_a, step_full, batch = _tiny_setup()
    tx = T.create_optimizer(state_a.params, optimizer_type="sgd")
    step_c = T.make_train_step(spec, tx, compute_dtype=jnp.float32,
                               metrics_cond=True)
    state_b = T.TrainState.create(
        jax.tree.map(jnp.copy, state_a.params),
        jax.tree.map(jnp.copy, state_a.bn_state), tx)
    state_c = T.TrainState.create(
        jax.tree.map(jnp.copy, state_a.params),
        jax.tree.map(jnp.copy, state_a.bn_state), tx)

    state_a, m_full = step_full(state_a, batch, jnp.float32(1e-3))
    state_b, m_on = step_c(state_b, batch, jnp.float32(1e-3), 0,
                           jnp.bool_(True))
    state_c, m_off = step_c(state_c, batch, jnp.float32(1e-3), 0,
                            jnp.bool_(False))

    for k in m_full:
        np.testing.assert_allclose(np.asarray(m_full[k]), np.asarray(m_on[k]),
                                   rtol=1e-6, atol=1e-6, err_msg=k)
    np.testing.assert_allclose(float(m_full["loss"]), float(m_off["loss"]),
                               rtol=1e-6)
    assert float(m_off["head0/iou_score"]) == 0.0
    assert float(m_off["head0/recall50"]) == 0.0
    for pa, pc in zip(jax.tree.leaves(state_a.params),
                      jax.tree.leaves(state_c.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pc),
                                   rtol=1e-6, atol=1e-7)


def test_train_step_across_multiscale_sizes():
    """One compiled step function must serve consecutive multiscale sizes
    (reference redraws the size every 10 batches, kitti_dataset.py:224-230);
    each size is its own jit cache entry and the CLI precompiles them
    (cli/train.py). The step must produce finite, size-consistent results
    when sizes alternate back-to-back."""
    from complex_yolov4_tpu.cli.common import dummy_train_batch

    spec, state, step, batch64 = _tiny_setup(size=64)
    rng = np.random.default_rng(1)
    batch96 = {
        "image": rng.uniform(size=(2, 96, 96, 3)).astype(np.float32),
        "targets": batch64["targets"],
        "target_mask": batch64["target_mask"],
    }
    losses = []
    for b in (batch64, batch96, batch64, batch96):
        state, metrics = step(state, b, jnp.float32(1e-3))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert int(state.global_step) == 4

    # the CLI's warmup batches must match the loader's pytree signature
    dummy = dummy_train_batch(2, 96)
    ref_struct = jax.tree_util.tree_structure(batch96)
    assert jax.tree_util.tree_structure(dummy) == ref_struct
    assert dummy["image"].shape == batch96["image"].shape
    state, metrics = step(state, dummy, jnp.float32(0.0))
    assert np.isfinite(float(metrics["loss"]))


def _deferred_batch(batch=2, seed=0, max_holes=1):
    """Synthetic deferred-raster batch (points + aug decisions, loader.py)."""
    from complex_yolov4_tpu.data.loader import MAX_POINTS

    rng = np.random.default_rng(seed)
    pts = np.zeros((batch, MAX_POINTS, 4), np.float32)
    msk = np.zeros((batch, MAX_POINTS), np.float32)
    n = 4096
    pts[:, :n, 0] = rng.uniform(0, 50, (batch, n))
    pts[:, :n, 1] = rng.uniform(-25, 25, (batch, n))
    pts[:, :n, 2] = rng.uniform(0, 4, (batch, n))
    pts[:, :n, 3] = rng.uniform(0, 1, (batch, n))
    msk[:, :n] = 1.0
    targets = np.zeros((batch, 8, 7), np.float32)
    tmask = np.zeros((batch, 8), np.float32)
    targets[:, 0] = [0, 0.5, 0.5, 0.1, 0.2, 0.0, 1.0]
    tmask[:, 0] = 1
    return {
        "points": pts, "point_mask": msk,
        "flip": np.arange(batch).astype(np.float32) % 2,
        "holes": np.tile(np.array([10, 60, 30, 90, 0.25], np.float32),
                         (batch, max_holes, 1)),
        "hole_mask": np.ones((batch, max_holes), np.float32),
        "targets": targets, "target_mask": tmask,
    }


def test_train_step_device_raster_matches_host():
    """The device-raster step (points in, BEV built inside the jit) must equal
    the host-raster step run on the images it would build — same loss, same
    updated params — and serve multiple multiscale sizes via the static arg."""
    from complex_yolov4_tpu.data import bev as bev_mod

    spec = get_model_spec("complex_yolov4_tiny", width=64, height=64)
    params, bn_state = net.init_params(spec, jax.random.PRNGKey(0))
    tx = T.create_optimizer(params, optimizer_type="sgd")
    mk_state = lambda: T.TrainState.create(
        jax.tree.map(jnp.copy, params), jax.tree.map(jnp.copy, bn_state), tx)
    step_host = T.make_train_step(spec, tx, compute_dtype=jnp.float32)
    step_dev = T.make_train_step(spec, tx, compute_dtype=jnp.float32,
                                 device_raster=True)

    dbatch = _deferred_batch()
    images = np.asarray(bev_mod.images_from_deferred_batch(dbatch, 64))
    hbatch = {"image": images, "targets": dbatch["targets"],
              "target_mask": dbatch["target_mask"]}

    s_h, m_h = step_host(mk_state(), hbatch, jnp.float32(1e-3))
    s_d, m_d = step_dev(mk_state(), dbatch, jnp.float32(1e-3), 64)
    assert float(m_h["loss"]) == pytest.approx(float(m_d["loss"]), rel=1e-5)
    np.testing.assert_allclose(np.asarray(jax.tree.leaves(s_h.params)[0]),
                               np.asarray(jax.tree.leaves(s_d.params)[0]),
                               atol=1e-6)
    # second multiscale size through the same step (static arg recompile)
    s_d, m_d = step_dev(s_d, dbatch, jnp.float32(1e-3), 96)
    assert np.isfinite(float(m_d["loss"]))

    # the CLI's warmup batches must match the loader's deferred signature
    from complex_yolov4_tpu.cli.common import dummy_train_batch

    dummy = dummy_train_batch(2, 96, device_raster=True, max_holes=1)
    assert (jax.tree_util.tree_structure(dummy)
            == jax.tree_util.tree_structure(
                {k: jnp.asarray(v) for k, v in dbatch.items()}))
    s_d, m_d = step_dev(s_d, dummy, jnp.float32(0.0), 96)
    assert np.isfinite(float(m_d["loss"]))


def test_train_step_device_raster_on_mesh():
    """Deferred batches shard over the data mesh like image batches do."""
    mesh = make_mesh()
    spec = get_model_spec("complex_yolov4_tiny", width=64, height=64)
    params, bn_state = net.init_params(spec, jax.random.PRNGKey(0))
    tx = T.create_optimizer(params, optimizer_type="sgd")
    state = replicate_tree(mesh, T.TrainState.create(params, bn_state, tx))
    step = T.make_train_step(spec, tx, compute_dtype=jnp.float32, mesh=mesh,
                             device_raster=True)
    batch = shard_batch(mesh, _deferred_batch(batch=8))
    state, metrics = step(state, batch, jnp.float32(1e-3), 64)
    assert np.isfinite(float(metrics["loss"]))


def test_gradient_accumulation_semantics():
    """With subdivisions=k, params change only every k micro-steps."""
    _, state, step, batch = _tiny_setup(subdivisions=2)
    p0 = jax.tree.leaves(state.params)[0].copy()
    state, _ = step(state, batch, jnp.float32(1e-3))
    p1 = jax.tree.leaves(state.params)[0]
    assert bool(jnp.allclose(p0, p1))  # accumulating, no update yet
    state, _ = step(state, batch, jnp.float32(1e-3))
    p2 = jax.tree.leaves(state.params)[0]
    assert not bool(jnp.allclose(p0, p2))  # applied after 2nd micro-step


def test_train_step_on_data_mesh():
    """Same step, 8-device mesh: batch sharded, params replicated, loss
    matches the single-device run (allreduce correctness)."""
    mesh = make_mesh()
    assert mesh.devices.size == 8
    _, state_s, step_s, batch = _tiny_setup(batch=8)
    _, state_m, step_m, _ = _tiny_setup(batch=8, mesh=mesh)
    state_m = replicate_tree(mesh, state_m)
    sharded = shard_batch(mesh, batch)

    state_s, m_s = step_s(state_s, batch, jnp.float32(1e-3))
    state_m, m_m = step_m(state_m, sharded, jnp.float32(1e-3))
    assert float(m_s["loss"]) == pytest.approx(float(m_m["loss"]), rel=1e-4)
    ps = jax.tree.leaves(state_s.params)[0]
    pm = jax.tree.leaves(state_m.params)[0]
    # fp32 reduction order differs between sharded/unsharded allreduce
    np.testing.assert_allclose(np.asarray(ps), np.asarray(pm), atol=5e-4)


def test_checkpoint_roundtrip(tmp_path):
    _, state, step, batch = _tiny_setup()
    state, _ = step(state, batch, jnp.float32(1e-3))
    path = T.save_checkpoint(str(tmp_path), state, epoch=3)
    assert T.latest_epoch(str(tmp_path)) == 3

    _, template, _, _ = _tiny_setup()
    restored, epoch, _ = T.restore_checkpoint(path, template)
    assert epoch == 3
    assert int(restored.global_step) == 1
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # restored state steps forward
    restored, metrics = step(restored, batch, jnp.float32(1e-3))
    assert np.isfinite(float(metrics["loss"]))

    params_only = T.restore_params_only(path)
    assert set(params_only.keys()) == set(state.params.keys())


def test_checkpoint_async_save_survives_donation(tmp_path):
    """Async save snapshots the state; the train step afterwards donates and
    invalidates the live buffers — the written checkpoint must hold the
    values from save time, not crash or capture the later state."""
    _, state, step, batch = _tiny_setup()
    state, _ = step(state, batch, jnp.float32(1e-3))
    want = [np.asarray(x) for x in jax.tree.leaves(state.params)]

    T.save_checkpoint_async(str(tmp_path), state, epoch=7)
    state, _ = step(state, batch, jnp.float32(1e-3))  # donates old buffers
    T.wait_for_async_save()

    assert T.latest_epoch(str(tmp_path)) == 7
    _, template, _, _ = _tiny_setup()
    restored, epoch, _ = T.restore_checkpoint(
        str(tmp_path) + "/epoch_7", template)
    assert epoch == 7
    for a, b in zip(want, jax.tree.leaves(restored.params)):
        np.testing.assert_allclose(a, np.asarray(b))


def test_remat_step_matches_plain():
    spec = get_model_spec("complex_yolov4_tiny", width=64, height=64)
    params, bn_state = net.init_params(spec, jax.random.PRNGKey(0))
    tx = T.create_optimizer(params, optimizer_type="sgd")
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.uniform(size=(2, 64, 64, 3)).astype(np.float32),
        "targets": np.zeros((2, 8, 7), np.float32),
        "target_mask": np.zeros((2, 8), np.float32),
    }
    batch["targets"][:, 0] = [0, 0.5, 0.5, 0.1, 0.2, 0.0, 1.0]
    batch["target_mask"][:, 0] = 1
    # distinct buffers: the step donates its input state
    copy = lambda t: jax.tree.map(lambda x: jnp.array(x, copy=True), t)
    s1 = T.TrainState.create(copy(params), copy(bn_state), tx)
    s2 = T.TrainState.create(copy(params), copy(bn_state), tx)
    step_plain = T.make_train_step(spec, tx, compute_dtype=jnp.float32)
    step_remat = T.make_train_step(spec, tx, compute_dtype=jnp.float32, remat=True)
    s1, m1 = step_plain(s1, batch, jnp.float32(1e-3))
    s2, m2 = step_remat(s2, batch, jnp.float32(1e-3))
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-5)
    a = jax.tree.leaves(s1.params)[0]
    b = jax.tree.leaves(s2.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_spec_summary():
    from complex_yolov4_tpu.models.spec import spec_summary

    spec = get_model_spec("complex_yolov4_tiny")
    table = spec_summary(spec)
    assert "conv" in table and "yolo" in table
    assert len(table.splitlines()) == len(spec.layers) + 1


def test_sharded_inference_matches_single():
    """Fused inference (forward+NMS) under a data mesh == single-device."""
    from complex_yolov4_tpu.evaluation import make_inference_fn
    from complex_yolov4_tpu.parallel import data_sharding, replicate_tree

    mesh = make_mesh()
    spec = get_model_spec("complex_yolov4_tiny", width=96, height=96)
    params, state = net.init_params(spec, jax.random.PRNGKey(0))
    infer = make_inference_fn(spec, conf_thresh=0.01, nms_thresh=0.5,
                              max_boxes=16)
    images = np.random.default_rng(0).uniform(size=(8, 96, 96, 3)).astype(np.float32)

    d_single, m_single = infer(params, state, jnp.asarray(images))
    sharded = jax.device_put(jnp.asarray(images), data_sharding(mesh))
    params_r = replicate_tree(mesh, params)
    state_r = replicate_tree(mesh, state)
    d_mesh, m_mesh = infer(params_r, state_r, sharded)
    np.testing.assert_allclose(np.asarray(m_single), np.asarray(m_mesh))
    np.testing.assert_allclose(np.asarray(d_single), np.asarray(d_mesh),
                               atol=2e-3, rtol=1e-3)

    # explicit mesh= path (cli.evaluate's DP serving config), including a
    # batch that doesn't divide the mesh (zero-pad + slice)
    infer_m = make_inference_fn(spec, conf_thresh=0.01, nms_thresh=0.5,
                                max_boxes=16, mesh=mesh)
    d_m8, m_m8 = infer_m(params, state, jnp.asarray(images))
    np.testing.assert_allclose(np.asarray(m_single), np.asarray(m_m8))
    np.testing.assert_allclose(np.asarray(d_single), np.asarray(d_m8),
                               atol=2e-3, rtol=1e-3)
    d_m5, m_m5 = infer_m(params, state, jnp.asarray(images[:5]))
    assert d_m5.shape[0] == 5 and m_m5.shape[0] == 5
    np.testing.assert_allclose(np.asarray(m_single)[:5], np.asarray(m_m5))
    np.testing.assert_allclose(np.asarray(d_single)[:5], np.asarray(d_m5),
                               atol=2e-3, rtol=1e-3)


def test_from_points_inference_matches_image_path():
    """from_points inference (device raster inside the program) must equal
    the image-input program fed the same device-rasterized images."""
    from complex_yolov4_tpu.data import bev as bev_mod
    from complex_yolov4_tpu.evaluation import make_inference_fn

    spec = get_model_spec("complex_yolov4_tiny", width=96, height=96)
    params, state = net.init_params(spec, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    b, n_pts = 2, 4096
    pts = np.zeros((b, n_pts, 4), np.float32)
    pts[..., 0] = rng.uniform(0, 50, (b, n_pts))
    pts[..., 1] = rng.uniform(-25, 25, (b, n_pts))
    pts[..., 2] = rng.uniform(-2, 1, (b, n_pts))
    pts[..., 3] = rng.uniform(0, 1, (b, n_pts))
    pmask = np.ones((b, n_pts), np.float32)
    flip = np.array([0.0, 1.0], np.float32)
    holes = np.zeros((b, 1, 5), np.float32)
    holes[1, 0] = (10, 40, 20, 60, 0.3)
    hole_mask = np.array([[0.0], [1.0]], np.float32)
    batch = {"points": jnp.asarray(pts), "point_mask": jnp.asarray(pmask),
             "flip": jnp.asarray(flip), "holes": jnp.asarray(holes),
             "hole_mask": jnp.asarray(hole_mask)}

    infer_pts = make_inference_fn(spec, conf_thresh=0.01, nms_thresh=0.5,
                                  max_boxes=16, from_points=True, img_size=96)
    d_p, m_p = infer_pts(params, state, batch["points"], batch["point_mask"],
                         batch["flip"], batch["holes"], batch["hole_mask"])

    images = bev_mod.images_from_deferred_batch(batch, 96)
    infer_img = make_inference_fn(spec, conf_thresh=0.01, nms_thresh=0.5,
                                  max_boxes=16)
    d_i, m_i = infer_img(params, state, images)
    np.testing.assert_allclose(np.asarray(m_p), np.asarray(m_i))
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_i),
                               atol=1e-4, rtol=1e-4)


def test_checkpoint_restore_multisteps_leaf_order(tmp_path):
    """MultiSteps optimizer state must restore field-correct (a structureless
    orbax restore returns alphabetical dicts that silently permute namedtuple
    leaves — regression for that)."""
    _, state, step, batch = _tiny_setup(subdivisions=3)
    # one micro-step: mini_step=1, gradient_step=0 — distinguishable ints
    state, _ = step(state, batch, jnp.float32(1e-3))
    ms = state.opt_state
    assert int(ms.mini_step) == 1 and int(ms.gradient_step) == 0
    path = T.save_checkpoint(str(tmp_path), state, epoch=1)

    _, template, _, _ = _tiny_setup(subdivisions=3)
    restored, _, _ = T.restore_checkpoint(path, template)
    assert int(restored.opt_state.mini_step) == 1
    assert int(restored.opt_state.gradient_step) == 0
    # accumulated grads match exactly
    for a, b in zip(jax.tree.leaves(ms.acc_grads),
                    jax.tree.leaves(restored.opt_state.acc_grads)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # restored state continues stepping
    restored, metrics = step(restored, batch, jnp.float32(1e-3))
    assert int(restored.opt_state.mini_step) == 2


def test_device_prefetch_iterator():
    from complex_yolov4_tpu.parallel import device_prefetch

    mesh = make_mesh()
    batches = [{
        "image": np.full((8, 4, 4, 3), float(i), np.float32),
        "targets": np.zeros((8, 2, 7), np.float32),
        "target_mask": np.zeros((8, 2), np.float32),
    } for i in range(5)]
    out = list(device_prefetch(iter(batches), mesh, depth=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert float(np.asarray(b["image"])[0, 0, 0, 0]) == i
        assert b["image"].sharding.num_devices == 8


def test_from_cells_inference_matches_image_path():
    """from_cells inference (COO scatter raster inside the program, the
    bench-default layout) must equal the image-input program fed the same
    COO-rastered images, including the 608 -> img_size resize that mirrors
    the points path."""
    from complex_yolov4_tpu.data import bev as bev_mod
    from complex_yolov4_tpu.data import synthetic
    from complex_yolov4_tpu.evaluation import make_inference_fn

    spec = get_model_spec("complex_yolov4_tiny", width=96, height=96)
    params, state = net.init_params(spec, jax.random.PRNGKey(0))
    clouds = [bev_mod.remove_points_outside(
        synthetic.sample_scene(np.random.default_rng(s))[0])
        for s in range(2)]
    cl, kl = zip(*[bev_mod.aggregate_bev_cells(c) for c in clouds])
    cap = sum(len(c) for c in cl) + 32
    cells, keys, dens = bev_mod.pack_cells_flat(list(cl), list(kl), cap)

    infer_cells = make_inference_fn(spec, conf_thresh=0.01, nms_thresh=0.5,
                                    max_boxes=16, from_cells=True,
                                    img_size=96)
    d_c, m_c = infer_cells(params, state, jnp.asarray(cells),
                           jnp.asarray(keys), jnp.asarray(dens), 2)

    images = bev_mod.make_bev_map_from_cells(
        jnp.asarray(cells), jnp.asarray(keys), jnp.asarray(dens), 2)
    images = jax.image.resize(images, (2, 96, 96, 3), method="linear",
                              antialias=False)
    infer_img = make_inference_fn(spec, conf_thresh=0.01, nms_thresh=0.5,
                                  max_boxes=16)
    d_i, m_i = infer_img(params, state, images)
    np.testing.assert_allclose(np.asarray(m_c), np.asarray(m_i))
    np.testing.assert_allclose(np.asarray(d_c), np.asarray(d_i),
                               atol=1e-4, rtol=1e-4)

    # A FLAT cell batch cannot shard over a mesh — the fn accepts the mesh
    # (for batched (B, C) inputs) but must reject flat input at call time.
    from complex_yolov4_tpu.parallel import make_mesh
    infer_mesh = make_inference_fn(spec, from_cells=True, img_size=96,
                                   mesh=make_mesh(jax.devices()[:1]))
    with pytest.raises(ValueError):
        infer_mesh(params, state, jnp.asarray(cells), jnp.asarray(keys),
                   jnp.asarray(dens), 2)


def test_from_cells_batched_and_mesh_match_flat():
    """The batched (B, C) COO layout must produce the same detections as the
    flat layout — unsharded AND sharded over an 8-device data mesh — and a
    tail batch served through the full-batch program (batch_cap) must equal
    the detections of a program traced at the live count (no-recompile
    serving path, VERDICT r3 weak #7)."""
    from complex_yolov4_tpu.data import bev as bev_mod
    from complex_yolov4_tpu.data import synthetic
    from complex_yolov4_tpu.evaluation import make_inference_fn
    from complex_yolov4_tpu.parallel import make_mesh

    spec = get_model_spec("complex_yolov4_tiny", width=96, height=96)
    params, state = net.init_params(spec, jax.random.PRNGKey(0))
    clouds = [bev_mod.remove_points_outside(
        synthetic.sample_scene(np.random.default_rng(s))[0])
        for s in range(3)]
    cl, kl = zip(*[bev_mod.aggregate_bev_cells(c) for c in clouds])
    per_frame = max(len(c) for c in cl) + 32

    # flat reference at full capacity (batch_cap 4, 3 live frames = a tail)
    cap = 4 * per_frame
    fcells, fkeys, fdens = bev_mod.pack_cells_flat(
        list(cl), list(kl), cap, total_frames=4)
    infer_flat = make_inference_fn(spec, conf_thresh=0.01, nms_thresh=0.5,
                                   max_boxes=16, from_cells=True, img_size=96)
    d_f, m_f = infer_flat(params, state, jnp.asarray(fcells),
                          jnp.asarray(fkeys), jnp.asarray(fdens), 3, 4)
    assert d_f.shape[0] == 3 and m_f.shape[0] == 3

    # batched layout, single device
    bcells, bkeys, bdens = bev_mod.pack_cells_batched(
        list(cl), list(kl), per_frame, total_frames=4)
    d_b, m_b = infer_flat(params, state, jnp.asarray(bcells),
                          jnp.asarray(bkeys), jnp.asarray(bdens), 3, 4)
    np.testing.assert_allclose(np.asarray(m_b), np.asarray(m_f))
    np.testing.assert_allclose(np.asarray(d_b), np.asarray(d_f),
                               atol=1e-4, rtol=1e-4)

    # batched layout sharded over the full 8-device mesh
    mesh = make_mesh(jax.devices())
    infer_mesh = make_inference_fn(spec, conf_thresh=0.01, nms_thresh=0.5,
                                   max_boxes=16, from_cells=True,
                                   img_size=96, mesh=mesh)
    d_m, m_m = infer_mesh(params, state, jnp.asarray(bcells),
                          jnp.asarray(bkeys), jnp.asarray(bdens), 3, 4)
    np.testing.assert_allclose(np.asarray(m_m), np.asarray(m_f))
    np.testing.assert_allclose(np.asarray(d_m), np.asarray(d_f),
                               atol=1e-4, rtol=1e-4)
