"""Model IR, cfg parser, and forward-pass tests.

Covers what the reference only smoke-checked manually
(reference: src/models/model_utils.py:70-90) plus cfg/zoo structural parity.
"""

import os

import jax
import jax.numpy as jnp
import pytest

from complex_yolov4_tpu.models import get_model_spec, netspec_from_cfg
from complex_yolov4_tpu.models import network as net
from complex_yolov4_tpu.models.spec import ConvSpec, YoloSpec

REFERENCE_CFG_DIR = "/root/reference/src/config/cfg"

ALL_MODELS = ["complex_yolov4", "complex_yolov4_tiny", "complex_yolov3", "complex_yolov3_tiny"]


@pytest.mark.parametrize("name", ALL_MODELS)
def test_zoo_spec_structure(name):
    spec = get_model_spec(name)
    spec.validate()
    heads = [spec.layers[i] for i in spec.yolo_indices]
    assert len(heads) in (2, 3)
    strides = sorted({h.stride for h in heads})
    assert all(s in (8, 16, 32) for s in strides)
    assert spec.num_classes == 3
    # per-head conv emits 3*(7+C) channels
    for i in spec.yolo_indices:
        prev = spec.layers[i - 1]
        assert isinstance(prev, ConvSpec)
        assert prev.filters == 3 * (7 + 3)
        assert not prev.batch_normalize and prev.activation == "linear"


@pytest.mark.parametrize("name", ALL_MODELS)
@pytest.mark.skipif(not os.path.isdir(REFERENCE_CFG_DIR), reason="reference tree not present")
def test_zoo_matches_reference_cfg(name):
    """The programmatic zoo builds the exact same IR as parsing the cfg DSL."""
    zoo = get_model_spec(name)
    cfg = netspec_from_cfg(os.path.join(REFERENCE_CFG_DIR, f"{name}.cfg"), name=name)
    assert zoo.layers == cfg.layers
    assert (zoo.width, zoo.height, zoo.in_channels) == (cfg.width, cfg.height, cfg.in_channels)


def test_num_boxes_at_608():
    """3*(76^2+38^2+19^2) = 22743 decoded boxes at 608 (SURVEY.md §7)."""
    spec = get_model_spec("complex_yolov4")
    assert spec.num_boxes(608) == 22743


@pytest.mark.parametrize("name,size", [("complex_yolov4_tiny", 128), ("complex_yolov4", 96)])
def test_forward_shapes_and_finiteness(name, size):
    spec = get_model_spec(name)
    params, state = net.init_params(spec, jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, size, size, 3))
    fwd = jax.jit(lambda p, s, x: net.apply(spec, p, s, x, compute_dtype=jnp.float32))
    out, heads = fwd(params, state, x)
    assert out.shape == (2, spec.num_boxes(size), 7 + spec.num_classes)
    assert bool(jnp.isfinite(out).all())
    assert bool((out[..., 6] >= 0).all() and (out[..., 6] <= 1).all())
    assert len(heads) == len(spec.yolo_indices)
    # w/l are positive (exp-decoded)
    assert bool((out[..., 2:4] > 0).all())


def test_train_mode_updates_bn_state():
    spec = get_model_spec("complex_yolov4_tiny")
    params, state = net.init_params(spec, jax.random.PRNGKey(0))
    fwd = jax.jit(lambda p, s, x: net.apply(spec, p, s, x, train=True, compute_dtype=jnp.float32))
    (_, _), new_state = fwd(params, state, jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 3)))
    assert any(bool((new_state[k]["mean"] != state[k]["mean"]).any()) for k in state)
    # inference mode must not touch state
    out = net.apply(spec, params, state, jnp.zeros((1, 64, 64, 3)), compute_dtype=jnp.float32)
    assert isinstance(out, tuple) and len(out) == 2


def test_bn_folding_matches_unfolded():
    spec = get_model_spec("complex_yolov4_tiny")
    params, state = net.init_params(spec, jax.random.PRNGKey(0))
    # give BN stats non-trivial values
    state = {k: {"mean": v["mean"] + 0.1, "var": v["var"] * 1.3} for k, v in state.items()}
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 64, 3))
    ref, _ = jax.jit(lambda p, s, x: net.apply(spec, p, s, x, compute_dtype=jnp.float32))(params, state, x)
    fparams = net.fold_batchnorm(spec, params, state)
    fspec = net.fold_spec(spec)
    got, _ = jax.jit(lambda p, x: net.apply(fspec, p, {}, x, compute_dtype=jnp.float32))(fparams, x)
    assert bool(jnp.allclose(ref, got, atol=2e-3, rtol=1e-3))


def test_decode_exp_clamp():
    """exp(w) clamped at 1e3 like the reference (yolo_layer.py:179)."""
    from complex_yolov4_tpu.models.yolo_head import decode_head

    spec = get_model_spec("complex_yolov4_tiny")
    head = [l for l in spec.layers if isinstance(l, YoloSpec)][0]
    feat = jnp.full((1, 4, 4, 3 * 10), 50.0)  # exp(50) would overflow
    raw = decode_head(feat, head, 128)
    assert bool(jnp.isfinite(raw["output"]).all())
    stride = 128 / 4
    max_w = 1e3 * max(a[0] for a in head.anchors) / stride * stride
    assert bool((raw["output"][..., 2] <= max_w + 1).all())


def test_cfg_parser_errors():
    with pytest.raises(ValueError):
        netspec_from_cfg("[convolutional]\nfilters=8\n")
    with pytest.raises(ValueError):
        netspec_from_cfg("[net]\nwidth=64\nheight=64\nchannels=3\n[lstm]\nhidden=1\n")
    with pytest.raises(KeyError):
        get_model_spec("yolo9000")


@pytest.mark.parametrize("variant", ["phase", "dense"])
def test_s2d_early_matches_standard(variant, monkeypatch):
    """Space-to-depth early-segment execution (models/s2d.py) is an exact
    rewrite: full-network decoded outputs match the standard executor.
    MIN_SPATIAL is shrunk so the segment activates at test resolution."""
    from complex_yolov4_tpu.models import s2d as s2d_mod

    monkeypatch.setattr(s2d_mod, "MIN_SPATIAL", 8)
    for name, size in (("complex_yolov4_tiny", 128), ("complex_yolov4", 96)):
        spec = get_model_spec(name)
        plan = s2d_mod.plan_segment(spec, size)
        assert plan is not None and plan[1] > plan[0]
        params, state = net.init_params(spec, jax.random.PRNGKey(0))
        x = jax.random.uniform(jax.random.PRNGKey(1), (1, size, size, 3))
        base, _ = jax.jit(lambda p, s, xx: net.apply(
            spec, p, s, xx, compute_dtype=jnp.float32, use_pallas_conv=False))(params, state, x)
        got, _ = jax.jit(lambda p, s, xx: net.apply(
            spec, p, s, xx, compute_dtype=jnp.float32, use_pallas_conv=False,
            s2d_early=variant))(params, state, x)
        assert bool(jnp.allclose(base, got, atol=1e-4, rtol=1e-4)), name


def test_s2d_plan_at_native_resolution():
    """At 608 the segment covers the CSPDarknet53 stem through the 152->76
    downsample (layers 1..24); at tiny-net 416 it covers the first stride-2
    conv only."""
    from complex_yolov4_tpu.models import s2d as s2d_mod

    assert s2d_mod.plan_segment(get_model_spec("complex_yolov4"), 608) == (1, 24)
    plan = s2d_mod.plan_segment(get_model_spec("complex_yolov4_tiny"), 416)
    assert plan is None or plan[0] == 1


def test_deferred_route_concat_matches_materialized():
    """Route-concat elimination (network._PartsConcat): every multi-route
    whose sole consumer is the next 1x1 conv runs as weight-sliced convs —
    decoded outputs must match the materialized-concat path, on both the
    f32 path and the int8 quant path (int32 part sums are exact)."""
    import numpy as np
    from complex_yolov4_tpu.models import quantize as qz
    from complex_yolov4_tpu.models.network import _PartsConcat  # noqa: F401

    for name, size in (("complex_yolov4", 96), ("complex_yolov4_tiny", 128)):
        spec = get_model_spec(name)
        params, state = net.init_params(spec, jax.random.PRNGKey(0))
        x = jax.random.uniform(jax.random.PRNGKey(2), (2, size, size, 3))
        base, _ = jax.jit(lambda p, s, xx: net.apply(
            spec, p, s, xx, compute_dtype=jnp.float32, use_pallas_conv=False,
            defer_route_concat=False))(params, state, x)
        got, _ = jax.jit(lambda p, s, xx: net.apply(
            spec, p, s, xx, compute_dtype=jnp.float32,
            use_pallas_conv=False, defer_route_concat=True))(params, state, x)
        assert bool(jnp.allclose(base, got, atol=1e-4, rtol=1e-4)), name

    # quant path: deferred split must be exact vs the materialized int8 conv
    spec = get_model_spec("complex_yolov4")
    fspec = net.fold_spec(spec)
    params, state = net.init_params(spec, jax.random.PRNGKey(0))
    fparams = net.fold_batchnorm(spec, params, state)
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 96, 96, 3))
    quant = qz.quantize_model(fspec, fparams, [np.asarray(x)],
                              compute_dtype=jnp.float32)
    base, _ = jax.jit(lambda p, q, xx: net.apply(
        fspec, p, {}, xx, compute_dtype=jnp.float32, use_pallas_conv=False,
        quant=q, defer_route_concat=False))(fparams, quant, x)
    got, _ = jax.jit(lambda p, q, xx: net.apply(
        fspec, p, {}, xx, compute_dtype=jnp.float32, use_pallas_conv=False,
        quant=q, defer_route_concat=True))(fparams, quant, x)
    np.testing.assert_allclose(np.asarray(base), np.asarray(got),
                               atol=1e-5, rtol=1e-5)


def test_int8_quantized_forward():
    """PTQ mechanics (models/quantize.py): per-channel weight quantization is
    within half a step, skipped layers fall back to the standard path, and
    the quantized network runs with interior activations within ~2% of f32
    (random-init magnitudes; real accuracy is gated by mAP on a checkpoint)."""
    import numpy as np
    from complex_yolov4_tpu.models import quantize as qz

    spec = get_model_spec("complex_yolov4_tiny")
    params, state = net.init_params(spec, jax.random.PRNGKey(0))
    fparams = net.fold_batchnorm(spec, params, state)
    fspec = net.fold_spec(spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 128, 128, 3))

    skip = qz.default_skip(fspec)
    assert 0 in skip and qz.head_conv_indices(fspec) <= skip
    # chained-int8 plan: sole-consumer conv->conv pairs exist and stay int8
    # through the forward (exercised below since chaining is always on)
    chain = qz.chain_set(fspec, {f"layer{i}" for i, l in enumerate(fspec.layers)
                                 if isinstance(l, ConvSpec)})
    cons = qz.consumers(fspec)
    assert all(cons[i] == {i + 1} for i in chain)
    quant = qz.quantize_model(fspec, fparams, [np.asarray(x)],
                              compute_dtype=jnp.float32)
    assert all(f"layer{i}" not in quant for i in skip)
    # weight round trip within half a quantization step
    k = sorted(quant)[0]
    i = int(k[5:])
    w = np.asarray(fparams[k]["w"], np.float32)
    wq = np.asarray(quant[k]["w_i8"], np.float32) * np.asarray(quant[k]["w_scale"])
    step = np.asarray(quant[k]["w_scale"])
    assert np.all(np.abs(w - wq) <= step / 2 + 1e-7)

    _, _, am_f = jax.jit(lambda p, xx: net.apply(
        fspec, p, {}, xx, compute_dtype=jnp.float32, use_pallas_conv=False,
        capture_act_max=True))(fparams, x)
    _, _, am_q = jax.jit(lambda p, q, xx: net.apply(
        fspec, p, {}, xx, compute_dtype=jnp.float32, use_pallas_conv=False,
        quant=q, capture_act_max=True))(fparams, quant, x)
    for kk, fv in am_f.items():
        fv, qv = float(fv), float(am_q[kk])
        assert abs(fv - qv) <= 0.03 * max(fv, 1e-3), (kk, fv, qv)


def test_cast_conv_params_is_bit_identical():
    """Serving from bf16 pre-cast folded params must equal serving from f32
    params under compute_dtype=bf16 EXACTLY — apply() casts kernels in-graph
    either way; the pre-cast only moves the cast out of the hot loop
    (network.cast_conv_params, the bench/serving default)."""
    import numpy as np

    spec = get_model_spec("complex_yolov4_tiny", width=128, height=128)
    params, state = net.init_params(spec, jax.random.PRNGKey(0))
    fparams = net.fold_batchnorm(spec, params, state)
    fspec = net.fold_spec(spec)
    cparams = net.cast_conv_params(fparams)
    assert all(v.dtype == jnp.bfloat16
               for p in cparams.values() for v in p.values())
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 128, 128, 3))
    run = jax.jit(lambda p, xx: net.apply(
        fspec, p, {}, xx, compute_dtype=jnp.bfloat16, use_pallas_conv=False)[0])
    a = np.asarray(run(fparams, x), np.float32)
    b = np.asarray(run(cparams, x), np.float32)
    np.testing.assert_array_equal(a, b)


def test_cast_conv_params_skips_unfolded_convs():
    """cast_conv_params must leave UNFOLDED convs (entries still carrying BN
    leaves) entirely f32: the pallas/s2d paths fold BN in-graph from the raw
    kernel, and a pre-cast unfolded kernel would be double-rounded there.
    Folded convs and bias-only convs (the YOLO heads) still cast."""
    spec = get_model_spec("complex_yolov4_tiny", width=128, height=128)
    params, state = net.init_params(spec, jax.random.PRNGKey(0))
    cparams = net.cast_conv_params(params)
    saw_unfolded = saw_bias = False
    for k, p in cparams.items():
        if "bn_scale" in p:
            saw_unfolded = True
            assert all(v.dtype == jnp.float32 for v in p.values()), k
        else:
            saw_bias = True
            assert p["w"].dtype == jnp.bfloat16 and p["b"].dtype == jnp.bfloat16
    assert saw_unfolded and saw_bias


def test_batch_pack_matches_plain():
    """Batch-packed early-segment execution (models/bpack.py) must equal the
    plain path: bit-exact in f32 (block-diagonal padding contributes exact
    +0.0 in the accumulator), within float noise in bf16. Covers folded
    (bench) and unfolded (BN-affine tiling) params and both plan shapes
    (p=2 long segment, p=4 stem-only)."""
    import numpy as np

    from complex_yolov4_tpu.models import bpack

    spec = get_model_spec("complex_yolov4", width=160, height=160)
    params, state = net.init_params(spec, jax.random.PRNGKey(0))
    fparams = net.fold_batchnorm(spec, params, state)
    fspec = net.fold_spec(spec)
    assert bpack.plan_segment(fspec, 2) == (0, 22)
    assert bpack.plan_segment(fspec, 4) == (0, 9)
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 160, 160, 3))

    run = jax.jit(
        lambda p, xx, bpk: net.apply(fspec, p, {}, xx,
                                     compute_dtype=jnp.float32,
                                     use_pallas_conv=False,
                                     batch_pack=bpk)[0],
        static_argnums=2)
    a = np.asarray(run(fparams, x, None))
    np.testing.assert_array_equal(np.asarray(run(fparams, x, 2)), a)
    np.testing.assert_array_equal(np.asarray(run(fparams, x, 4)), a)

    runb = jax.jit(
        lambda p, xx, bpk: net.apply(fspec, p, {}, xx,
                                     compute_dtype=jnp.bfloat16,
                                     use_pallas_conv=False,
                                     batch_pack=bpk)[0],
        static_argnums=2)
    ab = np.asarray(runb(fparams, x, None), np.float32)
    bb = np.asarray(runb(fparams, x, 2), np.float32)
    np.testing.assert_allclose(bb, ab, atol=1e-6, rtol=1e-5)

    # unfolded params: the BN inference affine tiles per frame block
    run_u = jax.jit(
        lambda p, s, xx, bpk: net.apply(spec, p, s, xx,
                                        compute_dtype=jnp.float32,
                                        use_pallas_conv=False,
                                        batch_pack=bpk)[0],
        static_argnums=3)
    u0 = np.asarray(run_u(params, state, x, None))
    np.testing.assert_array_equal(np.asarray(run_u(params, state, x, 2)), u0)

    # indivisible batch: packing must be inert, output unchanged
    x3 = x[:3]
    np.testing.assert_array_equal(np.asarray(run(fparams, x3, 2)),
                                  np.asarray(run(fparams, x3, None)))


def test_batch_pack_with_quant_tree():
    """batch_pack composes with the int8 default set: no quantized conv sits
    inside the packed segment (plan excludes them), and outputs match the
    unpacked quantized run.

    Tolerance note: convs whose packed C_in exceeds 128 split the
    contraction into more K-tiles, which can reorder the f32 accumulation by
    ~1 ulp; an int8 quantizer downstream can then round one activation to
    the adjacent bucket. The box decode is compared with a tolerance wide
    enough for one bucket flip (the serving accuracy contract is the mAP
    gate, not bitwise identity)."""
    import numpy as np

    from complex_yolov4_tpu.models import bpack
    from complex_yolov4_tpu.models import quantize as qz

    spec = get_model_spec("complex_yolov4", width=128, height=128)
    params, state = net.init_params(spec, jax.random.PRNGKey(2))
    fparams = net.fold_batchnorm(spec, params, state)
    fspec = net.fold_spec(spec)
    x = np.asarray(jax.random.uniform(jax.random.PRNGKey(3), (2, 128, 128, 3)))
    quant = qz.quantize_model(fspec, fparams, [x], compute_dtype=jnp.float32)
    seg = bpack.plan_segment(fspec, 2, quant.keys())
    assert seg is not None
    assert not any(int(k[5:]) <= seg[1] for k in quant)
    run = jax.jit(
        lambda p, q, xx, bpk: net.apply(fspec, p, {}, xx,
                                        compute_dtype=jnp.float32,
                                        use_pallas_conv=False, quant=q,
                                        batch_pack=bpk)[0],
        static_argnums=3)
    a = np.asarray(run(fparams, quant, jnp.asarray(x), None))
    b = np.asarray(run(fparams, quant, jnp.asarray(x), 2))
    np.testing.assert_allclose(b, a, atol=0.15, rtol=0.02)
