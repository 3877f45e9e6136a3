"""Fused CSP-stage kernel parity (ops/fused_stage.py).

Oracle: an independent f32 lax re-evaluation of the segment ops (NOT the
network executor), so kernel and executor bugs can't cancel out. The kernel
computes in bf16 with f32 accumulation; tolerance is bf16-scale.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from complex_yolov4_tpu.models import get_model_spec
from complex_yolov4_tpu.models import network as net
from complex_yolov4_tpu.ops import fused_stage as fs


def _oracle(seg, x, folded_params):
    """f32 reference evaluation of seg.ops with plain lax ops."""
    vals = {-1: x.astype(jnp.float32)}
    acts = fs._ACTS
    for oi, op in enumerate(seg.ops):
        if op.kind in ("conv1x1", "conv3x3"):
            p = folded_params[f"layer{op.layer_index}"]
            k = 1 if op.kind == "conv1x1" else 3
            pad = 0 if k == 1 else 1
            y = jax.lax.conv_general_dilated(
                vals[op.srcs[0]], jnp.asarray(p["w"], jnp.float32),
                window_strides=(1, 1), padding=[(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            vals[oi] = acts[op.activation](y + jnp.asarray(p["b"], jnp.float32))
        elif op.kind == "shortcut":
            vals[oi] = acts[op.activation](vals[op.srcs[0]] + vals[op.srcs[1]])
        elif op.kind == "concat":
            vals[oi] = jnp.concatenate([vals[s] for s in op.srcs], axis=-1)
        elif op.kind == "slice":
            v = vals[op.srcs[0]]
            c = v.shape[-1] // op.groups
            vals[oi] = v[..., op.group_id * c:(op.group_id + 1) * c]
        elif op.kind == "identity":
            vals[oi] = vals[op.srcs[0]]
    return vals[len(seg.ops) - 1]


def _folded(name):
    spec = get_model_spec(name)
    params, state = net.init_params(spec, jax.random.PRNGKey(0))
    fparams = net.fold_batchnorm(spec, params, state)
    return net.fold_spec(spec), fparams


FLAG_SEGS = None


def _flag_segments():
    global FLAG_SEGS
    if FLAG_SEGS is None:
        fspec, fparams = _folded("complex_yolov4")
        segs = fs.plan_segments(fspec, 608)
        FLAG_SEGS = (fspec, fparams, segs)
    return FLAG_SEGS


def test_planner_finds_csp_stages():
    fspec, _, segs = _flag_segments()
    spans = [(s.start, s.end) for s in segs]
    assert (2, 10) in spans and (12, 23) in spans
    s2 = segs[spans.index((2, 10))]
    assert s2.halo == 1 and s2.cin == 64 and s2.cout == 64
    s3 = segs[spans.index((12, 23))]
    assert s3.halo == 2 and s3.cin == 128 and s3.cout == 128


@pytest.mark.parametrize("span,width", [((2, 10), 76), ((2, 10), 152),
                                        ((12, 23), 76), ((12, 23), 152)])
def test_segment_parity(span, width):
    """Kernel (interpret mode) matches the f32 oracle to bf16 tolerance,
    including across tile boundaries and at the image edge rows."""
    fspec, fparams, segs = _flag_segments()
    seg = next(s for s in segs if (s.start, s.end) == span)
    rng = np.random.default_rng(span[0] * 1000 + width)
    x = jnp.asarray(
        rng.standard_normal((2, width, width, seg.cin)), jnp.bfloat16)
    sp = fs.segment_params(seg, fparams)
    got = fs.apply_segment(seg, x, sp, width=width, interpret=True)
    want = _oracle(seg, x, fparams)
    assert got.shape == want.shape
    err = jnp.max(jnp.abs(got.astype(jnp.float32) - want))
    scale = jnp.max(jnp.abs(want)) + 1e-6
    assert float(err / scale) < 0.03, float(err / scale)


def test_tiny_model_segment_parity():
    """The tiny model's CSP block (3 halo rows, leaky, group-slice route)."""
    fspec, fparams = _folded("complex_yolov4_tiny")
    segs = fs.plan_segments(fspec, 608)
    assert segs, "no fused segment planned for tiny at 608"
    seg = segs[0]
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((1, 152, 152, seg.cin)), jnp.bfloat16)
    sp = fs.segment_params(seg, fparams)
    got = fs.apply_segment(seg, x, sp, width=152, interpret=True)
    want = _oracle(seg, x, fparams)
    err = jnp.max(jnp.abs(got.astype(jnp.float32) - want))
    scale = jnp.max(jnp.abs(want)) + 1e-6
    assert float(err / scale) < 0.03, float(err / scale)


def test_in_network_fused_forward_matches(monkeypatch):
    """network.apply with use_fused_stage=True matches the standard executor
    (bf16) on the flagship — segments swap in transparently."""
    monkeypatch.setattr(fs, "_MIN_W", 80)  # flagship at 320 input: stages @160/@80
    spec = get_model_spec("complex_yolov4")
    params, state = net.init_params(spec, jax.random.PRNGKey(1))
    x = jnp.asarray(np.random.default_rng(3).uniform(
        size=(1, 320, 320, 3)), jnp.float32)

    ref, _ = jax.jit(lambda p, s, xx: net.apply(
        spec, p, s, xx, compute_dtype=jnp.bfloat16, use_pallas_conv=False,
        use_fused_stage=False))(params, state, x)
    got, _ = jax.jit(lambda p, s, xx: net.apply(
        spec, p, s, xx, compute_dtype=jnp.bfloat16, use_pallas_conv=False,
        use_fused_stage=True))(params, state, x)
    assert got.shape == ref.shape
    # Decoded boxes: xywh in pixels + angle/conf/classes. bf16 epilogue order
    # differs (f32 vs bf16 bias/act), so allow bf16-scale slack on positions.
    d = np.abs(np.asarray(got, np.float32) - np.asarray(ref, np.float32))
    assert float(d[..., 4:].max()) < 0.05, float(d[..., 4:].max())
    assert float(d[..., :4].max()) < 3.0, float(d[..., :4].max())


@pytest.mark.parametrize("span,width", [((2, 10), 76), ((12, 23), 152)])
def test_segment_parity_packed(span, width):
    """Width-packed (P=2) layout matches the f32 oracle too."""
    fspec, fparams, segs = _flag_segments()
    seg = next(s for s in segs if (s.start, s.end) == span)
    assert fs.packed_ok(seg)
    rng = np.random.default_rng(span[0] * 77 + width)
    x = jnp.asarray(
        rng.standard_normal((2, width, width, seg.cin)), jnp.bfloat16)
    sp = fs.segment_params(seg, fparams, layout="packed2")
    got = fs.apply_segment(seg, x, sp, width=width, interpret=True,
                           layout="packed2")
    want = _oracle(seg, x, fparams)
    assert got.shape == want.shape
    err = jnp.max(jnp.abs(got.astype(jnp.float32) - want))
    scale = jnp.max(jnp.abs(want)) + 1e-6
    assert float(err / scale) < 0.03, float(err / scale)
