"""Weight interop tests: darknet binary round trip, torch state-dict
ingestion, and numerical conv/BN parity against torch (CPU) — the check that
imported reference checkpoints produce identical activations.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from complex_yolov4_tpu.models import get_model_spec
from complex_yolov4_tpu.models import network as net
from complex_yolov4_tpu.models import weights_io as wio


def test_darknet_roundtrip(tmp_path):
    spec = get_model_spec("complex_yolov4_tiny")
    params, state = net.init_params(spec, jax.random.PRNGKey(0))
    path = str(tmp_path / "model.weights")
    wio.save_darknet_weights(spec, params, state, path, seen=123)
    params2, state2 = wio.load_darknet_weights(spec, path)
    for k in params:
        for n in params[k]:
            np.testing.assert_allclose(
                np.asarray(params[k][n]), params2[k][n], atol=0, err_msg=f"{k}.{n}")
    for k in state:
        for n in state[k]:
            np.testing.assert_allclose(np.asarray(state[k][n]), state2[k][n], atol=0)


def test_darknet_truncation_detected(tmp_path):
    spec = get_model_spec("complex_yolov4_tiny")
    params, state = net.init_params(spec, jax.random.PRNGKey(0))
    path = str(tmp_path / "model.weights")
    wio.save_darknet_weights(spec, params, state, path)
    data = open(path, "rb").read()
    open(path, "wb").write(data[: len(data) // 2])
    with pytest.raises(ValueError, match="truncated"):
        wio.load_darknet_weights(spec, path)


def _torch_style_state_dict(spec, seed=0):
    """Random tensors with the reference Darknet's per-conv ordering."""
    rng = np.random.default_rng(seed)
    sd = {}
    conv_id = 0
    chans = (spec.in_channels,) + spec.out_channels()
    for i, layer in enumerate(spec.layers):
        from complex_yolov4_tpu.models.spec import ConvSpec

        if not isinstance(layer, ConvSpec):
            continue
        cin, cout, k = chans[i], layer.filters, layer.size
        pre = f"models.{i}.conv{conv_id}"
        sd[pre + ".weight"] = torch.tensor(
            rng.normal(0, 0.1, (cout, cin, k, k)).astype(np.float32))
        if layer.batch_normalize:
            bn = f"models.{i}.bn{conv_id}"
            sd[bn + ".weight"] = torch.tensor(rng.uniform(0.5, 1.5, cout).astype(np.float32))
            sd[bn + ".bias"] = torch.tensor(rng.normal(0, 0.1, cout).astype(np.float32))
            sd[bn + ".running_mean"] = torch.tensor(rng.normal(0, 0.1, cout).astype(np.float32))
            sd[bn + ".running_var"] = torch.tensor(rng.uniform(0.5, 1.5, cout).astype(np.float32))
            sd[bn + ".num_batches_tracked"] = torch.tensor(0)
        else:
            sd[pre + ".bias"] = torch.tensor(rng.normal(0, 0.1, cout).astype(np.float32))
        conv_id += 1
    return sd


def test_torch_state_dict_ingestion(tmp_path):
    spec = get_model_spec("complex_yolov4_tiny")
    sd = _torch_style_state_dict(spec)
    path = str(tmp_path / "Model_test.pth")
    torch.save(sd, path)
    params, state = wio.load_torch_state_dict(spec, path)
    # spot-check the first conv kernel mapping OIHW -> HWIO
    w_t = sd["models.0.conv0.weight"].numpy()
    np.testing.assert_allclose(params["layer0"]["w"], np.transpose(w_t, (2, 3, 1, 0)))
    assert "layer0" in state and state["layer0"]["var"].shape == (32,)


def test_conv_bn_leaky_matches_torch():
    """One imported conv+BN+leaky block computes the same activations as
    torch's (NCHW) implementation — the layer-level parity that makes
    checkpoint import meaningful (SURVEY.md §7 hard part 5)."""
    cin, cout, k, size = 3, 8, 3, 16
    rng = np.random.default_rng(1)
    w = rng.normal(0, 0.2, (cout, cin, k, k)).astype(np.float32)
    gamma = rng.uniform(0.5, 1.5, cout).astype(np.float32)
    beta = rng.normal(0, 0.1, cout).astype(np.float32)
    mean = rng.normal(0, 0.1, cout).astype(np.float32)
    var = rng.uniform(0.5, 1.5, cout).astype(np.float32)
    x = rng.normal(0, 1, (2, cin, size, size)).astype(np.float32)

    conv = torch.nn.Conv2d(cin, cout, k, 1, k // 2, bias=False)
    bn = torch.nn.BatchNorm2d(cout)
    with torch.no_grad():
        conv.weight.copy_(torch.tensor(w))
        bn.weight.copy_(torch.tensor(gamma))
        bn.bias.copy_(torch.tensor(beta))
        bn.running_mean.copy_(torch.tensor(mean))
        bn.running_var.copy_(torch.tensor(var))
    bn.eval()
    with torch.no_grad():
        ref = torch.nn.functional.leaky_relu(bn(conv(torch.tensor(x))), 0.1).numpy()

    from complex_yolov4_tpu.models.spec import ConvSpec, NetSpec, YoloSpec

    spec = NetSpec(
        layers=(
            ConvSpec(cout, k, 1, True, True, "leaky"),
            YoloSpec(anchors=((1, 1, 0, 1),), num_classes=1, stride=1),
        ),
        in_channels=cin, width=size, height=size,
    )
    # ingest via the state-dict walker
    sd = {
        "conv.weight": w, "bn.weight": gamma, "bn.bias": beta,
        "bn.running_mean": mean, "bn.running_var": var,
    }
    params, state = wio.load_torch_state_dict(
        NetSpec(layers=(spec.layers[0],), in_channels=cin, width=size, height=size), sd)

    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    pad = (k - 1) // 2
    h = net._conv(x_nhwc, jnp.asarray(params["layer0"]["w"]), 1, pad, jnp.float32)
    st = state["layer0"]
    inv = jax.lax.rsqrt(jnp.asarray(st["var"]) + net.BN_EPS) * jnp.asarray(params["layer0"]["bn_scale"])
    h = h * inv + (jnp.asarray(params["layer0"]["bn_bias"]) - jnp.asarray(st["mean"]) * inv)
    got = np.transpose(np.asarray(jax.nn.leaky_relu(h, 0.1)), (0, 3, 1, 2))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_full_network_torch_import_runs():
    spec = get_model_spec("complex_yolov4_tiny", width=64, height=64)
    params, state = wio.load_torch_state_dict(spec, _torch_style_state_dict(spec))
    out, _ = jax.jit(lambda p, s, x: net.apply(spec, p, s, x, compute_dtype=jnp.float32))(
        params, state, jnp.zeros((1, 64, 64, 3)))
    assert bool(jnp.isfinite(out).all())
