"""Shared CLI plumbing: model resolution, weight loading, dataset setup."""

from __future__ import annotations

import os
import tempfile
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..data import synthetic
from ..models import get_model_spec, netspec_from_cfg
from ..models import network as net
from ..models.spec import NetSpec
from ..models import weights_io as wio


def resolve_spec(config) -> NetSpec:
    """Model topology from --model (zoo) or --cfgfile (darknet DSL)."""
    if getattr(config, "cfgfile", None):
        return netspec_from_cfg(config.cfgfile,
                                name=os.path.basename(config.cfgfile))
    return get_model_spec(config.model)


def load_weights(spec: NetSpec, path: str) -> Tuple[dict, dict]:
    """Dispatch on checkpoint flavor: darknet `.weights`, torch `.pth`, or an
    orbax checkpoint directory."""
    if path.endswith(".weights"):
        return wio.load_darknet_weights(spec, path)
    if path.endswith((".pth", ".pt")):
        return wio.load_torch_state_dict(spec, path)
    if os.path.isdir(path):
        from ..train.checkpoint import restore_params_and_bn

        return restore_params_and_bn(path)
    raise ValueError(f"unrecognized checkpoint format: {path!r}")


def init_or_load(spec: NetSpec, pretrained_path: Optional[str], seed: int = 0):
    if pretrained_path:
        return load_weights(spec, pretrained_path)
    return net.init_params(spec, jax.random.PRNGKey(seed))


def resolve_dataset_dir(config) -> str:
    """Return the dataset root; with --synthetic, generate one on demand."""
    if getattr(config, "synthetic", False):
        root = os.path.join(tempfile.gettempdir(),
                            f"synthetic_kitti_{config.synthetic_frames}")
        marker = os.path.join(root, "ImageSets", "train.txt")
        if not os.path.exists(marker):
            n = config.synthetic_frames
            synthetic.generate_kitti_dataset(
                root, num_train=n, num_val=max(n // 2, 1),
                num_test=max(n // 4, 1), seed=0)
        return root
    return config.dataset_dir


def dummy_train_batch(batch_size: int, img_size: int, mesh=None,
                      device_raster: bool = False, max_holes: int = 1) -> dict:
    """Zero-filled batch with the exact train-step pytree/shape/dtype
    signature for warming jit caches — one per multiscale size bucket.
    Sharded over the mesh's data axis when given so it matches the compiled
    step's input shardings. `device_raster` emits the deferred-batch
    signature (points + aug decisions, loader.py) instead of images."""
    from ..data.targets import MAX_TARGETS
    from ..parallel import mesh as pmesh

    if device_raster:
        from ..data.loader import MAX_POINTS

        batch = {
            "points": jnp.zeros((batch_size, MAX_POINTS, 4), jnp.float32),
            "point_mask": jnp.zeros((batch_size, MAX_POINTS), jnp.float32),
            "flip": jnp.zeros((batch_size,), jnp.float32),
            "holes": jnp.zeros((batch_size, max_holes, 5), jnp.float32),
            "hole_mask": jnp.zeros((batch_size, max_holes), jnp.float32),
            "targets": jnp.zeros((batch_size, MAX_TARGETS, 7), jnp.float32),
            "target_mask": jnp.zeros((batch_size, MAX_TARGETS), jnp.float32),
        }
    else:
        batch = {
            "image": jnp.zeros((batch_size, img_size, img_size, 3), jnp.float32),
            "targets": jnp.zeros((batch_size, MAX_TARGETS, 7), jnp.float32),
            "target_mask": jnp.zeros((batch_size, MAX_TARGETS), jnp.float32),
        }
    if mesh is not None:
        sharding = pmesh.data_sharding(mesh)
        batch = {k: jax.device_put(v, sharding) for k, v in batch.items()}
    return batch


def compute_dtype_of(config):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[config.compute_dtype]


def maybe_quantize(spec, params, state, config, loader):
    """--quantize int8 support for the inference CLIs: fold BN, calibrate on
    the first `config.calib_batches` loader batches, and build the int8 tree
    (models/quantize.py). Returns (spec, params, state, quant); identity with
    quant=None when quantization is off."""
    if getattr(config, "quantize", "none") != "int8":
        if compute_dtype_of(config) == jnp.bfloat16 and state:
            # bf16 serving: fold BN stats into the conv weights FIRST (same
            # config the bench measures), then pre-cast kernels to the
            # serving dtype (halves weight HBM reads). Folding before the
            # cast keeps every execution path single-rounded — the pallas /
            # s2d paths fold BN in-graph from the raw weights, which would
            # double-round a pre-cast UNFOLDED kernel. f32 serving keeps the
            # unfolded reference-parity path untouched.
            params = net.cast_conv_params(net.fold_batchnorm(spec, params,
                                                             state))
            return net.fold_spec(spec), params, {}, None
        if compute_dtype_of(config) == jnp.bfloat16:
            params = net.cast_conv_params(params)  # already folded (no state)
        return spec, params, state, None
    import numpy as np

    from ..models import quantize as qz

    fparams = net.fold_batchnorm(spec, params, state)
    fspec = net.fold_spec(spec)
    calib = []
    # (BatchIterator's prefetch producer shuts itself down when the consumer
    # breaks early, so slicing the iterator is leak-free.)
    for i, batch in enumerate(loader):
        if i >= max(int(config.calib_batches), 1):
            break
        calib.append(np.asarray(batch["image"]))
    quant = qz.quantize_model(fspec, fparams, calib,
                              compute_dtype=compute_dtype_of(config))
    print(f"PTQ int8: {len(quant)} of "
          f"{sum(1 for k in fparams)} convs quantized "
          f"({len(calib)} calibration batches)")
    if compute_dtype_of(config) == jnp.bfloat16:
        fparams = net.cast_conv_params(fparams)  # after calibration (f32 in)
    return fspec, fparams, {}, quant
