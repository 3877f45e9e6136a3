"""Model export CLI — deployment artifacts from a trained checkpoint.

Formats:
- `stablehlo`: the fused inference program (forward + decode + rotated NMS)
  serialized with jax.export — a self-contained, runtime-loadable artifact
  for serving (no Python model code needed at load time);
- `darknet`: reference-compatible `.weights` binary
  (loadable by the original PyTorch repo);
- `orbax`: params + BN state checkpoint directory.

Usage:
    python -m complex_yolov4_tpu.cli.export --model complex_yolov4_tiny \
        --pretrained_path ckpt_dir --format stablehlo --output model.shlo
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

import jax
import jax.numpy as jnp

from ..models import network as net
from ..models import weights_io as wio
from ..ops.nms import nms_batch
from . import common


def export_stablehlo(spec, params, state, output: str, *, batch: int,
                     img_size: int, conf_thresh: float, nms_thresh: float,
                     max_boxes: int, input_kind: str = "image",
                     max_points: int = 20480) -> None:
    from jax import export as jexport

    fparams = net.cast_conv_params(net.fold_batchnorm(spec, params, state))
    fspec = net.fold_spec(spec)

    def forward(params, images):
        decoded, _ = net.apply(fspec, params, {}, images,
                               compute_dtype=jnp.bfloat16,
                               use_pallas_conv=False)
        return nms_batch(decoded, conf_thresh, nms_thresh, max_boxes)

    if input_kind == "points":
        # serving signature: (padded (B, P, 4) clouds, (B, P) mask) ->
        # detections; the BEV raster runs inside the artifact, resized to
        # img_size when it differs from the native 608 (same semantics as
        # the training/eval device-raster path)
        from ..data import bev as bev_mod

        def infer(params, points, pmask):
            b = points.shape[0]
            return forward(params, bev_mod.images_from_deferred_batch(
                {"points": points, "point_mask": pmask,
                 "flip": jnp.zeros((b,), jnp.float32),
                 "holes": jnp.zeros((b, 0, 5), jnp.float32),
                 "hole_mask": jnp.zeros((b, 0), jnp.float32)},
                img_size))

        args = (
            fparams,
            jax.ShapeDtypeStruct((batch, max_points, 4), jnp.float32),
            jax.ShapeDtypeStruct((batch, max_points), jnp.float32),
        )
    else:
        infer = forward
        args = (
            fparams,
            jax.ShapeDtypeStruct((batch, img_size, img_size, 3), jnp.float32),
        )
    exported = jexport.export(jax.jit(infer))(*args)
    data = exported.serialize()
    with open(output, "wb") as f:
        f.write(data)
    print(f"wrote StableHLO artifact ({len(data)} bytes) -> {output}")
    print("  weight signature: bf16 (cast checkpoints with "
          "models.network.cast_conv_params before calling)")
    # round-trip sanity
    restored = jexport.deserialize(data)
    print(f"  in_avals: {len(restored.in_avals)} leaves; "
          f"platforms: {restored.platforms}")


def main(argv=None) -> None:
    parser = argparse.ArgumentParser("export")
    parser.add_argument("--model", type=str, default="complex_yolov4")
    parser.add_argument("--cfgfile", type=str, default=None)
    parser.add_argument("--pretrained_path", type=str, default=None)
    parser.add_argument("--format", type=str, default="stablehlo",
                        choices=["stablehlo", "darknet", "orbax"])
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--img_size", type=int, default=608)
    parser.add_argument("--conf_thresh", type=float, default=0.5)
    parser.add_argument("--nms_thresh", type=float, default=0.5)
    parser.add_argument("--max_boxes", type=int, default=128)
    parser.add_argument("--input", type=str, default="image",
                        choices=["image", "points"],
                        help="stablehlo input signature: BEV images, or "
                             "padded point clouds (raster inside the artifact)")
    parser.add_argument("--max_points", type=int, default=20480)
    args = parser.parse_args(argv)

    spec = common.resolve_spec(args)
    params, state = common.init_or_load(spec, args.pretrained_path)

    if args.format == "stablehlo":
        export_stablehlo(spec, params, state, args.output, batch=args.batch,
                         img_size=args.img_size, conf_thresh=args.conf_thresh,
                         nms_thresh=args.nms_thresh, max_boxes=args.max_boxes,
                         input_kind=args.input, max_points=args.max_points)
    elif args.format == "darknet":
        wio.save_darknet_weights(spec, params, state, args.output)
        print(f"wrote darknet weights -> {args.output}")
    else:
        import orbax.checkpoint as ocp

        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(args.output, {"params": params, "bn_state": state},
                       force=True)
        print(f"wrote orbax checkpoint -> {args.output}")


if __name__ == "__main__":
    main(sys.argv[1:])
