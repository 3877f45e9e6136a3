"""Training CLI (reference entry point parity: src/train.py).

Single program covers every scale the reference needed three code paths for
(single GPU / DataParallel / multi-node DDP): the jitted step runs on one
chip, all local chips, or a multi-host slice depending only on the mesh.

Usage (synthetic smoke):
    python -m complex_yolov4_tpu.cli.train --synthetic --num_epochs 1 \
        --model complex_yolov4_tiny --batch_size 2
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from .. import train as T
from ..config.runtime import parse_train_config
from ..data import create_train_loader, create_val_loader
from ..evaluation import evaluate_map, make_inference_fn
from ..losses.yolo_loss import network_loss  # noqa: F401  (re-export surface)
from ..parallel import (
    device_prefetch,
    initialize_distributed,
    local_shard_info,
    make_mesh_for_batch,
    replicate_tree,
)
from ..utils.logger import create_logger
from ..utils.meters import AverageMeter, ProgressMeter
from . import common


def main(argv=None) -> None:
    configs = parse_train_config(argv)
    np.random.seed(configs.seed)

    initialize_distributed(configs.coordinator_address, configs.num_processes,
                           configs.process_id)
    info = local_shard_info()
    is_lead = info["shard_id"] == 0
    configs.make_dirs()
    logger = create_logger(configs.logs_dir, configs.saved_fn, is_lead)

    tb_writer = None
    if is_lead:
        from tensorboardX import SummaryWriter

        tb_writer = SummaryWriter(
            log_dir=configs.logs_dir, filename_suffix="_tpu")

    dataset_dir = common.resolve_dataset_dir(configs)
    spec = common.resolve_spec(configs)
    params, bn_state = common.init_or_load(spec, configs.pretrained_path,
                                           configs.seed)
    logger.info("model %s: %d parameters, %d layers, %d boxes @ %d",
                spec.name, __import__("complex_yolov4_tpu.models.network",
                                      fromlist=["num_parameters"]).num_parameters(params),
                len(spec.layers), spec.num_boxes(configs.img_size), configs.img_size)

    tx = T.create_optimizer(
        params,
        optimizer_type=configs.optimizer_type,
        momentum=configs.momentum,
        weight_decay=configs.weight_decay,
        subdivisions=max(configs.subdivisions, 1),
    )
    state = T.TrainState.create(params, bn_state, tx)

    start_epoch = configs.start_epoch
    global_iter = 0
    if configs.resume_path:
        state, resumed_epoch, _ = T.restore_checkpoint(configs.resume_path, state)
        start_epoch = resumed_epoch + 1
        # Continue the LR schedule where it left off (the reference restores
        # lr_scheduler state, train.py:111-117); global_step counts
        # micro-batches, matching the loop's global_iter.
        global_iter = int(state.global_step)
        logger.info("resumed from %s at epoch %d (iteration %d)",
                    configs.resume_path, resumed_epoch, global_iter)

    # Device-side rasterization (default for non-mosaic training): the loader
    # ships compact points + augmentation decisions and the jitted step builds
    # the BEV maps on device — ~14x less H2D per step than uploading images.
    device_raster = not configs.mosaic and not configs.host_raster

    mesh = make_mesh_for_batch(configs.batch_size)
    logger.info("data mesh: %d device(s) of %d available (%s raster)",
                mesh.devices.size, info["local_device_count"],
                "device" if device_raster else "host")
    state = replicate_tree(mesh, state)
    step = T.make_train_step(
        spec, tx, use_giou_loss=configs.use_giou_loss,
        compute_dtype=common.compute_dtype_of(configs), mesh=mesh,
        remat=configs.remat, device_raster=device_raster, metrics_cond=True,
        batch_pack=configs.batch_pack or None)
    lr_fn = T.make_lr_fn(configs.lr_type, configs.lr, burn_in=configs.burn_in,
                         steps=configs.steps, num_epochs=configs.num_epochs)

    loader = create_train_loader(
        dataset_dir, configs.batch_size,
        num_samples=configs.num_samples,
        multiscale=configs.multiscale_training, mosaic=configs.mosaic,
        random_padding=configs.random_padding, seed=configs.seed,
        shard_id=info["shard_id"], num_shards=info["num_shards"],
        hflip_prob=configs.hflip_prob, cutout_prob=configs.cutout_prob,
        cutout_nholes=configs.cutout_nholes, cutout_ratio=configs.cutout_ratio,
        cutout_fill_value=configs.cutout_fill_value,
        device_raster=device_raster)

    if configs.multiscale_training and not configs.no_precompile_multiscale:
        # Multiscale redraws the input size every 10 batches
        # (reference: kitti_dataset.py:224-230); each new size is a fresh XLA
        # compile of the step (20-60 s remote), which otherwise lands as
        # unpredictable mid-epoch stalls. Warm every size bucket up front with
        # dummy steps on a THROWAWAY copy of the state (the step donates its
        # state argument), so epoch 1 runs stall-free.
        t_pre = time.time()
        dummy_state = jax.tree.map(jnp.copy, state)
        for size in loader.size_choices:
            dummy = common.dummy_train_batch(
                configs.batch_size, size, mesh=mesh,
                device_raster=device_raster,
                max_holes=max(configs.cutout_nholes, 1))
            dummy_state, _ = step(dummy_state, dummy, jnp.float32(0.0),
                                  size if device_raster else 0,
                                  jnp.bool_(False))
        jax.block_until_ready(dummy_state.params)
        del dummy_state
        logger.info("precompiled %d multiscale size buckets in %.1fs",
                    len(loader.size_choices), time.time() - t_pre)

    infer_fn = None
    val_loader = None
    if not configs.no_val:
        # Val rides the device raster too (points H2D, not 4.4 MB images):
        # per-epoch mAP through a low-bandwidth link is minutes cheaper.
        val_loader = create_val_loader(dataset_dir, configs.batch_size,
                                       seed=configs.seed,
                                       device_raster=not configs.host_raster)
        infer_fn = make_inference_fn(
            spec, conf_thresh=configs.conf_thresh,
            nms_thresh=configs.nms_thresh, compute_dtype=jnp.float32,
            from_points=not configs.host_raster)

    subdivisions = max(configs.subdivisions, 1)
    profiler_active = False
    try:
        for epoch in range(start_epoch, configs.num_epochs + 1):
            loader.set_epoch(epoch)
            batch_time = AverageMeter("Time", ":6.3f")
            loss_meter = AverageMeter("Loss", ":.4e")
            progress = ProgressMeter(len(loader), [batch_time, loss_meter],
                                     prefix=f"Epoch [{epoch}/{configs.num_epochs}]")
            t0 = time.time()
            pending = []  # (batch_count, device loss scalar) not yet pulled
            prefetch_keys = (("points", "point_mask", "flip", "holes", "hole_mask",
                              "targets", "target_mask") if device_raster
                             else ("image", "targets", "target_mask"))
            batch_iter = device_prefetch(loader, mesh, keys=prefetch_keys,
                                         host_keys=("size",))
            if configs.epoch_preload:
                # Materialize + finish ALL of this epoch's uploads before the
                # first dispatch: through the axon tunnel, interleaving fresh
                # H2D with queued executions reproducibly wedges the server
                # ~15-30 steps in (r5; bench_train's 43 uploads-free steps run
                # clean), and an epoch of compact point batches is small
                # (~43 MB at batch 8). Fresh augmentation per epoch is kept.
                batch_iter = list(batch_iter)
                jax.block_until_ready([v for b in batch_iter
                                       for k, v in b.items() if k != "size"])
            for b_idx, device_batch in enumerate(batch_iter):
                # multi_step advances per OPTIMIZER iteration — the reference
                # steps its scheduler only when an optimizer step fires
                # (train.py:213-218), i.e. every `subdivisions` micro-batches.
                lr = lr_fn(global_iter // subdivisions, epoch - 1)
                if configs.profile_steps and global_iter == configs.profile_start:
                    jax.profiler.start_trace(configs.logs_dir)
                    profiler_active = True
                img_size = int(device_batch.pop("size", 0))
                # metric-only geometry (lax.cond in the loss) runs only on steps
                # whose metrics tensorboard will actually read. The predicate is
                # pure config (NOT is_lead/tb_writer): every process in a
                # multi-host mesh must take the same cond branch, or the
                # true-branch's cross-shard reductions deadlock.
                wm = (global_iter + 1) % configs.tensorboard_freq == 0
                state, metrics = step(state, device_batch, jnp.float32(lr),
                                      img_size if device_raster else 0,
                                      jnp.bool_(wm))
                global_iter += 1
                if profiler_active and global_iter >= (
                        configs.profile_start + configs.profile_steps):
                    jax.block_until_ready(metrics["loss"])
                    jax.profiler.stop_trace()
                    profiler_active = False
                    logger.info("profiler trace written to %s", configs.logs_dir)
                # Defer the scalar read: float(loss) every step costs a ~50 ms
                # tunnel round trip AND stalls the dispatch pipeline (measured
                # ~250 ms/step vs the 104 ms device step). Losses stay on device
                # and are pulled in one transfer per print/tensorboard window.
                pending.append((device_batch["targets"].shape[0], metrics["loss"]))
                batch_time.update(time.time() - t0)
                t0 = time.time()
                want_print = is_lead and b_idx % configs.print_freq == 0
                want_tb = (tb_writer is not None
                           and global_iter % configs.tensorboard_freq == 0)
                if want_print or want_tb:
                    vals = jax.device_get([v for _, v in pending])
                    for (n_, _), v in zip(pending, vals):
                        loss_meter.update(float(v), n_)
                    pending.clear()
                    loss = float(vals[-1])
                if want_print:
                    logger.info(progress.get_message(b_idx))
                if want_tb:
                    tb_writer.add_scalar("train/lr", lr, global_iter)
                    tb_writer.add_scalar("train/loss", loss, global_iter)
                    # one batched transfer for all ~54 head metrics (per-scalar
                    # float(v) would be a ~50 ms tunnel round trip EACH)
                    metrics_host = jax.device_get(
                        {k: v for k, v in metrics.items() if k.startswith("head")})
                    for k, v in metrics_host.items():
                        tb_writer.add_scalar(f"train/{k}", float(v), global_iter)

            if pending:  # drain the tail of the epoch's deferred loss reads
                vals = jax.device_get([v for _, v in pending])
                for (n_, _), v in zip(pending, vals):
                    loss_meter.update(float(v), n_)
                pending.clear()

            if val_loader is not None and is_lead:
                out = evaluate_map(infer_fn, state.params, state.bn_state,
                                   val_loader, iou_threshold=configs.iou_thresh)
                logger.info("epoch %d val mAP %.4f (AP per class: %s)",
                            epoch, float(out["mAP"]), np.round(out["AP"], 4).tolist())
                if tb_writer is not None:
                    tb_writer.add_scalar("val/mAP", float(out["mAP"]), epoch)

            if is_lead and (epoch % configs.checkpoint_freq == 0
                            or epoch == configs.num_epochs):
                # Async: the full-state D2H through the tunnel costs minutes;
                # snapshot on device and write from a background thread.
                T.save_checkpoint_async(configs.checkpoints_dir, state, epoch)
                logger.info("checkpoint save for epoch %d started (async, %s)",
                            epoch, configs.checkpoints_dir)
                if configs.sync_checkpoint:
                    # Serialize the ~full-state D2H against the next epoch's
                    # dispatches: through the axon tunnel, mixed transfer +
                    # execute streams wedge the server (same mechanism as the
                    # H2D interleave that --epoch_preload removes; observed
                    # at the first post-checkpoint epoch, r5).
                    T.wait_for_async_save()
                    logger.info("checkpoint save for epoch %d joined (sync)",
                                epoch)

    finally:
        # join (and surface errors from) any in-flight async
        # checkpoint save even when the loop raises or is interrupted
        T.wait_for_async_save()
    if tb_writer is not None:
        tb_writer.close()
    logger.info("training done: %d epochs, %d iterations",
                configs.num_epochs - start_epoch + 1, global_iter)


if __name__ == "__main__":
    try:
        main(sys.argv[1:])
    except KeyboardInterrupt:
        # Graceful interrupt (reference: train.py:248-255); resume later with
        # --resume_path on the last saved epoch checkpoint.
        print("\ninterrupted — resume with --resume_path <checkpoints>/epoch_N")
        sys.exit(130)
