"""Training-throughput benchmark (secondary; bench.py is the headline).

Measures the jitted train step (forward + loss + backward + optimizer) for
complex_yolov4 at 608x608 in bf16 on the default backend and prints one JSON
line {metric, value, unit}. Env knobs: TRAIN_BENCH_BATCH, TRAIN_BENCH_ITERS,
TRAIN_BENCH_GIOU=1 for the rotated-GIoU loss path.
"""

import json
import os
import sys
import time

import numpy as np

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))



def main() -> None:
    batch = int(os.environ.get("TRAIN_BENCH_BATCH", "8"))
    iters = int(os.environ.get("TRAIN_BENCH_ITERS", "10"))
    use_giou = os.environ.get("TRAIN_BENCH_GIOU", "0") == "1"

    import jax
    import jax.numpy as jnp

    from complex_yolov4_tpu import train as T
    from complex_yolov4_tpu.models import get_model_spec
    from complex_yolov4_tpu.models import network as net

    spec = get_model_spec("complex_yolov4")
    params, bn = net.init_params(spec, jax.random.PRNGKey(0))
    tx = T.create_optimizer(params, optimizer_type="sgd")
    state = T.TrainState.create(params, bn, tx)
    step = T.make_train_step(spec, tx, use_giou_loss=use_giou,
                             compute_dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    batch_data = {
        "image": rng.uniform(size=(batch, 608, 608, 3)).astype(np.float32),
        "targets": np.zeros((batch, 64, 7), np.float32),
        "target_mask": np.zeros((batch, 64), np.float32),
    }
    for b in range(batch):
        for t in range(12):
            yaw = rng.uniform(-np.pi, np.pi)
            batch_data["targets"][b, t] = [
                rng.integers(0, 3), rng.uniform(0.1, 0.9), rng.uniform(0.1, 0.9),
                0.04, 0.08, np.sin(yaw), np.cos(yaw)]
            batch_data["target_mask"][b, t] = 1
    device_batch = {k: jnp.asarray(v) for k, v in batch_data.items()}

    state, m = step(state, device_batch, jnp.float32(1e-4))
    jax.block_until_ready(m["loss"])
    assert np.isfinite(float(m["loss"]))

    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, device_batch, jnp.float32(1e-4))
    jax.block_until_ready(m["loss"])
    _ = float(m["loss"])  # force a real read (tunnel semantics)
    dt = time.perf_counter() - t0

    print(json.dumps({
        "metric": "train_step_608" + ("_giou" if use_giou else ""),
        "value": round(batch * iters / dt, 2),
        "unit": "imgs/sec/chip",
    }))


if __name__ == "__main__":
    sys.exit(main())
