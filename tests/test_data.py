"""Data-layer tests: BEV raster parity, target codecs, transforms, datasets.

The BEV oracle below follows the reference algorithm (lexsort + unique,
reference: src/data_process/kitti_bev_utils.py:37-76) so both production
implementations (numpy scatter + jax segment ops) are checked against the
reference's observable output, not each other.
"""

import numpy as np
import pytest

from complex_yolov4_tpu.config import kitti as cnf
from complex_yolov4_tpu.data import bev, synthetic, targets as tgt, transforms as tfm
from complex_yolov4_tpu.data.dataset import KittiDataset
from complex_yolov4_tpu.data.loader import BatchIterator, create_train_loader, create_val_loader


def reference_bev_oracle(points):
    """Straight transcription of the reference's lexsort/unique algorithm
    (test oracle only)."""
    grid = cnf.BEV_HEIGHT + 1
    pc = points.copy()
    pc[:, 0] = np.int_(np.floor(pc[:, 0] / cnf.DISCRETIZATION))
    pc[:, 1] = np.int_(np.floor(pc[:, 1] / cnf.DISCRETIZATION) + grid / 2)
    idx = np.lexsort((-pc[:, 2], pc[:, 1], pc[:, 0]))
    pc = pc[idx]
    height = np.zeros((grid, grid))
    _, first = np.unique(pc[:, 0:2], axis=0, return_index=True)
    top = pc[first]
    height[np.int_(top[:, 0]), np.int_(top[:, 1])] = top[:, 2] / cnf.MAX_HEIGHT
    intensity = np.zeros((grid, grid))
    density = np.zeros((grid, grid))
    _, first, counts = np.unique(pc[:, 0:2], axis=0, return_index=True, return_counts=True)
    top = pc[first]
    ncounts = np.minimum(1.0, np.log(counts + 1) / np.log(64))
    intensity[np.int_(top[:, 0]), np.int_(top[:, 1])] = top[:, 3]
    density[np.int_(top[:, 0]), np.int_(top[:, 1])] = ncounts
    out = np.stack([intensity, height, density], axis=-1)
    return out[: cnf.BEV_HEIGHT, : cnf.BEV_WIDTH, :].astype(np.float32)


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(42)
    points, boxes, classes = synthetic.sample_scene(rng)
    return points, boxes, classes


def test_remove_points_outside(scene):
    points, _, _ = scene
    cropped = bev.remove_points_outside(points)
    assert cropped.shape[0] > 1000
    assert cropped[:, 0].min() >= 0 and cropped[:, 0].max() <= 50
    assert cropped[:, 2].min() >= 0 and cropped[:, 2].max() <= 4.0


def test_bev_numpy_matches_reference_oracle(scene):
    points, _, _ = scene
    cropped = bev.remove_points_outside(points)
    got = bev.make_bev_map(cropped)
    ref = reference_bev_oracle(cropped)
    assert got.shape == (608, 608, 3)
    np.testing.assert_allclose(got, ref, atol=1e-6)


def _assert_device_raster_close(dev, host):
    """Device-vs-host comparison with a knife-edge budget: XLA's
    reciprocal-multiply division can shift ~1-in-1e6 boundary points by one
    cell (see data/bev.py docstring); everywhere else values match to f32."""
    mismatched = np.abs(dev - host).max(axis=-1) > 5e-5
    assert mismatched.mean() < 1e-4, f"{mismatched.sum()} cells differ"
    np.testing.assert_allclose(dev[~mismatched], host[~mismatched], atol=5e-5)


def test_bev_jax_matches_numpy(scene):
    points, _, _ = scene
    cropped = bev.remove_points_outside(points)
    host = bev.make_bev_map(cropped)
    padded, mask = bev.pad_points(cropped, 120_000)
    dev = np.asarray(bev.make_bev_map_jax(padded, mask, packed=False))
    _assert_device_raster_close(dev, host)


def test_bev_jax_knife_edge_scenes():
    """Scenes that contain boundary-exact points (seed 3 empirically does)
    stay within the documented mismatch budget."""
    for seed in (3, 11, 29):
        rng = np.random.default_rng(seed)
        points, _, _ = synthetic.sample_scene(rng)
        cropped = bev.remove_points_outside(points)
        host = bev.make_bev_map(cropped)
        padded, mask = bev.pad_points(cropped, 30_000)
        dev = np.asarray(bev.make_bev_map_jax(padded, mask, packed=False))
        _assert_device_raster_close(dev, host)


def test_bev_jax_packed_mode(scene):
    """Packed single-scatter raster: height within the truncation bound,
    intensity within the 8-bit quantization bound (see bev.make_bev_map_jax
    docstring), same knife-edge cell budget as the exact device path."""
    points, _, _ = scene
    cropped = bev.remove_points_outside(points)
    host = bev.make_bev_map(cropped)
    padded, mask = bev.pad_points(cropped, 120_000)
    dev = np.asarray(bev.make_bev_map_jax(padded, mask, packed=True))
    mismatched = np.abs(dev - host).max(axis=-1) > 2.5e-3
    assert mismatched.mean() < 1e-4, f"{mismatched.sum()} cells differ"
    err = np.abs(dev[~mismatched] - host[~mismatched]).reshape(-1, 3)
    assert err[:, 0].max() <= 1.0 / 510 + 1e-6   # intensity: 8-bit quantization
    assert err[:, 1].max() <= 3.1e-5             # height: 15-mantissa-bit truncation
    assert err[:, 2].max() == 0.0                # density: identical


def test_bev_jax_packed_exact_on_8bit_intensity(scene):
    """KITTI velodyne reflectances are 8-bit (i/255); on such data the packed
    path's intensity channel is exact (within one f32 ulp)."""
    points, _, _ = scene
    points = points.copy()
    points[:, 3] = np.round(np.clip(points[:, 3], 0, 1) * 255) / 255.0
    cropped = bev.remove_points_outside(points)
    host = bev.make_bev_map(cropped)
    padded, mask = bev.pad_points(cropped, 120_000)
    dev = np.asarray(bev.make_bev_map_jax(padded, mask, packed=True))
    mismatched = np.abs(dev - host).max(axis=-1) > 5e-5
    assert mismatched.mean() < 1e-4
    err = np.abs(dev[~mismatched] - host[~mismatched]).reshape(-1, 3)
    assert err[:, 0].max() <= 1e-6


def test_bev_jax_batched(scene):
    points, _, _ = scene
    cropped = bev.remove_points_outside(points)
    padded, mask = bev.pad_points(cropped, 20_000)
    batch_pts = np.stack([padded, padded])
    batch_msk = np.stack([mask, mask])
    out = np.asarray(bev.make_bev_map_jax(batch_pts, batch_msk))
    assert out.shape == (2, 608, 608, 3)
    np.testing.assert_allclose(out[0], out[1], atol=0)


def test_bev_jax_flat_matches_padded(scene):
    """The flat-packed layout (one shared buffer + frame ids, bench default)
    must equal the per-frame padded layout exactly — same scatter algorithm,
    different lane packing."""
    points, _, _ = scene
    rng = np.random.default_rng(5)
    clouds = []
    for b in range(3):
        sub = points[rng.uniform(size=points.shape[0]) < 0.6]
        clouds.append(bev.remove_points_outside(sub))
    padded = np.zeros((3, 20480, 4), np.float32)
    masks = np.zeros((3, 20480), np.float32)
    for b, c in enumerate(clouds):
        padded[b], masks[b] = bev.pad_points(c, 20480)
    want = np.asarray(bev.make_bev_map_jax(padded, masks))
    pf, ff, mf = bev.pack_points_flat(clouds, 3 * 20480)
    got = np.asarray(bev.make_bev_map_jax_flat(pf, ff, mf, 3))
    np.testing.assert_array_equal(got, want)
    # truncating capacity drops tail-frame points but stays well-formed
    pf, ff, mf = bev.pack_points_flat(clouds, clouds[0].shape[0] + 100)
    got = np.asarray(bev.make_bev_map_jax_flat(pf, ff, mf, 3))
    np.testing.assert_array_equal(got[0], want[0])
    assert got[2].max() == 0.0


def test_bev_coo_matches_host(scene):
    """The COO raster (host per-cell aggregation + two device scatter-sets)
    must match the host raster within its packing budgets: intensity 8-bit,
    height 18-bit, density EXACT (computed on host from the packed count —
    a per-grid-cell table gather on device measured 47 ms/batch, PERF.md) —
    and with NO mismatched cells at all (cell indices are computed on host,
    so the XLA reciprocal-multiply knife-edge of the raw-points device path
    is gone)."""
    points, _, _ = scene
    rng = np.random.default_rng(7)
    clouds = []
    for b in range(3):
        sub = points[rng.uniform(size=points.shape[0]) < (0.4 + 0.2 * b)]
        clouds.append(bev.remove_points_outside(sub))
    host = np.stack([bev.make_bev_map(c) for c in clouds])
    cells_l, keys_l = zip(*[bev.aggregate_bev_cells(c) for c in clouds])
    cap = sum(len(c) for c in cells_l) + 64
    cells, keys, dens = bev.pack_cells_flat(list(cells_l), list(keys_l), cap)
    got = np.asarray(bev.make_bev_map_from_cells(cells, keys, dens, 3))
    err = np.abs(got - host)
    assert err[..., 0].max() <= 1.0 / 510 + 1e-6  # intensity quantization
    assert err[..., 1].max() <= 1.0 / ((1 << 18) - 1)  # height quantization
    assert err[..., 2].max() == 0.0               # density bit-identical


def test_bev_coo_truncation_and_8bit_exactness(scene):
    """8-bit (KITTI-real) intensities survive the COO packing exactly;
    truncating capacity drops tail frames but keeps earlier frames intact."""
    points, _, _ = scene
    points = points.copy()
    points[:, 3] = np.round(np.clip(points[:, 3], 0, 1) * 255) / 255.0
    c = bev.remove_points_outside(points)
    host = bev.make_bev_map(c)
    cells_a, keys_a = bev.aggregate_bev_cells(c)
    cells, keys, dens = bev.pack_cells_flat([cells_a, cells_a],
                                            [keys_a, keys_a],
                                            len(cells_a) + 10)
    got = np.asarray(bev.make_bev_map_from_cells(cells, keys, dens, 2))
    assert np.abs(got[0, ..., 0] - host[..., 0]).max() <= 1e-6
    assert np.abs(got[0, ..., 1] - host[..., 1]).max() <= 1.0 / ((1 << 18) - 1)
    np.testing.assert_array_equal(got[0, ..., 2], host[..., 2])
    # frame 1 truncated to the 10 spare lanes: at most 10 occupied cells
    assert (got[1].max(axis=-1) > 0).sum() <= 10


def test_build_targets_encoding(scene):
    _, boxes, classes = scene
    labels = np.concatenate([classes[:, None].astype(np.float64), boxes], axis=1)
    # lidar (x,y,z,h,w,l,rz) rows with ry := rz for the codec's 2pi-yaw rule
    targets, mask = tgt.build_yolo_targets(labels)
    n = int(mask.sum())
    assert n > 0
    live = targets[mask > 0]
    assert np.all(live[:, 1:5] >= 0) and np.all(live[:, 1:5] <= 1)
    np.testing.assert_allclose(live[:, 5] ** 2 + live[:, 6] ** 2, 1.0, atol=1e-5)
    # axis swap: column 1 spans lidar-y, column 2 spans lidar-x
    i = 0
    cl, x, y = labels[i, 0], labels[i, 1], labels[i, 2]
    assert live.shape[0] == np.sum(
        (labels[:, 1] > 0) & (labels[:, 1] < 50) & (np.abs(labels[:, 2]) < 25))


def test_targets_roundtrip():
    labels = np.array([
        [0, 20.0, 5.0, -1.0, 1.5, 1.7, 4.0, 0.3],
        [1, 10.0, -8.0, -1.2, 1.8, 0.6, 0.8, -1.1],
        [2, 35.0, 12.0, -0.9, 1.4, 0.6, 1.8, 2.5],
    ])
    targets, mask = tgt.build_yolo_targets(labels)
    rec = tgt.inverse_yolo_targets(targets[mask > 0])
    np.testing.assert_allclose(rec[:, 0], labels[:, 0])
    np.testing.assert_allclose(rec[:, 1:3], labels[:, 1:3], atol=1e-5)  # x, y
    np.testing.assert_allclose(rec[:, 5], labels[:, 5], atol=1e-5)      # w
    np.testing.assert_allclose(rec[:, 6], labels[:, 6], atol=1e-5)      # l
    # yaw parity: reference decode emits -atan2(im,re) - 2pi == ry (mod 2pi)
    dyaw = (rec[:, 7] - labels[:, 7]) % (2 * np.pi)
    dyaw = np.minimum(dyaw, 2 * np.pi - dyaw)
    np.testing.assert_allclose(dyaw, 0.0, atol=1e-5)


def test_camera_lidar_box_roundtrip():
    rng = np.random.default_rng(0)
    boxes = np.stack([
        rng.uniform(-10, 10, 5), rng.uniform(-2, 0, 5), rng.uniform(5, 40, 5),
        rng.uniform(1, 2, 5), rng.uniform(0.5, 2, 5), rng.uniform(1, 5, 5),
        rng.uniform(-3, 3, 5),
    ], axis=1)
    lidar = tfm.camera_to_lidar_box(boxes)
    back = tfm.lidar_to_camera_box(lidar)
    np.testing.assert_allclose(back, boxes, atol=1e-9)


def test_rotation_consistency():
    """Rotating points and boxes together keeps in-box points in-box."""
    rng = np.random.default_rng(1)
    box = np.array([[10.0, 2.0, -1.0, 1.5, 2.0, 4.0, 0.5]])
    # points inside the box
    local = rng.uniform(-0.45, 0.45, (50, 3)) * np.array([4.0, 2.0, 1.5])
    c, s = np.cos(0.5), np.sin(0.5)
    world = local @ np.array([[c, s, 0], [-s, c, 0], [0, 0, 1]]) + box[0, :3]
    pts = np.concatenate([world, np.ones((50, 1))], axis=1)

    rot = tfm.RandomRotation(limit_angle_deg=30, p=1.0)
    new_pts, new_box = rot(np.random.default_rng(5), pts, box)
    # verify points still inside the rotated box: transform into box frame
    nb = new_box[0]
    d = new_pts[:, :2] - nb[:2]
    c2, s2 = np.cos(nb[6]), np.sin(nb[6])
    lx = d[:, 0] * c2 + d[:, 1] * s2
    ly = -d[:, 0] * s2 + d[:, 1] * c2
    assert np.all(np.abs(lx) <= nb[5] / 2 + 1e-6)
    assert np.all(np.abs(ly) <= nb[4] / 2 + 1e-6)


def test_scaling_quirk():
    sc = tfm.RandomScaling(p=1.0, replicate_reference_bug=True)
    pts = np.ones((4, 4))
    boxes = np.ones((1, 7))
    new_pts, _ = sc(np.random.default_rng(3), pts, boxes)
    np.testing.assert_allclose(new_pts[:, :3], 0.95)
    sc2 = tfm.RandomScaling(p=1.0, replicate_reference_bug=False)
    vals = set()
    for k in range(5):
        p2, _ = sc2(np.random.default_rng(k), np.ones((1, 4)), boxes.copy())
        vals.add(round(float(p2[0, 0]), 6))
    assert len(vals) > 1


def test_hflip_and_cutout():
    img = np.random.default_rng(0).uniform(size=(64, 64, 3)).astype(np.float32)
    targets = np.zeros((8, 7), np.float32)
    targets[0] = [0, 0.25, 0.5, 0.1, 0.1, 0.6, 0.8]
    mask = np.zeros(8, np.float32)
    mask[0] = 1

    flip = tfm.HorizontalFlip(p=1.1)  # always
    img2, (t2, m2) = flip(np.random.default_rng(1), img, (targets, mask))
    np.testing.assert_allclose(img2, img[:, ::-1, :])
    assert t2[0, 1] == pytest.approx(0.75)
    assert t2[0, 5] == pytest.approx(-0.6)

    cut = tfm.Cutout(n_holes=1, ratio=2.0, fill_value=0.0, p=1.1)  # hole covers all
    img3, (t3, m3) = cut(np.random.default_rng(2), img, (targets, mask))
    assert np.all(img3 == 0)
    assert m3.sum() == 0  # covered target dropped


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti")
    return synthetic.generate_kitti_dataset(str(root), num_train=6, num_val=3, num_test=2, seed=1)


def test_synthetic_dataset_loads(kitti_root):
    ds = KittiDataset(kitti_root, mode="train")
    assert len(ds) > 0
    path, img, targets, mask = ds.load_sample(0, np.random.default_rng(0))
    assert img.shape == (608, 608, 3) and img.dtype == np.float32
    assert img.min() >= 0 and img.max() <= 1.0 + 1e-6
    assert int(mask.sum()) >= 1
    live = targets[mask > 0]
    assert np.all(live[:, 1:5] > 0) and np.all(live[:, 1:5] < 1)


def test_dataset_objects_land_on_bev(kitti_root):
    """Object centers must coincide with occupied BEV cells (pipeline sanity)."""
    ds = KittiDataset(kitti_root, mode="train")
    _, img, targets, mask = ds.load_sample(0, np.random.default_rng(0))
    occupancy = img[..., 2] > 0
    for t in targets[mask > 0]:
        row = int(t[2] * 608)   # by spans lidar-x = rows
        col = int(t[1] * 608)   # bx spans lidar-y = cols
        window = occupancy[max(row - 8, 0): row + 8, max(col - 8, 0): col + 8]
        assert window.any(), f"no points near target at ({row}, {col})"


def test_mosaic(kitti_root):
    ds = KittiDataset(kitti_root, mode="train", mosaic=True)
    paths, canvas, targets, mask = ds.load_mosaic(0, np.random.default_rng(0))
    # fused native path returns the final resized canvas; numpy fallback the
    # 2S x 2S canvas (the loader resizes it)
    from complex_yolov4_tpu import native
    expected = (608, 608, 3) if native.is_available() else (1216, 1216, 3)
    assert canvas.shape == expected
    assert len(paths) == 4
    live = targets[mask > 0]
    assert live.shape[0] > 0
    assert np.all(live[:, 1:3] >= 0) and np.all(live[:, 1:3] <= 1)


def test_loader_determinism_and_shapes(kitti_root):
    mk = lambda: create_train_loader(kitti_root, batch_size=2, seed=7)
    b1 = next(iter(mk()))
    b2 = next(iter(mk()))
    assert b1["image"].shape == (2, 608, 608, 3)
    assert b1["targets"].shape == (2, 64, 7)
    assert b1["target_mask"].shape == (2, 64)
    np.testing.assert_allclose(b1["image"], b2["image"])
    np.testing.assert_allclose(b1["targets"], b2["targets"])


def test_loader_prefetch_producer_shuts_down_on_break(kitti_root):
    """Breaking out of a prefetching loader must not leak its producer
    thread (regression: the producer used to block forever on q.put)."""
    import threading
    import time

    before = {t.ident for t in threading.enumerate()}
    loader = create_train_loader(kitti_root, batch_size=2, seed=7)
    assert loader.prefetch > 0
    for _ in loader:
        break  # consumer abandons the iterator immediately
    import gc

    gc.collect()  # drop the suspended generator -> its finally runs
    deadline = time.time() + 12.0
    while time.time() < deadline:
        extra = [t for t in threading.enumerate()
                 if t.ident not in before and t.is_alive()
                 and not t.name.startswith("cyv4-loader")]  # shared pool ok
        if not extra:
            break
        time.sleep(0.2)
    assert not extra, f"leaked threads: {[t.name for t in extra]}"


def test_loader_deferred_truncation_warns(kitti_root, monkeypatch):
    """A frame denser than the device-raster point cap must warn (silent
    truncation would quietly diverge training data from the host raster)."""
    import warnings as W

    from complex_yolov4_tpu.data import loader as L

    monkeypatch.setattr(L, "MAX_POINTS", 64)  # force the dense-frame case
    loader = create_train_loader(kitti_root, batch_size=2, seed=7,
                                 device_raster=True)
    with W.catch_warnings(record=True) as caught:
        W.simplefilter("always")
        batch = next(iter(loader))
    assert batch["points"].shape[1] == 64
    assert any("truncating" in str(w.message) for w in caught)


def test_loader_sharding(kitti_root):
    full = create_val_loader(kitti_root, batch_size=1)
    ids = [int(b["sample_ids"][0]) for b in full]
    shard_ids = []
    for s in range(2):
        it = create_val_loader(kitti_root, batch_size=1, shard_id=s, num_shards=2)
        shard_ids += [int(b["sample_ids"][0]) for b in it]
    assert set(ids) == set(shard_ids)


def test_loader_multiscale(kitti_root):
    loader = create_train_loader(kitti_root, batch_size=2, multiscale=True, seed=3)
    sizes = {b["image"].shape[1] for b in loader}
    assert sizes.issubset({512, 544, 576, 608, 640, 672, 704})


def test_loader_device_raster_matches_host(kitti_root):
    """The deferred-raster training batches (points + aug decisions,
    rasterized on device) must reproduce the host pipeline's images for the
    same (seed, epoch, index) stream — within the packed-raster quantization
    budget (intensity <= 1/510, height <= 3.1e-5; bev.py docstring) — and
    identical targets (the RNG stream is shared by construction)."""
    mk = lambda dr: create_train_loader(
        kitti_root, batch_size=3, seed=11, hflip_prob=0.5, cutout_prob=1.0,
        cutout_nholes=2, device_raster=dr)
    host = next(iter(mk(False)))
    dev = next(iter(mk(True)))
    np.testing.assert_array_equal(dev["targets"], host["targets"])
    np.testing.assert_array_equal(dev["target_mask"], host["target_mask"])
    from complex_yolov4_tpu.data.loader import MAX_POINTS

    assert dev["points"].shape == (3, MAX_POINTS, 4)
    assert "image" not in dev
    imgs = np.asarray(bev.images_from_deferred_batch(dev, 608))
    assert imgs.shape == host["image"].shape
    np.testing.assert_allclose(imgs, host["image"], atol=2.1e-3)
    # the sample stream actually exercised flip + cutout on this seed
    assert dev["flip"].sum() >= 1
    assert dev["hole_mask"].sum() >= 1


def test_loader_device_raster_multiscale(kitti_root):
    loader = create_train_loader(kitti_root, batch_size=2, multiscale=True,
                                 seed=3, device_raster=True)
    batch = next(iter(loader))
    assert batch["size"] in {512, 544, 576, 608, 640, 672, 704}
    imgs = np.asarray(bev.images_from_deferred_batch(batch, int(batch["size"])))
    assert imgs.shape == (2, batch["size"], batch["size"], 3)
    assert np.isfinite(imgs).all()


def test_mosaic_random_padding(kitti_root):
    ds = KittiDataset(kitti_root, mode="train", mosaic=True, random_padding=True)
    rngs = [np.random.default_rng(s) for s in (0, 1)]
    canvases = [ds.load_mosaic(0, r)[1] for r in rngs]
    assert canvases[0].shape[0] in (608, 1216)
    # random centers differ between draws
    assert not np.allclose(canvases[0], canvases[1])


def test_val_loader_cells_raster_batches():
    """create_val_loader(cells_raster=True) emits flat COO batches whose
    device raster matches the host raster of the same frames within the COO
    packing budgets (and targets identical to the points-mode loader)."""
    import tempfile

    import jax.numpy as jnp

    from complex_yolov4_tpu.data import synthetic
    from complex_yolov4_tpu.data.loader import create_val_loader

    root = tempfile.mkdtemp(prefix="cells_val_")
    synthetic.generate_kitti_dataset(root, num_train=1, num_val=3,
                                     num_test=1, seed=3)
    lc = create_val_loader(root, 2, device_raster=True, cells_raster=True)
    lp = create_val_loader(root, 2, device_raster=True)
    batches_c = list(lc)
    batches_p = list(lp)
    assert len(batches_c) == len(batches_p) == 2  # 3 frames, batch 2
    got_frames = 0
    for bc, bp in zip(batches_c, batches_p):
        assert set(bc) >= {"cells", "cell_keys", "cell_dens", "targets",
                           "target_mask", "batch", "sample_ids"}
        np.testing.assert_array_equal(bc["targets"], bp["targets"])
        np.testing.assert_array_equal(bc["sample_ids"], bp["sample_ids"])
        img = np.asarray(bev.make_bev_map_from_cells(
            jnp.asarray(bc["cells"]), jnp.asarray(bc["cell_keys"]),
            jnp.asarray(bc["cell_dens"]), bc["batch"]))
        for j in range(bc["batch"]):
            pts = bp["points"][j][bp["point_mask"][j] > 0.5]
            host = bev.make_bev_map(pts)
            err = np.abs(img[j] - host)
            assert err[..., 0].max() <= 1.0 / 510 + 1e-6
            assert err[..., 1].max() <= 1.0 / ((1 << 18) - 1)
            assert err[..., 2].max() == 0.0
            got_frames += 1
    assert got_frames == 3


def test_bev_coo_batched_matches_flat(scene):
    """The shardable batched (B, C) COO layout must produce the same BEV as
    the flat layout (which is itself parity-tested against the host raster),
    including zero-padded pad frames rastering as empty."""
    import jax.numpy as jnp

    points, _, _ = scene
    rng = np.random.default_rng(11)
    clouds = []
    for b in range(3):
        sub = points[rng.uniform(size=points.shape[0]) < (0.3 + 0.25 * b)]
        clouds.append(bev.remove_points_outside(sub))
    cells_l, keys_l = zip(*[bev.aggregate_bev_cells(c) for c in clouds])
    cap = sum(len(c) for c in cells_l) + 64
    fc, fk, fd = bev.pack_cells_flat(list(cells_l), list(keys_l), cap,
                                     total_frames=4)
    want = np.asarray(bev.make_bev_map_from_cells(
        jnp.asarray(fc), jnp.asarray(fk), jnp.asarray(fd), 4))
    per_frame = max(len(c) for c in cells_l) + 16
    bc, bk, bd = bev.pack_cells_batched(list(cells_l), list(keys_l),
                                        per_frame, total_frames=4)
    got = np.asarray(bev.make_bev_map_from_cells_batched(
        jnp.asarray(bc), jnp.asarray(bk), jnp.asarray(bd)))
    np.testing.assert_array_equal(got, want)
    assert got[3].max() == 0.0  # pad frame rasters empty


def test_val_loader_cells_batched_and_capacity():
    """cells_batched loaders emit (batch_cap, C) batches with frame-local
    ids; the derived per-frame cell capacity covers the workload (no drops
    on the split it was estimated from); a tail batch is padded to the full
    batch_cap so the serving program never retraces."""
    import tempfile

    import jax.numpy as jnp

    from complex_yolov4_tpu.data import synthetic
    from complex_yolov4_tpu.data.loader import create_val_loader

    root = tempfile.mkdtemp(prefix="cells_val_b_")
    synthetic.generate_kitti_dataset(root, num_train=1, num_val=3,
                                     num_test=1, seed=5)
    lb = create_val_loader(root, 2, device_raster=True, cells_raster=True,
                           cells_batched=True)
    lf = create_val_loader(root, 2, device_raster=True, cells_raster=True)
    batches_b = list(lb)
    batches_f = list(lf)
    assert lb.cell_capacity is not None and lb.cell_capacity > 0
    assert lb._dropped_cells == 0 and lf._dropped_cells == 0
    for bb, bf in zip(batches_b, batches_f):
        assert bb["cells"].shape == (2, lb.cell_capacity)
        assert bb["batch_cap"] == 2 and bf["batch_cap"] == 2
        np.testing.assert_array_equal(bb["targets"], bf["targets"])
        got = np.asarray(bev.make_bev_map_from_cells_batched(
            jnp.asarray(bb["cells"]), jnp.asarray(bb["cell_keys"]),
            jnp.asarray(bb["cell_dens"])))
        want = np.asarray(bev.make_bev_map_from_cells(
            jnp.asarray(bf["cells"]), jnp.asarray(bf["cell_keys"]),
            jnp.asarray(bf["cell_dens"]), 2))
        np.testing.assert_array_equal(got, want)
    # tail batch: 3 frames at batch 2 -> second batch has 1 live frame but
    # full-capacity arrays (frame 1 empty)
    tail = batches_b[-1]
    assert tail["batch"] == 1 and tail["cells"].shape[0] == 2
    assert (tail["cell_keys"][1] == 0).all()


def test_val_loader_cell_truncation_reported(recwarn):
    """A too-small explicit cell_capacity must warn and count dropped cells
    (silent truncation would bias eval)."""
    import tempfile
    import warnings as _w

    from complex_yolov4_tpu.data import synthetic
    from complex_yolov4_tpu.data.loader import create_val_loader

    root = tempfile.mkdtemp(prefix="cells_val_t_")
    synthetic.generate_kitti_dataset(root, num_train=1, num_val=2,
                                     num_test=1, seed=7)
    loader = create_val_loader(root, 2, device_raster=True,
                               cells_raster=True, cell_capacity=64)
    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        batches = list(loader)
    assert len(batches) == 1
    msgs = [str(w.message) for w in caught]
    assert any("dropping" in m for m in msgs)
    assert any("dropped" in m and "total this epoch" in m for m in msgs)


def test_clustered_scene_statistics():
    """The clustered (lidar-beam) scene mode must actually cluster: markedly
    fewer occupied cells per point than the diffuse sampler, with realistic
    in-boundary point counts (the COO capacity-policy validation workload)."""
    from complex_yolov4_tpu.data import synthetic

    stats = {}
    for mode in (False, True):
        pts_n, cell_n = [], []
        for s in range(3):
            p, boxes, classes = synthetic.sample_scene(
                np.random.default_rng(s), clustered=mode)
            assert len(boxes) == len(classes) > 0
            c = bev.remove_points_outside(p)
            cells, keys = bev.aggregate_bev_cells(c)
            pts_n.append(len(c))
            cell_n.append(len(cells))
        stats[mode] = (np.mean(pts_n), np.mean(cell_n))
    diffuse_ratio = stats[False][1] / stats[False][0]
    clustered_ratio = stats[True][1] / stats[True][0]
    assert clustered_ratio < 0.75 * diffuse_ratio, (diffuse_ratio,
                                                    clustered_ratio)
    assert 10_000 < stats[True][0] < 26_000  # realistic KITTI crop size
