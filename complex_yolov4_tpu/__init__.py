"""Complex-YOLOv4 TPU: a TPU-native (JAX/XLA/Pallas) framework for real-time
3-D object detection on LiDAR point clouds via rotated boxes in a bird's-eye-view
raster.

Capability parity target: maudzung/Complex-YOLOv4-Pytorch (see SURVEY.md), rebuilt
TPU-first:

- point cloud -> 608x608 height/intensity/density BEV raster as jit scatter kernels
  (`data.bev`), replacing the reference's per-frame numpy lexsort/unique pipeline
  (reference: src/data_process/kitti_bev_utils.py:37).
- darknet-cfg model topologies (CSPDarknet53 + SPP + PANet + Complex-YOLO heads)
  as a typed layer IR (`models.spec`) executed by a pure-functional NHWC
  interpreter traced once under jit (`models.network`), replacing the per-forward
  nn.ModuleList interpretation (reference: src/models/darknet2pytorch.py:162).
- rotated-box geometry (Sutherland-Hodgman clipping, convex hull, IoU/GIoU) as
  vectorized, differentiable on-device ops (`ops.rotated_boxes`), replacing
  shapely/GEOS + scipy Qhull CPU loops (reference: src/utils/iou_rotated_boxes_utils.py).
- on-device rotated NMS with confidence-weighted box merging (`ops.nms`),
  replacing the CPU loop (reference: src/utils/evaluation_utils.py:321).
- scatter-based YOLO target assignment + 9-term Complex-YOLO loss fully on device
  (`losses.yolo_loss`), replacing per-box python/shapely loops
  (reference: src/models/yolo_layer.py:69).
- SPMD data parallelism over a jax.sharding.Mesh with psum gradient reduction
  (`parallel`), replacing DDP/NCCL (reference: src/train.py:67).
"""

__version__ = "0.1.0"
