"""maskrcnn_tpu — a TPU-native (JAX/XLA/Pallas) Mask-RCNN instance-segmentation framework.

A from-scratch rebuild of the capability surface of edouardlp/Mask-RCNN-CoreML
(reference: Swift + Core ML + Metal, inference-only) as a single jitted XLA
program: ResNet-FPN backbone + RPN + proposal NMS + pyramid ROIAlign +
classifier/box head + detection filtering + mask head, all static-shape and
fused on-device. The reference's three-model split (MaskRCNN/Classifier/Mask
.mlmodel) and its five custom CPU/Metal layers collapse into one compiled
pipeline (see SURVEY.md §7 for the architecture translation).

Public surface:
  maskrcnn_tpu.core      — config dataclass + anchor generation (anchors.bin parity)
  maskrcnn_tpu.ops       — box decode/clip/IoU, padded NMS, pyramid ROIAlign,
                           proposal + detection layers (XLA + Pallas paths)
  maskrcnn_tpu.models    — ResNet50/101, FPN, RPN, classifier/mask heads, full model
  maskrcnn_tpu.io        — Matterport Keras HDF5 weight loading, checkpoint cache
  maskrcnn_tpu.pipeline  — preprocessing (letterbox + mean-subtract), jitted detector,
                           result unmolding (box/mask back-projection)
  maskrcnn_tpu.parallel  — data-parallel batch inference/training over a device Mesh
  maskrcnn_tpu.evalkit   — COCO annotation reader, results interchange, AP scoring
  maskrcnn_tpu.cli       — convert / evaluate / demo / download / train commands
"""

__version__ = "0.1.0"
