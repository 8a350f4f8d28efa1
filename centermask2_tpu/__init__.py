"""centermask2_tpu — a TPU-native (JAX/XLA/Pallas) instance-segmentation framework.

A from-scratch rebuild of the capabilities of the CenterMask2 deployment fork
(reference: Zeng-Yan/centermask2): VoVNetV2 backbone -> FPN -> FCOS anchor-free
detector -> SAG-Mask spatial-attention mask head -> MaskIoU rescoring head,
plus the surrounding deployment pipeline (fixed-shape preprocessing, AOT
export, bin I/O, COCO evaluation with mask-score substitution).

Design stance (see SURVEY.md §7): every tensor has a static shape; every
variable-length result is a (padded buffer, validity mask) pair. The
reference invented this idiom ad hoc for its ONNX/Ascend deployment
(nonzero->topk, fixed-size NMS/RoiExtractor custom ops); here it is the
native representation, which is exactly what XLA on TPU requires.
"""

__version__ = "0.1.0"
