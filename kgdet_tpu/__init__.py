"""kgdet_tpu: a TPU-native (JAX/XLA/Pallas) keypoint-guided detection framework.

Re-designed from scratch for TPU with the capability surface of KGDet
(AAAI-2021, keypoint-guided single-stage garment detection on DeepFashion2):
configs -> model builder -> data pipeline -> train/eval loops ->
DeepFashion2-compatible JSON results + COCO/OKS evaluation.
"""

__version__ = '0.1.0'
