"""centerfusiondetect3d_tpu: TPU-native camera+radar center-point 3D detection.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
HengWeiBin/CenterFusionDetect3D (CenterFusion on nuScenes): DLA-34 backbone
with IDA/DLA-up aggregation, deformable convolutions, CenterNet 3D heads,
frustum-based radar association, on-device decoding, and SPMD data-parallel
training/eval over a TPU mesh.
"""

__version__ = "0.1.0"
