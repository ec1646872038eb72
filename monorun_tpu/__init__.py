"""MonoRUn-TPU: a TPU-native monocular 3D object detection framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of MonoRUn
(CVPR 2021, tjiiv-cprg/MonoRUn): a two-stage detector (ResNet + FPN + RPN +
RoI heads) extended with 3D heads — per-RoI dimensions with Monte-Carlo
epistemic variance, a dense normalized-object-coordinate (NOC) decoder with
aleatoric uncertainty, and an uncertainty-weighted Perspective-n-Point pose
solver with covariance propagation feeding a 3D-localization score head.

Unlike the reference (CUDA/C++/torch, per-RoI host loops), everything here is
fixed-shape, batched, and compiled: all RoIs solve PnP in parallel on-device,
MC-dropout sampling is restructured to near-zero marginal cost, and data
parallelism is expressed with jax.sharding over a device mesh.
"""

__version__ = "0.1.0"

from . import coders, losses  # noqa: F401
