"""TPU-native multimodal neuroimaging framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the TransMF_AD
reference (transformer-based MRI+PET fusion for early Alzheimer's diagnosis,
ISBI 2023): ADNI NIfTI data pipeline with jittable 3D augmentations, 3D-CNN
encoders, cross-modal transformer fusion, gradient-reversal adversarial
alignment, a k-fold training engine with streaming metrics, and data/model
parallelism over a `jax.sharding.Mesh`.

Subpackages
-----------
- ``data``      NIfTI IO, ADNI index, transforms, host->HBM pipeline
- ``nn``        network building blocks (flax.linen, channels-last)
- ``ops``       Pallas TPU kernels (fused cross-attention, token pooling)
- ``models``    task model zoo (TransMF, ADVIT, MiSePyNet)
- ``parallel``  mesh construction + sharding rules
- ``train``     engine, jitted steps, optimizers, metrics, checkpoints, k-fold
- ``utils``     logging and misc helpers
"""

__version__ = "0.1.0"
