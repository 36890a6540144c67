"""TPU-native framework for physics-aware style-transfer holographic imaging.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
``csleemooo/style_transfer_based_holographic_imaging`` (PyTorch reference):
inline-holography field retrieval by treating the object-to-sensor distance
as an implicit *style* of the diffraction pattern.

Subpackages
-----------
- ``ops``       — physics core (angular-spectrum propagation), feature
                  statistics (AdaIN), phase unwrapping, Pallas kernels.
- ``models``    — flax.linen networks: VGG encoder, amp/phase decoder,
                  distance regressor, PatchGAN discriminator, and the
                  combined style-transfer network.
- ``data``      — hologram synthesis pipelines, golden test-set loading,
                  .mat experimental-domain trees, host→HBM prefetch.
- ``pipelines`` — jitted end-to-end inference (field retrieval, streaming).
- ``train``     — losses, train state, optimization loop, checkpoints.
- ``parallel``  — device-mesh / sharding helpers (DP + FFT-domain sharding).
- ``eval``      — PSNR/MAE/R² metrics, montage + report generation.
- ``interop``   — torch checkpoint/tensor converters.

The canonical short alias::

    import style_transfer_based_holographic_imaging_tpu as holo
"""

from style_transfer_based_holographic_imaging_tpu.config import (
    PhysicsConfig,
    ModelConfig,
    DataConfig,
    TrainConfig,
    EvalConfig,
    ExperimentConfig,
)

__version__ = "0.1.0"

__all__ = [
    "PhysicsConfig",
    "ModelConfig",
    "DataConfig",
    "TrainConfig",
    "EvalConfig",
    "ExperimentConfig",
    "__version__",
]
