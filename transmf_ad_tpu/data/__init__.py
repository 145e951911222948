"""Data layer: NIfTI IO, ADNI index, transforms, host->HBM pipeline."""

from . import nifti  # noqa: F401
from .adni import ADNI, TASK_LABELS  # noqa: F401
from .pipeline import Loader, VolumeSource, device_prefetch  # noqa: F401
from .synthetic import make_synthetic_adni  # noqa: F401
from .transforms import AugmentConfig, augment_batch, scale_intensity, spatial_pad  # noqa: F401
