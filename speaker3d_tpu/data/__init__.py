from speaker3d_tpu.data.dataset import BatchLoader, WavSVDataset  # noqa: F401
from speaker3d_tpu.data.processors import (  # noqa: F401
    SpkLabelEncoder,
    SpkVeriAug,
    WavReader,
    speed_perturb,
)
