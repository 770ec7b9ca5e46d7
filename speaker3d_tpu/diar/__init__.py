from speaker3d_tpu.diar.cluster import (  # noqa: F401
    AHCluster,
    CommonClustering,
    JointClustering,
    SpectralCluster,
    UmapHdbscan,
)
from speaker3d_tpu.diar.der import compute_der, compute_der_for_files, load_rttm  # noqa: F401
from speaker3d_tpu.diar.pipeline import DiarizationPipeline  # noqa: F401
