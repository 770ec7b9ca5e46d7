from speaker3d_tpu.models.eres2netv2 import ERes2NetV2, eres2netv2_w24s4ep4  # noqa: F401
from speaker3d_tpu.models.pooling import ASTP, tap, tsdp, tstp  # noqa: F401
