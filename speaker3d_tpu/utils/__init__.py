from speaker3d_tpu.utils import fileio, metrics  # noqa: F401
