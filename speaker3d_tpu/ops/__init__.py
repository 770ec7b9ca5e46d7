from speaker3d_tpu.ops.fbank import FBank, FbankConfig, KaldiFbank  # noqa: F401
