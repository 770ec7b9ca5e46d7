from speaker3d_tpu.ops.pallas.fbank_kernel import pallas_fbank  # noqa: F401
