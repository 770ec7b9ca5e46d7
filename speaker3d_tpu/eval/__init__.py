from speaker3d_tpu.eval.embedding import build_embedding_fn, build_feature_fn  # noqa: F401
