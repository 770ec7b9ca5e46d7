from speaker3d_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    process_shard,
    replicated,
)
