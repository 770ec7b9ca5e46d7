"""speaker3d_tpu — a TPU-native speaker embedding & diarization framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the 3D-Speaker
toolkit (reference: /root/reference, see SURVEY.md). The compute path is
JAX/XLA (MXU matmuls and convs, fused elementwise); parallelism is expressed
as `jax.sharding.Mesh` + `shard_map` with XLA collectives; the runtime around
it (CLIs, IO, native serving) lives under `cli/` and `runtime/`.

Subpackages
-----------
- ``ops``      — feature frontend (Kaldi-compatible fbank as MXU matmuls) and
                 Pallas kernels for hot ops.
- ``models``   — speaker-embedding backbones (CAM++, ERes2NetV2/-base/-large/
                 -huge, ECAPA-TDNN, Res2Net, ResNet34, x-vector, SSL heads)
                 as Flax modules, plus classifiers.
- ``compat``   — PyTorch state_dict → Flax variables converter for bit-matched
                 embeddings from reference checkpoints.
- ``train``    — losses (AAM-softmax/DINO/SDPN/KoLeo), schedulers, jit-compiled
                 data-parallel train steps.
- ``data``     — wav reading, augmentation, dataset pipelines.
- ``diar``     — VAD + post-processing, sliding-window chunking, clustering
                 (AHC/spectral/umap-hdbscan), RTTM writers, DER scoring.
- ``parallel`` — mesh construction, sharding helpers, multi-host utilities.
- ``utils``    — config/builder (YAML DI), file IO, metrics (EER/minDCF),
                 checkpointing, logging.
- ``cli``      — command-line entry points mirroring the reference's bin/.
"""

__version__ = "0.1.0"
