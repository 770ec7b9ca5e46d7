"""AOT serving artifact: raw StableHLO module + meta for the standalone
C++ PJRT runtime (VERDICT r1 item 5).

Validates on CPU, without the C++ binary: the exported module compiles
STANDALONE through the PJRT client layer (no jax.export wrapper, the same
entry the C++ engine uses) and executes to the same embedding as the
source model. The C++ side itself is exercised against the TPU plugin by
tools/run_aot_engine_check.py (needs the tunnel).
"""

import json
import os

import jax
import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_export(tmp_path_factory):
    import flax.linen as nn

    from speaker3d_tpu.cli.export_speaker_embedding import export_aot_artifact

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            x = nn.Dense(16)(x)
            x = nn.relu(x)
            return nn.Dense(8)(x.mean(axis=1))

    model = Tiny()
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 30, 80), np.float32))
    out_dir = str(tmp_path_factory.mktemp("aot"))
    meta = export_aot_artifact(model, variables, out_dir, feat_dim=80,
                               frames=30, batch=1)
    return model, variables, out_dir, meta


def test_aot_artifact_files_and_meta(tiny_export):
    _, _, out_dir, meta = tiny_export
    assert os.path.isfile(os.path.join(out_dir, "model.mlir.bc"))
    assert os.path.isfile(os.path.join(out_dir, "model.mlir"))
    with open(os.path.join(out_dir, "aot.json")) as f:
        js = json.load(f)
    assert js["frames"] == 30 and js["feat_dim"] == 80
    assert js["embedding_dim"] == 8 == meta["embedding_dim"]
    # entry point contract the C++ engine relies on
    with open(os.path.join(out_dir, "model.mlir")) as f:
        txt = f.read()
    assert "func.func public @main" in txt
    assert "tensor<1x30x80xf32>" in txt


def test_aot_module_compiles_standalone(tiny_export):
    """Compile the textual module through the raw client (the format the
    C++ engine submits via PJRT_Client_Compile) and match the source."""
    from jax._src.interpreters import mlir as jmlir
    from jax._src.lib import _jax
    from jax._src.lib import xla_client as xc
    from jax._src.lib.mlir import ir

    model, variables, out_dir, _ = tiny_export
    with open(os.path.join(out_dir, "model.mlir")) as f:
        txt = f.read()
    client = jax.devices()[0].client
    devs = _jax.DeviceList(tuple(jax.devices()[:1]))
    with jmlir.make_ir_context():
        module = ir.Module.parse(txt)
        exe = client.compile_and_load(module, executable_devices=devs,
                                      compile_options=xc.CompileOptions())
    x = np.random.default_rng(0).standard_normal((1, 30, 80)) \
        .astype(np.float32)
    outs = exe.execute_sharded([jax.device_put(x)]) \
        .disassemble_into_single_device_arrays()
    got = np.asarray(outs[0][0])
    want = np.asarray(model.apply(variables, x))
    np.testing.assert_allclose(got, want, atol=1e-5)
