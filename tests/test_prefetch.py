"""device_prefetch: order, sharding, and early-termination behavior."""

import numpy as np
import jax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from speaker3d_tpu.data.prefetch import device_prefetch
from speaker3d_tpu.parallel.mesh import make_mesh


def _batches(n, b=8):
    for i in range(n):
        yield {"wavs": np.full((b, 16), i, np.float32),
               "labels": np.arange(b, dtype=np.int32) + i}


def test_order_and_values_preserved():
    out = list(device_prefetch(_batches(5), depth=3))
    assert len(out) == 5
    for i, batch in enumerate(out):
        assert float(batch["wavs"][0, 0]) == i
        assert int(batch["labels"][0]) == i


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_placement():
    mesh = make_mesh(4, 2)
    sharding = NamedSharding(mesh, P("data"))
    for batch in device_prefetch(_batches(3), sharding):
        assert batch["wavs"].sharding.is_equivalent_to(sharding, 2)
        assert batch["labels"].sharding.is_equivalent_to(sharding, 1)


def test_early_break_releases_thread():
    gen = device_prefetch(_batches(100), depth=2)
    first = next(gen)
    assert float(first["wavs"][0, 0]) == 0
    gen.close()  # must not hang or leak; subsequent use raises
    with pytest.raises(StopIteration):
        next(gen)


def test_short_iterator_and_empty():
    assert len(list(device_prefetch(_batches(1), depth=4))) == 1
    assert list(device_prefetch(_batches(0), depth=2)) == []


def test_iterator_error_propagates():
    def bad():
        yield {"x": np.zeros(3, np.float32)}
        raise RuntimeError("loader died")

    gen = device_prefetch(bad(), depth=2)
    next(gen)
    with pytest.raises(RuntimeError, match="loader died"):
        next(gen)
