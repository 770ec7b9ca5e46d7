"""Tests for overlap post-processing and misc utils."""

import numpy as np

from speaker3d_tpu.diar.overlap import (
    FrameCount,
    SlidingSegmentation,
    aggregate_count,
    binary_to_segs,
    get_valid_field,
    post_process,
)
from speaker3d_tpu.utils.misc import (
    AverageMeter,
    AverageMeters,
    ProgressMeter,
    utt2spk_to_spk2utt,
)


def _toy_segmentation():
    """Two chunks of 10 frames (0.1s step); class 0 active first half,
    class 1 second half with overlap in the middle."""
    data = np.zeros((2, 10, 2))
    data[0, :6, 0] = 1.0
    data[0, 4:, 1] = 1.0
    data[1, :, 1] = 1.0
    return SlidingSegmentation(data=data, chunk_starts=np.array([0.0, 1.0]),
                               frame_step=0.1)


def test_aggregate_count_and_valid_field():
    seg = _toy_segmentation()
    count = aggregate_count(seg, num_frames=20)
    assert len(count) == 20
    assert count.data[5] == 2  # overlap region in chunk 0
    assert count.data[15] == 1
    valid = get_valid_field(count)
    assert len(valid) >= 1
    assert valid[0][0] <= 0.1


def test_binary_to_segs_roundtrip():
    binary = np.zeros((20, 2))
    binary[2:8, 0] = 1
    binary[6:15, 1] = 1
    ts = [i * 0.1 for i in range(20)]
    segs = binary_to_segs(binary, ts)
    assert len(segs) == 2
    spk0 = [s for s in segs if s[2] == 0][0]
    assert abs(spk0[0] - 0.2) < 1e-6


def test_post_process_gates_by_count():
    seg = _toy_segmentation()
    count = aggregate_count(seg, num_frames=20)
    fields = [[0.0, 0.6, 0], [0.4, 2.0, 1]]
    binary, ts = post_process(fields, 2, seg, count)
    assert binary.shape == (20, 2)
    # overlap frames should allow 2 active speakers
    assert binary[5].sum() >= 1
    segs = binary_to_segs(binary, ts)
    assert len({s[2] for s in segs}) == 2


def test_meters():
    m = AverageMeter("loss", ":.2f")
    m.update(1.0)
    m.update(3.0)
    assert m.avg == 2.0
    ms = AverageMeters()
    ms.update("acc", 0.5)
    ms.update("acc", 1.0)
    assert ms.avg("acc") == 0.75
    pm = ProgressMeter(10, ms, prefix="ep1 ")
    line = pm.display(3)
    assert "ep1" in line and "acc" in line


def test_utt2spk_to_spk2utt():
    out = utt2spk_to_spk2utt({"u1": "a", "u2": "b", "u3": "a"})
    assert out == {"a": ["u1", "u3"], "b": ["u2"]}
