import numpy as np
import pytest

from tests.conftest import has_reference


def test_warmup_cosine_matches_reference():
    import sys

    sys.path.insert(0, "/root/reference")
    from speaker3d_tpu.train.schedulers import warmup_cosine_lr

    if not has_reference():
        pytest.skip("reference repo not mounted")
    from speakerlab.process.scheduler import WarmupCosineScheduler

    class _Opt:
        param_groups = [{}]

    ref = WarmupCosineScheduler(_Opt(), min_lr=1e-4, max_lr=0.2,
                                warmup_epoch=5, fix_epoch=70,
                                step_per_epoch=100)
    for step in [0, 1, 250, 499, 500, 501, 3000, 6999, 7000, 9000]:
        want = ref.clr(step)
        got = float(warmup_cosine_lr(step, min_lr=1e-4, max_lr=0.2,
                                     warmup_epoch=5, fix_epoch=70,
                                     step_per_epoch=100))
        assert abs(got - want) < 1e-7, step


def test_margin_schedule_matches_reference():
    import sys

    sys.path.insert(0, "/root/reference")
    from speaker3d_tpu.train.schedulers import margin_at_step

    if not has_reference():
        pytest.skip("reference repo not mounted")
    from speakerlab.process.scheduler import MarginScheduler

    class _Crit:
        margin = None

        def update(self, margin):
            self.margin = margin

    crit = _Crit()
    ref = MarginScheduler(crit, increase_start_epoch=20, fix_epoch=50,
                          step_per_epoch=100, initial_margin=0.0,
                          final_margin=0.3)
    for step in [0, 100, 1999, 2000, 2500, 3500, 4999, 5000, 6000]:
        ref.current_step = step
        want = ref.iter_margin()
        got = float(margin_at_step(step, increase_start_epoch=20, fix_epoch=50,
                                   step_per_epoch=100, initial_margin=0.0,
                                   final_margin=0.3))
        assert abs(got - want) < 1e-6, step


@pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")
def test_arc_margin_loss_matches_reference():
    import sys

    sys.path.insert(0, "/root/reference")
    import torch
    from speakerlab.loss.margin_loss import ArcMarginLoss as TorchArc

    from speaker3d_tpu.train.losses import arc_margin_loss

    rng = np.random.default_rng(0)
    cosine = np.clip(rng.standard_normal((16, 40)) * 0.3, -0.999, 0.999)
    cosine = cosine.astype(np.float32)
    labels = rng.integers(0, 40, 16)

    for margin in [0.0, 0.2, 0.3]:
        tl = TorchArc(scale=32.0, margin=margin)
        want = float(tl(torch.from_numpy(cosine),
                        torch.from_numpy(labels)).item())
        got = float(arc_margin_loss(cosine, labels, margin, scale=32.0))
        assert abs(got - want) < 1e-5, margin


@pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")
def test_add_margin_loss_matches_reference():
    import sys

    sys.path.insert(0, "/root/reference")
    import torch
    from speakerlab.loss.margin_loss import AddMarginLoss as TorchAdd

    from speaker3d_tpu.train.losses import add_margin_loss

    rng = np.random.default_rng(1)
    cosine = np.clip(rng.standard_normal((8, 25)) * 0.3, -0.999, 0.999)
    cosine = cosine.astype(np.float32)
    labels = rng.integers(0, 25, 8)
    tl = TorchAdd(scale=32.0, margin=0.25)
    want = float(tl(torch.from_numpy(cosine), torch.from_numpy(labels)).item())
    got = float(add_margin_loss(cosine, labels, 0.25, scale=32.0))
    assert abs(got - want) < 1e-5
