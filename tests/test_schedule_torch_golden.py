"""Golden test: our epoch-LR function vs torch's scheduler composition.

Builds the same SequentialLR stacks the reference configures
(modelWithLoss.py:57-203) with torch.optim and steps them epoch by epoch;
our closed-form learning_rate() must match at every epoch.
"""

import numpy as np
import pytest
import torch
from torch.optim.lr_scheduler import (
    CyclicLR,
    ConstantLR,
    LambdaLR,
    MultiStepLR,
    SequentialLR,
)

from centerfusiondetect3d_tpu.config import load_config
from centerfusiondetect3d_tpu.training import learning_rate


def _torch_steplr(lr, steps, warm, defreeze, epochs, start_epoch=0):
    start_lr = lr
    for s in steps:
        if start_epoch >= s:
            start_lr *= 0.1
    opt = torch.optim.AdamW([torch.nn.Parameter(torch.zeros(1))], lr=start_lr)
    warmup = lambda step: 0.5 ** (warm - step)
    schedulers, milestones = [], []
    if warm:
        schedulers.append(LambdaLR(opt, lr_lambda=warmup))
        milestones.append(warm)
    if defreeze > start_epoch:
        ms2 = [s - start_epoch - warm for s in steps if s < defreeze]
        schedulers.append(MultiStepLR(opt, milestones=ms2, gamma=0.1))
        milestones.append(defreeze - start_epoch)
        if warm:
            schedulers.append(LambdaLR(opt, lr_lambda=warmup))
            milestones.append(defreeze + warm - start_epoch)
    ms4 = [s - warm - max(defreeze, start_epoch) for s in steps if s >= defreeze]
    schedulers.append(MultiStepLR(opt, milestones=ms4, gamma=0.1))
    sched = SequentialLR(opt, schedulers, milestones=milestones)
    out = []
    for _ in range(start_epoch, epochs):
        out.append(opt.param_groups[0]["lr"])
        opt.step()
        sched.step()
    return out


def _torch_clr(lr, steps, defreeze, epochs):
    opt = torch.optim.AdamW([torch.nn.Parameter(torch.zeros(1))], lr=lr)
    s1 = CyclicLR(opt, base_lr=lr / 15, max_lr=lr, step_size_up=5,
                  cycle_momentum=False, mode="triangular")
    s2 = CyclicLR(opt, base_lr=lr / 15, max_lr=lr, step_size_up=5,
                  cycle_momentum=False, mode="triangular2")
    schedulers = [s1, s2]
    milestones = [defreeze]
    skip = 0
    for i, step in enumerate(steps):
        if step > defreeze:
            nxt = steps[i + 1] if i + 1 < len(steps) else epochs
            milestones.append(step)
            schedulers.append(
                ConstantLR(opt, factor=0.1 ** (i + 1 - skip), last_epoch=-1,
                           total_iters=nxt - step + 2)
            )
        else:
            skip += 1
    sched = SequentialLR(opt, schedulers, milestones=milestones)
    out = []
    for _ in range(epochs):
        out.append(opt.param_groups[0]["lr"])
        opt.step()
        sched.step()
    return out


@pytest.mark.parametrize(
    "lr,steps,warm,freeze,defreeze,epochs,start",
    [
        (2.5e-4, (90, 120), 5, False, -1, 140, 0),   # CenterNet baseline
        (5e-5, (185, 195), 5, True, 170, 200, 0),    # middle-fusion fine-tune
        (1e-3, (10, 20), 0, False, -1, 30, 0),       # no warmup
        (2.5e-4, (90, 120), 0, False, -1, 140, 100), # resume past a step
    ],
)
def test_steplr_matches_torch(lr, steps, warm, freeze, defreeze, epochs, start):
    cfg = load_config(
        opts=["TRAIN.LR", repr(lr), "TRAIN.LR_STEP", repr(tuple(steps)),
              "TRAIN.WARM_EPOCHS", str(warm), "TRAIN.EPOCHS", str(epochs),
              "MODEL.FREEZE_BACKBONE", str(freeze), "MODEL.DEFREEZE", str(defreeze)],
        num_classes=10,
    )
    golden = _torch_steplr(lr, steps, warm, int(cfg.MODEL.DEFREEZE), epochs, start)
    ours = [learning_rate(cfg, e, start) for e in range(start, epochs)]
    np.testing.assert_allclose(ours, golden, rtol=1e-6)


@pytest.mark.parametrize(
    "lr,steps,defreeze,epochs",
    [
        (1e-3, (50,), 0, 60),
        (1e-3, (30, 50), 20, 60),
    ],
)
def test_clr_matches_torch(lr, steps, defreeze, epochs):
    cfg = load_config(
        opts=["TRAIN.LR", repr(lr), "TRAIN.LR_STEP", repr(tuple(steps)),
              "TRAIN.LR_SCHEDULER", "CLR", "TRAIN.WARM_EPOCHS", "0",
              "TRAIN.EPOCHS", str(epochs),
              "MODEL.FREEZE_BACKBONE", str(defreeze > 0),
              "MODEL.DEFREEZE", str(defreeze if defreeze > 0 else -1)],
        num_classes=10,
    )
    golden = _torch_clr(lr, steps, int(cfg.MODEL.DEFREEZE), epochs)
    ours = [learning_rate(cfg, e) for e in range(epochs)]
    np.testing.assert_allclose(ours, golden, rtol=1e-6)
