"""LR schedule parity with torch StepLR + the reference warmup wrapper
semantics (golden-tested against a torch-based simulation)."""

import numpy as np
import pytest
import torch

from tactilesr_tpu.runtime.schedule import (
    LRWarmupSchedule,
    ReduceLROnPlateau,
    StepLR,
)


def test_steplr_matches_torch():
    base, step_size, gamma = 1e-3, 2, 0.8
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=base)
    tsched = torch.optim.lr_scheduler.StepLR(opt, step_size=step_size, gamma=gamma)
    ours = StepLR(base, step_size, gamma)
    for _ in range(20):
        assert np.isclose(ours.lr, opt.param_groups[0]["lr"])
        tsched.step()
        ours.step()


def _torch_warmup_sim(
    max_iters, epoch_len, base_lr, step_size, gamma, warmup_t, warmup_mode,
    warmup_init_lr, warmup_factor,
):
    """Simulate the reference warmup-wrapper call pattern with a real torch
    StepLR inner, returning the lr used at each iteration."""
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=base_lr)
    inner = torch.optim.lr_scheduler.StepLR(opt, step_size=step_size, gamma=gamma)

    # pre-compute regular lrs (reference semantics) -- inner stays advanced
    max_t = warmup_t // epoch_len
    regular = [base_lr]
    for _ in range(max_t):
        inner.step()
        regular.append(opt.param_groups[0]["lr"])

    def warmup_lr(t, reg):
        alpha = t / warmup_t
        if warmup_mode == "fix":
            return warmup_init_lr * (1 - alpha) + base_lr * alpha
        if warmup_mode == "factor":
            return reg * (warmup_factor * (1 - alpha) + alpha)
        return base_lr * warmup_factor * (1 - alpha) + regular[-1] * alpha

    lr = base_lr * warmup_factor if warmup_mode in ("factor", "auto") else warmup_init_lr
    if warmup_t == 0:
        lr = base_lr
    lrs = []
    in_iter_warmup = False
    last_iter = 0
    for it in range(max_iters):
        lrs.append(lr)
        # iter_update
        last_iter += 1
        if last_iter < warmup_t:
            in_iter_warmup = True
            t = last_iter // epoch_len
            lr = warmup_lr(last_iter, regular[t])
        elif last_iter == warmup_t:
            lr = regular[-1]
        else:
            in_iter_warmup = False
        # epoch_update
        if (it + 1) % epoch_len == 0 and not in_iter_warmup and last_iter != warmup_t:
            inner.step()
            lr = opt.param_groups[0]["lr"]
        elif (it + 1) % epoch_len == 0 and last_iter == warmup_t:
            # reference: in_iter_warmup is still True at this point (it only
            # flips False on the *next* iter_update), so no inner step
            if not in_iter_warmup:
                inner.step()
                lr = opt.param_groups[0]["lr"]
    return lrs


@pytest.mark.parametrize("warmup_mode", ["fix", "factor", "auto"])
def test_warmup_schedule_matches_reference_semantics(warmup_mode):
    epoch_len, max_epochs = 30, 8
    max_iters = epoch_len * max_epochs
    base_lr, step_size, gamma = 1e-3, 2, 0.8
    warmup_t = 70  # spans 2+ epochs

    ours = LRWarmupSchedule(
        StepLR(base_lr, step_size, gamma),
        by_epoch=True,
        epoch_len=epoch_len,
        warmup_t=warmup_t,
        warmup_mode=warmup_mode,
        warmup_init_lr=1e-5,
        warmup_factor=1e-4,
    )
    want = _torch_warmup_sim(
        max_iters, epoch_len, base_lr, step_size, gamma, warmup_t, warmup_mode,
        1e-5, 1e-4,
    )
    got = []
    for it in range(max_iters):
        got.append(ours.get_lr())
        ours.iter_update()
        if (it + 1) % epoch_len == 0:
            ours.epoch_update()
    np.testing.assert_allclose(got, want, rtol=1e-10)


@pytest.mark.parametrize("warmup_mode", ["fix", "factor", "auto"])
def test_warmup_by_epoch_matches_reference_semantics(warmup_mode):
    """Golden for the warmup_by_epoch=True branch (schedule.py:261-266)
    against the reference's epoch-warmup state machine
    (cpu/lr_scheduler.py:127-147) driven with a real torch StepLR inner:
    iter_update is a no-op; epochs < warmup_t interpolate toward the
    pre-stepped table; epoch == warmup_t lands on the table's last entry;
    later epochs step the (already advanced) inner scheduler."""
    base_lr, step_size, gamma = 1e-3, 2, 0.8
    warmup_t, max_epochs = 3, 10  # warmup measured in EPOCHS here
    warmup_init_lr, warmup_factor = 1e-5, 1e-4

    # --- reference simulation (torch inner, reference call pattern) ---
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=base_lr)
    inner = torch.optim.lr_scheduler.StepLR(opt, step_size=step_size, gamma=gamma)
    # _pre_compute_regular_lrs_per_t(max_t=warmup_t): inner stays advanced
    regular = [base_lr]
    for _ in range(warmup_t):
        inner.step()
        regular.append(opt.param_groups[0]["lr"])

    def ref_warmup_lr(t, reg):
        alpha = t / warmup_t
        if warmup_mode == "fix":
            return warmup_init_lr * (1 - alpha) + base_lr * alpha
        if warmup_mode == "factor":
            return reg * (warmup_factor * (1 - alpha) + alpha)
        return base_lr * warmup_factor * (1 - alpha) + regular[-1] * alpha

    lr = base_lr * warmup_factor if warmup_mode in ("factor", "auto") else warmup_init_lr
    want = []
    for epoch in range(max_epochs):
        want.append(lr)  # lr used throughout this epoch
        last_epoch = epoch + 1  # reference epoch_update
        if last_epoch < warmup_t:
            lr = ref_warmup_lr(last_epoch, regular[last_epoch])
        elif last_epoch == warmup_t:
            lr = regular[-1]
        else:
            inner.step()
            lr = opt.param_groups[0]["lr"]

    # --- ours ---
    ours = LRWarmupSchedule(
        StepLR(base_lr, step_size, gamma),
        by_epoch=True,
        warmup_t=warmup_t,
        warmup_by_epoch=True,
        warmup_mode=warmup_mode,
        warmup_init_lr=warmup_init_lr,
        warmup_factor=warmup_factor,
    )
    got = []
    for epoch in range(max_epochs):
        got.append(ours.get_lr())
        for _ in range(5):
            ours.iter_update()  # must be a no-op in epoch-warmup mode
        ours.epoch_update()
    np.testing.assert_allclose(got, want, rtol=1e-12)
    # post-warmup regular phase really decays (the inner kept its advance)
    assert got[-1] < got[warmup_t] < base_lr + 1e-12


def test_no_warmup_steps_every_epoch():
    epoch_len = 10
    ours = LRWarmupSchedule(StepLR(1e-4, 1, 0.8), by_epoch=True, epoch_len=epoch_len)
    lrs = []
    for it in range(50):
        lrs.append(ours.get_lr())
        ours.iter_update()
        if (it + 1) % epoch_len == 0:
            ours.epoch_update()
    # epoch e uses base * 0.8^e
    for e in range(5):
        np.testing.assert_allclose(lrs[e * 10], 1e-4 * 0.8**e, rtol=1e-12)


def test_state_dict_roundtrip():
    s = LRWarmupSchedule(
        StepLR(1e-3, 2, 0.8), by_epoch=True, epoch_len=5, warmup_t=8,
        warmup_mode="auto", warmup_factor=1e-4,
    )
    for it in range(12):
        s.iter_update()
        if (it + 1) % 5 == 0:
            s.epoch_update()
    state = s.state_dict()
    s2 = LRWarmupSchedule(
        StepLR(1e-3, 2, 0.8), by_epoch=True, epoch_len=5, warmup_t=8,
        warmup_mode="auto", warmup_factor=1e-4,
    )
    s2.load_state_dict(state)
    for it in range(12, 30):
        s.iter_update()
        s2.iter_update()
        if (it + 1) % 5 == 0:
            s.epoch_update()
            s2.epoch_update()
        assert s.get_lr() == s2.get_lr()


def test_plateau_mode():
    sched = LRWarmupSchedule(
        ReduceLROnPlateau(1e-3, mode="min", factor=0.5, patience=1),
        by_epoch=True,
        epoch_len=5,
    )
    # constant metric -> after patience+1 bad epochs, lr halves
    lrs = []
    for e in range(6):
        sched.epoch_update(metric=1.0)
        lrs.append(sched.get_lr())
    assert lrs[0] == 1e-3  # first sets best
    assert min(lrs) < 1e-3


@pytest.mark.parametrize(
    "mode,threshold_mode,threshold,cooldown",
    [
        ("max", "rel", 1e-4, 0),      # max mode
        ("min", "abs", 0.05, 0),      # abs threshold
        ("min", "rel", 1e-4, 2),      # cooldown
        ("max", "abs", 0.02, 3),      # everything at once
    ],
)
def test_plateau_golden_vs_torch(mode, threshold_mode, threshold, cooldown):
    """ReduceLROnPlateau's max-mode / abs-threshold / cooldown branches
    (schedule.py:105-138) golden-tested against torch's implementation on
    a noisy plateauing metric sequence."""
    kw = dict(
        mode=mode, factor=0.5, patience=1, threshold=threshold,
        threshold_mode=threshold_mode, cooldown=cooldown, min_lr=1e-5,
    )
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=1e-3)
    tsched = torch.optim.lr_scheduler.ReduceLROnPlateau(opt, **kw)
    ours = ReduceLROnPlateau(1e-3, **kw)
    rng = np.random.default_rng(0)
    base = rng.random(40) * 0.1
    metrics = (1.0 + base) if mode == "min" else (1.0 - base)
    for m in metrics:
        tsched.step(float(m))
        ours.step(float(m))
        assert np.isclose(ours.lr, opt.param_groups[0]["lr"]), (
            f"diverged at metric {m}"
        )
    assert ours.lr < 1e-3  # the sequence actually triggered reductions


def test_plateau_state_roundtrip():
    """state_dict/load_state_dict (schedule.py:140-155) resume exactly."""
    kw = dict(mode="min", factor=0.5, patience=1, cooldown=1)
    a = ReduceLROnPlateau(1e-3, **kw)
    metrics = [1.0, 1.1, 1.2, 0.9, 1.3, 1.4, 1.5, 1.6]
    for m in metrics[:4]:
        a.step(m)
    b = ReduceLROnPlateau(1e-3, **kw)
    b.load_state_dict(a.state_dict())
    for m in metrics[4:]:
        a.step(m)
        b.step(m)
        assert a.lr == b.lr
    assert a.state_dict() == b.state_dict()
    assert a.lr < 1e-3


def test_steplr_state_roundtrip():
    a = StepLR(1e-3, 2, 0.8)
    for _ in range(3):
        a.step()
    b = StepLR(1e-3, 2, 0.8)
    b.load_state_dict(a.state_dict())
    for _ in range(4):
        a.step()
        b.step()
        assert a.lr == b.lr
