"""Golden tests for DiffusionSchedule against closed forms (SURVEY.md §4:
'schedule-buffer golden tests vs closed form')."""

import numpy as np
import pytest

from diffassemble_tpu.ops.schedules import DiffusionSchedule, extract


@pytest.mark.parametrize("name", ["linear", "cosine", "cosine_discrete", "quadratic", "sigmoid"])
def test_schedule_shapes_and_ranges(name):
    T = 300
    s = DiffusionSchedule.create(T, name)
    for field in (
        s.betas,
        s.alphas,
        s.alphas_cumprod,
        s.alphas_cumprod_prev,
        s.sqrt_alphas_cumprod,
        s.sqrt_one_minus_alphas_cumprod,
        s.posterior_variance,
    ):
        assert field.shape == (T,)
    assert np.all(np.asarray(s.betas) > 0) and np.all(np.asarray(s.betas) < 1)
    ac = np.asarray(s.alphas_cumprod)
    assert np.all(np.diff(ac) < 0), "alphas_cumprod must be strictly decreasing"
    assert np.allclose(np.asarray(s.alphas_cumprod_prev)[1:], ac[:-1])
    assert np.asarray(s.alphas_cumprod_prev)[0] == 1.0


def test_linear_closed_form():
    T = 100
    s = DiffusionSchedule.create(T, "linear")
    betas = np.linspace(1e-4, 0.02, T)
    np.testing.assert_allclose(np.asarray(s.betas), betas, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s.alphas_cumprod), np.cumprod(1 - betas), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s.sqrt_one_minus_alphas_cumprod),
        np.sqrt(1 - np.cumprod(1 - betas)),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(s.posterior_variance),
        betas * (1 - np.concatenate([[1.0], np.cumprod(1 - betas)[:-1]])) / (1 - np.cumprod(1 - betas)),
        rtol=1e-4,
    )


def test_cosine_monotone_snr():
    s = DiffusionSchedule.create(300, "cosine")
    ac = np.asarray(s.alphas_cumprod)
    snr = ac / (1 - ac)
    assert np.all(np.diff(snr) < 0)


def test_timesteps_order():
    s = DiffusionSchedule.create(300, "linear")
    ts = s.timesteps(10)
    assert len(ts) == 30
    assert ts[0] == 290 and ts[-1] == 0
    np.testing.assert_array_equal(ts, np.arange(290, -1, -10))


def test_extract_gather():
    s = DiffusionSchedule.create(50, "linear")
    t = np.array([0, 10, 49])
    out = extract(s.betas, t)
    assert out.shape == (3, 1)
    np.testing.assert_allclose(np.asarray(out)[:, 0], np.asarray(s.betas)[t])
