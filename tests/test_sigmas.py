"""Scheduler and sigma-table tests."""

import numpy as np
import pytest

from lanpaint_tpu.sigmas import (
    EpsSigmaTable,
    FlowSigmaTable,
    SCHEDULERS,
    apply_denoise,
    calculate_sigmas,
    karras,
)


@pytest.fixture(scope="module")
def eps_table():
    return EpsSigmaTable()


@pytest.fixture(scope="module")
def flow_table():
    return FlowSigmaTable(shift=3.0)


@pytest.mark.parametrize("name", sorted(SCHEDULERS))
@pytest.mark.parametrize("table_name", ["eps", "flow"])
def test_all_schedulers_descend_to_zero(name, table_name, eps_table, flow_table):
    table = eps_table if table_name == "eps" else flow_table
    sig = calculate_sigmas(table, name, 20)
    assert sig.shape == (21,)
    assert sig[-1] == 0.0
    assert (np.diff(sig[:-1]) < 1e-7).all(), f"{name} not descending: {sig}"
    assert sig[0] <= table.sigma_max * 1.001


def test_karras_endpoints():
    sig = karras(10, 0.1, 14.6)
    np.testing.assert_allclose(sig[0], 14.6, rtol=1e-6)
    np.testing.assert_allclose(sig[-2], 0.1, rtol=1e-6)
    assert sig[-1] == 0.0


def test_eps_table_sd_range(eps_table):
    # SD scaled_linear betas: sigma range ~ [0.029, 14.6]
    assert 0.02 < eps_table.sigma_min < 0.04
    assert 14.0 < eps_table.sigma_max < 15.5


def test_eps_table_timestep_roundtrip(eps_table):
    sig = np.asarray([0.1, 1.0, 5.0])
    t = eps_table.timestep(sig)
    back = eps_table.sigma(t)
    np.testing.assert_allclose(back, sig, rtol=1e-4)


def test_flow_shift_monotonicity():
    t1 = FlowSigmaTable(shift=1.0)
    t3 = FlowSigmaTable(shift=3.0)
    # shift>1 pushes sigma up at equal t (more time at high noise)
    assert t3.sigmas[500] > t1.sigmas[500]
    np.testing.assert_allclose(t1.sigma_max, 1.0, rtol=1e-6)
    np.testing.assert_allclose(t3.sigma_max, 1.0, rtol=1e-6)


def test_apply_denoise_partial(eps_table):
    full = calculate_sigmas(eps_table, "karras", 20)
    part = apply_denoise(eps_table, "karras", 20, denoise=0.5)
    assert len(part) == 21
    assert part[0] < full[0]  # starts lower on the ladder


def test_unknown_scheduler_raises(eps_table):
    with pytest.raises(ValueError, match="unknown scheduler"):
        calculate_sigmas(eps_table, "nope", 10)


def test_resolution_shift_static_equivalence():
    """flux_time_shift(mu=log(s), 1, t) == the static flow shift
    s*t/(1+(s-1)*t) (FlowSigmaTable's map) — the dynamic scheduler is the
    same family with a resolution-dependent s."""
    from lanpaint_tpu.sigmas import flux_time_shift

    t = np.linspace(1.0, 0.01, 50)
    for s in (1.0, 1.15, 3.0):
        np.testing.assert_allclose(
            flux_time_shift(np.log(s), 1.0, t),
            s * t / (1 + (s - 1) * t), rtol=1e-12)


def test_resolution_shift_sigmas_properties():
    """Descending, ends at 0, starts at 1; larger images shift the middle
    of the schedule up (more time at high noise); the Ideogram4Scheduler
    widget pair (0.5, 1.75) maps onto (base_shift, max_shift)."""
    from lanpaint_tpu.sigmas import resolution_shift_sigmas

    sig = resolution_shift_sigmas(20, 1024, 1024)
    assert sig.shape == (21,)
    assert sig[0] == pytest.approx(1.0)
    assert sig[-1] == 0.0
    assert np.all(np.diff(sig) < 0)
    small = resolution_shift_sigmas(20, 256, 256)
    large = resolution_shift_sigmas(20, 2048, 2048)
    assert np.all(large[1:-1] >= small[1:-1])
    ideo = resolution_shift_sigmas(20, 1024, 1024,
                                   base_shift=0.5, max_shift=1.75)
    assert np.all(ideo[1:-1] >= sig[1:-1])  # higher max_shift lifts mu
