"""Dispatch-RTT-aware device routing (utils/hw.py).

The CPU-vs-device break-even scales with how far away the chip is: an
attached chip (sub-ms scalar round-trip) should pull 10-Gcell NW pairs and
device PATH on automatically; a tunneled chip (~25ms) keeps the round-2
conservative defaults.  These tests pin the RTT via env/monkeypatch — no
real probe runs.
"""

import numpy as np
import pytest

import importlib

align_mod = importlib.import_module("edlib_tpu.align")
from edlib_tpu.path import hirschberg
from edlib_tpu.utils import hw


def test_scaled_min_cells_bounds():
    floor, ceil = 8_000_000_000, 400_000_000_000
    per_ms = 16_000_000_000
    assert hw.scaled_min_cells(None, per_ms, floor, ceil) == ceil
    assert hw.scaled_min_cells(0.3, per_ms, floor, ceil) == floor
    assert hw.scaled_min_cells(25.0, per_ms, floor, ceil) == ceil
    assert hw.scaled_min_cells(100.0, per_ms, floor, ceil) == ceil
    assert hw.scaled_min_cells(1.0, per_ms, floor, ceil) == per_ms


def test_dispatch_rtt_env_pin(monkeypatch):
    monkeypatch.setenv("EDLIB_TPU_DISPATCH_RTT_MS", "0.42")
    assert hw.dispatch_rtt_ms() == 0.42


def test_wavefront_threshold_scales_with_rtt(monkeypatch):
    monkeypatch.setattr(align_mod, "_WAVEFRONT_MIN_CELLS", None)
    monkeypatch.setenv("EDLIB_TPU_DISPATCH_RTT_MS", "0.4")
    assert align_mod._wavefront_threshold() == align_mod._WAVEFRONT_FLOOR_CELLS
    monkeypatch.setenv("EDLIB_TPU_DISPATCH_RTT_MS", "25")
    assert align_mod._wavefront_threshold() == align_mod._WAVEFRONT_CEIL_CELLS
    # Explicit env override (captured at import into the module global) wins.
    monkeypatch.setattr(align_mod, "_WAVEFRONT_MIN_CELLS", 12345)
    assert align_mod._wavefront_threshold() == 12345


def test_nw_wavefront_enabled_attached_chip(monkeypatch):
    """A 10-Gcell NW pair auto-routes to the wavefront kernel when the chip
    answers in 0.4ms, and does NOT through a 25ms tunnel."""
    monkeypatch.setattr(align_mod, "_WAVEFRONT_MIN_CELLS", None)
    monkeypatch.setenv("EDLIB_TPU_FORCE_PALLAS", "interpret")
    q = t = 100_000  # 10 Gcells
    monkeypatch.setenv("EDLIB_TPU_DISPATCH_RTT_MS", "0.4")
    assert align_mod._nw_wavefront_enabled(q, t, 4)
    monkeypatch.setenv("EDLIB_TPU_DISPATCH_RTT_MS", "25")
    assert not align_mod._nw_wavefront_enabled(q, t, 4)
    # Below the attached-chip floor: never (cheap integer gate).
    monkeypatch.setenv("EDLIB_TPU_DISPATCH_RTT_MS", "0.4")
    assert not align_mod._nw_wavefront_enabled(10_000, 10_000, 4)


def test_device_path_auto_routing(monkeypatch):
    """Device PATH turns on automatically on an attached chip (RTT <= 2ms)
    for >= 10-Gcell pairs; stays off through the tunnel; env overrides."""
    import jax
    monkeypatch.delenv("EDLIB_TPU_DEVICE_PATH", raising=False)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    q = t = 110_000
    monkeypatch.setenv("EDLIB_TPU_DISPATCH_RTT_MS", "0.5")
    assert hirschberg._device_path_enabled(q, t, 4)
    monkeypatch.setenv("EDLIB_TPU_DISPATCH_RTT_MS", "25")
    assert not hirschberg._device_path_enabled(q, t, 4)
    # Small pairs never auto-route even attached.
    monkeypatch.setenv("EDLIB_TPU_DISPATCH_RTT_MS", "0.5")
    assert not hirschberg._device_path_enabled(1000, 1000, 4)
    # Explicit opt-in ignores RTT; explicit off wins over everything.
    monkeypatch.setenv("EDLIB_TPU_DISPATCH_RTT_MS", "25")
    monkeypatch.setenv("EDLIB_TPU_DEVICE_PATH", "1")
    assert hirschberg._device_path_enabled(q, t, 4)
    monkeypatch.setenv("EDLIB_TPU_DEVICE_PATH", "0")
    assert not hirschberg._device_path_enabled(q, t, 4)
    # DISABLE_DEVICE blocks auto routing.
    monkeypatch.delenv("EDLIB_TPU_DEVICE_PATH", raising=False)
    monkeypatch.setenv("EDLIB_TPU_DISPATCH_RTT_MS", "0.5")
    monkeypatch.setenv("EDLIB_TPU_DISABLE_DEVICE", "1")
    assert not hirschberg._device_path_enabled(q, t, 4)


def test_rtt_file_cache_roundtrip(tmp_path, monkeypatch):
    monkeypatch.delenv("EDLIB_TPU_DISPATCH_RTT_MS", raising=False)
    monkeypatch.setattr(hw, "_cache_path", lambda: str(tmp_path / "rtt.json"))
    monkeypatch.setattr(hw, "_cached", None)
    monkeypatch.setattr(hw, "_measured", False)
    monkeypatch.setattr(hw, "_measure", lambda timeout_s: 1.25)
    assert hw.dispatch_rtt_ms() == 1.25
    # Second process (simulated by resetting the in-process cache) reads
    # the file instead of re-measuring.
    monkeypatch.setattr(hw, "_measured", False)
    monkeypatch.setattr(hw, "_measure",
                        lambda timeout_s: pytest.fail("re-measured"))
    assert hw.dispatch_rtt_ms() == 1.25
