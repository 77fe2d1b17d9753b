"""bench.py wall-clock budget + partial-result contract.

Round 3's official artifact was empty (BENCH_r03.json rc=124, parsed=null)
because the old probe gate (10 x 150 s) plus a 2700 s watchdog could not fit
the driver's ~30-minute kill. These tests pin the round-4 arithmetic so the
budget cannot silently regress, and exercise the watchdog's partial-emit
path (the driver must ALWAYS get one parseable JSON line).
"""

from __future__ import annotations

import io
import json
import sys
import threading
from contextlib import redirect_stdout

import bench


def test_worst_case_wall_budget():
    # A probe attempt = one compile (+ tunnel setup, observed <=120 s cold
    # during degraded episodes) + 5 timed iterations (<=2 s degraded).
    probe_attempt_s = 130
    gate_worst = (
        bench.PROBE_ATTEMPTS * probe_attempt_s
        + (bench.PROBE_ATTEMPTS - 1) * bench.PROBE_WAIT_S
    )
    assert gate_worst <= 500, gate_worst
    # The watchdog is armed before any device call, so it bounds the whole
    # run (gate included). Worst wall = watchdog + interpreter startup +
    # emit margin; must sit comfortably under the driver's ~1800 s kill.
    assert bench.WATCHDOG_S <= 1200
    assert bench.WATCHDOG_S + 120 <= 1700
    # The gate must leave the measurement the lion's share of the watchdog.
    assert bench.WATCHDOG_S - gate_worst >= 700


def test_probe_gate_never_blocks_measurement():
    # On exhaustion probe_service returns (not raises/loops): source-level
    # contract — the retry loop is bounded by PROBE_ATTEMPTS and the final
    # path returns (probe_ms, True).
    assert bench.PROBE_ATTEMPTS <= 3
    assert bench.PROBE_WAIT_S <= 60


def test_results_skeleton_has_driver_fields():
    for field in ("metric", "value", "unit", "vs_baseline"):
        assert field in bench.RESULTS, field


def test_watchdog_partial_emit_is_parseable(monkeypatch):
    monkeypatch.setattr(bench, "_EMITTED", threading.Lock())
    monkeypatch.setitem(bench.RESULTS, "mixed_precision_vs_baseline", 2.086)
    buf = io.StringIO()
    with redirect_stdout(buf):
        bench._emit({"watchdog_fired": True, "error": "watchdog: test"})
        bench._emit({"should": "not appear twice"})  # once-only contract
    lines = [ln for ln in buf.getvalue().splitlines() if ln.strip()]
    assert len(lines) == 1
    parsed = json.loads(lines[0])
    assert parsed["watchdog_fired"] is True
    assert parsed["unit"] == "images/sec/chip"
    assert parsed["mixed_precision_vs_baseline"] == 2.086
    assert "value" in parsed and "vs_baseline" in parsed
