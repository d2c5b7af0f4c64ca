"""bench.py watchdog: a hung TPU tunnel must yield a diagnostic JSON line
and a nonzero exit instead of a silent hang (the driver records bench
output verbatim; an empty tail is unattributable)."""

import json
import time

import bench


def test_watchdog_fires_with_diagnostic_json(monkeypatch, capsys):
    exits = []
    monkeypatch.setattr(bench.os, "_exit", lambda code: exits.append(code))

    disarm = bench._arm_watchdog(deadline_s=0.2)
    time.sleep(1.0)  # let the watchdog thread fire
    assert exits == [3]
    line = capsys.readouterr().out.strip()
    d = json.loads(line)
    assert d["metric"] == "3modal_eval_imgs_per_s_per_chip"
    assert d["value"] == 0.0
    assert "error" in d
    disarm()


def test_watchdog_disarm_prevents_firing(monkeypatch, capsys):
    exits = []
    monkeypatch.setattr(bench.os, "_exit", lambda code: exits.append(code))

    disarm = bench._arm_watchdog(deadline_s=0.3)
    disarm()
    time.sleep(1.0)
    assert exits == []
    assert capsys.readouterr().out.strip() == ""


def test_watchdog_disabled_by_zero():
    disarm = bench._arm_watchdog(deadline_s=0)
    disarm()  # no-op callback
