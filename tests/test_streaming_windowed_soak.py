"""Integration test for scripts/streaming_windowed_soak.py: a shrunk
(~90 s stream + twins) run of the four windowed/stateful operators the
endurance soak covers — native session windows, numeric drift, categorical
drift, class balance — asserting the harness's full output contract: every
emitted window/session byte-equal to the batch twin, no closed window
missing, state bounded by the design constants, and the planted drift
parity pattern (odd windows skewed, every third window vocabulary-collapsed,
stationary class balance) detected exactly. The 12-minute endurance numbers
land in BASELINE.md, not here.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_windowed_soak_smoke(tmp_path):
    out = tmp_path / "sws.json"
    p = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "streaming_windowed_soak.py"),
            "--minutes", "1.5",
            "--window-sec", "10",
            "--watermark-sec", "15",
            "--epoch-sec", "8",
            "--session-gap-sec", "5",
            "--session-wm-sec", "10",
            "--n-users", "60",
            "--rows-per-sec", "400",
            "--out", str(out),
            "--work-dir", str(tmp_path / "work"),
        ],
        env={**os.environ, "SPARK_GRAFT_CPUS": "8"},
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert p.returncode == 0, p.stdout[-2000:] + p.stderr[-2000:]
    res = json.loads(out.read_text())

    for name, o in res["ops"].items():
        assert o["emitted"] > 0, (name, o)
        assert o["exact"], (name, {k: v for k, v in o.items() if k != "telemetry"})
        assert o["state_bounded"], (name, o["state_rows_max"], o["state_bound"])
    assert res["all_exact"] and res["all_bounded"]

    # planted truths: enough windows closed to cover every parity class
    assert res["planted"]["numdrift_exact"], res["planted"]
    assert res["planted"]["catdrift_exact"], res["planted"]
    assert res["planted"]["classbal_all_hold"], res["planted"]
    # sessions must have emitted full bursts for many users
    assert res["ops"]["sessions"]["emitted"] >= 60
