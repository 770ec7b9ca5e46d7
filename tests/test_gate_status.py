"""tools/gate_status.py runs in CI so 'all tests green' never silently
absorbs 'the accuracy gates were skipped' (VERDICT r1 item 10). The tool's
output is printed into the pytest report (shown with -rP or on failure)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_gate_status_reports_pending_gates():
    r = subprocess.run([sys.executable,
                        os.path.join(REPO, "tools", "gate_status.py")],
                       capture_output=True, text=True, timeout=120)
    print(r.stdout)  # surfaced in the CI report
    assert r.returncode == 0, r.stderr
    # the three asset-gated accuracy gates must be listed explicitly
    for gate in ("ckpt-parity", "voxceleb-eer", "diarization-der"):
        assert gate in r.stdout, gate
    # in this container they are pending (no weights / corpora); if assets
    # appear the tool flips them to PASS and this assertion documents it
    assert r.stdout.count("PENDING (needs assets)") >= 1
    assert "PASS (in-container)" in r.stdout
