"""The 100TB design rests on plan shapes (pushdown, single-exchange
builds, broadcast confirms, zero-exchange bucketed joins, partition
pruning). tools/explain_plans.py asserts them; this test runs the full
audit so a plan regression fails the pytest gate, not just the tool."""

import subprocess
import sys


def test_explain_plans_audit_all_pass():
    out = subprocess.run(
        [sys.executable, "tools/explain_plans.py"],
        capture_output=True, text=True, timeout=900, cwd="/root/repo")
    tail = "\n".join(out.stdout.splitlines()[-25:])
    assert out.returncode == 0, f"audit failed:\n{tail}\n{out.stderr[-1500:]}"
    assert "FAIL - " not in out.stdout
    assert out.stdout.count("PASS - ") >= 15
