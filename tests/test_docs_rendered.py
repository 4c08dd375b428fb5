"""The numbers quoted in BASELINE.md / SURVEY.md must be mechanically
derived from the bench artifact of record (round-8 verdict item 3 —
three rounds in a row a hand-edited figure disagreed with the recorded
BENCH_rNN.json). `tools/render_baseline.py --check` re-renders the
marker blocks in memory and fails if the committed docs differ."""

import subprocess
import sys


def test_docs_match_bench_artifact():
    proc = subprocess.run(
        [sys.executable, "tools/render_baseline.py", "--check"],
        cwd="/root/repo",
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
