"""Doc-drift guard (VERDICT r04 #8): README/INVENTORY performance
numbers must be byte-identical to what tools/gen_perf_docs.py generates
from the newest BENCH_r*.json artifact and the real test count —
three rounds of review flagged hand-edited numbers lagging the
artifacts, so the numbers are now generated and this test fails the
suite when they drift."""
import pathlib
import subprocess
import sys

import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent


@pytest.mark.slow
def test_perf_docs_match_artifacts():
    out = subprocess.run(
        [sys.executable, str(ROOT / "tools" / "gen_perf_docs.py"),
         "--check"], cwd=ROOT, capture_output=True, text=True)
    assert out.returncode == 0, out.stdout + out.stderr
