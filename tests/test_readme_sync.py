"""README performance rows must equal the committed artifacts (round-4
VERDICT weak #5: the table drifted after an artifact refresh; the generator
makes the invariant mechanical)."""

import subprocess
import sys
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_readme_table_matches_artifacts():
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "update_readme.py"),
         "--check"], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr + r.stdout
