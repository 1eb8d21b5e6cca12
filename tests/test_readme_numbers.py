"""README honesty check (VERDICT r2 weak #1/#2): every number in the
README's generated MILP blocks must match the committed CSVs exactly —
regenerate with `python benchmark/summarize.py --write README.md` after a
sweep.  The vs-SCIP block includes the losing rows by construction."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_readme_generated_blocks_match_csvs():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "benchmark", "summarize.py"),
         "--check", os.path.join(REPO, "README.md")],
        capture_output=True, text=True,
    )
    assert proc.returncode == 0, (
        "README generated blocks drifted from benchmark/results CSVs:\n"
        + proc.stdout + proc.stderr
    )


def test_scip_losses_are_reported():
    """The generated output must state losses, not only wins: the vs-SCIP
    table always carries a 'worse' count (it may be 0 only if the CSVs say
    so — today scpclr12 is a known loss)."""
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "benchmark", "summarize.py"),
         "--readme"],
        capture_output=True, text=True,
    )
    assert proc.returncode == 0, proc.stderr
    assert "worse**" in proc.stdout or "worse*" in proc.stdout
