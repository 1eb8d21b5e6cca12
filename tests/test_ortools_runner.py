"""Live OR-Tools runner (benchmark/ortools_runner.py, VERDICT r3 item 9).

ortools is not installed in the build environment, so the live-solve
tests importorskip; the graceful-degradation contract (no raise, clear
SOLVER_UNAVAILABLE rows) is tested unconditionally.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "benchmark"))

import ortools_runner  # noqa: E402

from sypha_tpu.io.scp_reader import parse_scp_text

TINY = """\
3 4
2 3 4 5
2 1 2
2 2 3
2 1 4
"""
# rows: {0,1}, {1,2}, {0,3}; optimum cover {x0, x1} = 2 + 3 = 5
# LP relaxation also 5.0 (x0=x1=1 is an LP vertex here)


def test_unavailable_is_graceful():
    model = parse_scp_text(TINY, name="tiny")
    res = ortools_runner.solve_scp_ortools(model, integer=True)
    if not ortools_runner.have_ortools():
        assert res["status"] == "SOLVER_UNAVAILABLE"
        assert res["objective"] is None
    else:
        assert res["status"] == "OPTIMAL"


def test_cli_exits_2_without_ortools(tmp_path, capsys):
    if ortools_runner.have_ortools():
        pytest.skip("ortools installed; CLI degradation path not reachable")
    rc = ortools_runner.main(
        ["--instances", "scp41", "--out", str(tmp_path)]
    )
    assert rc == 2


@pytest.mark.skipif(
    not ortools_runner.have_ortools(), reason="ortools not installed"
)
def test_live_lp_and_ip_on_tiny(tmp_path):
    model = parse_scp_text(TINY, name="tiny")
    lp = ortools_runner.solve_scp_ortools(model, integer=False)
    assert lp["status"] == "OPTIMAL"
    assert abs(lp["objective"] - 5.0) < 1e-6
    ip = ortools_runner.solve_scp_ortools(model, integer=True, time_limit_sec=30)
    assert ip["status"] == "OPTIMAL"
    assert abs(ip["objective"] - 5.0) < 1e-6

    # full CSV pipeline on a real file
    p = tmp_path / "tiny.txt"
    p.write_text(TINY)
    row = ortools_runner.run_instance(str(p), time_limit_sec=30)
    assert row["ip_status"] == "OPTIMAL"
    assert abs(float(row["ip_objective"]) - 5.0) < 1e-6
