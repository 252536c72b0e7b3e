"""CLI smoke test: the repo-root eval entry script runs end to end.

The reference's user-facing contract is its CLI scripts
(``test_nbp_planning.py`` with argparse ``-c``/flags —
/root/reference/test_nbp_planning.py:12-38); the library internals are
covered elsewhere, this guards the argparse/glue layer users actually
invoke.  Runs ``main()`` in-process (monkeypatched argv) so the quick-config
host-rollout programs share this test session's XLA compile cache — a
subprocess would pay a multi-minute fresh compile on this host every run.
"""

import importlib.util
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_script(name):
    spec = importlib.util.spec_from_file_location(
        f"cli_{name}", os.path.join(REPO, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
def test_nbp_planning_cli_host_path(tmp_path, monkeypatch):
    out = tmp_path / "results.json"
    mod = _load_script("test_nbp_planning")
    monkeypatch.setattr(sys, "argv", [
        "test_nbp_planning.py", "--procgen", "simple", "--quick",
        "--poses", "3", "--out", str(out),
    ])
    monkeypatch.chdir(REPO)
    mod.main()
    results = json.loads(out.read_text())
    assert len(results) == 1
    (res,) = results.values()
    # Reference results schema (nbp_planning.py:505-512): per-scene coverage
    # evolution + camera history.
    assert len(res["coverage_evolution"]) >= 3
    assert all(0.0 <= c <= 1.0 for c in res["coverage_evolution"])
    assert res["coverage_evolution"][-1] >= res["coverage_evolution"][0]
    assert len(res["cam_positions"]) >= 3
    assert res["auc"] > 0.0
