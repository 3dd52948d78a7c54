"""Smoke tests for the demo CLI (the reference main.f90 menu twin).

Small sizes keep the dense oracles and solver compiles cheap; the full
reference protocol (n=1000, tol=1e-8) is covered by
tests/test_iteration_parity.py and the bench toy sections.  These pin
the CLI surface itself: argument parsing, result-file format, and that
every subcommand runs its solvers AND its dense cross-check end to end.
"""

import os

import pytest

from diaglib_tpu import demo


@pytest.mark.parametrize("cmd", ["symm", "geneig", "scflr"])
def test_demo_subcommand_smoke(tmp_path, cmd):
    demo.main([f"--n=120", "--n-want=4", "--tol=1e-8", "--out-dir",
               str(tmp_path), cmd])
    files = sorted(os.listdir(tmp_path))
    assert "lapack.txt" in files  # the dense-oracle file, reference name
    # at least one iterative-result file in the reference format
    others = [f for f in files if f != "lapack.txt"]
    assert others, files
    head = open(tmp_path / others[0]).read().splitlines()
    assert any("eigenvalue" in ln.lower() or "root" in ln.lower()
               or ln.strip() for ln in head[:5])


def test_demo_nonsym_smoke(tmp_path):
    demo.main(["--n=120", "--n-want=3", "--tol=1e-8", "--out-dir",
               str(tmp_path), "nonsym", "--side", "c", "--variant", "4"])
    assert "nonsym.txt" in os.listdir(tmp_path)
