"""Guard tests for the examples/ drivers (run on the virtual CPU mesh)."""

import os
import sys

import numpy as np

EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples")


def test_convergence_driver_converges():
    sys.path.insert(0, EXAMPLES)
    try:
        from convergence_driver import drive
    finally:
        sys.path.remove(EXAMPLES)
    status, res = drive(nx=8, ny=8, nz=6, nparts=2, max_steps=60,
                        verbose=False)
    assert status == "converged", (status, res)
    assert res[-1] < 0.1 * res[0]
    # monotone decay up to explicit-scheme ripple
    assert all(b < 1.05 * a for a, b in zip(res, res[1:])), res


def test_multichip_overlap_example():
    sys.path.insert(0, EXAMPLES)
    try:
        from multichip_overlap import main as mc_main
    finally:
        sys.path.remove(EXAMPLES)
    topo, out = mc_main(nx=10, ny=9, nz=8, nparts=4, slice_size=2,
                        verbose=False)
    # slice-aware coloring: ICI phases strictly before DCN phases
    kinds = [p.inter_slice for p in topo.phases]
    assert kinds == sorted(kinds), kinds
    assert any(kinds) and not all(kinds)  # both transport classes present
    for k, v in out.items():
        assert v < 1e-6, (k, v)


def test_pseudo_time_stepping_runs(capsys):
    sys.path.insert(0, EXAMPLES)
    try:
        import pseudo_time_stepping
    finally:
        sys.path.remove(EXAMPLES)
    pseudo_time_stepping.main()
    out = capsys.readouterr().out
    assert "done" in out
    norms = [float(l.split("=")[1]) for l in out.splitlines() if "||q||" in l]
    assert len(norms) == 5 and all(np.isfinite(norms))
