"""Solver CLI surface: happy path, JSON output, error paths."""

import json

import pytest

from cfd_proxy_tpu.solver import main


def test_cli_json_all_schedules(capsys):
    rc = main(["--nx", "9", "--ny", "8", "--nz", "7", "--parts", "2",
               "--iters", "3", "--schedule", "all", "--json"])
    assert rc == 0
    d = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert sorted(d["schedules"]) == ["bulk", "early", "overlap"]
    assert d["npart"] == 2 and d["backend"] == "pallas"
    assert d["verification"]["bulk_vs_golden_relmax"] < 1e-5
    assert d["verification"]["early_vs_bulk_maxabs"] < 1e-5


def test_cli_table_output(capsys):
    rc = main(["--nx", "8", "--parts", "1", "--iters", "2",
               "--schedule", "bulk", "--no-verify"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "variant" in out and "Mfaces/s" in out


def test_cli_solver_mode(capsys):
    rc = main(["--nx", "8", "--ny", "8", "--nz", "7", "--parts", "2",
               "--iters", "2", "--schedule", "bulk", "--solver-mode",
               "--no-verify", "--json"])
    assert rc == 0
    d = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert d["solver_mode"] is True
    assert "bulk" in d["schedules"]


def test_cli_solver_mode_requires_pallas():
    with pytest.raises(SystemExit, match="pallas"):
        main(["--nx", "8", "--parts", "1", "--backend", "xla",
              "--solver-mode"])


def test_cli_missing_mesh_files():
    with pytest.raises(SystemExit) as e:
        main(["--mesh", "/nonexistent/prefix", "--parts", "2"])
    assert "tools.partition" in str(e.value)


def test_cli_flux_requires_pallas():
    with pytest.raises(SystemExit) as e:
        main(["--model", "flux", "--backend", "xla", "--nx", "8"])
    assert "pallas" in str(e.value)


def test_platform_flag_cpu_multi_part():
    """--platform cpu is the only way to get the virtual multi-device mesh
    on a TPU host (the plugin ignores JAX_PLATFORMS); exercise the flag on
    a multi-part run."""
    from cfd_proxy_tpu.solver import SolverConfig, run

    cfg = SolverConfig(nx=6, ny=6, nz=6, parts=4, iters=1, warmup=0,
                       schedule="early", platform="cpu", verify=True)
    results, _ = run(cfg)
    assert results["verification"]["early_vs_bulk_maxabs"] < 1e-4
