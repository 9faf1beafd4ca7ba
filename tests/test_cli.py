"""CLI smoke tests (in-process, CPU backend from conftest)."""

import json

import numpy as np

from heston_tpu import cli


def test_cli_price(capsys):
    rc = cli.main(["price", "--strikes", "90", "100", "110",
                   "--m1", "20", "--m2", "10", "--n-steps", "4"])
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    prices = [l["price"] for l in lines]
    assert len(prices) == 3
    assert prices[0] > prices[1] > prices[2] > 0


def test_cli_surface(tmp_path, capsys):
    csv = tmp_path / "s.csv"
    rc = cli.main(["surface", "--m1", "10", "--m2", "6", "--n-steps", "3",
                   "--csv", str(csv)])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["shape"] == [7, 11]
    assert csv.exists()


def test_cli_converge_timestep(tmp_path, capsys):
    csv = tmp_path / "c.csv"
    rc = cli.main(["converge", "--mode", "timestep", "--csv", str(csv),
                   "--m1", "20", "--m2", "10"])
    # timestep study uses its own spec; just check output structure
    assert rc == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    errs = [abs(r["price"] - 8.8943383103218502) for r in rows]
    assert errs[-1] < errs[0]   # refinement reduces error
    assert csv.exists()


def test_cli_calibrate_small(capsys, monkeypatch):
    # shrink the scenario so the test stays fast
    from heston_tpu import scenarios

    monkeypatch.setitem(
        scenarios.SCENARIOS, "european",
        scenarios.Scenario("european", num_strikes=6, max_iter=2, tol=1e-6))
    rc = cli.main(["calibrate", "european", "--m1", "16", "--m2", "8",
                   "--n-steps", "4"])
    assert rc == 0
    out = capsys.readouterr().out.splitlines()
    res = json.loads(out[-1])
    assert res["iterations"] >= 1
    assert np.isfinite(res["sse"])


def test_cli_risk(capsys):
    rc = cli.main(["risk", "--strikes", "90", "100", "110",
                   "--m1", "20", "--m2", "10", "--n-steps", "4",
                   "--american", "--param-jacobian"])
    assert rc == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    assert len(rows) == 3
    deltas = [r["delta"] for r in rows]
    assert deltas[0] > deltas[1] > deltas[2] > 0   # call deltas fall
    assert all(r["gamma"] > 0 and r["theta"] < 0 for r in rows)
    assert all("vega_v0" in r for r in rows)
def test_cli_risk_mixed_maturities(capsys):
    """--maturities prices a mixed-maturity book (one fused launch with
    per-lane step counts under the pallas engine; XLA group loop here)
    and must equal per-maturity single-book runs, in INPUT order."""
    rc = cli.main(["risk", "--strikes", "100", "90", "110",
                   "--maturities", "1.0", "0.5", "0.5",
                   "--m1", "20", "--m2", "10", "--n-steps", "4",
                   "--american"])
    assert rc == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    assert [r["strike"] for r in rows] == [100.0, 90.0, 110.0]
    assert [r["maturity"] for r in rows] == [1.0, 0.5, 0.5]
    for sub, mat, nst in ((["100"], "1.0", "4"), (["90", "110"], "0.5", "2")):
        rc = cli.main(["risk", "--strikes", *sub, "--m1", "20", "--m2",
                       "10", "--n-steps", nst, "--maturity", mat,
                       "--american"])
        assert rc == 0
        want = [json.loads(l)
                for l in capsys.readouterr().out.splitlines()]
        got = [r for r in rows if r["maturity"] == float(mat)]
        for g, w in zip(got, want):
            for key in ("price", "delta", "gamma", "theta"):
                assert abs(g[key] - w[key]) < 1e-9, (key, g, w)



def test_cli_mc(capsys):
    rc = cli.main(["mc", "--strike", "100", "--paths", "20000",
                   "--mc-steps", "50", "--american",
                   "--option-type", "put"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert out["price"] > 5.5 and out["price"] < 8.0
    assert out["ci95_half_width"] > 0


def test_cli_iv(capsys):
    """Round-trip: BS prices at flat vol 0.2 invert back (calls and puts)."""
    from heston_tpu.models import bs
    import jax.numpy as jnp

    for ot in ("call", "put"):
        prices = np.asarray(bs.generate_market_data(
            100.0, 1.0, 0.025, jnp.array([90.0, 110.0]), option_type=ot))
        rc = cli.main(["iv", "--strikes", "90", "110",
                       "--prices", str(prices[0]), str(prices[1]),
                       "--option-type", ot])
        assert rc == 0
        rows = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
        for r in rows:
            assert abs(r["implied_vol"] - 0.2) < 1e-6, (ot, r)


def test_cli_risk_csv_export(tmp_path, capsys):
    csv_path = tmp_path / "risk.csv"
    rc = cli.main(["risk", "--strikes", "100", "90", "110",
                   "--maturities", "1.0", "0.5", "0.5",
                   "--m1", "20", "--m2", "10", "--n-steps", "4",
                   "--american", "--param-jacobian",
                   "--csv", str(csv_path)])
    assert rc == 0
    lines = capsys.readouterr().out.splitlines()
    rows = [json.loads(l) for l in lines[:-1]]
    assert json.loads(lines[-1]) == {"csv": str(csv_path)}
    import csv as csvmod
    with open(csv_path) as f:
        body = [l for l in f if not l.startswith("#")]
    recs = list(csvmod.DictReader(body))
    assert [float(r["strike"]) for r in recs] == [100.0, 90.0, 110.0]
    assert [float(r["maturity"]) for r in recs] == [1.0, 0.5, 0.5]
    for r, j in zip(recs, rows):
        for key in ("price", "delta", "gamma", "theta", "vega_v0",
                    "vanna", "volga", "d_v0"):
            assert abs(float(r[key]) - j[key]) < 1e-12, key


def test_cli_calibrate_vega_weighting(capsys, monkeypatch):
    """--weighting vega fits the 1/vega^2 objective (framework
    extension); the run completes and reports a finite weighted SSE."""
    from heston_tpu import scenarios

    monkeypatch.setitem(
        scenarios.SCENARIOS, "european",
        scenarios.Scenario("european", num_strikes=6, max_iter=2, tol=1e-6))
    rc = cli.main(["calibrate", "european", "--m1", "16", "--m2", "8",
                   "--n-steps", "4", "--weighting", "vega"])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert res["iterations"] >= 1
    assert np.isfinite(res["sse"])
