"""CLI routing tests (pipeline functions stubbed — no compute)."""

import sys

import pytest

import tpuvae.cli as cli


def test_help_exits_zero(capsys):
    assert cli.main([]) == 0
    assert "synth-data" in capsys.readouterr().out


def test_unknown_command(capsys):
    assert cli.main(["frobnicate"]) == 2
    assert "unknown command" in capsys.readouterr().out


def test_bad_config_key_is_friendly(capsys):
    rc = cli.main(["preprocess", "--definitely_not_a_key=1"])
    assert rc == 2
    assert "no field" in capsys.readouterr().err


def test_all_routes_data_dirs(monkeypatch, tmp_path):
    monkeypatch.chdir(tmp_path)  # no pre-existing artifacts → chaining fires
    calls = {}
    pre_calls = []

    def fake(name):
        def f(data, results, *a, **k):
            calls[name] = (data, results)
            import pandas as pd

            return pd.DataFrame({"Method": ["x"], "Silhouette": [0.0]})

        return f

    import tpuvae.io as io_mod
    import tpuvae.pipelines as p

    monkeypatch.setattr(p, "run_simple_vae", fake("simple"))
    monkeypatch.setattr(p, "run_conditional_vae", fake("cvae"))
    monkeypatch.setattr(p, "run_hybrid_vae", fake("hybrid"))
    # 'all' chains synth-data/preprocess when artifacts are absent — stub
    # those too and record where their outputs were routed
    monkeypatch.setattr(p, "preprocess_basic",
                        lambda cfg, **k: pre_calls.append(("pre", cfg.output_dir)))
    monkeypatch.setattr(p, "preprocess_advanced",
                        lambda cfg, **k: pre_calls.append(("adv", cfg.output_dir)))
    monkeypatch.setattr(io_mod, "generate_dataset",
                        lambda root, **k: pre_calls.append(("synth", root)))
    assert cli.main(["all", "--results_dir=R"]) == 0
    assert calls["simple"] == ("processed_data1", "R")
    assert calls["cvae"] == ("processed_data2", "R")
    assert calls["hybrid"] == ("processed_data2", "R")
    assert ("pre", "processed_data1") in pre_calls
    assert ("adv", "processed_data2") in pre_calls

    calls.clear()
    pre_calls.clear()
    # --data_dir must NOT alias both dirs in 'all'
    assert cli.main(["all", "--data_dir=weird"]) == 0
    assert calls["simple"][0] == "processed_data1"
    assert calls["cvae"][0] == "processed_data2"

    calls.clear()
    pre_calls.clear()
    assert cli.main(["all", "--data1_dir=D1", "--data2_dir=D2"]) == 0
    assert calls["simple"][0] == "D1"
    assert calls["hybrid"][0] == "D2"
    assert ("pre", "D1") in pre_calls
    assert ("adv", "D2") in pre_calls


def test_single_pipeline_data_dir(monkeypatch):
    seen = {}

    def fake(data, results, cfg, *a, **k):
        seen["data"] = data
        seen["epochs"] = cfg.epochs
        import pandas as pd

        return pd.DataFrame({"Method": ["x"], "Silhouette": [0.0]})

    import tpuvae.pipelines as p

    monkeypatch.setattr(p, "run_simple_vae", fake)
    assert cli.main(["train-simple", "--data_dir=mydir", "--epochs=7"]) == 0
    assert seen == {"data": "mydir", "epochs": 7}


def test_report_command(tmp_path, capsys, monkeypatch):
    import pandas as pd

    monkeypatch.chdir(tmp_path)
    # no results yet -> rc 1 with a pointer at the expected path
    assert cli.main(["report"]) == 1
    assert "no results at" in capsys.readouterr().out
    (tmp_path / "results").mkdir()
    pd.DataFrame({"Architecture": ["Simple VAE"], "Silhouette": [0.4]}).to_csv(
        tmp_path / "results" / "clustering_metrics.csv", index=False)
    assert cli.main(["report"]) == 0
    out = capsys.readouterr().out
    assert "Simple VAE" in out and "0.4" in out


def test_parity_command_routes_and_reports(monkeypatch, capsys):
    import tpuvae.parity as parity

    seen = {}

    def fake(data1, data2, work_dir, tol, fast):
        seen.update(d1=data1, d2=data2, wd=work_dir, tol=tol, fast=fast)
        return {"ok": True, "problems": []}

    monkeypatch.setattr(parity, "run_parity", fake)
    rc = cli.main(["parity", "--data1_dir=A", "--data2_dir=B",
                   "--out_dir=W", "--tol=0.02", "--fast=0"])
    assert rc == 0
    assert "PARITY OK" in capsys.readouterr().out
    assert seen == dict(d1="A", d2="B", wd="W", tol=0.02, fast=False)

    monkeypatch.setattr(parity, "run_parity",
                        lambda **kw: {"ok": False, "problems": ["Silhouette[0]"]})
    assert cli.main(["parity"]) == 1
    assert "Silhouette[0]" in capsys.readouterr().out


def test_eda_command_routes(monkeypatch, capsys):
    import tpuvae.viz.eda as eda

    calls = []
    monkeypatch.setattr(eda, "run_eda",
                        lambda d, o: calls.append((d, o)) or {"n": 3})
    assert cli.main(["eda", "--data_dir=D2", "--out_dir=O"]) == 0
    assert calls == [("D2", "O")]
    assert '"n": 3' in capsys.readouterr().out


def test_global_flags_set_debug_and_profile(monkeypatch, capsys):
    import jax

    monkeypatch.delenv("TPUVAE_PROFILE_DIR", raising=False)
    monkeypatch.setattr(jax.config, "update", lambda *a: None)  # not sticky
    flags = []
    monkeypatch.setattr(jax.config, "update", lambda k, v: flags.append((k, v)))
    assert cli.main(["--debug-nans", "--profile"]) == 0  # help after strip
    assert ("jax_debug_nans", True) in flags
    import os
    assert os.environ["TPUVAE_PROFILE_DIR"] == "profiles"


def test_all_rejects_unknown_field(capsys):
    assert cli.main(["all", "--not_a_real_field=3"]) == 2
    assert "not_a_real_field" in capsys.readouterr().err


def test_quality_command_separation_selects_floor_profile(monkeypatch,
                                                          capsys):
    """--separation routes to the matching two-corpus floor profile
    (parity.quality_floors); explicit per-key overrides still win."""
    import tpuvae.parity as parity

    seen = {}

    def fake(data1, data2, results_dir, floors, fast):
        seen["floors"] = floors
        return {"ok": True, "problems": [], "values": {}}

    monkeypatch.setattr(parity, "run_quality", fake)
    assert cli.main(["quality", "--separation=0.75"]) == 0
    assert seen["floors"] == parity.QUALITY_FLOORS_HARD
    assert cli.main(["quality"]) == 0
    assert seen["floors"] == parity.QUALITY_FLOORS
    assert cli.main(["quality", "--hybrid_ari=0.42"]) == 0
    assert seen["floors"]["hybrid_ari"] == 0.42
    capsys.readouterr()
