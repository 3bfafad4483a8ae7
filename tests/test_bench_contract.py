"""The driver records bench.py's ONE JSON line as BENCH_r{N}.json — its
shape is a contract (VERDICT r5 #5 added the cold/warm split; r5 #1 the
npz-provider throughput). These tests pin the reporting layer without
spinning Spark: run_headline is stubbed with canned per-run results and
main()'s printed JSON is parsed back.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def benchmod():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_under_test"] = mod
    spec.loader.exec_module(mod)
    try:
        yield mod
    finally:
        sys.modules.pop("bench_under_test", None)


def _canned_runs():
    # run 0 = cold JVM (slower everywhere); runs 1-2 warm
    mk = lambda a, b, c: {
        "total_sec": round(a + b + c, 3),
        "queries": {"q_fast": a, "q_slow": b, "kg_linear_npz": c},
        "pipeline_docs_per_sec": 1000.0,
        "linear_docs_per_sec": 2000.0,
        "linear_npz_docs_per_sec": 1500.0,
    }
    return [mk(2.0, 5.0, 3.0), mk(1.0, 4.0, 2.0), mk(1.2, 3.5, 2.5)]


def _quiet_load(benchmod, monkeypatch):
    # the gate reads the REAL host load; tests must not depend on it —
    # and the retry cooldown (90s load-decay sleep) must not run in tests
    monkeypatch.setattr(benchmod.os, "getloadavg", lambda: (0.1, 0.1, 0.1))
    monkeypatch.setenv("SPARK_GRAFT_BENCH_RETRY_COOLDOWN_S", "0")
    # ...nor on the repo's REAL standing quiet floor (canned run times would
    # trip the r8 suspect gate against it); floor-specific tests set their own
    if "SPARK_GRAFT_BENCH_FLOOR" not in os.environ:
        monkeypatch.setenv("SPARK_GRAFT_BENCH_FLOOR", "/nonexistent/floor.json")


def test_bench_json_contract(benchmod, monkeypatch, capsys):
    runs = _canned_runs()
    monkeypatch.setattr(benchmod, "run_headline", lambda *a, **k: runs.pop(0))
    monkeypatch.setenv("SPARK_GRAFT_BENCH_REPEATS", "3")
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    _quiet_load(benchmod, monkeypatch)
    benchmod.main()
    lines = [ln for ln in capsys.readouterr().out.splitlines() if ln.startswith("{")]
    assert len(lines) == 1, "exactly ONE JSON line"
    out = json.loads(lines[0])

    # headline value = best SINGLE-run total (a total some run achieved)
    assert out["metric"] == "headline_total_sec" and out["unit"] == "sec"
    assert out["value"] == 7.0
    # per-query composite = best of the WARM runs only (VERDICT r6 #7: the
    # cold run is excluded so the composite can never undercut warm numbers)
    assert out["queries"] == {"q_fast": 1.0, "q_slow": 3.5, "kg_linear_npz": 2.0}
    assert out["per_query_best_composite_sec"] == 6.5
    # cold run stays visible verbatim (VERDICT r5 #5)
    assert out["queries_cold"] == {"q_fast": 2.0, "q_slow": 5.0, "kg_linear_npz": 3.0}
    assert "queries_warm" not in out  # folded into "queries" in r7
    # npz throughput propagates (VERDICT r5 #1)
    assert out["linear_npz_docs_per_sec"] == 1500.0
    # auditability stamps + noise-gate verdict (VERDICT r6 #2)
    assert out["repeats"] == 3 and len(out["run_totals_sec"]) == 3
    assert "load_avg_start" in out and "load_avg_end" in out
    assert out["window_ok"] is True and out["rejected_windows"] == []


def test_bench_single_repeat_composite_is_cold(benchmod, monkeypatch, capsys):
    run = _canned_runs()[0]
    monkeypatch.setattr(benchmod, "run_headline", lambda *a, **k: dict(run))
    monkeypatch.setenv("SPARK_GRAFT_BENCH_REPEATS", "1")
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    _quiet_load(benchmod, monkeypatch)
    benchmod.main()
    line = [ln for ln in capsys.readouterr().out.splitlines() if ln.startswith("{")][0]
    out = json.loads(line)
    # with a single run there is no warm set — composite = the one (cold) run
    assert out["queries_cold"] == out["queries"]


def test_bench_loud_window_retries_and_records_trail(benchmod, monkeypatch, capsys):
    """VERDICT r6 #2: a loud window (run_totals spread > 1.5) is retried
    once and the rejection trail is published; the final JSON carries the
    quiet attempt's numbers with window_ok=true."""
    loud = [
        {"total_sec": 20.0, "queries": {"q": 20.0}},
        {"total_sec": 58.0, "queries": {"q": 58.0}},  # 2.9× spread
        {"total_sec": 21.0, "queries": {"q": 21.0}},
    ]
    quiet = [
        {"total_sec": 10.0, "queries": {"q": 10.0}},
        {"total_sec": 9.0, "queries": {"q": 9.0}},
        {"total_sec": 9.5, "queries": {"q": 9.5}},
    ]
    seq = loud + quiet
    monkeypatch.setattr(benchmod, "run_headline", lambda *a, **k: seq.pop(0))
    monkeypatch.setenv("SPARK_GRAFT_BENCH_REPEATS", "3")
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    _quiet_load(benchmod, monkeypatch)
    benchmod.main()
    line = [ln for ln in capsys.readouterr().out.splitlines() if ln.startswith("{")][0]
    out = json.loads(line)
    assert out["window_ok"] is True and out["window_reasons"] == []
    assert out["value"] == 9.0 and out["run_totals_sec"] == [10.0, 9.0, 9.5]
    (rej,) = out["rejected_windows"]
    assert rej["run_totals_sec"] == [20.0, 58.0, 21.0]
    assert any("spread" in r for r in rej["reasons"])


def test_bench_loud_window_exhausted_retries_publishes_flagged(
    benchmod, monkeypatch, capsys
):
    """When every attempt is loud the artifact still publishes — flagged
    window_ok=false with the reasons, never silently."""
    mk = lambda t: {"total_sec": t, "queries": {"q": t}}
    seq = [mk(20.0), mk(58.0), mk(21.0), mk(22.0), mk(60.0), mk(23.0)]
    monkeypatch.setattr(benchmod, "run_headline", lambda *a, **k: seq.pop(0))
    monkeypatch.setenv("SPARK_GRAFT_BENCH_REPEATS", "3")
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    _quiet_load(benchmod, monkeypatch)
    benchmod.main()
    line = [ln for ln in capsys.readouterr().out.splitlines() if ln.startswith("{")][0]
    out = json.loads(line)
    assert out["window_ok"] is False
    assert any("spread" in r for r in out["window_reasons"])
    assert len(out["rejected_windows"]) == 1  # default retry budget = 1


def test_headline_queries_exist_in_registry(benchmod):
    """Every benched headline query must be a real registry entry — a rename
    in __spark_entry__.queries() would otherwise only fail at driver time."""
    sys.path.insert(0, REPO)
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    missing = [n for n in benchmod.HEADLINE if n not in qs]
    assert not missing, f"bench names not in queries(): {missing}"


def test_bench_per_run_load_stamps(benchmod, monkeypatch, capsys):
    """VERDICT r7 #2: every run stamps the load it started under — the r7
    artifact sampled load only at attempt start, so a burst between warm
    runs polluted per-query minima invisibly."""
    runs = _canned_runs()
    monkeypatch.setattr(benchmod, "run_headline", lambda *a, **k: runs.pop(0))
    monkeypatch.setenv("SPARK_GRAFT_BENCH_REPEATS", "3")
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    _quiet_load(benchmod, monkeypatch)
    benchmod.main()
    line = [ln for ln in capsys.readouterr().out.splitlines() if ln.startswith("{")][0]
    out = json.loads(line)
    assert len(out["load_avg_per_run"]) == 3
    assert all(len(triple) == 3 for triple in out["load_avg_per_run"])
    # first run's stamp doubles as the attempt-level start stamp
    assert out["load_avg_start"] == out["load_avg_per_run"][0]


def test_bench_suspect_queries_flagged_and_retried(
    benchmod, monkeypatch, capsys, tmp_path
):
    """VERDICT r7 #2: a per-query min > 1.5x the standing quiet floor is a
    suspect even when the run-level window gate passes (equal pollution of
    both warm runs defeats the spread check). One retry fires; if the
    suspect persists, the artifact publishes it honestly."""
    floor = tmp_path / "floor.json"
    floor.write_text(json.dumps({"queries": {"q_fast": 1.0, "q_slow": 4.0}}))
    monkeypatch.setenv("SPARK_GRAFT_BENCH_FLOOR", str(floor))
    # q_fast polluted to 2.2x floor in BOTH warm runs of BOTH attempts;
    # totals are flat, so the legacy window gate sees nothing
    mk = lambda f, s: {"total_sec": round(f + s, 3), "queries": {"q_fast": f, "q_slow": s}}
    seq = [mk(2.3, 4.0), mk(2.2, 4.0), mk(2.25, 4.1)] * 2
    monkeypatch.setattr(benchmod, "run_headline", lambda *a, **k: seq.pop(0))
    monkeypatch.setenv("SPARK_GRAFT_BENCH_REPEATS", "3")
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    _quiet_load(benchmod, monkeypatch)
    benchmod.main()
    line = [ln for ln in capsys.readouterr().out.splitlines() if ln.startswith("{")][0]
    out = json.loads(line)
    assert out["window_ok"] is True  # run-level gate: genuinely quiet window
    assert list(out["suspect_queries"]) == ["q_fast"]
    sq = out["suspect_queries"]["q_fast"]
    assert sq["sec"] == 2.2 and sq["quiet_floor_sec"] == 1.0 and sq["ratio"] == 2.2
    # the retry fired and recorded its own suspect trail
    (rej,) = out["rejected_windows"]
    assert "q_fast" in rej["suspect_queries"] and len(rej["load_avg_per_run"]) == 3
    # q_slow sits at its floor — not flagged
    assert "q_slow" not in out["suspect_queries"]


def test_bench_no_floor_file_means_no_suspects(benchmod, monkeypatch, capsys, tmp_path):
    monkeypatch.setenv("SPARK_GRAFT_BENCH_FLOOR", str(tmp_path / "absent.json"))
    runs = _canned_runs()
    monkeypatch.setattr(benchmod, "run_headline", lambda *a, **k: runs.pop(0))
    monkeypatch.setenv("SPARK_GRAFT_BENCH_REPEATS", "3")
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    _quiet_load(benchmod, monkeypatch)
    benchmod.main()
    line = [ln for ln in capsys.readouterr().out.splitlines() if ln.startswith("{")][0]
    out = json.loads(line)
    assert out["suspect_queries"] == {} and out["rejected_windows"] == []


def test_bench_repo_floor_file_is_wellformed(benchmod):
    """The checked-in standing floor must load and cover the headline set."""
    floor = benchmod._load_quiet_floor()
    assert floor, "BENCH/quiet_floor.json missing or empty"
    assert all(isinstance(v, (int, float)) and v > 0 for v in floor.values())
    assert set(benchmod.HEADLINE) <= set(floor)
