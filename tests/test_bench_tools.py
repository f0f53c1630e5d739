"""The bench/sweep tooling contracts: first-class normalization
fields in the bench artifact (verdict r12 #7) and the sweep's
phantom-outlier self-adjudication shapes (verdict r12 #3)."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
    ),
)

import bench_gate  # noqa: E402
import time_sweep  # noqa: E402


def test_normalization_fields_match_ledger_math():
    """normalization() must reproduce the judge's hand math: factor =
    probe/best-probe, equiv = suite/factor, ratio = equiv/best-sum."""
    best = bench_gate._load_history()
    result = {
        "queries": {
            n: sec * 2.0
            for n, sec in best.items()
            if n != bench_gate.CAL_KEY
        },
        "calibration_s": best[bench_gate.CAL_KEY] * 2.0,
    }
    doc = bench_gate.normalization(result)
    assert doc["machine_factor"] == 2.0
    # a uniformly 2x-slower host normalizes back to ratio 1.0
    assert abs(doc["normalized_suite_ratio"] - 1.0) < 0.01
    assert doc["suite_equiv_seconds"] <= sum(result["queries"].values())
    assert set(doc) == {
        "machine_factor",
        "machine_factor_source",
        "suite_equiv_seconds",
        "best_known_suite_seconds",
        "normalized_suite_ratio",
    }


def test_sweep_entry_seconds_handles_both_shapes():
    assert time_sweep._as_seconds(1.5) == 1.5
    assert (
        time_sweep._as_seconds({"sweep_s": 60.0, "isolated_s": 15.0})
        == 15.0
    )
    assert time_sweep._as_seconds({"sweep_s": 60.0}) == 60.0
    assert time_sweep._as_seconds("junk") is None
    assert time_sweep._as_seconds({}) is None


def test_prior_sweep_times_reads_newest_artifact():
    prior = time_sweep._prior_sweep_times()
    # the repo carries SWEEP_r08..r12; the newest must load and be
    # flat {name: seconds} regardless of retimed-entry dicts
    assert prior, "no prior sweep artifact parsed"
    assert all(isinstance(v, float) for v in prior.values())
    assert "q1_pricing_summary" in prior


def test_gate_refuses_cross_scale_merge(tmp_path, monkeypatch, capsys):
    """Regression: an sf0.01 sanity run min-merged its (much faster)
    times into the sf0.1 best ledger, making every future real run a
    false regression. The gate now skips compare AND merge when the
    result's sf differs from the ledger's."""
    import json

    ledger_before = json.load(open(bench_gate.LEDGER))
    result = {
        "queries": {"q1_pricing_summary": 0.001},
        "calibration_s": 0.9,
        "sf": 0.01,
    }
    monkeypatch.setattr(
        "sys.argv", ["bench_gate.py", _write_json(tmp_path, result)]
    )
    assert bench_gate.main() == 0
    assert "SKIPPED" in capsys.readouterr().out
    assert json.load(open(bench_gate.LEDGER)) == ledger_before
    # normalization likewise refuses cross-scale fiction
    assert bench_gate.normalization(result) == {}


def _write_json(tmp_path, doc) -> str:
    import json

    p = tmp_path / "result.json"
    p.write_text(json.dumps(doc))
    return str(p)
