"""The multi-seed ablation runner's artifact writer preserves every cell.

Round 5 briefly lost docs/ABLATION.json's no_attention column because the
writer only kept the variants named on the command line (fixed in
run_ablation.write_out, which now keeps every variant with cells). These
tests pin that behavior plus the schema migration and CI arithmetic, with
training/eval stubbed out — no model runs.
"""

from __future__ import annotations

import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location(
    "run_ablation", os.path.join(REPO, "scripts", "run_ablation.py"))
run_ablation = importlib.util.module_from_spec(spec)
spec.loader.exec_module(run_ablation)


def _cell(top1, wall=100.0):
    return {
        "train_wall_s": wall,
        "heldout_top1": top1,
        "heldout_top5": 1.0,
        "vqa_soft_accuracy": top1,
        "per_type_accuracy": {"is there": top1},
        "num_samples": 1299,
    }


def test_mean_ci95_single_value_has_zero_halfwidth():
    m, ci = run_ablation.mean_ci95([0.7])
    assert m == 0.7 and ci == 0.0


def test_mean_ci95_three_values_uses_student_t():
    vals = [0.70, 0.72, 0.74]
    m, ci = run_ablation.mean_ci95(vals)
    assert abs(m - 0.72) < 1e-12
    # sd = 0.02, t(2 df) = 4.303 -> 4.303 * 0.02 / sqrt(3)
    assert abs(ci - 4.303 * 0.02 / (3 ** 0.5)) < 1e-9


def test_load_existing_migrates_old_single_seed_schema(tmp_path):
    old = {"seed": 42, "variants": {"full": _cell(0.70),
                                    "no_attention": _cell(0.69)}}
    p = tmp_path / "ABLATION.json"
    p.write_text(json.dumps(old))
    cells = run_ablation._load_existing(str(p))
    assert cells[("full", 42)]["heldout_top1"] == 0.70
    assert cells[("no_attention", 42)]["heldout_top1"] == 0.69


def test_load_existing_reads_per_seed_schema(tmp_path):
    new = {"seeds": [7, 42], "variants": {"full": {
        "per_seed": {"7": _cell(0.71), "42": _cell(0.70)},
        "n_seeds": 2, "mean_heldout_top1": 0.705,
        "ci95_heldout_top1": 0.01}}}
    p = tmp_path / "ABLATION.json"
    p.write_text(json.dumps(new))
    cells = run_ablation._load_existing(str(p))
    assert set(cells) == {("full", 7), ("full", 42)}


def test_partial_rerun_preserves_other_variants(tmp_path, monkeypatch):
    """--variants full must NOT drop no_attention cells already in --out
    (the round-5 column-loss regression)."""
    out = tmp_path / "ABLATION.json"
    out.write_text(json.dumps({"seeds": [42], "variants": {
        "no_attention": {"per_seed": {"42": _cell(0.69)}, "n_seeds": 1,
                         "mean_heldout_top1": 0.69,
                         "ci95_heldout_top1": 0.0}}}))

    monkeypatch.setattr(run_ablation, "ensure_corpus",
                        lambda *a, **k: None)

    def fake_sh(cmd, log_path):
        # the evaluate step must leave evaluation_results.json where the
        # runner expects it; the train step is a no-op
        if "vqa_tpu.training.evaluate" in cmd:
            eval_dir = cmd[cmd.index("--output-dir") + 1]
            os.makedirs(eval_dir, exist_ok=True)
            with open(os.path.join(eval_dir,
                                   "evaluation_results.json"), "w") as f:
                json.dump({"top1_accuracy": 0.75, "top5_accuracy": 1.0,
                           "vqa_soft_accuracy": 0.76,
                           "per_type_accuracy": {"is there": 0.8},
                           "num_samples": 1299}, f)

    monkeypatch.setattr(run_ablation, "sh", fake_sh)
    monkeypatch.chdir(tmp_path)

    run_ablation.main(["--variants", "full", "--seeds", "7,42",
                       "--out", str(out), "--log", str(tmp_path / "log")])

    final = json.loads(out.read_text())
    assert set(final["variants"]) == {"full", "no_attention"}
    na = final["variants"]["no_attention"]
    assert na["per_seed"]["42"]["heldout_top1"] == 0.69
    full = final["variants"]["full"]
    assert set(full["per_seed"]) == {"7", "42"}
    assert full["n_seeds"] == 2
    assert final["seeds"] == [7, 42]


def test_cached_cells_are_not_rerun(tmp_path, monkeypatch):
    out = tmp_path / "ABLATION.json"
    out.write_text(json.dumps({"seeds": [42], "variants": {
        "full": {"per_seed": {"42": _cell(0.70)}, "n_seeds": 1,
                 "mean_heldout_top1": 0.70, "ci95_heldout_top1": 0.0}}}))
    calls = []
    monkeypatch.setattr(run_ablation, "ensure_corpus",
                        lambda *a, **k: None)
    monkeypatch.setattr(run_ablation, "sh",
                        lambda cmd, log: calls.append(cmd))
    monkeypatch.chdir(tmp_path)
    run_ablation.main(["--variants", "full", "--seeds", "42",
                       "--out", str(out), "--log", str(tmp_path / "log")])
    assert calls == []  # cell cached -> no train/eval subprocesses
