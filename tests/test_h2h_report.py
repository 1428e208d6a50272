"""The head-to-head report generator survives partial campaigns.

scripts/run_h2h_campaign.sh continues past failed steps, so
scripts/h2h_report.py must assemble docs/HEAD_TO_HEAD.md from whatever
artifact subset actually landed — these tests pin that behavior (and the
gap/CI arithmetic) with synthetic artifacts, no training involved.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location(
    "h2h_report", os.path.join(REPO, "scripts", "h2h_report.py"))
h2h_report = importlib.util.module_from_spec(spec)
spec.loader.exec_module(h2h_report)


def _run(tag_curves, seed=42, n_train=800, n_val=200, best=(0.70, 0.72),
         imported=None):
    rows = []
    for ep, (ref_l, our_l, ref_a, our_a) in enumerate(tag_curves):
        rows.append({"epoch": ep, "ref_train_loss": ref_l,
                     "our_train_loss": our_l, "ref_val_top1": ref_a,
                     "our_val_top1": our_a})
    return {
        "subset": n_train + n_val, "epochs": len(tag_curves),
        "batch_size": 32, "lr": 1e-4, "weight_decay": 0.01, "seed": seed,
        "n_train": n_train, "n_val": n_val,
        "ref_wall_s": 900.0, "our_wall_s": 300.0,
        "ref_best_val_top1": best[0], "our_best_val_top1": best[1],
        "imported_ref_ckpt_val_top1": imported,
        "imported_ref_ckpt_val_top5": imported,
        "curves": rows,
    }


def _write(docs, tag, payload):
    with open(os.path.join(docs, f"h2h_{tag}.json"), "w") as f:
        json.dump(payload, f)


def test_loss_gap_window():
    # gap is averaged over epochs >= 3 only (where the r3 offset lived)
    curves = [(1.0, 9.0, 0.1, 0.1)] * 3 + [(1.0, 1.2, 0.5, 0.5)] * 4
    run = _run(curves)
    assert h2h_report.loss_gap(run) == pytest.approx(0.2)


def test_loss_gap_skips_missing_epochs():
    curves = [(None, 1.0, None, 0.1)] * 8  # reference side never logged
    assert h2h_report.loss_gap(_run(curves)) is None


def test_mean_ci():
    m, ci = h2h_report.mean_ci([0.5, 0.7])
    assert m == pytest.approx(0.6)
    assert ci > 0
    m1, ci1 = h2h_report.mean_ci([0.6])
    assert (m1, ci1) == (0.6, 0.0)


def test_full_campaign_report(tmp_path):
    docs = str(tmp_path)
    base = [(1.0, 1.3, 0.5, 0.5)] * 6
    _write(docs, "s42_step", _run(base, imported=0.71))
    _write(docs, "s42_epoch", _run([(1.0, 1.1, 0.5, 0.5)] * 6))
    _write(docs, "s42_epoch_refinit", _run([(1.0, 1.05, 0.5, 0.5)] * 6))
    _write(docs, "s42_controlled", _run([(1.0, 1.01, 0.5, 0.5)] * 6))
    for seed in (1, 2, 3):
        _write(docs, f"seed{seed}", _run(base, seed=seed,
                                         best=(0.70 + seed / 100, 0.72)))
    out = h2h_report.main(docs=docs)
    text = open(out).read()
    # the controlled ladder, the curve table, and the seed spread all render.
    # The step artifact records no controls.init_from_ref, so the row must be
    # labeled own-init and the "init held identical" sentence suppressed
    # (ADVICE r4).
    assert "| step cosine (own init) |" in text
    assert "With init held identical" not in text
    assert "+0.3000" in text          # step-schedule gap
    assert "+0.0100" in text          # fully controlled gap
    assert "## Seed-42 learning curves" in text
    assert "3 seeds per side" in text
    assert "Cross-import check" in text
    assert "seed-42" in text          # cross-import names the actual seed


def test_step_row_label_with_identical_init(tmp_path):
    # when the step run DID use --init-from-ref (as the real campaign did),
    # the row says so and the schedule-flip sentence is allowed
    docs = str(tmp_path)
    step = _run([(1.0, 1.3, 0.5, 0.5)] * 6)
    step["controls"] = {"init_from_ref": True}
    refinit = _run([(1.0, 1.05, 0.5, 0.5)] * 6)
    _write(docs, "s42_step", step)
    _write(docs, "s42_epoch_refinit", refinit)
    out = h2h_report.main(docs=docs)
    text = open(out).read()
    assert "| step cosine + identical init |" in text
    assert "With init held identical" in text


def test_partial_campaign_report(tmp_path):
    # only the seed spread landed (every controlled step failed)
    docs = str(tmp_path)
    for seed in (1, 2):
        _write(docs, f"seed{seed}", _run([(1.0, 1.2, 0.5, 0.5)] * 4,
                                         seed=seed))
    out = h2h_report.main(docs=docs)
    text = open(out).read()
    assert "Seed spread" in text
    assert "controlled ladder" not in text
    assert "Cross-import" not in text


def test_empty_campaign_still_writes_header(tmp_path):
    out = h2h_report.main(docs=str(tmp_path))
    assert "Head-to-head" in open(out).read()
