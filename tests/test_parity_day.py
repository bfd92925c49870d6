"""tools/parity_day.py — the executable asset-day protocol (VERDICT r2
item 7): blocked mode explains exactly what's missing today, and the
happy path (synthetic Inception weights + fixture datasets + a
populated reference dir) executes every check end-to-end."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

import parity_day  # noqa: E402

from tests.test_real_loaders import _write_cifar10  # noqa: E402


def _statuses(report):
    return {c: s for c, s, _ in report}


def test_blocked_mode_names_every_missing_asset(tmp_path):
    ref = tmp_path / "empty_ref"
    ref.mkdir()
    report = parity_day.run(str(ref), str(tmp_path / "no_data"))
    st = _statuses(report)
    assert st["reference-mount"] == "BLOCKED"
    assert st["inception-weights"] == "BLOCKED"
    assert st["dataset-cifar10"] == "BLOCKED"
    assert st["real-fid-kid"] == "BLOCKED"
    # every blocked line says what to do, not just that it failed
    for c, s, d in report:
        if s == "BLOCKED":
            assert len(d) > 20, (c, d)


def test_happy_path_runs_every_check(tmp_path):
    """Synthetic weights + fixture CIFAR + populated reference tree:
    all checks execute (the exact code path asset day will use)."""
    from smmdax.eval.inception import random_state_dict

    data_dir = str(tmp_path / "data")
    os.makedirs(data_dir)
    _write_cifar10(data_dir)
    np.savez(os.path.join(data_dir, "inception_v3.npz"),
             **random_state_dict(seed=5, include_aux=False))

    ref = tmp_path / "reference"
    (ref / "core").mkdir(parents=True)
    (ref / "main.py").write_text("# reference stub\n")
    (ref / "core" / "mmd.py").write_text("# reference stub\n")

    samples = os.path.join(str(tmp_path), "gen.npy")
    rng = np.random.default_rng(0)
    np.save(samples, rng.uniform(-1, 1, (48, 32, 32, 3)).astype(np.float32))

    report = parity_day.run(str(ref), data_dir, samples_path=samples,
                            score_n=48)
    st = _statuses(report)
    assert st["reference-mount"] == "PASS"
    assert st["reference-inventory"] == "INFO"
    assert st["reference-loss-oracle"] == "INFO"
    assert st["inception-weights"] == "PASS"
    assert st["dataset-cifar10"] == "PASS"
    assert st["real-fid-kid-selfcheck"] == "PASS"
    assert st["model-fid-kid"] == "PASS"
    # the self-check detail carries actual numbers
    detail = dict((c, d) for c, _, d in report)["real-fid-kid-selfcheck"]
    assert "FID" in detail and "KID" in detail


def test_cli_prints_report(tmp_path, capsys):
    ref = tmp_path / "ref"
    ref.mkdir()
    rc = parity_day.main(["--reference", str(ref),
                          "--data_dir", str(tmp_path / "nope")])
    assert rc == 0
    out = capsys.readouterr().out
    assert "parity-day report" in out and "BLOCKED" in out
