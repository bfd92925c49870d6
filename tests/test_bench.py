"""bench.py smoke: the driver runs it unattended at every round end
under a hard timeout, so the whole flow (required device-resident
headline arm FIRST -> budget-gated optional arms -> progressive JSON
emissions) must execute on a tiny config and emit parseable results.
Real numbers come from the TPU; this pins the plumbing.

Round-4 contract (VERDICT r3 item 1): the FIRST JSON line printed is
already a complete headline (value, vs_baseline, placement), and every
later JSON line repeats the same headline with fields appended — so a
driver parsing either the first or the last JSON line gets a complete
result, and a mid-run kill still leaves evidence on the pipe.
"""

import json

import pytest


@pytest.fixture()
def tiny_bench(monkeypatch):
    import bench
    from smmdax.configs import Config

    def _tiny(batch_size: int = 8, k: int = 1):
        return Config(model="sn-smmd", kernel="rq", architecture="dcgan",
                      dataset="synthetic", output_size=32,
                      batch_size=batch_size, real_batch_size=batch_size,
                      gf_dim=8, df_dim=8, dof_dim=4, z_dim=8,
                      dsteps=1, gsteps=1, random_seed=0,
                      steps_per_dispatch=k)

    monkeypatch.setattr(bench, "_flagship_cfg", _tiny)
    monkeypatch.setattr(bench, "HEADLINE_K", 2)
    monkeypatch.setattr(bench, "HOST_K", 2)
    monkeypatch.setattr(bench, "HEADLINE_BATCH", 8)
    monkeypatch.setattr(bench, "POOL_SAMPLES", 64)
    monkeypatch.setattr(bench, "SAMPLING_BATCH", 8)
    monkeypatch.setattr(bench, "DISPATCH_SWEEP", (1,))
    monkeypatch.setattr(bench, "BATCH_SWEEP", (8,))
    monkeypatch.setattr(bench, "N_WINDOWS", 2)
    monkeypatch.setattr(bench, "STEPS_PER_WINDOW", 4)
    monkeypatch.setattr(bench, "HEADLINE_WINDOWS", 2)
    monkeypatch.setattr(bench, "HEADLINE_STEPS_PER_WINDOW", 4)
    monkeypatch.setattr(bench, "WARMUP_STEPS", 1)
    # real wall-clock on a loaded shared core can exceed the default
    # 22-min budget (CLAUDE.md: ~3x slowdown when a TPU run shares the
    # host); pin the budget so "nothing skipped" is deterministic
    monkeypatch.setattr(bench, "BUDGET_S", 10_000_000.0)
    return bench


def _json_lines(out: str):
    """Parse every JSON line in captured output (shared with
    tests/test_bench_signals.py; stripped because the signal-time
    ``_bail`` write prefixes a newline to own its line)."""
    return [json.loads(l) for l in out.splitlines()
            if l.strip().startswith("{")]


def test_bench_main_emits_progressive_json(tiny_bench, capsys):
    tiny_bench.main()
    lines = _json_lines(capsys.readouterr().out)
    assert len(lines) >= 2, "headline line + at least one enriched line"

    first, last = lines[0], lines[-1]
    # the FIRST line is already a complete parseable headline
    assert first["value"] > 0 and first["unit"] == "images/sec"
    assert first["vs_baseline"] > 0
    assert first["data_placement"] == "device"
    assert first["steps_per_dispatch"] == 2
    # the headline value never changes across emissions
    assert all(l["value"] == first["value"] for l in lines)

    # the LAST line carries every optional arm (nothing skipped on the
    # tiny config: the 22-min default budget dwarfs the CPU runtime)
    assert last["skipped_arms"] == []
    assert last["host_fed"]["images_per_sec"] > 0
    assert last["device_resident"]["images_per_sec"] > 0
    assert last["sampling"]["images_per_sec"] > 0
    assert set(last["batch_sweep"]) == {"8"}
    # the sweep includes the headline K alongside the swept points
    assert set(last["dispatch_sweep"]) == {"1", "2"}
    assert last["total_bench_time_s"] > 0


def test_bench_budget_gate_skips_arms(tiny_bench, capsys, monkeypatch):
    """With a zero budget every optional arm is skipped, yet the
    required headline still lands (the driver can always parse it)."""
    monkeypatch.setattr(tiny_bench, "BUDGET_S", 0.0)
    tiny_bench.main()
    lines = _json_lines(capsys.readouterr().out)
    assert lines, "headline must be emitted even with zero budget"
    last = lines[-1]
    assert last["value"] > 0
    assert "host_fed" not in last and "sampling" not in last
    skipped = " ".join(last["skipped_arms"])
    assert "sampling" in skipped and "host_fed" in skipped


def test_device_resident_arm_standalone(tiny_bench):
    out = tiny_bench._measure_device_resident(8, 2, pool=64)
    assert out["images_per_sec"] > 0
    assert len(out["windows"]) == 2
    assert out["pool_samples"] == 64


def test_sampling_arm_reports_mfu_fields(tiny_bench):
    out = tiny_bench._measure_sampling(8, windows=2)
    assert out["images_per_sec"] > 0
    # generator FLOPs oracle works on CPU -> mfu only when the device
    # kind has a known peak; tflops_per_sec requires both
    assert "windows" in out and len(out["windows"]) == 2
