"""bench.py smoke: the driver runs it unattended at every round end, so
its whole flow (dispatch sweep -> host-fed + device-resident arms ->
headline pick -> batch sweep -> ONE JSON line) must execute on a tiny
config and emit a parseable result.  Real numbers come from the TPU;
this pins the plumbing."""

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
    monkeypatch.setattr(bench, "DISPATCH_SWEEP", (1, 2))
    monkeypatch.setattr(bench, "BATCH_SWEEP", (8,))
    monkeypatch.setattr(bench, "N_WINDOWS", 2)
    monkeypatch.setattr(bench, "STEPS_PER_WINDOW", 4)
    monkeypatch.setattr(bench, "WARMUP_STEPS", 1)
    return bench


def test_bench_main_emits_one_json_line(tiny_bench, capsys):
    tiny_bench.main()
    lines = [l for l in capsys.readouterr().out.splitlines()
             if l.startswith("{")]
    assert len(lines) == 1, "exactly ONE JSON line for the driver"
    r = json.loads(lines[0])
    assert r["value"] > 0 and r["unit"] == "images/sec"
    assert r["data_placement"] in ("host", "device")
    assert r["host_fed"]["images_per_sec"] > 0
    assert r["device_resident"]["images_per_sec"] > 0
    # headline is the better arm at the [SPEC] point
    best = max(r["host_fed"]["images_per_sec"],
               r["device_resident"]["images_per_sec"])
    assert r["value"] == best
    assert set(r["dispatch_sweep"]) == {"1", "2"}
    assert set(r["batch_sweep"]) == {"8"}


def test_device_resident_arm_standalone(tiny_bench):
    out = tiny_bench._measure_device_resident(8, 2, pool=64)
    assert out["images_per_sec"] > 0
    assert len(out["windows"]) == 2
    assert out["pool_samples"] == 64
