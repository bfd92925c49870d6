"""Asset-day parity protocol, executable (VERDICT r2 item 7).

This environment has no network egress and an EMPTY /root/reference
mount (SURVEY.md provenance warning), so true reference parity — real
Inception FID/KID and loss values vs the reference's core/mmd.py — is
blocked on assets that may appear later.  This tool makes that day one
command instead of an afternoon of archaeology:

    python tools/parity_day.py [--reference /root/reference]
                               [--data_dir ./data] [--samples S.npy]

It checks each parity prerequisite, runs every check whose assets
exist, and prints a PASS/BLOCKED report:

1. **Reference mount** — if populated, lists the tree, flags the files
   SURVEY.md §2 expects (core/mmd.py, core/model.py, main.py, ...) and
   reminds the operator of the VERIFY-ON-MOUNT protocol (re-derive the
   §2 inventory, swap the TF-parity oracle in tests/test_tf_parity.py
   for the real core/mmd.py, re-check flag names/constants).
2. **Inception weights** — locates data_dir/inception_v3.{pt,pth,npz}
   or a frozen TF GraphDef (classify_image_graph_def.pb — the asset the
   reference's compute_scores.py actually downloads; converted by the
   structural matcher in smmdax/eval/tf_graph.py), loads it through the
   JAX-native net, reports fc width and the auto-detected FID-graph
   semantics, and smoke-extracts features.
3. **Real datasets** — per [SPEC] dataset, whether real assets resolve
   (vs the synthetic fallback).
4. **Real-data FID/KID self-check** — with weights + a real dataset:
   FID/KID between two disjoint halves of the real data (a correct
   pipeline scores a small FID and a KID statistically near 0), and,
   with ``--samples`` (an .npy of generated images), the full
   model-vs-data FID/KID the paper tables report.

Every check is a function returning (status, detail) so the happy path
is unit-testable offline with synthetic weights + fixture datasets
(tests/test_parity_day.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import List, Tuple

# runnable as `python tools/parity_day.py` from anywhere
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# files SURVEY.md §2 expects in the reference tree (names are [R-MED]:
# presence is informative, absence of a particular name is not fatal)
EXPECTED_REFERENCE_FILES = (
    "main.py", "core/model.py", "core/mmd.py", "core/architecture.py",
    "core/resnet.py", "core/ops.py", "core/pipeline.py", "core/utils.py",
    "compute_scores.py",
)

Status = Tuple[str, str, str]          # (name, PASS|BLOCKED|INFO, detail)


def check_reference_mount(reference: str) -> List[Status]:
    out: List[Status] = []
    if not os.path.isdir(reference):
        out.append(("reference-mount", "BLOCKED",
                    f"{reference} does not exist"))
        return out
    tree = []
    for root, _dirs, files in os.walk(reference):
        for f in files:
            tree.append(os.path.relpath(os.path.join(root, f), reference))
    if not tree:
        out.append(("reference-mount", "BLOCKED",
                    f"{reference} is EMPTY (the round-1..3 state; see "
                    "SURVEY.md provenance warning). When populated, re-run "
                    "this tool FIRST thing in the session."))
        return out
    out.append(("reference-mount", "PASS",
                f"{len(tree)} files present — EXECUTE THE VERIFY-ON-MOUNT "
                "PROTOCOL (SURVEY.md §0.2): re-derive the §2 inventory, "
                "replace [R-*] claims with file:line citations, swap the "
                "tests/test_tf_parity.py oracle for the real core/mmd.py"))
    found = [f for f in EXPECTED_REFERENCE_FILES if f in set(tree)]
    missing = [f for f in EXPECTED_REFERENCE_FILES if f not in set(tree)]
    out.append(("reference-inventory", "INFO",
                f"expected files present: {found or 'none'}; "
                f"not found under expected names: {missing or 'none'} "
                "(names were reconstructed [R-MED] — check the actual tree)"))
    mmd_py = next((f for f in tree if f.endswith("mmd.py")), None)
    if mmd_py:
        out.append(("reference-loss-oracle", "INFO",
                    f"loss parity target: {mmd_py} — port its kernel "
                    "constants into tests/test_tf_parity.py and re-run "
                    "`pytest tests/test_tf_parity.py` (the current oracle "
                    "is our own TF re-expression of the paper math)"))
    return out


def check_inception_weights(data_dir: str) -> List[Status]:
    from smmdax.eval.features import find_inception_weights
    path = find_inception_weights(data_dir)
    if path is None:
        return [("inception-weights", "BLOCKED",
                 f"no inception_v3.(pt|pth|npz) or "
                 f"classify_image_graph_def.pb under {data_dir}; drop a "
                 "torchvision inception_v3 state dict OR the frozen TF "
                 "FID graph itself (the file the reference's "
                 "compute_scores.py downloads) there to enable real "
                 "FID/KID/IS")]
    out: List[Status] = []
    try:
        from smmdax.eval.features import InceptionFeatures
        import numpy as np
        ext = InceptionFeatures(path)
        probe = np.zeros((2, 64, 64, 3), np.float32)
        feats, probs = ext.features_and_probs(probe)
        net = ext._net
        out.append(("inception-weights", "PASS",
                    f"{path}: pool3 dim {feats.shape[1]}, fc width "
                    f"{probs.shape[1]}, fid_semantics="
                    f"{getattr(net, 'fid_semantics', 'n/a')}"))
    except Exception as e:
        out.append(("inception-weights", "BLOCKED",
                    f"{path} failed to load: {e!r}"))
    return out


def check_datasets(data_dir: str) -> List[Status]:
    from smmdax.configs import Config
    from smmdax.data import make_dataset
    from smmdax.data.synthetic import SyntheticImages
    out: List[Status] = []
    specs = {"cifar10": 32, "imagenet64": 64, "celeba": 160, "lsun": 64}
    for ds, size in specs.items():
        cfg = Config(dataset=ds, output_size=size, data_dir=data_dir)
        try:
            src = make_dataset(cfg)
        except (ValueError, FileNotFoundError) as e:
            out.append((f"dataset-{ds}", "BLOCKED", str(e)))
            continue
        if isinstance(src, SyntheticImages):
            out.append((f"dataset-{ds}", "BLOCKED",
                        f"no real {ds} assets under {data_dir} "
                        "(synthetic fallback would be used)"))
        else:
            out.append((f"dataset-{ds}", "PASS",
                        f"{type(src).__name__}, sample {src.sample_shape}"))
    return out


def real_data_score_check(data_dir: str, dataset: str = "cifar10",
                          n: int = 2000,
                          samples_path: str | None = None) -> List[Status]:
    """FID/KID with the real extractor on real data: two disjoint real
    halves (self-check: FID small, KID ~ 0 within noise), plus the
    model-vs-data score when --samples is given."""
    from smmdax.configs import Config
    from smmdax.data import make_dataset
    from smmdax.data.synthetic import SyntheticImages
    from smmdax.eval import fid_from_features, kid_from_features
    from smmdax.eval.features import (InceptionFeatures,
                                      find_inception_weights)
    wpath = find_inception_weights(data_dir)
    if wpath is None:
        return [("real-fid-kid", "BLOCKED", "no Inception weights (above)")]
    size = {"cifar10": 32, "imagenet64": 64, "celeba": 160,
            "lsun": 64}.get(dataset, 32)
    cfg = Config(dataset=dataset, output_size=size, data_dir=data_dir)
    src = make_dataset(cfg)
    if isinstance(src, SyntheticImages):
        return [("real-fid-kid", "BLOCKED",
                 f"no real {dataset} assets (above)")]
    import numpy as np
    ext = InceptionFeatures(wpath)
    a = ext(src.batch(n, key=101))
    b = ext(src.batch(n, key=202))
    fid = fid_from_features(a, b)
    kid, kid_std = kid_from_features(a, b, subset_size=min(1000, n),
                                     n_subsets=10)
    out = [("real-fid-kid-selfcheck", "PASS",
            f"{dataset} half-vs-half: FID {fid:.3f}, KID {kid:.6f} "
            f"+- {kid_std:.6f} (expect FID small, KID ~ 0: the pipeline "
            "is consistent end-to-end on real data)")]
    if samples_path:
        if not os.path.exists(samples_path):
            out.append(("model-fid-kid", "BLOCKED",
                        f"{samples_path} not found"))
            return out
        imgs = np.load(samples_path)
        if imgs.dtype == np.uint8:
            imgs = imgs.astype(np.float32) / 127.5 - 1.0
        f = ext(imgs)
        fid_m = fid_from_features(a, f)
        kid_m, kid_m_std = kid_from_features(a, f, subset_size=min(1000, n),
                                             n_subsets=10)
        out.append(("model-fid-kid", "PASS",
                    f"model vs {dataset}: FID {fid_m:.3f}, KID {kid_m:.6f} "
                    f"+- {kid_m_std:.6f} — compare against the paper table "
                    "(SURVEY.md §6) / reference runs"))
    return out


def run(reference: str, data_dir: str,
        samples_path: str | None = None,
        score_n: int = 2000) -> List[Status]:
    report: List[Status] = []
    report += check_reference_mount(reference)
    report += check_inception_weights(data_dir)
    report += check_datasets(data_dir)
    report += real_data_score_check(data_dir, samples_path=samples_path,
                                    n=score_n)
    return report


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--reference", default="/root/reference")
    p.add_argument("--data_dir", default="./data")
    p.add_argument("--samples", default=None,
                   help=".npy of generated images for model-vs-data scores")
    p.add_argument("--score_n", type=int, default=2000)
    p.add_argument("--json", action="store_true")
    a = p.parse_args(argv)
    report = run(a.reference, a.data_dir, samples_path=a.samples,
                 score_n=a.score_n)
    if a.json:
        print(json.dumps([{"check": c, "status": s, "detail": d}
                          for c, s, d in report]))
    else:
        width = max(len(c) for c, _, _ in report)
        print("=" * 72)
        print("smmdax parity-day report")
        print("=" * 72)
        for c, s, d in report:
            print(f"{c:<{width}}  [{s:^7}]  {d}")
        blocked = sum(1 for _, s, _ in report if s == "BLOCKED")
        passed = sum(1 for _, s, _ in report if s == "PASS")
        print("-" * 72)
        print(f"{passed} PASS, {blocked} BLOCKED "
              f"({'nothing further is runnable today' if blocked else 'all parity checks executed'})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
