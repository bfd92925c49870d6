"""smmdax CLI — mirrors the reference's main.py flag surface
(SURVEY.md component #1: ~40 tf.app.flags; same names, same defaults
where the spec pins them).

  python main.py --is_train true  --dataset cifar10 --architecture resnet \
                 --model sn-smmd --kernel rq ...
  python main.py --is_train false --visualize true ...   # sample from ckpt
"""

from __future__ import annotations

import os
import sys


def main(argv=None) -> None:
    from smmdax.configs import config_from_args
    cfg = config_from_args(argv)

    if cfg.is_train:
        from smmdax.trainer import train
        train(cfg)
        return

    # sampling / visualization path (reference §3.3)
    import jax
    import numpy as np

    from smmdax.checkpoint import CheckpointManager
    from smmdax.train import create_state, sample
    from smmdax.utils import save_images

    state = create_state(cfg, jax.random.PRNGKey(cfg.random_seed))
    ckpt = CheckpointManager(os.path.join(cfg.checkpoint_dir, cfg.run_name()))
    restored = ckpt.restore(state)
    if restored is None:
        print(f"[smmdax] no checkpoint under {cfg.checkpoint_dir}; "
              "sampling from random init")
    else:
        state = restored

    n = 64 if cfg.visualize else min(cfg.no_of_samples, 1024)
    imgs = np.asarray(sample(cfg, state, jax.random.PRNGKey(cfg.random_seed), n))
    out = os.path.join(cfg.sample_dir, cfg.run_name())
    os.makedirs(out, exist_ok=True)
    if cfg.dataset == "gaussian_mix":
        np.save(os.path.join(out, "samples.npy"), imgs)
        print(f"[smmdax] wrote {imgs.shape} samples to {out}/samples.npy")
    else:
        save_images(imgs[:64], os.path.join(out, "samples.png"))
        np.save(os.path.join(out, "samples.npy"), imgs)
        print(f"[smmdax] wrote {n} samples to {out}")
        if cfg.visualize:
            # latent interpolation grid (the reference lineage's
            # visualize() option): each row walks z linearly between two
            # endpoints — a qualitative check that the generator's
            # latent space is smooth, not memorized
            from smmdax.train import interpolate
            grid = np.asarray(interpolate(
                cfg, state, jax.random.PRNGKey(cfg.random_seed + 1),
                rows=8, cols=8))
            save_images(grid, os.path.join(out, "interpolation.png"), nrow=8)
            print(f"[smmdax] wrote latent interpolation grid to {out}")

    if cfg.compute_scores:
        from smmdax.eval import (fid_from_features, get_feature_extractor,
                                 inception_score, kid_from_features)
        from smmdax.data import make_dataset
        from smmdax.eval.features import extract_with_probs
        extractor = get_feature_extractor(cfg.data_dir)
        source = make_dataset(cfg)
        real = source.batch(min(cfg.no_of_samples, 5000))
        # on an accelerator the features stay device-resident end to
        # end (FID stats / KID sweep / IS consume them in place)
        from smmdax.eval import extract_features, use_device_scoring
        fetch = not use_device_scoring()
        fr = extract_features(extractor, real, fetch=fetch)
        ff, probs = extract_with_probs(extractor, imgs, fetch=fetch)
        fid = fid_from_features(fr, ff)
        kid, kid_std = kid_from_features(fr, ff,
                                         subset_size=min(1000, len(ff)))
        line = (f"[smmdax] FID={fid:.3f} KID={kid:.5f} (+-{kid_std:.5f}) "
                f"[extractor={extractor.name}]")
        if probs is not None:
            is_mean, is_std = inception_score(probs)
            line += f" IS={is_mean:.3f} (+-{is_std:.3f})"
        print(line)


if __name__ == "__main__":
    main()
