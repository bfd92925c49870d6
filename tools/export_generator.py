"""Export a trained generator as a serialized StableHLO artifact.

The deployment story for the serving path (reference call stack §3.3:
load ckpt -> batched G(z)): `jax.export` lowers the eval-mode
generator apply to StableHLO with the weights BAKED IN as constants,
producing one self-contained binary artifact that any PJRT runtime of
the same platform family can load and call WITHOUT this repo, flax, or
the checkpoint — the compiled-artifact analog of a TF1 frozen GraphDef
(which is exactly how the reference lineage shipped its Inception
scorer).

Usage:
  python tools/export_generator.py --checkpoint_dir ckpt/... --out gen.shlo \
      [--batch 512] [--use_best] [--platforms tpu,cpu] \
      [--model sn-smmd --architecture resnet --output_size 32 ...]

The artifact's calling convention is ``call(z) -> images`` with
``z: (batch, z_dim) float32`` and images in [-1, 1]; metadata
(shapes, config provenance) is written alongside as ``<out>.json``.

Round-trip loading needs only jax:
  from jax import export
  gen = export.deserialize(open("gen.shlo", "rb").read())
  imgs = gen.call(z)
"""

from __future__ import annotations

import json
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def export_generator(cfg, state, batch: int,
                     platforms=None) -> bytes:
    """Serialize the eval-mode generator apply (weights as constants).

    ``platforms``: lowering platforms (e.g. ("tpu", "cpu")); default is
    the current backend.  Multi-platform artifacts run on any listed
    runtime at a small artifact-size cost.
    """
    from jax import export as jexport

    from smmdax.nn import build_models
    from smmdax.train import eval_g_params, eval_g_stats
    gen, _ = build_models(cfg)
    # serve the EMA shadow pair when the run tracked one (ema_decay > 0)
    g_params = jax.device_get(eval_g_params(state))
    g_stats = jax.device_get(eval_g_stats(state))

    def serve(z):
        return gen.apply({"params": g_params, "batch_stats": g_stats},
                         z, train=False)

    z_spec = jax.ShapeDtypeStruct((batch, cfg.z_dim), jnp.float32)
    kwargs = {}
    if platforms:
        kwargs["platforms"] = tuple(platforms)
    exp = jexport.export(jax.jit(serve), **kwargs)(z_spec)
    return exp.serialize()


def load_generator(path: str):
    """Deserialize an exported generator; returns the jax.export
    object (``.call(z)`` runs it)."""
    from jax import export as jexport
    with open(path, "rb") as f:
        return jexport.deserialize(f.read())


def main(argv=None) -> None:
    from smmdax.checkpoint import CheckpointManager
    from smmdax.configs import build_argparser, config_from_namespace
    from smmdax.train import create_state

    ap = build_argparser()          # the full training flag surface
    ap.add_argument("--out", required=True)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--use_best", action="store_true",
                    help="export the scheduler's best snapshot instead "
                         "of the latest checkpoint")
    ap.add_argument("--platforms", default="",
                    help="comma list, e.g. tpu,cpu (default: current backend)")
    ap.add_argument("--allow_untrained", action="store_true",
                    help="export from random init when no checkpoint "
                         "directory exists (smoke/CI use only)")
    args = ap.parse_args(argv)
    cfg = config_from_namespace(args)

    state = create_state(cfg, jax.random.PRNGKey(cfg.random_seed))
    step = None
    # the Trainer nests runs as checkpoint_dir/run_name(); accept either
    # the parent (same flags as the training run) or the run dir itself
    ckpt_dir = os.path.join(cfg.checkpoint_dir, cfg.run_name())
    if not os.path.isdir(ckpt_dir):
        ckpt_dir = cfg.checkpoint_dir
    if cfg.checkpoint_dir and os.path.isdir(ckpt_dir):
        mgr = CheckpointManager(ckpt_dir)
        restored = (mgr.restore_best(state) if args.use_best
                    else mgr.restore(state))
        if restored is not None:
            state = restored
            step = int(state.step)
            print(f"[export] restored "
                  f"{'best' if args.use_best else 'latest'} checkpoint "
                  f"at step {step}")
        else:
            raise SystemExit(
                f"[export] no checkpoint under {cfg.checkpoint_dir!r} "
                "(pass a trained run's --checkpoint_dir)")
    elif args.allow_untrained:
        print("[export] NOTE: --allow_untrained — exporting an "
              "UNTRAINED generator (smoke/CI use)")
    else:
        # a typo'd / unmounted path must never silently become a
        # valid-looking artifact built from random weights
        raise SystemExit(
            f"[export] checkpoint directory not found: "
            f"{cfg.checkpoint_dir!r} (nor a {cfg.run_name()!r} run dir "
            "under it); pass a trained run's --checkpoint_dir, or "
            "--allow_untrained for a smoke export")

    platforms = [p for p in args.platforms.split(",") if p]
    blob = export_generator(cfg, state, args.batch, platforms or None)
    with open(args.out, "wb") as f:
        f.write(blob)
    meta = {"batch": args.batch, "z_dim": cfg.z_dim,
            "image_shape": list(cfg.image_shape), "step": step,
            "model": cfg.model, "architecture": cfg.architecture,
            "output_size": cfg.output_size,
            "platforms": platforms or [jax.default_backend()]}
    with open(args.out + ".json", "w") as f:
        json.dump(meta, f, indent=1)
    print(f"[export] wrote {args.out} ({len(blob) / 1e6:.2f} MB) + .json")


if __name__ == "__main__":
    main()
