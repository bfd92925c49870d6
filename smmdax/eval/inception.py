"""JAX-native Inception-v3 (pool3 features + logits) for FID/KID/IS.

The reference's scoring pipeline (SURVEY.md component #10, call stack
SS3.4) runs a frozen Inception network: pool3 (2048-d) features feed FID
and KID; the 1000-way logits feed the Inception Score.  The reference
downloads a frozen TF graph at run time; this environment has no egress
(SURVEY.md SS7 hard-part #5), so here the *network* is implemented
natively in JAX (it runs jitted on the training TPU, no torch in the
loop) and only the *weights* remain an asset: a torchvision-format
``inception_v3`` state dict (``.pt``/``.pth`` via torch.load, or an
``.npz`` of the same tensors) dropped at ``<data_dir>/inception_v3.pt``.

Architecture: Szegedy et al., "Rethinking the Inception Architecture"
(arXiv:1512.00567), in the exact torchvision ``inception_v3`` layout —
module names, branch concat order, padding/stride choices, BN eps 1e-3,
and average pooling that counts padded zeros (torch ``F.avg_pool2d``
default) — so a torchvision state dict maps 1:1.  BatchNorm is folded
into the convolutions at load time (inference-only network), which is
exact and saves an elementwise pass per conv on TPU.

Validation without downloadable weights: ``tests/test_inception.py``
builds a *random* torchvision-schema state dict, loads it both into an
independently written torch oracle (strict key matching) and through
:func:`convert_torchvision_state_dict` into this network, and asserts
pool3/logits agreement — so the converter and forward pass are fully
exercised offline, today.
"""

from __future__ import annotations

import os
from typing import Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

BN_EPS = 1e-3

# --------------------------------------------------------------------------
# Conv spec table: name -> (in_ch, out_ch, (kh, kw), (sh, sw), (ph, pw)).
# Names are the torchvision module paths of every BasicConv2d, which the
# weight converter and the synthetic-state-dict test fixture both consume.
# --------------------------------------------------------------------------


def _inception_a(prefix: str, c_in: int, c_pool: int) -> Dict[str, tuple]:
    return {
        f"{prefix}.branch1x1": (c_in, 64, (1, 1), (1, 1), (0, 0)),
        f"{prefix}.branch5x5_1": (c_in, 48, (1, 1), (1, 1), (0, 0)),
        f"{prefix}.branch5x5_2": (48, 64, (5, 5), (1, 1), (2, 2)),
        f"{prefix}.branch3x3dbl_1": (c_in, 64, (1, 1), (1, 1), (0, 0)),
        f"{prefix}.branch3x3dbl_2": (64, 96, (3, 3), (1, 1), (1, 1)),
        f"{prefix}.branch3x3dbl_3": (96, 96, (3, 3), (1, 1), (1, 1)),
        f"{prefix}.branch_pool": (c_in, c_pool, (1, 1), (1, 1), (0, 0)),
    }


def _inception_c(prefix: str, c7: int) -> Dict[str, tuple]:
    return {
        f"{prefix}.branch1x1": (768, 192, (1, 1), (1, 1), (0, 0)),
        f"{prefix}.branch7x7_1": (768, c7, (1, 1), (1, 1), (0, 0)),
        f"{prefix}.branch7x7_2": (c7, c7, (1, 7), (1, 1), (0, 3)),
        f"{prefix}.branch7x7_3": (c7, 192, (7, 1), (1, 1), (3, 0)),
        f"{prefix}.branch7x7dbl_1": (768, c7, (1, 1), (1, 1), (0, 0)),
        f"{prefix}.branch7x7dbl_2": (c7, c7, (7, 1), (1, 1), (3, 0)),
        f"{prefix}.branch7x7dbl_3": (c7, c7, (1, 7), (1, 1), (0, 3)),
        f"{prefix}.branch7x7dbl_4": (c7, c7, (7, 1), (1, 1), (3, 0)),
        f"{prefix}.branch7x7dbl_5": (c7, 192, (1, 7), (1, 1), (0, 3)),
        f"{prefix}.branch_pool": (768, 192, (1, 1), (1, 1), (0, 0)),
    }


def _inception_e(prefix: str, c_in: int) -> Dict[str, tuple]:
    return {
        f"{prefix}.branch1x1": (c_in, 320, (1, 1), (1, 1), (0, 0)),
        f"{prefix}.branch3x3_1": (c_in, 384, (1, 1), (1, 1), (0, 0)),
        f"{prefix}.branch3x3_2a": (384, 384, (1, 3), (1, 1), (0, 1)),
        f"{prefix}.branch3x3_2b": (384, 384, (3, 1), (1, 1), (1, 0)),
        f"{prefix}.branch3x3dbl_1": (c_in, 448, (1, 1), (1, 1), (0, 0)),
        f"{prefix}.branch3x3dbl_2": (448, 384, (3, 3), (1, 1), (1, 1)),
        f"{prefix}.branch3x3dbl_3a": (384, 384, (1, 3), (1, 1), (0, 1)),
        f"{prefix}.branch3x3dbl_3b": (384, 384, (3, 1), (1, 1), (1, 0)),
        f"{prefix}.branch_pool": (c_in, 192, (1, 1), (1, 1), (0, 0)),
    }


def conv_specs() -> Dict[str, tuple]:
    """Every BasicConv2d in torchvision inception_v3 (main tower)."""
    s: Dict[str, tuple] = {
        "Conv2d_1a_3x3": (3, 32, (3, 3), (2, 2), (0, 0)),
        "Conv2d_2a_3x3": (32, 32, (3, 3), (1, 1), (0, 0)),
        "Conv2d_2b_3x3": (32, 64, (3, 3), (1, 1), (1, 1)),
        "Conv2d_3b_1x1": (64, 80, (1, 1), (1, 1), (0, 0)),
        "Conv2d_4a_3x3": (80, 192, (3, 3), (1, 1), (0, 0)),
    }
    s.update(_inception_a("Mixed_5b", 192, 32))
    s.update(_inception_a("Mixed_5c", 256, 64))
    s.update(_inception_a("Mixed_5d", 288, 64))
    s.update({
        "Mixed_6a.branch3x3": (288, 384, (3, 3), (2, 2), (0, 0)),
        "Mixed_6a.branch3x3dbl_1": (288, 64, (1, 1), (1, 1), (0, 0)),
        "Mixed_6a.branch3x3dbl_2": (64, 96, (3, 3), (1, 1), (1, 1)),
        "Mixed_6a.branch3x3dbl_3": (96, 96, (3, 3), (2, 2), (0, 0)),
    })
    s.update(_inception_c("Mixed_6b", 128))
    s.update(_inception_c("Mixed_6c", 160))
    s.update(_inception_c("Mixed_6d", 160))
    s.update(_inception_c("Mixed_6e", 192))
    s.update({
        "Mixed_7a.branch3x3_1": (768, 192, (1, 1), (1, 1), (0, 0)),
        "Mixed_7a.branch3x3_2": (192, 320, (3, 3), (2, 2), (0, 0)),
        "Mixed_7a.branch7x7x3_1": (768, 192, (1, 1), (1, 1), (0, 0)),
        "Mixed_7a.branch7x7x3_2": (192, 192, (1, 7), (1, 1), (0, 3)),
        "Mixed_7a.branch7x7x3_3": (192, 192, (7, 1), (1, 1), (3, 0)),
        "Mixed_7a.branch7x7x3_4": (192, 192, (3, 3), (2, 2), (0, 0)),
    })
    s.update(_inception_e("Mixed_7b", 1280))
    s.update(_inception_e("Mixed_7c", 2048))
    return s


_SPECS = conv_specs()


# --------------------------------------------------------------------------
# Weight conversion: torchvision state dict -> folded-BN JAX params.
# --------------------------------------------------------------------------


def convert_torchvision_state_dict(state: Mapping[str, np.ndarray]) -> dict:
    """Fold each BasicConv2d's BatchNorm into its conv and lay out HWIO.

    ``state`` maps torchvision key -> array (torch tensors, numpy arrays
    and npz entries all work).  AuxLogits.* keys are ignored (train-time
    head; pool3/logits don't touch it).  Returns a pytree
    ``{name: {"w": HWIO f32, "b": (out,) f32}, "fc": {"w": (2048,1000),
    "b": (1000,)}}``.
    """
    def arr(key: str) -> np.ndarray:
        v = state[key]
        np_v = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        return np_v.astype(np.float32)

    params: dict = {}
    for name, (c_in, c_out, k, _, _) in _SPECS.items():
        w = arr(f"{name}.conv.weight")              # OIHW
        if w.shape != (c_out, c_in, *k):
            raise ValueError(f"{name}: expected {(c_out, c_in, *k)}, got {w.shape}")
        gamma = arr(f"{name}.bn.weight")
        beta = arr(f"{name}.bn.bias")
        mean = arr(f"{name}.bn.running_mean")
        var = arr(f"{name}.bn.running_var")
        scale = gamma / np.sqrt(var + BN_EPS)
        params[name] = {
            "w": jnp.asarray((w * scale[:, None, None, None]).transpose(2, 3, 1, 0)),
            "b": jnp.asarray(beta - mean * scale),
        }
    fc_w = arr("fc.weight")                         # (n_classes, 2048):
    if fc_w.ndim != 2 or fc_w.shape[1] != 2048:     # 1000 (torchvision) or
        raise ValueError(f"fc.weight: bad shape {fc_w.shape}")  # 1008 (FID pb)
    params["fc"] = {"w": jnp.asarray(fc_w.T),
                    "b": jnp.asarray(arr("fc.bias"))}
    return params


def load_params(weights_path: str) -> dict:
    """Load Inception weights and convert to folded-BN JAX params.

    Accepts a torchvision inception_v3 state dict (.pt/.pth via torch,
    or .npz with the same key names) or a frozen TF GraphDef (.pb —
    the 2015 FID graph the reference's compute_scores.py downloads;
    parsed+matched structurally by smmdax.eval.tf_graph, no TF
    dependency)."""
    if weights_path.endswith(".pb"):
        from .tf_graph import convert_frozen_graph
        params, meta = convert_frozen_graph(weights_path, return_meta=True)
        # fid_semantics is auto-detected downstream from the fc width
        # (1008 = FID graph); cross-check that heuristic against the
        # graph's ACTUAL pooling so a mismatch fails loudly instead of
        # silently mis-pooling (InceptionV3.__init__ auto rule)
        fid_auto = int(params["fc"]["w"].shape[1]) == 1008
        pool_7c = meta.get("Mixed_7c_pool", "avg")
        if fid_auto != (pool_7c == "max"):
            raise ValueError(
                f"{weights_path}: graph has a {pool_7c} pool in its last "
                f"block but a {params['fc']['w'].shape[1]}-way fc — the "
                "fc-width fid_semantics auto-detection would apply the "
                "wrong pooling; construct InceptionV3/InceptionFeatures "
                f"with fid_semantics={pool_7c == 'max'} explicitly")
        if not fid_auto:
            # any frozen TF graph excludes padded cells from SAME avg
            # pools; fid_semantics=False reproduces torch's
            # count_include_pad=True instead (border-pixel deltas only)
            print(f"[smmdax.eval] {weights_path}: non-FID frozen graph; "
                  "TF avg-pool padding semantics differ at the borders "
                  "from the torchvision mode this will run in")
        return params
    if weights_path.endswith(".npz"):
        with np.load(weights_path) as z:
            state = {k: z[k] for k in z.files}
    else:
        import torch  # CPU-only deserialization; the forward pass is JAX
        state = torch.load(weights_path, map_location="cpu", weights_only=True)
        if hasattr(state, "state_dict"):
            state = state.state_dict()
    return convert_torchvision_state_dict(state)


# --------------------------------------------------------------------------
# Forward pass (NHWC, functional).
# --------------------------------------------------------------------------


def _conv(p: dict, name: str, x: Array) -> Array:
    _, _, _, stride, pad = _SPECS[name]
    y = jax.lax.conv_general_dilated(
        x, p[name]["w"].astype(x.dtype), window_strides=stride,
        padding=[(pad[0], pad[0]), (pad[1], pad[1])],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jax.nn.relu(y + p[name]["b"].astype(x.dtype))


def _maxpool3s2(x: Array) -> Array:
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 3, 3, 1), (1, 2, 2, 1), "VALID")


def _avgpool3s1p1(x: Array, count_include_pad: bool = True) -> Array:
    # torch F.avg_pool2d default count_include_pad=True: always divide
    # by 9, padded zeros included (matters at the borders).  The frozen
    # TF FID graph the reference lineage scored with EXCLUDES padding
    # (pytorch-fid's FIDInception patch) — fid_semantics selects that.
    s = jax.lax.reduce_window(x, jnp.zeros((), x.dtype), jax.lax.add,
                              (1, 3, 3, 1), (1, 1, 1, 1),
                              [(0, 0), (1, 1), (1, 1), (0, 0)])
    if not count_include_pad:
        ones = jnp.ones((1, x.shape[1], x.shape[2], 1), x.dtype)
        counts = jax.lax.reduce_window(ones, jnp.zeros((), x.dtype),
                                       jax.lax.add, (1, 3, 3, 1),
                                       (1, 1, 1, 1),
                                       [(0, 0), (1, 1), (1, 1), (0, 0)])
        return s / counts
    return s / jnp.asarray(9, x.dtype)


def _maxpool3s1p1(x: Array) -> Array:
    # the TF FID graph's Mixed_7c branch_pool is a MAX pool (pytorch-fid
    # FIDInceptionE_2 patch)
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 3, 3, 1), (1, 1, 1, 1),
                                 [(0, 0), (1, 1), (1, 1), (0, 0)])


def _block_a(p: dict, prefix: str, x: Array, fid: bool = False) -> Array:
    b1 = _conv(p, f"{prefix}.branch1x1", x)
    b5 = _conv(p, f"{prefix}.branch5x5_2", _conv(p, f"{prefix}.branch5x5_1", x))
    b3 = _conv(p, f"{prefix}.branch3x3dbl_3",
               _conv(p, f"{prefix}.branch3x3dbl_2",
                     _conv(p, f"{prefix}.branch3x3dbl_1", x)))
    bp = _conv(p, f"{prefix}.branch_pool",
               _avgpool3s1p1(x, count_include_pad=not fid))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _block_b(p: dict, x: Array) -> Array:          # Mixed_6a
    b3 = _conv(p, "Mixed_6a.branch3x3", x)
    bd = _conv(p, "Mixed_6a.branch3x3dbl_3",
               _conv(p, "Mixed_6a.branch3x3dbl_2",
                     _conv(p, "Mixed_6a.branch3x3dbl_1", x)))
    return jnp.concatenate([b3, bd, _maxpool3s2(x)], axis=-1)


def _block_c(p: dict, prefix: str, x: Array, fid: bool = False) -> Array:
    b1 = _conv(p, f"{prefix}.branch1x1", x)
    b7 = x
    for i in (1, 2, 3):
        b7 = _conv(p, f"{prefix}.branch7x7_{i}", b7)
    bd = x
    for i in (1, 2, 3, 4, 5):
        bd = _conv(p, f"{prefix}.branch7x7dbl_{i}", bd)
    bp = _conv(p, f"{prefix}.branch_pool",
               _avgpool3s1p1(x, count_include_pad=not fid))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _block_d(p: dict, x: Array) -> Array:          # Mixed_7a
    b3 = _conv(p, "Mixed_7a.branch3x3_2", _conv(p, "Mixed_7a.branch3x3_1", x))
    b7 = x
    for i in (1, 2, 3, 4):
        b7 = _conv(p, f"Mixed_7a.branch7x7x3_{i}", b7)
    return jnp.concatenate([b3, b7, _maxpool3s2(x)], axis=-1)


def _block_e(p: dict, prefix: str, x: Array, fid: bool = False,
             pool_max: bool = False) -> Array:
    b1 = _conv(p, f"{prefix}.branch1x1", x)
    b3 = _conv(p, f"{prefix}.branch3x3_1", x)
    b3 = jnp.concatenate([_conv(p, f"{prefix}.branch3x3_2a", b3),
                          _conv(p, f"{prefix}.branch3x3_2b", b3)], axis=-1)
    bd = _conv(p, f"{prefix}.branch3x3dbl_2",
               _conv(p, f"{prefix}.branch3x3dbl_1", x))
    bd = jnp.concatenate([_conv(p, f"{prefix}.branch3x3dbl_3a", bd),
                          _conv(p, f"{prefix}.branch3x3dbl_3b", bd)], axis=-1)
    pooled = (_maxpool3s1p1(x) if pool_max
              else _avgpool3s1p1(x, count_include_pad=not fid))
    bp = _conv(p, f"{prefix}.branch_pool", pooled)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def transform_input(x: Array) -> Array:
    """torchvision's transform_input=True remap (the pretrained builder
    forces it on): ImageNet mean/std-normalized channels -> the TF
    [-1, 1]-trained range the original weights expect."""
    ch = [x[..., 0] * (0.229 / 0.5) + (0.485 - 0.5) / 0.5,
          x[..., 1] * (0.224 / 0.5) + (0.456 - 0.5) / 0.5,
          x[..., 2] * (0.225 / 0.5) + (0.406 - 0.5) / 0.5]
    return jnp.stack(ch, axis=-1)


def forward(params: dict, x: Array, *,
            apply_transform_input: bool = True,
            fid_semantics: bool = False) -> Tuple[Array, Array]:
    """(N, 299, 299, 3) ImageNet-normalized NHWC -> (pool3, logits).

    pool3 is the 2048-d pre-fc global-average feature (FID/KID input);
    logits are the class scores (softmax -> Inception Score; 1000-way
    for torchvision ImageNet weights, 1008 for the frozen TF FID graph).

    ``fid_semantics``: reproduce the frozen TF graph the reference
    lineage (and every published FID/KID number) scored with — branch
    average pools exclude padding, and Mixed_7c's branch pool is a max
    pool (the pytorch-fid FIDInception patches).  Use with a
    pytorch-fid-format state dict for paper-comparable scores; leave
    off for torchvision ImageNet weights.
    """
    if apply_transform_input:
        x = transform_input(x)
    fid = fid_semantics
    for name in ("Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3"):
        x = _conv(params, name, x)
    x = _maxpool3s2(x)
    x = _conv(params, "Conv2d_4a_3x3", _conv(params, "Conv2d_3b_1x1", x))
    x = _maxpool3s2(x)
    for prefix in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
        x = _block_a(params, prefix, x, fid=fid)
    x = _block_b(params, x)
    for prefix in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        x = _block_c(params, prefix, x, fid=fid)
    x = _block_d(params, x)
    x = _block_e(params, "Mixed_7b", x, fid=fid)
    x = _block_e(params, "Mixed_7c", x, fid=fid, pool_max=fid)
    pool3 = jnp.mean(x, axis=(1, 2))                # adaptive avg pool (1,1)
    logits = pool3 @ params["fc"]["w"].astype(x.dtype) + params["fc"]["b"].astype(x.dtype)
    return pool3, logits


# ImageNet eval normalization (applied to [0,1] images before forward).
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def preprocess(images: Array, size: int = 299) -> Array:
    """[-1, 1] NHWC images of any resolution -> ImageNet-normalized
    299x299 (bilinear, half-pixel centers — torch interpolate
    align_corners=False semantics, which jax.image.resize 'bilinear'
    shares)."""
    x = (images + 1.0) * 0.5
    x = (x - IMAGENET_MEAN) / IMAGENET_STD
    if x.shape[1] != size or x.shape[2] != size:
        x = jax.image.resize(x, (x.shape[0], size, size, x.shape[3]),
                             method="bilinear", antialias=False)
    return x


class InceptionV3:
    """Batched jitted extractor: images in [-1,1] -> pool3 / probs.

    Used by smmdax.eval.features.JaxInceptionFeatures; kept separate so
    scoring scripts can also reach logits for the Inception Score.
    """

    def __init__(self, params: dict, batch: int = 64,
                 dtype: jnp.dtype = jnp.float32,
                 fid_semantics: Optional[bool] = None,
                 mesh: Optional["jax.sharding.Mesh"] = None):
        self.params = jax.tree.map(lambda a: jnp.asarray(a, dtype), params)
        self.batch = batch
        if fid_semantics is None:
            # auto: a 1008-way fc IS the frozen TF FID graph (pytorch-fid
            # weight port); torchvision ImageNet weights are 1000-way
            fid_semantics = int(params["fc"]["w"].shape[1]) == 1008
        self.fid_semantics = bool(fid_semantics)
        # optional data-parallel extraction: the net is batch-parallel,
        # so sharding each chunk's batch axis over the mesh lets GSPMD
        # partition the whole sweep (replicated params, zero cross-chip
        # traffic inside the network; math identical to single-device —
        # parity-tested on the 8-device CPU mesh)
        self._shard = None
        if mesh is not None and mesh.size > 1:
            from jax.sharding import NamedSharding, PartitionSpec
            self._shard = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))
            if batch % mesh.size:
                raise ValueError(
                    f"extraction batch {batch} must divide the "
                    f"{mesh.size}-device mesh for sharded eval")

        @jax.jit
        def _run(p, imgs):
            return forward(p, preprocess(imgs.astype(dtype)),
                           fid_semantics=self.fid_semantics)
        self._run = _run

    def _batched(self, images, fetch: bool = True):
        # Device arrays stay on device (the trainer feeds generator
        # output directly — no image round-trip over the host link;
        # only the (n, 2048)/(n, k) heads come back).  All chunks are
        # DISPATCHED before any result is fetched: a per-chunk fetch
        # would sync the host to each chunk and idle the device between
        # them — measured 925 img/s fetch-per-chunk vs 3.5k img/s for
        # the jitted step itself at B=256 on the tunneled TPU link.
        on_dev = isinstance(images, jax.Array)
        xp = jnp if on_dev else np
        pools, logits = [], []
        n = len(images)
        for i in range(0, n, self.batch):
            chunk = (images[i:i + self.batch] if on_dev
                     else np.asarray(images[i:i + self.batch], np.float32))
            keep = len(chunk)
            if keep < self.batch:           # pad to avoid a recompile
                pad = self.batch - keep
                chunk = xp.concatenate(
                    [chunk, xp.zeros_like(chunk[:1]).repeat(pad, 0)])
            chunk = jnp.asarray(chunk, jnp.float32)
            if self._shard is not None:     # batch axis over the mesh
                chunk = jax.device_put(chunk, self._shard)
            p, l = self._run(self.params, chunk)
            pools.append(p[:keep])          # lazy: dispatch-only
            logits.append(l[:keep])
        if not fetch:
            return (jnp.concatenate(pools).astype(jnp.float32),
                    jnp.concatenate(logits).astype(jnp.float32))
        return (np.concatenate([np.asarray(p) for p in pools]).astype(np.float32),
                np.concatenate([np.asarray(l) for l in logits]).astype(np.float32))

    @staticmethod
    def _softmax(logits) -> np.ndarray:
        # numerically-shifted softmax; device logits stay on device
        # (f32 — shifted exp/sum has no cancellation hazard)
        if isinstance(logits, jax.Array):
            return jax.nn.softmax(logits.astype(jnp.float32), axis=1)
        z = logits.astype(np.float64)
        z -= z.max(axis=1, keepdims=True)
        e = np.exp(z)
        return (e / e.sum(axis=1, keepdims=True)).astype(np.float32)

    def pool3(self, images, fetch: bool = True):
        return self._batched(images, fetch=fetch)[0]

    def probs(self, images, fetch: bool = True):
        return self._softmax(self._batched(images, fetch=fetch)[1])

    def pool3_and_probs(self, images, fetch: bool = True):
        """Both heads from ONE forward sweep — scoring wants pool3 (for
        FID/KID) and probs (for IS) of the same samples; running the
        network twice would double interval cost.  ``fetch=False``
        keeps both heads on device (features feed device-side scoring
        directly; nothing O(N) crosses the host link)."""
        pool, logits = self._batched(images, fetch=fetch)
        return pool, self._softmax(logits)


def random_state_dict(seed: int = 0, include_aux: bool = True,
                      num_classes: int = 1000) -> Dict[str, np.ndarray]:
    """Synthetic torchvision-schema state dict (random weights) for
    offline golden tests — exactly the keys/shapes torchvision's
    ``inception_v3(aux_logits=True)`` produces."""
    rng = np.random.default_rng(seed)

    def conv_bn(name: str, c_in: int, c_out: int, k: Tuple[int, int]) -> dict:
        # fan-in-scaled weights keep activations O(1) through all 94
        # convs, so golden-test tolerances measure real numerics, not
        # f32 noise on astronomically amplified values
        std = np.sqrt(2.0 / (c_in * k[0] * k[1]))
        return {
            f"{name}.conv.weight": rng.normal(0, std, (c_out, c_in, *k)).astype(np.float32),
            f"{name}.bn.weight": rng.uniform(0.5, 1.5, c_out).astype(np.float32),
            f"{name}.bn.bias": rng.normal(0, 0.1, c_out).astype(np.float32),
            f"{name}.bn.running_mean": rng.normal(0, 0.1, c_out).astype(np.float32),
            f"{name}.bn.running_var": rng.uniform(0.5, 1.5, c_out).astype(np.float32),
            f"{name}.bn.num_batches_tracked": np.asarray(0, np.int64),
        }

    state: Dict[str, np.ndarray] = {}
    for name, (c_in, c_out, k, _, _) in _SPECS.items():
        state.update(conv_bn(name, c_in, c_out, k))
    if include_aux:
        state.update(conv_bn("AuxLogits.conv0", 768, 128, (1, 1)))
        state.update(conv_bn("AuxLogits.conv1", 128, 768, (5, 5)))
        state["AuxLogits.fc.weight"] = rng.normal(0, 0.01, (num_classes, 768)).astype(np.float32)
        state["AuxLogits.fc.bias"] = np.zeros(num_classes, np.float32)
    state["fc.weight"] = rng.normal(0, 0.02, (num_classes, 2048)).astype(np.float32)
    state["fc.bias"] = np.zeros(num_classes, np.float32)
    return state
