"""Feature extractors for FID/KID/IS.

The reference uses a frozen Inception-v3 pool3 head downloaded at run
time (SURVEY.md #10).  This environment has no network egress
(SURVEY.md §7 hard-part #5), so the extractor is an interface:

* ``InceptionFeatures`` — asset-gated: loads a frozen Inception from
  ``weights_path`` if the user ships one (torch .pt state dict or npz);
  raises a clear error otherwise.
* ``RandomConvFeatures`` — a fixed-seed random convolutional projection
  network (jitted, runs on the training devices).  Random conv features
  are a well-studied stand-in for scoring self-consistency tests:
  FID/KID computed on them still rank distributions by distance, so
  training-loop scheduler logic and all score math can be exercised
  offline.  NOT comparable to published Inception-based numbers.
"""

from __future__ import annotations

import os
from typing import Optional, Protocol

import jax
import jax.numpy as jnp
import numpy as np

Array = np.ndarray


class FeatureExtractor(Protocol):
    name: str
    feature_dim: int

    def __call__(self, images: Array) -> Array:
        """(N, H, W, C) images in [-1, 1] -> (N, feature_dim) float32."""
        ...


class RandomConvFeatures:
    """Fixed random 4-layer conv net, global-mean-pooled.

    Deterministic across runs/processes (fixed PRNG seed), so scores are
    reproducible.  Runs jitted on the default device in batches.
    """

    name = "random_conv"

    def __init__(self, feature_dim: int = 256, width: int = 64,
                 seed: int = 1234, batch: int = 256, mesh=None):
        self.feature_dim = feature_dim
        self.width = width
        self.batch = batch
        self._params: Optional[list] = None
        self._seed = seed
        self._apply = jax.jit(self._forward)
        # optional data-parallel extraction (batch axis over the mesh;
        # see InceptionV3.__init__ for rationale + parity test)
        self._shard = None
        if mesh is not None and mesh.size > 1:
            from jax.sharding import NamedSharding, PartitionSpec
            self._shard = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))

    def _init(self, c_in: int):
        k = jax.random.PRNGKey(self._seed)
        ws = []
        chans = [c_in, self.width, self.width * 2, self.width * 4, self.feature_dim]
        for i in range(4):
            k, sub = jax.random.split(k)
            fan_in = 3 * 3 * chans[i]
            ws.append(jax.random.normal(sub, (3, 3, chans[i], chans[i + 1]))
                      * np.sqrt(2.0 / fan_in))
        self._params = ws

    def _forward(self, ws, x):
        for i, w in enumerate(ws):
            x = jax.lax.conv_general_dilated(
                x, w, window_strides=(2, 2), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            if i < 3:
                x = jax.nn.leaky_relu(x, 0.2)
        return jnp.mean(x, axis=(1, 2))

    def __call__(self, images, fetch: bool = True) -> Array:
        # device arrays stay on device (no host round-trip: the trainer
        # feeds generator output directly; only features come back) and
        # all chunks are dispatched before any result is fetched — a
        # per-chunk fetch idles the device between chunks (see
        # InceptionV3._batched for the measurement).  ``fetch=False``
        # returns the features as a device array for device-side
        # scoring (FID stats / KID Gram sweeps consume them in place).
        if not isinstance(images, jax.Array):
            images = np.asarray(images, np.float32)
        if self._params is None:
            self._init(images.shape[-1])

        def _chunk(i):
            c = jnp.asarray(images[i:i + self.batch], jnp.float32)
            if self._shard is not None and len(c) % self._shard.mesh.size == 0:
                c = jax.device_put(c, self._shard)  # ragged tail: unsharded
            return c

        outs = [self._apply(self._params, _chunk(i))
                for i in range(0, len(images), self.batch)]
        if not fetch:
            return jnp.concatenate(outs).astype(jnp.float32)
        return np.concatenate([np.asarray(o) for o in outs]).astype(np.float32)


class InceptionFeatures:
    """Frozen Inception-v3 pool3 features + class probs (asset-gated).

    The network itself is the JAX-native implementation in
    ``smmdax.eval.inception`` (jitted, runs on the training devices —
    golden-tested against an independent torch oracle in
    ``tests/test_inception.py``); only the *weights* are an asset: a
    torchvision ``inception_v3`` state dict (``.pt``/``.pth``) or an
    ``.npz`` of the same tensors at ``weights_path``.  Raises
    FileNotFoundError with instructions when the asset is absent.

    ``__call__`` returns pool3 (2048-d) features for FID/KID;
    ``probs`` returns 1000-way class probabilities for the Inception
    Score (SURVEY.md component #10).
    """

    name = "inception_v3"
    feature_dim = 2048

    def __init__(self, weights_path: str, batch: int = 64,
                 fid_semantics: Optional[bool] = None, mesh=None):
        if not os.path.exists(weights_path):
            raise FileNotFoundError(
                f"Inception weights not found at {weights_path}. This "
                "environment cannot download them; place a torchvision "
                "inception_v3 state_dict (.pt / equivalent .npz) or the "
                "frozen TF FID graph (classify_image_graph_def.pb — the "
                "reference pipeline's own asset) there to enable "
                "Inception-based FID/KID/IS (scores fall back to "
                "RandomConvFeatures otherwise).")
        from smmdax.eval.inception import InceptionV3, load_params
        # fid_semantics None = auto-detect: 1008-way fc means the frozen
        # TF FID graph port (padding-excluded pools, Mixed_7c max pool)
        self._net = InceptionV3(load_params(weights_path), batch=batch,
                                fid_semantics=fid_semantics, mesh=mesh)
        self.batch = batch

    @staticmethod
    def _coerce(images):
        # device arrays pass through (InceptionV3._batched keeps them
        # on device); host inputs are normalized to f32 numpy
        if isinstance(images, jax.Array):
            return images
        return np.asarray(images, np.float32)

    def __call__(self, images: Array, fetch: bool = True) -> Array:
        return self._net.pool3(self._coerce(images), fetch=fetch)

    def probs(self, images: Array, fetch: bool = True) -> Array:
        """Softmax class probabilities (for the Inception Score)."""
        return self._net.probs(self._coerce(images), fetch=fetch)

    def features_and_probs(self, images: Array, fetch: bool = True):
        """(pool3, probs) from one network sweep (scoring fast path)."""
        return self._net.pool3_and_probs(self._coerce(images), fetch=fetch)


def _takes_fetch(fn) -> bool:
    """Capability check for the ``fetch`` kwarg (signature inspection,
    NOT try/except TypeError — a genuine TypeError inside the sweep
    must propagate, not silently re-run the whole network)."""
    import inspect
    try:
        return "fetch" in inspect.signature(fn).parameters
    except (TypeError, ValueError):     # builtins / odd callables
        return False


def extract_features(extractor: FeatureExtractor, images: Array,
                     fetch: bool = True) -> Array:
    """``extractor(images)`` with ``fetch`` threaded when supported.
    Extractors without the flag return host arrays — callers must
    treat the return type as either."""
    if _takes_fetch(extractor.__call__):
        return extractor(images, fetch=fetch)
    return extractor(images)


def extract_with_probs(extractor: FeatureExtractor, images: Array,
                       fetch: bool = True):
    """(features, probs-or-None) in ONE network sweep when the
    extractor supports it — the shared protocol for every scoring
    caller (trainer interval scoring, main.py eval, compute_scores).
    ``fetch=False`` asks for device-resident outputs (extractors that
    don't understand the flag fall back to host arrays — callers must
    treat the return type as either)."""
    if hasattr(extractor, "features_and_probs"):
        fn = extractor.features_and_probs
        return fn(images, fetch=fetch) if _takes_fetch(fn) else fn(images)
    feats = extract_features(extractor, images, fetch=fetch)
    probs = None
    if hasattr(extractor, "probs"):
        fn = extractor.probs
        probs = fn(images, fetch=fetch) if _takes_fetch(fn) else fn(images)
    return feats, probs


def find_inception_weights(data_dir: str = "./data") -> Optional[str]:
    """First existing Inception weight asset under data_dir, if any."""
    for fname in ("inception_v3.pt", "inception_v3.pth", "inception_v3.npz",
                  "classify_image_graph_def.pb",     # the 2015 FID graph
                  "inception_v3.pb"):
        path = os.path.join(data_dir, fname)
        if os.path.exists(path):
            return path
    return None


def get_feature_extractor(data_dir: str = "./data",
                          prefer_inception: bool = True,
                          fid_semantics: Optional[bool] = None,
                          mesh=None) -> FeatureExtractor:
    """Inception if its weights asset exists, else the offline extractor.

    ``fid_semantics`` is forwarded to InceptionFeatures (None =
    auto-detect from the fc width) so callers like compute_scores.py's
    default --extractor auto honor an explicit --fid_semantics.
    ``mesh`` shards the extraction batch axis over a device mesh
    (data-parallel eval; single-device parity tested)."""
    path = find_inception_weights(data_dir)
    if prefer_inception and path is not None:
        try:
            return InceptionFeatures(path, fid_semantics=fid_semantics,
                                     mesh=mesh)
        except Exception as e:          # corrupt/mismatched file, ...
            print(f"[smmdax.eval] Inception load failed ({e}); "
                  "falling back to RandomConvFeatures")
    return RandomConvFeatures(mesh=mesh)
