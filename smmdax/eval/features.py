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
                 seed: int = 1234, batch: int = 256):
        self.feature_dim = feature_dim
        self.width = width
        self.batch = batch
        self._params: Optional[list] = None
        self._seed = seed
        self._apply = jax.jit(self._forward)

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

    def __call__(self, images: Array) -> Array:
        images = np.asarray(images, np.float32)
        if self._params is None:
            self._init(images.shape[-1])
        outs = []
        for i in range(0, len(images), self.batch):
            chunk = jnp.asarray(images[i:i + self.batch])
            outs.append(np.asarray(self._apply(self._params, chunk)))
        return np.concatenate(outs).astype(np.float32)


class InceptionFeatures:
    """Frozen Inception-v3 pool3 features (asset-gated).

    Expects a torchvision-format ``inception_v3`` state dict at
    ``weights_path`` (torch runs CPU-side here; feature extraction is
    interval work, not the hot path).  Raises FileNotFoundError with
    instructions when the asset is absent.
    """

    name = "inception_v3"
    feature_dim = 2048

    def __init__(self, weights_path: str, batch: int = 64):
        if not os.path.exists(weights_path):
            raise FileNotFoundError(
                f"Inception weights not found at {weights_path}. This "
                "environment cannot download them; place a torchvision "
                "inception_v3 state_dict there to enable Inception-based "
                "FID/KID (scores fall back to RandomConvFeatures otherwise).")
        import torch
        from torchvision.models import inception_v3  # type: ignore

        model = inception_v3(weights=None, aux_logits=True, init_weights=False)
        state = torch.load(weights_path, map_location="cpu")
        model.load_state_dict(state)
        model.fc = torch.nn.Identity()
        model.eval()
        self._model = model
        self._torch = torch
        self.batch = batch

    # torchvision's ImageNet-trained inception expects mean/std-
    # normalized [0,1] input, NOT our [-1,1] training range
    _MEAN = np.array([0.485, 0.456, 0.406], np.float32)
    _STD = np.array([0.229, 0.224, 0.225], np.float32)

    def __call__(self, images: Array) -> Array:
        torch = self._torch
        images = np.asarray(images, np.float32)
        images = (images + 1.0) / 2.0                      # -> [0, 1]
        images = (images - self._MEAN) / self._STD
        outs = []
        with torch.no_grad():
            for i in range(0, len(images), self.batch):
                chunk = images[i:i + self.batch]
                x = torch.from_numpy(chunk).permute(0, 3, 1, 2)
                x = torch.nn.functional.interpolate(
                    x, size=(299, 299), mode="bilinear", align_corners=False)
                outs.append(self._model(x).numpy())
        return np.concatenate(outs).astype(np.float32)


def get_feature_extractor(data_dir: str = "./data",
                          prefer_inception: bool = True) -> FeatureExtractor:
    """Inception if its weights asset exists, else the offline extractor."""
    path = os.path.join(data_dir, "inception_v3.pt")
    if prefer_inception and os.path.exists(path):
        try:
            return InceptionFeatures(path)
        except Exception as e:          # torchvision absent, bad file, ...
            print(f"[smmdax.eval] Inception load failed ({e}); "
                  "falling back to RandomConvFeatures")
    return RandomConvFeatures()
