"""Golden tests for the JAX-native Inception-v3 (smmdax/eval/inception.py).

No downloadable weights exist in this environment (SURVEY.md SS7
hard-part #5), so validation is offline-by-construction:

* ``random_state_dict()`` emits a synthetic state dict with exactly the
  torchvision ``inception_v3(aux_logits=True)`` key schema.
* ``TorchInception3`` below is an INDEPENDENT torch re-implementation of
  the published architecture (arXiv:1512.00567 / torchvision layout),
  written module-by-module here in the test, that loads the synthetic
  dict with ``strict=True`` — so any key-name or shape drift between our
  spec table and the torchvision schema fails loudly.
* The JAX net must match the torch oracle's pool3 features and logits
  on random inputs to f32 tolerance, with BN folding and all.

When real torchvision weights appear at data/inception_v3.pt, the same
converter path is what loads them — nothing else needs to change.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from smmdax.eval import inception as jinc


# ---------------------------------------------------------------------------
# Independent torch oracle (eval-mode BN eps=1e-3, torchvision layout).
# ---------------------------------------------------------------------------


class BasicConv2d(nn.Module):
    def __init__(self, c_in, c_out, **kw):
        super().__init__()
        self.conv = nn.Conv2d(c_in, c_out, bias=False, **kw)
        self.bn = nn.BatchNorm2d(c_out, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class InceptionA(nn.Module):
    def __init__(self, c_in, pool_features, fid=False):
        super().__init__()
        self.fid = fid
        self.branch1x1 = BasicConv2d(c_in, 64, kernel_size=1)
        self.branch5x5_1 = BasicConv2d(c_in, 48, kernel_size=1)
        self.branch5x5_2 = BasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = BasicConv2d(c_in, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = BasicConv2d(c_in, pool_features, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        b3 = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        # fid: the frozen TF graph excludes padding from branch averages
        # (the pytorch-fid FIDInceptionA patch)
        bp = self.branch_pool(F.avg_pool2d(x, kernel_size=3, stride=1,
                                           padding=1,
                                           count_include_pad=not self.fid))
        return torch.cat([b1, b5, b3, bp], 1)


class InceptionB(nn.Module):
    def __init__(self, c_in):
        super().__init__()
        self.branch3x3 = BasicConv2d(c_in, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = BasicConv2d(c_in, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3(x)
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        return torch.cat([b3, bd, F.max_pool2d(x, kernel_size=3, stride=2)], 1)


class InceptionC(nn.Module):
    def __init__(self, c_in, c7, fid=False):
        super().__init__()
        self.fid = fid
        self.branch1x1 = BasicConv2d(c_in, 192, kernel_size=1)
        self.branch7x7_1 = BasicConv2d(c_in, c7, kernel_size=1)
        self.branch7x7_2 = BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = BasicConv2d(c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = BasicConv2d(c_in, c7, kernel_size=1)
        self.branch7x7dbl_2 = BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = BasicConv2d(c7, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch_pool = BasicConv2d(c_in, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        bp = self.branch_pool(F.avg_pool2d(x, kernel_size=3, stride=1,
                                           padding=1,
                                           count_include_pad=not self.fid))
        return torch.cat([b1, b7, bd, bp], 1)


class InceptionD(nn.Module):
    def __init__(self, c_in):
        super().__init__()
        self.branch3x3_1 = BasicConv2d(c_in, 192, kernel_size=1)
        self.branch3x3_2 = BasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = BasicConv2d(c_in, 192, kernel_size=1)
        self.branch7x7x3_2 = BasicConv2d(192, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7x3_3 = BasicConv2d(192, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7x3_4 = BasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(
            self.branch7x7x3_1(x))))
        return torch.cat([b3, b7, F.max_pool2d(x, kernel_size=3, stride=2)], 1)


class InceptionE(nn.Module):
    def __init__(self, c_in, fid=False, pool_max=False):
        super().__init__()
        self.fid = fid
        self.pool_max = pool_max
        self.branch1x1 = BasicConv2d(c_in, 320, kernel_size=1)
        self.branch3x3_1 = BasicConv2d(c_in, 384, kernel_size=1)
        self.branch3x3_2a = BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3_2b = BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = BasicConv2d(c_in, 448, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch_pool = BasicConv2d(c_in, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        if self.pool_max:
            # the TF FID graph's Mixed_7c uses a max pool here
            # (pytorch-fid FIDInceptionE_2 patch)
            pooled = F.max_pool2d(x, kernel_size=3, stride=1, padding=1)
        else:
            pooled = F.avg_pool2d(x, kernel_size=3, stride=1, padding=1,
                                  count_include_pad=not self.fid)
        bp = self.branch_pool(pooled)
        return torch.cat([b1, b3, bd, bp], 1)


class InceptionAux(nn.Module):
    def __init__(self, c_in, num_classes):
        super().__init__()
        self.conv0 = BasicConv2d(c_in, 128, kernel_size=1)
        self.conv1 = BasicConv2d(128, 768, kernel_size=5)
        self.fc = nn.Linear(768, num_classes)

    def forward(self, x):   # pragma: no cover - train-time head, unused
        x = F.avg_pool2d(x, kernel_size=5, stride=3)
        x = self.conv1(self.conv0(x))
        return self.fc(torch.flatten(F.adaptive_avg_pool2d(x, (1, 1)), 1))


class TorchInception3(nn.Module):
    """Oracle with torchvision's exact module names."""

    def __init__(self, num_classes=1000, fid=False):
        super().__init__()
        self.Conv2d_1a_3x3 = BasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = BasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = BasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = BasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = BasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = InceptionA(192, 32, fid=fid)
        self.Mixed_5c = InceptionA(256, 64, fid=fid)
        self.Mixed_5d = InceptionA(288, 64, fid=fid)
        self.Mixed_6a = InceptionB(288)
        self.Mixed_6b = InceptionC(768, 128, fid=fid)
        self.Mixed_6c = InceptionC(768, 160, fid=fid)
        self.Mixed_6d = InceptionC(768, 160, fid=fid)
        self.Mixed_6e = InceptionC(768, 192, fid=fid)
        self.AuxLogits = InceptionAux(768, num_classes)
        self.Mixed_7a = InceptionD(768)
        self.Mixed_7b = InceptionE(1280, fid=fid)
        self.Mixed_7c = InceptionE(2048, fid=fid, pool_max=fid)
        self.fc = nn.Linear(2048, num_classes)

    def forward(self, x):
        x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
        x = F.max_pool2d(x, kernel_size=3, stride=2)
        x = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x))
        x = F.max_pool2d(x, kernel_size=3, stride=2)
        x = self.Mixed_5d(self.Mixed_5c(self.Mixed_5b(x)))
        x = self.Mixed_6a(x)
        x = self.Mixed_6e(self.Mixed_6d(self.Mixed_6c(self.Mixed_6b(x))))
        x = self.Mixed_7c(self.Mixed_7b(self.Mixed_7a(x)))
        pool3 = torch.flatten(F.adaptive_avg_pool2d(x, (1, 1)), 1)
        return pool3, self.fc(pool3)


@pytest.fixture(scope="module")
def oracle_and_params():
    state = jinc.random_state_dict(seed=7)
    model = TorchInception3()
    model.load_state_dict({k: torch.from_numpy(np.asarray(v)) for k, v in state.items()},
                          strict=True)
    model.eval()
    params = jinc.convert_torchvision_state_dict(state)
    return model, params


def test_state_dict_schema_strict(oracle_and_params):
    # load_state_dict(strict=True) inside the fixture IS the assertion:
    # our spec table emits exactly the torchvision key set and shapes.
    model, params = oracle_and_params
    assert params["fc"]["w"].shape == (2048, 1000)
    assert len([k for k in params if k != "fc"]) == len(jinc.conv_specs())


def test_forward_matches_torch_oracle(oracle_and_params):
    model, params = oracle_and_params
    rng = np.random.default_rng(0)
    x = rng.uniform(-1.5, 1.5, (2, 299, 299, 3)).astype(np.float32)
    with torch.no_grad():
        t_pool, t_logits = model(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    j_pool, j_logits = jinc.forward(params, np.asarray(x),
                                    apply_transform_input=False)
    np.testing.assert_allclose(np.asarray(j_pool), t_pool.numpy(),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(j_logits), t_logits.numpy(),
                               rtol=2e-4, atol=2e-4)


def test_transform_input_matches_torchvision_formula():
    x = np.random.default_rng(1).normal(size=(1, 8, 8, 3)).astype(np.float32)
    y = np.asarray(jinc.transform_input(x))
    t = x.transpose(0, 3, 1, 2)
    exp = np.stack([t[:, 0] * (0.229 / 0.5) + (0.485 - 0.5) / 0.5,
                    t[:, 1] * (0.224 / 0.5) + (0.456 - 0.5) / 0.5,
                    t[:, 2] * (0.225 / 0.5) + (0.406 - 0.5) / 0.5], 1)
    np.testing.assert_allclose(y.transpose(0, 3, 1, 2), exp, rtol=1e-6, atol=1e-6)


def test_preprocess_resize_matches_torch_interpolate():
    rng = np.random.default_rng(2)
    imgs = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    out = np.asarray(jinc.preprocess(imgs, size=299))
    x = (imgs + 1.0) * 0.5
    x = (x - jinc.IMAGENET_MEAN) / jinc.IMAGENET_STD
    t = torch.nn.functional.interpolate(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), size=(299, 299),
        mode="bilinear", align_corners=False)
    np.testing.assert_allclose(out.transpose(0, 3, 1, 2), t.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_npz_roundtrip(tmp_path, oracle_and_params):
    model, params = oracle_and_params
    state = jinc.random_state_dict(seed=7)
    path = tmp_path / "inception_v3.npz"
    np.savez(path, **state)
    loaded = jinc.load_params(str(path))
    for name in ("Conv2d_1a_3x3", "Mixed_7c.branch_pool", "fc"):
        for leaf in ("w", "b"):
            np.testing.assert_allclose(np.asarray(loaded[name][leaf]),
                                       np.asarray(params[name][leaf]),
                                       rtol=1e-6, atol=1e-6)


def test_converter_rejects_wrong_shape():
    state = jinc.random_state_dict(seed=3, include_aux=False)
    state["Conv2d_1a_3x3.conv.weight"] = np.zeros((32, 3, 5, 5), np.float32)
    with pytest.raises(ValueError, match="Conv2d_1a_3x3"):
        jinc.convert_torchvision_state_dict(state)


def test_extractor_and_inception_score_reachable(tmp_path):
    """--extractor inception end-to-end on synthetic weights: pool3
    features feed FID/KID, probs feed IS (VERDICT item 3)."""
    from smmdax.eval.features import InceptionFeatures
    from smmdax.eval.scores import inception_score

    path = tmp_path / "inception_v3.npz"
    np.savez(path, **jinc.random_state_dict(seed=11))
    ext = InceptionFeatures(str(path), batch=2)
    imgs = np.random.default_rng(4).uniform(-1, 1, (3, 32, 32, 3)).astype(np.float32)
    feats = ext(imgs)
    assert feats.shape == (3, 2048) and feats.dtype == np.float32
    probs = ext.probs(imgs)
    assert probs.shape == (3, 1000)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, rtol=1e-5)
    mean_is, std_is = inception_score(probs, n_splits=2)
    assert mean_is >= 1.0 - 1e-6


def test_fid_semantics_matches_torch_oracle():
    """fid_semantics reproduces the frozen TF FID graph's pooling
    (padding-excluded branch averages; Mixed_7c max pool) and the
    1008-way fc of the pytorch-fid weight port."""
    state = jinc.random_state_dict(seed=13, num_classes=1008)
    model = TorchInception3(num_classes=1008, fid=True)
    model.load_state_dict({k: torch.from_numpy(np.asarray(v))
                           for k, v in state.items()}, strict=True)
    model.eval()
    params = jinc.convert_torchvision_state_dict(state)
    assert params["fc"]["w"].shape == (2048, 1008)

    rng = np.random.default_rng(5)
    x = rng.uniform(-1.5, 1.5, (2, 299, 299, 3)).astype(np.float32)
    with torch.no_grad():
        t_pool, t_logits = model(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    j_pool, j_logits = jinc.forward(params, np.asarray(x),
                                    apply_transform_input=False,
                                    fid_semantics=True)
    np.testing.assert_allclose(np.asarray(j_pool), t_pool.numpy(),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(j_logits), t_logits.numpy(),
                               rtol=2e-4, atol=2e-4)
    # and it differs from the torchvision semantics (the patches bite)
    j_pool_tv, _ = jinc.forward(params, np.asarray(x),
                                apply_transform_input=False,
                                fid_semantics=False)
    assert not np.allclose(np.asarray(j_pool_tv), np.asarray(j_pool),
                           rtol=1e-3, atol=1e-3)


def test_fid_semantics_autodetected_from_fc_width():
    p1000 = jinc.convert_torchvision_state_dict(
        jinc.random_state_dict(seed=1, include_aux=False))
    p1008 = jinc.convert_torchvision_state_dict(
        jinc.random_state_dict(seed=1, include_aux=False, num_classes=1008))
    assert jinc.InceptionV3(p1000, batch=1).fid_semantics is False
    assert jinc.InceptionV3(p1008, batch=1).fid_semantics is True


def test_get_feature_extractor_threads_fid_semantics(tmp_path):
    """compute_scores' default --extractor auto honors an explicit
    --fid_semantics (ADVICE r2: the override was silently dropped on
    the auto path; get_feature_extractor now forwards it)."""
    from smmdax.eval.features import get_feature_extractor
    np.savez(tmp_path / "inception_v3.npz",
             **jinc.random_state_dict(seed=2, include_aux=False))
    ext_on = get_feature_extractor(str(tmp_path), fid_semantics=True)
    ext_auto = get_feature_extractor(str(tmp_path))
    assert ext_on.name == "inception_v3"
    assert ext_on._net.fid_semantics is True      # forced on
    assert ext_auto._net.fid_semantics is False   # auto: 1000-way fc


def test_device_array_input_matches_numpy(tmp_path):
    """jax.Array image input (the trainer's on-device samples) must
    produce the same features/probs as host numpy input, including the
    padded final chunk — and stay on device until the heads come back."""
    import jax.numpy as jnp
    from smmdax.eval.features import InceptionFeatures

    path = tmp_path / "inception_v3.npz"
    np.savez(path, **jinc.random_state_dict(seed=11))
    ext = InceptionFeatures(str(path), batch=2)
    imgs = np.random.default_rng(9).uniform(-1, 1, (3, 32, 32, 3)).astype(np.float32)

    f_np, p_np = ext.features_and_probs(imgs)
    f_dev, p_dev = ext.features_and_probs(jnp.asarray(imgs))
    np.testing.assert_allclose(f_dev, f_np, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(p_dev, p_np, rtol=1e-5, atol=1e-7)


def test_fetch_false_keeps_heads_on_device(tmp_path):
    """pool3_and_probs(fetch=False) returns device arrays numerically
    identical (f32 softmax vs f64 host softmax) to the fetched path."""
    import jax
    import jax.numpy as jnp
    from smmdax.eval.features import InceptionFeatures

    path = tmp_path / "inception_v3.npz"
    np.savez(path, **jinc.random_state_dict(seed=11))
    ext = InceptionFeatures(str(path), batch=2)
    imgs = np.random.default_rng(2).uniform(-1, 1, (3, 32, 32, 3)).astype(np.float32)

    f_h, p_h = ext.features_and_probs(imgs)
    f_d, p_d = ext.features_and_probs(jnp.asarray(imgs), fetch=False)
    assert isinstance(f_d, jax.Array) and isinstance(p_d, jax.Array)
    np.testing.assert_allclose(np.asarray(f_d), f_h, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(p_d), p_h, rtol=1e-4, atol=1e-6)


def test_sharded_extraction_parity(tmp_path):
    """Inception extraction with the batch axis sharded over the
    8-device mesh equals single-device extraction (padded tail
    included) — data-parallel eval is exact."""
    from smmdax.eval.features import InceptionFeatures
    from smmdax.train import make_mesh

    path = tmp_path / "inception_v3.npz"
    np.savez(path, **jinc.random_state_dict(seed=11))
    imgs = np.random.default_rng(3).uniform(-1, 1, (11, 32, 32, 3)).astype(np.float32)

    f1, p1 = InceptionFeatures(str(path), batch=8).features_and_probs(imgs)
    ext = InceptionFeatures(str(path), batch=8, mesh=make_mesh(8))
    f2, p2 = ext.features_and_probs(imgs)
    np.testing.assert_allclose(f2, f1, rtol=1e-5, atol=1e-6)
    # partitioned reductions reorder float adds; softmax renormalizes
    # the tiny logit drift into ~1e-4 relative on near-zero probs
    np.testing.assert_allclose(p2, p1, rtol=5e-4, atol=1e-7)

    with pytest.raises(ValueError):     # batch must divide the mesh
        InceptionFeatures(str(path), batch=6, mesh=make_mesh(8))
