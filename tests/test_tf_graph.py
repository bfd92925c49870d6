"""Frozen-TF-GraphDef converter tests (smmdax/eval/tf_graph.py).

The oracle here is REAL TensorFlow: each test builds the frozen FID
Inception architecture as an actual TF graph with random weights,
serializes it, converts the bytes with our no-TF parser+matcher, and
pins our JAX forward's pool3/logits against the TF session's execution
of the same bytes.  Branch-order permutations exercise the channel
permutation folding (node names are never consulted by the matcher, so
the TF-given scope names are incidental).

Reference provenance: SURVEY.md component #10 — compute_scores.py
"Downloads/loads frozen Inception pb" (the 2015
classify_image_graph_def.pb); the mount is empty, so the architecture
spec is the same torchvision/pytorch-fid schema the rest of
smmdax/eval is golden-tested against.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax.numpy as jnp

from smmdax.eval.inception import BN_EPS, conv_specs, forward
from smmdax.eval.tf_graph import convert_frozen_graph, parse_graph_def

_SPECS = conv_specs()


# --------------------------------------------------------------------------
# TF graph builder (the independent re-expression of the architecture).
# --------------------------------------------------------------------------


def _rand_weights(seed=0):
    rng = np.random.default_rng(seed)
    weights = {}
    for name, (c_in, c_out, k, _, _) in _SPECS.items():
        # fan-in scaling keeps activations O(1) through all 94 layers so
        # the f32 TF-vs-JAX comparison is meaningful (unscaled random
        # weights reach 1e6 magnitudes by pool3)
        std = 1.2 / np.sqrt(k[0] * k[1] * c_in)
        weights[name] = {
            "w": rng.normal(0, std, (k[0], k[1], c_in, c_out)).astype(np.float32),
            "beta": rng.normal(0, 0.2, c_out).astype(np.float32),
            "gamma": rng.uniform(0.6, 1.4, c_out).astype(np.float32),
            "mean": rng.normal(0, 0.1, c_out).astype(np.float32),
            "var": rng.uniform(0.6, 1.4, c_out).astype(np.float32),
        }
    weights["fc"] = {
        "w": rng.normal(0, 0.02, (2048, 1008)).astype(np.float32),
        "b": rng.normal(0, 0.05, 1008).astype(np.float32),
    }
    return weights


def _conv(x, name, weights):
    _, _, k, stride, pad = _SPECS[name]
    wd = weights[name]
    # declare SAME on 1x1 convs (functionally identical to VALID) the
    # way the 2015 graph's arg_scope(padding='SAME') blocks do — the
    # matcher must accept any declaration whose EFFECTIVE pad matches
    pad_str = "SAME" if (pad != (0, 0) or k == (1, 1)) else "VALID"
    y = tf.nn.conv2d(x, tf.constant(wd["w"]),
                     strides=[1, stride[0], stride[1], 1],
                     padding=pad_str)
    y, _, _, _, _, _ = tf.raw_ops.FusedBatchNormV3(
        x=y, scale=tf.constant(wd["gamma"]), offset=tf.constant(wd["beta"]),
        mean=tf.constant(wd["mean"]), variance=tf.constant(wd["var"]),
        epsilon=BN_EPS, is_training=False)
    return tf.nn.relu(y)


def _avgpool(x):
    # TF 'SAME' avg pooling excludes padded cells from the divisor —
    # exactly the frozen-FID-graph semantics our fid_semantics=True
    # forward reproduces.
    return tf.nn.avg_pool2d(x, 3, 1, "SAME")


def _order(branches, order):
    return branches if order is None else [branches[i] for i in order]


def _block_a(x, prefix, w, order=None):
    b1 = _conv(x, f"{prefix}.branch1x1", w)
    b5 = _conv(_conv(x, f"{prefix}.branch5x5_1", w), f"{prefix}.branch5x5_2", w)
    b3 = _conv(_conv(_conv(x, f"{prefix}.branch3x3dbl_1", w),
                     f"{prefix}.branch3x3dbl_2", w),
               f"{prefix}.branch3x3dbl_3", w)
    bp = _conv(_avgpool(x), f"{prefix}.branch_pool", w)
    return tf.concat(_order([b1, b5, b3, bp], order), axis=3)


def _block_b(x, w, order=None):
    b3 = _conv(x, "Mixed_6a.branch3x3", w)
    bd = _conv(_conv(_conv(x, "Mixed_6a.branch3x3dbl_1", w),
                     "Mixed_6a.branch3x3dbl_2", w),
               "Mixed_6a.branch3x3dbl_3", w)
    bp = tf.nn.max_pool2d(x, 3, 2, "VALID")
    return tf.concat(_order([b3, bd, bp], order), axis=3)


def _block_c(x, prefix, w, order=None):
    b1 = _conv(x, f"{prefix}.branch1x1", w)
    b7 = x
    for i in (1, 2, 3):
        b7 = _conv(b7, f"{prefix}.branch7x7_{i}", w)
    bd = x
    for i in (1, 2, 3, 4, 5):
        bd = _conv(bd, f"{prefix}.branch7x7dbl_{i}", w)
    bp = _conv(_avgpool(x), f"{prefix}.branch_pool", w)
    return tf.concat(_order([b1, b7, bd, bp], order), axis=3)


def _block_d(x, w, order=None):
    b3 = _conv(_conv(x, "Mixed_7a.branch3x3_1", w), "Mixed_7a.branch3x3_2", w)
    b7 = x
    for i in (1, 2, 3, 4):
        b7 = _conv(b7, f"Mixed_7a.branch7x7x3_{i}", w)
    bp = tf.nn.max_pool2d(x, 3, 2, "VALID")
    return tf.concat(_order([b3, b7, bp], order), axis=3)


def _block_e(x, prefix, w, pool_max, order=None, split_order=None):
    b1 = _conv(x, f"{prefix}.branch1x1", w)
    b3h = _conv(x, f"{prefix}.branch3x3_1", w)
    b3 = tf.concat(_order([_conv(b3h, f"{prefix}.branch3x3_2a", w),
                           _conv(b3h, f"{prefix}.branch3x3_2b", w)],
                          split_order), axis=3)
    bdh = _conv(_conv(x, f"{prefix}.branch3x3dbl_1", w),
                f"{prefix}.branch3x3dbl_2", w)
    bd = tf.concat(_order([_conv(bdh, f"{prefix}.branch3x3dbl_3a", w),
                           _conv(bdh, f"{prefix}.branch3x3dbl_3b", w)],
                          split_order), axis=3)
    pooled = (tf.nn.max_pool2d(x, 3, 1, "SAME") if pool_max
              else _avgpool(x))
    bp = _conv(pooled, f"{prefix}.branch_pool", w)
    return tf.concat(_order([b1, b3, bd, bp], order), axis=3)


def build_fid_graph(weights, orders=None):
    """The frozen FID-Inception architecture as a real TF graph.

    ``orders``: optional {block_prefix: concat order} (plus
    '<prefix>.split' entries) to permute branch order — the converted
    params must be invariant to it."""
    orders = orders or {}
    g = tf.Graph()
    with g.as_default():
        raw = tf.compat.v1.placeholder(tf.float32, [None, 299, 299, 3],
                                       name="input_raw")
        # the real graph's preamble carries consts the reader cannot
        # model (DecodeJpeg/contents is DT_STRING) — tolerated unless
        # the matcher actually needs their values
        tf.constant("jpeg-bytes-placeholder", name="DecodeJpeg_contents")
        # the 2015 graph's internal normalization preamble
        x = tf.multiply(tf.subtract(raw, 128.0), 1.0 / 128.0)
        for name in ("Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3"):
            x = _conv(x, name, weights)
        x = tf.nn.max_pool2d(x, 3, 2, "VALID")
        x = _conv(_conv(x, "Conv2d_3b_1x1", weights), "Conv2d_4a_3x3", weights)
        x = tf.nn.max_pool2d(x, 3, 2, "VALID")
        for p in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
            x = _block_a(x, p, weights, orders.get(p))
        x = _block_b(x, weights, orders.get("Mixed_6a"))
        for p in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
            x = _block_c(x, p, weights, orders.get(p))
        x = _block_d(x, weights, orders.get("Mixed_7a"))
        x = _block_e(x, "Mixed_7b", weights, pool_max=False,
                     order=orders.get("Mixed_7b"),
                     split_order=orders.get("Mixed_7b.split"))
        x = _block_e(x, "Mixed_7c", weights, pool_max=True,
                     order=orders.get("Mixed_7c"),
                     split_order=orders.get("Mixed_7c.split"))
        pool3 = tf.reshape(tf.nn.avg_pool2d(x, 8, 1, "VALID"), [-1, 2048],
                           name="pool_3_flat")
        logits = tf.nn.bias_add(
            tf.linalg.matmul(pool3, tf.constant(weights["fc"]["w"])),
            tf.constant(weights["fc"]["b"]), name="logits")
        tf.nn.softmax(logits, name="softmax")
    return g, raw, pool3, logits


def _tf_run(g, raw, pool3, logits, imgs_raw):
    with tf.compat.v1.Session(graph=g) as sess:
        return sess.run([pool3, logits], {raw: imgs_raw})


def _jax_run(params, imgs_raw):
    # same tensor the TF graph's preamble produces, skipping our
    # resize/normalize pipeline (exercised elsewhere)
    x = jnp.asarray((imgs_raw - 128.0) / 128.0)
    pool3, logits = forward(params, x, apply_transform_input=False,
                            fid_semantics=True)
    return np.asarray(pool3), np.asarray(logits)


def _imgs(n=2, seed=7):
    return np.random.default_rng(seed).uniform(
        0, 255, (n, 299, 299, 3)).astype(np.float32)


# --------------------------------------------------------------------------
# Tests
# --------------------------------------------------------------------------


def test_wire_parser_roundtrip():
    """Our protobuf reader vs TF's own serialization of known consts."""
    big = np.arange(24, dtype=np.float32).reshape(2, 3, 4)  # tensor_content
    g = tf.Graph()
    with g.as_default():
        tf.constant(big, name="big")
        tf.constant(np.float32(2.5), name="scalar")
        tf.constant([1, 2, 3], dtype=tf.int32, name="ints")
        a = tf.constant(np.ones((1, 4, 4, 2), np.float32))
        tf.nn.max_pool2d(a, 3, 2, "SAME", name="pool")
    nodes = {n.name: n for n in parse_graph_def(g.as_graph_def().SerializeToString())}
    np.testing.assert_array_equal(nodes["big"].attrs["value"].tensor, big)
    assert nodes["scalar"].attrs["value"].tensor == np.float32(2.5)
    np.testing.assert_array_equal(nodes["ints"].attrs["value"].tensor,
                                  [1, 2, 3])
    pool = nodes["pool"]
    assert pool.op == "MaxPool"
    assert pool.attrs["ksize"].list_i == [1, 3, 3, 1]
    assert pool.attrs["padding"].s == b"SAME"


def test_convert_frozen_graph_matches_tf_execution():
    """Canonical branch order: converted params through our JAX forward
    must reproduce the TF session's pool3/logits."""
    w = _rand_weights(seed=0)
    g, raw, pool3_t, logits_t = build_fid_graph(w)
    imgs = _imgs()
    pool3_tf, logits_tf = _tf_run(g, raw, pool3_t, logits_t, imgs)

    params = convert_frozen_graph(g.as_graph_def().SerializeToString())
    assert params["fc"]["w"].shape == (2048, 1008)
    pool3_j, logits_j = _jax_run(params, imgs)

    np.testing.assert_allclose(pool3_j, pool3_tf, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(logits_j, logits_tf, rtol=1e-3, atol=1e-3)


def test_convert_handles_permuted_branch_orders():
    """Permuted concat orders (including a nested E-split and the
    pass-through max-pool blocks) still convert to a parameterization
    that reproduces the TF execution — the matcher recovers the branch
    order from the graph and folds the channel permutation into
    downstream weights.  (With shared downstream weights a permuted
    graph is a *different* function than the canonical one, so the
    oracle is the permuted graph's own execution.)"""
    w = _rand_weights(seed=1)
    orders = {
        "Mixed_5c": [2, 0, 3, 1],
        # Mixed_5d/Mixed_6e permuted so the following REDUCTION blocks'
        # pass-through max-pool branches receive a non-identity
        # incoming layout (the only path where a permutation threads
        # THROUGH a block instead of being absorbed by a conv)
        "Mixed_5d": [1, 2, 3, 0],
        "Mixed_6a": [1, 2, 0],
        "Mixed_6d": [3, 1, 0, 2],
        "Mixed_6e": [0, 3, 2, 1],
        "Mixed_7a": [2, 1, 0],
        "Mixed_7b": [1, 3, 0, 2],
        "Mixed_7b.split": [1, 0],
    }
    g, raw, pool3_t, logits_t = build_fid_graph(w, orders=orders)
    imgs = _imgs(seed=11)
    pool3_tf, logits_tf = _tf_run(g, raw, pool3_t, logits_t, imgs)

    params = convert_frozen_graph(g.as_graph_def().SerializeToString())
    pool3_j, logits_j = _jax_run(params, imgs)
    np.testing.assert_allclose(pool3_j, pool3_tf, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(logits_j, logits_tf, rtol=2e-3, atol=2e-4)


def test_equivalent_permuted_graph_converts_identically():
    """Two graphs computing the SAME function with different Mixed_7b
    concat orders (the permuted builder pre-gathers Mixed_7c's
    first-conv weights to compensate) must convert to identical
    params — branch order leaves no trace."""
    w = _rand_weights(seed=1)
    order = [1, 3, 0, 2]
    widths = [320, 768, 768, 192]         # Mixed_7b canonical branch widths
    offsets, off = {}, 0
    for i in order:
        offsets[i] = off
        off += widths[i]
    P = np.concatenate([np.arange(offsets[k], offsets[k] + wk)
                        for k, wk in enumerate(widths)])
    inv = np.argsort(P)
    w2 = {k: dict(v) for k, v in w.items()}
    for name in ("Mixed_7c.branch1x1", "Mixed_7c.branch3x3_1",
                 "Mixed_7c.branch3x3dbl_1", "Mixed_7c.branch_pool"):
        w2[name]["w"] = w[name]["w"][:, :, inv, :]

    g_can, raw_c, p3_c, lg_c = build_fid_graph(w)
    g_perm, raw_p, p3_p, lg_p = build_fid_graph(w2, orders={"Mixed_7b": order})

    imgs = _imgs(seed=13)
    pool3_c, _ = _tf_run(g_can, raw_c, p3_c, lg_c, imgs)
    pool3_p, _ = _tf_run(g_perm, raw_p, p3_p, lg_p, imgs)
    np.testing.assert_allclose(pool3_p, pool3_c, rtol=1e-4, atol=1e-5)

    params_c = convert_frozen_graph(g_can.as_graph_def().SerializeToString())
    params_p = convert_frozen_graph(g_perm.as_graph_def().SerializeToString())
    for name in params_c:
        np.testing.assert_allclose(params_p[name]["w"], params_c[name]["w"],
                                   rtol=1e-6, atol=1e-7, err_msg=name)
        np.testing.assert_allclose(params_p[name]["b"], params_c[name]["b"],
                                   rtol=1e-6, atol=1e-7, err_msg=name)


@pytest.mark.parametrize("scale_after_norm", [True, False])
def test_convert_bnwgn_form(scale_after_norm):
    """The 2015 graph's BatchNormWithGlobalNormalization form: rewrite
    the FusedBatchNormV3 nodes into BNWGN (inputs reordered, attrs
    renamed) and require the converted params to equal the fused-form
    conversion.  The real asset was exported with the ops.batch_norm
    default scale_after_normalization=False (gamma ignored, treated as
    ones) — both settings are covered."""
    w = _rand_weights(seed=2)
    g, *_ = build_fid_graph(w)
    gd = g.as_graph_def()
    if scale_after_norm:
        expected = convert_frozen_graph(gd.SerializeToString())
    else:
        # gamma is ignored by BNWGN when scale_after_normalization is
        # off, so the expectation is the fused graph with gamma := 1
        w1 = {k: dict(v) for k, v in w.items()}
        for v in w1.values():
            if "gamma" in v:
                v["gamma"] = np.ones_like(v["gamma"])
        g1, *_ = build_fid_graph(w1)
        expected = convert_frozen_graph(g1.as_graph_def().SerializeToString())

    rewritten = tf.compat.v1.GraphDef()
    for node in gd.node:
        new = rewritten.node.add()
        if node.op == "FusedBatchNormV3":
            # FusedBatchNorm inputs: (x, scale, offset, mean, variance)
            # BNWGN inputs:          (t, m, v, beta, gamma)
            x_in, scale, offset, mean, var = node.input[:5]
            new.name = node.name
            new.op = "BatchNormWithGlobalNormalization"
            new.input.extend([x_in, mean, var, offset, scale])
            new.attr["T"].type = tf.float32.as_datatype_enum
            new.attr["variance_epsilon"].f = BN_EPS
            new.attr["scale_after_normalization"].b = scale_after_norm
        else:
            new.CopyFrom(node)
    params_bnwgn = convert_frozen_graph(rewritten.SerializeToString())
    for name in expected:
        np.testing.assert_allclose(params_bnwgn[name]["w"],
                                   expected[name]["w"],
                                   rtol=1e-6, atol=1e-7, err_msg=name)
        np.testing.assert_allclose(params_bnwgn[name]["b"],
                                   expected[name]["b"],
                                   rtol=1e-6, atol=1e-6, err_msg=name)


def test_bad_pool_geometry_rejected():
    """Pools are re-applied by forward() with hardcoded geometry, so a
    graph with different pool geometry must be REJECTED, not silently
    converted (feature corruption otherwise)."""
    w = _rand_weights(seed=4)
    g, *_ = build_fid_graph(w)
    gd = g.as_graph_def()
    bad = tf.compat.v1.GraphDef()
    for node in gd.node:
        new = bad.node.add()
        new.CopyFrom(node)
        if node.op == "AvgPool" and list(node.attr["ksize"].list.i) == \
                [1, 3, 3, 1]:
            new.attr["ksize"].list.i[:] = [1, 5, 5, 1]
    with pytest.raises(ValueError, match="pool geometry"):
        convert_frozen_graph(bad.SerializeToString())


def test_semantics_mismatch_rejected(tmp_path):
    """A frozen graph whose last-block pool kind contradicts what the
    fc-width fid_semantics auto-detection would choose must fail
    loudly in load_params, not silently mis-pool."""
    from smmdax.eval.inception import load_params

    w = _rand_weights(seed=6)
    # 1008-way fc (auto => fid_semantics=True => Mixed_7c max pool)
    # but build the graph with an AVG pool in Mixed_7c
    g = tf.Graph()
    with g.as_default():
        raw = tf.compat.v1.placeholder(tf.float32, [None, 299, 299, 3])
        x = tf.multiply(tf.subtract(raw, 128.0), 1.0 / 128.0)
        for name in ("Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3"):
            x = _conv(x, name, w)
        x = tf.nn.max_pool2d(x, 3, 2, "VALID")
        x = _conv(_conv(x, "Conv2d_3b_1x1", w), "Conv2d_4a_3x3", w)
        x = tf.nn.max_pool2d(x, 3, 2, "VALID")
        for p in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
            x = _block_a(x, p, w)
        x = _block_b(x, w)
        for p in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
            x = _block_c(x, p, w)
        x = _block_d(x, w)
        x = _block_e(x, "Mixed_7b", w, pool_max=False)
        x = _block_e(x, "Mixed_7c", w, pool_max=False)   # avg, not max
        pool3 = tf.reshape(tf.nn.avg_pool2d(x, 8, 1, "VALID"), [-1, 2048])
        tf.nn.bias_add(tf.linalg.matmul(pool3, tf.constant(w["fc"]["w"])),
                       tf.constant(w["fc"]["b"]))
    pb = tmp_path / "odd.pb"
    pb.write_bytes(g.as_graph_def().SerializeToString())
    with pytest.raises(ValueError, match="fid_semantics"):
        load_params(str(pb))


def test_load_params_dispatches_pb(tmp_path):
    """inception.load_params routes .pb files through the GraphDef
    converter, and InceptionFeatures auto-detects FID semantics from
    the 1008-way fc."""
    from smmdax.eval.features import InceptionFeatures
    from smmdax.eval.inception import load_params

    w = _rand_weights(seed=3)
    g, *_ = build_fid_graph(w)
    pb = tmp_path / "classify_image_graph_def.pb"
    pb.write_bytes(g.as_graph_def().SerializeToString())

    params = load_params(str(pb))
    assert params["fc"]["w"].shape == (2048, 1008)
    feats = InceptionFeatures(str(pb), batch=4)
    assert feats._net.fid_semantics is True
    imgs = np.random.default_rng(0).uniform(-1, 1, (4, 32, 32, 3)).astype(np.float32)
    out = feats(imgs)
    assert out.shape == (4, 2048) and np.isfinite(out).all()


def test_find_inception_weights_sees_pb(tmp_path):
    from smmdax.eval.features import find_inception_weights
    assert find_inception_weights(str(tmp_path)) is None
    (tmp_path / "classify_image_graph_def.pb").write_bytes(b"x")
    assert find_inception_weights(str(tmp_path)).endswith(
        "classify_image_graph_def.pb")
