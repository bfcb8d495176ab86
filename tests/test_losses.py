"""Loss parity tests: every loss function vs. a torch oracle.

The oracle re-states the reference formulas (model/loss_component/*) with
torch.nn primitives inside the test — validating our JAX implementations
reproduce exact torch reduction semantics (sum-KL, mean-CE with soft
targets, etc.).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as tf

pytestmark = pytest.mark.quick  # fast oracle tests (-m quick inner loop)

import jax
import jax.numpy as jnp

from distillclip_tpu.losses import functional as F

RTOL = 2e-5
ATOL = 2e-5


def _np(x):
    return np.asarray(x, dtype=np.float32)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def check(jax_val, torch_val):
    np.testing.assert_allclose(np.asarray(jax_val), torch_val.numpy(), rtol=RTOL, atol=ATOL)


def test_out_l1(rng):
    s, t = rng.normal(size=(8, 16)), rng.normal(size=(8, 16))
    check(F.out_l1(jnp.asarray(s), jnp.asarray(t)),
          torch.nn.L1Loss()(torch.tensor(_np(s)), torch.tensor(_np(t))))


def test_out_ce(rng):
    s, t = rng.normal(size=(8, 16)), rng.normal(size=(8, 16))
    ts, tt = torch.tensor(_np(s)), torch.tensor(_np(t))
    expected = torch.nn.CrossEntropyLoss(reduction="mean")(ts, tt.softmax(dim=1))
    check(F.out_ce(jnp.asarray(s), jnp.asarray(t)), expected)


def test_out_kl(rng):
    s, t = rng.normal(size=(8, 16)), rng.normal(size=(8, 16))
    T = 4.0
    ts, tt = torch.tensor(_np(s)), torch.tensor(_np(t))
    expected = torch.nn.KLDivLoss(reduction="sum")(
        tf.log_softmax(ts / T, dim=1), tf.softmax(tt / T, dim=1)
    ) * T ** 2
    check(F.out_kl(jnp.asarray(s), jnp.asarray(t), T), expected)


def test_out_cos(rng):
    s, t = rng.normal(size=(8, 16)), rng.normal(size=(8, 16))
    ts, tt = torch.tensor(_np(s)), torch.tensor(_np(t))
    expected = torch.nn.CosineEmbeddingLoss()(ts, tt, torch.ones(8))
    check(F.out_cos(jnp.asarray(s), jnp.asarray(t)), expected)


def test_embedding_mse(rng):
    s, t = rng.normal(size=(8, 10, 16)), rng.normal(size=(8, 10, 16))
    check(F.embedding_mse(jnp.asarray(s), jnp.asarray(t)),
          torch.nn.MSELoss()(torch.tensor(_np(s)), torch.tensor(_np(t))))


def _torch_per_layer_headmean(loss_fn, s_layers, t_layers):
    """Reference pattern: head-mean per layer, loss per layer, layer-avg
    (attention_score_mse.py:5-22)."""
    res = 0
    for s, t in zip(s_layers, t_layers):
        sm = s.sum(dim=1) / s.shape[1]
        tm = t.sum(dim=1) / t.shape[1]
        res = res + loss_fn(sm, tm)
    return res / len(s_layers)


def test_attention_score_and_probs_mse(rng):
    # student 4 heads, teacher 8 heads: head-averaging equalizes shapes
    L, B, N = 3, 4, 7
    s = rng.normal(size=(L, B, 4, N, N))
    t = rng.normal(size=(L, B, 8, N, N))
    s_layers = [torch.tensor(_np(s[i])) for i in range(L)]
    t_layers = [torch.tensor(_np(t[i])) for i in range(L)]
    expected = _torch_per_layer_headmean(torch.nn.MSELoss(), s_layers, t_layers)
    check(F.attention_score_mse(jnp.asarray(s), jnp.asarray(t)), expected)
    check(F.attention_probs_mse(jnp.asarray(s), jnp.asarray(t)), expected)


def test_attention_probs_kl(rng):
    L, B, N = 2, 3, 5
    s = tf.softmax(torch.tensor(_np(rng.normal(size=(L, B, 4, N, N)))), dim=-1)
    t = tf.softmax(torch.tensor(_np(rng.normal(size=(L, B, 8, N, N)))), dim=-1)
    kl = torch.nn.KLDivLoss(reduction="sum")
    expected = 0
    for i in range(L):
        sm = s[i].sum(dim=1) / s[i].shape[1]
        tm = t[i].sum(dim=1) / t[i].shape[1]
        expected = expected + kl(sm.log(), tm)
    expected = expected / L
    check(F.attention_probs_kl(jnp.asarray(s.numpy()), jnp.asarray(t.numpy())), expected)


def test_hidden_rep_mse(rng):
    L, B, N, D = 3, 4, 7, 16
    s, t = rng.normal(size=(L, B, N, D)), rng.normal(size=(L, B, N, D))
    s_layers = [torch.tensor(_np(s[i])) for i in range(L)]
    t_layers = [torch.tensor(_np(t[i])) for i in range(L)]
    mse = torch.nn.MSELoss()
    expected = sum(mse(a, b) for a, b in zip(s_layers, t_layers)) / L
    check(F.hidden_rep_mse(jnp.asarray(s), jnp.asarray(t)), expected)


def test_last_value_map_kl(rng):
    B, H, N = 3, 4, 6
    s, t = rng.normal(size=(B, H, N, N)), rng.normal(size=(B, H, N, N))
    ts, tt = torch.tensor(_np(s)), torch.tensor(_np(t))
    expected = torch.nn.KLDivLoss(reduction="sum")(
        tf.softmax(ts, dim=1).log(), tf.softmax(tt, dim=1)
    )
    check(F.last_value_map_kl(jnp.asarray(s), jnp.asarray(t)), expected)


def test_hard_label(rng):
    s = rng.normal(size=(8, 8))
    expected = torch.nn.CrossEntropyLoss(reduction="mean")(
        torch.tensor(_np(s)), torch.arange(8)
    )
    check(F.hard_label(jnp.asarray(s)), expected)


def test_soft_label(rng):
    s, t = rng.normal(size=(8, 8)), rng.normal(size=(8, 8))
    T = 2.0
    ts, tt = torch.tensor(_np(s)), torch.tensor(_np(t))
    expected = torch.nn.KLDivLoss(reduction="sum")(
        tf.softmax(ts / T, dim=1).log(), tf.softmax(tt / T, dim=1)
    ) * T ** 2
    check(F.soft_label(jnp.asarray(s), jnp.asarray(t), T), expected)


def test_logits_mse(rng):
    s, t = rng.normal(size=(8, 8)), rng.normal(size=(8, 8))
    check(F.logits_mse(jnp.asarray(s), jnp.asarray(t)),
          torch.nn.MSELoss()(torch.tensor(_np(s)), torch.tensor(_np(t))))


def test_fine_grain(rng):
    B, n1, n2, d = 5, 7, 9, 16
    img, txt = rng.normal(size=(B, n1, d)), rng.normal(size=(B, n2, d))
    timg, ttxt = torch.tensor(_np(img)), torch.tensor(_np(txt))

    def cal_similarity(query, respond):
        res = []
        for q in query:
            sim = torch.matmul(q, respond.permute(0, 2, 1))
            res.append(sim.max(dim=-1).values.mean(dim=-1))
        return torch.stack(res, dim=0)

    i2t = cal_similarity(timg, ttxt)
    t2i = cal_similarity(ttxt, timg)
    label = torch.arange(B)
    ce = torch.nn.CrossEntropyLoss(reduction="mean")
    expected = 0.5 * (ce(i2t, label) + ce(t2i, label))
    check(F.fine_grain(jnp.asarray(img), jnp.asarray(txt)), expected)


def test_cos_diff(rng):
    s, t = rng.normal(size=(8, 8)), rng.normal(size=(8, 8))
    ts, tt = torch.tensor(_np(s)), torch.tensor(_np(t))
    relu = torch.nn.ReLU()

    def get_neg(x):
        n = x.shape[0]
        return x.flatten()[:-1].view(n - 1, n + 1)[:, 1:].flatten()

    pos = relu(torch.diagonal(tt) - torch.diagonal(ts)).mean()
    neg = relu(get_neg(ts) - get_neg(tt)).mean()
    check(F.cos_diff(jnp.asarray(s), jnp.asarray(t)), pos + neg)


def test_smd(rng):
    tau = 0.04
    t_in = rng.normal(size=(16, 32))
    s_in = rng.normal(size=(16, 32))
    tt, ts = torch.tensor(_np(t_in)), torch.tensor(_np(s_in))

    # torch oracle re-stating smd.py:14-54
    n = ts.size(0)
    inputs = tf.normalize(ts, dim=1)
    teacher = tf.normalize(tt, dim=1)
    x1 = teacher.pow(2).sum(dim=1, keepdim=True).expand(n, n)
    dist_t = (x1 + x1.t() - 2 * teacher @ teacher.t()).clamp(min=1e-12).sqrt()
    x2 = inputs.pow(2).sum(dim=1, keepdim=True).expand(n, n)
    dist = (x1 + x2.t() - 2 * teacher @ inputs.t()).clamp(min=1e-12).sqrt()
    negative_index = (dist_t > torch.diag(dist).expand(n, n).t()).float()
    negative = dist * negative_index
    negative[negative_index == 0] = 1e5
    positive = dist * (1 - negative_index)
    dist_an = torch.min(negative, dim=1)
    dist_ap = torch.max(positive, dim=1)
    an_t = torch.gather(dist_t, 1, dist_an.indices.unsqueeze(1)).squeeze()
    ap_t = torch.gather(dist_t, 1, dist_ap.indices.unsqueeze(1)).squeeze()
    weight_an = torch.clamp_min(an_t - dist_an.values, min=0.0)
    weight_ap = torch.clamp_min(dist_ap.values - ap_t, min=0.0)
    logits = torch.stack([weight_an * dist_an.values / tau, weight_ap * dist_ap.values / tau], 1)
    expected = torch.nn.CrossEntropyLoss()(logits, torch.zeros(n, dtype=torch.long))

    # wider tolerance: sqrt(pairwise-distance) + /tau amplify fp32 rounding
    np.testing.assert_allclose(
        np.asarray(F.smd(jnp.asarray(t_in), jnp.asarray(s_in), tau=tau)),
        expected.numpy(), rtol=5e-4, atol=5e-4,
    )


def test_smd_multi_model(rng):
    """Fixed 3-way SMD (reference smd_multi_model.py is broken/unregistered;
    oracle re-states the evident intent: smd columns + student image-text
    positive distance)."""
    tau = 0.04
    t_in = rng.normal(size=(16, 32))
    s_in = rng.normal(size=(16, 32))
    x_in = rng.normal(size=(16, 32))
    tt, ts, tx = torch.tensor(_np(t_in)), torch.tensor(_np(s_in)), torch.tensor(_np(x_in))

    n = ts.size(0)
    inputs = tf.normalize(ts, dim=1)
    teacher = tf.normalize(tt, dim=1)
    text = tf.normalize(tx, dim=1)
    x1 = teacher.pow(2).sum(dim=1, keepdim=True).expand(n, n)
    dist_t = (x1 + x1.t() - 2 * teacher @ teacher.t()).clamp(min=1e-12).sqrt()
    x2 = inputs.pow(2).sum(dim=1, keepdim=True).expand(n, n)
    dist = (x1 + x2.t() - 2 * teacher @ inputs.t()).clamp(min=1e-12).sqrt()
    text_positive = (inputs - text).pow(2).sum(dim=1).clamp(min=1e-12).sqrt()
    negative_index = (dist_t > torch.diag(dist).expand(n, n).t()).float()
    negative = dist * negative_index
    negative[negative_index == 0] = 1e5
    positive = dist * (1 - negative_index)
    dist_an = torch.min(negative, dim=1)
    dist_ap = torch.max(positive, dim=1)
    an_t = torch.gather(dist_t, 1, dist_an.indices.unsqueeze(1)).squeeze()
    ap_t = torch.gather(dist_t, 1, dist_ap.indices.unsqueeze(1)).squeeze()
    weight_an = torch.clamp_min(an_t - dist_an.values, min=0.0)
    weight_ap = torch.clamp_min(dist_ap.values - ap_t, min=0.0)
    logits = torch.stack([
        weight_an * dist_an.values / tau,
        weight_ap * dist_ap.values / tau,
        text_positive / tau,
    ], 1)
    expected = torch.nn.CrossEntropyLoss()(logits, torch.zeros(n, dtype=torch.long))

    np.testing.assert_allclose(
        np.asarray(F.smd_multi_model(
            jnp.asarray(t_in), jnp.asarray(s_in), jnp.asarray(x_in), tau=tau)),
        expected.numpy(), rtol=5e-4, atol=5e-4,
    )
