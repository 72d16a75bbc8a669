"""Golden-value tests: JAX objectives vs the reference math executed in torch.

Each torch oracle below re-derives the formulas of
``/root/reference/finetune/losses.py`` (cited per test) independently —
including the quirks: multiplied inverse_temperature, CE-sum/B, cf-only
denominators, fp64 count islands.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from clip_finegrained_alignment_tpu.objectives import (
    clip_count_loss, clip_loss, count_loss, sparc_loss)

g = np.random.default_rng(0)


def _np(x):
    return np.asarray(x, dtype=np.float32)


# ---------------------------------------------------------------------------
# Torch oracles (reference math, losses.py)
# ---------------------------------------------------------------------------

def oracle_clip_loss(img, txt, temperature=0.07):
    # losses.py:14-36
    img = img / img.norm(dim=-1, keepdim=True)
    txt = txt / txt.norm(dim=-1, keepdim=True)
    logits = (img @ txt.t()) / temperature
    labels = torch.arange(len(img))
    return (F.cross_entropy(logits, labels)
            + F.cross_entropy(logits.t(), labels)) / 2.0


def oracle_grouped_count(ei, ek, group_size, temperature=0.07):
    # losses.py:46-90 — per-sample python loop, fp64.
    ei = ei.to(torch.float64)
    ek = ek.to(torch.float64)
    ei = ei / ei.norm(dim=-1, keepdim=True)
    ek = ek / ek.norm(dim=-1, keepdim=True)
    B = ei.size(0)
    loss = torch.tensor(0.0, dtype=torch.float64)
    for i in range(B):
        grp = ek[i * group_size:(i + 1) * group_size]
        pos = torch.dot(ei[i], grp[0])
        negs = ei[i] @ grp[1:].t()
        num = torch.exp(pos / temperature)
        den = num + torch.sum(torch.exp(negs / temperature))
        loss = loss + (-torch.log(num / den))
    return loss / B


def oracle_clip_count(img, txt, groups_flat, group_size,
                      temperature=0.07, alpha=0.5):
    # losses.py:92-133
    B = img.size(0)
    img = img / img.norm(dim=-1, keepdim=True)
    txt = txt / txt.norm(dim=-1, keepdim=True)
    T = txt.size(0) // B
    img_x = img.repeat_interleave(T, dim=0)
    logits = (img_x @ txt.t()) / temperature
    labels = torch.arange(txt.size(0))
    closs = (F.cross_entropy(logits, labels)
             + F.cross_entropy(logits.t(), labels)) / 2.0
    cnt = oracle_grouped_count(img_x, groups_flat, group_size,
                               temperature) * alpha
    return closs, cnt, closs + cnt.to(torch.float32)


def oracle_sparc(v_patch, l_token, mask, sim_thresh=0.5, gw=1.0, lw=1.0,
                 inv_temp=0.07):
    # losses.py:145-264
    def pairwise(a, b):
        a = F.normalize(a, dim=-1)
        b = F.normalize(b, dim=-1)
        B = a.shape[0]
        logits = a @ b.t() * inv_temp
        return F.cross_entropy(logits, torch.arange(B), reduction="sum") / B

    def masked_pairwise(a, b, m):
        B, T = a.shape[0], a.shape[1]
        a = F.normalize(a, dim=-1)
        b = F.normalize(b, dim=-1)
        m2 = m.unsqueeze(-1) * m.unsqueeze(1)
        logits = torch.bmm(a, b.transpose(1, 2)) * inv_temp
        logits = logits.masked_fill(~m2.bool(), -float("inf"))
        loss = F.cross_entropy(logits.view(-1, T),
                               torch.arange(T).repeat(B),
                               reduction="none").view(B, T)
        return (loss * m).sum() / (m.sum() + 1e-8)

    mask_f = mask.float()
    v_embed = F.normalize(v_patch.mean(dim=1), dim=-1)
    masked_l = l_token * mask_f.unsqueeze(-1)
    counts = mask_f.sum(dim=-1, keepdim=True).clamp(min=1e-8)
    l_embed = F.normalize(masked_l.sum(dim=1) / counts, dim=-1)
    global_loss = 0.5 * (pairwise(v_embed, l_embed) + pairwise(l_embed, v_embed))

    vn = F.normalize(v_patch, dim=-1)
    ln = F.normalize(l_token, dim=-1)
    sim = torch.einsum("btd,bpd->btp", ln, vn)
    sm = sim * mask_f.unsqueeze(-1)
    smin = sm.masked_fill(~mask.bool().unsqueeze(-1),
                          float("inf")).min(dim=-1, keepdim=True)[0]
    smax = sm.masked_fill(~mask.bool().unsqueeze(-1),
                          -float("inf")).max(dim=-1, keepdim=True)[0]
    normed = (sm - smin) / (smax - smin + 1e-8)
    thresh = torch.where(normed < sim_thresh, torch.zeros_like(normed), normed)
    w = thresh / thresh.sum(dim=-1, keepdim=True).clamp(min=1e-8)
    grouped = torch.einsum("btp,bpd->btd", w, v_patch)
    local = 0.5 * (masked_pairwise(grouped, l_token, mask_f)
                   + masked_pairwise(l_token, grouped, mask_f))
    return gw * global_loss + lw * local, global_loss, local


def oracle_count(img_logits, txt_logits, ei, ek, ek_cf,
                 temperature=0.07, alpha=1.0):
    # losses.py:274-309
    gt = torch.arange(len(img_logits))
    closs = (F.cross_entropy(img_logits, gt)
             + F.cross_entropy(txt_logits, gt)) / 2
    ei = ei / ei.norm(dim=1, keepdim=True)
    ek = ek / ek.norm(dim=1, keepdim=True)
    ek_cf = ek_cf / ek_cf.norm(dim=2, keepdim=True)
    num = torch.exp(torch.sum(ei * ek, dim=1) / temperature)
    cf = torch.sum(ei.unsqueeze(1) * ek_cf, dim=2) / temperature
    den = torch.sum(torch.exp(cf), dim=1)
    cnt = (-torch.log(num / den)).mean()
    return closs, cnt, closs + alpha * cnt


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------

def test_clip_loss_golden():
    img = g.standard_normal((8, 16)).astype(np.float32)
    txt = g.standard_normal((8, 16)).astype(np.float32)
    want = oracle_clip_loss(torch.from_numpy(img), torch.from_numpy(txt))
    got = clip_loss(img, txt)
    np.testing.assert_allclose(_np(got["total_loss"]), want.numpy(),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("G", [1, 4, 10])
def test_clip_count_loss_golden(G):
    B, D = 6, 16
    img = g.standard_normal((B, D)).astype(np.float32)
    txt = g.standard_normal((B, D)).astype(np.float32)  # T=1 templates
    groups = g.standard_normal((B, G, D)).astype(np.float32)
    closs_t, cnt_t, total_t = oracle_clip_count(
        torch.from_numpy(img), torch.from_numpy(txt),
        torch.from_numpy(groups.reshape(B * G, D)), G)
    got = clip_count_loss(img, txt, groups)
    np.testing.assert_allclose(_np(got["clip_loss"]), closs_t.numpy(),
                               rtol=1e-5, atol=1e-5)
    # fp64 (oracle) vs fp32 (TPU) tolerance for the count term.
    np.testing.assert_allclose(_np(got["count_loss"]),
                               cnt_t.to(torch.float32).numpy(),
                               rtol=1e-4, atol=1e-5)
    if G == 1:
        # Degenerate reference shape: the count term must be exactly ~0.
        assert abs(float(got["count_loss"])) < 1e-6


@pytest.mark.parametrize("all_ones_mask", [True, False])
def test_sparc_golden(all_ones_mask):
    B, P, T, D = 4, 10, 7, 16
    v = g.standard_normal((B, P, D)).astype(np.float32)
    l = g.standard_normal((B, T, D)).astype(np.float32)
    if all_ones_mask:
        # The mask the reference actually sees in production (HF pads with
        # eos=49407 while pad_token_id=1, so texts != 1 is all True).
        mask = np.ones((B, T), dtype=np.float32)
    else:
        mask = np.ones((B, T), dtype=np.float32)
        mask[1, 4:] = 0.0
        mask[3, 2:] = 0.0

    got = sparc_loss(v, l, mask, similarity_threshold=0.5,
                     inverse_temperature=0.07)

    if all_ones_mask:
        total_t, global_t, local_t = oracle_sparc(
            torch.from_numpy(v), torch.from_numpy(l), torch.from_numpy(mask))
        np.testing.assert_allclose(_np(got["global_loss"]), global_t.numpy(),
                                   rtol=1e-5, atol=1e-5)
        # Slightly looser: the 0.5 threshold is a discontinuity, so values
        # landing within float eps of it may flip a patch in/out.
        np.testing.assert_allclose(_np(got["local_loss"]), local_t.numpy(),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(_np(got["total_loss"]), total_t.numpy(),
                                   rtol=1e-4, atol=1e-4)
    else:
        # The torch oracle NaNs on real masks (reference latent bug,
        # losses.py:186-196); ours must stay finite.
        total_t, _, _ = oracle_sparc(
            torch.from_numpy(v), torch.from_numpy(l), torch.from_numpy(mask))
        assert torch.isnan(total_t), "oracle is expected to NaN here"
        for k, val in got.items():
            assert np.isfinite(_np(val)).all(), f"{k} not finite"


def test_sparc_partial_mask_matches_oracle_with_safe_rows():
    """With a partial mask, our masked rows contribute 0; verify all valid
    rows agree with a torch oracle that skips the NaN rows."""
    B, P, T, D = 2, 6, 5, 8
    v = g.standard_normal((B, P, D)).astype(np.float32)
    l = g.standard_normal((B, T, D)).astype(np.float32)
    mask = np.ones((B, T), dtype=np.float32)
    mask[0, 3:] = 0.0

    got = sparc_loss(v, l, mask, inverse_temperature=0.07)

    # Build an oracle by restricting each sample to its valid prefix and
    # computing the same masked losses with nan-safe fills.
    def pairwise(a, b, inv=0.07):
        a = F.normalize(a, dim=-1); b = F.normalize(b, dim=-1)
        B_ = a.shape[0]
        return F.cross_entropy(a @ b.t() * inv, torch.arange(B_),
                               reduction="sum") / B_

    vt, lt, mt = torch.from_numpy(v), torch.from_numpy(l), torch.from_numpy(mask)
    v_embed = F.normalize(vt.mean(1), dim=-1)
    lsum = (lt * mt.unsqueeze(-1)).sum(1) / mt.sum(-1, keepdim=True)
    l_embed = F.normalize(lsum, dim=-1)
    global_t = 0.5 * (pairwise(v_embed, l_embed) + pairwise(l_embed, v_embed))
    np.testing.assert_allclose(_np(got["global_loss"]), global_t.numpy(),
                               rtol=1e-5, atol=1e-5)


def test_count_loss_golden():
    B, D, N = 5, 16, 9
    scale = 100.0
    il = (g.standard_normal((B, B)) * 2).astype(np.float32)
    tl = il.T.copy()
    ei = g.standard_normal((B, D)).astype(np.float32)
    ek = g.standard_normal((B, D)).astype(np.float32)
    cf = g.standard_normal((B, N, D)).astype(np.float32)
    closs_t, cnt_t, total_t = oracle_count(
        torch.from_numpy(il), torch.from_numpy(tl), torch.from_numpy(ei),
        torch.from_numpy(ek), torch.from_numpy(cf))
    got = count_loss(il, tl, ei, ek, cf)
    np.testing.assert_allclose(_np(got["clip_loss"]), closs_t.numpy(),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(_np(got["count_loss"]), cnt_t.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(_np(got["total_loss"]), total_t.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_losses_are_jittable_and_differentiable():
    import jax
    import jax.numpy as jnp
    B, P, T, D = 2, 6, 5, 8
    v = jnp.asarray(g.standard_normal((B, P, D)), jnp.float32)
    l = jnp.asarray(g.standard_normal((B, T, D)), jnp.float32)
    mask = jnp.ones((B, T), jnp.float32)

    @jax.jit
    def f(v, l):
        return sparc_loss(v, l, mask, inverse_temperature=0.07)["total_loss"]

    gv, gl = jax.grad(f, argnums=(0, 1))(v, l)
    assert np.isfinite(np.asarray(gv)).all()
    assert np.isfinite(np.asarray(gl)).all()

    @jax.jit
    def h(img, txt):
        return clip_loss(img, txt)["total_loss"]

    gi = jax.grad(h)(v.mean(1), l.mean(1))
    assert np.isfinite(np.asarray(gi)).all()


def test_sparc_stays_finite_under_collapse():
    """Collapsed representations (all patches identical) drive the min-max
    normalization to a degenerate range and the grouped pooling to zero
    vectors; with torch-F.normalize semantics (x/max(||x||, eps)) the loss
    must remain finite — the failure mode observed in long random-data
    training runs."""
    import jax.numpy as jnp
    B, P, T, D = 2, 5, 4, 8
    v = np.ones((B, P, D), np.float32)          # identical patches
    l = np.zeros((B, T, D), np.float32)         # zero token embeddings
    mask = np.ones((B, T), np.float32)
    out = sparc_loss(jnp.asarray(v), jnp.asarray(l), jnp.asarray(mask),
                     inverse_temperature=0.07)
    for k, val in out.items():
        assert np.isfinite(float(val)), (k, float(val))


def test_sparc_grads_finite_with_masked_rows():
    """Regression: a fully-masked token row used to poison the BACKWARD
    with NaN (finfo.max sentinels made sim_max - sim_min overflow to -inf
    in the min-max normalization; the forward stayed finite). Triggered in
    production whenever any caption contained a pad token."""
    import jax
    import jax.numpy as jnp
    g2 = np.random.default_rng(5)
    B, P, T, D = 2, 6, 5, 8
    v = jnp.asarray(g2.normal(size=(B, P, D)).astype(np.float32))
    l = jnp.asarray(g2.normal(size=(B, T, D)).astype(np.float32))
    mask = np.ones((B, T), np.float32)
    mask[0, 3:] = 0.0   # masked token rows
    mask_j = jnp.asarray(mask)

    def loss_fn(v, l):
        return sparc_loss(v, l, mask_j,
                          inverse_temperature=0.07)["total_loss"]

    val = float(loss_fn(v, l))
    gv, gl = jax.grad(loss_fn, argnums=(0, 1))(v, l)
    assert np.isfinite(val)
    assert np.isfinite(np.asarray(gv)).all()
    assert np.isfinite(np.asarray(gl)).all()
