"""Pallas kernel validation against the XLA reference paths (interpret mode
on CPU; the same kernels compile natively on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_finegrained_alignment_tpu.models.clip import _xla_attention
from clip_finegrained_alignment_tpu.objectives import losses as L
from clip_finegrained_alignment_tpu.ops.attention import flash_attention
from clip_finegrained_alignment_tpu.ops.sparc_kernel import (
    _reference_chain, fused_sparc_pooling)


def make_qkv(rng, B=2, H=4, S=19, D=16):
    q = rng.normal(size=(B, H, S, D)).astype(np.float32)
    k = rng.normal(size=(B, H, S, D)).astype(np.float32)
    v = rng.normal(size=(B, H, S, D)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


# ---------------------------------------------------------------------------
# Fused attention
# ---------------------------------------------------------------------------

def test_attention_forward_matches_xla_no_bias(rng):
    q, k, v = make_qkv(rng)
    scale = (q.shape[-1]) ** -0.5
    ours = flash_attention(q, k, v, None, scale)
    ref = _xla_attention(q, k, v, None, scale)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_attention_forward_matches_xla_with_bias(rng):
    """Causal + padding bias, exactly like the text tower."""
    B, H, S, D = 2, 2, 13, 8
    q, k, v = make_qkv(rng, B, H, S, D)
    causal = jnp.triu(jnp.full((S, S), -1e9, jnp.float32), k=1)
    pad = np.zeros((B, S), np.float32)
    pad[0, 9:] = -1e9   # sample 0: last 4 keys padded
    bias = causal[None, None] + jnp.asarray(pad)[:, None, None, :]
    scale = D ** -0.5
    ours = flash_attention(q, k, v, bias, scale)
    ref = _xla_attention(q, k, v, bias, scale)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_attention_grads_match_xla(rng):
    B, H, S, D = 2, 2, 11, 8
    q, k, v = make_qkv(rng, B, H, S, D)
    causal = jnp.triu(jnp.full((S, S), -1e9, jnp.float32), k=1)[None, None]
    scale = D ** -0.5

    def loss_ours(q, k, v):
        return (flash_attention(q, k, v, causal, scale) ** 2).sum()

    def loss_ref(q, k, v):
        return (_xla_attention(q, k, v, causal, scale) ** 2).sum()

    go = jax.grad(loss_ours, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(go, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_attention_odd_head_count(rng):
    """H not divisible by the head-group falls back to smaller groups."""
    q, k, v = make_qkv(rng, B=1, H=3, S=9, D=8)
    scale = 8 ** -0.5
    ours = flash_attention(q, k, v, None, scale)
    ref = _xla_attention(q, k, v, None, scale)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_model_forward_pallas_matches_xla(rng):
    """Whole tiny-model forward: use_pallas=True vs False."""
    from clip_finegrained_alignment_tpu.config import CLIPConfig
    from clip_finegrained_alignment_tpu.models import clip as m
    cfg = CLIPConfig.tiny_test()
    params = m.init_clip_params(jax.random.key(0), cfg)
    px = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    ids = rng.integers(1, 200, size=(2, 16)).astype(np.int32)
    ids[:, -1] = cfg.text.eos_token_id
    ids = jnp.asarray(ids)
    a = m.clip_forward(params, px, ids, cfg, use_pallas=False)
    b = m.clip_forward(params, px, ids, cfg, use_pallas=True)
    np.testing.assert_allclose(np.asarray(a.logits_per_image),
                               np.asarray(b.logits_per_image),
                               rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# Fused SPARC pooling
# ---------------------------------------------------------------------------

def make_sparc_inputs(rng, B=3, P=10, T=7, D=12):
    v = jnp.asarray(rng.normal(size=(B, P, D)).astype(np.float32))
    l = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    mask = np.ones((B, T), np.float32)
    mask[0, T // 2:] = 0.0      # partially padded first sample
    return v, l, jnp.asarray(mask)


def test_fused_sparc_matches_unfused(rng):
    v, l, mask = make_sparc_inputs(rng)
    ours = fused_sparc_pooling(v, l, mask, 0.5)
    ref = _reference_chain(v, l, mask, 0.5)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("threshold", [0.0, 0.5, 0.95])
def test_fused_sparc_thresholds(rng, threshold):
    v, l, mask = make_sparc_inputs(rng, B=2, P=17, T=9, D=8)
    ours = fused_sparc_pooling(v, l, mask, threshold)
    ref = _reference_chain(v, l, mask, threshold)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_sparc_grads_match_unfused(rng):
    v, l, mask = make_sparc_inputs(rng, B=2, P=6, T=5, D=8)

    g1 = jax.grad(lambda v, l: (fused_sparc_pooling(v, l, mask, 0.5)
                                ** 2).sum(), argnums=(0, 1))(v, l)
    g2 = jax.grad(lambda v, l: (_reference_chain(v, l, mask, 0.5)
                                ** 2).sum(), argnums=(0, 1))(v, l)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("threshold", [0.0, 0.5, 0.95])
def test_fused_sparc_vjp_random_cotangent(rng, threshold):
    """The fused BACKWARD kernel (not just grad-of-sum) must reproduce
    jax.vjp of the unfused chain for arbitrary cotangents, including an
    all-pad token row and a zero patch row."""
    v, l, mask = make_sparc_inputs(rng, B=3, P=11, T=6, D=16)
    mask = np.array(mask)                  # writable copy
    mask[1, :] = 0.0                       # fully-masked sample
    mask = jnp.asarray(mask)
    v = v.at[2, 4].set(0.0)                # exactly-zero patch row
    g = jnp.asarray(rng.normal(size=(3, 6, 16)).astype(np.float32))

    _, vjp_fused = jax.vjp(
        lambda vp, lt: fused_sparc_pooling(vp, lt, mask, threshold), v, l)
    _, vjp_ref = jax.vjp(
        lambda vp, lt: _reference_chain(vp, lt, mask, threshold), v, l)
    for a, b in zip(vjp_fused(g), vjp_ref(g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_fused_sparc_vjp_bf16_inputs(rng):
    """bf16 inputs: cotangents come back in the input dtype, matching the
    astype-transpose of the unfused chain."""
    v, l, mask = make_sparc_inputs(rng, B=2, P=9, T=5, D=8)
    v16, l16 = v.astype(jnp.bfloat16), l.astype(jnp.bfloat16)
    g = jnp.asarray(rng.normal(size=(2, 5, 8)).astype(np.float32))
    _, vjp_fused = jax.vjp(
        lambda vp, lt: fused_sparc_pooling(vp, lt, mask, 0.5), v16, l16)
    _, vjp_ref = jax.vjp(
        lambda vp, lt: _reference_chain(vp, lt, mask, 0.5), v16, l16)
    for a, b in zip(vjp_fused(g), vjp_ref(g)):
        assert a.dtype == b.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=2e-2, atol=2e-2)


def test_sparc_loss_fused_flag_equivalence(rng):
    v, l, mask = make_sparc_inputs(rng)
    a = L.sparc_loss(v, l, mask, inverse_temperature=0.07, use_fused=False)
    b = L.sparc_loss(v, l, mask, inverse_temperature=0.07, use_fused=True)
    np.testing.assert_allclose(float(a["total_loss"]),
                               float(b["total_loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(a["local_loss"]),
                               float(b["local_loss"]), rtol=1e-5)


# ---------------------------------------------------------------------------
# Blockwise flash attention (long-sequence variant)
# ---------------------------------------------------------------------------

def test_blockwise_forward_matches_xla(rng):
    from clip_finegrained_alignment_tpu.ops.flash_attention import \
        blockwise_flash_attention
    B, H, S, D = 1, 2, 160, 16     # S spans multiple 64-blocks + padding
    q, k, v = make_qkv(rng, B, H, S, D)
    scale = D ** -0.5
    ours = blockwise_flash_attention(q, k, v, None, scale, 64, 64)
    ref = _xla_attention(q, k, v, None, scale)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_blockwise_forward_with_causal_bias(rng):
    from clip_finegrained_alignment_tpu.ops.flash_attention import \
        blockwise_flash_attention
    B, H, S, D = 2, 1, 96, 8
    q, k, v = make_qkv(rng, B, H, S, D)
    causal = jnp.triu(jnp.full((S, S), -1e9, jnp.float32), k=1)[None, None]
    scale = D ** -0.5
    ours = blockwise_flash_attention(q, k, v, causal, scale, 32, 32)
    ref = _xla_attention(q, k, v, causal, scale)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_blockwise_grads_match_xla(rng):
    from clip_finegrained_alignment_tpu.ops.flash_attention import \
        blockwise_flash_attention
    B, H, S, D = 1, 2, 80, 8
    q, k, v = make_qkv(rng, B, H, S, D)
    scale = D ** -0.5

    go = jax.grad(lambda q, k, v: (blockwise_flash_attention(
        q, k, v, None, scale, 32, 32) ** 2).sum(), argnums=(0, 1, 2))(
        q, k, v)
    gr = jax.grad(lambda q, k, v: (_xla_attention(
        q, k, v, None, scale) ** 2).sum(), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(go, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# Kernels inside shard_map (the DDP-parity train path)
# ---------------------------------------------------------------------------

def test_fused_sparc_inside_shard_map(rng):
    """Fused SPARC must work inside jax.shard_map (the DDP-parity train
    path) — regression for the --fused-sparc + parity-mode train CLI
    (caught by an end-to-end drive; test_cli only covered
    loss_type=clip). On TPU the compiled kernels declare their varying
    mesh axes via out_shape vma; off-TPU the wrapper falls back to the
    pinned XLA chain (Pallas's interpreter cannot evaluate kernel bodies
    under vma tracking), so this test covers dispatch + math."""
    from jax.sharding import PartitionSpec as P
    from clip_finegrained_alignment_tpu.parallel import mesh as pmesh

    mesh = pmesh.make_mesh()
    n = jax.device_count()
    v, l, mask = make_sparc_inputs(rng, B=2 * n, P=10, T=7, D=12)

    def body(v_sh, l_sh, m_sh):
        return jax.grad(lambda vp, lt: (fused_sparc_pooling(
            vp, lt, m_sh, 0.5) ** 2).sum(), argnums=(0, 1))(v_sh, l_sh)

    sharded = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(pmesh.DATA_AXIS), P(pmesh.DATA_AXIS),
                  P(pmesh.DATA_AXIS)),
        out_specs=(P(pmesh.DATA_AXIS), P(pmesh.DATA_AXIS)))
    gv, gl = jax.jit(sharded)(v, l, mask)

    # The op is per-batch-element independent and the loss is a sum over
    # the batch, so the concatenated per-shard grads equal the full-batch
    # grad of the unfused XLA chain.
    rv, rl = jax.grad(lambda vp, lt: (_reference_chain(
        vp, lt, mask, 0.5) ** 2).sum(), argnums=(0, 1))(v, l)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(rv),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gl), np.asarray(rl),
                               rtol=1e-4, atol=1e-5)


def test_pallas_attention_inside_shard_map(rng):
    """Same shard_map regression for the fused attention kernel."""
    from jax.sharding import PartitionSpec as P
    from clip_finegrained_alignment_tpu.parallel import mesh as pmesh

    mesh = pmesh.make_mesh()
    n = jax.device_count()
    B, H, S, D = n, 2, 13, 8
    q, k, v = make_qkv(rng, B, H, S, D)
    scale = D ** -0.5

    def body(q_sh, k_sh, v_sh):
        out = flash_attention(q_sh, k_sh, v_sh, None, scale)
        return jax.lax.pmean((out ** 2).sum(), pmesh.DATA_AXIS)

    sharded = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(pmesh.DATA_AXIS), P(pmesh.DATA_AXIS),
                  P(pmesh.DATA_AXIS)),
        out_specs=P())
    got = float(jax.jit(sharded)(q, k, v))
    ref = float((_xla_attention(q, k, v, None, scale) ** 2).sum() / n)
    np.testing.assert_allclose(got, ref, rtol=1e-4)


def test_fused_sparc_tiny_norm_rows(rng):
    """Rows with 0 < ||x|| < l2_normalize's eps (1e-12) must divide by
    eps (torch F.normalize semantics), identically in the fused forward,
    the fused backward's recompute, and the unfused chain — regression
    for a fwd kernel that divided tiny rows by their true norm."""
    v, l, mask = make_sparc_inputs(rng, B=2, P=6, T=5, D=8)
    v = v.at[0, 2].set(1e-13)              # tiny-but-nonzero patch row
    l = l.at[1, 3].set(-1e-13)             # tiny-but-nonzero token row
    out_f = fused_sparc_pooling(v, l, mask, 0.5)
    out_r = _reference_chain(v, l, mask, 0.5)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               rtol=1e-5, atol=1e-6)
    g = jnp.asarray(rng.normal(size=out_r.shape).astype(np.float32))
    _, vjp_f = jax.vjp(lambda a, b: fused_sparc_pooling(a, b, mask, 0.5),
                       v, l)
    _, vjp_r = jax.vjp(lambda a, b: _reference_chain(a, b, mask, 0.5),
                       v, l)
    for a, b in zip(vjp_f(g), vjp_r(g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# bshd-layout fused attention (in-kernel head transpose)
# ---------------------------------------------------------------------------

def test_attention_bshd_layout_matches_bhsd(rng):
    """layout="bshd" ([B, S, H, D] operands, head reorder in VMEM) must
    reproduce the bhsd kernel exactly — fwd and grads — including padded
    sequences (S=19 pads to 24)."""
    B, H, S, D = 2, 4, 19, 16
    q, k, v = make_qkv(rng, B, H, S, D)
    pad = np.zeros((B, S), np.float32)
    pad[1, 15:] = -1e9
    bias = jnp.asarray(pad)[:, None, None, :]
    scale = D ** -0.5

    qs, ks, vs = (jnp.swapaxes(x, 1, 2) for x in (q, k, v))
    ours = flash_attention(qs, ks, vs, bias, scale, layout="bshd")
    ref = flash_attention(q, k, v, bias, scale)
    np.testing.assert_allclose(np.asarray(jnp.swapaxes(ours, 1, 2)),
                               np.asarray(ref), rtol=2e-5, atol=2e-5)

    def loss_bshd(q, k, v):
        return (flash_attention(q, k, v, bias, scale,
                                layout="bshd") ** 2).sum()

    def loss_bhsd(q, k, v):
        return (flash_attention(q, k, v, bias, scale) ** 2).sum()

    g_ours = jax.grad(loss_bshd, argnums=(0, 1, 2))(qs, ks, vs)
    g_ref = jax.grad(loss_bhsd, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ours, g_ref):
        np.testing.assert_allclose(np.asarray(jnp.swapaxes(a, 1, 2)),
                                   np.asarray(b), rtol=2e-4, atol=2e-4)


def test_model_attention_pallas_bshd_path(rng, monkeypatch):
    """models.clip.attention with use_pallas under CFA_ATTN_LAYOUT=bshd
    routes through the bshd kernel and matches the XLA path."""
    from clip_finegrained_alignment_tpu.models import clip as m

    B, S, D, H = 2, 9, 32, 4
    x = jnp.asarray(rng.normal(size=(B, S, D)), jnp.float32)
    p = {kk: {"kernel": jnp.asarray(rng.normal(size=(D, D)),
                                    jnp.float32) * 0.1,
              "bias": jnp.asarray(rng.normal(size=(D,)),
                                  jnp.float32) * 0.1}
         for kk in ("q", "k", "v", "out")}
    bias = jnp.triu(jnp.full((S, S), -1e9, jnp.float32), k=1)[None, None]

    monkeypatch.setenv("CFA_ATTN_LAYOUT", "bshd")
    got = m.attention(p, x, bias, H, dtype=jnp.float32, use_pallas=True)
    want = m.attention(p, x, bias, H, dtype=jnp.float32, use_pallas=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_model_attention_flat_layout_matches_default(rng, monkeypatch):
    """CFA_ATTN_LAYOUT=flat (rank-3 gemms, heads folded into the batch
    dim) must be bit-identical to the default bshd layout at fp32 —
    same math, different HLO phrasing (perf probe for the B/32 relayout
    copies, models/clip.py::_xla_attention_flat)."""
    from clip_finegrained_alignment_tpu.models import clip as m

    B, S, D, H = 2, 9, 32, 4
    x = jnp.asarray(rng.normal(size=(B, S, D)), jnp.float32)
    p = {kk: {"kernel": jnp.asarray(rng.normal(size=(D, D)),
                                    jnp.float32) * 0.1,
              "bias": jnp.asarray(rng.normal(size=(D,)),
                                  jnp.float32) * 0.1}
         for kk in ("q", "k", "v", "out")}
    bias = jnp.triu(jnp.full((S, S), -1e9, jnp.float32), k=1)[None, None]

    monkeypatch.setenv("CFA_ATTN_LAYOUT", "bshd")
    want = m.attention(p, x, bias, H, dtype=jnp.float32)
    monkeypatch.setenv("CFA_ATTN_LAYOUT", "flat")
    got = m.attention(p, x, bias, H, dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # and with no bias (vision-tower form)
    monkeypatch.setenv("CFA_ATTN_LAYOUT", "bshd")
    want = m.attention(p, x, None, H, dtype=jnp.float32)
    monkeypatch.setenv("CFA_ATTN_LAYOUT", "flat")
    got = m.attention(p, x, None, H, dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_model_attention_fused_qkv_matches_default(rng, monkeypatch):
    """CFA_FUSED_QKV=1 (one [D, 3D] projection GEMM, trace-time kernel
    concat — models/clip.py::_fused_qkv) must match the three-GEMM
    default: forward bit-identical at fp32 (same contractions, only the
    dispatch granularity changes), grads to fp32 rounding (the dgrad
    slices associate differently)."""
    from clip_finegrained_alignment_tpu.models import clip as m

    B, S, D, H = 2, 9, 32, 4
    x = jnp.asarray(rng.normal(size=(B, S, D)), jnp.float32)
    p = {kk: {"kernel": jnp.asarray(rng.normal(size=(D, D)),
                                    jnp.float32) * 0.1,
              "bias": jnp.asarray(rng.normal(size=(D,)),
                                  jnp.float32) * 0.1}
         for kk in ("q", "k", "v", "out")}
    bias = jnp.triu(jnp.full((S, S), -1e9, jnp.float32), k=1)[None, None]

    def loss(p, x):
        return (m.attention(p, x, bias, H, dtype=jnp.float32) ** 2).sum()

    monkeypatch.setenv("CFA_FUSED_QKV", "0")
    want = m.attention(p, x, bias, H, dtype=jnp.float32)
    g_want = jax.grad(loss)(p, x)
    monkeypatch.setenv("CFA_FUSED_QKV", "1")
    got = m.attention(p, x, bias, H, dtype=jnp.float32)
    g_got = jax.grad(loss)(p, x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    for kk in ("q", "k", "v", "out"):
        for leaf in ("kernel", "bias"):
            np.testing.assert_allclose(
                np.asarray(g_got[kk][leaf]), np.asarray(g_want[kk][leaf]),
                rtol=1e-5, atol=1e-6)


def test_pallas_head_group_respects_bshd_tiling(rng):
    """bshd blocks are [1, Sp, G, D]; Mosaic requires the second-to-last
    block dim divisible by 8 or equal to the array dim, so _prepare must
    only ever pick G in {H} ∪ {divisors of H that are multiples of 8}
    under layout="bshd" (round-5 lowering failure: auto G=6 at H=12,
    perf/sweep_r5b.log). bhsd blocks [1, G, Sp, D] are unconstrained."""
    from clip_finegrained_alignment_tpu.ops.attention import _prepare

    def group(B, S, H, D, layout, head_group=0):
        q = jnp.zeros((B, S, H, D) if layout == "bshd" else (B, H, S, D),
                      jnp.float32)
        *_, (_, _, _, _, _, G) = _prepare(q, q, q, None, 1.0, head_group,
                                          layout)
        return G

    # ViT-B vision (H=12) / text (H=8): only G == H is bshd-valid.
    assert group(2, 197, 12, 64, "bshd") == 12
    assert group(2, 197, 12, 64, "bshd", head_group=2) == 12
    assert group(2, 77, 8, 64, "bshd") == 8
    # ViT-L/14@336 vision (H=16, S=577): {8, 16} valid; nothing fits the
    # VMEM budget, so the smallest valid group is taken.
    assert group(1, 577, 16, 64, "bshd") == 8
    # bhsd: any divisor of H; explicit requests land on a divisor.
    assert 12 % group(2, 197, 12, 64, "bhsd") == 0
    assert group(2, 197, 12, 64, "bhsd", head_group=4) == 4


def test_flash_attention_bshd_infeasible_falls_back(rng):
    """At ViT-B/16's vision geometry (H=12, S=197) no bshd head-group is
    both tile-valid and VMEM-feasible (G must be 12; its backward cell
    needs ~22 MB vs the 16 MB core — perf/sweep_r5b.log round 5), so the
    wrapper must transparently route through the bhsd kernel and still
    match the XLA reference path."""
    from clip_finegrained_alignment_tpu.models.clip import \
        _xla_attention_bshd
    from clip_finegrained_alignment_tpu.ops.attention import (
        _bshd_geometry_feasible, flash_attention)

    assert not _bshd_geometry_feasible(12, 197, 64)   # B/16 vision
    assert _bshd_geometry_feasible(12, 50, 64)        # B/32 vision
    assert _bshd_geometry_feasible(8, 77, 64)         # B-class text

    B, S, H, D = 1, 197, 12, 64
    q, k, v = (jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
               for _ in range(3))
    got = flash_attention(q, k, v, None, D ** -0.5, layout="bshd")
    want = _xla_attention_bshd(q, k, v, None, D ** -0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
