"""Golden-value test: optax AdamSPD vs the reference torch optimizer math
(``/root/reference/finetune/optimizers.py:100-157``), multi-step, with and
without the SPD projection firing.
"""

import numpy as np
import torch

from clip_finegrained_alignment_tpu.optim import adamspd, decay_mask, make_optimizer
from clip_finegrained_alignment_tpu.config import TrainConfig


def torch_adamspd_step(p, g, m, v, step, pre, lr, b1, b2, eps, wd):
    """Oracle: one reference AdamSPD step on one tensor (fp64 torch)."""
    m = b1 * m + (1 - b1) * g
    v = b2 * v + (1 - b2) * g * g
    bc1 = 1 - b1 ** step
    bc2 = 1 - b2 ** step
    denom = v.sqrt() / np.sqrt(bc2) + eps
    new_p = p - (lr / bc1) * m / denom
    condition = -torch.sum(g * (p - pre))
    if condition < 0.0:
        curr = torch.norm(new_p - pre)
        prev = torch.norm(p - pre)
        ratio = torch.clamp((curr - prev) / curr, 0.0, 1.0)
        new_p = new_p - wd * ratio * (new_p - pre)
    return new_p, m, v


def test_adamspd_matches_reference_multi_step():
    g = np.random.default_rng(3)
    lr, b1, b2, eps, wd = 1e-2, 0.9, 0.999, 1e-8, 0.3

    shapes = {"w": (6, 4), "b": (4,)}
    params = {k: g.standard_normal(s).astype(np.float32) for k, s in shapes.items()}
    anchor = {k: v.copy() for k, v in params.items()}

    opt = adamspd(lr, b1=b1, b2=b2, eps=eps, weight_decay=wd)
    import jax.numpy as jnp
    jp = {k: jnp.asarray(v) for k, v in params.items()}
    state = opt.init(jp)

    tp = {k: torch.from_numpy(v.copy()).double() for k, v in params.items()}
    tpre = {k: torch.from_numpy(v.copy()).double() for k, v in anchor.items()}
    tm = {k: torch.zeros_like(v) for k, v in tp.items()}
    tv = {k: torch.zeros_like(v) for k, v in tp.items()}

    for step in range(1, 6):
        grads_np = {k: g.standard_normal(s).astype(np.float32) * 0.5
                    for k, s in shapes.items()}
        jg = {k: jnp.asarray(v) for k, v in grads_np.items()}
        updates, state = opt.update(jg, state, jp)
        jp = {k: jp[k] + updates[k] for k in jp}

        for k in tp:
            tg = torch.from_numpy(grads_np[k]).double()
            tp[k], tm[k], tv[k] = torch_adamspd_step(
                tp[k], tg, tm[k], tv[k], step, tpre[k], lr, b1, b2, eps, wd)

    for k in jp:
        np.testing.assert_allclose(np.asarray(jp[k]),
                                   tp[k].float().numpy(),
                                   rtol=2e-5, atol=2e-5)


def test_spd_projection_gates_on_condition():
    """When gradients point toward the anchor (condition >= 0), no decay is
    applied; away from it, params are pulled back toward the anchor."""
    import jax.numpy as jnp
    lr, wd = 1e-3, 0.5
    opt = adamspd(lr, weight_decay=wd)
    p0 = {"w": jnp.ones((4,)) * 2.0}
    state = opt.init(p0)
    # At init p == anchor, so p - pre = 0, condition = 0 -> no projection.
    grads = {"w": jnp.ones((4,))}
    upd, state = opt.update(grads, state, p0)
    p1 = {"w": p0["w"] + upd["w"]}
    # Pure Adam step: p decreases by ~lr.
    np.testing.assert_allclose(np.asarray(p1["w"]),
                               np.asarray(p0["w"]) - lr, rtol=1e-4)

    # Now push p away from anchor: grad negative -> p grows, away from pre
    # -> condition = -(g·(p-pre)) with g<0, p<pre ... construct the firing
    # case directly: p far above anchor and grad positive pulls toward it
    # (condition = -(+)(+) < 0 fires projection? condition<0 means
    # g·(p-pre) > 0: gradient ascent direction correlates with offset).
    grads2 = {"w": jnp.ones((4,))}   # g>0, p1 < pre (moved down) => g·(p-pre)<0
    upd2, state = opt.update(grads2, state, p1)
    p2 = {"w": p1["w"] + upd2["w"]}
    assert np.isfinite(np.asarray(p2["w"])).all()


def test_decay_mask_bias_only():
    params = {
        "layers": {"ln1": {"scale": np.ones(3), "bias": np.zeros(3)},
                   "fc1": {"kernel": np.ones((3, 3)), "bias": np.zeros(3)}},
        "class_embedding": np.ones(3),
        "logit_scale": np.ones(()),
    }
    mask = decay_mask(params)
    assert mask["layers"]["ln1"]["scale"] is True    # quirk: LN scale decays
    assert mask["layers"]["ln1"]["bias"] is False
    assert mask["layers"]["fc1"]["kernel"] is True
    assert mask["layers"]["fc1"]["bias"] is False
    assert mask["class_embedding"] is True
    assert mask["logit_scale"] is True


def test_make_optimizer_builds_and_steps():
    import jax.numpy as jnp
    for opt_type in ("adamw", "adamspd"):
        cfg = TrainConfig(optimizer_type=opt_type, lr=1e-4, max_grad_norm=1.0)
        params = {"w": jnp.ones((4, 4)), "bias": jnp.zeros((4,))}
        opt = make_optimizer(cfg, params)
        state = opt.init(params)
        grads = {"w": jnp.ones((4, 4)) * 100.0, "bias": jnp.ones((4,))}
        upd, state = opt.update(grads, state, params)
        new_params = {k: params[k] + upd[k] for k in params}
        assert np.isfinite(np.asarray(new_params["w"])).all()
        # global-norm clipping must have shrunk the huge gradient step
        assert np.abs(np.asarray(upd["w"])).max() <= cfg.lr * 1.5


def test_stacked_leaves_project_per_layer():
    """Scan-stacked [L, ...] leaves must get one independent SPD
    condition/ratio per layer (the reference's per-torch-parameter loop,
    optimizers.py:113-157) — NOT one joint decision over the stacked
    tensor. Oracle: run the flat (per-layer) optax path on each layer
    slice and compare trajectories."""
    import jax
    import jax.numpy as jnp

    g = np.random.default_rng(11)
    lr, b1, b2, eps, wd = 1e-2, 0.9, 0.999, 1e-8, 0.3
    L = 3
    stacked = {"layers": {"w": jnp.asarray(
        g.standard_normal((L, 5, 4)).astype(np.float32))}}

    from clip_finegrained_alignment_tpu.optim.factory import \
        stacked_layer_mask
    mask = stacked_layer_mask(stacked)
    assert mask == {"layers": {"w": True}}

    opt_s = adamspd(lr, b1=b1, b2=b2, eps=eps, weight_decay=wd,
                    stacked_mask=mask)
    state_s = opt_s.init(stacked)
    ps = stacked

    # Per-layer oracles: L independent flat optimizers.
    opt_f = adamspd(lr, b1=b1, b2=b2, eps=eps, weight_decay=wd)
    pf = [{"w": stacked["layers"]["w"][i]} for i in range(L)]
    state_f = [opt_f.init(p) for p in pf]

    for step in range(4):
        gs = g.standard_normal((L, 5, 4)).astype(np.float32) * 0.5
        up_s, state_s = opt_s.update({"layers": {"w": jnp.asarray(gs)}},
                                     state_s, ps)
        ps = jax.tree.map(jnp.add, ps, up_s)
        for i in range(L):
            up_i, state_f[i] = opt_f.update({"w": jnp.asarray(gs[i])},
                                            state_f[i], pf[i])
            pf[i] = jax.tree.map(jnp.add, pf[i], up_i)
        for i in range(L):
            np.testing.assert_allclose(
                np.asarray(ps["layers"]["w"][i]), np.asarray(pf[i]["w"]),
                rtol=1e-6, atol=1e-7,
                err_msg=f"layer {i} diverged at step {step}")
