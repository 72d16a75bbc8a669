"""Golden tests that execute the REFERENCE code itself as the oracle.

Round-1 golden tests re-derived the reference math in torch
(``tests/test_losses.py``); a transcription error there would be invisible.
These tests instead import the actual modules from ``/root/reference`` (torch
CPU, works offline) and compare our JAX implementations against their live
outputs:

* ``finetune/losses.py``  — CustomCLIPLoss / CLIPCountLoss / SPARCLoss /
  CountLoss called directly (losses.py:7,39,136,267).
* ``finetune/optimizers.py`` — AdamSPD multi-step trajectories with the
  ``'pre'`` anchor param-group wiring (optimizers.py:31-157,
  finetuner.py:86-101).
* ``count-bench/cb_eval.py`` — ``generate_templates`` / ``arrange_templates``
  / ``extract_number`` string-level parity over many captions
  (cb_eval.py:90-182).
* ``vlms-are-blind/eval.py`` — ``get_task_templates`` /
  ``generate_negative_templates`` / ``validate_groundtruth`` parity over all
  9 tasks (eval.py:98-238).

The reference model loaders (HF ``from_pretrained``) are stubbed out so the
evaluator ``__init__``s run offline; every constant the template logic uses
still comes from the reference source.
"""

import importlib
import sys
import types

import numpy as np
import pytest
import torch

REF = "/root/reference"


def _import_ref(subdir: str, name: str):
    """Import a reference module with its directory on sys.path (the
    reference uses sibling imports, e.g. losses.py imports config)."""
    path = f"{REF}/{subdir}"
    if name in sys.modules:
        return sys.modules[name]
    sys.path.insert(0, path)
    try:
        return importlib.import_module(name)
    finally:
        sys.path.remove(path)


ref_losses = _import_ref("finetune", "losses")
ref_optim = _import_ref("finetune", "optimizers")


def _t(x):
    return torch.from_numpy(np.asarray(x))


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------

def test_custom_clip_loss_vs_reference():
    rng = np.random.default_rng(0)
    img = rng.standard_normal((8, 16)).astype(np.float32)
    txt = rng.standard_normal((8, 16)).astype(np.float32)

    ref = ref_losses.CustomCLIPLoss(temperature=0.07)(_t(img), _t(txt))

    from clip_finegrained_alignment_tpu.objectives.losses import clip_loss
    ours = clip_loss(img, txt, temperature=0.07)

    for k in ("clip_loss", "total_loss"):
        np.testing.assert_allclose(float(ours[k]), float(ref[k]),
                                   rtol=1e-5, atol=1e-6)


def test_clip_count_loss_forward_vs_reference():
    """Forward parity incl. the template-expanded CLIP term
    (losses.py:92-133). count_features=None -> count term exactly 0."""
    rng = np.random.default_rng(1)
    B, T, D = 4, 3, 16
    img = rng.standard_normal((B, D)).astype(np.float32)
    txt = rng.standard_normal((B * T, D)).astype(np.float32)

    ref = ref_losses.CLIPCountLoss(temperature=0.07, count_alpha=0.5)(
        _t(img), _t(txt), None)

    from clip_finegrained_alignment_tpu.objectives.losses import clip_count_loss
    ours = clip_count_loss(img, txt, None, temperature=0.07, count_alpha=0.5)

    for k in ("clip_loss", "count_loss", "total_loss"):
        np.testing.assert_allclose(float(ours[k]), float(ref[k]),
                                   rtol=1e-5, atol=1e-6)


def test_grouped_count_term_vs_reference():
    """The grouped contrastive count term, called directly on [B] images ×
    [B*G] captions (losses.py:46-90; reference runs it in fp64 — fp32 here,
    tolerance covers the gap)."""
    rng = np.random.default_rng(2)
    B, G, D = 5, 4, 16
    ei = rng.standard_normal((B, D)).astype(np.float32)
    ek = rng.standard_normal((B * G, D)).astype(np.float32)
    counts = torch.arange(B * G)  # only .size(0) is used by the reference

    mod = ref_losses.CLIPCountLoss(temperature=0.07)
    ref = mod.count_loss(_t(ei), _t(ek), counts)

    from clip_finegrained_alignment_tpu.objectives.losses import grouped_count_loss
    ours = grouped_count_loss(ei, ek.reshape(B, G, D), temperature=0.07)

    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5, atol=1e-6)


def _sparc_cfg(inv_temp=0.07, thr=0.5):
    return types.SimpleNamespace(
        similarity_threshold=thr, global_loss_weight=1.0,
        local_loss_weight=1.0, inverse_temperature=inv_temp)


@pytest.mark.parametrize("inv_temp,thr", [(0.07, 0.5), (1.0, 0.3)])
def test_sparc_loss_vs_reference_all_valid_mask(inv_temp, thr):
    """Full 7-entry SPARC dict vs the live reference module under the
    all-ones language mask — the reference's de-facto training regime (HF
    pads with 49407 while pad_token_id=1, so ``texts != pad`` is all ones,
    finetuner.py:114-116)."""
    rng = np.random.default_rng(3)
    B, P, T, D = 4, 10, 7, 16
    v = rng.standard_normal((B, P, D)).astype(np.float32)
    l = rng.standard_normal((B, T, D)).astype(np.float32)
    mask = np.ones((B, T), dtype=bool)

    ref = ref_losses.SPARCLoss(_sparc_cfg(inv_temp, thr))(
        _t(v), _t(l), _t(mask))

    from clip_finegrained_alignment_tpu.objectives.losses import sparc_loss
    ours = sparc_loss(v, l, mask, similarity_threshold=thr,
                      inverse_temperature=inv_temp)

    assert set(ours) == set(ref)
    for k in ref:
        np.testing.assert_allclose(float(ours[k]), float(ref[k]),
                                   rtol=3e-5, atol=1e-5, err_msg=k)


def test_sparc_loss_vs_reference_partial_mask():
    """With real pad tokens the reference's -inf fills NaN out the local
    terms (losses.py:186,229-232) — the documented hazard our finite-fill
    guards remove. The *global* terms stay finite in both; compare those
    exactly, and pin the behavioral difference on the local ones."""
    rng = np.random.default_rng(4)
    B, P, T, D = 4, 10, 7, 16
    v = rng.standard_normal((B, P, D)).astype(np.float32)
    l = rng.standard_normal((B, T, D)).astype(np.float32)
    mask = np.ones((B, T), dtype=bool)
    mask[:, 5:] = False  # trailing pad, like real tokenized captions

    ref = ref_losses.SPARCLoss(_sparc_cfg())(_t(v), _t(l), _t(mask))

    from clip_finegrained_alignment_tpu.objectives.losses import sparc_loss
    ours = sparc_loss(v, l, mask, inverse_temperature=0.07)

    for k in ("global_loss", "loss_vl", "loss_lv"):
        np.testing.assert_allclose(float(ours[k]), float(ref[k]),
                                   rtol=3e-5, atol=1e-5, err_msg=k)
    # Reference local terms NaN on padded batches; ours are finite.
    assert not np.isfinite(float(ref["local_loss"]))
    assert np.isfinite(float(ours["local_loss"]))


def test_count_loss_vs_reference():
    rng = np.random.default_rng(5)
    B, N, D = 6, 9, 16
    scale = 20.0
    ei = rng.standard_normal((B, D)).astype(np.float32)
    ek = rng.standard_normal((B, D)).astype(np.float32)
    ek_cf = rng.standard_normal((B, N, D)).astype(np.float32)
    # Logits as the reference computes them (logit-scaled cosine sims).
    ei_n = ei / np.linalg.norm(ei, axis=-1, keepdims=True)
    ek_n = ek / np.linalg.norm(ek, axis=-1, keepdims=True)
    img_logits = (ei_n @ ek_n.T * scale).astype(np.float32)

    ref = ref_losses.CountLoss(temperature=0.07, alpha=1.0)(
        _t(img_logits), _t(img_logits.T), _t(ei), _t(ek), _t(ek_cf))

    from clip_finegrained_alignment_tpu.objectives.losses import count_loss
    ours = count_loss(img_logits, img_logits.T, ei, ek, ek_cf,
                      temperature=0.07, alpha=1.0)

    for k in ("clip_loss", "count_loss", "total_loss"):
        np.testing.assert_allclose(float(ours[k]), float(ref[k]),
                                   rtol=1e-5, atol=1e-5, err_msg=k)


# ---------------------------------------------------------------------------
# AdamSPD
# ---------------------------------------------------------------------------

def _run_reference_adamspd(params0, anchors, grads_per_step, lr, betas, eps,
                           wd, amsgrad):
    """Drive the actual reference AdamSPD with the finetuner's param-group
    wiring (finetuner.py:86-101)."""
    tparams = [torch.nn.Parameter(_t(p.copy())) for p in params0]
    pre = [_t(a.copy()) for a in anchors]
    opt = ref_optim.AdamSPD(
        [{"params": tparams, "pre": pre}],
        lr=lr, betas=betas, eps=eps, weight_decay=wd, amsgrad=amsgrad)
    for grads in grads_per_step:
        for p, g in zip(tparams, grads):
            p.grad = _t(g.copy())
        opt.step()
    return [p.detach().numpy() for p in tparams]


@pytest.mark.parametrize("amsgrad", [False, True])
def test_adamspd_trajectory_vs_reference(amsgrad):
    import jax.numpy as jnp
    from clip_finegrained_alignment_tpu.optim import adamspd

    rng = np.random.default_rng(6)
    lr, betas, eps, wd = 1e-2, (0.9, 0.98), 5e-6, 0.3
    shapes = [(6, 4), (4,), (3, 3, 2)]
    params0 = [rng.standard_normal(s).astype(np.float32) for s in shapes]
    # Anchor != init so the SPD condition genuinely alternates.
    anchors = [p + 0.1 * rng.standard_normal(p.shape).astype(np.float32)
               for p in params0]
    steps = [[rng.standard_normal(s).astype(np.float32) for s in shapes]
             for _ in range(7)]

    ref_final = _run_reference_adamspd(params0, anchors, steps, lr, betas,
                                       eps, wd, amsgrad)

    names = [f"p{i}" for i in range(len(shapes))]
    jp = {n: jnp.asarray(p) for n, p in zip(names, params0)}
    opt = adamspd(lr, b1=betas[0], b2=betas[1], eps=eps, weight_decay=wd,
                  amsgrad=amsgrad,
                  anchor_params={n: jnp.asarray(a)
                                 for n, a in zip(names, anchors)})
    state = opt.init(jp)
    for grads in steps:
        jg = {n: jnp.asarray(g) for n, g in zip(names, grads)}
        upd, state = opt.update(jg, state, jp)
        jp = {n: jp[n] + upd[n] for n in jp}

    for n, ref_p in zip(names, ref_final):
        np.testing.assert_allclose(np.asarray(jp[n]), ref_p,
                                   rtol=2e-5, atol=2e-5, err_msg=n)


def test_adamspd_ratio_guard_at_anchor():
    """``_ratio`` divides by ‖new_p - pre‖ (optimizers.py:154-157). At
    curr==0 with prev>0 the reference computes hardtanh(-inf)=0 — our
    guard returns the same 0 without generating the inf. At
    curr==prev==0 the reference is 0/0=NaN; ours stays 0 (exact: the
    projection term is 0·(new_p-pre) for any finite ratio)."""
    import jax.numpy as jnp
    from clip_finegrained_alignment_tpu.optim.adamspd import _ratio

    p = np.array([1.0, -2.0, 3.0], np.float32)
    new_p = np.array([0.5, 0.5, 0.5], np.float32)

    # curr == 0, prev > 0: both give exactly 0.
    ours = _ratio(jnp.asarray(new_p), jnp.asarray(p),
                  pre=jnp.asarray(new_p), axes=None)
    ref_r = ref_optim.AdamSPD._ratio(None, _t(new_p), _t(p), _t(new_p))
    assert np.all(np.asarray(ours) == 0.0)   # keepdims scalar
    assert float(ref_r) == 0.0

    # curr == prev == 0: reference NaNs, ours stays 0.
    ref_nan = ref_optim.AdamSPD._ratio(None, _t(new_p), _t(new_p), _t(new_p))
    assert torch.isnan(ref_nan)
    ours0 = _ratio(jnp.asarray(new_p), jnp.asarray(new_p),
                   pre=jnp.asarray(new_p), axes=None)
    assert np.all(np.asarray(ours0) == 0.0)


# ---------------------------------------------------------------------------
# CountBench template protocol (string-level parity)
# ---------------------------------------------------------------------------

class _StubModel:
    def to(self, device):
        return self

    def load_state_dict(self, *a, **k):
        return [], []


class _StubLoader:
    @staticmethod
    def from_pretrained(name):
        return _StubModel()


@pytest.fixture(scope="module")
def ref_cb():
    mod = _import_ref("count-bench", "cb_eval")
    mod.CLIPModel = _StubLoader
    mod.CLIPProcessor = _StubLoader
    return mod


CAPTIONS = [
    ("A photo of 3 dogs playing in the park", 3),
    ("Two cats sitting on a red couch", 2),
    ("a collage of five vintage postcards", 5),
    ("An image with 7 hot air balloons above the valley", 7),
    ("four children running across a beach", 4),
    ("The 9 planets of an old diagram", 9),
    ("a set of six porcelain tea cups", 6),
    ("eight wooden chairs around a long table", 8),
    ("A painting of ten sunflowers in a vase", 10),
    ("one lighthouse on a rocky shore", 1),
    ("Eleven players on the field before kickoff", 11),
    ("A grid of twelve cupcakes with sprinkles", 12),
    ("A photo of 2 two parrots", 2),           # digit + word: first wins
    ("three strollers and 3 bicycles parked", 3),
    ("Ten 10 pins standing at the alley", 10),
    ("A basket holding 5 five red apples", 5),
    ("2 ducks with two ducklings each", 2),
    ("An aerial view of 8 boats docked in pairs", 8),
    ("seven 7 lanterns hanging from a wire", 7),
    ("A mural showing 12 twelve doves", 12),
]


@pytest.mark.parametrize("number_format", ["numeric", "word", "both"])
def test_countbench_templates_byte_equal(ref_cb, number_format):
    """Our ``generate_templates`` must be byte-identical to the reference's
    (cb_eval.py:148-182) — the ±0.5% eval-parity contract rides on these
    strings hitting the tokenizer unchanged."""
    from clip_finegrained_alignment_tpu.eval import countbench as ours

    ev = ref_cb.CountBenchEvaluator(number_format=number_format)
    for text, number in CAPTIONS:
        ref_pos, ref_neg = ev.generate_templates(text, number)
        our_pos, our_neg = ours.generate_templates(text, number,
                                                   number_format)
        assert our_pos == ref_pos, (text, number)
        assert our_neg == ref_neg, (text, number)


def test_countbench_extract_number_parity(ref_cb):
    from clip_finegrained_alignment_tpu.eval import countbench as ours

    ev = ref_cb.CountBenchEvaluator()
    probes = [p for p, _ in CAPTIONS] + [
        "no numbers here at all",
        "a 13 is out of range but thirteen is not in valid set",
        "numbers 4 and seven mixed 2",
        "Seven",
    ]
    for text in probes:
        assert ours.extract_number(text) == ev.extract_number(text), text


def test_countbench_arrange_first_parity(ref_cb):
    """'first' arrangement = positives then negatives (cb_eval.py:113-123).
    ('random' uses python's global ``random`` stream — order-dependent on
    interpreter state, so only the deterministic strategy is pinned.)"""
    ev = ref_cb.CountBenchEvaluator(template_position="first")
    pos, neg = ["p1", "p2"], ["n1", "n2", "n3"]
    assert ev.arrange_templates(pos, neg) == pos + neg


# ---------------------------------------------------------------------------
# VLMs-are-Blind template protocol
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ref_vb(tmp_path_factory):
    mod = _import_ref("vlms-are-blind", "eval")
    mod.CLIPModel = _StubLoader
    mod.CLIPProcessor = _StubLoader
    # The reference __init__ unconditionally torch.loads a checkpoint
    # (eval.py:25-40); hand it a real (empty) one so it runs offline.
    ckpt = tmp_path_factory.mktemp("vb") / "empty.pt"
    torch.save({"model_state_dict": {}}, ckpt)
    mod._test_ckpt = str(ckpt)
    return mod


VB_CASES = [
    ("Touching Circles", ["Yes", "No", "yes", "no"]),
    ("Line Plot Intersections", ["0", "1", "2"]),
    ("Circled Letter", ["A", "g", "z", "Q", "m"]),
    ("Subway Connections", ["0", "1", "2", "3"]),
    ("Nested Squares", ["2", "3", "4", "5"]),
    ("Olympic Counting - Circles", ["5", "6", "7", "8", "9"]),
    ("Olympic Counting - Pentagons", ["5", "7", "9"]),
    ("Counting Grid - Blank Grids", ["3,3", "4x5", "9,9", "10,3"]),
    ("Counting Grid - Word Grids", ["3,4", "5x5", "8,9"]),
]


def test_vlmsblind_templates_byte_equal(ref_vb):
    from clip_finegrained_alignment_tpu.eval import vlmsblind as ours

    ev = ref_vb.CLIPEvaluator(checkpoint_path=ref_vb._test_ckpt)

    for task, gts in VB_CASES:
        for gt in gts:
            assert ours.positive_templates(task, gt) == \
                ev.get_task_templates(task, gt), (task, gt)
            assert ours.negative_templates(task, gt) == \
                ev.generate_negative_templates(task, gt), (task, gt)


def test_vlmsblind_validate_groundtruth_parity(ref_vb):
    from clip_finegrained_alignment_tpu.eval import vlmsblind as ours

    ev = ref_vb.CLIPEvaluator(checkpoint_path=ref_vb._test_ckpt)

    cases = [(t, g) for t, gts in VB_CASES for g in gts] + [
        ("Touching Circles", "maybe"),
        ("Line Plot Intersections", "5"),
        ("Circled Letter", "f"),        # f and j excluded by the valid set
        ("Circled Letter", "j"),
        ("Nested Squares", "7"),
        ("Counting Grid - Blank Grids", "2,3"),
        ("Counting Grid - Blank Grids", "11x3"),
        ("Counting Grid - Word Grids", "bogus"),
        ("Olympic Counting - Circles", "4"),
        ("Subway Connections", "9"),
    ]
    for task, gt in cases:
        assert ours.validate_groundtruth(task, gt) == \
            ev.validate_groundtruth(task, gt), (task, gt)
