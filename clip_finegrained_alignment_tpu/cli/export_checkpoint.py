"""Export a trained checkpoint to the reference's torch-pickle format.

``python -m clip_finegrained_alignment_tpu.cli.export_checkpoint
    --checkpoint runs/ckpt/42 --model ViT-B/32 --output best.pt``

The output is byte-compatible with what the reference's trainers write
(``model_state_dict`` + ``global_step`` + ``best_loss`` + ``config``,
``/root/reference/finetune/finetuner.py:256-273``), so it loads into
``CLIPFineTuner.load_checkpoint``, ``CLIPModel.load_state_dict``, and
every reference evaluator's ``--checkpoint`` flag — the hand-back half
of the interop whose import half is ``cli/evaluate.py::load_params``.

Accepts any source ``load_params`` accepts (orbax dir, reference .pt,
HF name), so it doubles as a format converter.
"""

from __future__ import annotations

import argparse
import json
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Export a checkpoint to the reference torch .pt format")
    p.add_argument("--checkpoint", required=True,
                   help="orbax checkpoint dir (or .pt / HF name to convert)")
    p.add_argument("--model", default="ViT-B/32",
                   help="model family (ViT-B/32, ViT-B/16, ViT-L/14)")
    p.add_argument("--output", required=True, help="output .pt path")
    p.add_argument("--format", default="hf", choices=["hf", "openai"],
                   help="state-dict naming: hf = CLIPModel names (the "
                        "SPARC/DDP trainers + evaluators), openai = clip-"
                        "package names (the count trainer's resume format)")
    p.add_argument("--pretrained", default=None, help=argparse.SUPPRESS)
    p.add_argument("--global-step", type=int, default=None,
                   help="override global_step (default: the checkpoint's "
                        "meta.json when present, else 0)")
    p.add_argument("--include-optimizer", action="store_true",
                   help="also convert the optimizer state (AdamSPD "
                        "moments/step/SPD-anchors, or the two-group "
                        "AdamW state) so the file is a COMPLETE training "
                        "checkpoint the reference's "
                        "CLIPFineTuner.load_checkpoint can resume from "
                        "(it restores optimizer_state_dict "
                        "unconditionally, finetuner.py:237). Requires an "
                        "orbax training checkpoint and --format hf")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    from ..config import CLIPConfig
    from ..models.hf_export import save_reference_checkpoint
    from .evaluate import load_params

    model_cfg = CLIPConfig.from_name(args.model)
    orbax_state = None
    if args.include_optimizer:
        if args.format != "hf":
            raise SystemExit("--include-optimizer requires --format hf "
                             "(the clip-package parameter order cannot be "
                             "oracle-pinned offline; optim/interop.py)")
        if not os.path.isdir(args.checkpoint):
            raise SystemExit("--include-optimizer needs an orbax training "
                             "checkpoint directory (it holds the "
                             "opt_state)")
        from .evaluate import restore_orbax_tree
        # One restore serves both halves — the full tree is several GB
        # for ViT-L/14, so don't deserialize it twice.
        orbax_state = restore_orbax_tree(args.checkpoint)
        if "opt_state" not in orbax_state:
            raise SystemExit(f"{args.checkpoint} has no opt_state")
        params = orbax_state["params"]
    else:
        params = load_params(args, model_cfg)

    # Carry training metadata over when exporting an orbax step dir whose
    # parent holds the manager's meta.json (train/checkpoint.py).
    meta = {}
    if os.path.isdir(args.checkpoint):
        for d in (args.checkpoint, os.path.dirname(args.checkpoint.rstrip("/"))):
            mp = os.path.join(d, "meta.json")
            if os.path.exists(mp):
                with open(mp) as f:
                    meta = json.load(f)
                break

    opt_sd = None
    if orbax_state is not None:
        from ..config import TrainConfig
        from ..optim import interop
        tc = TrainConfig()  # hyperparameter fallbacks
        saved = meta.get("config") or {}
        hp = dict(lr=saved.get("lr", tc.lr),
                  betas=tuple(saved.get("betas", tc.betas)),
                  eps=saved.get("eps", tc.eps),
                  weight_decay=saved.get("weight_decay", tc.weight_decay))
        # Dispatch on what the opt_state actually holds: AdamSPD (one
        # group + 'pre' anchors) or the reference's two-group AdamW.
        if interop.find_adamspd_state(orbax_state["opt_state"]) is not None:
            opt_sd = interop.reference_optimizer_state_dict(
                orbax_state["opt_state"], model_cfg,
                amsgrad=bool(saved.get("amsgrad", tc.amsgrad)), **hp)
        else:
            opt_sd = interop.reference_adamw_optimizer_state_dict(
                orbax_state["opt_state"], model_cfg, **hp)

    save_reference_checkpoint(
        args.output, params, model_cfg,
        global_step=args.global_step if args.global_step is not None
        else int(meta.get("global_step", 0)),
        best_loss=float(meta.get("best_loss", float("inf"))),
        config=meta.get("config", {}), optimizer_state_dict=opt_sd,
        fmt=args.format)
    print(f"wrote {args.output} (reference torch-pickle format"
          + (", with optimizer state" if opt_sd is not None else "") + ")")


if __name__ == "__main__":
    main()
