"""Evaluation CLI — the three benchmark entry points
(``count-bench/cb_eval.py:407-475``, ``vlms-are-blind/eval.py:347-410``,
``zero_shot_detection/crop_eval.py:291-311``) behind one subcommand
interface::

    python -m clip_finegrained_alignment_tpu.cli.evaluate countbench \
        --model ViT-B/32 --confidence 0.2 --margin 0.01 --format word
    python -m clip_finegrained_alignment_tpu.cli.evaluate vlmsblind \
        --model ViT-L/14 --confidence 0.25
    python -m clip_finegrained_alignment_tpu.cli.evaluate crop \
        --coco-dir dataset/coco --samples 500
"""

from __future__ import annotations

import argparse
import json
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="command", required=True)

    def common(sp):
        sp.add_argument("--model", default="ViT-B/32")
        sp.add_argument("--checkpoint", default=None,
                        help="orbax dir, reference .pt, or HF name")
        sp.add_argument("--pretrained", default=None,
                        help="HF weights to start from (else random)")
        sp.add_argument("--batch-size", type=int, default=32)
        sp.add_argument("--output-dir", default="eval_results")
        sp.add_argument("--bpe-path", default=None)
        sp.add_argument("--pallas", action="store_true")
        sp.add_argument("--data-parallel", type=int, default=0,
                        metavar="N",
                        help="shard each eval batch over N devices "
                             "(params replicated; batch-size must be "
                             "divisible by N; 0 = single device). The "
                             "reference runs every protocol serially on "
                             "1 GPU; this streams the same protocol "
                             "data-parallel across the mesh")

    cb = sub.add_parser("countbench")
    common(cb)
    cb.add_argument("--confidence", type=float, default=0.2)
    cb.add_argument("--margin", type=float, default=0.01)
    cb.add_argument("--format", default="word",
                    choices=["numeric", "word", "both"])
    cb.add_argument("--position", default="first",
                    choices=["first", "random"])
    cb.add_argument("--dataset", default=None,
                    help="local JSON or HF name (default nielsr/countbench)")
    cb.add_argument("--debug-dir", default=None,
                    help="dump per-sample image + probability plots here")
    cb.add_argument("--samples", type=int, nargs="*", default=None,
                    help="sample indices to debug (default: all when "
                         "--debug-dir is set)")

    vb = sub.add_parser("vlmsblind")
    common(vb)
    vb.add_argument("--confidence", type=float, default=0.25)
    vb.add_argument("--margin", type=float, default=0.01)
    vb.add_argument("--dataset", default=None)

    cr = sub.add_parser("crop")
    common(cr)
    cr.add_argument("--coco-dir", default=None,
                    help="COCO root (omit for the procedural source)")
    cr.add_argument("--samples", type=int, default=500)
    cr.add_argument("--white-square", action="store_true")
    cr.add_argument("--output", default="crop_evaluation_results.json")
    cr.add_argument("--debug-dir", default=None,
                    help="save per-condition bbox-overlay PNGs per sample "
                         "(reference --debug, crop_eval.py:175-227)")
    return p


def load_params(args, model_cfg):
    """Checkpoint resolution shared by all subcommands: orbax dir →
    reference torch .pt (non-strict spirit, cb_eval.py:53-61) → HF name →
    random init."""
    import jax

    from ..models import clip as m, hf_import

    src = args.checkpoint or args.pretrained
    if src is None:
        print("no checkpoint/pretrained given: RANDOM INIT (hermetic run)")
        return m.init_clip_params(jax.random.key(0), model_cfg)
    if src.endswith((".pt", ".pth", ".bin")):
        params, meta = hf_import.load_reference_checkpoint(src, model_cfg)
        print(f"loaded reference checkpoint {src}")
        return params
    if os.path.isdir(src):  # orbax checkpoint directory
        state = restore_orbax_tree(src)
        print(f"loaded orbax checkpoint {src}")
        return state["params"] if "params" in state else state
    params, _ = hf_import.load_hf_clip(src)
    return params


def restore_orbax_tree(src):
    """Structure-free orbax restore as host numpy, ignoring the shardings
    the checkpoint was saved with — a checkpoint written on a v5e-8 mesh
    must load on a single eval chip (StandardCheckpointer.restore would
    demand the original device set). Returns the raw saved tree
    (``{"params", "opt_state"}`` for training checkpoints; namedtuple
    states come back as field-keyed dicts)."""
    import jax
    import numpy as np
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    tree = ckptr.metadata(os.path.abspath(src)).item_metadata.tree
    restore_args = jax.tree.map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree)
    return ckptr.restore(os.path.abspath(src),
                         args=ocp.args.PyTreeRestore(
                             restore_args=restore_args))


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    from ..config import CLIPConfig
    from ..core.xla_flags import enable_persistent_compilation_cache
    from ..data.tokenizer import load_tokenizer

    enable_persistent_compilation_cache()

    model_cfg = CLIPConfig.from_name(args.model)
    params = load_params(args, model_cfg)
    tokenizer = load_tokenizer(args.bpe_path)
    from ..data.tokenizer import HashTokenizer
    if isinstance(tokenizer, HashTokenizer) and \
            tokenizer.vocab_size != model_cfg.text.vocab_size:
        # Match the fallback tokenizer's id layout to the model vocab
        # (otherwise out-of-range ids clamp in the embedding gather and
        # every caption degenerates to the same sequence).
        tokenizer = HashTokenizer(
            vocab_size=model_cfg.text.vocab_size,
            bos_token_id=model_cfg.text.bos_token_id,
            eos_token_id=model_cfg.text.eos_token_id,
            pad_token_id=model_cfg.text.pad_token_id)

    # "procedural" datasets: generate a local benchmark-shaped fixture so
    # the full pipeline runs with zero network (plumbing check, not the
    # real benchmark).
    if getattr(args, "dataset", None) == "procedural":
        from ..data import fixtures
        fix_dir = os.path.join(args.output_dir, "fixture")
        if args.command == "countbench":
            fixtures.make_countbench_fixture(fix_dir)
            args.dataset = os.path.join(fix_dir, "countbench_fixture.json")
        else:
            fixtures.make_vlmsblind_fixture(fix_dir)
            args.dataset = os.path.join(fix_dir, "vlmsblind_fixture.json")
        print(f"generated procedural fixture: {args.dataset}")

    mesh = None
    if args.data_parallel > 1:
        import jax

        from ..config import MeshConfig
        from ..parallel import mesh as pmesh
        mesh = pmesh.make_mesh(MeshConfig(data=args.data_parallel),
                               jax.devices()[:args.data_parallel])
        print(f"eval mesh: {args.data_parallel}-way data parallel")

    if args.command == "countbench":
        from ..eval.countbench import CountBenchEvaluator, load_countbench
        ev = CountBenchEvaluator(
            params, model_cfg, confidence=args.confidence,
            margin=args.margin, number_format=args.format,
            template_position=args.position, tokenizer=tokenizer,
            batch_size=args.batch_size, use_pallas=args.pallas,
            debug_dir=args.debug_dir, samples_of_interest=args.samples,
            mesh=mesh)
        samples = load_countbench(args.dataset)
        results = ev.evaluate_dataset(samples)
        metrics = ev.compute_metrics(results)
        ev.save_results(results, metrics, args.output_dir)
        print(json.dumps(metrics, indent=2))

    elif args.command == "vlmsblind":
        from ..eval.vlmsblind import VLMsBlindEvaluator, load_vlmsblind
        ev = VLMsBlindEvaluator(
            params, model_cfg, confidence=args.confidence,
            margin=args.margin, tokenizer=tokenizer,
            batch_size=args.batch_size, use_pallas=args.pallas,
            mesh=mesh)
        samples = load_vlmsblind(args.dataset)
        metrics = ev.run_all_tasks(samples, output_dir=args.output_dir)
        print(json.dumps(metrics, indent=2))

    elif args.command == "crop":
        from ..eval.crop_detection import (CocoObjectSource,
                                           CropDetectionEvaluator,
                                           ProceduralObjectSource)
        source = CocoObjectSource(args.coco_dir) if args.coco_dir \
            else ProceduralObjectSource()
        ev = CropDetectionEvaluator(
            params, model_cfg, tokenizer=tokenizer,
            batch_size=args.batch_size,
            use_pallas=args.pallas, use_white_square=args.white_square,
            mesh=mesh)
        results = ev.run_evaluation(source, num_samples=args.samples,
                                    debug_dir=args.debug_dir)
        ev.save(results, args.output)
        print("\nEvaluation Summary:")
        for cond, stats in results["aggregate_stats"].items():
            print(f"{cond}: accuracy {stats['accuracy']:.2%} "
                  f"(pos {stats['avg_positive']:.3f} / "
                  f"neg {stats['avg_negative']:.3f})")


if __name__ == "__main__":
    main()
