"""CLI end-to-end tests (tiny model, procedural data, CPU mesh):
generate → train → resume → evaluate, all through the public entry
points."""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    from clip_finegrained_alignment_tpu.cli.generate_data import main
    main(["--procedural", "--num-samples", "16",
          "--output-dir", str(d / "synth"), "--image-size", "64",
          "--max-objects", "3"])
    return d


def train_args(d, epochs, extra=()):
    return ["--annotations", str(d / "synth" / "synthetic_annotations.json"),
            "--model", "tiny", "--loss-type", "clip",
            "--epochs", str(epochs), "--batch-size", "8",
            "--grad-accum", "1", "--no-amp", "--lr", "1e-3",
            "--experiment-name", "cli_test",
            "--checkpoint-dir", str(d / "ckpts"), "--save-every", "1",
            *extra]


def test_train_and_resume(workdir, capsys):
    from clip_finegrained_alignment_tpu.cli.train import main
    main(train_args(workdir, 1))
    best = workdir / "ckpts" / "cli_test" / "best"
    assert best.is_dir()
    meta = json.loads((best / "meta.json").read_text())
    assert meta["global_step"] == 2  # 16 samples / batch 8

    # Resume: epoch counter recomputed from global_step
    # (finetuner.py:339-342 behavior), continues to epoch 2. Also
    # exercises the perf knobs (identical math by construction) —
    # including restoring a STACKED checkpoint into the unstacked
    # runtime layout (engine.from_checkpoint_format over real orbax).
    main(train_args(workdir, 2, ["--resume", "--fused-sparc",
                                 "--unroll-layers", "2",
                                 "--unroll-accum", "2", "--remat", "0",
                                 "--unstack-layers"]))
    out = capsys.readouterr().out
    assert "resumed from" in out
    # best/ only refreshes on a new best loss; the periodic epoch_1
    # snapshot proves the second epoch ran from the restored counter.
    meta2 = json.loads((workdir / "ckpts" / "cli_test" / "epoch_1" /
                        "meta.json").read_text())
    assert meta2["global_step"] == 4
    assert meta2["epoch"] == 1


def test_evaluate_from_cli_checkpoint(workdir, capsys):
    from clip_finegrained_alignment_tpu.cli.evaluate import main
    outdir = str(workdir / "evalout")
    main(["countbench", "--model", "tiny", "--dataset", "procedural",
          "--checkpoint", str(workdir / "ckpts" / "cli_test" / "best"),
          "--output-dir", outdir, "--batch-size", "8"])
    metrics = json.loads(
        open(os.path.join(outdir, "countbench_metrics.json")).read())
    assert metrics["total_samples"] > 0
    assert 0.0 <= metrics["accuracy"] <= 1.0


def test_evaluate_data_parallel_cli(workdir, capsys):
    """--data-parallel 8 shards the eval batch over the virtual mesh and
    reproduces the single-device metrics bit-for-bit."""
    from clip_finegrained_alignment_tpu.cli.evaluate import main
    outdir = str(workdir / "evalout_dp")
    main(["countbench", "--model", "tiny", "--dataset", "procedural",
          "--checkpoint", str(workdir / "ckpts" / "cli_test" / "best"),
          "--output-dir", outdir, "--batch-size", "8",
          "--data-parallel", "8"])
    assert "eval mesh: 8-way data parallel" in capsys.readouterr().out
    dp = json.loads(
        open(os.path.join(outdir, "countbench_metrics.json")).read())
    single = json.loads(
        open(os.path.join(str(workdir / "evalout"),
                          "countbench_metrics.json")).read())
    assert dp["total_samples"] == single["total_samples"]
    assert abs(dp["accuracy"] - single["accuracy"]) < 1e-9


def test_train_count_loss_with_epoch_eval(workdir, capsys):
    from clip_finegrained_alignment_tpu.cli.train import main
    main(["--annotations",
          str(workdir / "synth" / "synthetic_annotations.json"),
          "--model", "tiny", "--loss-type", "count",
          "--epochs", "1", "--batch-size", "8", "--grad-accum", "1",
          "--no-amp", "--experiment-name", "cli_count",
          "--checkpoint-dir", str(workdir / "ckpts"),
          "--eval-every-epoch"])
    out = capsys.readouterr().out
    assert "counting-eval accuracy" in out
    assert os.path.exists(workdir / "ckpts" / "cli_count" /
                          "confusion_epoch_0.png")
    # The reference evaluates the held-out batch BEFORE training too
    # (count_finetuner.py:173-175) — the chance-level trajectory anchor.
    assert "pre-training counting-eval accuracy" in out
    assert os.path.exists(workdir / "ckpts" / "cli_count" /
                          "confusion_pretrain.png")


def test_train_model_parallel_with_zero1(workdir):
    """--model-parallel 2 --zero1 through the public CLI on the 8-device
    mesh: the full TP x ZeRO-1 production path (sharding rules, sharded
    optimizer state, TP-sharded orbax checkpoint) from the command line."""
    from clip_finegrained_alignment_tpu.cli.train import main
    main(train_args(workdir, 1, ["--global-negatives", "--model-parallel",
                                 "2", "--zero1",
                                 "--experiment-name", "cli_tp"]))
    best = workdir / "ckpts" / "cli_tp" / "best"
    assert best.is_dir()
    meta = json.loads((best / "meta.json").read_text())
    assert meta["global_step"] == 2


def test_train_3d_tp_pp(workdir):
    """--model-parallel 2 --pipeline-parallel 2 through the public CLI on
    the 8-device mesh: full 3D DP x TP x PP (composed layout,
    sharding_rules.py::composed_param_specs) from the command line."""
    from clip_finegrained_alignment_tpu.cli.train import main
    main(train_args(workdir, 1, ["--global-negatives",
                                 "--model-parallel", "2",
                                 "--pipeline-parallel", "2",
                                 "--experiment-name", "cli_3d"]))
    best = workdir / "ckpts" / "cli_3d" / "best"
    assert best.is_dir()
    meta = json.loads((best / "meta.json").read_text())
    assert meta["global_step"] == 2


def test_model_parallel_flag_validation(workdir):
    from clip_finegrained_alignment_tpu.cli.train import main
    with pytest.raises(SystemExit, match="global-negatives"):
        main(train_args(workdir, 1, ["--model-parallel", "2"]))
    with pytest.raises(SystemExit, match="divide"):
        main(train_args(workdir, 1, ["--model-parallel", "3",
                                     "--global-negatives"]))


def test_evaluate_vlmsblind_procedural(workdir):
    from clip_finegrained_alignment_tpu.cli.evaluate import main
    outdir = str(workdir / "evalout_vb")
    main(["vlmsblind", "--model", "tiny", "--dataset", "procedural",
          "--output-dir", outdir, "--batch-size", "8"])
    metrics = json.loads(
        open(os.path.join(outdir, "vlmsblind_metrics.json")).read())
    # the fixture provides 4 drawable tasks; the other 5 report 0 samples
    per_task_totals = [m["total_samples"] for m in metrics.values()]
    assert sum(1 for t in per_task_totals if t > 0) == 4


def test_export_checkpoint_cli(workdir, capsys):
    """orbax → reference .pt through the public CLI, both naming formats;
    the emitted file must reload through the import half bit-exactly and
    carry the training metadata (finetuner.py:256-273 container)."""
    import jax
    from clip_finegrained_alignment_tpu.cli.export_checkpoint import main
    from clip_finegrained_alignment_tpu.config import CLIPConfig
    from clip_finegrained_alignment_tpu.models.hf_import import (
        load_reference_checkpoint)

    best = workdir / "ckpts" / "cli_test" / "best"
    assert best.is_dir()   # written by test_train_and_resume
    cfg = CLIPConfig.from_name("tiny")
    for fmt in ("hf", "openai"):
        out = workdir / f"export_{fmt}.pt"
        main(["--checkpoint", str(best), "--model", "tiny",
              "--output", str(out), "--format", fmt])
        params, meta = load_reference_checkpoint(str(out), cfg)
        assert meta["global_step"] > 0          # meta.json carried over
        assert len(jax.tree.leaves(params)) == 46
    # quant flag round-trips through the trainer too (smoke: one epoch).
    from clip_finegrained_alignment_tpu.cli.train import main as train_main
    train_main(train_args(workdir, 1, ["--quant", "switchback",
                                       "--experiment-name", "cli_quant"]))
    assert (workdir / "ckpts" / "cli_quant" / "best").is_dir()


def test_optimizer_state_interop_cli(workdir, capsys):
    """train (adamspd) → export --include-optimizer → reference-format
    .pt with the full torch AdamSPD state → a TRUE mid-run migration
    back in via --pretrained + --import-optimizer-state (moments, step,
    SPD anchors all carried; finetuner.py:232-241 semantics)."""
    import torch
    from clip_finegrained_alignment_tpu.cli.export_checkpoint import (
        main as export_main)
    from clip_finegrained_alignment_tpu.cli.train import main as train_main

    train_main(train_args(workdir, 1, ["--optimizer", "adamspd",
                                       "--experiment-name", "cli_spd"]))
    best = workdir / "ckpts" / "cli_spd" / "best"
    out = workdir / "export_spd.pt"
    export_main(["--checkpoint", str(best), "--model", "tiny",
                 "--output", str(out), "--include-optimizer"])
    ckpt = torch.load(str(out), map_location="cpu", weights_only=False)
    opt_sd = ckpt["optimizer_state_dict"]
    assert len(opt_sd["param_groups"]) == 1
    assert len(opt_sd["param_groups"][0]["pre"]) == len(opt_sd["state"])
    assert all(v["step"] == ckpt["global_step"]
               for v in opt_sd["state"].values())

    train_main(train_args(workdir, 2, ["--optimizer", "adamspd",
                                       "--experiment-name", "cli_spd_mig",
                                       "--pretrained", str(out),
                                       "--import-optimizer-state"]))
    assert "imported reference optimizer state" in capsys.readouterr().out
    # best_loss was imported too (reference restore semantics), so best/
    # only refreshes on a new best — the periodic epoch_1 snapshot proves
    # the migrated run continued from the imported step counter.
    meta = json.loads((workdir / "ckpts" / "cli_spd_mig" / "epoch_1" /
                       "meta.json").read_text())
    assert meta["global_step"] == 4  # 2 imported + 2 (one more epoch)
    assert meta["epoch"] == 1

    # AdamW variant (the reference's two-group decay split): cli_test
    # trained with the default --optimizer adamw.
    out_w = workdir / "export_adamw.pt"
    export_main(["--checkpoint", str(workdir / "ckpts" / "cli_test" /
                                     "best"),
                 "--model", "tiny", "--output", str(out_w),
                 "--include-optimizer"])
    ckpt_w = torch.load(str(out_w), map_location="cpu", weights_only=False)
    groups = ckpt_w["optimizer_state_dict"]["param_groups"]
    assert len(groups) == 2 and groups[1]["weight_decay"] == 0.0
    train_main(train_args(workdir, 3, ["--experiment-name", "cli_w_mig",
                                       "--pretrained", str(out_w),
                                       "--import-optimizer-state"]))
    assert "imported reference optimizer state" in capsys.readouterr().out


def test_resume_from_explicit_path(workdir, capsys):
    """--resume <step-dir>: the reference's resume-by-path semantics
    (finetuner.py:286) — restore an arbitrary orbax step dir into a
    fresh experiment and continue the epoch arithmetic from its
    global_step."""
    from clip_finegrained_alignment_tpu.cli.train import main

    step_dir = workdir / "ckpts" / "cli_test" / "epoch_1"
    assert step_dir.is_dir()  # written by test_train_and_resume
    main(train_args(workdir, 3, ["--resume", str(step_dir),
                                 "--experiment-name", "cli_path_resume"]))
    out = capsys.readouterr().out
    assert "resumed from" in out and "epoch_1" in out
    meta = json.loads((workdir / "ckpts" / "cli_path_resume" / "epoch_2" /
                       "meta.json").read_text())
    assert meta["global_step"] == 6  # 4 restored + 2 (one more epoch)
    assert meta["epoch"] == 2


def test_import_optimizer_state_flag_validation(workdir):
    """--import-optimizer-state conflicts: with --resume (two optimizer
    sources), and across an amsgrad mismatch (importing would silently
    drop or fabricate nu_max maxima)."""
    from clip_finegrained_alignment_tpu.cli.train import main

    out = workdir / "export_spd.pt"   # from test_optimizer_state_interop_cli
    assert out.exists()
    with pytest.raises(SystemExit, match="pick one source"):
        main(train_args(workdir, 2, ["--optimizer", "adamspd",
                                     "--pretrained", str(out),
                                     "--import-optimizer-state",
                                     "--resume"]))
    with pytest.raises(SystemExit, match="amsgrad"):
        main(train_args(workdir, 2, ["--optimizer", "adamspd", "--amsgrad",
                                     "--pretrained", str(out),
                                     "--import-optimizer-state",
                                     "--experiment-name", "cli_ams"]))


def test_preempt_checkpoint_and_cli_resume(workdir, capsys, monkeypatch):
    """SIGTERM-style preemption through the CLI: the run stops at a step
    boundary with ckpts/<exp>/preempt, and --resume <preempt dir> is
    step-exact (skips the completed steps of the interrupted epoch)."""
    from clip_finegrained_alignment_tpu.cli.train import main
    from clip_finegrained_alignment_tpu.train.engine import Trainer

    args = ["--annotations",
            str(workdir / "synth" / "synthetic_annotations.json"),
            "--model", "tiny", "--loss-type", "clip",
            "--epochs", "2", "--batch-size", "8",
            "--grad-accum", "1", "--no-amp", "--lr", "1e-3",
            "--experiment-name", "cli_preempt",
            "--checkpoint-dir", str(workdir / "ckpts"),
            "--save-every", "1"]

    # Deterministic stand-in for the SIGTERM timing: request preemption
    # right after the 3rd optimizer step (mid-epoch-1 of 2x2 steps).
    orig_step = Trainer.step

    def step_then_preempt(self, batch):
        metrics = orig_step(self, batch)
        if self.global_step == 3:
            self.request_preempt()
        return metrics

    monkeypatch.setattr(Trainer, "step", step_then_preempt)
    main(args)
    out = capsys.readouterr().out
    assert "preempted: emergency checkpoint" in out
    pre_dir = workdir / "ckpts" / "cli_preempt" / "preempt"
    meta = json.loads((pre_dir / "meta.json").read_text())
    assert meta["preempted"] is True and meta["global_step"] == 3

    # Resume from the preempt checkpoint: epoch 1 replays with its
    # completed first step skipped, so exactly one step remains.
    monkeypatch.setattr(Trainer, "step", orig_step)
    main(args + ["--resume", str(pre_dir)])
    out = capsys.readouterr().out
    assert "skipping 1 completed steps" in out
    meta2 = json.loads((workdir / "ckpts" / "cli_preempt" / "epoch_1" /
                        "meta.json").read_text())
    assert meta2["global_step"] == 4
