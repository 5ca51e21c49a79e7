"""CLI entry point reproducing the reference command surface.

ref README usage: ``python cu-net.py --gpu_id 0 --exp_id cu-net-2 --layer_num 2
--order 1 --loss_num 2 --is_train true --bs 24`` (ref:README.md:24-32). All
reference flags are accepted (ref:options/base_options.py:12-33,
ref:options/train_options.py:7-38); TPU-native additions are grouped at the
bottom. Unlike the reference, parsing has no import-time side effects; the
resolved config is dumped to ``<exp_dir>/<exp_id>/opt.txt`` at run start, as
the reference did (ref:options/base_options.py:67-72).
"""

from __future__ import annotations

import argparse
import os
from typing import Optional

import numpy as np


def str2bool(v: str) -> bool:
    return str(v).lower() in ("1", "true", "yes", "y", "t")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("cunet-train")
    # --- base options (ref:options/base_options.py) ---
    p.add_argument("--data_dir", type=str, default="./dataset")
    p.add_argument("--exp_dir", type=str, default="./exp")
    p.add_argument("--exp_id", type=str, default="")
    p.add_argument("--gpu_id", type=str, default="0",
                   help="accepted for CLI parity; device selection is via JAX")
    p.add_argument("--nThreads", type=int, default=4)
    p.add_argument("--is_train", type=str2bool, default=True)
    p.add_argument("--use_html", type=str2bool, default=False)
    p.add_argument("--dataset", type=str, default="mpii",
                   choices=["mpii", "face", "synthetic"])
    p.add_argument("--model", type=str, default="cu_net",
                   choices=["cu_net", "dense_unet"],
                   help="cu_net = coupled U-Nets (ref cu-net.py); dense_unet = "
                        "single dense hourglass baseline (ref naive-dense-unet.py)")
    # --- train options (ref:options/train_options.py) ---
    p.add_argument("--layer_num", type=int, default=2)
    p.add_argument("--order", type=int, default=1)
    p.add_argument("--class_num", type=int, default=16)
    p.add_argument("--loss_num", type=int, default=16)
    p.add_argument("--lr", type=float, default=2.5e-4)
    p.add_argument("--bs", type=int, default=24)
    p.add_argument("--adjust_lr", type=str2bool, default=False)
    p.add_argument("--resume_prefix", type=str, default="")
    p.add_argument("--nEpochs", type=int, default=200)
    p.add_argument("--best_pckh", type=float, default=0.0)
    p.add_argument("--print_freq", type=int, default=10)
    p.add_argument("--display_freq", type=int, default=10)
    p.add_argument("--bits_w", type=int, default=1)
    p.add_argument("--bits_i", type=int, default=8)
    p.add_argument("--bits_g", type=int, default=8)
    # --- TPU-native additions ---
    p.add_argument("--quantize", type=str2bool, default=False,
                   help="enable WAGE quantized training (bits_{w,i,g})")
    p.add_argument("--int8_infer", type=str2bool, default=False,
                   help="real int8 MXU inference for binarized 1x1 convs "
                        "(eval only; requires --quantize, bits_w=1)")
    p.add_argument("--compute_dtype", type=str, default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--remat", type=str, default="bottleneck",
                   choices=["none", "bottleneck", "layer", "block"])
    p.add_argument("--bn_dtype", type=str, default="float32",
                   choices=["float32", "compute"],
                   help="BN normalize dtype (stats always f32); 'compute' is "
                        "the flax-style mixed-precision fast path")
    p.add_argument("--bn_tile", type=int, default=0,
                   help="ghost/per-replica BN group size (0 = whole batch); "
                        "the reference's DataParallel computes BN per GPU "
                        "shard. With --use_pallas, training dispatches the "
                        "fused train-slot kernels (bn_tile = kernel batch "
                        "tile)")
    p.add_argument("--use_pallas", type=str2bool, default=False,
                   help="fused Pallas kernels on the eval path (TPU only)")
    p.add_argument("--drop_rate", type=float, default=0.0,
                   help="dense-layer dropout rate (ref:models/cu_net.py:63-64;"
                        " runs THROUGH the fused train kernels: masks are "
                        "precomputed per step and applied in-kernel)")
    p.add_argument("--fast_prng", type=str2bool, default=True,
                   help="use the rbg PRNG for dropout masks (hardware RNG; "
                        "measured 457 vs 306 img/s at drop 0.2 on v5e — "
                        "threefry mask generation costs ~22 ms/step). "
                        "Changes the random stream, not its distribution.")
    p.add_argument("--trace_dir", type=str, default="",
                   help="capture a jax.profiler trace of epoch 1 to this dir")
    p.add_argument("--dp", type=int, default=0,
                   help="data-parallel mesh size (0 = all devices)")
    p.add_argument("--sp", type=int, default=1, help="spatial-partition size")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--neck_size", type=int, default=4)
    p.add_argument("--growth_rate", type=int, default=32)
    p.add_argument("--init_chan_num", type=int, default=128)
    p.add_argument("--num_blocks", type=int, default=4)
    p.add_argument("--inp_res", type=int, default=256)
    p.add_argument("--out_res", type=int, default=64)
    p.add_argument("--json_file", type=str, default="",
                   help="annotation json (default <data_dir>/<dataset json>)")
    p.add_argument("--img_folder", type=str, default="",
                   help="image root (default <data_dir>)")
    p.add_argument("--synthetic_len", type=int, default=64)
    return p


def main(argv: Optional[list] = None) -> int:
    opt = build_parser().parse_args(argv)
    if opt.exp_id == "":
        print("Please set the experimental ID with option --exp_id")
        return 1
    exp_dir = os.path.join(opt.exp_dir, opt.exp_id)
    os.makedirs(exp_dir, exist_ok=True)
    with open(os.path.join(exp_dir, "opt.txt"), "w") as f:
        f.write("------------ Options -------------\n")
        for k, v in sorted(vars(opt).items()):
            f.write(f"{k}: {v}\n")
        f.write("-------------- End ----------------\n")
    if opt.is_train:
        run_training(opt, exp_dir)
    else:
        run_eval(opt, exp_dir)
    return 0


def run_training(opt, exp_dir: str) -> dict:
    """Build everything and run the epoch loop. Returns final metrics."""
    import jax

    if opt.drop_rate > 0 and getattr(opt, "fast_prng", True):
        # hardware-RNG dropout masks: threefry generation of the ~67M
        # mask samples/step costs ~22 ms on v5e (PARITY.md r4)
        jax.config.update("jax_default_prng_impl", "rbg")

    from cunet_tpu.config import ModelConfig, QuantConfig, TrainConfig
    from cunet_tpu.data import (
        DataLoader,
        FaceDataset,
        MPIIDataset,
        SyntheticLandmarkDataset,
    )
    from cunet_tpu.models import DenseUNetConfig, init_cu_net, init_dense_unet
    from cunet_tpu.parallel import make_mesh, replicated
    from cunet_tpu.train import (
        create_train_state,
        lr_at_epoch,
        make_optimizer,
        make_sharded_train_step,
        set_lr,
    )
    from cunet_tpu.train.loop import train_epoch, validate_epoch
    from cunet_tpu.train.quant_step import make_sharded_quant_train_step
    from cunet_tpu.train.step import dense_unet_apply
    from cunet_tpu.utils import Checkpoint, ConsoleFileLogger, TrainHistory, TsvLogger

    task = "face" if opt.dataset == "face" else "mpii"
    use_pallas = opt.use_pallas
    if use_pallas and jax.default_backend() != "tpu":
        use_pallas = False
    cfg = ModelConfig(
        layer_num=opt.layer_num,
        order=opt.order,
        class_num=opt.class_num,
        loss_num=opt.loss_num,
        neck_size=opt.neck_size,
        growth_rate=opt.growth_rate,
        init_chan_num=opt.init_chan_num,
        num_blocks=opt.num_blocks,
        compute_dtype=opt.compute_dtype,
        remat=opt.remat,
        use_pallas=use_pallas,
        bn_dtype=opt.bn_dtype,
        bn_tile=opt.bn_tile,
        drop_rate=opt.drop_rate,
    )
    qcfg = QuantConfig(
        bits_w=opt.bits_w, bits_i=opt.bits_i, bits_g=opt.bits_g,
        enabled=opt.quantize, int8_infer=opt.int8_infer,
        # the int8 MXU kernel needs a TPU; elsewhere run the same math in lax
        int8_impl="pallas" if jax.default_backend() == "tpu" else "lax",
    )
    tcfg = TrainConfig(lr=opt.lr, batch_size=opt.bs, n_epochs=opt.nEpochs,
                       schedule="face" if task == "face" else "mpii",
                       print_freq=opt.print_freq, seed=opt.seed)

    log = ConsoleFileLogger(os.path.join(exp_dir, "log.txt"))
    tsv = TsvLogger(os.path.join(exp_dir, "training-summary.txt"),
                    resume=bool(opt.resume_prefix))
    tsv.set_names(["epoch", "lr", "train_loss", "val_loss", "train_metric", "val_metric"])

    # data
    if opt.dataset == "synthetic":
        mk = lambda train: SyntheticLandmarkDataset(
            length=opt.synthetic_len, num_joints=opt.class_num, is_train=train,
            inp_res=opt.inp_res, out_res=opt.out_res,
        )
    elif opt.dataset == "mpii":
        jf = opt.json_file or os.path.join(opt.data_dir, "mpii-hr-lsp-normalizer.json")
        mk = lambda train: MPIIDataset(jf, opt.img_folder or opt.data_dir,
                                       is_train=train, seed=opt.seed,
                                       inp_res=opt.inp_res, out_res=opt.out_res)
    else:
        jf = opt.json_file or os.path.join(opt.data_dir, "face.json")
        mk = lambda train: FaceDataset(jf, opt.img_folder or opt.data_dir,
                                       is_train=train, seed=opt.seed,
                                       inp_res=opt.inp_res, out_res=opt.out_res)
    train_set, val_set = mk(True), mk(False)
    train_loader = DataLoader(train_set, tcfg.batch_size, shuffle=True,
                              num_threads=opt.nThreads, seed=opt.seed)
    val_loader = DataLoader(val_set, tcfg.batch_size, shuffle=False, drop_last=False)

    # model + optimizer + mesh
    apply_fn = None
    if opt.model == "dense_unet":
        du_cfg = DenseUNetConfig(
            layer_num=opt.layer_num, neck_size=opt.neck_size,
            growth_rate=opt.growth_rate, init_chan_num=opt.init_chan_num,
            class_num=opt.class_num, num_blocks=opt.num_blocks,
            compute_dtype=opt.compute_dtype, remat=opt.remat,
            drop_rate=opt.drop_rate,
            bn_dtype=opt.bn_dtype, bn_tile=opt.bn_tile,
        )
        params, bn = init_dense_unet(jax.random.PRNGKey(opt.seed), du_cfg)
        apply_fn = dense_unet_apply(du_cfg)
    else:
        params, bn = init_cu_net(jax.random.PRNGKey(opt.seed), cfg)
        from cunet_tpu.models import stack_steady
        from cunet_tpu.models.cu_net import fused_train_ok

        start = max(cfg.order, 1)
        if (fused_train_ok(cfg) and cfg.use_scan
                and cfg.layer_num - start >= 2):
            # natively stacked steady-slot storage: the lax.scan train path
            # consumes params with zero per-step marshaling (quant included
            # — the quant transforms vmap over the stacked slot dim).
            # Checkpoints stay canonical on disk (utils/checkpoint.py).
            params = stack_steady(params, cfg)
            bn = stack_steady(bn, cfg)
    tx = make_optimizer(tcfg)
    state = create_train_state(params, bn, tx)
    n_dev = len(jax.devices())
    dp = opt.dp
    if dp == 0:  # largest device count that divides the batch
        dp = max(n_dev // opt.sp, 1)
        while tcfg.batch_size % dp:
            dp -= 1
    mesh = make_mesh(dp=dp, sp=opt.sp, devices=jax.devices()[: dp * opt.sp])
    state = jax.device_put(state, replicated(mesh))

    drop_rng = (jax.random.PRNGKey(opt.seed + 1)
                if opt.model == "cu_net" and cfg.drop_rate > 0 else None)
    if qcfg.enabled:
        step_fn = make_sharded_quant_train_step(mesh, cfg, qcfg, tx,
                                                donate=False, rng=drop_rng)
    else:
        step_fn = make_sharded_train_step(mesh, cfg, tx, donate=False,
                                          apply_fn=apply_fn, rng=drop_rng)
    if opt.use_pallas and not use_pallas:
        log.print_log(
            "=> note: --use_pallas requires a TPU backend "
            f"(got {jax.default_backend()}); using the lax path"
        )
    if use_pallas and qcfg.enabled:
        log.print_log(
            "=> note: quantized TRAINING runs the fused Pallas kernels "
            "(QuanInput STE in-kernel); quantized EVAL uses the lax path "
            "unless --int8_infer (the fused eval kernels fold BN and skip "
            "the activation quantizers)"
        )
    from cunet_tpu.models.cu_net import _mosaic_ok
    if use_pallas and not _mosaic_ok(cfg):
        log.print_log(
            "=> note: --use_pallas needs init_chan_num >= 128 to "
            "Mosaic-compile on TPU (tiny debug widths hit unsupported "
            "shape casts); using the lax path"
        )
    ckpt = Checkpoint(exp_dir)
    history = TrainHistory("min" if task == "face" else "max",
                           "val_rmse" if task == "face" else "val_pckh")
    if opt.resume_prefix:
        name = opt.resume_prefix.rstrip("-")
        state, history = ckpt.load(state, name, history)
        log.print_log(f"=> resumed from '{name}' at epoch {history.last_epoch}")
    start_epoch = history.last_epoch + 1

    metrics = {}
    for epoch in range(start_epoch, tcfg.n_epochs + 1):
        lr = lr_at_epoch(tcfg.lr, epoch, tcfg.schedule) if opt.adjust_lr else tcfg.lr
        if opt.adjust_lr:
            state = set_lr(state, lr)
        from cunet_tpu.utils.profiling import trace as profile_trace

        with profile_trace(opt.trace_dir if epoch == start_epoch else None):
            state, train_loss, train_metric = train_epoch(
                step_fn, state, train_loader, epoch,
                log=log, print_freq=tcfg.print_freq, task=task,
            )
        eval_fn = None
        if apply_fn is not None:
            eval_fn = jax.jit(
                lambda p, b, im: apply_fn(p, b, im, train=False)[0]
            )
        val_loss, val_metric, preds = validate_epoch(
            state.params, state.bn_state, val_loader, cfg=cfg,
            quant=qcfg if qcfg.enabled else None,
            flip_test=(task == "mpii"), task=task,
            num_val=len(val_set), log=log, eval_fn=eval_fn,
        )
        metric_key = "val_rmse" if task == "face" else "val_pckh"
        history.update(
            {"epoch": epoch}, {"lr": lr},
            {"train_loss": train_loss, "val_loss": val_loss},
            {metric_key: val_metric},
        )
        tsv.append([epoch, lr, train_loss, val_loss, train_metric, val_metric])
        ckpt.save(state, history, preds=preds)
        metrics = {"epoch": epoch, "train_loss": train_loss,
                   "val_loss": val_loss, metric_key: val_metric}
    tsv.close()
    return metrics


def run_eval(opt, exp_dir: str) -> dict:
    """Validation-only mode (--is_train false): restore weights, run the full
    val split with flip-test, print the per-part PCKh table (mpii) or NME
    (face), save predictions .mat — the checkpoint-parity workflow."""
    import jax
    import numpy as np

    from cunet_tpu.config import ModelConfig, QuantConfig
    from cunet_tpu.data import (
        DataLoader, FaceDataset, MPIIDataset, SyntheticLandmarkDataset,
    )
    from cunet_tpu.models import DenseUNetConfig, init_cu_net, init_dense_unet
    from cunet_tpu.train.loop import validate_epoch
    from cunet_tpu.train import create_train_state, make_optimizer
    from cunet_tpu.train.step import dense_unet_apply
    from cunet_tpu.config import TrainConfig
    from cunet_tpu.utils import Checkpoint, ConsoleFileLogger, TrainHistory

    task = "face" if opt.dataset == "face" else "mpii"
    use_pallas = opt.use_pallas
    if use_pallas and jax.default_backend() != "tpu":
        use_pallas = False
    cfg = ModelConfig(
        layer_num=opt.layer_num, order=opt.order, class_num=opt.class_num,
        loss_num=opt.loss_num, neck_size=opt.neck_size,
        growth_rate=opt.growth_rate, init_chan_num=opt.init_chan_num,
        num_blocks=opt.num_blocks, compute_dtype=opt.compute_dtype,
        remat="none", use_pallas=use_pallas, bn_dtype=opt.bn_dtype,
    )
    qcfg = QuantConfig(bits_w=opt.bits_w, bits_i=opt.bits_i, bits_g=opt.bits_g,
                       enabled=opt.quantize, int8_infer=opt.int8_infer,
                       int8_impl="pallas" if jax.default_backend() == "tpu"
                       else "lax")
    log = ConsoleFileLogger(os.path.join(exp_dir, "log.txt"))
    if opt.use_pallas and not use_pallas:
        log.print_log(
            "=> note: --use_pallas requires a TPU backend "
            f"(got {jax.default_backend()}); using the lax path"
        )

    if opt.dataset == "synthetic":
        val_set = SyntheticLandmarkDataset(
            length=opt.synthetic_len, num_joints=opt.class_num, is_train=False,
            inp_res=opt.inp_res, out_res=opt.out_res)
    elif opt.dataset == "mpii":
        jf = opt.json_file or os.path.join(opt.data_dir, "mpii-hr-lsp-normalizer.json")
        val_set = MPIIDataset(jf, opt.img_folder or opt.data_dir, is_train=False,
                              inp_res=opt.inp_res, out_res=opt.out_res)
    else:
        jf = opt.json_file or os.path.join(opt.data_dir, "face.json")
        val_set = FaceDataset(jf, opt.img_folder or opt.data_dir, is_train=False,
                              inp_res=opt.inp_res, out_res=opt.out_res)
    val_loader = DataLoader(val_set, opt.bs, shuffle=False, drop_last=False)

    if use_pallas and qcfg.enabled:
        log.print_log(
            "=> note: --use_pallas is ignored on the quantized eval path "
            "(fused block/slot kernels skip the activation quantizers)"
        )

    apply_fn = None
    if opt.model == "dense_unet":
        du_cfg = DenseUNetConfig(
            layer_num=opt.layer_num, neck_size=opt.neck_size,
            growth_rate=opt.growth_rate, init_chan_num=opt.init_chan_num,
            class_num=opt.class_num, num_blocks=opt.num_blocks,
            compute_dtype=opt.compute_dtype, remat="none",
        )
        params, bn = init_dense_unet(jax.random.PRNGKey(opt.seed), du_cfg)
        apply_fn = dense_unet_apply(du_cfg)
    else:
        params, bn = init_cu_net(jax.random.PRNGKey(opt.seed), cfg)
    if opt.resume_prefix:
        name = opt.resume_prefix.rstrip("-")
        if name.endswith(".pth.tar") or name.endswith(".pth"):
            if opt.model == "dense_unet":
                raise SystemExit(
                    "torch-checkpoint conversion supports --model cu_net only"
                )
            # reference torch checkpoint: convert on the fly
            from cunet_tpu.tools.convert_torch import (
                load_torch_checkpoint, merge_into,
            )

            cparams, cstate, missing, _ = load_torch_checkpoint(
                os.path.join(opt.data_dir, name)
                if not os.path.isabs(name) else name, cfg)
            for miss in missing:
                log.print_log(f"=> not converted: {miss}")
            params = merge_into(params, cparams)
            bn = merge_into(bn, cstate)
        else:
            tx = make_optimizer(TrainConfig())
            state = create_train_state(params, bn, tx)
            ckpt = Checkpoint(exp_dir)
            state, _ = ckpt.load(state, name, None)
            params, bn = state.params, state.bn_state

    eval_fn = None
    if apply_fn is not None:
        eval_fn = jax.jit(lambda p, b, im: apply_fn(p, b, im, train=False)[0])
    val_loss, val_metric, preds = validate_epoch(
        params, bn, val_loader, cfg=cfg,
        quant=qcfg if qcfg.enabled else None,
        flip_test=(task == "mpii"), task=task,
        num_val=len(val_set), log=log, eval_fn=eval_fn,
    )
    metric_name = "NME" if task == "face" else "PCKh@0.5"
    log.print_log(f"eval: loss {val_loss:.6f} {metric_name} {val_metric:.4f}")
    if preds is not None:
        import scipy.io

        out = os.path.join(exp_dir, "eval-preds.mat")
        scipy.io.savemat(out, mdict={"preds": np.asarray(preds)})
        log.print_log(f"=> saved predictions to {out}")
    return {"val_loss": val_loss, "val_metric": val_metric}


if __name__ == "__main__":
    raise SystemExit(main())
