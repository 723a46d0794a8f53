"""Unified training CLI — ``dlx-train <model> [flags]``.

One entry point replaces the reference's per-recipe launchers (ConvNets
``main.py``+``launch.py``+``multiproc.py``, SSD ``main.py``, BERT
``run_pretraining.py``/``run_squad.py``, Tacotron2 ``train.py``, DLRM
``dlrm/scripts/main.py``). Reference flag spellings are preserved where they
map 1:1 (``--lr``, ``--batch-size``, ``--epochs``, ``--mode``,
``--data-backend``, ``--prof``, ``--resume``, ``--seed``, ``--config-file``).

There is no multiprocessing launcher: under SPMD one process per host drives
all local chips, and multi-host bootstraps through
``jax.distributed.initialize`` (``--coordinator`` / env). The ``--mode
benchmark-training`` path mirrors the reference's benchmark modes
(SSD ``main.py:75-76``, ConvNets ``benchmark_training_short``).
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..core import config as cfgmod
from ..core import optimizers as opt
from ..core.checkpoint import CheckpointManager
from ..core.logging import JSONStreamBackend, Logger, StdOutBackend
from ..core.loop import LoopConfig, train_loop
from ..core.train import create_train_state, make_eval_step, make_train_step
from ..data import prefetch_to_device
from ..parallel import MeshSpec, build_mesh

__all__ = ["cli", "MODELS"]


@dataclass
class CommonConfig:
    epochs: int = 1
    batch_size: int = 32
    lr: float = 0.1
    weight_decay: float = 0.0
    momentum: float = 0.9
    warmup_epochs: int = 0
    lr_schedule: str = "cosine"  # cosine | step | linear | constant
    label_smoothing: float = 0.0
    mixup: float = 0.0
    seed: int = 0
    prof: int = -1
    mode: str = "train"  # train | benchmark-training | evaluate
    data_backend: str = "synthetic"
    data_dir: str = ""
    workspace: str = "./workspace"
    resume: bool = False
    ema: float = 0.0  # 0 disables; reference EMA decay e.g. 0.9999
    accum_steps: int = 1
    steps_per_epoch: int = 100  # synthetic backend epoch length
    mesh_data: int = -1
    mesh_model: int = 1
    mesh_sequence: int = 1  # context parallelism (BERT --attention-impl ring)
    amp: bool = True  # bf16 compute (reference AMP flag; bf16 needs no scaler)
    early_stopping_patience: int = -1
    # dropout/noise PRNG: "auto" = hardware RngBitGenerator on TPU (measured
    # -31 ms/step on BERT-Large: threefry dropout masks are pure VPU work),
    # threefry elsewhere; bitwise reproducibility across backends needs
    # --rng-impl threefry
    rng_impl: str = "auto"  # auto | rbg | threefry
    # "" (fp) or "qat": int8 fake-quant convs during training (reference
    # ConvNets quantization.py; fine-tune from an fp32 --resume checkpoint)
    quant_policy: str = ""
    image_size: int = 0  # 0 = per-model default (detectors: pow-2 >= 128)


def _make_schedule(cfg: CommonConfig, steps_per_epoch: int):
    if cfg.lr_schedule == "cosine":
        return opt.lr_cosine_policy(cfg.lr, cfg.warmup_epochs, cfg.epochs, steps_per_epoch)
    if cfg.lr_schedule == "linear":
        return opt.lr_linear_policy(cfg.lr, cfg.warmup_epochs, cfg.epochs, steps_per_epoch)
    if cfg.lr_schedule == "step":
        return opt.lr_step_policy(
            cfg.lr, [30, 60, 80], 0.1, cfg.warmup_epochs, steps_per_epoch
        )
    return lambda step: cfg.lr


def _common_setup(cfg: CommonConfig, name: str):
    mesh = build_mesh(MeshSpec(data=cfg.mesh_data, model=cfg.mesh_model,
                               sequence=cfg.mesh_sequence))
    logger = Logger(
        backends=[
            StdOutBackend(),
            JSONStreamBackend(f"{cfg.workspace}/{name}_raport.json"),
        ]
        if jax.process_index() == 0
        else [],
        enabled=jax.process_index() == 0,
    )
    logger.parameters(cfgmod.to_dict(cfg))
    return mesh, logger


def _loop_cfg(cfg: CommonConfig, watch="val_loss", mode="min") -> LoopConfig:
    bench = cfg.mode == "benchmark-training"
    return LoopConfig(
        epochs=cfg.epochs,
        prof=cfg.prof if cfg.prof > 0 else (100 if bench else -1),
        early_stop_patience=cfg.early_stopping_patience,
        watch_metric=watch,
        watch_mode=mode,
        skip_final_eval=bench,
    )


def _dtype(cfg: CommonConfig):
    return jnp.bfloat16 if cfg.amp else jnp.float32


def _train_key(cfg: CommonConfig, offset: int = 1) -> jax.Array:
    impl = cfg.rng_impl
    if impl == "auto":
        impl = "rbg" if jax.default_backend() in ("tpu", "axon") else "threefry2x32"
    elif impl == "threefry":
        impl = "threefry2x32"
    return jax.random.key(cfg.seed + offset, impl=impl)


def _maybe_resume(cfg: CommonConfig, ckpt: CheckpointManager, state,
                  steps_per_epoch: int):
    """Restore the latest checkpoint and derive the epoch to resume at.

    The reference restores both model state AND epoch counter
    (``ConvNets/main.py:421-451``); restoring state but restarting at epoch 0
    would re-run the full schedule on top of the restored step."""
    start_epoch = 0
    if cfg.resume and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        start_epoch = int(state.step) // max(steps_per_epoch, 1)
    return state, start_epoch


# ---------------------------------------------------------------------------
# per-model runners
# ---------------------------------------------------------------------------


def run_convnet(arch: str, cfg: CommonConfig) -> None:
    from ..data.synthetic import SyntheticImageLoader
    from ..models.convnets import (
        EFFNET_ARCHS, GPUNET_ARCHS, ClassificationTask, build_model,
    )

    mesh, logger = _common_setup(cfg, arch)
    if arch in EFFNET_ARCHS:
        image_size = EFFNET_ARCHS[arch].resolution
    elif arch in GPUNET_ARCHS:
        image_size = GPUNET_ARCHS[arch].resolution
    else:
        image_size = 224
    task = ClassificationTask(
        build_model(arch, 1000, _dtype(cfg),
                    quantized=cfg.quant_policy == "qat"),
        label_smoothing=cfg.label_smoothing,
        mixup_alpha=cfg.mixup,
        num_classes=1000,
    )
    params, mstate = task.init(jax.random.key(cfg.seed), (image_size, image_size, 3))
    if cfg.data_backend == "synthetic":
        loader = SyntheticImageLoader(
            cfg.batch_size, image_size, 1000, steps=cfg.steps_per_epoch
        )
        val_loader = SyntheticImageLoader(cfg.batch_size, image_size, 1000, steps=10)
        train_iter_fn = lambda: prefetch_to_device(loader, mesh)
        val_iter_fn = lambda: prefetch_to_device(val_loader, mesh)
    else:
        from ..data import background
        from ..data.imagenet import ImageNetLoader

        loader = ImageNetLoader(cfg.data_dir, "train", cfg.batch_size, image_size)
        val_loader = ImageNetLoader(cfg.data_dir, "val", cfg.batch_size, image_size)
        # decode on a producer thread, overlapped with the step loop
        train_iter_fn = lambda: prefetch_to_device(background(iter(loader)), mesh)
        val_iter_fn = lambda: prefetch_to_device(background(iter(val_loader)), mesh)

    sched = _make_schedule(cfg, len(loader))
    tx = opt.sgd(sched, cfg.momentum, cfg.weight_decay, params_for_mask=params)
    state = create_train_state(
        params, tx, _train_key(cfg), mstate, ema=cfg.ema > 0
    )
    ckpt = CheckpointManager(f"{cfg.workspace}/{arch}_ckpt")
    state, start_epoch = _maybe_resume(cfg, ckpt, state, len(loader))
    train_step = make_train_step(
        task.loss_fn, tx, accum_steps=cfg.accum_steps,
        ema_decay=cfg.ema if cfg.ema > 0 else None,
    )
    eval_step = make_eval_step(task.metric_fn)
    train_loop(
        state, train_step, train_iter_fn,
        cfg=_loop_cfg(cfg, watch="top1", mode="max"), logger=logger,
        eval_step=eval_step, eval_iter_fn=val_iter_fn,
        checkpoints=ckpt, batch_size=cfg.batch_size, start_epoch=start_epoch,
    )


def run_ssd(cfg: CommonConfig) -> None:
    from ..data.ssd_synthetic import SyntheticSSDLoader
    from ..models.ssd import SSDTask

    mesh, logger = _common_setup(cfg, "ssd300")
    task = SSDTask(dtype=_dtype(cfg))
    params, mstate = task.init(jax.random.key(cfg.seed))
    eval_fn = None
    watch, watch_mode = "val_loss", "min"
    if cfg.data_backend == "coco":
        from ..data import background
        from ..data.coco import CocoDetectionDataset, CocoSSDLoader
        from ..models.ssd.evaluate import evaluate_ssd

        ds = CocoDetectionDataset(
            f"{cfg.data_dir}/train2017",
            f"{cfg.data_dir}/annotations/instances_train2017.json",
        )
        loader = CocoSSDLoader(ds, cfg.batch_size, task.dboxes)
        train_iter_fn = lambda: prefetch_to_device(background(iter(loader)), mesh)
        # in-training COCO mAP on eval epochs (reference SSD/main.py:224-228)
        val_ds = CocoDetectionDataset(
            f"{cfg.data_dir}/val2017",
            f"{cfg.data_dir}/annotations/instances_val2017.json",
        )
        val_loader = CocoSSDLoader(
            val_ds, cfg.batch_size, task.dboxes, train=False
        )
        eval_fn = lambda state: evaluate_ssd(
            task, state.params, state.model_state, val_loader
        )
        watch, watch_mode = "mAP", "max"
    else:
        loader = SyntheticSSDLoader(cfg.batch_size, task.dboxes, steps=cfg.steps_per_epoch)
        train_iter_fn = lambda: prefetch_to_device(loader, mesh)
    sched = _make_schedule(cfg, len(loader))
    # tencent_trick: no WD on bias/BN (ssd/train.py:192) via params mask
    tx = opt.sgd(sched, cfg.momentum, cfg.weight_decay, params_for_mask=params)
    state = create_train_state(params, tx, _train_key(cfg), mstate)
    ckpt = CheckpointManager(f"{cfg.workspace}/ssd300_ckpt")
    state, start_epoch = _maybe_resume(cfg, ckpt, state, len(loader))
    train_step = make_train_step(task.loss_fn, tx, accum_steps=cfg.accum_steps)
    train_loop(
        state, train_step, train_iter_fn,
        cfg=_loop_cfg(cfg, watch=watch, mode=watch_mode), logger=logger,
        eval_fn=eval_fn, checkpoints=ckpt,
        batch_size=cfg.batch_size, start_epoch=start_epoch,
    )


@dataclass
class DlrmCliConfig(CommonConfig):
    num_tables: int = 26
    cardinality: int = 100_000  # uniform synthetic cardinality per table
    embedding_dim: int = 128
    auc_threshold: float = 0.0  # stop at target AUC (reference --auc_threshold)


@dataclass
class BertCliConfig(CommonConfig):
    bert_model: str = "large"
    seq_len: int = 128
    max_predictions: int = 20
    remat: bool = False
    phase2: bool = False
    phase1_ckpt: str = ""  # phase2: init params from a phase-1 checkpoint
    zero: bool = False  # ZeRO-1: shard optimizer state over the data axis
    # bf16 LAMB moments: production default (halves optimizer HBM+traffic;
    # 396 vs 381 seq/s measured, loss-curve-validated); fp32 = reference math
    lamb_moments: str = "bf16"  # bf16 | fp32
    # flat-buffer Pallas fused LAMB (core/flat.py): measured slower end-to-end
    # than the XLA tree update on v5e (346 vs 396 seq/s) — kept selectable
    # for A/B and for larger-model regimes where optimizer traffic dominates
    flat_lamb: bool = False
    binned: bool = False  # LDDL-style sequence-length binning (wiki backend)
    # "flash" (default) | "xla" (short-seq ablation) | "ring"
    # (sequence-parallel over the mesh `sequence` axis; set --mesh-sequence N)
    attention_impl: str = "flash"


def run_bert_pretrain(cfg: BertCliConfig) -> None:
    import dataclasses as dc

    from ..data.synthetic import SyntheticBertLoader
    from ..models.bert import BERT_CONFIGS, BertPretrainTask
    from ..ops.lamb import lamb

    if cfg.phase2:
        cfg.seq_len, cfg.max_predictions = 512, 76
    mesh, logger = _common_setup(cfg, "bert_pretrain")
    bcfg = dc.replace(BERT_CONFIGS[cfg.bert_model], remat=cfg.remat,
                      attention_impl=cfg.attention_impl)
    if cfg.attention_impl == "ring":
        # the ambient mesh gives ops/ring_attention.py its `sequence` axis
        jax.set_mesh(mesh)
    task = BertPretrainTask(bcfg, _dtype(cfg), max_predictions=cfg.max_predictions)
    params, mstate = task.init(jax.random.key(cfg.seed), seq_len=cfg.seq_len)
    if cfg.data_backend == "corpus":
        # tokenized shards from data.bert_prep.prepare_corpus — the real-data
        # path (reference run_pretraining.py:557-570's loader role); the last
        # documents are held out for MLM/NSP-accuracy validation
        from ..data.bert_pretrain import (
            BertPretrainLoader, BinnedBertPretrainLoader, MaskingConfig,
        )
        from ..data.bert_prep import load_corpus_shards

        docs = load_corpus_shards(
            cfg.data_dir, shard=(jax.process_index(), jax.process_count())
        )
        n_eval = max(2, len(docs) // 100)
        mcfg = MaskingConfig(
            vocab_size=bcfg.vocab_size,
            max_predictions_per_seq=cfg.max_predictions,
        )
        # --binned: LDDL-style length-bucketed batches (fewer pad FLOPs,
        # one compile per bucket length)
        loader_cls = BinnedBertPretrainLoader if cfg.binned \
            else BertPretrainLoader
        loader = loader_cls(
            docs[:-n_eval], cfg.batch_size, cfg.seq_len, mcfg, seed=cfg.seed,
            steps_per_epoch=cfg.steps_per_epoch if cfg.mode != "train" else None,
        )
        val_loader = BertPretrainLoader(
            docs[-n_eval:], cfg.batch_size, cfg.seq_len, mcfg,
            seed=cfg.seed + 7, steps_per_epoch=10,
        )
    else:
        loader = SyntheticBertLoader(
            cfg.batch_size, cfg.seq_len, bcfg.vocab_size, cfg.max_predictions,
            steps=cfg.steps_per_epoch,
        )
        val_loader = SyntheticBertLoader(
            cfg.batch_size, cfg.seq_len, bcfg.vocab_size, cfg.max_predictions,
            steps=5,
        )
    total = cfg.epochs * len(loader)
    sched = opt.lr_poly_warmup(cfg.lr, max(total // 100, 1), total)
    mdt = jnp.bfloat16 if cfg.lamb_moments == "bf16" else jnp.float32
    # reference no-decay group (run_pretraining.py:423-427): bias/gamma/beta/
    # LayerNorm = exactly the 1-D params here; with use_nvlamb=False those
    # also take a plain-lr step (no trust ratio) — see ops/lamb.py
    tx = lamb(sched, weight_decay=cfg.weight_decay or 0.01, moment_dtype=mdt,
              mask=jax.tree_util.tree_map(lambda p: p.ndim > 1, params))
    if cfg.phase1_ckpt:
        # phase2 chaining (reference --phase1_end_step/init_checkpoint,
        # run_pretraining.py:430-445): carry params over, FRESH optimizer and
        # LR schedule for the s512 phase
        phase1 = CheckpointManager(cfg.phase1_ckpt)
        tmpl = create_train_state(params, tx, _train_key(cfg), mstate)
        params = phase1.restore(tmpl).params
    loss_fn = task.loss_fn
    if cfg.flat_lamb:
        if cfg.zero:
            raise SystemExit("--flat-lamb and --zero are mutually exclusive")
        from ..core.flat import flatten_train

        loss_fn, tx, params = flatten_train(
            task.loss_fn, params, lr=sched,
            weight_decay=cfg.weight_decay or 0.01, moment_dtype=mdt,
        )
    state = create_train_state(params, tx, _train_key(cfg), mstate)
    ckpt = CheckpointManager(f"{cfg.workspace}/bert_ckpt")
    state, start_epoch = _maybe_resume(cfg, ckpt, state, len(loader))
    if cfg.zero:
        # LAMB's fp32 moments sharded over the data axis (ZeRO-1);
        # per-chip optimizer memory drops by the DP degree
        from ..parallel.zero import shard_optimizer_state

        state = state.replace(
            opt_state=shard_optimizer_state(state.opt_state, mesh)
        )
    train_step = make_train_step(loss_fn, tx, accum_steps=cfg.accum_steps)
    metric_fn = task.metric_fn
    if cfg.flat_lamb:
        from ..core.flat import unflatten

        metric_fn = lambda p, ms, b: task.metric_fn(
            unflatten(loss_fn.layout, p, loss_fn.dtypes), ms, b
        )
    eval_step = make_eval_step(metric_fn)
    train_loop(
        state, train_step, lambda: prefetch_to_device(loader, mesh),
        cfg=_loop_cfg(cfg, watch="mlm_acc", mode="max"), logger=logger,
        eval_step=eval_step,
        eval_iter_fn=lambda: prefetch_to_device(val_loader, mesh),
        checkpoints=ckpt, batch_size=cfg.batch_size, start_epoch=start_epoch,
    )


@dataclass
class SquadCliConfig(CommonConfig):
    bert_model: str = "large"
    max_seq_length: int = 384
    doc_stride: int = 128
    vocab_file: str = ""
    train_file: str = ""
    predict_file: str = ""  # dev json; enables EM/F1 eval (run_squad --do_predict)
    init_checkpoint: str = ""  # torch BERT checkpoint to fine-tune from
    # SQuAD v2 (reference --version_2_with_negative + --null_score_diff_threshold)
    version_2_with_negative: bool = False
    null_score_diff_threshold: float = 0.0
    # bert_adam = the reference's fp32 BertAdam (optimization.py:64, parity-
    # tested); adamw = the FusedAdam/amp-equivalent path
    optimizer: str = "bert_adam"


def _bert_finetune_tx(optimizer: str, lr: float, total: int, params,
                      warmup: float = 0.1):
    """Fine-tune optimizer per the reference recipe: ``BertAdam`` with
    warmup_linear (no bias correction, per-param clip) in the fp32 path, or
    AdamW + linear warmup/decay matching the fp16 FusedAdam path."""
    if optimizer == "bert_adam":
        mask = jax.tree_util.tree_map(lambda p: p.ndim > 1, params)
        return opt.bert_adam(lr, warmup=warmup, t_total=total, mask=mask)
    sched = opt.lr_poly_warmup(lr, max(int(total * warmup), 1), total,
                               power=1.0)
    return optax.adamw(sched, weight_decay=0.01)


@dataclasses.dataclass
class GlueCliConfig(CommonConfig):
    bert_model: str = "base"
    task_name: str = "mrpc"  # mrpc | sst-2 | cola
    max_seq_length: int = 128
    vocab_file: str = ""
    init_checkpoint: str = ""  # torch BERT checkpoint to fine-tune from
    optimizer: str = "bert_adam"  # reference run_glue.py fp32 path


# TSV column layouts per task (reference run_glue.py processors)
_GLUE_COLS = {
    "mrpc": dict(text_a_col=3, text_b_col=4, label_col=0),
    "sst-2": dict(text_a_col=0, text_b_col=None, label_col=1),
    "cola": dict(text_a_col=3, text_b_col=None, label_col=1),
}


def run_bert_glue(cfg: GlueCliConfig) -> None:
    """GLUE fine-tuning (reference ``run_glue.py``): train.tsv/dev.tsv in
    --data-dir, dev accuracy (+ Matthews corr for CoLA) each epoch."""
    import optax

    from ..models.bert import BERT_CONFIGS
    from ..models.bert.glue import (
        GlueTask, convert_pair_features, matthews_corrcoef, read_tsv,
    )

    mesh, logger = _common_setup(cfg, "bert_glue")
    task = GlueTask(BERT_CONFIGS[cfg.bert_model], num_labels=2,
                    dtype=_dtype(cfg))
    params, mstate = task.init(jax.random.key(cfg.seed),
                               seq_len=cfg.max_seq_length)
    if cfg.init_checkpoint:
        from ..utils.torch_import import load_bert_encoder

        params = dict(params)
        params["bert"] = load_bert_encoder(
            cfg.init_checkpoint,
            task.cfg.padded_vocab, task.cfg.num_layers,
        )
    cols = _GLUE_COLS[cfg.task_name]
    if cfg.data_dir and cfg.vocab_file:
        from ..data.tokenization import BertTokenizer

        tok = BertTokenizer(cfg.vocab_file)
        train = convert_pair_features(
            read_tsv(f"{cfg.data_dir}/train.tsv", **cols), tok,
            cfg.max_seq_length,
        )
        dev = convert_pair_features(
            read_tsv(f"{cfg.data_dir}/dev.tsv", **cols), tok,
            cfg.max_seq_length,
        )
    else:  # synthetic benchmark mode
        rng = np.random.default_rng(cfg.seed)

        def synth(n):
            return {
                "input_ids": rng.integers(
                    1, 30000, (n, cfg.max_seq_length)).astype(np.int32),
                "attention_mask": np.ones((n, cfg.max_seq_length), np.int32),
                "token_type_ids": np.zeros((n, cfg.max_seq_length), np.int32),
                "label": rng.integers(0, 2, n).astype(np.int32),
            }
        train, dev = synth(cfg.batch_size * cfg.steps_per_epoch), \
            synth(cfg.batch_size)

    def batches(data, bs, shuffle_seed=None, include_tail=False):
        n = len(data["label"])
        order = np.arange(n)
        if shuffle_seed is not None:
            np.random.default_rng(shuffle_seed).shuffle(order)
        out = []
        for i in range(0, n - bs + 1, bs):
            idx = order[i:i + bs]
            out.append({k: v[idx] for k, v in data.items()})
        if include_tail and n % bs:  # eval must score every example
            idx = order[n - n % bs:]
            out.append({k: v[idx] for k, v in data.items()})
        return out

    loader = batches(train, cfg.batch_size, shuffle_seed=cfg.seed)
    total = cfg.epochs * len(loader)
    tx = _bert_finetune_tx(cfg.optimizer, cfg.lr or 2e-5, total, params)
    state = create_train_state(params, tx, _train_key(cfg), mstate)
    ckpt = CheckpointManager(f"{cfg.workspace}/bert_glue_ckpt")
    state, start_epoch = _maybe_resume(cfg, ckpt, state, len(loader))
    train_step = make_train_step(task.loss_fn, tx, accum_steps=cfg.accum_steps)
    state, _ = train_loop(
        state, train_step, lambda: prefetch_to_device(iter(loader), mesh),
        cfg=_loop_cfg(cfg), logger=logger, checkpoints=ckpt,
        batch_size=cfg.batch_size, start_epoch=start_epoch,
    )
    # dev evaluation (reference do_eval: accuracy; CoLA reports MCC)
    infer = jax.jit(lambda p, b: task.model.apply(
        {"params": p}, b["input_ids"], b["attention_mask"],
        b["token_type_ids"]))
    preds, labels = [], []
    for b in batches(dev, min(cfg.batch_size, len(dev["label"])),
                     include_tail=True):
        preds.append(np.argmax(np.asarray(infer(state.params, b)), -1))
        labels.append(b["label"])
    if preds:
        preds = np.concatenate(preds)
        labels = np.concatenate(labels)
        out = {"dev.accuracy": float((preds == labels).mean())}
        if cfg.task_name == "cola":
            out["dev.mcc"] = matthews_corrcoef(preds, labels)
        logger.log((), out)


@dataclasses.dataclass
class SwagCliConfig(CommonConfig):
    bert_model: str = "base"
    max_seq_length: int = 128
    vocab_file: str = ""
    init_checkpoint: str = ""
    optimizer: str = "bert_adam"  # reference run_swag.py fp32 path


def run_bert_swag(cfg: SwagCliConfig) -> None:
    """SWAG multiple choice (reference ``run_swag.py``): train.csv/val.csv
    with (sent1, sent2, ending0..3, label) in --data-dir; val accuracy
    after training."""
    import csv as _csv

    import optax

    from ..models.bert import BERT_CONFIGS
    from ..models.bert.modeling import BertForMultipleChoice

    mesh, logger = _common_setup(cfg, "bert_swag")
    bcfg = BERT_CONFIGS[cfg.bert_model]
    model = BertForMultipleChoice(bcfg, num_choices=4, dtype=_dtype(cfg))

    def loss_fn(params, model_state, batch, rng):
        logits = model.apply(
            {"params": params}, batch["input_ids"], batch["attention_mask"],
            batch["token_type_ids"], deterministic=False,
            rngs={"dropout": rng},
        )
        loss = jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
            logits, batch["label"]))
        return loss, (model_state, {})

    def featurize(rows, tok):
        # rows: (context, [4 endings], label); features (N, 4, S)
        n, s = len(rows), cfg.max_seq_length
        ids = np.zeros((n, 4, s), np.int32)
        mask = np.zeros((n, 4, s), np.int32)
        seg = np.zeros((n, 4, s), np.int32)
        y = np.zeros((n,), np.int32)
        for i, (context, endings, label) in enumerate(rows):
            ta = tok.tokenize(context)
            for c, end in enumerate(endings):
                tb = tok.tokenize(end)
                while len(ta) + len(tb) > s - 3:
                    (ta if len(ta) > len(tb) else tb).pop()
                tokens = ["[CLS]"] + ta + ["[SEP]"] + tb + ["[SEP]"]
                ii = tok.convert_tokens_to_ids(tokens)
                ids[i, c, :len(ii)] = ii
                mask[i, c, :len(ii)] = 1
                seg[i, c, len(ta) + 2:len(ii)] = 1
            y[i] = label
        return {"input_ids": ids, "attention_mask": mask,
                "token_type_ids": seg, "label": y}

    def read_swag(path):
        rows = []
        with open(path) as f:
            r = _csv.reader(f)
            header = next(r)
            col = {k: i for i, k in enumerate(header)}
            for line in r:
                context = line[col["sent1"]] + " " + line[col["sent2"]]
                endings = [line[col[f"ending{i}"]] for i in range(4)]
                rows.append((context, endings, int(line[col["label"]])))
        return rows

    if cfg.data_dir and cfg.vocab_file:
        from ..data.tokenization import BertTokenizer

        tok = BertTokenizer(cfg.vocab_file)
        train = featurize(read_swag(f"{cfg.data_dir}/train.csv"), tok)
        val = featurize(read_swag(f"{cfg.data_dir}/val.csv"), tok)
    else:
        rng = np.random.default_rng(cfg.seed)

        def synth(n):
            return {
                "input_ids": rng.integers(
                    1, 30000, (n, 4, cfg.max_seq_length)).astype(np.int32),
                "attention_mask": np.ones((n, 4, cfg.max_seq_length),
                                          np.int32),
                "token_type_ids": np.zeros((n, 4, cfg.max_seq_length),
                                           np.int32),
                "label": rng.integers(0, 4, n).astype(np.int32),
            }
        train = synth(cfg.batch_size * cfg.steps_per_epoch)
        val = synth(cfg.batch_size)

    ids0 = jnp.zeros((2, 4, cfg.max_seq_length), jnp.int32)
    params = model.init(
        {"params": jax.random.key(cfg.seed), "dropout": jax.random.key(1)},
        ids0, ids0, ids0, deterministic=True,
    )["params"]
    if cfg.init_checkpoint:
        from ..utils.torch_import import load_bert_encoder

        params = dict(params)
        params["bert"] = load_bert_encoder(
            cfg.init_checkpoint,
            bcfg.padded_vocab, bcfg.num_layers,
        )

    def batches(data, bs, include_tail=False):
        n = len(data["label"])
        out = [{k: v[i:i + bs] for k, v in data.items()}
               for i in range(0, n - bs + 1, bs)]
        if include_tail and n % bs:  # eval must score every example
            out.append({k: v[n - n % bs:] for k, v in data.items()})
        return out

    loader = batches(train, cfg.batch_size)
    total = cfg.epochs * len(loader)
    tx = _bert_finetune_tx(cfg.optimizer, cfg.lr or 2e-5, total, params)
    state = create_train_state(params, tx, _train_key(cfg), {})
    ckpt = CheckpointManager(f"{cfg.workspace}/bert_swag_ckpt")
    state, start_epoch = _maybe_resume(cfg, ckpt, state, len(loader))
    train_step = make_train_step(loss_fn, tx, accum_steps=cfg.accum_steps)
    state, _ = train_loop(
        state, train_step, lambda: prefetch_to_device(iter(loader), mesh),
        cfg=_loop_cfg(cfg), logger=logger, checkpoints=ckpt,
        batch_size=cfg.batch_size, start_epoch=start_epoch,
    )
    infer = jax.jit(lambda p, b: model.apply(
        {"params": p}, b["input_ids"], b["attention_mask"],
        b["token_type_ids"]))
    preds, labels = [], []
    for b in batches(val, min(cfg.batch_size, len(val["label"])),
                     include_tail=True):
        preds.append(np.argmax(np.asarray(infer(state.params, b)), -1))
        labels.append(b["label"])
    if preds:
        acc = float((np.concatenate(preds) == np.concatenate(labels)).mean())
        logger.log((), {"val.accuracy": acc})


def run_bert_squad(cfg: SquadCliConfig) -> None:
    import optax

    from ..models.bert import BERT_CONFIGS, BertSquadTask

    mesh, logger = _common_setup(cfg, "bert_squad")
    task = BertSquadTask(BERT_CONFIGS[cfg.bert_model], _dtype(cfg))
    params, mstate = task.init(jax.random.key(cfg.seed), seq_len=cfg.max_seq_length)
    if cfg.init_checkpoint:
        from ..utils.torch_import import load_bert_encoder

        params = dict(params)
        params["bert"] = load_bert_encoder(
            cfg.init_checkpoint, task.cfg.padded_vocab, task.cfg.num_layers,
        )
    if cfg.train_file and cfg.vocab_file:
        from ..data.squad import (
            SquadLoader, convert_examples_to_features, read_squad_examples,
        )
        from ..data.tokenization import BertTokenizer

        tok = BertTokenizer(cfg.vocab_file)
        feats = convert_examples_to_features(
            read_squad_examples(cfg.train_file), tok,
            cfg.max_seq_length, cfg.doc_stride,
        )
        loader = SquadLoader(feats, cfg.batch_size, seed=cfg.seed)
    else:  # synthetic features (benchmark mode)
        import numpy as _np

        rng = _np.random.default_rng(cfg.seed)
        fixed = {
            "input_ids": rng.integers(1, 30000, (cfg.batch_size, cfg.max_seq_length)).astype(_np.int32),
            "attention_mask": _np.ones((cfg.batch_size, cfg.max_seq_length), _np.int32),
            "token_type_ids": _np.zeros((cfg.batch_size, cfg.max_seq_length), _np.int32),
            "start_positions": rng.integers(0, cfg.max_seq_length, cfg.batch_size).astype(_np.int32),
            "end_positions": rng.integers(0, cfg.max_seq_length, cfg.batch_size).astype(_np.int32),
        }
        loader = [fixed] * cfg.steps_per_epoch

    eval_fn = None
    watch, watch_mode = "val_loss", "min"
    if cfg.predict_file and cfg.vocab_file:
        # dev-set prediction + official EM/F1 each eval epoch
        # (reference run_squad.py:427-478 + evaluate-v1.1)
        from ..data.squad import (
            convert_examples_to_features as to_features,
            read_squad_examples as read_examples,
        )
        from ..data.tokenization import BertTokenizer as Tok
        from ..models.bert import (
            predict_squad, read_squad_references, write_predictions,
        )
        from ..models.bert.squad_eval import (
            apply_null_threshold, find_best_null_threshold, squad_evaluate,
        )

        dev_feats = to_features(
            read_examples(cfg.predict_file, is_training=False), Tok(cfg.vocab_file),
            cfg.max_seq_length, cfg.doc_stride, is_training=False,
        )
        refs = read_squad_references(cfg.predict_file)

        def eval_fn(state):
            if not cfg.version_2_with_negative:
                preds = predict_squad(task, state.params, dev_feats, cfg.batch_size)
                write_predictions(preds, f"{cfg.workspace}/predictions.json")
                return squad_evaluate(preds, refs)
            # v2: unthresholded span text + null odds, then the configured
            # threshold for the reported metric and a best-threshold sweep
            # (reference run_squad + evaluate-v2.0 find_best_thresh)
            preds, null_odds = predict_squad(
                task, state.params, dev_feats, cfg.batch_size,
                version_2_with_negative=True,
                null_score_diff_threshold=float("inf"),
                return_null_odds=True,
            )
            thresholded = apply_null_threshold(
                preds, null_odds, cfg.null_score_diff_threshold
            )
            write_predictions(thresholded, f"{cfg.workspace}/predictions.json")
            write_predictions(null_odds, f"{cfg.workspace}/null_odds.json")
            metrics = squad_evaluate(thresholded, refs)
            best_t, best_m = find_best_null_threshold(preds, null_odds, refs)
            metrics["best_f1"] = best_m["f1"]
            metrics["best_f1_thresh"] = best_t
            return metrics

        watch, watch_mode = "f1", "max"
    total = cfg.epochs * len(loader)
    tx = _bert_finetune_tx(cfg.optimizer, cfg.lr or 3e-5, total, params)
    state = create_train_state(params, tx, _train_key(cfg), mstate)
    ckpt = CheckpointManager(f"{cfg.workspace}/bert_squad_ckpt")
    state, start_epoch = _maybe_resume(cfg, ckpt, state, len(loader))
    train_step = make_train_step(task.loss_fn, tx, accum_steps=cfg.accum_steps)
    train_loop(
        state, train_step, lambda: prefetch_to_device(iter(loader), mesh),
        cfg=_loop_cfg(cfg, watch=watch, mode=watch_mode), logger=logger,
        eval_fn=eval_fn, checkpoints=ckpt,
        batch_size=cfg.batch_size, start_epoch=start_epoch,
    )


def run_dlrm(cfg: DlrmCliConfig) -> None:
    from ..data.synthetic import SyntheticDlrmLoader
    from ..models.dlrm import DlrmConfig, DlrmTask, make_dlrm_optimizer

    mesh, logger = _common_setup(cfg, "dlrm")
    if cfg.data_backend == "binary":
        from ..data.criteo import CriteoBinaryDataset, FeatureSpec

        spec = FeatureSpec.from_yaml(f"{cfg.data_dir}/feature_spec.yaml")
        cards = tuple(spec.categorical_cardinalities)
    else:
        spec = None
        cards = tuple(int(c) for c in np.full(cfg.num_tables, cfg.cardinality))
    task = DlrmTask(
        DlrmConfig(
            categorical_cardinalities=cards,
            embedding_dim=cfg.embedding_dim,
            bottom_mlp=(512, 256, cfg.embedding_dim),
        ),
        _dtype(cfg),
    )
    params, mstate = task.init(jax.random.key(cfg.seed))
    if cfg.mesh_model > 1:
        # hybrid parallelism: embedding table row-sharded over the model
        # axis, batch over data — GSPMD inserts the lookup all-to-all the
        # reference hand-writes (dlrm/model/distributed.py:25-98)
        from jax.sharding import NamedSharding, PartitionSpec as P

        params = dict(params)
        params["embedding_table"] = jax.device_put(
            params["embedding_table"], NamedSharding(mesh, P("model", None))
        )
    tx = make_dlrm_optimizer(params, mlp_lr=cfg.lr, embedding_lr=cfg.lr)
    state = create_train_state(params, tx, _train_key(cfg), mstate)
    if spec is not None:
        # held-out eval on REAL rows: a test/ split dir if present, else the
        # trailing 2% of rows (the reference's last-day convention)
        import os as _os

        test_dir = _os.path.join(cfg.data_dir, "test")
        if _os.path.isdir(test_dir):
            loader = CriteoBinaryDataset(cfg.data_dir, spec, cfg.batch_size)
            val_loader = CriteoBinaryDataset(
                test_dir, spec, cfg.batch_size, drop_last=False
            )
        else:
            loader = CriteoBinaryDataset(
                cfg.data_dir, spec, cfg.batch_size, row_range=(0.0, 0.98)
            )
            val_loader = CriteoBinaryDataset(
                cfg.data_dir, spec, cfg.batch_size, row_range=(0.98, 1.0),
                drop_last=False,
            )
    else:
        loader = SyntheticDlrmLoader(cfg.batch_size, list(cards), steps=cfg.steps_per_epoch)
        val_loader = SyntheticDlrmLoader(cfg.batch_size, list(cards), steps=5, seed=1)
    ckpt = CheckpointManager(f"{cfg.workspace}/dlrm_ckpt")
    state, start_epoch = _maybe_resume(cfg, ckpt, state, len(loader))
    train_step = make_train_step(task.loss_fn, tx)
    # dataset-level AUC over all eval scores (not a mean of per-batch AUCs)
    eval_step = make_eval_step(task.eval_collect_fn)
    loop_cfg = _loop_cfg(cfg, watch="auc", mode="max")
    if cfg.auc_threshold > 0:
        loop_cfg = dataclasses.replace(loop_cfg, target_metric=cfg.auc_threshold)
    train_loop(
        state, train_step, lambda: prefetch_to_device(loader, mesh),
        cfg=loop_cfg, logger=logger,
        eval_step=eval_step, eval_reduce=task.eval_reduce,
        eval_iter_fn=lambda: prefetch_to_device(val_loader, mesh),
        checkpoints=ckpt, batch_size=cfg.batch_size, start_epoch=start_epoch,
    )


def run_tts(model_name: str, cfg: CommonConfig) -> None:
    import optax

    from ..data.tts_synthetic import SyntheticTacotronLoader, SyntheticWaveGlowLoader
    from ..models.tts import Tacotron2Task, WaveGlowTask

    mesh, logger = _common_setup(cfg, model_name)
    lj = None
    if cfg.data_backend == "ljspeech":
        from ..data.ljspeech import LJSpeechDataset

        lj = LJSpeechDataset(cfg.data_dir)
    if model_name == "tacotron2":
        task = Tacotron2Task(dtype=_dtype(cfg))
        if lj is not None:
            from ..data.ljspeech import TacotronLoader

            loader = TacotronLoader(lj, cfg.batch_size)
        else:
            loader = SyntheticTacotronLoader(cfg.batch_size, steps=cfg.steps_per_epoch)
        params, mstate = task.init(jax.random.key(cfg.seed))
    else:
        task = WaveGlowTask(dtype=_dtype(cfg))
        if lj is not None:
            from ..data.ljspeech import WaveGlowLoader

            loader = WaveGlowLoader(lj, cfg.batch_size)
        else:
            loader = SyntheticWaveGlowLoader(cfg.batch_size, steps=cfg.steps_per_epoch)
        params, mstate = task.init(jax.random.key(cfg.seed))
    tx = optax.chain(
        optax.clip_by_global_norm(1.0), optax.adam(cfg.lr or 1e-3)
    )
    state = create_train_state(params, tx, _train_key(cfg), mstate)
    ckpt = CheckpointManager(f"{cfg.workspace}/{model_name}_ckpt")
    train_step = make_train_step(task.loss_fn, tx, accum_steps=cfg.accum_steps)
    train_loop(
        state, train_step, lambda: prefetch_to_device(loader, mesh),
        cfg=_loop_cfg(cfg), logger=logger, checkpoints=ckpt,
        batch_size=cfg.batch_size,
    )


def run_transformer(cfg: CommonConfig) -> None:
    import optax

    from ..models.translation import TransformerConfig, TransformerTask

    mesh, logger = _common_setup(cfg, "transformer")
    tcfg = TransformerConfig()
    task = TransformerTask(tcfg, _dtype(cfg))
    params, mstate = task.init(jax.random.key(cfg.seed))
    rng = np.random.default_rng(cfg.seed)
    src = rng.integers(3, tcfg.vocab_size, (cfg.batch_size, 64)).astype(np.int32)
    tgt = np.concatenate(
        [np.full((cfg.batch_size, 1), tcfg.bos_id), src[:, :62],
         np.full((cfg.batch_size, 1), tcfg.eos_id)], axis=1,
    ).astype(np.int32)
    loader = [{"src": src, "tgt": tgt}] * cfg.steps_per_epoch
    total = cfg.epochs * len(loader)
    sched = opt.lr_poly_warmup(cfg.lr or 5e-4, max(total // 20, 1), total, power=0.5)
    tx = optax.adamw(sched, b1=0.9, b2=0.997, weight_decay=0.0)
    state = create_train_state(params, tx, _train_key(cfg), mstate)
    ckpt = CheckpointManager(f"{cfg.workspace}/transformer_ckpt")
    train_step = make_train_step(task.loss_fn, tx, accum_steps=cfg.accum_steps)
    train_loop(
        state, train_step, lambda: prefetch_to_device(iter(loader), mesh),
        cfg=_loop_cfg(cfg), logger=logger, checkpoints=ckpt,
        batch_size=cfg.batch_size,
    )


def run_ncf(cfg: CommonConfig) -> None:
    import optax

    from ..models.ncf import NcfConfig, NcfTask

    mesh, logger = _common_setup(cfg, "ncf")
    ncfg = NcfConfig()
    task = NcfTask(ncfg, _dtype(cfg))
    params, mstate = task.init(jax.random.key(cfg.seed))
    rng = np.random.default_rng(cfg.seed)
    bs = cfg.batch_size
    loader = [{
        "user": rng.integers(0, ncfg.nb_users, bs).astype(np.int32),
        "item": rng.integers(0, ncfg.nb_items, bs).astype(np.int32),
        "label": rng.integers(0, 2, bs).astype(np.float32),
    }] * cfg.steps_per_epoch
    tx = optax.adam(cfg.lr or 2.5e-3)
    state = create_train_state(params, tx, _train_key(cfg), mstate)
    ckpt = CheckpointManager(f"{cfg.workspace}/ncf_ckpt")
    train_step = make_train_step(task.loss_fn, tx)
    train_loop(
        state, train_step, lambda: prefetch_to_device(iter(loader), mesh),
        cfg=_loop_cfg(cfg), logger=logger, checkpoints=ckpt,
        batch_size=cfg.batch_size,
    )


def run_efficientdet(cfg: CommonConfig) -> None:
    """EfficientDet-d0 training (reference ``Efficientdet/train.py``);
    synthetic COCO-shaped batches (benchmark mode)."""
    import optax

    from ..data.det_synthetic import SyntheticDetectionLoader
    from ..models.efficientdet import EfficientDetConfig, EfficientDetTask

    mesh, logger = _common_setup(cfg, "efficientdet")
    ecfg = EfficientDetConfig(image_size=cfg.image_size or 512)
    task = EfficientDetTask(ecfg, dtype=_dtype(cfg))
    params, mstate = task.init(jax.random.key(cfg.seed))
    ds_val = None
    if cfg.data_backend == "coco":
        from ..data.coco import CocoDetectionDataset, CocoRawLoader

        ds = CocoDetectionDataset(
            f"{cfg.data_dir}/train2017",
            f"{cfg.data_dir}/annotations/instances_train2017.json",
        )
        loader = CocoRawLoader(ds, cfg.batch_size, task.cfg.image_size,
                               max_gt=task.max_gt, seed=cfg.seed)
        import os as _os

        val_ann = f"{cfg.data_dir}/annotations/instances_val2017.json"
        if _os.path.exists(val_ann):
            ds_val = CocoDetectionDataset(f"{cfg.data_dir}/val2017", val_ann)
    else:
        loader = SyntheticDetectionLoader(
            cfg.batch_size, task.cfg.image_size, task.cfg.num_classes,
            max_gt=task.max_gt, steps=cfg.steps_per_epoch, seed=cfg.seed,
        )
    sched = _make_schedule(cfg, len(loader))
    tx = optax.chain(optax.clip_by_global_norm(10.0),
                     optax.sgd(sched, momentum=cfg.momentum))
    state = create_train_state(params, tx, _train_key(cfg), mstate)
    ckpt = CheckpointManager(f"{cfg.workspace}/efficientdet_ckpt")
    state, start_epoch = _maybe_resume(cfg, ckpt, state, len(loader))
    train_step = make_train_step(task.loss_fn, tx, accum_steps=cfg.accum_steps)
    state, _ = train_loop(
        state, train_step, lambda: prefetch_to_device(loader, mesh),
        cfg=_loop_cfg(cfg), logger=logger, checkpoints=ckpt,
        batch_size=cfg.batch_size, start_epoch=start_epoch,
    )
    if ds_val is not None:
        # COCO box AP on the val split (reference validate.py / COCOeval)
        from ..data.coco import CocoRawLoader
        from ..models.ssd.coco_eval import CocoMAP

        val = CocoRawLoader(ds_val, cfg.batch_size, task.cfg.image_size,
                            max_gt=task.max_gt, train=False)
        predict = jax.jit(lambda p, m, im: task.predict(
            p, m, im, max_out=100, score_threshold=0.05))
        ev = CocoMAP()
        for batch in val:
            boxes, scores, labels, valid = predict(
                state.params, state.model_state, jnp.asarray(batch["image"]))
            for i in range(batch.get("n_valid", batch["image"].shape[0])):
                keep = np.asarray(valid[i])
                gv = batch["valid"][i]
                ev.add_image(np.asarray(boxes[i])[keep],
                             np.asarray(labels[i])[keep],
                             np.asarray(scores[i])[keep],
                             batch["boxes"][i][gv], batch["labels"][i][gv])
        m = ev.compute()
        logger.log((), {"val.bbox_mAP": m["mAP"],
                        "val.bbox_mAP50": m["mAP50"]})


def run_maskrcnn(cfg: CommonConfig) -> None:
    """Mask R-CNN R50-FPN training (reference ``MaskRCNN/.../train_net.py``);
    synthetic COCO-shaped batches with dense instance masks."""
    import optax

    from ..data.det_synthetic import SyntheticDetectionLoader
    from ..models.maskrcnn import MaskRCNNConfig, MaskRCNNTask

    mesh, logger = _common_setup(cfg, "maskrcnn")
    mcfg = MaskRCNNConfig(image_size=cfg.image_size or 800)
    task = MaskRCNNTask(mcfg, dtype=_dtype(cfg))
    params, mstate = task.init(jax.random.key(cfg.seed))
    ds_val = None
    if cfg.data_backend == "coco":
        from ..data.coco import CocoDetectionDataset, CocoRawLoader

        ds = CocoDetectionDataset(
            f"{cfg.data_dir}/train2017",
            f"{cfg.data_dir}/annotations/instances_train2017.json",
        )
        loader = CocoRawLoader(ds, cfg.batch_size, task.cfg.image_size,
                               max_gt=16, with_masks=True, seed=cfg.seed)
        val_ann = f"{cfg.data_dir}/annotations/instances_val2017.json"
        import os as _os

        if _os.path.exists(val_ann):
            ds_val = CocoDetectionDataset(f"{cfg.data_dir}/val2017", val_ann)
    else:
        loader = SyntheticDetectionLoader(
            cfg.batch_size, task.cfg.image_size, task.cfg.num_classes - 1,
            max_gt=16, steps=cfg.steps_per_epoch, with_masks=True,
            seed=cfg.seed,
        )
    sched = _make_schedule(cfg, len(loader))
    tx = optax.chain(optax.clip_by_global_norm(10.0),
                     optax.sgd(sched, momentum=cfg.momentum))
    state = create_train_state(params, tx, _train_key(cfg), mstate)
    ckpt = CheckpointManager(f"{cfg.workspace}/maskrcnn_ckpt")
    state, start_epoch = _maybe_resume(cfg, ckpt, state, len(loader))
    train_step = make_train_step(task.loss_fn, tx, accum_steps=cfg.accum_steps)
    state, _ = train_loop(
        state, train_step, lambda: prefetch_to_device(loader, mesh),
        cfg=_loop_cfg(cfg), logger=logger, checkpoints=ckpt,
        batch_size=cfg.batch_size, start_epoch=start_epoch,
    )
    if ds_val is not None:
        # COCO box + mask AP on the val split (reference tools/test_net.py
        # runs COCOeval bbox + segm after training)
        from ..data.coco import CocoRawLoader
        from ..models.ssd.coco_eval import CocoMAP, MaskMAP

        val = CocoRawLoader(ds_val, cfg.batch_size, task.cfg.image_size,
                            max_gt=16, with_masks=True, train=False)
        predict = jax.jit(lambda p, m, im: task.predict(
            p, m, im, max_out=50, score_threshold=0.05))
        box_ev = CocoMAP()
        mask_ev = MaskMAP(image_size=float(task.cfg.image_size))
        for batch in val:
            boxes, scores, labels, valid, masks = predict(
                state.params, state.model_state, jnp.asarray(batch["image"]))
            for i in range(batch.get("n_valid", batch["image"].shape[0])):
                keep = np.asarray(valid[i])
                db = np.asarray(boxes[i])[keep]
                dl = np.asarray(labels[i])[keep]
                dsc = np.asarray(scores[i])[keep]
                dm = np.asarray(masks[i])[keep]
                gv = batch["valid"][i]
                box_ev.add_image(db, dl, dsc, batch["boxes"][i][gv],
                                 batch["labels"][i][gv])
                mask_ev.add_image_masks(db, dm, dl, dsc,
                                        batch["masks"][i][gv],
                                        batch["labels"][i][gv])
        box_m, mask_m = box_ev.compute(), mask_ev.compute()
        logger.log((), {"val.bbox_mAP": box_m["mAP"],
                        "val.bbox_mAP50": box_m["mAP50"],
                        "val.segm_mAP": mask_m["mAP"],
                        "val.segm_mAP50": mask_m["mAP50"]})


def run_tft(cfg: CommonConfig) -> None:
    """TFT forecasting through the time-series platform (reference
    ``Tools/PyTorch/TimeSeriesPredictionPlatform/launch_training.py``):
    windowed panel data -> quantile training -> test-split metric suite
    (MAE/RMSE/SMAPE/ND/P50/P90)."""
    import optax

    from ..data.timeseries import (
        TimeSeriesSpec, WindowedTimeSeriesDataset, forecast_metrics,
        make_synthetic_series,
    )
    from ..models.tft import TFTConfig, TFTTask

    mesh, logger = _common_setup(cfg, "tft")
    if cfg.data_backend == "npy":
        panel = np.load(f"{cfg.data_dir}/panel.npy")  # (series, steps, cols)
    else:
        panel = make_synthetic_series()
    spec = TimeSeriesSpec(observed=(0, 1), known=(2, 3), target=0,
                          encoder_length=168, horizon=24)
    tcfg = TFTConfig(n_observed=len(spec.observed), n_known=len(spec.known),
                     encoder_len=spec.encoder_length, horizon=spec.horizon)
    task = TFTTask(tcfg)
    loader = WindowedTimeSeriesDataset(panel, spec, cfg.batch_size,
                                       split="train", seed=cfg.seed)
    params, _ = task.init(jax.random.key(cfg.seed))
    total = cfg.epochs * len(loader)
    sched = opt.lr_poly_warmup(cfg.lr or 1e-3, max(total // 20, 1), total)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(sched))
    state = create_train_state(params, tx, _train_key(cfg), {})
    ckpt = CheckpointManager(f"{cfg.workspace}/tft_ckpt")
    state, start_epoch = _maybe_resume(cfg, ckpt, state, len(loader))
    train_step = make_train_step(task.loss_fn, tx, accum_steps=cfg.accum_steps)
    state, _ = train_loop(
        state, train_step, lambda: prefetch_to_device(loader, mesh),
        cfg=_loop_cfg(cfg), logger=logger, checkpoints=ckpt,
        batch_size=cfg.batch_size, start_epoch=start_epoch,
    )
    # test-split evaluation with the TSPP metric suite
    test = WindowedTimeSeriesDataset(panel, spec, cfg.batch_size, split="test",
                                     seed=cfg.seed)
    infer = jax.jit(lambda p, o, k: task.predict_fn(p, o, k))
    preds, targets = [], []
    for batch in test:
        preds.append(np.asarray(infer(state.params, batch["observed"],
                                      batch["known"])))
        targets.append(batch["target"])
    if preds:
        m = forecast_metrics(np.concatenate(preds), np.concatenate(targets),
                             tcfg.quantiles)
        logger.log((), {f"test.{k}": v for k, v in m.items()})


@dataclasses.dataclass
class BartCliConfig(CommonConfig):
    task: str = "summarize"  # summarize | pretrain (denoising)
    vocab_file: str = ""  # WordPiece vocab; "" = build from the corpus
    max_source_len: int = 128
    max_target_len: int = 32
    beam_size: int = 4


def _corpus_vocab(paths: list[str]) -> dict:
    """Whitespace-word vocab with the Transformer's special ids
    (bos 0 / pad 1 / eos 2 / unk+mask 3) — the synthetic-corpus stand-in
    for the reference's shipped BPE vocab."""
    vocab = {"<s>": 0, "[PAD]": 1, "</s>": 2, "[UNK]": 3}
    for p in paths:
        with open(p) as f:
            for line in f:
                for w in line.lower().split():
                    if w not in vocab:
                        vocab[w] = len(vocab)
    return vocab


def run_bart(cfg: BartCliConfig) -> None:
    """BART (reference ``LanguageModeling/BART``): denoising pretrain or
    CNN-DM-layout summarization fine-tune with beam-decoded ROUGE eval
    (``finetune.py`` + ``utils/calculate_rouge.py`` roles)."""
    import optax

    from ..data.summarization import (
        SummarizationDataset, rouge_scores, write_synthetic_summarization,
    )
    from ..data.tokenization import BertTokenizer
    from ..models.bart import BartTask
    from ..models.translation import TransformerConfig, beam_search_cached

    mesh, logger = _common_setup(cfg, "bart")
    data_dir = cfg.data_dir
    if cfg.data_backend == "synthetic" or not data_dir:
        data_dir = f"{cfg.workspace}/bart_synth"
        write_synthetic_summarization(data_dir, seed=cfg.seed)
    vocab = cfg.vocab_file or _corpus_vocab(
        [f"{data_dir}/train.source", f"{data_dir}/train.target"]
    )
    tok = BertTokenizer(vocab)
    n_vocab = len(tok.vocab)
    tcfg = TransformerConfig(
        vocab_size=n_vocab, d_model=256, d_ff=1024, num_heads=4,
        encoder_layers=3, decoder_layers=3,
        # +2: denoising targets are the full source plus BOS/EOS
        max_len=max(cfg.max_source_len, cfg.max_target_len) + 2,
    )
    task = BartTask(tcfg, _dtype(cfg))

    if cfg.task == "pretrain":
        # denoising over the corpus lines as documents
        with open(f"{data_dir}/train.source") as f:
            docs = [np.asarray(tok.convert_tokens_to_ids(tok.tokenize(line)),
                               np.int32) for line in f]
        rng = np.random.default_rng(cfg.seed)

        def gen():
            while True:
                picks = rng.choice(len(docs), cfg.batch_size)
                yield task.make_denoising_batch(
                    [docs[i] for i in picks], cfg.max_source_len, rng)

        it = gen()
        loader = [next(it) for _ in range(cfg.steps_per_epoch)]
    else:
        loader = SummarizationDataset(
            data_dir, "train", tok, cfg.batch_size,
            max_source_len=cfg.max_source_len,
            max_target_len=cfg.max_target_len,
        )
    params, mstate = task.init(jax.random.key(cfg.seed))
    total = cfg.epochs * len(loader)
    sched = opt.lr_poly_warmup(cfg.lr or 1e-3, max(total // 20, 1), total)
    tx = optax.adamw(sched, weight_decay=0.01)
    state = create_train_state(params, tx, _train_key(cfg), mstate)
    ckpt = CheckpointManager(f"{cfg.workspace}/bart_ckpt")
    state, start_epoch = _maybe_resume(cfg, ckpt, state, len(loader))
    train_step = make_train_step(task.loss_fn, tx, accum_steps=cfg.accum_steps)
    state, _ = train_loop(
        state, train_step, lambda: prefetch_to_device(iter(loader), mesh),
        cfg=_loop_cfg(cfg), logger=logger, checkpoints=ckpt,
        batch_size=cfg.batch_size, start_epoch=start_epoch,
    )

    if cfg.task == "summarize":
        # beam-decode the val split, report corpus ROUGE
        val = SummarizationDataset(
            data_dir, "val", tok, cfg.batch_size,
            max_source_len=cfg.max_source_len,
            max_target_len=cfg.max_target_len, shuffle=False,
        )
        model = task.model
        beam = cfg.beam_size
        hyps, refs = [], []
        for batch in val:
            memory, memory_mask = model.apply(
                {"params": state.params}, jnp.asarray(batch["src"]),
                method=model.encode,
            )
            seqs, _ = beam_search_cached(
                model, state.params,
                jnp.repeat(memory, beam, axis=0),
                jnp.repeat(memory_mask, beam, axis=0),
                batch["src"].shape[0], beam,
                max_len=cfg.max_target_len + 2, bos_id=tcfg.bos_id,
                eos_id=tcfg.eos_id, pad_id=tcfg.pad_id,
                vocab_size=tcfg.vocab_size,
            )
            best = np.asarray(seqs[:, 0])
            for row, tgt in zip(best, batch["tgt"]):
                hyps.append([t for t in row.tolist()
                             if t not in (tcfg.bos_id, tcfg.eos_id, tcfg.pad_id)])
                refs.append([t for t in tgt.tolist()
                             if t not in (tcfg.bos_id, tcfg.eos_id, tcfg.pad_id)])
        if hyps:
            scores = rouge_scores(hyps, refs)
            logger.log((), {f"val.{k}": v for k, v in scores.items()})


def _breadth_spec(name: str, cfg: CommonConfig):
    """(task, batch_factory, tx) for the remaining breadth families —
    enough to train each one from the CLI on synthetic data (benchmark
    mode; real pipelines are per-family work)."""
    import optax

    rng = np.random.default_rng(cfg.seed)
    bs = cfg.batch_size
    if name == "jasper":
        from ..models.asr import JasperTask

        task = JasperTask(dtype=_dtype(cfg))
        init = lambda: task.init(jax.random.key(cfg.seed), t=256, batch=2)

        def batch():
            return {
                "feats": rng.normal(size=(bs, 256, task.cfg.n_mels)
                                    ).astype(np.float32),
                "feat_paddings": np.zeros((bs, 256), np.float32),
                "labels": rng.integers(
                    1, task.cfg.vocab_size, (bs, 32)).astype(np.int32),
                "label_paddings": np.zeros((bs, 32), np.float32),
            }
        tx = optax.chain(optax.clip_by_global_norm(1.0),
                         optax.adam(cfg.lr or 1e-3))
    elif name == "wav2vec2":
        from ..models.wav2vec2 import Wav2Vec2Task, sample_spans_mask

        task = Wav2Vec2Task(dtype=_dtype(cfg))
        audio_len = 16000
        init = lambda: task.init(jax.random.key(cfg.seed),
                                 audio_len=audio_len, batch=2)
        frames = task._n_frames(audio_len)

        def batch():
            return {
                "audio": rng.normal(size=(bs, audio_len)
                                    ).astype(np.float32) * 0.1,
                "mask": sample_spans_mask(rng, bs, frames, 0.5,
                                          task.cfg.mask_span),
            }
        tx = optax.adamw(cfg.lr or 5e-4, weight_decay=0.01)
    elif name == "nnunet":
        from ..models.unet import UNetConfig, UNetTask

        task = UNetTask(UNetConfig(spatial_rank=2), dtype=_dtype(cfg))
        init = lambda: task.init(jax.random.key(cfg.seed), patch=128)

        def batch():
            return {
                "image": rng.normal(size=(bs, 128, 128, 1)
                                    ).astype(np.float32),
                "label": rng.integers(0, task.cfg.n_classes,
                                      (bs, 128, 128)).astype(np.int32),
            }
        tx = optax.adam(cfg.lr or 1e-3)
    elif name == "transformer-xl":
        from ..models.transformer_xl import TransformerXLTask

        task = TransformerXLTask(dtype=_dtype(cfg))
        init = lambda: task.init(jax.random.key(cfg.seed), batch=bs)
        seg = task.cfg.seg_len

        def batch():
            toks = rng.integers(0, task.cfg.vocab_size, (bs, seg + 1))
            return {"tokens": toks[:, :-1].astype(np.int32),
                    "targets": toks[:, 1:].astype(np.int32)}
        tx = optax.adam(cfg.lr or 2.5e-4)
    elif name == "gnmt":
        from ..models.translation.gnmt import GnmtTask

        task = GnmtTask(dtype=_dtype(cfg))
        init = lambda: task.init(jax.random.key(cfg.seed))

        def batch():
            src = rng.integers(3, task.cfg.vocab_size, (bs, 48))
            tgt = np.concatenate(
                [np.full((bs, 1), task.cfg.bos_id), src[:, :46],
                 np.full((bs, 1), task.cfg.eos_id)], axis=1)
            return {"src": src.astype(np.int32), "tgt": tgt.astype(np.int32)}
        tx = optax.adam(cfg.lr or 1e-3)
    elif name == "fastpitch":
        from ..models.tts import FastPitchTask

        task = FastPitchTask(dtype=_dtype(cfg))
        init = lambda: task.init(jax.random.key(cfg.seed))
        tl = 32

        def batch():
            dur = rng.integers(1, 6, (bs, tl)).astype(np.int32)
            mel_len = task.cfg.max_mel_len
            return {
                "text": rng.integers(1, task.cfg.n_symbols,
                                     (bs, tl)).astype(np.int32),
                "durations": dur,
                "pitch": rng.normal(size=(bs, tl)).astype(np.float32),
                "mel": rng.normal(size=(bs, mel_len, task.cfg.n_mels)
                                  ).astype(np.float32),
            }
        tx = optax.adam(cfg.lr or 1e-3)
    elif name == "moflow":
        from ..models.moflow import MoFlowConfig, MoFlowTask

        task = MoFlowTask(MoFlowConfig())
        init = lambda: task.init(jax.random.key(cfg.seed))
        c = task.cfg

        def batch():
            atoms = np.eye(c.n_atom_types, dtype=np.float32)[
                rng.integers(0, c.n_atom_types, (bs, c.n_node))]
            bonds = rng.integers(0, c.n_bond_types, (bs, c.n_node, c.n_node))
            bonds = np.triu(bonds, 1)
            bonds = bonds + bonds.transpose(0, 2, 1)
            adj = np.eye(c.n_bond_types, dtype=np.float32)[bonds]
            return {"atoms": atoms, "adj": adj.transpose(0, 3, 1, 2)}
        tx = optax.adam(cfg.lr or 1e-3)
    elif name == "se3-transformer":
        from ..models.se3_transformer import SE3Config, SE3RegressionTask

        task = SE3RegressionTask(
            SE3Config(num_layers=4, num_degrees=3, num_channels=16))
        n = 12
        init = lambda: task.init(jax.random.key(cfg.seed), n_atoms=n)

        def batch():
            pos = rng.normal(size=(bs, n, 3)).astype(np.float32) * 2
            species = np.eye(task.cfg.node_feature_dim, dtype=np.float32)[
                rng.integers(0, task.cfg.node_feature_dim, (bs, n))]
            mask = np.ones((bs, n), np.float32)
            d = np.linalg.norm(pos[:, :, None] - pos[:, None, :], axis=-1)
            d = d + np.eye(n) * 1e9
            target = (1.0 / np.maximum(d, 0.5)).sum(axis=(1, 2)) * 0.05
            return {"positions": pos, "species": species, "mask": mask,
                    "target": target.astype(np.float32)}
        tx = optax.adam(cfg.lr or 3e-3)
    else:
        raise KeyError(name)
    return task, init, batch, tx


def run_breadth(name: str, cfg: CommonConfig) -> None:
    mesh, logger = _common_setup(cfg, name.replace("-", "_"))
    task, init, batch_fn, tx = _breadth_spec(name, cfg)
    params, mstate = init()
    loader = [batch_fn() for _ in range(min(cfg.steps_per_epoch, 16))]
    loader = (loader * (-(-cfg.steps_per_epoch // len(loader))))[
        :cfg.steps_per_epoch]
    state = create_train_state(params, tx, _train_key(cfg), mstate)
    ckpt = CheckpointManager(f"{cfg.workspace}/{name.replace('-', '_')}_ckpt")
    state, start_epoch = _maybe_resume(cfg, ckpt, state, len(loader))
    train_step = make_train_step(task.loss_fn, tx, accum_steps=cfg.accum_steps)
    train_loop(
        state, train_step, lambda: prefetch_to_device(iter(loader), mesh),
        cfg=_loop_cfg(cfg), logger=logger, checkpoints=ckpt,
        batch_size=cfg.batch_size, start_epoch=start_epoch,
    )


def run_hifigan(cfg: CommonConfig) -> None:
    """HiFiGAN GAN training (reference ``HiFiGAN/train.py``): alternating
    discriminator/generator steps — its dual-optimizer loop doesn't fit
    the single-step harness, so the runner drives it directly."""
    import optax

    from ..models.tts import HiFiGanConfig, HiFiGanTask

    mesh, logger = _common_setup(cfg, "hifigan")
    task = HiFiGanTask(dtype=_dtype(cfg))
    g_params, d_params = task.init(jax.random.key(cfg.seed))
    g_tx = optax.adam(cfg.lr or 2e-4, b1=0.8, b2=0.99)
    d_tx = optax.adam(cfg.lr or 2e-4, b1=0.8, b2=0.99)
    g_opt, d_opt = g_tx.init(g_params), d_tx.init(d_params)
    g_step, d_step = task.make_steps(g_tx, d_tx)
    rng = np.random.default_rng(cfg.seed)
    hcfg = task.cfg
    t_mel = hcfg.segment_length // hcfg.hop_length
    batch = {
        "mel": jnp.asarray(rng.normal(size=(cfg.batch_size, t_mel,
                                            hcfg.n_mels)), jnp.float32),
        "audio": jnp.asarray(rng.normal(
            size=(cfg.batch_size, hcfg.segment_length)) * 0.3, jnp.float32),
    }
    for epoch in range(cfg.epochs):
        for it in range(cfg.steps_per_epoch):
            d_params, d_opt, dl = d_step(d_params, d_opt, g_params, batch)
            g_params, g_opt, gl, aux = g_step(g_params, g_opt, d_params, batch)
        logger.log((epoch,), {"train.d_loss": float(dl),
                              "train.g_loss": float(gl),
                              "train.mel_l1": float(aux["mel_l1"])})


MODELS = {
    "resnet50": lambda cfg: run_convnet("resnet50", cfg),
    "resnext101-32x4d": lambda cfg: run_convnet("resnext101-32x4d", cfg),
    "se-resnext101-32x4d": lambda cfg: run_convnet("se-resnext101-32x4d", cfg),
    "efficientnet-b0": lambda cfg: run_convnet("efficientnet-b0", cfg),
    "efficientnet-b4": lambda cfg: run_convnet("efficientnet-b4", cfg),
    "gpunet-0": lambda cfg: run_convnet("gpunet-0", cfg),
    "gpunet-1": lambda cfg: run_convnet("gpunet-1", cfg),
    "gpunet-2": lambda cfg: run_convnet("gpunet-2", cfg),
    "ssd300": run_ssd,
    "efficientdet": run_efficientdet,
    "maskrcnn": run_maskrcnn,
    "bert-pretrain": run_bert_pretrain,
    "bert-squad": run_bert_squad,
    "bert-glue": run_bert_glue,
    "bert-swag": run_bert_swag,
    "dlrm": run_dlrm,
    "transformer": run_transformer,
    "ncf": run_ncf,
    "tft": run_tft,
    "bart": run_bart,
    "jasper": lambda cfg: run_breadth("jasper", cfg),
    "wav2vec2": lambda cfg: run_breadth("wav2vec2", cfg),
    "nnunet": lambda cfg: run_breadth("nnunet", cfg),
    "transformer-xl": lambda cfg: run_breadth("transformer-xl", cfg),
    "gnmt": lambda cfg: run_breadth("gnmt", cfg),
    "fastpitch": lambda cfg: run_breadth("fastpitch", cfg),
    "moflow": lambda cfg: run_breadth("moflow", cfg),
    "se3-transformer": lambda cfg: run_breadth("se3-transformer", cfg),
    "hifigan": run_hifigan,
    "tacotron2": lambda cfg: run_tts("tacotron2", cfg),
    "waveglow": lambda cfg: run_tts("waveglow", cfg),
}

_CONFIG_CLS = {"bert-pretrain": BertCliConfig, "dlrm": DlrmCliConfig,
               "bert-glue": GlueCliConfig, "bert-swag": SwagCliConfig,
               "bart": BartCliConfig,
               "bert-squad": SquadCliConfig}

ALIASES = {
    "lr": "lr",
    "batch-size": "batch_size",
    "data-backend": "data_backend",
    "label-smoothing": "label_smoothing",
    "warmup": "warmup_epochs",
}


def cli(argv=None) -> None:
    argv = argv if argv is not None else sys.argv[1:]
    parser = argparse.ArgumentParser("dlx-train")
    sub = parser.add_subparsers(dest="model", required=True)
    for name in MODELS:
        p = sub.add_parser(name)
        cls = _CONFIG_CLS.get(name, CommonConfig)
        for f in dataclasses.fields(cls):
            flag = f.name.replace("_", "-")
            p.add_argument(f"--{flag}", dest=f.name, default=None, type=str)
        p.add_argument("--config-file", default=None)
        p.add_argument("--platform", default=None)
        p.add_argument("--precision", default=None)

    ns = parser.parse_args(argv)
    cls = _CONFIG_CLS.get(ns.model, CommonConfig)
    cfg = cls()
    if ns.config_file:
        cfg = cfgmod.resolve(
            cfg, yaml_path=ns.config_file,
            precision=ns.precision, platform=ns.platform, model=ns.model,
            mode=None,
        )
    overrides = {}
    for f in dataclasses.fields(cls):
        v = getattr(ns, f.name, None)
        if v is None:
            continue
        parsed = cfgmod._parse_value(v) if isinstance(v, str) else v
        want = f.type if isinstance(f.type, type) else {"int": int, "float": float,
                                                        "bool": bool, "str": str}.get(str(f.type))
        if want in (int, float) and not isinstance(parsed, (int, float)):
            parser.error(f"--{f.name.replace('_', '-')} expects a {want.__name__}, "
                         f"got {v!r}")
        if want is float and isinstance(parsed, int):
            parsed = float(parsed)
        if want is bool and not isinstance(parsed, bool):
            parser.error(f"--{f.name.replace('_', '-')} expects true/false, got {v!r}")
        overrides[f.name] = parsed
    cfg = cfgmod.merge(cfg, overrides)

    import os

    os.makedirs(cfg.workspace, exist_ok=True)
    MODELS[ns.model](cfg)


if __name__ == "__main__":
    cli()
