"""Benchmark: all five flagship workloads on one TPU chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", "extras"}.
The headline metric stays ResNet-50 training throughput (baseline: reference
RN50 mixed-precision on 1xA100 80GB = 2,470 img/s, resnet50v1.5/README.md:598);
``extras`` carries the other four flagship numbers with their own baselines
(BASELINE.md) so every round records the full picture.

Each workload runs its production single-chip configuration:
- RN50 bs256 bf16 (SGD)
- SSD300 bs128 bf16 (bs sweep: 128 > 32 > 64 on v5e)
- BERT-Large pretrain s128 bs64 bf16 + rbg dropout + bf16 LAMB moments
- DLRM bs65536, 26x100k synthetic tables (round-1-comparable config)
- Tacotron2 bs128 / WaveGlow bs10 bf16 (reference perf-table batch sizes)
"""

from __future__ import annotations

import json
import os
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np

# Persistent XLA compilation cache: the 13 benches compile ~20 programs at
# real shapes (20-40s each over the tunnel); a warmed cache turns repeat runs
# (same jax version/backend) from ~10 min of compile into seconds. Keyed on
# serialized HLO + compile options, so it never changes what is measured.
try:
    _cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              ".cache", "jax_bench")
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
except Exception:
    pass  # cache is an optimization, never a requirement

BASELINES = {
    "resnet50_train_throughput": (2470.0, "img/s/chip"),  # rn50 README:598
    "ssd300_train_throughput": (662.91, "img/s/chip"),  # SSD/README.md:647
    "bert_large_pretrain_s128": (580.0, "seq/s/chip"),  # BERT/README.md:813
    "bert_large_pretrain_s512": (210.0, "seq/s/chip"),  # BERT/README.md:815
    "bert_squad_finetune": (110.5, "seq/s/chip"),  # BERT/README.md:841
    "dlrm_train_throughput": (4.02e6, "rec/s/chip"),  # DLRM/README.md:923
    "tacotron2_train_throughput": (26484.0, "frames/s/chip"),  # Taco2 README:694
    "waveglow_train_throughput": (149479.0, "samples/s/chip"),  # Taco2 README:702
    # zipf: same model/step as dlrm_train_throughput but Criteo-like index
    # skew (the A100 4.02M rec/s was measured on real Criteo — README:923)
    "dlrm_train_throughput_zipf": (4.02e6, "rec/s/chip"),  # DLRM/README.md:923
    # inference rows (BASELINE.md "Inference throughput / latency")
    "rn50_infer_bs256": (1261.0, "img/s/chip"),  # resnet50v1.5/README.md:638
    "rn50_infer_bs1_latency": (10.37, "ms"),  # resnet50v1.5/README.md:630
    # same baseline row, measured like-for-like (host-inclusive end-to-end)
    "rn50_infer_bs1_latency_e2e": (10.37, "ms"),
    "ssd300_infer_bs1": (158.83, "img/s/chip"),  # SSD/README.md:686
}


def _time_steps(step, state, batch, iters, warmup=4):
    for _ in range(warmup):
        state, metrics = step(state, batch)
    float(metrics["loss"])  # axon: block_until_ready may return early
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch)
    float(metrics["loss"])
    return (time.perf_counter() - t0) / iters


def bench_resnet50():
    from deeplearningexamples_tpu.core import optimizers as opt
    from deeplearningexamples_tpu.core.train import create_train_state, make_train_step
    from deeplearningexamples_tpu.models.convnets import ARCHS, ClassificationTask, ResNet
    from deeplearningexamples_tpu.parallel import MeshSpec, build_mesh, shard_batch

    bs = 256
    mesh = build_mesh(MeshSpec())
    task = ClassificationTask(
        ResNet(ARCHS["resnet50"], num_classes=1000, dtype=jnp.bfloat16),
        label_smoothing=0.1, num_classes=1000,
    )
    params, mstate = task.init(jax.random.key(0), image_shape=(224, 224, 3))
    sched = opt.lr_cosine_policy(0.256, 8, 90, steps_per_epoch=500)
    tx = opt.sgd(sched, momentum=0.875, weight_decay=3.05e-5, params_for_mask=params)
    state = create_train_state(params, tx, jax.random.key(1), mstate)
    step = make_train_step(task.loss_fn, tx)
    rng = np.random.default_rng(0)
    batch = shard_batch(mesh, {
        "image": rng.normal(size=(bs, 224, 224, 3)).astype(np.float32),
        "label": rng.integers(0, 1000, size=(bs,)).astype(np.int32),
    })
    return bs / _time_steps(step, state, batch, iters=30)


def bench_ssd300():
    import optax

    from deeplearningexamples_tpu.core.train import create_train_state, make_train_step
    from deeplearningexamples_tpu.data.ssd_synthetic import SyntheticSSDLoader
    from deeplearningexamples_tpu.models.ssd import SSDTask

    # bs128: measured sweep 64/32/128 -> 585/614/655 img/s; the v5e wants
    # the bigger batch (reference A100 runs bs64)
    bs = 128
    task = SSDTask(dtype=jnp.bfloat16)
    params, mstate = task.init(jax.random.key(0))
    tx = optax.sgd(2.6e-3, momentum=0.9)
    state = create_train_state(params, tx, jax.random.key(1), mstate)
    step = make_train_step(task.loss_fn, tx)
    batch = {k: jnp.asarray(v) for k, v in
             next(iter(SyntheticSSDLoader(bs, task.dboxes, steps=1))).items()}
    return bs / _time_steps(step, state, batch, iters=20)


def bench_bert():
    from deeplearningexamples_tpu.core.train import create_train_state, make_train_step
    from deeplearningexamples_tpu.models.bert import BERT_CONFIGS, BertPretrainTask
    from deeplearningexamples_tpu.ops.lamb import lamb

    bs, seq, max_pred = 64, 128, 20
    # full reference semantics: attention-prob dropout 0.1 runs in-kernel
    # via the stateless-hash mask (measured free: 440.7 vs 441.3 seq/s)
    bcfg = BERT_CONFIGS["large"]
    task = BertPretrainTask(bcfg, jnp.bfloat16, max_predictions=max_pred)
    params, mstate = task.init(jax.random.key(0), seq_len=seq)
    tx = lamb(lambda c: 6e-3, weight_decay=0.01, moment_dtype=jnp.bfloat16)
    state = create_train_state(params, tx, jax.random.key(1, impl="rbg"), mstate)
    step = make_train_step(task.loss_fn, tx)
    rng = np.random.default_rng(0)
    labels = np.full((bs, seq), -1, np.int32)
    for i in range(bs):
        pos = rng.choice(seq, size=max_pred, replace=False)
        labels[i, pos] = rng.integers(0, bcfg.vocab_size, size=max_pred)
    batch = {
        "input_ids": jnp.asarray(rng.integers(0, bcfg.vocab_size, (bs, seq)), jnp.int32),
        "attention_mask": jnp.ones((bs, seq), jnp.int32),
        "token_type_ids": jnp.zeros((bs, seq), jnp.int32),
        "mlm_labels": jnp.asarray(labels),
        "nsp_label": jnp.asarray(rng.integers(0, 2, (bs,)), jnp.int32),
    }
    return bs / _time_steps(step, state, batch, iters=20)


def bench_bert_s512():
    from deeplearningexamples_tpu.core.train import create_train_state, make_train_step
    from deeplearningexamples_tpu.models.bert import BERT_CONFIGS, BertPretrainTask
    from deeplearningexamples_tpu.ops.lamb import lamb

    # phase-2 shapes (reference run_pretraining.py: seq 512, 80 masked
    # positions); bs16 is the measured single-chip sweet spot (bs32
    # regresses on HBM pressure — NOTES.md)
    bs, seq, max_pred = 16, 512, 80
    bcfg = BERT_CONFIGS["large"]
    task = BertPretrainTask(bcfg, jnp.bfloat16, max_predictions=max_pred)
    params, mstate = task.init(jax.random.key(0), seq_len=seq)
    tx = lamb(lambda c: 6e-3, weight_decay=0.01, moment_dtype=jnp.bfloat16)
    state = create_train_state(params, tx, jax.random.key(1, impl="rbg"), mstate)
    step = make_train_step(task.loss_fn, tx)
    rng = np.random.default_rng(0)
    labels = np.full((bs, seq), -1, np.int32)
    for i in range(bs):
        pos = rng.choice(seq, size=max_pred, replace=False)
        labels[i, pos] = rng.integers(0, bcfg.vocab_size, size=max_pred)
    batch = {
        "input_ids": jnp.asarray(rng.integers(0, bcfg.vocab_size, (bs, seq)), jnp.int32),
        "attention_mask": jnp.ones((bs, seq), jnp.int32),
        "token_type_ids": jnp.zeros((bs, seq), jnp.int32),
        "mlm_labels": jnp.asarray(labels),
        "nsp_label": jnp.asarray(rng.integers(0, 2, (bs,)), jnp.int32),
    }
    return bs / _time_steps(step, state, batch, iters=15)


def bench_bert_squad():
    from deeplearningexamples_tpu.core.train import create_train_state, make_train_step
    import optax

    from deeplearningexamples_tpu.models.bert import BERT_CONFIGS, BertSquadTask

    # reference SQuAD recipe: bs32, seq 384, AdamW (run_squad.py; matches
    # the bert-squad CLI runner's optimizer)
    bs, seq = 32, 384
    task = BertSquadTask(BERT_CONFIGS["large"], jnp.bfloat16)
    params, mstate = task.init(jax.random.key(0), seq_len=seq)
    tx = optax.adamw(3e-5, weight_decay=0.01)
    state = create_train_state(params, tx, jax.random.key(1, impl="rbg"), mstate)
    step = make_train_step(task.loss_fn, tx)
    rng = np.random.default_rng(0)
    batch = {
        "input_ids": jnp.asarray(
            rng.integers(0, BERT_CONFIGS["large"].vocab_size, (bs, seq)), jnp.int32),
        "attention_mask": jnp.ones((bs, seq), jnp.int32),
        "token_type_ids": jnp.zeros((bs, seq), jnp.int32),
        "start_positions": jnp.asarray(rng.integers(0, seq, (bs,)), jnp.int32),
        "end_positions": jnp.asarray(rng.integers(0, seq, (bs,)), jnp.int32),
    }
    return bs / _time_steps(step, state, batch, iters=15)


def bench_dlrm():
    from deeplearningexamples_tpu.core.train import create_train_state, make_train_step
    from deeplearningexamples_tpu.data.synthetic import SyntheticDlrmLoader
    from deeplearningexamples_tpu.models.dlrm import (
        DlrmConfig, DlrmTask, make_dlrm_optimizer,
    )

    bs = 65536
    cards = [100_000] * 26
    task = DlrmTask(
        DlrmConfig(categorical_cardinalities=tuple(cards), embedding_dim=128,
                   bottom_mlp=(512, 256, 128)),
        jnp.bfloat16,
    )
    params, mstate = task.init(jax.random.key(0))
    tx = make_dlrm_optimizer(params, mlp_lr=24.0, embedding_lr=24.0)
    state = create_train_state(params, tx, jax.random.key(1), mstate)
    step = make_train_step(task.loss_fn, tx)
    batch = {k: jnp.asarray(v) for k, v in
             next(iter(SyntheticDlrmLoader(bs, cards, steps=1))).items()}
    return bs / _time_steps(step, state, batch, iters=15)


def bench_dlrm_zipf():
    from deeplearningexamples_tpu.core.train import create_train_state, make_train_step
    from deeplearningexamples_tpu.data.synthetic import SyntheticDlrmLoader
    from deeplearningexamples_tpu.models.dlrm import (
        DlrmConfig, DlrmTask, make_dlrm_optimizer,
    )

    bs = 65536
    cards = [100_000] * 26
    task = DlrmTask(
        DlrmConfig(categorical_cardinalities=tuple(cards), embedding_dim=128,
                   bottom_mlp=(512, 256, 128)),
        jnp.bfloat16,
    )
    params, mstate = task.init(jax.random.key(0))
    tx = make_dlrm_optimizer(params, mlp_lr=24.0, embedding_lr=24.0)
    state = create_train_state(params, tx, jax.random.key(1), mstate)
    step = make_train_step(task.loss_fn, tx)
    batch = {k: jnp.asarray(v) for k, v in
             next(iter(SyntheticDlrmLoader(bs, cards, steps=1,
                                           skew="zipf"))).items()}
    return bs / _time_steps(step, state, batch, iters=15)


def _device_loop_time(apply_fn, x, iters):
    """Pure chip-side latency: fold ``iters`` sequential applies into ONE
    jitted call (fori_loop) so the tunnel RTT is paid once, not per step —
    bs1 latencies are otherwise RTT-dominated (NOTES.md)."""
    import jax.lax as lax

    @jax.jit
    def run(x):
        def body(_, acc):
            # acc feeds the input: a true loop-carried dependency, or XLA
            # hoists the whole model out of the loop as loop-invariant and
            # the "loop" times one forward + iters adds (measured: it does)
            out = apply_fn(x + jnp.float32(1e-12) * acc)
            return acc + jnp.sum(out.astype(jnp.float32))
        return lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(run(x))  # compile + warm
    t0 = time.perf_counter()
    float(run(x))
    return (time.perf_counter() - t0) / iters


def bench_rn50_infer(bs):
    from deeplearningexamples_tpu.models.convnets import ARCHS, ResNet

    model = ResNet(ARCHS["resnet50"], num_classes=1000, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(bs, 224, 224, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), x, train=False)

    def apply_fn(img):
        return model.apply(variables, img, train=False)

    return _device_loop_time(apply_fn, x, iters=50 if bs == 1 else 20)


def bench_rn50_infer_e2e(bs=1, reqs=20):
    """Host-inclusive per-request latency: host array in, logits fetched
    back to host, per sequential request — the methodology of the A100
    baseline row (``resnet50v1.5/README.md:630``, host-to-host). On this
    rig the host link is a remote tunnel, so this OVERSTATES what a
    colocated host would see; together with the chip-side number it
    brackets the true deployment latency."""
    from deeplearningexamples_tpu.models.convnets import ARCHS, ResNet

    model = ResNet(ARCHS["resnet50"], num_classes=1000, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x_np = rng.normal(size=(bs, 224, 224, 3)).astype(np.float32)
    variables = model.init(jax.random.key(0), jnp.asarray(x_np), train=False)
    infer = jax.jit(lambda img: model.apply(variables, img, train=False))

    np.asarray(infer(jnp.asarray(x_np)))  # compile + warm
    times = []
    for _ in range(reqs):
        t0 = time.perf_counter()
        np.asarray(infer(jnp.asarray(x_np)))
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) * 1e3


def bench_ssd300_infer_bs1():
    from deeplearningexamples_tpu.models.ssd import SSDTask

    task = SSDTask(dtype=jnp.bfloat16)
    params, mstate = task.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 300, 300, 3)).astype(np.float32))

    def apply_fn(img):
        loc, conf = task.model.apply(
            {"params": params, **mstate}, img, train=False)
        return jnp.sum(loc.astype(jnp.float32)) + jnp.sum(conf.astype(jnp.float32))

    dt = _device_loop_time(apply_fn, x, iters=50)
    return 1.0 / dt


def bench_tacotron2():
    import optax

    from deeplearningexamples_tpu.core.train import create_train_state, make_train_step
    from deeplearningexamples_tpu.data.tts_synthetic import SyntheticTacotronLoader
    from deeplearningexamples_tpu.models.tts import Tacotron2Task

    bs = 128
    task = Tacotron2Task(dtype=jnp.bfloat16)
    params, mstate = task.init(jax.random.key(0))
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3))
    state = create_train_state(params, tx, jax.random.key(1, impl="rbg"), mstate)
    step = make_train_step(task.loss_fn, tx)
    loader = SyntheticTacotronLoader(bs, steps=1)
    batch = {k: jnp.asarray(v) for k, v in next(iter(loader)).items()}
    dt = _time_steps(step, state, batch, iters=10)
    # mel frames/s — the reference counts real (unpadded) frames per step
    # (Tacotron2 train.py iter/s * frames); here frames = sum(mel_lengths)
    frames = float(np.sum(np.asarray(batch["mel_lengths"])))
    return frames / dt


def bench_waveglow():
    import optax

    from deeplearningexamples_tpu.core.train import create_train_state, make_train_step
    from deeplearningexamples_tpu.data.tts_synthetic import SyntheticWaveGlowLoader
    from deeplearningexamples_tpu.models.tts import WaveGlowTask

    bs, segment = 10, 8000
    task = WaveGlowTask(dtype=jnp.bfloat16)
    params, mstate = task.init(jax.random.key(0), batch=2)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-4))
    state = create_train_state(params, tx, jax.random.key(1), mstate)
    step = make_train_step(task.loss_fn, tx)
    loader = SyntheticWaveGlowLoader(bs, segment_length=segment, steps=1)
    batch = {k: jnp.asarray(v) for k, v in next(iter(loader)).items()}
    dt = _time_steps(step, state, batch, iters=10)
    return bs * segment / dt


def main():
    import sys

    extras = {}
    headline = None
    for name, fn in [
        ("resnet50_train_throughput", bench_resnet50),
        ("ssd300_train_throughput", bench_ssd300),
        ("bert_large_pretrain_s128", bench_bert),
        ("bert_large_pretrain_s512", bench_bert_s512),
        ("bert_squad_finetune", bench_bert_squad),
        ("dlrm_train_throughput", bench_dlrm),
        ("dlrm_train_throughput_zipf", bench_dlrm_zipf),
        ("tacotron2_train_throughput", bench_tacotron2),
        ("waveglow_train_throughput", bench_waveglow),
        ("rn50_infer_bs256", lambda: 256 / bench_rn50_infer(256)),
        ("rn50_infer_bs1_latency", lambda: bench_rn50_infer(1) * 1e3),
        ("rn50_infer_bs1_latency_e2e", bench_rn50_infer_e2e),
        ("ssd300_infer_bs1", bench_ssd300_infer_bs1),
    ]:
        base, unit = BASELINES[name]
        t0 = time.perf_counter()
        print(f"[bench] {name} ...", file=sys.stderr, flush=True)
        try:
            v = fn()
            # latency rows: lower is better — report vs_baseline as base/ours
            # so >1 still means "beats the A100 baseline"
            ratio = base / v if unit == "ms" else v / base
            entry = {"value": round(v, 2), "unit": unit,
                     "vs_baseline": round(ratio, 4)}
            # methodology annotations so the record is self-describing:
            # the chip-side bs1 number excludes the host round-trip the
            # A100 baseline includes; the _e2e row is the like-for-like one
            # (over a remote tunnel here, so it overstates a colocated host)
            if name == "rn50_infer_bs1_latency":
                entry["note"] = ("chip-side fori_loop; excludes host RTT — "
                                 "not like-for-like with the host-inclusive "
                                 "A100 row, see rn50_infer_bs1_latency_e2e")
            elif name == "rn50_infer_bs1_latency_e2e":
                entry["note"] = ("host-inclusive per-request over a remote "
                                 "tunnel; overstates a colocated host")
        except Exception:
            traceback.print_exc()
            entry = {"value": None, "unit": unit, "vs_baseline": None}
        print(f"[bench] {name} done in {time.perf_counter() - t0:.0f}s: "
              f"{entry['value']}", file=sys.stderr, flush=True)
        if name == "resnet50_train_throughput":
            headline = entry
        else:
            extras[name] = entry

    out = {"metric": "resnet50_train_throughput", **headline, "extras": extras}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
