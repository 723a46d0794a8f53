"""ResNet-50 v1.5 family tests: shapes, BN state, end-to-end synthetic step."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deeplearningexamples_tpu.core import optimizers as opt
from deeplearningexamples_tpu.core.train import create_train_state, make_train_step, make_eval_step
from deeplearningexamples_tpu.data import SyntheticImageLoader
from deeplearningexamples_tpu.models.convnets import (
    ARCHS,
    ClassificationTask,
    ResNet,
    resnet50,
)


def small_resnet(num_classes=10):
    # tiny arch for test speed; same block/builder code paths as resnet50
    arch = ARCHS["resnet50"].__class__(layers=(1, 1, 1, 1), widths=(8, 8, 8, 8))
    return ResNet(arch, num_classes=num_classes, dtype=jnp.float32)


def test_resnet50_output_shape_and_v15_stride():
    model = resnet50(dtype=jnp.float32)
    x = jnp.zeros((1, 224, 224, 3))
    variables = jax.eval_shape(lambda: model.init(jax.random.key(0), x, train=False))
    params = variables["params"]
    # v1.5: stride-2 is on the 3x3 conv (conv2), so conv2 kernel is 3x3 and
    # downsample happens in layers 2-4 first block
    l2 = params["layer2_0"]
    assert l2["conv2"]["kernel"].shape[:2] == (3, 3)
    n_params = sum(np.prod(p.shape) for p in jax.tree.leaves(params))
    # torchvision/reference resnet50 = 25,557,032 params
    assert abs(n_params - 25_557_032) / 25_557_032 < 0.001


def test_resnet_forward_and_bn_state():
    model = small_resnet()
    x = jnp.ones((2, 32, 32, 3))
    variables = model.init(jax.random.key(0), x, train=False)
    assert "batch_stats" in variables
    logits, mutated = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    assert logits.shape == (2, 10)
    # running stats must have changed
    old = jax.tree.leaves(variables["batch_stats"])
    new = jax.tree.leaves(mutated["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


def test_classification_task_end_to_end():
    task = ClassificationTask(
        small_resnet(), label_smoothing=0.1, mixup_alpha=0.2, num_classes=10
    )
    params, model_state = task.init(jax.random.key(0), image_shape=(32, 32, 3))
    sched = opt.lr_cosine_policy(0.1, 0, 5, steps_per_epoch=4)
    tx = opt.sgd(sched, weight_decay=1e-4, params_for_mask=params)
    state = create_train_state(params, tx, jax.random.key(1), model_state, ema=True)
    step = make_train_step(task.loss_fn, tx, ema_decay=0.99, donate=False)
    eval_step = make_eval_step(task.metric_fn)

    loader = SyntheticImageLoader(8, image_size=32, num_classes=10, steps=6)
    losses = []
    for batch in loader:
        batch = jax.tree.map(jnp.asarray, batch)
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 1.5  # moving, not diverging
    m = eval_step(state.params, state.model_state, batch)
    assert 0.0 <= float(m["top1"]) <= 1.0
    assert state.ema_params is not None
