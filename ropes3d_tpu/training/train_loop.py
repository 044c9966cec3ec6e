"""Data-parallel Mask R-CNN training step and loop.

TPU-native replacement for the reference's PixelLib fine-tune
(``train.py:48-54``: ResNet-101, batch 1-16, 300 epochs, augmentation).
The train step is a pure jitted function sharded over a ``jax.sharding.Mesh``:
batch axis on ``data``, parameters replicated — gradients are reduced by XLA
collectives over ICI (SURVEY.md §2.9: the seg-training DP axis is this
workload's only large parallel dim).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import MaskRCNN, MaskRCNNConfig


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(
    model: MaskRCNN, rng: jax.Array, tx: optax.GradientTransformation
) -> TrainState:
    h, w = model.cfg.image_hw
    variables = model.init(rng, jnp.zeros((h, w, model.cfg.in_channels)))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )


def make_train_step(
    model: MaskRCNN,
    tx: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
):
    """Build the jitted train step.

    batch: dict(images [B,H,W,3] f32, boxes [B,G,4], classes [B,G] i32,
                masks [B,G,H,W] f32).
    With a mesh, inputs are expected sharded batch-on-'data'; the step is
    jitted with explicit shardings so XLA inserts the psum over ICI.
    """

    def loss_fn(params, batch_stats, batch, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        rngs = jax.random.split(rng, batch["images"].shape[0])

        def per_image(img, boxes, classes, masks, r):
            return model.apply(
                variables, img, boxes, classes, masks, r, method=model.loss
            )

        losses = jax.vmap(per_image)(
            batch["images"], batch["boxes"], batch["classes"], batch["masks"], rngs
        )
        mean_losses = jax.tree.map(jnp.mean, losses)
        return mean_losses["total"], mean_losses

    def step_fn(state: TrainState, batch, rng):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, rng
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            state.replace(step=state.step + 1, params=params, opt_state=opt_state),
            metrics,
        )

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    batch_shardings = {
        "images": data,
        "boxes": data,
        "classes": data,
        "masks": data,
    }
    return jax.jit(
        step_fn,
        in_shardings=(repl, batch_shardings, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def default_optimizer(
    lr: float = 1e-3, weight_decay: float = 1e-4, momentum: float = 0.9
) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(10.0),
        optax.add_decayed_weights(weight_decay),
        optax.sgd(lr, momentum=momentum),
    )


class Trainer:
    """Epoch loop with orbax checkpointing (per-epoch, pruned by the model
    registry — reference keeps NUM_MODELS_TO_KEEP newest, models.py:96-116)."""

    def __init__(
        self,
        cfg: MaskRCNNConfig,
        model_dir: str,
        mesh: Optional[Mesh] = None,
        lr: float = 1e-3,
        seed: int = 0,
    ):
        self.cfg = cfg
        self.model = MaskRCNN(cfg)
        self.model_dir = model_dir
        self.mesh = mesh
        self.tx = default_optimizer(lr)
        self.rng = jax.random.PRNGKey(seed)
        self.state = create_train_state(self.model, self.rng, self.tx)
        if mesh is not None:
            repl = NamedSharding(mesh, P())
            self.state = jax.device_put(self.state, repl)
        self.step_fn = make_train_step(self.model, self.tx, mesh)

    def shard_batch(self, batch: Dict[str, np.ndarray]):
        if self.mesh is None:
            return jax.tree.map(jnp.asarray, batch)
        data = NamedSharding(self.mesh, P("data"))
        return jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), data), batch)

    def train_step(self, batch) -> Dict[str, float]:
        self.rng, sub = jax.random.split(self.rng)
        self.state, metrics = self.step_fn(self.state, self.shard_batch(batch), sub)
        return metrics

    def save(self, epoch: int) -> str:
        import orbax.checkpoint as ocp
        import os

        path = os.path.abspath(os.path.join(self.model_dir, f"ckpt_{epoch:04d}"))
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(
            path,
            {"params": jax.device_get(self.state.params),
             "batch_stats": jax.device_get(self.state.batch_stats)},
            force=True,
        )
        ckptr.wait_until_finished()
        return path

    def load(self, path: str) -> None:
        import orbax.checkpoint as ocp
        import os

        path = os.path.abspath(path)  # orbax requires absolute paths
        ckptr = ocp.StandardCheckpointer()
        target = {
            "params": jax.device_get(self.state.params),
            "batch_stats": jax.device_get(self.state.batch_stats),
        }
        restored = ckptr.restore(path, target)
        self.state = self.state.replace(
            params=restored["params"], batch_stats=restored["batch_stats"]
        )
