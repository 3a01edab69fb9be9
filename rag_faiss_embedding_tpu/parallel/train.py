"""Sharded contrastive training for the sentence encoder.

The reference only consumes a frozen pretrained encoder
(``vectorization.py:12-13``); this framework adds the training capability a
production retrieval deployment needs — fitting/fine-tuning the embedding
model on its own corpus — implemented mesh-first:

- **DP** over the ``"data"`` axis: the (queries, docs) pair batch is sharded
  on the batch dimension.
- **TP** over the ``"model"`` axis: attention-head and FFN-hidden dimensions
  of every layer are sharded (heads on "model" for QKV, FFN columns/rows
  split like Megatron), expressed purely as NamedSharding on the param tree —
  XLA inserts the all-reduces over ICI.
- In-batch-negative InfoNCE loss: queries match their paired documents
  against all other documents in the GLOBAL batch (embeddings are
  all-gathered implicitly by jit under the sharding constraints, so the
  negatives span all data shards, not just the local one).

Everything is a single jitted train step (optax adamw) — the driver's
``dryrun_multichip`` compiles and runs it on an N-virtual-device mesh.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.logging import get_logger
from ..models.minilm import MiniLMConfig, MiniLMEncoder

logger = get_logger(__name__)


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array


def param_sharding_rules(path_str: str) -> Tuple[Optional[str], ...]:
    """Megatron-style TP layout for the MiniLM param tree.

    QKV DenseGeneral kernels (hidden, heads, head_dim): shard heads.
    Attention output (heads, head_dim, hidden): shard heads (row-parallel).
    FFN intermediate (hidden, ffn): shard ffn columns;
    FFN output (ffn, hidden): shard ffn rows.
    Embeddings: shard vocab rows. LayerNorms/biases: replicated.
    """
    if "word_embeddings" in path_str:
        return ("model", None)
    if "attention" in path_str and "kernel" in path_str:
        if "output" in path_str:
            return ("model", None, None)   # (heads, head_dim, hidden)
        return (None, "model", None)       # (hidden, heads, head_dim)
    if "attention" in path_str and "bias" in path_str and "norm" not in path_str:
        if "output" in path_str:
            return (None,)
        return ("model", None)             # (heads, head_dim)
    if "intermediate" in path_str and "kernel" in path_str:
        return (None, "model")
    if "intermediate" in path_str and "bias" in path_str:
        return ("model",)
    if "ffn_output" in path_str and "kernel" in path_str:
        return ("model", None)
    return None  # replicate


def shard_params(params, mesh: Mesh):
    """Apply TP NamedShardings to a param tree (no-op axes that don't exist)."""

    def place(path, leaf):
        path_str = "/".join(str(getattr(p, "key", p)) for p in path)
        rules = param_sharding_rules(path_str)
        if rules is None or "model" not in mesh.shape:
            return jax.device_put(leaf, NamedSharding(mesh, P()))
        spec = []
        for dim, rule in zip(leaf.shape, rules):
            if rule == "model" and dim % mesh.shape["model"] == 0:
                spec.append("model")
            else:
                spec.append(None)
        return jax.device_put(leaf, NamedSharding(mesh, P(*spec)))

    return jax.tree_util.tree_map_with_path(place, params)


def info_nce_loss(q_emb: jax.Array, d_emb: jax.Array, temperature: float = 0.05):
    """In-batch-negatives InfoNCE: row i of q matches row i of d."""
    q = q_emb / jnp.maximum(jnp.linalg.norm(q_emb, axis=-1, keepdims=True), 1e-9)
    d = d_emb / jnp.maximum(jnp.linalg.norm(d_emb, axis=-1, keepdims=True), 1e-9)
    logits = (q @ d.T) / temperature
    labels = jnp.arange(q.shape[0])
    loss = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    acc = (jnp.argmax(logits, axis=-1) == labels).mean()
    return loss.mean(), acc


def train_step_fn(model: MiniLMEncoder, optimizer, pooling: str = "mean"):
    """Build the (params, opt_state, batch) -> (params, opt_state, metrics)
    step. Pure function of pytrees — jit/shard outside."""

    def loss_fn(params, batch):
        q_emb = model.apply(
            {"params": params}, batch["q_ids"], batch["q_mask"], pooling=pooling
        )
        d_emb = model.apply(
            {"params": params}, batch["d_ids"], batch["d_mask"], pooling=pooling
        )
        return info_nce_loss(q_emb, d_emb)

    def step(params, opt_state, batch):
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, "accuracy": acc}

    return step


def make_train_step(
    cfg: MiniLMConfig,
    mesh: Mesh,
    learning_rate: float = 2e-5,
    data_axis: str = "data",
    params: Optional[Any] = None,
    pooling: str = "mean",
):
    """Jitted sharded train step + initial TrainState.

    Batch arrays shard over ``data_axis`` on dim 0; params shard per
    param_sharding_rules over the "model" axis when present in the mesh.
    """
    model = MiniLMEncoder(cfg)
    optimizer = optax.adamw(learning_rate)
    if params is None:
        from ..models.convert import deterministic_params

        params = deterministic_params(cfg)
    params = shard_params(params, mesh)
    opt_state = optimizer.init(params)
    step = train_step_fn(model, optimizer, pooling=pooling)

    batch_sharding = NamedSharding(mesh, P(data_axis, None))
    jitted = jax.jit(
        step,
        in_shardings=(None, None, {k: batch_sharding for k in
                                   ("q_ids", "q_mask", "d_ids", "d_mask")}),
        donate_argnums=(0, 1),
    )
    state = TrainState(params=params, opt_state=opt_state,
                       step=jnp.zeros((), jnp.int32))

    def run_step(state: TrainState, batch) -> Tuple[TrainState, dict]:
        params, opt_state, metrics = jitted(state.params, state.opt_state, batch)
        return TrainState(params, opt_state, state.step + 1), metrics

    return run_step, state
