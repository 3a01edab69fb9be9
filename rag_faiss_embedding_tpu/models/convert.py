"""HF torch BERT checkpoint -> Flax MiniLMEncoder params.

The reference loads ``sentence-transformers/all-MiniLM-L6-v2`` through HF
``AutoModel`` (``vectorization.py:12-13``). Here the same checkpoint (when a
local HF cache exists — this image has zero egress) is converted once into
the flax param tree of models/minilm.py. Without a cache the encoder falls
back to deterministic random init so every downstream capability still runs.

Layout notes: torch ``nn.Linear`` stores (out, in) — transposed into flax
(in, out); attention projections are reshaped into DenseGeneral's
(in, heads, head_dim) / (heads, head_dim, out) layouts.
"""

from __future__ import annotations

import os

# Zero-egress image: make HF cache probes fail fast instead of burning ~30s
# on connection timeouts (local_files_only alone still pings the hub).
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.logging import get_logger
from .minilm import MiniLMConfig, MiniLMEncoder

logger = get_logger(__name__)


def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def convert_bert_state_dict(state: Dict[str, "np.ndarray"], cfg: MiniLMConfig) -> dict:
    """Map an HF BertModel state_dict into MiniLMEncoder params."""
    h, heads = cfg.hidden_size, cfg.num_heads
    hd = h // heads
    g = lambda k: _t(state[k])
    # some checkpoints prefix with "bert."
    if not any(k.startswith("embeddings.") for k in state):
        state = {k.removeprefix("bert."): v for k, v in state.items()}
        g = lambda k: _t(state[k])

    params = {
        "embeddings": {
            "word_embeddings": {"embedding": g("embeddings.word_embeddings.weight")},
            "position_embeddings": {
                "embedding": g("embeddings.position_embeddings.weight")
            },
            "token_type_embeddings": {
                "embedding": g("embeddings.token_type_embeddings.weight")
            },
            "layer_norm": {
                "scale": g("embeddings.LayerNorm.weight"),
                "bias": g("embeddings.LayerNorm.bias"),
            },
        }
    }
    for i in range(cfg.num_layers):
        p = f"encoder.layer.{i}."
        qkv = {}
        for name in ("query", "key", "value"):
            w = g(p + f"attention.self.{name}.weight")  # (h, h) torch (out,in)
            b = g(p + f"attention.self.{name}.bias")
            qkv[name] = {
                "kernel": w.T.reshape(h, heads, hd),
                "bias": b.reshape(heads, hd),
            }
        attn_out_w = g(p + "attention.output.dense.weight")  # (h, h)
        params[f"layer_{i}"] = {
            "attention": {
                **qkv,
                "output": {
                    "kernel": attn_out_w.T.reshape(heads, hd, h),
                    "bias": g(p + "attention.output.dense.bias"),
                },
            },
            "attention_norm": {
                "scale": g(p + "attention.output.LayerNorm.weight"),
                "bias": g(p + "attention.output.LayerNorm.bias"),
            },
            "intermediate": {
                "kernel": g(p + "intermediate.dense.weight").T,
                "bias": g(p + "intermediate.dense.bias"),
            },
            "ffn_output": {
                "kernel": g(p + "output.dense.weight").T,
                "bias": g(p + "output.dense.bias"),
            },
            "ffn_norm": {
                "scale": g(p + "output.LayerNorm.weight"),
                "bias": g(p + "output.LayerNorm.bias"),
            },
        }
    return jax.tree.map(jnp.asarray, params)


def load_pretrained(
    model_name: str, cfg: Optional[MiniLMConfig] = None
) -> Optional[tuple]:
    """(cfg, params) from a local HF cache, or None when unavailable."""
    try:
        import transformers

        hf_cfg = transformers.AutoConfig.from_pretrained(
            model_name, local_files_only=True
        )
        model = transformers.AutoModel.from_pretrained(
            model_name, local_files_only=True
        )
    except Exception as e:
        logger.info("no local HF checkpoint for %s (%s)", model_name, e)
        return None
    cfg = cfg or MiniLMConfig(
        vocab_size=hf_cfg.vocab_size,
        hidden_size=hf_cfg.hidden_size,
        num_layers=hf_cfg.num_hidden_layers,
        num_heads=hf_cfg.num_attention_heads,
        intermediate_size=hf_cfg.intermediate_size,
        max_position_embeddings=hf_cfg.max_position_embeddings,
    )
    params = convert_bert_state_dict(dict(model.state_dict()), cfg)
    logger.info("converted HF checkpoint %s to flax params", model_name)
    return cfg, params


def export_params(params, path) -> None:
    """Flat-npz export of a param tree (slash-joined keys); the embedding
    pipeline and training CLI round-trip through this format."""
    from pathlib import Path

    flat = {}
    for key_path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = "/".join(str(getattr(p, "key", p)) for p in key_path)
        flat[name] = np.asarray(leaf)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **flat)
    logger.info("exported %d param tensors to %s", len(flat), path)


def import_params(path) -> dict:
    """Inverse of export_params: nested param tree from the flat npz."""
    with np.load(path, allow_pickle=False) as z:
        flat = {k: z[k] for k in z.files}
    tree: dict = {}
    for name, arr in flat.items():
        node = tree
        parts = name.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = jnp.asarray(arr)
    return tree


def infer_config_from_params(params) -> MiniLMConfig:
    """Reconstruct a MiniLMConfig from a param tree's shapes."""
    emb = params["embeddings"]
    vocab, hidden = emb["word_embeddings"]["embedding"].shape
    max_pos = emb["position_embeddings"]["embedding"].shape[0]
    n_layers = sum(1 for k in params if k.startswith("layer_"))
    qk = params["layer_0"]["attention"]["query"]["kernel"]
    heads = qk.shape[1]
    ffn = params["layer_0"]["intermediate"]["kernel"].shape[1]
    return MiniLMConfig(
        vocab_size=int(vocab), hidden_size=int(hidden), num_layers=n_layers,
        num_heads=int(heads), intermediate_size=int(ffn),
        max_position_embeddings=int(max_pos),
    )


def deterministic_params(cfg: MiniLMConfig, seed: int = 0) -> dict:
    """Offline fallback: reproducible random init.

    Runs on the host CPU backend: initializer compilation on a tunneled TPU
    costs ~40s of process startup for a one-time host-side computation.
    """
    model = MiniLMEncoder(cfg)
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    if cpu is not None:
        with jax.default_device(cpu):
            return model.init_params(jax.random.PRNGKey(seed))
    return model.init_params(jax.random.PRNGKey(seed))
