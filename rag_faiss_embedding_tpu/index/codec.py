"""npz persistence codec for device arrays (bf16 <-> uint16 bit pattern).

One shared home for the conversion every index kind's ``state_dict`` /
``from_state_dict`` needs (flat, IVF, sharded flat, sharded IVF — the
formats are documented as cross-loadable, so the dance must not diverge):
numpy's savez has no bfloat16 dtype — a straight ``np.asarray`` of bf16
silently saves as void "|V2" and cannot reload — so bf16 arrays persist as
their raw uint16 bit pattern, exactly. (Persistence parity anchor:
``faiss.write_index`` / ``read_index``, reference ``faiss_store.py:83-97``.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["to_host", "from_host"]


def to_host(arr) -> np.ndarray:
    """savez-able numpy view of a device array (bf16 -> uint16 bits, exact;
    every other dtype passes through)."""
    arr = jnp.asarray(arr)
    if arr.dtype == jnp.bfloat16:
        arr = arr.view(jnp.uint16)
    return np.asarray(arr)


def from_host(arr: np.ndarray, dtype) -> jax.Array:
    """Inverse of :func:`to_host`: reinterpret a stored array back to
    ``dtype``. For bf16, accepts the uint16 bit pattern (current format) or
    legacy void "|V2" saves (same bits, wrong numpy dtype tag)."""
    if jnp.dtype(dtype) == jnp.bfloat16:
        bits = np.asarray(arr)
        if bits.dtype != np.uint16:
            bits = bits.view(np.uint16)
        return jnp.asarray(bits).view(jnp.bfloat16)
    return jnp.asarray(arr, dtype)
