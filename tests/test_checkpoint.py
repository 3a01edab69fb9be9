import jax.numpy as jnp
import numpy as np
import pytest

from rag_faiss_embedding_tpu.core.mesh import make_mesh
from rag_faiss_embedding_tpu.parallel import make_train_step
from rag_faiss_embedding_tpu.parallel.checkpoint import TrainCheckpointer

from .test_parallel import SMALL, _fake_batch


@pytest.mark.slow
def test_train_checkpoint_roundtrip(tmp_path, rng):
    mesh = make_mesh({"data": 2, "model": 4})
    run_step, state = make_train_step(SMALL, mesh, learning_rate=1e-3)
    batch = _fake_batch(rng, 8, 16)
    state, _ = run_step(state, batch)
    state, m1 = run_step(state, batch)

    ckpt = TrainCheckpointer(tmp_path / "ckpt")
    step = ckpt.save(state)
    assert step == 2 and ckpt.latest_step() == 2

    # fresh state restores to the saved params; next step matches
    _, fresh = make_train_step(SMALL, mesh, learning_rate=1e-3)
    restored = ckpt.restore(fresh)
    assert int(restored.step) == 2
    np.testing.assert_allclose(
        np.asarray(jnp.ravel(state.params["layer_0"]["intermediate"]["kernel"])),
        np.asarray(jnp.ravel(restored.params["layer_0"]["intermediate"]["kernel"])),
    )
    restored, m2 = run_step(restored, batch)
    assert np.isfinite(float(m2["loss"]))
    ckpt.close()
