import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rag_dpo_tpu.models import BgeM3Config, EncoderConfig
from rag_dpo_tpu.parallel import MeshSpec, create_mesh
from rag_dpo_tpu.train import (
    TrainConfig,
    create_train_state,
    make_sharded_train_step,
)
from rag_dpo_tpu.train.checkpoint import TrainCheckpointer


def _cfg():
    return TrainConfig(
        model=BgeM3Config(
            encoder=EncoderConfig(
                vocab_size=256, hidden_size=32, num_layers=1, num_heads=2,
                intermediate_size=64, max_position_embeddings=66,
                use_flash_attention=False,
            ),
            colbert_dim=16,
        ),
        warmup_steps=2,
    )


def _batch(rng, b, s=12):
    return {
        "query_ids": jnp.asarray(rng.integers(4, 256, (b, s)), jnp.int32),
        "query_lengths": jnp.full((b,), s, jnp.int32),
        "passage_ids": jnp.asarray(rng.integers(4, 256, (b, s)),
                                   jnp.int32),
        "passage_lengths": jnp.full((b,), s, jnp.int32),
    }


def test_sharded_train_step_decreases_loss(eight_devices):
    mesh = create_mesh(MeshSpec(data=4, model=2, shard=1))
    cfg = _cfg()
    state = create_train_state(cfg)
    step, state = make_sharded_train_step(cfg, mesh, state)
    rng = np.random.default_rng(0)
    batch = _batch(rng, b=8)
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # memorizes the fixed batch
    assert int(jax.device_get(state.step)) == 8


def test_remat_training_matches(eight_devices):
    """Remat changes memory, not math: same loss trajectory."""
    mesh = create_mesh(MeshSpec(data=2, model=1, shard=1))
    rng = np.random.default_rng(4)
    batch = _batch(rng, b=4)
    losses = {}
    for remat in (False, True):
        cfg = _cfg()
        cfg = TrainConfig(
            model=BgeM3Config(
                encoder=EncoderConfig(
                    vocab_size=256, hidden_size=32, num_layers=1,
                    num_heads=2, intermediate_size=64,
                    max_position_embeddings=66,
                    use_flash_attention=False, remat=remat,
                ),
                colbert_dim=16,
            ),
            warmup_steps=2,
        )
        state = create_train_state(cfg)
        step, state = make_sharded_train_step(cfg, mesh, state)
        state, metrics = step(state, batch)
        losses[remat] = float(metrics["loss"])
    assert losses[False] == pytest.approx(losses[True], rel=1e-4)


def test_checkpoint_roundtrip(tmp_path):
    cfg = _cfg()
    state = create_train_state(cfg)
    ckpt = TrainCheckpointer(tmp_path / "ckpt")
    assert ckpt.latest_step() is None
    with pytest.raises(FileNotFoundError):
        ckpt.restore(state)
    state = state.replace(step=jnp.int32(5))
    assert ckpt.save(state)
    restored = ckpt.restore(create_train_state(cfg))
    assert int(restored.step) == 5
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b)),
        state.params, restored.params,
    )
    ckpt.close()
