"""Multitask model unit tests.

Regression for the flax lifted-vmap kwargs pitfall: nn.vmap silently drops
keyword arguments, so passing ``training=training`` into the vmapped expert
bank disabled expert dropout entirely (ADVICE r3 high). The bank must be
called positionally; these tests pin the stochastic/deterministic semantics.
"""
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recstudio_tpu.models.multitask.mmoe import MMoENet

FIELD_SPECS = (("age", "float", 1), ("item_id", "token", 50),
               ("user_id", "token", 30))


def _make_net(expert_dropout):
    return MMoENet(
        field_specs=FIELD_SPECS, embed_dim=8, ratings=("click", "like"),
        num_experts=4, expert_mlp_layer=(16, 8), gate_mlp_layer=(8,),
        tower_mlp_layer=(8,), expert_dropout=expert_dropout)


def _batch(rng):
    return {"user_id": jnp.asarray(rng.integers(1, 30, (6,))),
            "item_id": jnp.asarray(rng.integers(1, 50, (6,))),
            "age": jnp.asarray(rng.normal(size=(6,)), jnp.float32)}


def test_mmoe_expert_dropout_stochastic_in_training():
    """Expert dropout must actually engage under training=True: different
    dropout RNGs give different outputs, and no flax kwargs warning fires."""
    net = _make_net(expert_dropout=0.5)
    rng = np.random.default_rng(0)
    batch = _batch(rng)
    params = net.init({"params": jax.random.key(0),
                       "dropout": jax.random.key(1)}, batch, True)
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any kwargs-dropped warning -> fail
        out_a = net.apply(params, batch, True,
                          rngs={"dropout": jax.random.key(2)})
        out_b = net.apply(params, batch, True,
                          rngs={"dropout": jax.random.key(3)})
    assert not np.allclose(np.asarray(out_a["click"]),
                           np.asarray(out_b["click"])), \
        "expert dropout inactive: outputs identical across dropout RNGs"


def test_mmoe_eval_deterministic():
    net = _make_net(expert_dropout=0.5)
    rng = np.random.default_rng(1)
    batch = _batch(rng)
    params = net.init({"params": jax.random.key(0),
                       "dropout": jax.random.key(1)}, batch, True)
    out_a = net.apply(params, batch, False)
    out_b = net.apply(params, batch, False)
    for r in ("click", "like"):
        np.testing.assert_array_equal(np.asarray(out_a[r]),
                                      np.asarray(out_b[r]))


def test_mmoe_expert_bank_has_leading_expert_axis():
    """The mesh sharding rule (parallel/mesh.py:_is_expert_bank_path) relies
    on the naming contract: a module named exactly 'experts' whose every
    param leaf carries a leading expert axis of size num_experts."""
    net = _make_net(expert_dropout=0.0)
    batch = _batch(np.random.default_rng(2))
    params = net.init({"params": jax.random.key(0)}, batch, False)
    bank = params["params"]["experts"]
    leaves = jax.tree_util.tree_leaves(bank)
    assert leaves, "no expert bank params"
    for leaf in leaves:
        assert leaf.shape[0] == 4, f"leading axis {leaf.shape} != num_experts"
