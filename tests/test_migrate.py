"""Torch-checkpoint import (reference utils/callbacks.py:67-73 payload)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from recstudio_tpu.utils import get_model, seed_everything
from recstudio_tpu.utils.migrate import (import_reference_checkpoint,
                                         import_state_dict)


@pytest.fixture(scope="module")
def built_bpr(ml100k_splits):
    trn, _, tst = ml100k_splits
    cls, conf = get_model("BPR")
    conf["train"].update(epochs=0, batch_size=512)
    conf["eval"].update(batch_size=64, cutoff=[20], val_metrics=["ndcg"],
                        test_metrics=["ndcg", "recall"], topk=100)
    seed_everything(1)
    m = cls(conf)
    m.fit(trn, None, run_mode="light")
    return m, tst


def _fake_reference_ckpt(m, path):
    """A reference-format .ckpt: torch.save of {'parameters': state_dict}.

    Key names follow the reference BPR module layout (item_encoder /
    query_encoder torch Embeddings -> '<name>.weight')."""
    n_items, d = m.params["item_encoder"]["embedding"].shape
    n_users, _ = m.params["query_encoder"]["embedding"].shape
    g = torch.Generator().manual_seed(0)
    sd = {"item_encoder.weight": torch.randn(n_items, d, generator=g),
          "query_encoder.weight": torch.randn(n_users, d, generator=g)}
    torch.save({"config": {}, "model": "BPR", "epoch": 7,
                "parameters": sd, "metric": {"ndcg@20": 0.1}}, path)
    return sd


def test_import_maps_embeddings(built_bpr, tmp_path):
    m, tst = built_bpr
    path = str(tmp_path / "ref_bpr.ckpt")
    sd = _fake_reference_ckpt(m, path)
    report = import_reference_checkpoint(m, path, strict=True)
    assert report["skipped"] == []
    assert sorted(report["matched"]) == ["item_encoder/embedding",
                                        "query_encoder/embedding"]
    np.testing.assert_allclose(
        np.asarray(m.params["item_encoder"]["embedding"]),
        sd["item_encoder.weight"].numpy(), rtol=1e-6)
    # imported params drive inference end-to-end
    res = m.evaluate(tst, verbose=False)
    assert np.isfinite(res["recall@20"])


def test_linear_transpose_and_layernorm_mapping():
    params = {"mlp": {"dense": {"kernel": np.zeros((4, 8), np.float32),
                                "bias": np.zeros((8,), np.float32)},
                      "norm": {"scale": np.zeros((8,), np.float32),
                               "bias": np.zeros((8,), np.float32)}}}
    sd = {"mlp.dense.weight": np.arange(32, dtype=np.float32).reshape(8, 4),
          "mlp.dense.bias": np.ones(8, np.float32),
          "mlp.norm.weight": np.full(8, 2.0, np.float32),
          "mlp.norm.bias": np.full(8, 3.0, np.float32)}
    new, report = import_state_dict(params, sd, strict=True)
    np.testing.assert_array_equal(new["mlp"]["dense"]["kernel"],
                                  sd["mlp.dense.weight"].T)
    np.testing.assert_array_equal(new["mlp"]["norm"]["scale"],
                                  sd["mlp.norm.weight"])
    assert report["unused_torch_keys"] == []


def test_row_permutation(built_bpr, tmp_path):
    m, _ = built_bpr
    path = str(tmp_path / "ref_bpr2.ckpt")
    sd = _fake_reference_ckpt(m, path)
    n_items = m.params["item_encoder"]["embedding"].shape[0]
    perm = np.random.default_rng(0).permutation(n_items)
    import_reference_checkpoint(m, path, row_perms={"item_encoder": perm})
    np.testing.assert_allclose(
        np.asarray(m.params["item_encoder"]["embedding"]),
        sd["item_encoder.weight"].numpy()[perm], rtol=1e-6)


def test_shape_mismatch_skipped():
    params = {"emb": {"embedding": np.zeros((10, 4), np.float32)}}
    sd = {"emb.weight": np.zeros((11, 4), np.float32)}  # wrong vocab
    new, report = import_state_dict(params, sd)
    assert report["matched"] == [] and report["skipped"] == ["emb/embedding"]
    with pytest.raises(ValueError):
        import_state_dict(params, sd, strict=True)


def test_transformer_encoder_import_matches_torch():
    """Import a torch nn.TransformerEncoder state_dict (the reference
    SASRec's ``transformer_layer``, reference seq/sasrec.py:40-47) into our
    TransformerEncoder and check output parity on the same input."""
    import jax
    import jax.numpy as jnp
    import torch.nn as tnn
    from recstudio_tpu.models.module.layers import TransformerEncoder

    D, H, F, L, B = 16, 2, 32, 6, 3
    t_layer = tnn.TransformerEncoderLayer(
        D, H, dim_feedforward=F, dropout=0.0, activation="relu",
        layer_norm_eps=1e-5, batch_first=True)
    t_enc = tnn.TransformerEncoder(t_layer, num_layers=2)
    host = tnn.Module()
    host.transformer_layer = t_enc  # the reference attribute name
    sd = {k: v.detach().numpy() for k, v in host.state_dict().items()}

    flax_enc = TransformerEncoder(num_layers=2, d_model=D, n_head=H,
                                  dim_feedforward=F, dropout=0.0,
                                  activation="relu", layer_norm_eps=1e-5)
    x = np.random.default_rng(0).normal(size=(B, L, D)).astype(np.float32)
    params = flax_enc.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    new, report = import_state_dict({"transformer": params}, sd, strict=True)
    assert report["skipped"] == []
    assert report["unused_torch_keys"] == []

    out_flax = flax_enc.apply({"params": new["transformer"]}, jnp.asarray(x))
    t_enc.eval()
    with torch.no_grad():
        out_torch = t_enc(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(out_flax), out_torch,
                               rtol=1e-4, atol=1e-4)
