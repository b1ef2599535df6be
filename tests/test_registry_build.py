"""Every registered model must resolve, carry a config, and declare a dataset."""
import pytest

from recstudio_tpu.utils import get_model, list_models


def test_all_models_resolve():
    models = list_models()
    assert len(models) >= 60
    for name in models:
        cls, conf = get_model(name)
        assert isinstance(conf, dict)
        for group in ("data", "model", "train", "eval"):
            assert group in conf, f"{name} missing config group {group}"
        ds = cls._get_dataset_class()
        assert ds is not None, f"{name} has no dataset class"


def test_expected_inventory_present():
    models = set(list_models())
    expected = {
        # mf
        "bpr", "pmf", "ncf", "cml", "dssm", "logisticmf", "ease", "slim",
        "itemknn", "wrmf", "irgan",
        # seq
        "gru4rec", "sasrec", "bert4rec", "caser", "narm", "stamp", "fpmc",
        "transrec", "hgn", "npe", "din", "cl4srec", "iclrec", "coserec",
        # ae
        "multidae", "multivae",
        # fm
        "lr", "fm", "ffm", "fwfm", "fmfm", "hfm", "lorentzfm", "afm", "nfm",
        "ifm", "difm", "deepfm", "xdeepfm", "dcn", "dcnv2", "edcn",
        "deepcrossing", "pnn", "onn", "afn", "aoanet", "autoint", "destine",
        "ccpm", "fgcnn", "fibinet", "fignn", "finalmlp", "flen", "interhat",
        "masknet", "ppnet", "sam", "deepim", "dlrm", "widedeep",
        # graph
        "ngcf", "lightgcn", "ncl", "sgl", "simgcl",
        # kg
        "cfkg", "cke", "ktup", "kgat", "kgcn", "kgnnls", "kgin", "mkr",
        "ripplenet",
        # multitask
        "hardshare", "mmoe", "ple", "aitm",
    }
    missing = expected - models
    assert not missing, f"missing models: {sorted(missing)}"
