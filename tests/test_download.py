"""End-to-end proof of the dataset download/extract/cache path.

The sandbox has no network egress, so these tests drive the EXACT code path
http(s)-configured datasets use (reference utils/utils.py:225-331: fetch ->
unpack -> ETL) against a ``file://`` fixture URL — urlretrieve treats it
identically to a remote fetch apart from the transport.
"""
import gzip
import os
import tarfile
import zipfile

import numpy as np
import pandas as pd
import pytest

from recstudio_tpu.data import TripletDataset
from recstudio_tpu.utils.download import download_dataset, extract_archive


def _write_inter(path, n=400, seed=3):
    rng = np.random.default_rng(seed)
    pd.DataFrame({
        "user_id": rng.integers(1, 40, n),
        "item_id": rng.integers(1, 80, n),
        "rating": rng.integers(1, 6, n).astype(float),
        "timestamp": rng.integers(1, 10**6, n).astype(float),
    }).to_csv(path, sep="\t", index=False)


@pytest.fixture()
def fixture_zip(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write_inter(src / "dl-demo.inter")
    archive = tmp_path / "dl-demo.zip"
    with zipfile.ZipFile(archive, "w") as z:
        z.write(src / "dl-demo.inter", "dl-demo.inter")
    return archive


def _data_config(url):
    return {
        "url": url,
        "user_id_field": "user_id:token",
        "item_id_field": "item_id:token",
        "rating_field": "rating:float",
        "time_field": "timestamp:float",
        "inter_feat_name": "dl-demo.inter",
        "inter_feat_field": ["user_id:token", "item_id:token",
                             "rating:float", "timestamp:float"],
        "inter_feat_header": 0,
        "user_feat_name": None,
        "item_feat_name": None,
        "network_feat_name": None,
        "low_rating_thres": None,
        "min_user_inter": 0,
        "min_item_inter": 0,
        "save_cache": False,
    }


def test_download_extract_build_end_to_end(fixture_zip, tmp_path, monkeypatch):
    """file:// archive -> download -> unzip -> full ETL -> splits."""
    from recstudio_tpu.utils import download as dl
    monkeypatch.setattr(dl, "DEFAULT_DOWNLOAD_DIR", str(tmp_path / "dlcache"))
    ds = TripletDataset("dl-demo", config=_data_config(fixture_zip.as_uri()))
    trn, val, tst = ds.build(split_ratio=[0.8, 0.1, 0.1])
    assert len(trn.data_index) > len(tst.data_index) > 0
    assert ds.num_items > 1


def test_download_cache_skips_refetch(fixture_zip, tmp_path, monkeypatch):
    """Second access must reuse the extracted dir without re-fetching."""
    from recstudio_tpu.utils import download as dl
    monkeypatch.setattr(dl, "DEFAULT_DOWNLOAD_DIR", str(tmp_path / "dlcache"))
    calls = []
    real = dl.urlretrieve
    monkeypatch.setattr(dl, "urlretrieve",
                        lambda url, fn: calls.append(url) or real(url, fn))
    d1 = download_dataset(fixture_zip.as_uri(), "dl-demo")
    d2 = download_dataset(fixture_zip.as_uri(), "dl-demo")
    assert d1 == d2 and len(calls) == 1
    assert os.path.isfile(os.path.join(d1, "dl-demo.inter"))


@pytest.mark.parametrize("kind", ["zip", "tar", "gz"])
def test_extract_archive_formats(tmp_path, kind):
    src = tmp_path / "payload.inter"
    _write_inter(src)
    dest = tmp_path / f"out_{kind}"
    if kind == "zip":
        arc = tmp_path / "a.zip"
        with zipfile.ZipFile(arc, "w") as z:
            z.write(src, "payload.inter")
    elif kind == "tar":
        arc = tmp_path / "a.tar.gz"
        with tarfile.open(arc, "w:gz") as t:
            t.add(src, "payload.inter")
    else:
        arc = tmp_path / "payload.inter.gz"
        with open(src, "rb") as f_in, gzip.open(arc, "wb") as f_out:
            f_out.write(f_in.read())
    extract_archive(str(arc), str(dest))
    out = dest / "payload.inter"
    assert out.is_file()
    assert len(pd.read_csv(out, sep="\t")) == 400
