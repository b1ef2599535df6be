"""Dataset download + archive extraction.

Reference: recstudio/utils/utils.py:165-331 and utils/compress_file.py —
datasets declared with an http(s) ``url`` are fetched into the cache dir and
unpacked (zip / tar / gz) before ETL.
"""
from __future__ import annotations

import gzip
import os
import shutil
import tarfile
import zipfile
from urllib.request import urlretrieve

from .logger import get_logger

DEFAULT_DOWNLOAD_DIR = os.path.expanduser("~/.recstudio_tpu/datasets")


def extract_archive(path: str, dest_dir: str) -> str:
    """Unpack zip/tar/gz archives; returns the extraction directory."""
    os.makedirs(dest_dir, exist_ok=True)
    if zipfile.is_zipfile(path):
        with zipfile.ZipFile(path) as z:
            z.extractall(dest_dir)
    elif tarfile.is_tarfile(path):
        with tarfile.open(path) as t:
            t.extractall(dest_dir)
    elif path.endswith(".gz"):
        out = os.path.join(dest_dir, os.path.basename(path)[:-3])
        with gzip.open(path, "rb") as f_in, open(out, "wb") as f_out:
            shutil.copyfileobj(f_in, f_out)
    else:
        shutil.copy(path, dest_dir)
    return dest_dir


def download_dataset(url: str, name: str, download_dir: str = None) -> str:
    """Fetch and unpack a dataset archive; returns the dataset directory.

    ``download_dir`` defaults to DEFAULT_DOWNLOAD_DIR resolved at CALL time
    (not def time) so tests and deployments can repoint the cache."""
    logger = get_logger()
    download_dir = download_dir or DEFAULT_DOWNLOAD_DIR
    target_dir = os.path.join(download_dir, name)
    if os.path.isdir(target_dir) and os.listdir(target_dir):
        return target_dir
    os.makedirs(download_dir, exist_ok=True)
    archive = os.path.join(download_dir, os.path.basename(url))
    logger.info(f"downloading {url} -> {archive}")
    urlretrieve(url, archive)
    extract_archive(archive, target_dir)
    return target_dir
