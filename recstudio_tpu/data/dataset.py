"""Dataset layer: host-side ETL -> static-shape numpy batches for XLA.

Re-implements the reference data pipeline semantics (recstudio/data/dataset.py)
with a TPU-first design:

- pandas is used once, offline, for CSV parsing / filtering / id factorization
  (same semantics: rating threshold, duplicate-pair drop, k-core loop,
  global token factorize with ``[PAD]``=0, per-user time sort, ratio /
  leave-one-out / num splits with the same rounding rules);
- all split views expose **fixed-shape** numpy batches (padded targets,
  padded user histories, padded sequence windows + ``seqlen``), so every
  downstream train/eval step compiles once under ``jax.jit``;
- evaluation batches carry ``_size`` (true rows in a padded tail batch) so the
  engine can do exact weighted-mean metrics.

Dataset classes mirror the reference inventory:
TripletDataset (dataset.py:21), UserDataset (:1278), SeqDataset (:1369),
FullSeqDataset (:1448), SeqToSeqDataset (:1463); ALSDataset lives in
advance_dataset.py.
"""
from __future__ import annotations

import copy
import hashlib
import os
import pickle
from collections.abc import Mapping
from typing import Any, Dict, Iterator, List, Optional, Sequence, Union

import numpy as np
import pandas as pd

from ..utils import get_dataset_default_config, get_logger, deep_update
from .fields import FieldSpec, PAD_TOKEN, parse_field
from .frame import Frame

_PKG_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_CACHE_DIR = os.path.expanduser("~/.recstudio_tpu/cache")


# --------------------------------------------------------------------------
# float preprocessing (host-side, replaces sklearn scalers — reference
# dataset.py:355-415)
# --------------------------------------------------------------------------
def _apply_scaler(col: np.ndarray, spec: str) -> np.ndarray:
    x = col.astype(np.float64)
    name = spec.split("(")[0]
    if name == "StandardScaler":
        mu, sd = x.mean(), x.std()
        return (x - mu) / (sd if sd > 0 else 1.0)
    if name == "MinMaxScaler":
        lo, hi = x.min(), x.max()
        rng = hi - lo
        return (x - lo) / (rng if rng > 0 else 1.0)
    if name == "MaxAbsScaler":
        m = np.abs(x).max()
        return x / (m if m > 0 else 1.0)
    if name == "RobustScaler":
        med = np.median(x)
        q1, q3 = np.percentile(x, 25), np.percentile(x, 75)
        iqr = q3 - q1
        return (x - med) / (iqr if iqr > 0 else 1.0)
    if name == "LogTransformer":
        return np.log1p(x)
    if name == "Binarizer":
        return (x > 0).astype(np.float64)
    raise ValueError(f"unsupported float preprocessor: {spec}")


class _LazyToken2Idx(Mapping):
    """``field -> {token: idx}`` view derived from ``field2tokens`` on first
    access. The dicts are pure API surface (reference dataset.py:417-474
    exposes them; nothing in this framework consumes them), and pickling
    millions of numpy-scalar dict entries dominated dataset-cache load time
    at big-vocab CTR shapes (~4.5 min of a 3.3 GB pickle), so they are
    built lazily and excluded from the cache. Subclasses
    ``collections.abc.Mapping`` so code written against the reference's
    plain-dict attribute keeps working: ``get``/``values``/``items`` (a
    re-iterable view, not a one-shot generator), equality, and
    ``dict(ds.field2token2idx)`` all behave dict-like."""

    def __init__(self, field2tokens: Dict[str, np.ndarray]):
        self._field2tokens = field2tokens
        self._built: Dict[str, Dict] = {}

    def __getitem__(self, field):
        if field not in self._built:
            if field not in self._field2tokens:
                raise KeyError(field)
            self._built[field] = {
                t: i for i, t in enumerate(self._field2tokens[field])}
        return self._built[field]

    def __iter__(self):
        return iter(self._field2tokens)

    def __len__(self):
        return len(self._field2tokens)


class TripletDataset:
    r"""Core interaction dataset: ``<user, item, rating, [time]>`` triplets.

    Loading pipeline (mirrors reference dataset.py:56-63):
    ``_load_all_data -> _filter -> _float_preprocess -> _map_all_ids ->
    _post_preprocess``; then :meth:`build` splits into train/val/test views.
    """

    def __init__(self, name: str = "ml-100k", config: Union[None, str, Dict] = None,
                 data_dir: Optional[str] = None):
        self.name = name
        self.logger = get_logger()
        conf = get_dataset_default_config(name)
        if isinstance(config, str):
            from ..utils import load_yaml
            conf = deep_update(conf, load_yaml(config))
        elif isinstance(config, dict):
            conf = deep_update(conf, config)
        self.config = conf
        self.data_dir = data_dir

        cached = self._load_cache_if_valid()
        if cached is None:
            self._init_common_field()
            self._load_all_data()
            self._parse_time_field()
            self._filter(self.config.get("min_user_inter", 0) or 0,
                         self.config.get("min_item_inter", 0) or 0)
            self._float_preprocess()
            self._map_all_ids()
            self._post_preprocess()
            self._save_cache_if_requested()
        self.eval_mode = False
        self.fmeval = False
        self.neg_count = None
        self.data_index: Optional[np.ndarray] = None
        if not isinstance(self.frating, list):
            self._use_field = {f for f in (self.fuid, self.fiid, self.frating) if f is not None}
        else:
            self._use_field = {self.fuid, self.fiid, *self.frating} - {None}

    # ------------------------------------------------------------------
    # configuration helpers
    # ------------------------------------------------------------------
    def _init_common_field(self):
        self.field2type: Dict[str, str] = {}
        self.field2tokens: Dict[str, np.ndarray] = {}
        self.field2token2idx = _LazyToken2Idx(self.field2tokens)
        self.field2maxlen: Dict[str, int] = {}
        c = self.config
        self.fuid = parse_field(c["user_id_field"]).name if c.get("user_id_field") else None
        self.fiid = parse_field(c["item_id_field"]).name if c.get("item_id_field") else None
        self.ftime = parse_field(c["time_field"]).name if c.get("time_field") else None
        if c.get("rating_field"):
            rf = c["rating_field"]
            if isinstance(rf, list):
                self.frating = [parse_field(r).name for r in rf]
            else:
                self.frating = parse_field(rf).name
        else:
            self.frating = None

    @property
    def drop_dup(self) -> bool:
        return bool(self.config.get("drop_dup", True))

    @property
    def use_field(self):
        return self._use_field

    @use_field.setter
    def use_field(self, fields):
        self._use_field = set(f for f in fields if f is not None)

    # ------------------------------------------------------------------
    # cache
    # ------------------------------------------------------------------
    def _cache_path(self) -> str:
        blob = pickle.dumps({"name": self.name, "config": self.config, "cls": type(self).__name__})
        digest = hashlib.md5(blob).hexdigest()
        return os.path.join(DEFAULT_CACHE_DIR, f"{self.name}-{digest}.pkl")

    def _load_cache_if_valid(self):
        path = self._cache_path()
        if self.config.get("save_cache") and os.path.isfile(path):
            with open(path, "rb") as f:
                state = pickle.load(f)
            self.__dict__.update(state)
            # not pickled (or pickled eagerly by a pre-lazy cache): derive
            # from the restored field2tokens
            self.field2token2idx = _LazyToken2Idx(self.field2tokens)
            self.logger.info(f"loaded cached dataset from {path}")
            return True
        return None

    def _save_cache_if_requested(self):
        if not self.config.get("save_cache"):
            return
        os.makedirs(DEFAULT_CACHE_DIR, exist_ok=True)
        state = {k: v for k, v in self.__dict__.items()
                 if k not in ("logger", "field2token2idx")}
        with open(self._cache_path(), "wb") as f:
            pickle.dump(state, f)

    # ------------------------------------------------------------------
    # loading
    # ------------------------------------------------------------------
    def _resolve_dir(self) -> str:
        if self.data_dir:
            return self.data_dir
        url = self.config.get("url") or ""
        if url.startswith("recstudio:"):
            return os.path.join(_PKG_DIR, url.split(":", 1)[1])
        if url.startswith(("http://", "https://", "file://")):
            # file:// serves as the offline-sandbox proof of the exact same
            # download->extract->cache path http(s) datasets go through
            from ..utils.download import download_dataset
            return download_dataset(url, self.name)
        if url and os.path.isdir(url):
            return url
        # fallback: bundled demo folder of the same name
        cand = os.path.join(_PKG_DIR, "dataset_demo", self.name)
        if os.path.isdir(cand):
            return cand
        raise FileNotFoundError(
            f"cannot locate data files for dataset '{self.name}' (url={url!r}); "
            f"pass data_dir= or set `url` in the dataset config")

    def _load_feat(self, path: str, header, sep: str, field_decls: List[str],
                   update_dict: bool = True) -> pd.DataFrame:
        specs = [parse_field(d) for d in field_decls]
        names = [s.name for s in specs]
        if update_dict:
            self.field2type.update({s.name: s.dtype for s in specs})
        dtypes = {s.name: (np.float64 if s.dtype == "float" else str) for s in specs}
        df = self._native_read_csv(path, sep, header, specs, names)
        if df is None:
            engine = "c" if len(sep) == 1 else "python"
            df = pd.read_csv(path, sep=sep, header=header, names=names, dtype=dtypes,
                             engine=engine, index_col=False,
                             encoding=self.config.get("encoding_method") or "utf-8")[names]
        for s in specs:
            if not s.is_seq:
                if update_dict and s.name not in self.field2maxlen:
                    self.field2maxlen[s.name] = 1
                continue
            cast = float if "float" in s.dtype else str
            df[s.name] = df[s.name].fillna("").map(
                lambda v: [cast(t) for t in v.split(s.sep) if t] if isinstance(v, str) else [])
            if update_dict and s.name not in self.field2maxlen:
                self.field2maxlen[s.name] = int(df[s.name].map(len).max() or 1)
        return df

    def _native_read_csv(self, path, sep, header, specs, names):
        """C++ CSV fast path (native/csv.cpp): ~15x the pandas python engine.
        Handles the common case — single-char separator, no quoting, no
        sequence fields, utf-8 — and returns None otherwise (pandas fallback)."""
        enc = (self.config.get("encoding_method") or "utf-8").lower()
        if enc not in ("utf-8", "utf8", "ascii") or any(s.is_seq for s in specs):
            return None
        from ..native import fast_read_csv
        float_cols = {s.name for s in specs if s.dtype == "float"}
        cols = fast_read_csv(path, sep, names, float_cols,
                             skip_rows=0 if header is None else int(header) + 1)
        if cols is None:
            return None
        # copy=False: the parser's buffers are freshly allocated and owned
        # here; a copying ctor costs ~7 s at 10M rows
        return pd.DataFrame(cols, copy=False)

    def _parse_time_field(self):
        """``str``-typed time fields (e.g. gowalla check-in timestamps) are
        parsed with ``time_format`` into float epoch seconds so downstream
        time sorting/splitting sees a numeric column."""
        if not self.ftime or self.field2type.get(self.ftime) != "str":
            return
        fmt = self.config.get("time_format")
        ts = pd.to_datetime(self.inter_feat[self.ftime], format=fmt,
                            utc=True, errors="coerce")
        epoch = (ts - pd.Timestamp("1970-01-01", tz="UTC")).dt.total_seconds()
        self.inter_feat[self.ftime] = epoch.astype(np.float64)
        self.field2type[self.ftime] = "float"

    def _load_all_data(self):
        c = self.config
        d = self._resolve_dir()
        sep = c.get("field_separator", "\t")
        self.inter_feat = self._load_feat(
            os.path.join(d, c["inter_feat_name"]), c.get("inter_feat_header"),
            sep, c["inter_feat_field"])
        self.user_feat = None
        if c.get("user_feat_name"):
            frames = []
            for fname, decls, hdr in zip(c["user_feat_name"], c["user_feat_field"],
                                         c.get("user_feat_header") or [0] * len(c["user_feat_name"])):
                frames.append(self._load_feat(os.path.join(d, fname), hdr, sep, decls))
            self.user_feat = frames[0]
            for f in frames[1:]:
                self.user_feat = self.user_feat.merge(f, on=self.fuid, how="outer")
        self.item_feat = None
        if c.get("item_feat_name"):
            frames = []
            for fname, decls, hdr in zip(c["item_feat_name"], c["item_feat_field"],
                                         c.get("item_feat_header") or [0] * len(c["item_feat_name"])):
                frames.append(self._load_feat(os.path.join(d, fname), hdr, sep, decls))
            self.item_feat = frames[0]
            for f in frames[1:]:
                self.item_feat = self.item_feat.merge(f, on=self.fiid, how="outer")
        # network features (social graphs / knowledge graphs)
        self.network_feat: List[pd.DataFrame] = []
        self.mapped_fields: List[List[Optional[str]]] = []
        self.node_link: List[Optional[Dict]] = []
        if c.get("network_feat_name"):
            for net_i, net_files in enumerate(c["network_feat_name"]):
                mapped = c["mapped_feat_field"][net_i]
                headers = c["network_feat_header"][net_i]
                decls_per_file = c["network_feat_field"][net_i]
                link_map = None
                frames = []
                for file_j, fname in enumerate(net_files):
                    df = self._load_feat(os.path.join(d, fname), headers[file_j], sep,
                                         decls_per_file[file_j])
                    frames.append(df)
                if len(frames) == 2:
                    # second file is an id-link table (e.g. item_id <-> entity_id)
                    link_df = frames[1]
                    link_map = dict(zip(link_df.iloc[:, 1], link_df.iloc[:, 0]))
                self.network_feat.append(frames[0])
                self.mapped_fields.append(
                    [parse_field(m).name if isinstance(m, str) else None for m in
                     (mapped if isinstance(mapped, list) else [mapped])])
                self.node_link.append(link_map)

    # ------------------------------------------------------------------
    # filtering
    # ------------------------------------------------------------------
    def _filter_ratings(self, thres):
        if thres is not None and self.frating is not None and not isinstance(self.frating, list):
            keep = self.inter_feat[self.frating] >= thres
            self.inter_feat = self.inter_feat[keep].reset_index(drop=True)

    def _drop_duplicated_pairs(self):
        keep = ~self.inter_feat.duplicated(subset=[self.fuid, self.fiid], keep="first")
        self.inter_feat = self.inter_feat[keep].reset_index(drop=True)

    def _filter(self, min_user_inter: int, min_item_inter: int):
        self._filter_ratings(self.config.get("low_rating_thres", None))
        if self.drop_dup:
            self._drop_duplicated_pairs()
        if self.fuid is None or self.fiid is None:
            return
        if min_user_inter <= 0 and min_item_inter <= 0:
            return
        # alternating k-core until fixpoint (native C++ kernel when available,
        # replacing the reference's scipy CSC rebuild loop — dataset.py:528-573)
        from ..native import kcore_filter
        ucodes, _ = pd.factorize(self.inter_feat[self.fuid])
        icodes, _ = pd.factorize(self.inter_feat[self.fiid])
        keep_mask = kcore_filter(ucodes, icodes, int(ucodes.max()) + 1,
                                 int(icodes.max()) + 1,
                                 min_user_inter, min_item_inter)
        self.inter_feat = self.inter_feat[keep_mask].reset_index(drop=True)
        keep_users = set(self.inter_feat[self.fuid].unique())
        keep_items = set(self.inter_feat[self.fiid].unique())
        if self.user_feat is not None:
            self.user_feat = self.user_feat[self.user_feat[self.fuid].isin(keep_users)].reset_index(drop=True)
        if self.item_feat is not None:
            self.item_feat = self.item_feat[self.item_feat[self.fiid].isin(keep_items)].reset_index(drop=True)

    def _float_preprocess(self):
        specs = self.config.get("float_field_preprocess")
        if not specs:
            return
        for decl in specs:
            field, proc = decl.split(":", 1)
            for feat in self._feat_list():
                if feat is not None and field in feat.columns:
                    feat[field] = _apply_scaler(feat[field].values, proc)

    def _feat_list(self) -> List[pd.DataFrame]:
        out = [f for f in (self.inter_feat, self.user_feat, self.item_feat) if f is not None]
        out.extend(self.network_feat)
        return out

    # ------------------------------------------------------------------
    # id mapping (token -> contiguous int with [PAD]=0)
    # ------------------------------------------------------------------
    def _map_all_ids(self):
        # group fields that share an id space (network feats remap onto fuid/fiid)
        shared: Dict[str, List[str]] = {}
        net_remap: Dict[int, Dict[str, str]] = {}
        for i, mapped in enumerate(self.mapped_fields):
            net = self.network_feat[i]
            remap = {}
            for j, col in enumerate(net.columns[:len(mapped)]):
                if mapped[j] is not None:
                    remap[col] = mapped[j]
            net_remap[i] = remap

        token_fields = [f for f, t in self.field2type.items() if t.startswith("token")]
        for field in token_fields:
            root = field
            for remap in net_remap.values():
                if field in remap:
                    root = remap[field]
            shared.setdefault(root, [])
            if field not in shared[root]:
                shared[root].append(field)
        for root, members in shared.items():
            if root not in members:
                members.insert(0, root)

        for root, members in shared.items():
            # collect all token occurrences for this shared id space
            columns = []   # (feat, field, is_seq, net_index or None)
            core_feats = [f for f in (self.inter_feat, self.user_feat, self.item_feat)
                          if f is not None]
            for field in members:
                for feat in self._feat_list():
                    if feat is not None and field in feat.columns:
                        columns.append((feat, field))
            is_core = [any(feat is cf for cf in core_feats) for feat, _ in columns]
            # two-level factorization: reduce every column to an interned
            # (codes [rows], pool [uniques]) pair, then factorize only the
            # CONCATENATED POOLS (small) instead of the concatenated rows
            # (10M+). Categorical columns (native CSV fast path) are already
            # interned; token ids come out identical to row-level factorize
            # because pools are in first-occurrence order.
            token_pairs = []   # (codes >=0 into pool, pool str ndarray)
            for feat, field in columns:
                col = feat[field]
                if self.field2type[field].endswith("seq"):
                    vals = np.concatenate([np.asarray(v, dtype=object) for v in col.values]) \
                        if len(col) else np.array([], dtype=object)
                    codes, pool = pd.factorize(vals.astype(str))
                    pool = np.asarray(pool, dtype=object)
                elif isinstance(col.dtype, pd.CategoricalDtype):
                    codes = col.cat.codes.values   # int{8,16,32}, no copy
                    pool = col.cat.categories.to_numpy(dtype=object)
                    # compact to the tokens actually present (rows may have
                    # been filtered since load; vocab must match row content)
                    used = np.zeros(len(pool) + 1, dtype=bool)
                    used[codes] = True           # codes==-1 marks the tail
                    nan_seen = used[-1]
                    used = used[:-1]
                    if not used.all() or nan_seen:
                        new_pos = np.cumsum(used) - 1
                        pool = pool[used]
                        if nan_seen:   # preserve str-cast semantics for NaN
                            pool = np.append(pool, "nan")
                            new_pos = np.append(new_pos, len(pool) - 1)
                        codes = new_pos[codes]
                else:
                    codes, pool = pd.factorize(col.values.astype(str))
                    pool = np.asarray(pool, dtype=object)
                if (codes < 0).any():   # NaN from object-path factorize
                    pool = np.append(pool, "nan")
                    codes = np.where(codes < 0, len(pool) - 1, codes)
                token_pairs.append((codes, pool))
            # apply node links (e.g. entity ids aliased to item tokens) at
            # POOL level — the remap is elementwise on token values
            for i, remap in net_remap.items():
                link = self.node_link[i]
                if link is None:
                    continue
                for ci, (feat, field) in enumerate(columns):
                    if feat is self.network_feat[i] and field in remap:
                        codes, pool = token_pairs[ci]
                        pool = np.array([str(link.get(t, t)) for t in pool],
                                        dtype=object)
                        token_pairs[ci] = (codes, pool)
            pools = [p for _, p in token_pairs]
            all_pool = np.concatenate(pools) if pools else np.array([], dtype=object)
            pool2global, uniques = pd.factorize(all_pool)
            tokens = np.insert(np.asarray(uniques, dtype=object), 0, PAD_TOKEN)
            pool2global = pool2global + 1  # reserve 0 for [PAD]
            offsets = np.cumsum([0] + [len(p) for p in pools])
            parts = [pool2global[off + codes]
                     for (codes, _), off in zip(token_pairs, offsets[:-1])]
            # when entity ids from network feats extend a core id space
            # (e.g. KG entities aliased onto items), the core fields keep the
            # compact vocab [0, max core id] while network fields see the full
            # extended vocab (reference dataset.py:436-460)
            has_network = not all(is_core)
            core_vocab_size = len(tokens)
            if has_network and any(is_core):
                core_max = 0
                for part, core in zip(parts, is_core):
                    if core and len(part):
                        core_max = max(core_max, int(part.max()))
                core_vocab_size = core_max + 1
            for field in members:
                if field not in self.field2tokens:
                    field_is_core = any(
                        f == field and core for (_, f), core in zip(columns, is_core))
                    # field2token2idx derives lazily from these entries
                    if has_network and field_is_core:
                        self.field2tokens[field] = tokens[:core_vocab_size]
                    else:
                        self.field2tokens[field] = tokens
            for (feat, field), codes_part in zip(columns, parts):
                if self.field2type[field].endswith("seq"):
                    lens = feat[field].map(len).values
                    sp = np.cumsum(lens)[:-1]
                    feat[field] = pd.Series(np.split(codes_part, sp), index=feat.index) \
                        if len(feat) else feat[field]
                else:
                    feat[field] = codes_part

    def _post_preprocess(self):
        self._prepare_user_item_feat()

    def _prepare_user_item_feat(self):
        """Reindex user/item feature tables by id so row i = entity id i."""
        if self.user_feat is not None and self.fuid is not None:
            self.user_feat = self.user_feat.set_index(self.fuid) \
                .reindex(np.arange(self.num_users)).reset_index()
            self._fill_nan(self.user_feat)
        elif self.fuid is not None:
            self.user_feat = pd.DataFrame({self.fuid: np.arange(self.num_users)})
        if self.item_feat is not None and self.fiid is not None:
            self.item_feat = self.item_feat.set_index(self.fiid) \
                .reindex(np.arange(self.num_items)).reset_index()
            self._fill_nan(self.item_feat)
        elif self.fiid is not None:
            self.item_feat = pd.DataFrame({self.fiid: np.arange(self.num_items)})

    def _fill_nan(self, feat: pd.DataFrame):
        for col in feat.columns:
            t = self.field2type.get(col, "float")
            if t == "token":
                feat[col] = feat[col].fillna(0).astype(np.int64)
            elif t.endswith("seq"):
                feat[col] = feat[col].map(lambda v: v if isinstance(v, (list, np.ndarray)) else [])
            else:
                feat[col] = feat[col].fillna(0.0)

    # ------------------------------------------------------------------
    # sizes
    # ------------------------------------------------------------------
    def num_values(self, field: str) -> int:
        if field in self.field2tokens:
            return len(self.field2tokens[field])
        return 1

    @property
    def num_users(self) -> int:
        return self.num_values(self.fuid)

    @property
    def num_items(self) -> int:
        return self.num_values(self.fiid)

    @property
    def num_inters(self) -> int:
        return len(self.inter_feat)

    def __len__(self) -> int:
        return len(self.data_index) if self.data_index is not None else len(self.inter_feat)

    # ------------------------------------------------------------------
    # build / split
    # ------------------------------------------------------------------
    def build(self, binarized_rating_thres: float = None, fmeval: bool = False,
              neg_count: int = None, sampler: str = None, shuffle: bool = True,
              split_mode: str = "user_entry", split_ratio=None, **kwargs):
        if split_ratio is None:
            split_ratio = [0.8, 0.1, 0.1]
        self.fmeval = fmeval
        self.split_mode = split_mode
        self._init_sampler(sampler, neg_count)
        return self._build(split_ratio, shuffle, split_mode, False, binarized_rating_thres)

    def _init_sampler(self, dataset_sampler, dataset_neg_count):
        self.neg_count = dataset_neg_count
        self.sampler = dataset_sampler
        if self.sampler is not None:
            assert self.sampler == "uniform", "dataset-side sampler only supports 'uniform'"
            assert self.neg_count is not None

    def _binarize_rating(self, thres: float):
        neg = self.inter_feat[self.frating] < thres
        self.inter_feat[self.frating] = 1.0
        self.inter_feat.loc[neg, self.frating] = 0.0

    def _build(self, ratio_or_num, shuffle: bool, split_mode: str, rep: bool,
               binarized_rating_thres=None):
        if binarized_rating_thres is not None:
            self._binarize_rating(binarized_rating_thres)
        if not hasattr(self, "first_item_idx") and self.fuid is not None and self.fiid is not None:
            self.first_item_idx = ~self.inter_feat.duplicated(
                subset=[self.fuid, self.fiid], keep="first")
        if self.drop_dup and not rep:
            self.inter_feat = self.inter_feat[self.first_item_idx.values].reset_index(drop=True)
            self.first_item_idx = self.first_item_idx[self.first_item_idx].reset_index(drop=True)

        if split_mode in ("user_entry", "user"):
            if self.fuid is None:
                raise ValueError("split_mode user/user_entry requires a user id field")
            sort_keys = [self.fuid] + ([self.ftime] if self.ftime and self.ftime in self.inter_feat else [])
            order = self.inter_feat.sort_values(by=sort_keys, kind="mergesort").index.values
            self.inter_feat = self.inter_feat.iloc[order].reset_index(drop=True)
            if hasattr(self, "first_item_idx"):
                self.first_item_idx = self.first_item_idx.iloc[order].reset_index(drop=True)

        if split_mode == "user_entry":
            user_count = self.inter_feat[self.fuid].groupby(
                self.inter_feat[self.fuid], sort=False).count()
            if shuffle:
                cumsum = np.hstack([[0], user_count.cumsum().iloc[:-1]])
                idx = np.concatenate([np.random.permutation(c) + s
                                      for s, c in zip(cumsum, user_count)])
                self.inter_feat = self.inter_feat.iloc[idx].reset_index(drop=True)
                if hasattr(self, "first_item_idx"):
                    self.first_item_idx = self.first_item_idx.iloc[idx].reset_index(drop=True)
        elif split_mode == "entry":
            if isinstance(ratio_or_num, list) and len(ratio_or_num) and isinstance(ratio_or_num[0], int) \
                    and self.fuid is not None:
                user_count = self.inter_feat[self.fuid].groupby(
                    self.inter_feat[self.fuid], sort=True).count()
            else:
                if shuffle:
                    self.inter_feat = self.inter_feat.sample(frac=1).reset_index(drop=True)
                user_count = pd.Series([len(self.inter_feat)])
        elif split_mode == "user":
            user_count = self.inter_feat[self.fuid].groupby(
                self.inter_feat[self.fuid], sort=False).count()
        else:
            raise ValueError(f"unknown split_mode {split_mode}")

        if isinstance(ratio_or_num, int):
            splits = self._split_by_leave_one_out(ratio_or_num, user_count, rep)
        elif isinstance(ratio_or_num, list) and len(ratio_or_num) and isinstance(ratio_or_num[0], float):
            splits = self._split_by_ratio(ratio_or_num, user_count, split_mode == "user")
        else:
            splits = self._split_by_num(ratio_or_num, user_count)

        self.dataframe2tensors()
        split_indices = self._get_data_idx(splits)
        datasets = [self._copy(idx) for idx in split_indices]
        # attach user history (train hist for train/val; train+val hist for test)
        if self.fuid is not None and self.fiid is not None:
            user_hist, user_count_ = datasets[0].get_hist(True)
            for d in datasets[:2]:
                d.user_hist, d.user_count = user_hist, user_count_
            if len(datasets) > 2:
                uh, uc = datasets[1].get_hist(True)
                width = user_hist.shape[1] + uh.shape[1]
                merged = np.zeros((user_hist.shape[0], width), dtype=user_hist.dtype)
                merged[:, :user_hist.shape[1]] = user_hist
                merged[:, user_hist.shape[1]:] = uh
                merged = -np.sort(-merged, axis=-1)
                maxlen = int((merged > 0).sum(axis=1).max()) if merged.size else 1
                datasets[-1].user_hist = merged[:, :max(maxlen, 1)]
                datasets[-1].user_count = user_count_ + uc
        return datasets

    def _split_by_ratio(self, ratio: List[float], data_count: pd.Series, user_mode: bool):
        m = len(data_count)
        counts = data_count.values
        if not user_mode:
            splits = np.outer(counts, ratio).astype(np.int32)
            splits[:, 0] = counts - splits[:, 1:].sum(axis=1)
            for i in range(1, len(ratio)):
                idx = (splits[:, -i] == 0) & (splits[:, 0] > 1)
                splits[idx, -i] += 1
                splits[idx, 0] -= 1
        else:
            idx = np.random.permutation(m)
            sp_ = (m * np.asarray(ratio)).astype(np.int32)
            sp_[0] = m - sp_[1:].sum()
            parts = np.split(idx, sp_.cumsum()[:-1])
            splits = np.zeros((m, len(ratio)), dtype=np.int32)
            for part_i, p in enumerate(parts):
                splits[p, part_i] = counts[p]
        splits = np.hstack([np.zeros((m, 1), dtype=np.int64), np.cumsum(splits, axis=1)])
        cumsum = np.hstack([[0], counts.cumsum()[:-1]])
        splits = cumsum.reshape(-1, 1) + splits
        return splits, (data_count.index.values if m > 1 else None)

    def _split_by_num(self, nums: List[int], data_count: pd.Series):
        m = len(data_count)
        splits = np.hstack([0, nums]).cumsum().reshape(1, -1)
        if splits[0][-1] != data_count.values.sum():
            raise ValueError(f"split nums {nums} must sum to {data_count.values.sum()}")
        return splits, (data_count.index.values if m > 1 else None)

    def _split_by_leave_one_out(self, leave_one_num: int, data_count: pd.Series, rep: bool = True):
        m = len(data_count)
        counts = data_count.values
        cum = counts.cumsum()[:-1]
        if rep:
            splits = np.ones((m, leave_one_num + 1), dtype=np.int64)
            splits[:, 0] = counts - leave_one_num
            for j in range(leave_one_num):
                idx = splits[:, 0] < 1
                splits[idx, 0] += 1
                splits[idx, j] -= 1  # same correction order as reference
            splits = np.hstack([np.zeros((m, 1), dtype=np.int64), np.cumsum(splits, axis=1)])
        else:
            rows = []
            for seg in np.split(self.first_item_idx.values, cum):
                idx = seg.nonzero()[0]
                if len(idx) > 2:
                    rows.append([0, idx[-2], idx[-1], len(seg)])
                elif len(idx) == 2:
                    rows.append([0, idx[-1], idx[-1], len(seg)])
                else:
                    rows.append([0, len(seg), len(seg), len(seg)])
            splits = np.asarray(rows, dtype=np.int64)
        cum0 = np.hstack([[0], cum])
        splits = cum0.reshape(-1, 1) + splits
        return splits, (data_count.index.values if m > 1 else None)

    def _get_data_idx(self, splits):
        """Train view -> flat interaction indices; eval views -> (uid,start,end) rows."""
        splits, uids = splits
        pairs = [list(zip(splits[:, i - 1], splits[:, i])) for i in range(1, splits.shape[1])]
        if not self.fmeval:
            if uids is not None:
                out = [np.concatenate([np.arange(s, e) for s, e in pairs[0]]) if pairs[0] else
                       np.array([], dtype=np.int64)]
                for p in pairs[1:]:
                    rows = [[u, s, e] for u, (s, e) in zip(uids, p) if e > s]
                    out.append(np.asarray(rows, dtype=np.int64).reshape(-1, 3))
                return out
            else:
                out = [np.concatenate([np.arange(s, e) for s, e in pairs[0]])]
                fuid_col = self.inter_feat.get_col(self.fuid)
                for p in pairs[1:]:
                    s, e = p[0]
                    seg = np.asarray(fuid_col[s:e])
                    # consecutive-group boundaries (like unique_consecutive)
                    bounds = np.hstack([[0], np.flatnonzero(seg[1:] != seg[:-1]) + 1])
                    starts = bounds + s
                    ends = np.hstack([bounds[1:], [len(seg)]]) + s
                    out.append(np.stack([seg[bounds], starts, ends], axis=1).astype(np.int64))
                return out
        else:
            return [np.concatenate([np.arange(s, e) for s, e in p]) for p in pairs]

    def dataframe2tensors(self):
        pad_to = {f: self.field2maxlen.get(f) for f, t in self.field2type.items()
                  if t.endswith("seq")}
        fm = self.config.get("field_max_len") or {}
        for f in pad_to:
            if f in fm:
                pad_to[f] = fm[f]
        self.inter_feat = Frame.from_pandas(self.inter_feat, self.field2type, pad_to)
        if self.user_feat is not None and isinstance(self.user_feat, pd.DataFrame):
            self.user_feat = Frame.from_pandas(self.user_feat, self.field2type, pad_to)
        if self.item_feat is not None and isinstance(self.item_feat, pd.DataFrame):
            self.item_feat = Frame.from_pandas(self.item_feat, self.field2type, pad_to)
        self.network_feat = [Frame.from_pandas(nf, self.field2type, pad_to)
                             if isinstance(nf, pd.DataFrame) else nf
                             for nf in self.network_feat]

    def _copy(self, idx: np.ndarray):
        d = copy.copy(self)
        d.data_index = idx
        return d

    # ------------------------------------------------------------------
    # histories / frequencies
    # ------------------------------------------------------------------
    @property
    def inter_feat_subset(self) -> np.ndarray:
        if self.data_index is not None and self.data_index.ndim > 1:
            return np.concatenate([np.arange(s, e)
                                   for s, e in zip(self.data_index[:, 1], self.data_index[:, 2])])
        return self.data_index

    def get_hist(self, is_user: bool = True):
        """Padded per-entity history matrix + counts over this split's rows."""
        sub = self.inter_feat_subset
        users = self.inter_feat.get_col(self.fuid)[sub]
        items = self.inter_feat.get_col(self.fiid)[sub]
        key, val = (users, items) if is_user else (items, users)
        n = self.num_users if is_user else self.num_items
        order = np.argsort(key, kind="stable")
        key_s, val_s = key[order], val[order]
        counts = np.bincount(key_s, minlength=n)
        width = max(int(counts.max()) if counts.size else 1, 1)
        hist = np.zeros((n, width), dtype=np.int32)
        offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(counts, out=offs[1:])
        pos = np.arange(len(key_s)) - offs[key_s]
        hist[key_s, pos] = val_s
        return hist, counts.astype(np.int64)

    @property
    def item_freq(self) -> np.ndarray:
        sub = self.inter_feat_subset
        items = self.inter_feat.get_col(self.fiid)[sub]
        return np.bincount(items, minlength=self.num_items).astype(np.int64)

    def get_network_field(self, network_id: int, feat_id: int, field_id: int) -> str:
        # fail fast with guidance: kg/social models call this before touching
        # self.network_feat[network_id], and the stock dataset configs ship
        # with network_feat_name disabled (reference ml-100k.yaml:30 keeps it
        # commented out too) — without the guard the model dies later with a
        # bare IndexError
        if network_id >= len(self.network_feat):
            raise ValueError(
                f"this model needs network feature #{network_id} (a knowledge"
                f" graph / social network), but dataset '{self.name}' was"
                f" built with {len(self.network_feat)} network feature(s)."
                " Enable it in the data config: set network_feat_name (e.g."
                " [[social.txt], [ml-100k.kg, ml-100k.link]] for ml-100k —"
                " see the commented block in data/config/ml-100k.yaml and"
                " tests/test_zoo.py::KG_DATA)")
        return parse_field(self.config["network_feat_field"][network_id][feat_id][field_id]).name

    def get_graph(self, idx=0, form="coo", value_fields=None, bidirectional=False,
                  row_offset=0, col_offset=0, shape=None):
        """Interaction / network graph as scipy sparse (reference dataset.py:575-643)."""
        import scipy.sparse as ssp
        if isinstance(idx, int):
            idx = [idx]
        rows_all, cols_all, vals_all = [], [], []
        num_rows = num_cols = 0
        for g in idx:
            if g == 0:
                sub = self.inter_feat_subset
                rows = self.inter_feat.get_col(self.fuid)[sub].astype(np.int64)
                cols = self.inter_feat.get_col(self.fiid)[sub].astype(np.int64)
                num_rows, num_cols = self.num_users, self.num_items
            else:
                net = self.network_feat[g - 1]
                f0, f1 = net.fields[0], net.fields[-1]
                rows = net.get_col(f0).astype(np.int64)
                cols = net.get_col(f1).astype(np.int64)
                num_rows = num_cols = max(rows.max(), cols.max()) + 1
            rows = rows + row_offset
            cols = cols + col_offset
            vals = np.ones(len(rows), dtype=np.float32)
            if bidirectional:
                rows, cols = np.concatenate([rows, cols]), np.concatenate([cols, rows])
                vals = np.concatenate([vals, vals])
            rows_all.append(rows); cols_all.append(cols); vals_all.append(vals)
        rows = np.concatenate(rows_all); cols = np.concatenate(cols_all)
        vals = np.concatenate(vals_all)
        if shape is None:
            shape = (num_rows + row_offset, num_cols + col_offset)
        mat = ssp.coo_matrix((vals, (rows, cols)), shape=shape)
        return mat.tocsr() if form == "csr" else mat

    # ------------------------------------------------------------------
    # batching
    # ------------------------------------------------------------------
    def _fields_of(self, frame: Frame) -> List[str]:
        return [f for f in frame.fields if f in self._use_field]

    def _gather_entity_feats(self, batch: Dict[str, np.ndarray]):
        """Merge user/item side features for ids already present in the batch."""
        if self.fuid in batch and self.user_feat is not None:
            for f in self._fields_of(self.user_feat):
                if f != self.fuid and f not in batch:
                    batch[f] = self.user_feat.get_col(f)[batch[self.fuid]]
        if self.fiid in batch and self.item_feat is not None:
            for f in self._fields_of(self.item_feat):
                if f != self.fiid and f not in batch:
                    batch[f] = self.item_feat.get_col(f)[batch[self.fiid]]
        return batch

    def _rating_fields(self) -> List[str]:
        return self.frating if isinstance(self.frating, list) else [self.frating]

    def _get_pos_batch(self, idx: np.ndarray) -> Dict[str, np.ndarray]:
        if self.data_index.ndim > 1:
            rows = self.data_index[idx]
            batch = {self.fuid: rows[:, 0].astype(np.int32)}
            if self.user_feat is not None:
                for f in self._fields_of(self.user_feat):
                    if f != self.fuid:
                        batch[f] = self.user_feat.get_col(f)[rows[:, 0]]
            starts, ends = rows[:, 1], rows[:, 2]
            width = self._eval_target_width()
            gather = starts[:, None] + np.arange(width)[None, :]
            valid = gather < ends[:, None]
            gather = np.where(valid, gather, 0)
            fiid_col = self.inter_feat.get_col(self.fiid)
            batch[self.fiid] = np.where(valid, fiid_col[gather], 0).astype(np.int32)
            for r in self._rating_fields():
                rcol = self.inter_feat.get_col(r)
                batch[r] = np.where(valid, rcol[gather], 0).astype(np.float32)
        else:
            rows = self.data_index[idx]
            batch = {}
            for f in self._fields_of(self.inter_feat):
                batch[f] = self.inter_feat.get_col(f)[rows]
            batch = self._gather_entity_feats(batch)
        return batch

    def _eval_target_width(self) -> int:
        if not hasattr(self, "_target_width"):
            self._target_width = int((self.data_index[:, 2] - self.data_index[:, 1]).max())
        return self._target_width

    def _get_neg_batch(self, batch: Dict[str, np.ndarray], rng: np.random.Generator):
        """Dataset-side uniform negatives: flatten to B*(1+neg) rows, rating=0."""
        bsz = len(batch[self.fuid])
        hist = self.user_hist[batch[self.fuid]]
        neg = _np_masked_uniform(rng, bsz, self.num_items, self.neg_count, hist)
        neg = neg.T.reshape(-1)  # [neg*B]
        neg_feats = {self.fiid: neg.astype(np.int32)}
        if self.item_feat is not None:
            for f in self._fields_of(self.item_feat):
                if f != self.fiid:
                    neg_feats[f] = self.item_feat.get_col(f)[neg]
        out = {}
        for k, v in batch.items():
            if k in neg_feats:
                out[k] = np.concatenate([v, neg_feats[k]], axis=0)
            elif k in self._rating_fields():
                out[k] = np.concatenate([v, np.zeros(len(neg), dtype=v.dtype)], axis=0)
            else:
                reps = (self.neg_count + 1,) + (1,) * (v.ndim - 1)
                out[k] = np.tile(v, reps)
        return out

    def train_loader(self, batch_size: int, shuffle: bool = True, drop_last: bool = False,
                     rng: Optional[np.random.Generator] = None, **kwargs):
        self.eval_mode = False
        return _BatchIterator(self, batch_size, shuffle, drop_last,
                              rng or np.random.default_rng())

    def eval_loader(self, batch_size: int, sort_by_len: bool = False, **kwargs):
        """Evaluation loader. ``sort_by_len=True`` orders samples by sequence
        length (the reference's SortedDataSampler, data/dataset.py:1737-1786):
        with static-shape padded batches this groups equal-length rows so the
        per-batch valid fraction is maximal; metric sums are order-invariant."""
        self.eval_mode = True
        order = None
        if sort_by_len and self.data_index is not None and self.data_index.ndim > 1:
            order = np.argsort(self.sample_length, kind="stable")[::-1].copy()
        return _BatchIterator(self, batch_size, shuffle=False, drop_last=False,
                              rng=np.random.default_rng(), order=order)

    def loader(self, batch_size, shuffle=True, drop_last=False, **kwargs):
        return _BatchIterator(self, batch_size, shuffle, drop_last, np.random.default_rng())

    def _make_batch(self, idx: np.ndarray, rng: np.random.Generator) -> Dict[str, np.ndarray]:
        batch = self._get_pos_batch(idx)
        if self.eval_mode and self.fuid is not None and not self.fmeval and "user_hist" not in batch:
            batch["user_hist"] = self.user_hist[batch[self.fuid]].astype(np.int32)
        elif getattr(self, "neg_count", None):
            batch = self._get_neg_batch(batch, rng)
        return batch

    @property
    def sample_length(self):
        if self.data_index.ndim > 1:
            return self.data_index[:, 2] - self.data_index[:, 1]
        raise ValueError("sample_length undefined for flat datasets")


def _np_masked_uniform(rng: np.random.Generator, bsz: int, num_items: int,
                       num_neg: int, hist: Optional[np.ndarray]) -> np.ndarray:
    """Uniform ids in [1, num_items), rejecting user-history hits (few rounds)."""
    neg = rng.integers(1, num_items, size=(bsz, num_neg), dtype=np.int64)
    if hist is not None and hist.size:
        srt = np.sort(hist, axis=1)
        for _ in range(3):
            idx = np.stack([np.searchsorted(srt[b], neg[b]) for b in range(bsz)])
            idx = np.minimum(idx, srt.shape[1] - 1)
            bad = np.take_along_axis(srt, idx, axis=1) == neg
            if not bad.any():
                break
            neg[bad] = rng.integers(1, num_items, size=int(bad.sum()), dtype=np.int64)
    return neg


class _BatchIterator:
    """Fixed-shape batch iterator over a split view.

    Training: tail batch is filled by wrapping to the epoch head (all batches
    are exactly ``batch_size``). Evaluation: tail is padded with row 0 and
    ``_size`` records the true row count for exact weighted metrics.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool, drop_last: bool,
                 rng: np.random.Generator, order: Optional[np.ndarray] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = rng
        self.order = order

    def __len__(self):
        n = len(self.dataset.data_index)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self.dataset.data_index)
        order = self.order if self.order is not None else np.arange(n)
        if self.shuffle:
            order = order.copy()
            self.rng.shuffle(order)
        bs = self.batch_size
        for start in range(0, n, bs):
            idx = order[start:start + bs]
            true_size = len(idx)
            if true_size < bs:
                if self.drop_last:
                    return
                if self.dataset.eval_mode:
                    pad = np.zeros(bs - true_size, dtype=idx.dtype)
                else:
                    pad = order[: bs - true_size]
                idx = np.concatenate([idx, pad])
            batch = self.dataset._make_batch(idx, self.rng)
            batch["_size"] = np.asarray(true_size if self.dataset.eval_mode else bs,
                                        dtype=np.int32)
            yield batch


# ==========================================================================
# UserDataset: one user per sample; `in_` fields = training history,
# targets = the user's held-out items (AutoEncoder models). Reference
# dataset.py:1278-1366.
# ==========================================================================
class UserDataset(TripletDataset):

    def _init_common_field(self):
        super()._init_common_field()
        if self.fuid is None:
            raise ValueError("UserDataset requires a user id field")

    def build(self, binarized_rating_thres=None, fmeval=False, neg_count=None,
              sampler=None, shuffle=True, split_mode="user_entry", split_ratio=None, **kwargs):
        if split_ratio is None:
            split_ratio = [0.8, 0.1, 0.1]
        self.split_mode = split_mode
        self._init_sampler(sampler, neg_count)
        return self._build(split_ratio, shuffle, split_mode, False, binarized_rating_thres)

    def _get_data_idx(self, splits):
        splits, uids = splits
        if self.split_mode == "user_entry":
            mask = splits[:, 1] < splits[:, 2]
            splits, uids = splits[mask], uids[mask]
        out = []
        first = np.stack([uids, splits[:, 0], splits[:, 1]], axis=1)
        for i in range(1, splits.shape[1]):
            cur = np.stack([uids, splits[:, i - 1], splits[:, i]], axis=1)
            out.append(np.concatenate([first, cur], axis=1).astype(np.int64))
        return out

    def _in_width(self) -> int:
        if not hasattr(self, "_in_width_"):
            self._in_width_ = int((self.data_index[:, 2] - self.data_index[:, 1]).max())
        return self._in_width_

    def _eval_target_width(self) -> int:
        if not hasattr(self, "_target_width"):
            self._target_width = int((self.data_index[:, 5] - self.data_index[:, 4]).max())
        return self._target_width

    def _window(self, starts, ends, width):
        gather = starts[:, None] + np.arange(width)[None, :]
        valid = gather < ends[:, None]
        return np.where(valid, gather, 0), valid

    def _get_pos_batch(self, idx: np.ndarray) -> Dict[str, np.ndarray]:
        rows = self.data_index[idx]
        batch = {self.fuid: rows[:, 0].astype(np.int32)}
        if self.user_feat is not None:
            for f in self._fields_of(self.user_feat):
                if f != self.fuid:
                    batch[f] = self.user_feat.get_col(f)[rows[:, 0]]
        fiid_col = self.inter_feat.get_col(self.fiid)
        for prefix, (cs, ce), width in [("in_", (1, 2), self._in_width()),
                                        ("", (4, 5), self._eval_target_width())]:
            gather, valid = self._window(rows[:, cs], rows[:, ce], width)
            iid_win = np.where(valid, fiid_col[gather], 0).astype(np.int32)
            batch[prefix + self.fiid] = iid_win
            for r in self._rating_fields():
                rcol = self.inter_feat.get_col(r)
                batch[prefix + r] = np.where(valid, rcol[gather], 0).astype(np.float32)
            if self.item_feat is not None:
                for f in self._fields_of(self.item_feat):
                    if f != self.fiid:
                        # join by the windowed ITEM ids (0 = pad row)
                        col = self.item_feat.get_col(f)
                        batch[prefix + f] = np.where(valid, col[iid_win], 0)
        return batch

    def _make_batch(self, idx, rng):
        batch = self._get_pos_batch(idx)
        if self.eval_mode and "user_hist" not in batch:
            batch["user_hist"] = batch["in_" + self.fiid]
        elif getattr(self, "neg_count", None):
            batch = self._get_neg_batch(batch, rng)
        return batch

    def device_epoch_arrays(self):
        """Compact scan-epoch staging (see SeqDataset.device_epoch_arrays):
        user histories are CONTIGUOUS runs of the user/time-sorted
        inter_feat, so the [B, width] history/target windows are per-row
        dynamic_slice reads of padded raw columns — the host-expanded
        [n_users, max_hist] staging is max_hist× the raw split."""
        import jax.numpy as jnp

        Win, Wtgt = self._in_width(), self._eval_target_width()
        pad = max(Win, Wtgt)
        fuid, fiid = self.fuid, self.fiid
        compact = {"_rows": self.data_index.astype(np.int32)}
        col = self.inter_feat.get_col(fiid).astype(np.int32)
        compact["_fiid"] = np.concatenate([col, np.zeros(pad, np.int32)])
        for r in self._rating_fields():
            rcol = self.inter_feat.get_col(r).astype(np.float32)
            compact["_rat_" + r] = np.concatenate(
                [rcol, np.zeros(pad, np.float32)])
        if self.user_feat is not None:
            for f in self._fields_of(self.user_feat):
                if f != fuid:
                    compact["_user_" + f] = self.user_feat.get_col(f)
        if self.item_feat is not None:
            for f in self._fields_of(self.item_feat):
                if f != fiid:
                    compact["_item_" + f] = self.item_feat.get_col(f)

        def batch_fn(arrays, sel):
            import jax
            rows = arrays["_rows"].at[sel].get(mode="promise_in_bounds")
            batch = {fuid: rows[:, 0]}
            for k, v in arrays.items():
                if k.startswith("_user_"):
                    batch[k[6:]] = v.at[rows[:, 0]].get(mode="promise_in_bounds")
            for prefix, (cs, ce), width in [("in_", (1, 2), Win),
                                            ("", (4, 5), Wtgt)]:
                starts, ends = rows[:, cs], rows[:, ce]
                valid = (starts[:, None] + jnp.arange(
                    width, dtype=starts.dtype)[None, :]) < ends[:, None]
                # vmapped dynamic_slice, NOT an elementwise [B, width]
                # gather: profiled on-chip (2026-08-20, L=200/B=1024) the
                # slice form lowers to a per-example loop of contiguous
                # 800 B DMAs at ~1.2 ms/step while the flat-gather form
                # costs ~5.1 ms — TPU 1-D elementwise gathers fetch ~one
                # int32 per transaction (~25 ns/elem)
                window = jax.vmap(
                    lambda c, s: jax.lax.dynamic_slice(c, (s,), (width,)),
                    in_axes=(None, 0))
                iid_win = jnp.where(valid, window(arrays["_fiid"], starts), 0) \
                    .astype(jnp.int32)
                batch[prefix + fiid] = iid_win
                for k, v in arrays.items():
                    if k.startswith("_rat_"):
                        batch[prefix + k[5:]] = jnp.where(
                            valid, window(v, starts), 0).astype(jnp.float32)
                    elif k.startswith("_item_"):
                        got = v.at[iid_win].get(mode="promise_in_bounds")
                        batch[prefix + k[6:]] = jnp.where(valid, got, 0)
            return batch

        return compact, batch_fn

    @property
    def inter_feat_subset(self):
        return np.concatenate([np.arange(s, e)
                               for s, e in zip(self.data_index[:, -2], self.data_index[:, -1])])


# ==========================================================================
# SeqDataset: sliding-window causal sequences. Reference dataset.py:1369-1445.
# ==========================================================================
class SeqDataset(TripletDataset):

    def _init_common_field(self):
        super()._init_common_field()
        if self.fuid is None:
            raise ValueError("SeqDataset requires a user id field")

    @property
    def drop_dup(self):
        return False

    def build(self, binarized_rating_thres=None, fmeval=False, neg_count=None,
              sampler=None, shuffle=True, split_mode="user_entry", split_ratio=2,
              test_rep=True, train_rep=True, **kwargs):
        self.test_rep = test_rep
        self.train_rep = train_rep and test_rep
        self.split_mode = split_mode
        self._init_sampler(sampler, neg_count)
        return self._build(split_ratio, False, split_mode, test_rep, binarized_rating_thres)

    @property
    def max_seq_len(self) -> int:
        return int(self.config.get("max_seq_len") or 20)

    def _get_data_idx(self, splits):
        splits, uids = splits
        maxlen = self.max_seq_len
        outs = [[] for _ in range(splits.shape[1] - 1)]
        for sp, u in zip(splits, uids):
            rel = sp - sp[0]
            rows = np.array([[u, max(sp[0], i - maxlen), i]
                             for i in range(sp[0] + 1, sp[-1])], dtype=np.int64)
            parts = np.split(rows, rel[1:-1] - 1)
            for k, p in enumerate(parts):
                outs[k].append(p)
        outs = [np.concatenate(o) if o else np.zeros((0, 3), dtype=np.int64) for o in outs]
        if hasattr(self, "first_item_idx"):
            fii = self.first_item_idx.values
            result = []
            for k, part in enumerate(outs):
                keep_rep = self.train_rep if k == 0 else self.test_rep
                result.append(part if keep_rep else part[fii[part[:, -1]]])
            outs = result
        return outs

    def _get_pos_batch(self, idx: np.ndarray) -> Dict[str, np.ndarray]:
        rows = self.data_index[idx]
        starts, ends = rows[:, 1], rows[:, 2]
        lens = (ends - starts).astype(np.int32)
        batch = {self.fuid: rows[:, 0].astype(np.int32), "seqlen": lens}
        if self.user_feat is not None:
            for f in self._fields_of(self.user_feat):
                if f != self.fuid:
                    batch[f] = self.user_feat.get_col(f)[rows[:, 0]]
        L = self.max_seq_len
        gather = starts[:, None] + np.arange(L)[None, :]
        valid = gather < ends[:, None]
        gather = np.where(valid, gather, 0)
        # source (history window) fields, prefixed in_
        for f in self._fields_of(self.inter_feat):
            if f == self.fuid:
                continue
            col = self.inter_feat.get_col(f)
            batch["in_" + f] = np.where(valid, col[gather], 0).astype(col.dtype)
        if self.item_feat is not None:
            in_iid = batch.get("in_" + self.fiid)
            for f in self._fields_of(self.item_feat):
                if f != self.fiid and in_iid is not None:
                    col = self.item_feat.get_col(f)
                    batch["in_" + f] = np.where(valid, col[in_iid], 0)
        # target fields (position `end`)
        tgt = ends  # target row index == end (exclusive bound points at target)
        for f in self._fields_of(self.inter_feat):
            if f == self.fuid:
                continue
            batch[f] = self.inter_feat.get_col(f)[tgt]
        if self.item_feat is not None:
            for f in self._fields_of(self.item_feat):
                if f != self.fiid:
                    batch[f] = self.item_feat.get_col(f)[batch[self.fiid]]
        return batch

    @property
    def inter_feat_subset(self):
        di = self.data_index
        user_first = di[di[:, 2] - di[:, 1] == 1][:, 1]
        return np.concatenate([user_first, di[:, 2]])

    def device_epoch_arrays(self):
        """Compact device-resident staging for scan epochs.

        ``_get_pos_batch`` expands each example into its [L] history window —
        an L× blowup of the raw split that the host assembles and ships to
        the device ([n, L] per field; ~2.4 GiB and ~17 min over a tunneled
        runtime at 1M interactions, L=200). The raw interaction columns are
        only a few MB, and the window gather is a trivial device op — so
        stage the COMPACT columns + data_index and let the scan body expand
        each batch on device. Returns ``(host_arrays, batch_fn)`` where
        ``batch_fn(device_arrays, sel)`` reproduces ``_get_pos_batch(sel)``
        in jnp.
        """
        import jax.numpy as jnp

        L = self.max_seq_len
        fuid, fiid = self.fuid, self.fiid
        compact = {"_rows": self.data_index.astype(np.int32)}
        # Pack ALL interaction columns into ONE [n+L, C] int32 matrix
        # (float32 columns ride as bit patterns): each example's history
        # window becomes a SINGLE contiguous [L, C] dynamic_slice DMA
        # instead of one serialized slice-loop PER FIELD — profiled at
        # L=200/B=1024 the per-field loops (fiid + rating) were ~2.4 ms of
        # a 13 ms SASRec step (while.13 + 2x1024 dynamic-slices/step).
        # L zeros of tail padding keep every window read unclamped.
        packed_cols, f_float = [], {}
        for f in self._fields_of(self.inter_feat):
            if f != fuid:
                col = self.inter_feat.get_col(f)
                if np.issubdtype(col.dtype, np.floating):
                    f_float[f] = True
                    col = col.astype(np.float32).view(np.int32)
                else:
                    f_float[f] = False
                    col = col.astype(np.int32)
                packed_cols.append((f, np.concatenate(
                    [col, np.zeros(L, dtype=np.int32)])))
        pack_fields = [f for f, _ in packed_cols]
        compact["_interpack"] = np.stack(
            [c for _, c in packed_cols], axis=1)
        if self.user_feat is not None:
            for f in self._fields_of(self.user_feat):
                if f != fuid:
                    compact["_user_" + f] = self.user_feat.get_col(f)
        if self.item_feat is not None:
            for f in self._fields_of(self.item_feat):
                if f != fiid:
                    compact["_item_" + f] = self.item_feat.get_col(f)

        def batch_fn(arrays, sel):
            import jax
            rows = arrays["_rows"].at[sel].get(mode="promise_in_bounds")
            u, starts, ends = rows[:, 0], rows[:, 1], rows[:, 2]
            batch = {fuid: u, "seqlen": (ends - starts).astype(jnp.int32)}
            for k, v in arrays.items():
                if k.startswith("_user_"):
                    batch[k[6:]] = v.at[u].get(mode="promise_in_bounds")
            valid = (starts[:, None]
                     + jnp.arange(L, dtype=starts.dtype)[None, :]) < ends[:, None]
            # ONE vmapped dynamic_slice over the packed [n+L, C] matrix,
            # NOT an elementwise [B, L] gather and NOT one slice-loop per
            # field: the slice form is a loop of contiguous DMAs (~1.2
            # ms/step/field at L=200/B=1024) vs ~5.1 ms for the flat
            # gather, and packing C fields into one [L, C] row block
            # divides the loop count by C (measured on-chip 2026-08-21)
            C = len(pack_fields)
            mat = arrays["_interpack"]
            wins = jax.vmap(
                lambda s: jax.lax.dynamic_slice(mat, (s, 0), (L, C)))(starts)
            def unpack(x, f):
                if f_float[f]:
                    x = jax.lax.bitcast_convert_type(x, jnp.float32)
                    return jnp.where(valid, x, 0.0)
                return jnp.where(valid, x, 0)
            in_iid = None
            for c, f in enumerate(pack_fields):
                batch["in_" + f] = unpack(wins[:, :, c], f)
                if f == fiid:
                    in_iid = batch["in_" + f]
            for k, v in arrays.items():
                if k.startswith("_item_") and in_iid is not None:
                    win = v.at[in_iid].get(mode="promise_in_bounds")
                    batch["in_" + k[6:]] = jnp.where(valid, win, 0)
            tgt = mat.at[ends].get(mode="promise_in_bounds")   # [B, C]
            for c, f in enumerate(pack_fields):
                x = tgt[:, c]
                batch[f] = (jax.lax.bitcast_convert_type(x, jnp.float32)
                            if f_float[f] else x)
            if fiid in batch:
                for k, v in arrays.items():
                    if k.startswith("_item_"):
                        batch[k[6:]] = v.at[batch[fiid]].get(
                            mode="promise_in_bounds")
            return batch

        return compact, batch_fn


# ==========================================================================
# FullSeqDataset: one truncated sequence per user per split. Reference
# dataset.py:1448-1460.
# ==========================================================================
class FullSeqDataset(SeqDataset):

    def _get_data_idx(self, splits):
        splits, uids = splits
        maxlen = self.max_seq_len
        outs = [[] for _ in range(splits.shape[1] - 1)]
        for sp, u in zip(splits, uids):
            sp = sp.copy()
            sp[1:] = sp[1:] - 1
            outs[0].append([[u, max(sp[0], sp[1] - maxlen), sp[1]]])
            for k, s in enumerate(sp[2:], start=1):
                outs[k].append([[u, max(s - maxlen, sp[0]), s]])
        return [np.concatenate(o).astype(np.int64) for o in outs]


# ==========================================================================
# SeqToSeqDataset: source window -> shifted target window (masked-prediction
# and contrastive models). Reference dataset.py:1463-1550.
# ==========================================================================
class SeqToSeqDataset(SeqDataset):

    def _get_data_idx(self, splits):
        splits, uids = splits
        maxlen = self.max_seq_len
        outs = [[] for _ in range(splits.shape[1] - 1)]
        for sp, u in zip(splits, uids):
            for k, i in enumerate(sp[1:]):
                s = max(sp[0], i - 1 - maxlen)
                if (i - 1) > s:
                    outs[k].append([[u, s, i - 1]])
        outs = [np.concatenate(o).astype(np.int64) if o else np.zeros((0, 3), dtype=np.int64)
                for o in outs]
        if hasattr(self, "first_item_idx"):
            fii = self.first_item_idx.values
            result = []
            for k, part in enumerate(outs):
                keep_rep = self.train_rep if k == 0 else self.test_rep
                result.append(part if keep_rep else part[fii[part[:, -1]]])
            outs = result
        return outs

    def _get_pos_batch(self, idx: np.ndarray) -> Dict[str, np.ndarray]:
        rows = self.data_index[idx]
        starts, ends = rows[:, 1], rows[:, 2]
        lens = (ends - starts).astype(np.int32)
        batch = {self.fuid: rows[:, 0].astype(np.int32), "seqlen": lens}
        if self.user_feat is not None:
            for f in self._fields_of(self.user_feat):
                if f != self.fuid:
                    batch[f] = self.user_feat.get_col(f)[rows[:, 0]]
        L = self.max_seq_len
        gather = starts[:, None] + np.arange(L)[None, :]
        valid = gather < ends[:, None]
        gather_src = np.where(valid, gather, 0)
        for f in self._fields_of(self.inter_feat):
            if f == self.fuid:
                continue
            col = self.inter_feat.get_col(f)
            batch["in_" + f] = np.where(valid, col[gather_src], 0).astype(col.dtype)
        if not self.eval_mode:
            gather_tgt = np.where(valid, gather + 1, 0)
            for f in self._fields_of(self.inter_feat):
                if f == self.fuid:
                    continue
                col = self.inter_feat.get_col(f)
                batch[f] = np.where(valid, col[gather_tgt], 0).astype(col.dtype)
        else:
            tgt = ends
            for f in self._fields_of(self.inter_feat):
                if f == self.fuid:
                    continue
                batch[f] = self.inter_feat.get_col(f)[tgt]
        return batch

    @property
    def inter_feat_subset(self):
        di = self.data_index
        return np.concatenate([np.arange(s, e + 1) for s, e in zip(di[:, 1], di[:, 2])])

    def device_epoch_arrays(self):
        """Compact scan-epoch staging (see SeqDataset.device_epoch_arrays) for
        the source-window -> shifted-target-window batch layout."""
        if self.eval_mode:   # train staging only; eval keeps the host path
            return None
        import jax.numpy as jnp

        L = self.max_seq_len
        fuid = self.fuid
        compact = {"_rows": self.data_index.astype(np.int32)}
        # Packed [n+L+1, C] int32 matrix (floats as bit patterns): one
        # contiguous [L+1, C] slice per example serves BOTH the source
        # window ([:L]) and the shifted target window ([1:]) for EVERY
        # field — see SeqDataset.device_epoch_arrays packing note.
        packed_cols, f_float = [], {}
        for f in self._fields_of(self.inter_feat):
            if f != fuid:
                col = self.inter_feat.get_col(f)
                if np.issubdtype(col.dtype, np.floating):
                    f_float[f] = True
                    col = col.astype(np.float32).view(np.int32)
                else:
                    f_float[f] = False
                    col = col.astype(np.int32)
                packed_cols.append((f, np.concatenate(
                    [col, np.zeros(L + 1, dtype=np.int32)])))
        pack_fields = [f for f, _ in packed_cols]
        compact["_interpack"] = np.stack(
            [c for _, c in packed_cols], axis=1)
        if self.user_feat is not None:
            for f in self._fields_of(self.user_feat):
                if f != fuid:
                    compact["_user_" + f] = self.user_feat.get_col(f)

        def batch_fn(arrays, sel):
            import jax
            rows = arrays["_rows"].at[sel].get(mode="promise_in_bounds")
            u, starts, ends = rows[:, 0], rows[:, 1], rows[:, 2]
            batch = {fuid: u, "seqlen": (ends - starts).astype(jnp.int32)}
            for k, v in arrays.items():
                if k.startswith("_user_"):
                    batch[k[6:]] = v.at[u].get(mode="promise_in_bounds")
            valid = (starts[:, None]
                     + jnp.arange(L, dtype=starts.dtype)[None, :]) < ends[:, None]
            # ONE vmapped dynamic_slice over the packed matrix per example
            # (contiguous [L+1, C] DMA), NOT an elementwise gather and NOT
            # one slice-loop per field (see SeqDataset note)
            C = len(pack_fields)
            mat = arrays["_interpack"]
            wins = jax.vmap(
                lambda s: jax.lax.dynamic_slice(mat, (s, 0), (L + 1, C)))(starts)
            for c, f in enumerate(pack_fields):
                win = wins[:, :, c]
                if f_float[f]:
                    win = jax.lax.bitcast_convert_type(win, jnp.float32)
                    batch["in_" + f] = jnp.where(valid, win[:, :L], 0.0)
                    batch[f] = jnp.where(valid, win[:, 1:], 0.0)
                else:
                    batch["in_" + f] = jnp.where(valid, win[:, :L], 0)
                    batch[f] = jnp.where(valid, win[:, 1:], 0)
            return batch

        return compact, batch_fn


class ChainedDataLoader:
    """Alternate among several loaders across epochs (reference
    data/dataset.py:1789-1809): epoch e draws from the loader selected by the
    ``nepoch`` schedule (e.g. nepoch=[2, 1] -> AABAAB...)."""

    def __init__(self, loaders: List, nepoch: Optional[List[int]] = None):
        self.loaders = list(loaders)
        nepoch = nepoch or [1] * len(self.loaders)
        self._schedule = np.concatenate(
            [np.full(int(n), i, dtype=np.int64) for i, n in enumerate(nepoch)])
        self._epoch = -1

    def _current(self):
        return self.loaders[self._schedule[max(self._epoch, 0) % len(self._schedule)]]

    def __len__(self):
        return len(self._current())

    def __iter__(self):
        self._epoch += 1
        return iter(self._current())


class CombinedLoaders:
    """Zip several loaders: each step yields the merged dict of one batch from
    every loader (reference data/dataset.py:1812-1835). The first loader
    drives the epoch length; shorter loaders restart when exhausted."""

    def __init__(self, loaders: List):
        self.loaders = list(loaders)

    def __len__(self):
        return len(self.loaders[0])

    def __iter__(self):
        self._iters = [iter(ld) for ld in self.loaders]
        return self

    def __next__(self):
        batch = next(self._iters[0])
        for i in range(1, len(self.loaders)):
            try:
                extra = next(self._iters[i])
            except StopIteration:
                self._iters[i] = iter(self.loaders[i])
                extra = next(self._iters[i])
            batch.update(extra)
        return batch
