"""Recommender: the abstract training engine.

TPU-first re-design of the reference trainer (recstudio/model/basemodel/
recommender.py:26-777). The torch design mutates an nn.Module in an eager
per-batch loop; here the engine is functional:

- the model's forward/loss is a **pure function** ``training_step(params,
  batch, rng, states)`` compiled once with ``jax.jit`` (buffers donated);
- per-epoch refresh work (item-vector cache, model-based sampler re-indexing,
  reference recommender.py:564-570) produces a ``states`` pytree passed into
  the jitted step, so index rebuilds never trigger recompilation;
- evaluation steps are jitted too and return **per-sample** metric values plus
  the true batch size, giving exact weighted epoch means on padded batches;
- device placement is implicit (jit targets TPU); ``train.accelerator: dp``
  shards the batch across local devices via a data-parallel mesh
  (see recstudio_tpu.parallel).

Hooks kept from the reference so the model zoo composes the same way:
``_init_model``, ``_set_data_field``, ``_get_dataset_class``,
``_get_loss_func``, ``_get_optimizers``, ``_get_train_loaders``,
``current_epoch_trainloaders``, ``training_step``, ``validation_step``,
``test_step``, ``training_epoch_end`` etc.
"""
from __future__ import annotations

import copy
import os
import pickle
import time
from contextlib import contextmanager
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ... import eval as eval_mod
from ...utils import (color_dict_normal, deep_update, get_base_model_config,
                      get_logger, root_key, seed_everything,
                      set_matmul_precision)
from ...utils.callbacks import EarlyStopping, SaveLastCallback
from ..init import init_parameters, zero_pad_rows_in_grads


def batch_to_device(batch: Dict[str, np.ndarray]) -> Dict[str, jax.Array]:
    return {k: jnp.asarray(v) for k, v in batch.items()}


class Recommender:
    def __init__(self, config: Dict = None, **kwargs):
        self.config = config if config is not None else get_base_model_config()
        if self.config["train"].get("seed") is not None:
            seed_everything(self.config["train"]["seed"])
        self._rng = root_key(self.config["train"].get("seed") or 0,
                             self.config["train"].get("rng_impl", "threefry"))
        self._rng_counter = 0
        self.embed_dim = self.config["model"]["embed_dim"]
        self.logger = get_logger()
        self.logged_metrics: Dict[str, Any] = {}
        self.retriever = kwargs.get("retriever", None)
        self.loss_fn = kwargs.get("loss", None)
        self.params = None
        self.opt_states: List[Any] = []
        self.states: Dict[str, Any] = {}
        self.ckpt_path = None
        self.run_mode = "light"
        self._kwargs_modules = kwargs

    # ------------------------------------------------------------------
    # RNG plumbing
    # ------------------------------------------------------------------
    def next_rng(self) -> jax.Array:
        self._rng_counter += 1
        return jax.random.fold_in(self._rng, self._rng_counter)

    # ------------------------------------------------------------------
    # hooks for subclasses / concrete models
    # ------------------------------------------------------------------
    @staticmethod
    def _get_dataset_class():
        raise NotImplementedError

    def _set_data_field(self, data):
        pass

    def _get_loss_func(self):
        return None

    def _init_model(self, train_data, drop_unused_field: bool = True):
        self._set_data_field(train_data)
        self.fields = set(train_data.use_field)
        self.frating = train_data.frating
        self.fuid = train_data.fuid
        self.fiid = train_data.fiid
        if drop_unused_field:
            pass  # Frames keep all columns; loaders only emit use_field
        self.item_feat = train_data.item_feat
        if self.item_feat is not None:
            self.item_fields = set(self.item_feat.fields).intersection(self.fields)
        else:
            self.item_fields = {self.fiid}
        self.neg_count = self.config["train"].get("negative_count")
        if self.loss_fn is None:
            import inspect
            if "train_data" in inspect.signature(self._get_loss_func).parameters:
                self.loss_fn = self._get_loss_func(train_data)
            else:
                self.loss_fn = self._get_loss_func()

    # ------------------------------------------------------------------
    # parameters
    # ------------------------------------------------------------------
    def _example_batch(self, train_data):
        """One small batch used to trace flax init."""
        loader = train_data.train_loader(batch_size=2, shuffle=False)
        batch = next(iter(loader))
        return batch_to_device(batch)

    def _init_parameter(self, train_data):
        # flax init runs eagerly — force the dense lookup route during init
        # (a2a needs a jit/manual-axes context; params are identical anyway)
        from ...parallel.embedding import set_a2a_lookup
        set_a2a_lookup(None)
        batch = self._example_batch(train_data)
        variables = self._init_variables(batch)
        if "params" in variables:
            params = variables["params"]
            aux = {k: v for k, v in variables.items() if k != "params"}
        else:
            params, aux = variables, {}
        method = self.config["train"].get("init_method") or "xavier_normal"
        init_range = self.config["train"].get("init_range", 0.02)
        self.params = init_parameters(params, self.next_rng(), method, init_range)
        self._mesh = self._maybe_make_mesh()
        lookup = str(self.config["train"].get("embedding_lookup")
                     or "gspmd").lower()
        use_a2a = (self._mesh is not None and self._mesh.shape["mp"] > 1
                   and lookup == "a2a")
        # set (or reset) the process-wide lookup route BEFORE any of this
        # model's jits trace; numerically both routes are identical
        set_a2a_lookup(self._mesh if use_a2a else None)
        if self._mesh is not None:
            from ...parallel import param_shardings
            shard_emb = self._mesh.shape["mp"] > 1
            self.params = jax.device_put(
                self.params, param_shardings(self.params, self._mesh,
                                             shard_embeddings=shard_emb))
            self.logger.info(
                f"mesh dp={self._mesh.shape['dp']} mp={self._mesh.shape['mp']}"
                + (" (embedding tables row-sharded)" if shard_emb else "")
                + (" [a2a dedup lookup active]" if use_a2a else ""))
        if aux:
            # non-param flax collections (e.g. batch_stats): kept in states and
            # recalibrated before evaluation (see _refresh_net_state)
            import flax
            self.states["net"] = flax.core.unfreeze(aux)

    def _init_variables(self, batch):
        raise NotImplementedError

    def _maybe_make_mesh(self):
        """Build the training mesh from ``train.mesh: {dp: N, mp: M}`` or the
        ``accelerator: dp`` shorthand. Parameters get sharded at init, so the
        optimizer state inherits the layout and GSPMD partitions every jitted
        step (batch over dp, row-sharded tables over mp) with XLA-inserted
        collectives — the reference's DDP/DataParallel replacement."""
        mesh_conf = self.config["train"].get("mesh")
        acc = str(self.config["train"].get("accelerator", "")).lower()
        if not mesh_conf and not (acc == "dp" and jax.device_count() > 1):
            return None
        from ...parallel import make_mesh
        if mesh_conf:
            dp = int(mesh_conf.get("dp", 0)) or None
            mp = int(mesh_conf.get("mp", 1))
        else:
            dp, mp = jax.device_count(), 1
        try:
            return make_mesh(dp=dp, mp=mp)
        except AssertionError as e:
            self.logger.warning(f"mesh config ignored: {e}")
            return None

    # ------------------------------------------------------------------
    # optimizers
    # ------------------------------------------------------------------
    def _make_optax(self, name: str, lr: float, weight_decay: float = 0.0):
        name = (name or "adam").lower()
        if name == "adam":
            if weight_decay:
                base = optax.adamw(lr, weight_decay=weight_decay)
            else:
                base = optax.adam(lr)
        elif name == "sgd":
            base = optax.sgd(lr)
        elif name == "adagrad":
            base = optax.adagrad(lr)
        elif name == "rmsprop":
            base = optax.rmsprop(lr)
        elif name == "adamw":
            base = optax.adamw(lr, weight_decay=weight_decay or 0.01)
        elif name == "sparse_adam":
            # torch SparseAdam equivalent: only touched embedding rows get
            # moment updates (models/optim.py)
            from ..optim import lazy_adam
            base = lazy_adam(lr)
        else:
            raise ValueError(f"unknown learner {name}")
        clip = self.config["train"].get("grad_clip_norm")
        sched = self.config["train"].get("scheduler")
        chain = []
        if clip:
            chain.append(optax.clip_by_global_norm(float(clip)))
        chain.append(base)
        if sched == "exponential":
            chain.append(optax.scale_by_schedule(
                lambda step: 0.99 ** (step // max(self._steps_per_epoch, 1))))
        if sched == "onplateau":
            # torch ReduceLROnPlateau equivalent: the learning rate lives in
            # the optimizer state (inject_hyperparams) and the fit loop
            # scales it when the validation metric plateaus
            chain.append(optax.inject_hyperparams(
                lambda learning_rate: optax.scale(learning_rate))(
                learning_rate=1.0))
        return optax.chain(*chain)

    def _maybe_reduce_lr_on_plateau(self, improved: bool) -> None:
        """Scale the injected LR multiplier by ``plateau_factor`` after
        ``plateau_patience`` validations without improvement."""
        if self.config["train"].get("scheduler") != "onplateau":
            return
        if improved:
            self._plateau_counter = 0
            return
        self._plateau_counter = getattr(self, "_plateau_counter", 0) + 1
        patience = int(self.config["train"].get("plateau_patience", 3))
        if self._plateau_counter < patience:
            return
        self._plateau_counter = 0
        factor = float(self.config["train"].get("plateau_factor", 0.1))
        for i, st in enumerate(self.opt_states):
            if st is None:
                continue
            inner = list(st)
            for j, s in enumerate(inner):
                if hasattr(s, "hyperparams") and "learning_rate" in s.hyperparams:
                    new_lr = s.hyperparams["learning_rate"] * factor
                    inner[j] = s._replace(
                        hyperparams={**s.hyperparams, "learning_rate": new_lr})
                    self.logger.info(f"plateau: lr multiplier -> {float(new_lr):.2e}")
            self.opt_states[i] = type(st)(inner) if isinstance(st, tuple) else inner

    def _get_optimizers(self) -> List[Dict[str, Any]]:
        tc = self.config["train"]
        opt = self._make_optax(tc.get("learner", "adam"),
                               float(tc.get("learning_rate", 1e-3)),
                               float(tc.get("weight_decay") or 0.0))
        return [{"optimizer": opt}]

    def _prepare_sparse_state(self) -> None:
        """Hook after optimizer-state init: row-sparse embedding engines
        (baseranker.py) repack their fused-table params/moments here."""

    def current_epoch_optimizers(self, nepoch: int) -> List[int]:
        """Indices of optimizers active this epoch (alternating schedules)."""
        return list(range(len(self.optimizers)))

    # ------------------------------------------------------------------
    # loaders
    # ------------------------------------------------------------------
    def _get_train_loaders(self, train_data, ddp=False) -> List:
        return [train_data.train_loader(
            batch_size=self.config["train"]["batch_size"],
            shuffle=True)]

    def current_epoch_trainloaders(self, nepoch: int):
        """Return (loader_or_loaders, combine_flag)."""
        return self.trainloaders[nepoch % len(self.trainloaders)], False

    # ------------------------------------------------------------------
    # training step machinery (overridden by retriever/ranker bases)
    # ------------------------------------------------------------------
    def training_step(self, params, batch, rng, states):
        raise NotImplementedError

    def _epoch_refresh(self, nepoch: int) -> None:
        """Rebuild per-epoch states (item vectors / sampler indices)."""
        pass

    def _device_epoch_refresh_fn(self):
        """Pure-function equivalent of ``_epoch_refresh`` usable INSIDE a jit:
        ``(params, states, rng) -> states``. Models whose per-epoch refresh is
        entirely on-device computation (item-vector re-encode, k-means sampler
        re-indexing) return it so block fitting can run the refresh inside the
        epoch scan; ``None`` means the refresh needs the host."""
        return None

    # ------------------------------------------------------------------
    # batch-norm population statistics (torch swa_utils.update_bn recipe):
    # before evaluation, stream training batches through the net with
    # mutable=["batch_stats"]; SimpleBatchNorm accumulates a cumulative
    # average of batch means/vars under the CURRENT parameters, which eval
    # applies then read (use_running_average semantics of torch BatchNorm).
    # ------------------------------------------------------------------
    def _calibration_forward(self, params, batch, net_state):
        """One mutable forward pass; returns the updated net collections.
        Overridden per base class (ranker: score net; retriever: towers)."""
        return net_state

    def _refresh_net_state(self, max_batches: int = 32) -> None:
        net = self.states.get("net")
        if not net or "batch_stats" not in net:
            return
        if not hasattr(self, "_calib_cache"):
            loader = self._train_data.train_loader(
                batch_size=int(self.config["train"]["batch_size"]), shuffle=False)
            batches = [b for _, b in zip(range(max_batches), loader)]
            stacked = {k: jnp.asarray(np.stack([b[k] for b in batches]))
                       for k in batches[0]}

            def calib(params, net_state, stacked):
                reset = dict(net_state)
                reset["batch_stats"] = jax.tree_util.tree_map(
                    jnp.zeros_like, net_state["batch_stats"])

                def body(ns, batch):
                    return self._calibration_forward(params, batch, ns), None

                out, _ = jax.lax.scan(body, reset, stacked)
                return out

            self._calib_cache = (stacked, jax.jit(calib))
        stacked, calib = self._calib_cache
        self.states["net"] = calib(self.params, net, stacked)

    def _loss_and_aux(self, params, batch, rng, states):
        out = self.training_step(params, batch, rng, states)
        if isinstance(out, dict):
            return out["loss"], out
        return out, {"loss": out}

    def _grad_step(self, optimizer, params, opt_state, batch, rng, states):
        (loss, logs), grads = jax.value_and_grad(self._loss_and_aux, has_aux=True)(
            params, batch, rng, states)
        grads = zero_pad_rows_in_grads(grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def _make_train_step(self, optimizer):
        @jax.jit
        def step(params, opt_state, batch, rng, states):
            return self._grad_step(optimizer, params, opt_state, batch, rng, states)
        return step

    # ------------------------------------------------------------------
    # whole-epoch on-device training (lax.scan) — the TPU-native hot path.
    # One device dispatch per epoch instead of one per batch; essential when
    # the chip sits behind a high-latency link and the per-step compute is
    # tiny (recsys embedding models).
    # ------------------------------------------------------------------
    def _supports_scan_epoch(self, train_data) -> bool:
        flag = str(self.config["train"].get("epoch_scan", "auto")).lower()
        if flag == "false":
            return False
        if len(self.optimizers) != 1 or len(self.trainloaders) != 1:
            return False
        if getattr(train_data, "neg_count", None):
            return False  # dataset-side negatives still go through the host path
        return True

    def _device_data_budget(self) -> int:
        """Byte budget for staging a data split in device memory. Splits
        bigger than this run through the host-chunked paths (the reference
        streams ml-20m-sized data via DataLoader, reference
        data/dataset.py:1687-1734; here small splits stay fully device-
        resident for the scan paths and big ones stream in chunks)."""
        budget = self.config["train"].get("device_data_budget", "auto")
        if isinstance(budget, str):
            return 2 << 30  # auto: 2 GiB of the chip's HBM for staged data
        return int(budget)

    def _setup_scan_epoch(self, train_data, optimizer):
        n = len(train_data.data_index)
        bs = int(self.config["train"]["batch_size"])
        nbatch = -(-n // bs)
        # compact staging: sequence datasets provide raw columns + an
        # on-device window-expansion batch_fn, avoiding the [n, L] host
        # blowup (L× the raw split; minutes of host->device transfer at
        # 1M+ interactions) the expanded path below would stage. The
        # expansion costs ~0.5-1 ms per scan step, so SMALL splits keep the
        # fully-expanded staging (fastest steady state); `train.seq_staging`
        # picks [auto (size-based), compact, expanded].
        batch_fn, arrays_host = None, None
        staging = str(self.config["train"].get("seq_staging", "auto")).lower()
        batcher = getattr(train_data, "device_epoch_arrays", None)
        if batcher is not None and staging != "expanded":
            use_compact = staging == "compact"
            if not use_compact:  # auto: estimate the expanded staging size
                probe = train_data._get_pos_batch(np.arange(min(n, 4)))
                per_row = sum(np.asarray(v).nbytes for v in probe.values()) \
                    / max(min(n, 4), 1)
                use_compact = per_row * n > (128 << 20)
            out = batcher() if use_compact else None
            if out is not None:
                arrays_host, batch_fn = out
                nbytes = sum(np.asarray(v).nbytes for v in arrays_host.values())
                if nbytes > self._device_data_budget():
                    arrays_host, batch_fn = None, None
        if arrays_host is None:
            arrays_host = train_data._get_pos_batch(np.arange(n))
            nbytes = sum(np.asarray(v).nbytes for v in arrays_host.values())
            # the epoch scan packs wide same-dtype column groups into a
            # permuted [n, C] duplicate inside the jit (see packed_groups
            # below) — count that copy here so the device-resident choice
            # doesn't overshoot the budget by ~2x on wide CTR data
            by_dt: Dict[str, int] = {}
            for v in arrays_host.values():
                a = np.asarray(v)
                if a.ndim == 1 and a.shape[0] == n:
                    by_dt[str(a.dtype)] = by_dt.get(str(a.dtype), 0) + 1
            packed_dup = sum(
                np.asarray(v).nbytes for v in arrays_host.values()
                if np.asarray(v).ndim == 1 and np.asarray(v).shape[0] == n
                and by_dt[str(np.asarray(v).dtype)] >= 8)
            if nbytes + packed_dup > self._device_data_budget():
                return self._setup_chunked_epoch(train_data, optimizer, arrays_host)
        arrays = {k: jnp.asarray(v) for k, v in arrays_host.items()}
        shuffle = bool(self.config["data"].get("shuffle", True))

        # data parallelism: constrain each scan batch to be sharded over the
        # 'dp' mesh axis; GSPMD partitions the step and psums the gradients
        dp_sharding = None
        mesh = getattr(self, "_mesh", None)
        if mesh is not None and mesh.shape["dp"] > 1 and bs % mesh.shape["dp"] == 0:
            from jax.sharding import NamedSharding, PartitionSpec
            dp_sharding = {
                "mesh": mesh,
                "spec": lambda x: NamedSharding(
                    mesh, PartitionSpec("dp", *([None] * (x.ndim - 1))))
            }
            self.logger.info(f"data-parallel batches over dp={mesh.shape['dp']}")

        def _constrain(batch):
            if dp_sharding is None:
                return batch
            return {k: (jax.lax.with_sharding_constraint(v, dp_sharding["spec"](v))
                        if hasattr(v, "ndim") and v.ndim >= 1 and v.shape[0] == bs
                        else v)
                    for k, v in batch.items()}

        def epoch_fn(params, opt_state, rng, data, states):
            perm = jax.random.permutation(rng, n) if shuffle else jnp.arange(n)
            pad = nbatch * bs - n
            if pad:
                perm = jnp.concatenate([perm, perm[:pad]])
            chunks = perm.reshape(nbatch, bs)

            # Per-step `v[sel]` column gathers are n_fields independent
            # random 4-byte-element reads — at criteo shape (40 staged
            # columns) that data path was ~80% of the DeepFM step. Instead:
            # pack same-dtype 1-D columns into [n, C] matrices, permute the
            # ROWS once per epoch (each random read now moves a contiguous
            # 4*C-byte burst), and let the scan take free contiguous slices.
            # Batches are bitwise identical to the per-column gathers.
            packed_groups = {}      # dtype str -> (names, [nbatch*bs, C])
            rest = dict(data)
            if batch_fn is None:
                by_dtype: Dict[str, list] = {}
                for k in sorted(data):
                    if data[k].ndim == 1 and data[k].shape[0] == n:
                        by_dtype.setdefault(str(data[k].dtype), []).append(k)
                for dt, ks in by_dtype.items():
                    # pack only wide groups: the win is replacing MANY
                    # narrow random gathers with one wide one (criteo: 26
                    # int + 14 float columns). For 2-3 column models (BPR)
                    # the per-step strided column unpack costs more than
                    # the gathers it saves (measured -25% on BPR/ml-100k).
                    if len(ks) < 8:
                        continue
                    packed_groups[dt] = (
                        ks, jnp.stack([data[k] for k in ks], axis=1)[perm])
                    for k in ks:
                        rest.pop(k)

            def body(carry, sel_i):
                params, opt_state, i = carry
                if batch_fn is not None:
                    batch = batch_fn(data, sel_i)
                else:
                    batch = {k: v[sel_i] for k, v in rest.items()}
                    for ks, mat in packed_groups.values():
                        block = jax.lax.dynamic_slice_in_dim(
                            mat, i * bs, bs)
                        for c, k in enumerate(ks):
                            batch[k] = block[:, c]
                batch = _constrain(batch)
                step_rng = jax.random.fold_in(rng, i)
                params, opt_state, loss = self._grad_step(
                    optimizer, params, opt_state, batch, step_rng, states)
                return (params, opt_state, i + 1), loss

            (params, opt_state, _), losses = jax.lax.scan(
                body, (params, opt_state, 0), chunks)
            return params, opt_state, losses.mean()

        self._scan_arrays = arrays
        self._scan_epoch_core = epoch_fn  # unjitted: reused by block fitting
        self._scan_epoch_fn = jax.jit(epoch_fn, donate_argnums=(0, 1))

    # ------------------------------------------------------------------
    # host-chunked epochs: when the train split exceeds the device-data
    # budget, the epoch streams fixed-size chunks host->device; each chunk is
    # one jitted scan over its batches (still read-free — losses stay on
    # device until log time). Shuffling happens on the host so only the
    # chunk in flight occupies HBM.
    # ------------------------------------------------------------------
    def _setup_chunked_epoch(self, train_data, optimizer, arrays_host):
        n = len(train_data.data_index)
        bs = int(self.config["train"]["batch_size"])
        arrays_host = {k: np.asarray(v) for k, v in arrays_host.items()}
        row_bytes = max(sum(v.nbytes for v in arrays_host.values()) // max(n, 1), 1)
        # half the budget per chunk: the epoch double-buffers (chunk c+1 is
        # gathered + transferred while the device crunches chunk c)
        batches_per_chunk = max(
            int(self._device_data_budget() // 2 // (row_bytes * bs)), 1)
        chunk_rows = batches_per_chunk * bs
        n_chunks = -(-n // chunk_rows)
        shuffle = bool(self.config["data"].get("shuffle", True))
        self.logger.info(
            f"train split ({n} rows, {row_bytes * n / 2**30:.2f} GiB) exceeds "
            f"device budget — streaming {n_chunks} chunks of {chunk_rows} rows"
            f" (double-buffered)")

        def chunk_fn(params, opt_state, rng, chunk, states):
            def body(carry, sel):
                params, opt_state, i = carry
                batch = {k: jax.lax.dynamic_slice_in_dim(v, sel, bs) for k, v in chunk.items()}
                params, opt_state, loss = self._grad_step(
                    optimizer, params, opt_state, batch, jax.random.fold_in(rng, i), states)
                return (params, opt_state, i + 1), loss

            starts = jnp.arange(batches_per_chunk) * bs
            (params, opt_state, _), losses = jax.lax.scan(
                body, (params, opt_state, 0), starts)
            return params, opt_state, losses.sum()

        chunk_step = jax.jit(chunk_fn, donate_argnums=(0, 1))
        host_rng = np.random.default_rng(self.config["train"].get("seed") or 0)

        def run_epoch(params, opt_state, rng, states):
            perm = host_rng.permutation(n) if shuffle else np.arange(n)
            pad = n_chunks * chunk_rows - n
            if pad:
                perm = np.concatenate([perm, perm[:pad]])

            def stage(c):
                sel = perm[c * chunk_rows:(c + 1) * chunk_rows]
                return {k: jax.device_put(v[sel]) for k, v in arrays_host.items()}

            total = jnp.zeros((), jnp.float32)
            nxt = stage(0)
            for c in range(n_chunks):
                chunk, nxt = nxt, None
                # dispatch is async: stage chunk c+1 (host gather + transfer)
                # while the device runs chunk c
                params, opt_state, loss_sum = chunk_step(
                    params, opt_state, jax.random.fold_in(rng, c), chunk, states)
                if c + 1 < n_chunks:
                    nxt = stage(c + 1)
                total = total + loss_sum
            return params, opt_state, total / (n_chunks * batches_per_chunk)

        self._scan_arrays = None
        self._scan_epoch_core = None   # chunked epochs can't run inside one jit
        self._scan_epoch_fn = None     # (block fitting falls back to the loop)
        self._chunked_epoch_fn = run_epoch

    # ------------------------------------------------------------------
    # block fitting: K epochs + on-device validation per dispatch.
    # Host reads are pipeline barriers (and on tunneled runtimes degrade all
    # subsequent dispatch), so the TPU-native fit runs whole epoch blocks —
    # training scan, full validation pass, and best-params tracking — inside
    # ONE jitted call, reading back only a [K] metric vector per block.
    # Early stopping is applied on the host at epoch granularity from that
    # vector; the best parameters are selected on device, so a best epoch in
    # the middle of a block is captured exactly.
    # ------------------------------------------------------------------
    def _block_size(self) -> int:
        flag = self.config["train"].get("epoch_block", "auto")
        if isinstance(flag, str):
            return 10
        return int(flag or 0)

    def _block_fit_eligible(self, val_data) -> bool:
        if (self._block_size() <= 1 or not self.val_check or val_data is None
                or getattr(self, "_scan_epoch_core", None) is None
                or self._scan_epoch_fn is None):
            return False
        if not self._eval_stack_fits(val_data):
            return False  # block fitting keeps the whole val stack in HBM
        if type(self).training_epoch is not Recommender.training_epoch:
            return False  # model supplies its own epoch procedure
        refresh = type(self)._epoch_refresh
        from .baseranker import BaseRanker
        from .baseretriever import BaseRetriever
        if isinstance(self, BaseRetriever):
            # model-specific host-side refresh (e.g. NCL's k-means prototype
            # rebuild against its own schedule) cannot run inside the block
            if refresh is not BaseRetriever._epoch_refresh:
                return False
            if self._train_needs_item_vector() or self._sampler_is_stateful():
                # mining methods / stateful samplers: eligible iff the refresh
                # (catalog re-encode + sampler re-index) compiles on device
                return self._device_epoch_refresh_fn() is not None
            return True
        if isinstance(self, BaseRanker):
            if refresh is not BaseRanker._epoch_refresh:
                return False
            if self.retriever is not None:
                # cascaded rankers: stage-1 item-vector/sampler refresh must
                # run on device inside the block
                return self._device_epoch_refresh_fn() is not None
            return True
        return False

    def _device_val_metric(self, sums, weight, globs):
        """The validation-monitor value as a device scalar (used inside the
        block-fit jit). Per-sample metrics come from the summed kernel
        outputs; global metrics (AUC) are computed from the gathered
        score/label arrays on device."""
        if self.val_metric in sums:
            return sums[self.val_metric] / jnp.maximum(weight, 1.0)
        base = self.val_metric.split("@")[0]
        if isinstance(self.frating, list):
            # multitask monitor: "<task>_<metric>" (task names may contain _)
            for r in self.frating:
                if self.val_metric == f"{r}_{base.split('_')[-1]}" \
                        or self.val_metric.startswith(f"{r}_"):
                    base = self.val_metric[len(r) + 1:].split("@")[0]
                    task = r
                    break
            else:
                raise KeyError(f"val metric {self.val_metric} has no task prefix")
        else:
            task = self.frating
        global_m = dict(eval_mod.get_global_metrics([base]))
        if globs is not None and base in global_m:
            g = globs[task]
            return global_m[base](g["score"].reshape(-1), g["label"].reshape(-1),
                                  g["weight"].reshape(-1))
        raise KeyError(f"val metric {self.val_metric} not computable on device")

    def _setup_block_fit(self, val_data):
        cutoffs = self._cutoffs()[:1]
        host = getattr(self, "_eval_host_cache", {}).pop(id(val_data), None)
        stacked, scan_eval = self._eval_scan_core(
            val_data, self.config["eval"]["val_metrics"], cutoffs,
            host_stacked=host)
        mode_max = self.config["train"].get("early_stop_mode", "max") != "min"
        epoch_core = self._scan_epoch_core
        refresh_fn = self._device_epoch_refresh_fn()

        # batch-norm models: recalibrate population stats on device before
        # each in-block validation pass (same recipe as _refresh_net_state)
        with_net = "net" in self.states and "batch_stats" in self.states["net"]
        if with_net:
            loader = self._train_data.train_loader(
                batch_size=int(self.config["train"]["batch_size"]), shuffle=False)
            calib_batches = [b for _, b in zip(range(32), loader)]
            calib_stacked = {k: jnp.asarray(np.stack([b[k] for b in calib_batches]))
                             for k in calib_batches[0]}

            def calibrate(params, net):
                reset = dict(net)
                reset["batch_stats"] = jax.tree_util.tree_map(
                    jnp.zeros_like, net["batch_stats"])

                def body(ns, batch):
                    return self._calibration_forward(params, batch, ns), None
                out, _ = jax.lax.scan(body, reset, calib_stacked)
                return out
        else:
            calibrate = None

        def block_fn(params, opt_state, best_params, best_net, best_metric,
                     rng, data, eval_stacked, states, epoch_ids):
            def one(carry, e):
                params, opt_state, best_params, best_net, best_metric = carry
                erng = jax.random.fold_in(rng, e)
                if refresh_fn is not None:
                    # the reference's per-epoch _update_item_vector +
                    # sampler.update (reference recommender.py:561-570), run
                    # ON DEVICE inside the block jit
                    states_e = refresh_fn(params, states,
                                          jax.random.fold_in(erng, 0x5EED))
                else:
                    states_e = states
                params, opt_state, loss = epoch_core(params, opt_state, erng,
                                                     data, states_e)
                if calibrate is not None:
                    net = calibrate(params, states_e["net"])
                    eval_states = {**states_e, "net": net}
                else:
                    net = best_net  # empty placeholder
                    eval_states = states_e
                sums, weight, globs = scan_eval(params, eval_stacked, eval_states)
                metric = self._device_val_metric(sums, weight, globs)
                improved = (metric > best_metric) if mode_max else (metric < best_metric)
                sel = lambda a, b: jnp.where(improved, a, b)
                best_params = jax.tree_util.tree_map(sel, params, best_params)
                best_net = jax.tree_util.tree_map(sel, net, best_net)
                best_metric = jnp.where(improved, metric, best_metric)
                return (params, opt_state, best_params, best_net, best_metric), \
                    (loss, metric)

            carry = (params, opt_state, best_params, best_net, best_metric)
            carry, (losses, metrics) = jax.lax.scan(one, carry, epoch_ids)
            return (*carry, losses, metrics)

        self._val_stacked = stacked
        self._block_with_net = with_net
        self._block_fit_fn = jax.jit(block_fn, donate_argnums=(0, 1, 2, 3))

    def _fit_loop_blocks(self, val_data):
        K = self._block_size()
        epochs = int(self.config["train"]["epochs"])
        patience = int(self.config["train"].get("early_stop_patience", 10))
        mode_max = self.config["train"].get("early_stop_mode", "max") != "min"
        improved = (lambda v, b: v > b) if mode_max else (lambda v, b: v < b)
        self._setup_block_fit(val_data)
        cp = lambda t: jax.tree_util.tree_map(
            lambda x: x.copy() if hasattr(x, "copy") else x, t)
        best_params = cp(self.params)
        best_net = cp(self.states["net"]) if self._block_with_net else {}
        best_metric = jnp.asarray(-np.inf if mode_max else np.inf, jnp.float32)
        run_rng = self.next_rng()
        e0, counter, stop = getattr(self, "_start_epoch", 0), 0, False
        best_value = float("-inf") if mode_max else float("inf")
        best_epoch = -1
        while e0 < epochs and not stop \
                and not getattr(self, "_preempt_requested", False):
            k = min(K, epochs - e0)
            ids = jnp.arange(e0, e0 + k)
            t0 = time.time()
            (self.params, self.opt_states[0], best_params, best_net,
             best_metric, losses, metrics) = self._block_fit_fn(
                self.params, self.opt_states[0], best_params, best_net,
                best_metric, run_rng, self._scan_arrays, self._val_stacked,
                self.states, ids)
            losses_h, metrics_h = np.asarray(losses), np.asarray(metrics)  # 1 read
            dt = time.time() - t0
            for j in range(k):
                self.log_dict(e0 + j, {"train_loss": float(losses_h[j]),
                                       self.val_metric: float(metrics_h[j])},
                              dt / k, 0.0)
                if improved(float(metrics_h[j]), best_value):
                    best_value, best_epoch, counter = float(metrics_h[j]), e0 + j, 0
                else:
                    counter += 1
                    if counter >= patience:
                        stop = True
                        break
            # plateau LR reduction applies from the next block onward
            self._maybe_reduce_lr_on_plateau(counter == 0)
            self.logged_metrics["examples_per_s"] = \
                getattr(self, "_steps_per_epoch", 0) * \
                self.config["train"].get("batch_size", 0) * k / max(dt, 1e-9)
            e0 += k
        if stop:
            self.logger.info(
                f"early stopped at epoch {min(e0, epochs) - 1}; best "
                f"{self.val_metric}={best_value:.4f} @ epoch {best_epoch}")
        # hand results to the EarlyStopping callback for evaluate()/restore
        best_states = cp(self.states)
        if self._block_with_net:
            best_states["net"] = best_net
        self.callback.best_params = (best_params, best_states)
        self.callback.best_value = best_value
        self.callback.best_epoch = best_epoch
        self.ckpt_path = self.callback.save_checkpoint(best_epoch)
        self.finalize_checkpoints()
        self.logger.info(f"best checkpoint saved at {self.ckpt_path}")

    # ------------------------------------------------------------------
    # fit / evaluate
    # ------------------------------------------------------------------
    def fit(self, train_data, val_data=None, run_mode: str = "light",
            config: Dict = None, resume_from: Optional[str] = None, **kwargs):
        with self._graceful_stop():
            return self._fit(train_data, val_data, run_mode, config,
                             resume_from, **kwargs)

    def _fit(self, train_data, val_data=None, run_mode: str = "light",
             config: Dict = None, resume_from: Optional[str] = None, **kwargs):
        if config is not None:
            self.config = deep_update(self.config, config)
        for k, v in (kwargs or {}).items():
            if isinstance(v, dict) and k in self.config:
                self.config[k] = deep_update(self.config[k], v)
        self.run_mode = run_mode
        self._train_data = train_data

        set_matmul_precision(self.config["train"].get("precision"))

        # persistent XLA compilation cache: repeat runs of the same model/
        # shape skip the (minutes-long for epoch-block programs) compile
        cache_dir = self.config["train"].get(
            "compile_cache", os.path.expanduser("~/.recstudio_tpu/jax_cache"))
        if cache_dir and not getattr(Recommender, "_cc_set", False):
            try:
                jax.config.update("jax_compilation_cache_dir", str(cache_dir))
                jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
                Recommender._cc_set = True
            except Exception as e:
                self.logger.warning(f"compilation cache disabled: {e}")

        self._init_model(train_data)
        self._init_parameter(train_data)
        if val_data is not None:
            val_data.use_field = train_data.use_field

        # validation metric name
        val_metrics = self.config["eval"].get("val_metrics")
        cutoff = self.config["eval"].get("cutoff")
        self.val_check = val_data is not None and val_metrics is not None
        if self.val_check:
            vm = val_metrics[0] if isinstance(val_metrics, list) else val_metrics
            if eval_mod.get_rank_metrics(vm):
                cutoffs = cutoff if isinstance(cutoff, list) else [cutoff]
                vm = f"{vm}@{cutoffs[0]}"
            if isinstance(self.frating, list):  # multitask: monitor first task
                vm = f"{self.frating[0]}_{vm}"
            self.val_metric = vm
        self.callback = self._get_callback(train_data.name)

        self.trainloaders = self._get_train_loaders(train_data)
        try:
            self._steps_per_epoch = max(len(self.trainloaders[0]), 1)
        except (TypeError, KeyError):
            self._steps_per_epoch = 1
        self.optimizers = self._get_optimizers() or []
        self.opt_states = [o["optimizer"].init(self.params) if o.get("optimizer") else None
                           for o in self.optimizers]
        self._prepare_sparse_state()  # row-sparse engines repack state here
        self._train_steps = [self._make_train_step(o["optimizer"]) if o.get("optimizer") else None
                             for o in self.optimizers]
        self._scan_epoch_fn = None
        self._chunked_epoch_fn = None
        if self.optimizers and self.optimizers[0].get("optimizer") is not None \
                and self._supports_scan_epoch(train_data):
            self._setup_scan_epoch(train_data, self.optimizers[0]["optimizer"])
        self._start_epoch = 0
        if resume_from is not None:
            payload = self.load_checkpoint(resume_from, restore_optimizer=True)
            self._start_epoch = int(payload.get("epoch", -1)) + 1
            self.logger.info(f"resumed from {resume_from} at epoch {self._start_epoch}")
        self.logger.info(f"{type(self).__name__} config:\n"
                         + color_dict_normal(self.config))
        self._init_tensorboard(train_data.name)
        self.fit_loop(val_data)
        return self

    @contextmanager
    def _graceful_stop(self):
        """Preemption-safe fits: SIGTERM (what cloud schedulers send before
        reclaiming a VM/TPU) finishes the current epoch/block, saves the
        checkpoint through the normal fit-end path and returns — so
        ``fit(resume_from=...)`` continues exactly. The reference only
        handles KeyboardInterrupt (reference quick_start.py)."""
        import signal
        import threading
        self._preempt_requested = False
        if threading.current_thread() is not threading.main_thread():
            yield  # signal handlers are main-thread-only
            return

        def handler(signum, frame):
            self._preempt_requested = True
            self.logger.info(
                "SIGTERM received — stopping at the next epoch boundary")

        prev = signal.signal(signal.SIGTERM, handler)
        try:
            yield
        finally:
            signal.signal(signal.SIGTERM, prev)

    def _init_tensorboard(self, dataset_name: str):
        """TensorBoard scalars + config table (reference recommender.py:103-119),
        enabled by ``train.tensorboard_path``."""
        self._tb = None
        path = self.config["train"].get("tensorboard_path")
        if not path:
            return
        try:
            from torch.utils.tensorboard import SummaryWriter
            import time as _time
            run = _time.strftime("%Y-%m-%d-%H-%M-%S")
            logdir = os.path.join(path, type(self).__name__, dataset_name, run)
            self._tb = SummaryWriter(logdir)
            from ...utils.misc import dict2markdown_table
            self._tb.add_text("Configuration/model",
                              dict2markdown_table(self.config, nested=True))
            self.logger.info(f"tensorboard logs at {logdir}")
        except Exception as e:  # tensorboard is optional
            self.logger.warning(f"tensorboard disabled: {e}")

    def _get_callback(self, dataset_name: str):
        if self.val_check:
            return EarlyStopping(
                self, self.val_metric, dataset_name,
                save_dir=self.config["eval"].get("save_path"),
                patience=self.config["train"].get("early_stop_patience", 10),
                mode=self.config["train"].get("early_stop_mode", "max"))
        interval = self.config["eval"].get("save_interval")
        if interval:
            from ...utils.callbacks import IntervalCallback
            return IntervalCallback(self, every_n_epoch=int(interval),
                                    dataset_name=dataset_name,
                                    save_dir=self.config["eval"].get("save_path"))
        return SaveLastCallback(self, dataset_name,
                                save_dir=self.config["eval"].get("save_path"))

    def _defer_metric_reads(self) -> bool:
        """Keep per-epoch training metrics on device, reading them only after
        the fit loop. Enabled by ``train.deferred_metrics`` (auto-on when no
        validation runs, since nothing on the host needs the values mid-fit)."""
        flag = self.config["train"].get("deferred_metrics", "auto")
        if isinstance(flag, str):
            return not getattr(self, "val_check", False)
        return bool(flag)

    def fit_loop(self, val_data=None):
        if self._block_fit_eligible(val_data):
            return self._fit_loop_blocks(val_data)
        nepoch = 0
        stop = False
        deferred = []
        prof_dir = self.config["train"].get("profiler_path")
        prof_epochs = int(self.config["train"].get("profiler_epochs", 2))
        try:
            for nepoch in range(getattr(self, "_start_epoch", 0),
                                self.config["train"]["epochs"]):
                if prof_dir and nepoch == 1:  # skip the compile epoch
                    jax.profiler.start_trace(prof_dir)
                t0 = time.time()
                self._epoch_refresh(nepoch)
                training_output = self.training_epoch(nepoch)
                t1 = time.time()
                if prof_dir and nepoch == prof_epochs:
                    jax.profiler.stop_trace()
                    self.logger.info(f"profiler trace written to {prof_dir}")
                    prof_dir = None
                metrics: Dict[str, Any] = {"train_loss": training_output}
                if nepoch > 0 and not self._defer_metric_reads():
                    n_ex = getattr(self, "_steps_per_epoch", 0) * \
                        self.config["train"].get("batch_size", 0)
                    if n_ex and (t1 - t0) > 0:
                        self.logged_metrics["examples_per_s"] = n_ex / (t1 - t0)
                if self.val_check and (nepoch % self.config["eval"].get("val_n_epoch", 1) == 0):
                    self._refresh_net_state()
                    val_metrics = self.validation_epoch(nepoch, val_data)
                    metrics.update(val_metrics)
                t2 = time.time()
                self.logged_metrics.update(metrics)
                if self._defer_metric_reads():
                    # no host reads mid-fit: stash device scalars, log after
                    deferred.append((nepoch, metrics, t1 - t0, t2 - t1))
                else:
                    self.log_dict(nepoch, metrics, t1 - t0, t2 - t1)
                if self.run_mode == "tune":
                    try:
                        import nni
                        if self.val_check:
                            nni.report_intermediate_result(float(metrics[self.val_metric]))
                    except ImportError:
                        pass
                stop = self.callback(nepoch, metrics)
                if self.val_check:
                    self._maybe_reduce_lr_on_plateau(
                        getattr(self.callback, "counter", 0) == 0)
                if stop:
                    self.logger.info(
                        f"early stopped at epoch {nepoch}; "
                        f"best {getattr(self.callback, 'monitor', '')}="
                        f"{getattr(self.callback, 'best_value', float('nan')):.4f} "
                        f"@ epoch {getattr(self.callback, 'best_epoch', -1)}")
                    break
                if getattr(self, "_preempt_requested", False):
                    self.logger.info(f"preempted — stopping after epoch {nepoch}")
                    break
        except KeyboardInterrupt:
            self.logger.info("training interrupted — saving checkpoint")
        if self.config["train"].get("benchmark_mode"):
            # keep the process entirely read-free (no log flush, no checkpoint
            # serialization): used by throughput benchmarks where any
            # device->host transfer would act as a pipeline barrier
            self._pending_logs = deferred
            return
        for ep, metrics, tt, te in deferred:  # flush device scalars post-fit
            self.log_dict(ep, metrics, tt, te)
        self.ckpt_path = self.callback.save_checkpoint(nepoch)
        self.finalize_checkpoints()
        self.logger.info(f"best checkpoint saved at {self.ckpt_path}")

    def training_epoch(self, nepoch: int):
        if getattr(self, "_chunked_epoch_fn", None) is not None:
            self.params, self.opt_states[0], loss = self._chunked_epoch_fn(
                self.params, self.opt_states[0], self.next_rng(), self.states)
            return loss if self._defer_metric_reads() else float(loss)
        if getattr(self, "_scan_epoch_fn", None) is not None:
            self.params, self.opt_states[0], loss = self._scan_epoch_fn(
                self.params, self.opt_states[0], self.next_rng(),
                self._scan_arrays, self.states)
            # Return the DEVICE scalar. Host reads are deferred to log time:
            # on a tunneled/async TPU runtime a device->host read acts as a
            # pipeline barrier (and on some transports permanently degrades
            # dispatch), so the hot loop must stay read-free.
            if self._defer_metric_reads():
                return loss
            return float(loss)
        loaders, combine = self.current_epoch_trainloaders(nepoch)
        if not isinstance(loaders, list):
            loaders = [loaders]
        elif combine and len(loaders) > 1:
            from ...data import CombinedLoaders
            loaders = [CombinedLoaders(loaders)]
        opt_idx = self.current_epoch_optimizers(nepoch)
        total_loss, nbatch = 0.0, 0
        for li, loader in enumerate(loaders):
            oi = opt_idx[li % len(opt_idx)] if opt_idx else 0
            step_fn = self._train_steps[oi]
            if step_fn is None:
                # optimizer-free models (closed-form) override training_epoch
                continue
            for batch in loader:
                batch = batch_to_device(batch)
                self.params, self.opt_states[oi], loss = step_fn(
                    self.params, self.opt_states[oi], batch, self.next_rng(), self.states)
                total_loss = total_loss + loss  # device scalar: no mid-epoch read
                nbatch += 1
        mean = total_loss / max(nbatch, 1)
        return mean if self._defer_metric_reads() else float(mean)

    # -- evaluation -----------------------------------------------------
    def validation_epoch(self, nepoch: int, val_data) -> Dict[str, float]:
        out = self._eval_epoch(val_data, self.config["eval"]["val_metrics"],
                               cutoffs=self._cutoffs()[:1])
        return out

    def _cutoffs(self) -> List[int]:
        c = self.config["eval"].get("cutoff")
        return c if isinstance(c, list) else [c]

    def evaluate(self, test_data, verbose: bool = True, **kwargs) -> Dict[str, float]:
        test_data.use_field = self.fields
        if self.ckpt_path is not None and getattr(self.callback, "best_params", None) is not None:
            self.restore(self.callback.best_params)
        elif not self.val_check:
            # never calibrated during fit (no validation epochs)
            self._refresh_net_state()
        self._epoch_refresh(-1)
        out = self._eval_epoch(test_data, self.config["eval"]["test_metrics"],
                               cutoffs=self._cutoffs())
        if verbose:
            self.logger.info("Test result:\n" + "\n".join(
                f"  {k}={v:.4f}" for k, v in out.items()))
        self.logged_metrics.update(out)
        return out

    def _stack_eval_batches(self, data) -> Dict[str, np.ndarray]:
        """Host-side [nbatch, B, ...] stack of a split's eval batches."""
        loader = data.eval_loader(batch_size=self.config["eval"]["batch_size"])
        batches = list(loader)
        return {k: np.stack([b[k] for b in batches]) for k in batches[0]}

    def _eval_stack_fits(self, data) -> bool:
        """Whether the split's eval stack fits the device-data budget (the
        device-resident scan paths require it; block fitting keeps the whole
        validation stack in HBM across the fit)."""
        if not hasattr(self, "_eval_host_cache"):
            self._eval_host_cache = {}
        if id(data) not in self._eval_host_cache:
            self._eval_host_cache[id(data)] = self._stack_eval_batches(data)
        host = self._eval_host_cache[id(data)]
        return sum(v.nbytes for v in host.values()) <= self._device_data_budget()

    def _eval_scan_core(self, data, metric_names, cutoffs, host_stacked=None):
        """(stacked_batches, unjitted scan_core) for a split — the core is a
        pure fn (params, stacked, states) -> (metric_sums, weight, globs),
        usable standalone (jitted by _eval_epoch) or inside the block-fit jit."""
        if host_stacked is None:
            host_stacked = self._stack_eval_batches(data)
        stacked = {k: jnp.asarray(v) for k, v in host_stacked.items()}
        step = self._make_eval_step(metric_names, tuple(cutoffs))

        def scan_eval(params, stacked, states):
            def body(carry, batch):
                sums, weight = carry
                per_sums, bs, glob = step(params, batch, states)
                new_sums = {k: sums[k] + per_sums[k] for k in per_sums}
                return (new_sums, weight + bs), glob

            b0 = {k: v[0] for k, v in stacked.items()}
            init_sums, _, _ = step(params, b0, states)
            init = ({k: jnp.zeros_like(v) for k, v in init_sums.items()},
                    jnp.zeros((), jnp.float32))
            (sums, weight), globs = jax.lax.scan(body, init, stacked)
            return sums, weight, globs

        return stacked, scan_eval

    def _eval_scan_parts(self, data, metric_names, cutoffs):
        key = (id(data), tuple(metric_names), tuple(cutoffs))
        if not hasattr(self, "_eval_cache"):
            self._eval_cache = {}
        if key not in self._eval_cache:
            host = getattr(self, "_eval_host_cache", {}).pop(id(data), None)
            if host is None:
                host = self._stack_eval_batches(data)
            nbytes = sum(v.nbytes for v in host.values())
            chunks = None
            if nbytes > self._device_data_budget():
                # host-chunked evaluation: uniform chunks of whole batches,
                # last chunk padded with _size=0 copies (weight-neutral for
                # per-sample sums and for the weight-aware global kernels)
                nbatch = next(iter(host.values())).shape[0]
                per_batch = max(nbytes // max(nbatch, 1), 1)
                bpc = max(int(self._device_data_budget() // per_batch), 1)
                n_chunks = -(-nbatch // bpc)
                self.logger.info(
                    f"eval stack ({nbytes / 2**30:.2f} GiB) exceeds device "
                    f"budget — streaming {n_chunks} chunks of {bpc} batches")
                chunks = []
                for c in range(n_chunks):
                    sl = {k: v[c * bpc:(c + 1) * bpc] for k, v in host.items()}
                    short = bpc - next(iter(sl.values())).shape[0]
                    if short:
                        pad = {k: np.repeat(v[-1:], short, axis=0) for k, v in sl.items()}
                        pad["_size"] = np.zeros_like(pad["_size"])
                        sl = {k: np.concatenate([v, pad[k]], axis=0) for k, v in sl.items()}
                    chunks.append(sl)
                host = chunks[0]  # trace shape
            stacked, scan_eval = self._eval_scan_core(data, metric_names, cutoffs,
                                                      host_stacked=host)
            keys_cell: List[str] = []

            def packed_eval(params, stacked, states):
                sums, weight, globs = scan_eval(params, stacked, states)
                keys_cell[:] = sorted(sums)  # static, captured at trace time
                packed = jnp.stack([sums[k] for k in keys_cell] + [weight])
                return packed, globs

            source = chunks if chunks is not None else stacked
            self._eval_cache[key] = (source, jax.jit(packed_eval), keys_cell)
        return self._eval_cache[key]

    def _eval_epoch(self, data, metric_names, cutoffs) -> Dict[str, float]:
        """Evaluate a split in one device dispatch (eval batches stacked
        [nbatch, B, ...] and scanned on device, metric sums returned in a
        single packed transfer) — or, when the stack exceeds the device-data
        budget, in one dispatch per host-streamed chunk with device-side
        accumulation."""
        source, packed_eval, keys = self._eval_scan_parts(data, metric_names, cutoffs)
        if isinstance(source, list):  # chunked: accumulate on device
            total = None
            glob_parts = []
            for chunk in source:
                packed, globs = packed_eval(self.params, chunk, self.states)
                total = packed if total is None else total + packed
                if globs is not None:
                    glob_parts.append(globs)
            packed = np.asarray(total)
            globs = None
            if glob_parts:
                globs = jax.tree_util.tree_map(
                    lambda *xs: jnp.concatenate(xs, axis=0), *glob_parts)
        else:
            packed, globs = packed_eval(self.params, source, self.states)
            packed = np.asarray(packed)
        weight = float(packed[-1])
        out = {k: float(packed[i]) / max(weight, 1.0) for i, k in enumerate(keys)}
        out.update(self._global_metrics(metric_names, globs))
        return out

    def _global_metrics(self, metric_names, gathered) -> Dict[str, float]:
        return {}

    def _make_eval_step(self, metric_names, cutoffs):
        raise NotImplementedError

    # ------------------------------------------------------------------
    # logging / checkpointing
    # ------------------------------------------------------------------
    def log_dict(self, nepoch: int, metrics: Dict[str, Any],
                 train_time: float, eval_time: float):
        parts = [f"{k}={float(v):.4f}" for k, v in metrics.items()]
        self.logger.info(
            f"Epoch {nepoch:4d} | " + " ".join(parts)
            + f" | train {train_time:.2f}s eval {eval_time:.2f}s")
        if getattr(self, "_tb", None) is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(k, float(v), nepoch)

    def snapshot(self):
        # deep-copy device buffers: epoch functions donate params/opt_state,
        # so aliased snapshots would be invalidated next epoch
        cp = lambda t: jax.tree_util.tree_map(
            lambda x: x.copy() if hasattr(x, "copy") else x, t)
        return cp(self.params), cp(self.states)

    def restore(self, snap):
        cp = lambda t: jax.tree_util.tree_map(
            lambda x: x.copy() if hasattr(x, "copy") else x, t)
        self.params, self.states = cp(snap[0]), cp(snap[1])

    def save_checkpoint(self, path: str, epoch: int = -1, metric: Dict = None):
        """Full-fidelity checkpoint: params + states + optimizer states +
        RNG counter + epoch, so training resumes exactly (the reference only
        persists model weights, reference callbacks.py:67-73).

        ``train.ckpt_backend: orbax`` switches to an orbax directory
        checkpoint: sharded arrays are written per-shard with sharding
        metadata (each host persists only its rows of a row-sharded table)
        and the save is ASYNC — training resumes while tensorstore flushes
        in the background. The default ``pickle`` backend materializes the
        whole tree on one host, which is the right (simpler) answer
        single-chip but a scaling wall under mp meshes.
        """
        if self.config["train"].get("ckpt_backend", "pickle") == "orbax":
            return self._save_checkpoint_orbax(path, epoch, metric)
        from flax.serialization import to_bytes
        payload = {
            "config": self.config,
            "model": type(self).__name__,
            "epoch": epoch,
            "metric": metric or {},
            "params": to_bytes(self.params),
            "states": to_bytes(self.states) if self.states else None,
            "opt_states": [to_bytes(o) if o is not None else None
                           for o in self.opt_states] if self.opt_states else None,
            "rng_counter": self._rng_counter,
        }
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump(payload, f)

    # -- orbax backend ---------------------------------------------------
    def _orbax_checkpointer(self):
        import orbax.checkpoint as ocp
        if getattr(self, "_ocp_ckptr", None) is None:
            self._ocp_ckptr = ocp.AsyncCheckpointer(
                ocp.CompositeCheckpointHandler())
        return self._ocp_ckptr

    def _orbax_tree(self):
        """The array pytree an orbax checkpoint carries (meta goes to JSON)."""
        tree = {"params": self.params}
        if self.states:
            tree["states"] = self.states
        if self.opt_states:
            tree["opt_states"] = {str(i): s for i, s in
                                  enumerate(self.opt_states) if s is not None}
        return tree

    def _save_checkpoint_orbax(self, path: str, epoch: int, metric: Dict):
        import orbax.checkpoint as ocp
        ckptr = self._orbax_checkpointer()
        ckptr.wait_until_finished()          # at most one in-flight save
        meta = {"config": self.config, "model": type(self).__name__,
                "epoch": int(epoch), "metric": metric or {},
                "rng_counter": int(self._rng_counter)}
        ckptr.save(os.path.abspath(path),
                   args=ocp.args.Composite(
                       state=ocp.args.PyTreeSave(self._orbax_tree()),
                       meta=ocp.args.JsonSave(meta)),
                   force=True)

    def _load_checkpoint_orbax(self, path: str, restore_optimizer: bool):
        import orbax.checkpoint as ocp
        ckptr = self._orbax_checkpointer()
        ckptr.wait_until_finished()
        template = self._orbax_tree()
        # partial: an inference-side model (no optimizer) restores only the
        # subtree it carries; restore_args keep each leaf's dtype + sharding
        restored = ckptr.restore(
            os.path.abspath(path),
            args=ocp.args.Composite(
                state=ocp.args.PyTreeRestore(
                    template,
                    restore_args=ocp.checkpoint_utils.construct_restore_args(
                        template),
                    partial_restore=True),
                meta=ocp.args.JsonRestore()))
        state, meta = restored["state"], dict(restored["meta"])
        self.params = state["params"]
        if "states" in state and self.states:
            self.states = state["states"]
        if restore_optimizer and "opt_states" in state and self.opt_states:
            self.opt_states = [state["opt_states"].get(str(i), cur)
                               for i, cur in enumerate(self.opt_states)]
            self._rng_counter = int(meta.get("rng_counter", self._rng_counter))
        return meta

    def finalize_checkpoints(self):
        """Block until any in-flight async (orbax) save has landed."""
        if getattr(self, "_ocp_ckptr", None) is not None:
            self._ocp_ckptr.wait_until_finished()

    def load_checkpoint(self, path: str, restore_optimizer: bool = False):
        if os.path.isdir(path):                       # orbax directory ckpt
            return self._load_checkpoint_orbax(path, restore_optimizer)
        from flax.serialization import from_bytes
        with open(path, "rb") as f:
            payload = pickle.load(f)
        self.params = from_bytes(self.params, payload["params"])
        if payload.get("states") and self.states:
            self.states = from_bytes(self.states, payload["states"])
        if restore_optimizer and payload.get("opt_states") and self.opt_states:
            self.opt_states = [
                from_bytes(cur, blob) if (blob is not None and cur is not None) else cur
                for cur, blob in zip(self.opt_states, payload["opt_states"])]
            self._rng_counter = int(payload.get("rng_counter", self._rng_counter))
        return payload

    # convenience
    @property
    def item_vector(self):
        return self.states.get("item_vector")
