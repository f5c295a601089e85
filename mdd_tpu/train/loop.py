"""Training loop: jit-compiled DP train step + the reference's recipe.

The per-step compute (forward, CTC loss, backward, Adam update, greedy
train-WER counts) is one jit program; the batch is sharded over the
('data',) mesh and parameters are replicated, so XLA emits the gradient
all-reduce over ICI — the TPU-native replacement for the reference's
single-GPU loop (train_ctc.run_epoch:28-105).

Epoch orchestration reproduces the reference recipe: CTCLoss(sum)/batch,
Adam + L2 weight decay, greedy WER each step, and the plateau LR machine
with best-state snapshot/restore (train_ctc.py:215-268) — with
checkpointing upgraded to orbax best+latest (resumable).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Dict, Iterable, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from mdd_tpu.data.dataset import Batch, pad_batch_to
from mdd_tpu.models.ctc_model import CTCAttentionModel, ModelConfig
from mdd_tpu.ops.ctc_loss import ctc_loss
from mdd_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                   replicated, shard_batch)
from mdd_tpu.train.checkpoint import save_checkpoint
from mdd_tpu.train.plateau import PlateauAction, PlateauScheduler


class TrainState(flax.struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def exact_output_sizes(model_frames, out_len: int, total_frames: int):
    """Per-item model-output frame counts, exact for any padded width.

    The device-frontend paths know each item's true model-frame count m
    as an integer, so the post-downsampling size is exact integer
    arithmetic: floor(m * out_len / T).  The reference-style float path
    — floor(float32(m / T) * out_len) — can differ by one frame between
    two padded widths T for the same m (float32 rounding of the
    fraction), which made the cached (bucket-width) and streaming
    (batch-width) production input paths disagree on mixed-length
    corpora (round-3 advisor finding)."""
    return (model_frames * out_len) // total_frames


def make_optimizer(weight_decay: float):
    """Adam + L2 (coupled) weight decay — torch.optim.Adam(weight_decay=..)
    semantics as used by the reference (train_ctc.py:187)."""

    def make(learning_rate: float):
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_adam(),
            optax.scale(-learning_rate),
        )

    return optax.inject_hyperparams(make)


class Trainer:
    def __init__(
        self,
        model_cfg: ModelConfig,
        init_lr: float = 1e-3,
        weight_decay: float = 5e-4,
        lr_decay: float = 0.5,
        end_adjust_acc: float = 2.0,
        plateau_patience: int = 10,
        max_adjust_times: int = 8,
        seed: int = 1234,
        n_devices: int = 0,
        sample_t: int = 64,
        sample_l: int = 16,
        device_frontend: bool = False,
        left_ctx: int = 0,
        right_ctx: int = 2,
        n_skip_frame: int = 2,
        n_downsample: int = 2,
        weight_noise_std: float = 0.0,   # >0: add_weight_noise each epoch
    ):
        # device_frontend: batches arrive as RAW (B, T_raw, D) features
        # (see data.dataset.SpeechDataset(device_frontend=True)); splice +
        # frame-skip run on device inside the jit step, cutting
        # host->device transfer by the splice factor.  input_fracs then
        # carry raw-length fractions; the step recovers true lengths and
        # recomputes the model-frame fractions itself.
        self.device_frontend = device_frontend
        self.left_ctx, self.right_ctx = left_ctx, right_ctx
        self.n_skip_frame, self.n_downsample = n_skip_frame, n_downsample
        self.weight_noise_std = weight_noise_std
        self.model_cfg = model_cfg
        if device_frontend:
            # the splice geometry must reproduce the model's input dim:
            # raw D * (left+1+right) — catches a caller that enabled the
            # device frontend but forgot to pass non-default splice params
            ctx = left_ctx + 1 + right_ctx
            assert model_cfg.input_dim % ctx == 0, (
                "input_dim %d not divisible by splice context %d"
                % (model_cfg.input_dim, ctx))
        self.model = CTCAttentionModel(model_cfg)
        self.mesh = make_mesh(n_devices)
        self.scheduler = PlateauScheduler(
            init_lr=init_lr, decay=lr_decay, end_adjust_acc=end_adjust_acc,
            patience=plateau_patience, max_adjust_times=max_adjust_times)
        self.optimizer = make_optimizer(weight_decay)
        self.seed = seed
        rng = jax.random.key(seed)
        self.rng, init_rng = jax.random.split(rng)
        if jax.default_backend() == "tpu":
            # Dropout-mask stream: the XLA hardware RngBitGenerator
            # ("rbg") generates the ~500M mask bits/step ~10x cheaper
            # than threefry on TPU (measured: 102 -> 79 ms full grad at
            # batch 512).  Param init above stays on threefry so
            # initialization is reproducible across backends; dropout
            # masks are statistically equivalent either way.
            self.rng = jax.random.key(seed + 1, impl="rbg")
        feats = jnp.zeros((1, sample_t, model_cfg.input_dim))
        trans = jnp.zeros((1, sample_l), jnp.int32)
        variables = self.model.init(
            {"params": init_rng, "dropout": jax.random.key(0)},
            feats, trans, jnp.asarray([sample_l]), train=False)
        opt_state = self.optimizer(learning_rate=init_lr).init(variables["params"])
        state = TrainState(params=variables["params"],
                           batch_stats=variables["batch_stats"],
                           opt_state=opt_state,
                           step=jnp.zeros((), jnp.int32))
        # replicate across the mesh
        self.state = jax.device_put(state, replicated(self.mesh))
        self._snapshot = None      # plateau restore point
        self._best_acc_state = None
        self.loss_results: list = []
        self.dev_loss_results: list = []
        self.dev_acc_results: list = []
        self._jit_cache: Dict[bool, Any] = {}
        self._save_thread = None   # in-flight async 'latest' save

    # ------------------------------------------------------------------
    # jit steps
    # ------------------------------------------------------------------
    def _loss_and_out(self, params, batch_stats, batch_arrays, dropout_rng,
                      train: bool):
        # `mask` marks real samples; False rows are mesh-padding (ragged
        # tail batches padded so B divides the device count).  They are
        # excluded from batch-norm statistics (sample_mask) and from the
        # loss, so padding never biases gradients — the torch reference
        # always trains on true batch sizes (train_ctc.py:42-98).
        inputs, fracs, targets, tsizes, trans, trsizes, mask = batch_arrays
        model_frames = None
        if self.device_frontend:
            from mdd_tpu.frontend.splice import batched_splice_skip

            raw_len = jnp.round(fracs * inputs.shape[1]).astype(jnp.int32)
            inputs, model_frames = batched_splice_skip(
                inputs, raw_len, self.left_ctx, self.right_ctx,
                self.n_skip_frame, self.n_downsample)
            fracs = model_frames.astype(jnp.float32) / inputs.shape[1]
        # static shape check: spliced dim must equal the model input dim
        # (a geometry mismatch between loader and Trainer would otherwise
        # only show up as silently degraded loss)
        assert inputs.shape[-1] == self.model_cfg.input_dim, (
            "spliced feature dim %d != model input_dim %d — splice "
            "geometry (left_ctx/right_ctx) disagrees between the loader "
            "and the Trainer" % (inputs.shape[-1], self.model_cfg.input_dim))
        variables = {"params": params, "batch_stats": batch_stats}
        if train:
            log_probs, updates = self.model.apply(
                variables, inputs, trans, trsizes, train=True,
                sample_mask=mask,
                rngs={"dropout": dropout_rng}, mutable=["batch_stats"])
            new_stats = updates["batch_stats"]
        else:
            log_probs = self.model.apply(
                variables, inputs, trans, trsizes, train=False,
                sample_mask=mask)
            new_stats = batch_stats
        out_len = log_probs.shape[0]
        if model_frames is not None:
            input_sizes = exact_output_sizes(model_frames, out_len,
                                             inputs.shape[1])
        else:
            # host-spliced path: fractions are all the loader ships;
            # floor(frac * out_len) reproduces the reference's length
            # bookkeeping (train_ctc.py:68)
            input_sizes = (fracs * out_len).astype(jnp.int32)
        nll = ctc_loss(log_probs, input_sizes, targets, tsizes)
        maskf = mask.astype(nll.dtype)
        # CTCLoss(sum) / true batch size — reference train_ctc.py:72-74.
        loss = jnp.sum(nll * maskf) / jnp.maximum(jnp.sum(maskf), 1.0)
        # greedy train-WER entirely on device (ops/wer.py): collapse +
        # batched Levenshtein in-graph, so the step emits two scalars
        # instead of a (B, T') id tensor — fetching ids off a
        # remote-attached TPU cost ~100 ms/step of round-trips
        from mdd_tpu.ops.wer import greedy_wer_counts

        ids = jnp.argmax(log_probs, axis=-1).swapaxes(0, 1)
        errs, tokens = greedy_wer_counts(ids, input_sizes, targets,
                                         tsizes, mask)
        return loss, (new_stats, errs, tokens)

    @staticmethod
    def _acc_update(acc, loss, errs, tokens):
        # device-resident metric accumulator (4,) float32:
        # [loss_sum, wer_errors, wer_tokens, n_batches] — fetched once
        # per print boundary / epoch instead of per step
        return acc + jnp.stack([loss, errs.astype(jnp.float32),
                                tokens.astype(jnp.float32),
                                jnp.float32(1.0)])

    def _make_step(self, train: bool):
        data_sh = batch_sharding(self.mesh)
        repl = replicated(self.mesh)

        if train:
            def step(state: TrainState, batch_arrays, dropout_rng, acc):
                (loss, (new_stats, errs, tokens)), grads = jax.value_and_grad(
                    self._loss_and_out, has_aux=True)(
                        state.params, state.batch_stats, batch_arrays,
                        dropout_rng, True)
                updates, new_opt = self.optimizer(
                    learning_rate=self.scheduler.init_lr).update(
                        grads, state.opt_state, state.params)
                new_params = optax.apply_updates(state.params, updates)
                new_state = state.replace(params=new_params,
                                          batch_stats=new_stats,
                                          opt_state=new_opt,
                                          step=state.step + 1)
                return new_state, self._acc_update(acc, loss, errs, tokens)

            return jax.jit(
                step,
                in_shardings=(repl, (data_sh,) * 7, repl, repl),
                out_shardings=(repl, repl),
                donate_argnums=(0, 3))

        def eval_step(state: TrainState, batch_arrays, acc):
            loss, (_, errs, tokens) = self._loss_and_out(
                state.params, state.batch_stats, batch_arrays,
                jax.random.key(0), False)
            return self._acc_update(acc, loss, errs, tokens)

        return jax.jit(eval_step,
                       in_shardings=(repl, (data_sh,) * 7, repl),
                       out_shardings=repl,
                       donate_argnums=(2,))

    def _make_cached_step(self, train: bool, sharded_cache: bool = True):
        """Step over the device-resident feature cache (data.device_cache).

        The batch arrives as an index vector into the HBM-resident bucket
        array plus label/augmentation metadata — a few KB on the wire
        instead of the full feature payload.  The gather, SpecAugment
        masking, splice/skip and the whole train step fuse into one jit
        program; the cache array never moves after upload.

        With `sharded_cache` (the default layout — DeviceFeatureCache
        row-shards each bucket over the ('data',) axis so per-device HBM
        is ~corpus/N), batch assembly is a shard_map: each device takes
        the rows it owns for every global batch slot (out-of-shard slots
        contribute exact zeros) and one psum_scatter over ICI delivers
        slot k's row to the device that computes batch row k.  Exactly
        one device contributes each slot, so the assembled batch is
        bit-identical to a replicated-cache take; the ICI cost is one
        batch payload per step (~0.25 ms at v5e ICI bandwidth for a
        25 MB batch) against an N-fold HBM and upload saving.
        """
        assert self.device_frontend, (
            "the device cache stores raw features; construct the Trainer "
            "with device_frontend=True")
        from jax.sharding import NamedSharding, PartitionSpec as P

        from mdd_tpu.data.device_cache import make_cache_assemble
        from mdd_tpu.frontend.augment import apply_spec_augment_masks

        data_sh = batch_sharding(self.mesh)
        repl = replicated(self.mesh)

        if sharded_cache:
            cache_sh = NamedSharding(self.mesh, P("data"))
            idx_sh = repl      # every device needs all slots' row ids
        else:
            cache_sh = repl
            idx_sh = data_sh
        assemble = make_cache_assemble(self.mesh, sharded_cache)

        def gather(cache, idx, lengths, aug, rest):
            inputs = assemble(cache, idx)
            inputs = apply_spec_augment_masks(inputs, aug)
            fracs = lengths.astype(jnp.float32) / inputs.shape[1]
            return (inputs, fracs) + tuple(rest)

        if train:
            def step(state: TrainState, cache, idx, lengths, aug, rest,
                     dropout_rng, acc):
                batch_arrays = gather(cache, idx, lengths, aug, rest)
                (loss, (new_stats, errs, tokens)), grads = jax.value_and_grad(
                    self._loss_and_out, has_aux=True)(
                        state.params, state.batch_stats, batch_arrays,
                        dropout_rng, True)
                updates, new_opt = self.optimizer(
                    learning_rate=self.scheduler.init_lr).update(
                        grads, state.opt_state, state.params)
                new_params = optax.apply_updates(state.params, updates)
                new_state = state.replace(params=new_params,
                                          batch_stats=new_stats,
                                          opt_state=new_opt,
                                          step=state.step + 1)
                return new_state, self._acc_update(acc, loss, errs, tokens)

            return jax.jit(
                step,
                in_shardings=(repl, cache_sh, idx_sh, data_sh, data_sh,
                              (data_sh,) * 5, repl, repl),
                out_shardings=(repl, repl),
                donate_argnums=(0, 7))

        def eval_step(state: TrainState, cache, idx, lengths, aug, rest,
                      acc):
            batch_arrays = gather(cache, idx, lengths, aug, rest)
            loss, (_, errs, tokens) = self._loss_and_out(
                state.params, state.batch_stats, batch_arrays,
                jax.random.key(0), False)
            return self._acc_update(acc, loss, errs, tokens)

        return jax.jit(
            eval_step,
            in_shardings=(repl, cache_sh, idx_sh, data_sh, data_sh,
                          (data_sh,) * 5, repl),
            out_shardings=repl,
            donate_argnums=(6,))

    def _step_fn(self, train: bool, cached: bool = False,
                 sharded_cache: bool = True):
        key = (train, cached, cached and sharded_cache)
        if key not in self._jit_cache:
            self._jit_cache[key] = (
                self._make_cached_step(train, sharded_cache) if cached
                else self._make_step(train))
        return self._jit_cache[key]

    # ------------------------------------------------------------------
    def _batch_arrays(self, batch: Batch, valid: Optional[np.ndarray] = None):
        if valid is None:
            valid = np.ones(batch.size, bool)
        arrays = (batch.inputs, batch.input_fracs, batch.targets,
                  batch.target_sizes, batch.trans, batch.trans_sizes,
                  np.asarray(valid, bool))
        return shard_batch(self.mesh, tuple(jnp.asarray(a) for a in arrays))

    def run_epoch(
        self,
        loader: Iterable[Batch],
        epoch: int,
        train: bool,
        print_every: int = 50,
        log=print,
    ) -> Tuple[float, float]:
        """-> (acc = 1 - WER, mean loss) — reference run_epoch contract.

        Accepts either host Batches (BucketedLoader) or CachedBatches
        (data.device_cache.CachedLoader): cached batches dispatch the
        gather-from-HBM step so epochs >= 2 move no feature bytes over
        the host->device link.
        """
        from mdd_tpu.data.device_cache import CachedBatch

        step_fn = self._step_fn(train)
        cached_step_fn = None
        cache = getattr(loader, "cache", None)
        # per-host row quantum: under a real multi-process run each host
        # contributes its local rows (shard_batch assembles the global
        # batch), so padding targets the LOCAL device count
        n_dev = max(1, self.mesh.devices.size // jax.process_count())
        # pad ragged tails to the loader's full batch size (rounded to the
        # mesh) — padding only to a multiple of n_dev gave every distinct
        # tail size its own jit recompile
        full_b = getattr(loader, "batch_size", None)
        # Metrics live in a device-resident (4,) accumulator
        # [loss_sum, wer_errs, wer_tokens, n_batches] updated inside the
        # jit step (greedy WER included — ops/wer.py): the epoch loop is
        # pure dispatch, with exactly one device->host fetch per
        # print_every boundary and one at epoch end.  On remote-attached
        # TPUs per-step fetches cost ~100 ms of round trips — more than
        # the 48 ms step itself.  Under multi-process runs the in-graph
        # sums already span the global batch, so the fetched metrics are
        # identical on every host (the plateau scheduler stays in sync).
        acc = jax.device_put(jnp.zeros(4, jnp.float32),
                             replicated(self.mesh))

        def fetch(a):
            vals = np.asarray(jax.device_get(a))
            loss_sum, errs, tokens, n_b = (float(v) for v in vals)
            return (loss_sum / max(1.0, n_b), errs / max(1.0, tokens),
                    n_b)

        for i, batch in enumerate(loader):
            if isinstance(batch, CachedBatch):
                sharded = getattr(cache, "shard_rows", False)
                if cached_step_fn is None:
                    cached_step_fn = self._step_fn(train, cached=True,
                                                   sharded_cache=sharded)
                assert batch.size % n_dev == 0, (
                    "CachedLoader batch_size %d must divide the %d-device "
                    "mesh" % (batch.size, n_dev))
                rest = shard_batch(self.mesh, tuple(
                    jnp.asarray(a) for a in (
                        batch.targets, batch.target_sizes, batch.trans,
                        batch.trans_sizes, np.asarray(batch.valid, bool))))
                lengths, aug = shard_batch(self.mesh, tuple(
                    jnp.asarray(a) for a in (batch.lengths, batch.aug)))
                if sharded:
                    # row-sharded cache: every device needs the FULL
                    # global slot->row schedule (identical on all hosts)
                    gidx = batch.global_idx if batch.global_idx is not None \
                        else batch.idx
                    idx = jax.device_put(jnp.asarray(gidx),
                                         replicated(self.mesh))
                else:
                    (idx,) = shard_batch(self.mesh,
                                         (jnp.asarray(batch.idx),))
                cache_arr = cache.buckets[batch.bucket]
                if train:
                    self.rng, dropout_rng = jax.random.split(self.rng)
                    self.state, acc = cached_step_fn(
                        self.state, cache_arr, idx, lengths, aug, rest,
                        dropout_rng, acc)
                else:
                    acc = cached_step_fn(
                        self.state, cache_arr, idx, lengths, aug, rest,
                        acc)
            else:
                if (jax.process_count() > 1 and i == 0
                        and not getattr(loader, "shape_coordinated",
                                        False)):
                    import warnings

                    warnings.warn(
                        "multi-process run_epoch over a host-sharded "
                        "streaming loader with global_schedule disabled: "
                        "per-host bucket schedules can diverge in shape "
                        "and deadlock the collectives")
                target_b = (full_b if full_b and batch.size <= full_b
                            else batch.size)
                padded, valid = pad_batch_to(
                    batch, -(-target_b // n_dev) * n_dev)
                if padded.score_mask is not None:
                    # rows masked by the loader (global-schedule batch
                    # padding, multi-host wrap-around duplicates) are
                    # processed for shape/batch-count parity but excluded
                    # from loss, BN statistics and WER — each utterance
                    # counts once (the reference trains/scores every utt
                    # exactly once per epoch)
                    valid = valid & np.asarray(padded.score_mask, bool)
                arrays = self._batch_arrays(padded, valid)
                if train:
                    self.rng, dropout_rng = jax.random.split(self.rng)
                    self.state, acc = step_fn(self.state, arrays,
                                              dropout_rng, acc)
                else:
                    acc = step_fn(self.state, arrays, acc)
            if train and (i + 1) % print_every == 0:
                avg, wer, _ = fetch(acc)
                log("Epoch = %d, step = %d, total_loss = %.4f, total_wer = %.4f"
                    % (epoch, i + 1, avg, wer))

        avg_loss, wer, _ = fetch(acc)
        log("Epoch %d %s done, total_loss: %.4f, total_wer: %.4f"
            % (epoch, "Train" if train else "Valid", avg_loss, wer))
        return 1.0 - wer, avg_loss

    # ------------------------------------------------------------------
    def add_weight_noise(self, std: float = 0.075) -> None:
        """Add N(0, std) noise to every parameter.

        Port of the reference's `add_weights_noise` (model_ctc.py:246-249)
        behind an explicit call: in the reference it is dead code — no
        trainer invokes it, and its `param = Parameter(...)` rebinds a
        local so it would be a no-op even if called.  Ours actually
        perturbs the parameters; enable per-epoch via the
        `weight_noise_std` constructor arg.
        """
        self.rng, sub = jax.random.split(self.rng)
        leaves, treedef = jax.tree.flatten(self.state.params)
        keys = jax.random.split(sub, len(leaves))
        noisy = [l + std * jax.random.normal(k, l.shape, l.dtype)
                 for l, k in zip(leaves, keys)]
        self.state = self.state.replace(
            params=jax.device_put(jax.tree.unflatten(treedef, noisy),
                                  replicated(self.mesh)))

    def _host_state(self):
        return jax.device_get(self.state)

    def _tree_copy(self, tree):
        """Whole-tree deep copy in ONE jit dispatch.

        Per-leaf jnp.copy dispatches one op per leaf — ~250 round
        trips over a remote-attached chip's tunnel, measured 6 s per
        snapshot.  A single jitted identity-copy program moves the
        same bytes in one dispatch (~ms)."""
        if not hasattr(self, "_tree_copy_fn"):
            self._tree_copy_fn = jax.jit(
                lambda t: jax.tree.map(jnp.copy, t))
        return self._tree_copy_fn(tree)

    def _device_snapshot(self):
        """Deep-copy the current state into fresh DEVICE buffers.

        Plateau best-state snapshots used to round-trip through the
        host; on a remote-attached chip fetching ~200 MB of
        params+optimizer state costs ~20 s — paid on every
        improvement epoch.  A device-side copy is ~free and never
        crosses the link.  A real copy is required (not device_put):
        the live state's buffers are donated into the next step, so
        aliasing them would invalidate the snapshot."""
        return self._tree_copy(self.state)

    def _restore_snapshot(self, snap):
        """Install a device snapshot as the live state (by copy — the
        live state gets donated, which must not consume the snapshot:
        the plateau machine can restore the same best state several
        times, train_ctc.py:258-265)."""
        self.state = self._tree_copy(snap)

    def _set_lr(self, lr: float) -> None:
        self.state = self.state.replace(
            opt_state=self.state.opt_state._replace(
                hyperparams={**self.state.opt_state.hyperparams,
                             "learning_rate": jnp.asarray(lr)}))

    def fit(
        self,
        train_loader,
        dev_loader,
        num_epochs: int = 500,
        print_every: int = 50,
        checkpoint_dir: Optional[str] = None,
        exp_name: str = "default",
        log=print,
        resume: bool = False,
        checkpoint_every: int = 5,
    ) -> Dict[str, Any]:
        """checkpoint_every: save the resumable 'latest' checkpoint every
        N epochs (plus always on the final epoch).  Saving fetches the
        whole state over the host link (~20 s at recipe scale on a
        remote-attached chip vs a ~2 s epoch), so per-epoch saves
        dominated wall clock; a crash now loses at most N-1 epochs of
        ~seconds-each work."""
        sched = self.scheduler
        epoch = 0
        if resume and checkpoint_dir:
            import os

            if os.path.exists(os.path.join(checkpoint_dir, exp_name,
                                           "latest")):
                epoch = self.restore(checkpoint_dir, exp_name, "latest")
                # fast-forward the loaders' epoch counters so the
                # resumed run continues the original augmentation /
                # shuffle rng sequence instead of replaying epoch 1's
                # (round-3 advisor finding)
                for ld in (train_loader, dev_loader):
                    set_ep = getattr(ld, "set_epoch", None)
                    if set_ep is not None:
                        set_ep(epoch)
                log(f"resumed from epoch {epoch} "
                    f"(lr {sched.learning_rate:.5f})")
        start = time.time()
        while not sched.stopped and epoch < num_epochs:
            epoch += 1
            self._set_lr(sched.learning_rate)
            if self.weight_noise_std > 0:
                self.add_weight_noise(self.weight_noise_std)
            log("Start training epoch: %d, learning_rate: %.5f"
                % (epoch, sched.learning_rate))
            _, train_loss = self.run_epoch(train_loader, epoch, True,
                                           print_every, log)
            acc, dev_loss = self.run_epoch(dev_loader, epoch, False,
                                           print_every, log)
            self.loss_results.append(train_loss)
            self.dev_loss_results.append(dev_loss)
            self.dev_acc_results.append(acc)

            action = sched.step(dev_loss, acc)
            if action & PlateauAction.SNAPSHOT_LOSS:
                self._snapshot = self._device_snapshot()
            if action & PlateauAction.SNAPSHOT_ACC:
                self._best_acc_state = self._device_snapshot()
            if action & PlateauAction.DECAY_AND_RESTORE and self._snapshot is not None:
                self._restore_snapshot(self._snapshot)
            log("adjust_rate_count:%d adjust_time:%d"
                % (sched.adjust_rate_count, sched.adjust_time))
            log("epoch %d done, cv acc is: %.4f, time_used: %.4f minutes"
                % (epoch, acc, (time.time() - start) / 60))
            done = sched.stopped or epoch >= num_epochs
            if checkpoint_dir and (epoch % max(checkpoint_every, 1) == 0
                                   or done):
                # async: the ~20 s state fetch + write overlaps the next
                # epochs' compute (the snapshot is an on-chip copy, so
                # donation of the live state cannot race the fetch)
                self.save_async(checkpoint_dir, exp_name, "latest", epoch)

        log("End training, best dev loss is: %.4f, acc is: %.4f"
            % (sched.loss_best, sched.acc_best))
        self.join_saves()           # the final 'latest' must be durable
        if self._best_acc_state is not None:
            self._restore_snapshot(self._best_acc_state)
        if checkpoint_dir:
            self.save(checkpoint_dir, exp_name, "best", epoch)
        return {"loss_results": self.loss_results,
                "dev_loss_results": self.dev_loss_results,
                "dev_acc_results": self.dev_acc_results,
                "best_dev_loss": sched.loss_best,
                "best_acc": sched.acc_best,
                "epochs": epoch}

    def _save_meta(self, epoch: int) -> Dict[str, Any]:
        return {
            "model_config": dataclasses.asdict(self.model_cfg),
            "epoch": epoch,
            "loss_results": list(self.loss_results),
            "dev_loss_results": list(self.dev_loss_results),
            "dev_acc_results": list(self.dev_acc_results),
            "learning_rate": self.scheduler.learning_rate,
            "scheduler": dataclasses.asdict(self.scheduler),
        }

    def save(self, directory: str, exp_name: str, tag: str, epoch: int) -> str:
        import os

        self.join_saves()
        host = self._host_state()
        return save_checkpoint(os.path.join(directory, exp_name), tag,
                               host.params, host.batch_stats,
                               self._save_meta(epoch),
                               opt_state=host.opt_state if tag == "latest"
                               else None)

    def save_async(self, directory: str, exp_name: str, tag: str,
                   epoch: int) -> None:
        """Save off the critical path: take a device-side snapshot (a
        ~free on-chip copy — the live state's buffers get donated, a
        background fetch of them would race) and let a worker thread do
        the ~20 s host fetch + write while training continues.  At most
        one save is in flight; meta is captured synchronously."""
        import os
        import threading

        self.join_saves()           # never pile up fetches
        snap = self._device_snapshot()
        meta = self._save_meta(epoch)
        path = os.path.join(directory, exp_name)

        def work():
            host = jax.device_get(snap)
            save_checkpoint(path, tag, host.params, host.batch_stats,
                            meta, opt_state=host.opt_state
                            if tag == "latest" else None)

        self._save_thread = threading.Thread(target=work, daemon=True)
        self._save_thread.start()

    def join_saves(self) -> None:
        """Block until any in-flight async save has committed."""
        if self._save_thread is not None:
            self._save_thread.join()
            self._save_thread = None

    def restore(self, directory: str, exp_name: str,
                tag: str = "latest") -> int:
        """Resume from a saved checkpoint (no reference equivalent — the
        reference only saves the final best model, SURVEY.md §5).

        Restores params / batch_stats / optimizer state / scheduler /
        loss histories.  Returns the epoch to continue from.
        """
        import os

        from mdd_tpu.train.checkpoint import load_checkpoint

        host = self._host_state()
        target = {"params": host.params, "batch_stats": host.batch_stats}
        if tag == "latest":
            target["opt_state"] = host.opt_state
        state, meta = load_checkpoint(
            os.path.join(directory, exp_name), tag, target=target)
        new = host.replace(
            params=state["params"], batch_stats=state["batch_stats"],
            opt_state=state.get("opt_state", host.opt_state))
        self.state = jax.device_put(new, replicated(self.mesh))
        sched = meta.get("scheduler", {})
        for k, v in sched.items():
            if hasattr(self.scheduler, k):
                setattr(self.scheduler, k, v)
        self.loss_results = list(meta.get("loss_results", []))
        self.dev_loss_results = list(meta.get("dev_loss_results", []))
        self.dev_acc_results = list(meta.get("dev_acc_results", []))
        return int(meta.get("epoch", 0))
