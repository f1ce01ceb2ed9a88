"""
Training loop.

Feature parity with the reference Trainer (bonito/training.py:91-275):
epoch loop with per-step CSV loss logs, bf16 mixed precision (the TPU
equivalent of the reference's fp16 autocast+GradScaler — bf16 needs no loss
scaling), gradient accumulation, quantile-based gradient clipping,
checkpoint/resume, and validation with decoding + alignment accuracy.

TPU-first: the whole optimisation step (grad accumulation loop included) is
ONE jitted function; multi-chip data/model parallelism comes from sharding
annotations on the same step (bonito_tpu.parallel), not from a distributed
rewrite.
"""

import math
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import optax

from bonito_tpu import nn
from bonito_tpu.schedule import linear_warmup_cosine_decay
from bonito_tpu.util import accuracy, decode_ref
from bonito_tpu.io import CSVLogger
from bonito_tpu.checkpoint import (
    load_params, save_checkpoint, load_optim_state,
)


class ClipGrad:
    """Quantile-adaptive gradient-norm clip (reference: bonito/training.py:72-88)."""

    def __init__(self, quantile=0.5, factor=2.0, buffer_size=100):
        self.buffer = np.full(buffer_size, fill_value=1e6)
        self.quantile = quantile
        self.factor = factor
        self.i = 0

    def append(self, grad_norm):
        self.buffer[self.i] = grad_norm
        self.i = (self.i + 1) % len(self.buffer)

    def max_norm(self):
        return float(self.factor * np.quantile(self.buffer, self.quantile))

    def update(self, grad_norm):
        if not math.isnan(grad_norm):
            self.append(grad_norm)


def _merge_bn_updates(params, updates):
    """Write BatchNorm running-stat updates (path -> {mean, var}) into params."""
    def set_path(tree, parts, leaf):
        if not parts:
            merged = dict(tree)
            merged.update(leaf)
            return merged
        out = dict(tree)
        out[parts[0]] = set_path(tree[parts[0]], parts[1:], leaf)
        return out

    for path, stats in updates.items():
        params = set_path(params, path.split("."), stats)
    return params


def _use_tcn(model, criterion):
    """One TCN-eligibility gate for BOTH the train step and validation:
    editing the condition in one place cannot silently make validation
    measure a different forward path than training."""
    return (
        criterion is None
        and hasattr(model, "forward_tcn")
        and getattr(model, "decode_head", lambda: None)() is not None
    )


def make_train_step(model, tx, use_amp=True, grad_accum_split=1, criterion=None):
    """
    Build the jitted train step:
        (params, opt_state, batch, lr_scale, clip_max) ->
        (params, opt_state, losses, grad_norm)
    """
    # TCN path: the default CRF loss runs from forward_tcn's prep-free
    # [T, moves, N] layout (no [N, T, C] scores tensor, no batch-minor
    # transposes in the logZ VJP). Custom criteria keep the scores path.
    use_tcn = _use_tcn(model, criterion)
    criterion = criterion or model.loss

    def forward_loss(params, data, targets, lengths, rng=None):
        run_params = nn.cast_tree(params, jnp.bfloat16) if use_amp else params
        ctx = {"train": True, "updates": {}}
        if rng is not None:
            # per-step dropout key; layers derive per-SITE keys via the
            # shared counter list (dict(ctx) copies in _push_path share
            # the same list object, so every site folds a distinct n)
            ctx["dropout_key"] = rng
            ctx["dropout_ctr"] = [0]
        data = data.astype(jnp.bfloat16 if use_amp else jnp.float32)
        if use_tcn:
            moves_tcn, blank = model.forward_tcn(run_params, data, ctx)
            losses = model.loss_tcn(moves_tcn, blank, targets, lengths)
        else:
            scores = model.apply(run_params, data, ctx)
            losses = criterion(scores, targets, lengths)
        if not isinstance(losses, dict):
            losses = {"loss": losses}
        total = losses.get("total_loss", losses["loss"])
        return total, (losses, ctx["updates"])

    grad_fn = jax.value_and_grad(forward_loss, has_aux=True)

    def step(params, opt_state, batch, lr_scale, clip_max, rng=None):
        data, targets, lengths = batch

        if grad_accum_split > 1:
            # first microbatch runs outside the scan to establish the
            # carry pytree (losses/BN-update dicts have data-dependent
            # keys; a scan carry must keep one structure throughout —
            # starting from {} was a trace-time TypeError)
            split = lambda x: x.reshape(
                grad_accum_split, x.shape[0] // grad_accum_split,
                *x.shape[1:])
            mbs = (split(data), split(targets), split(lengths))
            first = tuple(x[0] for x in mbs)
            rest = tuple(x[1:] for x in mbs)
            if rng is not None:
                # distinct dropout key per microbatch, scanned alongside
                mb_keys = jax.vmap(
                    lambda i: jax.random.fold_in(rng, i))(
                        jnp.arange(grad_accum_split))
                rest = (*rest, mb_keys[1:])
            (_, (losses0, upd0)), grads0 = grad_fn(
                params, *first,
                *((mb_keys[0],) if rng is not None else ()))
            losses0 = {k: v / grad_accum_split for k, v in losses0.items()}

            def micro(carry, mb):
                acc_grads, acc_losses, _ = carry
                (_, (losses, upd)), grads = grad_fn(params, *mb)
                acc_grads = jax.tree.map(jnp.add, acc_grads, grads)
                acc_losses = {k: acc_losses[k] + losses[k] / grad_accum_split
                              for k in acc_losses}
                # keep the latest microbatch's BN running-stat updates
                # (the non-accum path merges one batch's too)
                return (acc_grads, acc_losses, upd), None

            (grads, losses, updates_bn), _ = jax.lax.scan(
                micro, (grads0, losses0, upd0), rest)
            grads = jax.tree.map(lambda g: g / grad_accum_split, grads)
        else:
            (_, (losses, updates_bn)), grads = grad_fn(
                params, data, targets, lengths,
                *(() if rng is None else (rng,)))

        grad_norm = optax.global_norm(grads)
        scale = jnp.minimum(1.0, clip_max / (grad_norm + 1e-12))
        grads = jax.tree.map(lambda g: g * scale, grads)

        upd, opt_state = tx.update(grads, opt_state, params)
        upd = jax.tree.map(lambda u: u * lr_scale, upd)
        params = optax.apply_updates(params, upd)
        if updates_bn:
            params = _merge_bn_updates(params, updates_bn)
        return params, opt_state, losses, grad_norm

    return jax.jit(step, donate_argnums=(0, 1))


def load_state(workdir, model, want_optim=False):
    """Resume epoch number + weights (+ optimizer state) from a workdir.

    Matches the reference's pick (bonito/training.py:24-69): with
    ``want_optim`` the resume epoch is the newest one that has BOTH a
    weights and an optim checkpoint; otherwise the newest weights.
    """
    workdir = Path(workdir)
    weight_epochs = {
        int(p.stem.split("_")[1]) for p in workdir.glob("weights_*.npz")}
    if want_optim:
        optim_epochs = {
            int(p.stem.split("_")[1]) for p in workdir.glob("optim_*.pkl")}
        epoch = max(weight_epochs & optim_epochs, default=None)
    else:
        epoch = max(weight_epochs, default=None)
    if epoch is None:
        return 0, None
    model.params = load_params(workdir / f"weights_{epoch}.npz")
    opt_state = load_optim_state(workdir, epoch) if want_optim else None
    return epoch, opt_state


class Trainer:
    def __init__(self, model, train_loader, valid_loader, criterion=None,
                 use_amp=True, lr_scheduler_fn=None, restore_optim=False,
                 save_optim_every=10, grad_accum_split=1,
                 quantile_grad_clip=False, chunks_per_epoch=None,
                 batch_size=None, mesh=None):
        self.model = model
        self.train_loader = train_loader
        self.valid_loader = valid_loader
        self.criterion = criterion
        self.use_amp = use_amp
        self.lr_scheduler_fn = lr_scheduler_fn or linear_warmup_cosine_decay()
        self.restore_optim = restore_optim
        self.save_optim_every = save_optim_every
        self.grad_accum_split = grad_accum_split
        self.quantile_clip = ClipGrad() if quantile_grad_clip else None
        self.fixed_clip = 2.0
        self.mesh = mesh
        self.batch_size = batch_size
        self.chunks_per_epoch = chunks_per_epoch
        self.steps_per_epoch = (
            chunks_per_epoch // batch_size if chunks_per_epoch else None)
        self.optimizer = None
        self.opt_state = None
        self._step_fn = None
        self._valid_fn = None
        self._lr_schedule = None
        self._base_lr = None
        self._sched_step = 0

    def init_optimizer(self, lr, **kwargs):
        """AdamW by default; pluggable via config [optim] package/symbol
        (reference: bonito/training.py:221-229)."""
        package = kwargs.pop("package", None)
        symbol = kwargs.pop("symbol", None)
        if package or symbol:
            from importlib import import_module
            mod = import_module(package or "optax")
            factory = getattr(mod, symbol or "adamw")
        else:
            factory = optax.adamw
            kwargs.setdefault("weight_decay", 0.01)
            kwargs.setdefault("eps", 1e-8)
        self.optimizer = factory(learning_rate=lr, **kwargs)
        self.opt_state = self.optimizer.init(self.model.params)
        return self.optimizer

    def get_lr_scale(self, step, epochs, last_epoch):
        if self._lr_schedule is None:
            self._lr_schedule = self.lr_scheduler_fn(
                self.steps_per_epoch, epochs, last_epoch)
        return self._lr_schedule(step)

    def _put_batch(self, batch):
        if self.mesh is None:
            return tuple(jnp.asarray(b) for b in batch)
        from bonito_tpu import parallel
        sharding = parallel.batch_sharding(self.mesh)
        if jax.process_count() > 1:
            # multi-host: every host contributes its local rows to the
            # global batch (hosts load disjoint data via host_slice)
            return tuple(
                jax.make_array_from_process_local_data(
                    sharding, np.asarray(b))
                for b in batch)
        return tuple(jax.device_put(np.asarray(b), sharding) for b in batch)

    def train_one_step(self, batch, lr_scale):
        clip_max = (self.quantile_clip.max_norm()
                    if self.quantile_clip else self.fixed_clip)
        # per-step dropout key (deterministic in the schedule step);
        # models without dropout sites simply never consume it
        rng = jax.random.PRNGKey(self._sched_step)
        self.model.params, self.opt_state, losses, grad_norm = self._step_fn(
            self.model.params, self.opt_state, self._put_batch(batch),
            jnp.float32(lr_scale), jnp.float32(clip_max), rng)
        return losses, grad_norm

    def train_one_epoch(self, loss_log, epoch, epochs, last_epoch):
        t0 = time.perf_counter()
        chunks = 0
        smoothed_loss = None
        # schedule steps count ACTUAL batches run since the resume point
        # (self._sched_step, reset in fit): a loader that yields fewer
        # than steps_per_epoch batches must not skip the LR schedule
        # ahead each epoch. The schedule itself offsets the resume point
        # by start_step = last_epoch * steps_per_epoch (schedule.py) —
        # an absolute step here would double-count completed epochs.
        pending = None

        def materialize(record):
            # blocking device->host fetch: runs only after the NEXT step
            # has been dispatched, so the round trip (~25 ms through a
            # remote-device tunnel) overlaps device compute instead of
            # serialising against it
            nonlocal smoothed_loss
            losses, grad_norm, n_chunks, lr_scale = record
            losses = {k: float(v) for k, v in losses.items()}
            grad_norm = float(grad_norm)
            if self.quantile_clip:
                # clip_max for step i+1 is thus derived from steps <= i-1;
                # one step of lag is immaterial for a quantile over the
                # last 100 norms
                self.quantile_clip.update(grad_norm)
            smoothed_loss = (
                losses["loss"] if smoothed_loss is None
                else 0.01 * losses["loss"] + 0.99 * smoothed_loss)
            if loss_log is not None:
                loss_log.append({
                    "chunks": n_chunks,
                    "time": time.perf_counter() - t0,
                    "grad_norm": grad_norm,
                    "lr": lr_scale * (self._base_lr or 1.0),
                    **losses,
                })

        # cap at steps_per_epoch so unbounded plugin loaders still yield
        # epochs (reference: bonito/training.py:165), with the same
        # chunk-count progress bar
        from itertools import islice
        from tqdm import tqdm
        from bonito_tpu.util import tqdm_environ
        with tqdm(total=self.steps_per_epoch,
                  desc=f"[0/{self.chunks_per_epoch}]", ascii=True,
                  leave=True, ncols=100,
                  bar_format="{l_bar}{bar}| [{elapsed}{postfix}]",
                  **tqdm_environ()) as progress:
            for batch in islice(self.train_loader, self.steps_per_epoch):
                lr_scale = self.get_lr_scale(
                    self._sched_step, epochs, last_epoch)
                self._sched_step += 1
                losses, grad_norm = self.train_one_step(batch, lr_scale)
                chunks += batch[0].shape[0]
                if pending is not None:
                    materialize(pending)
                pending = (losses, grad_norm, chunks, lr_scale)
                if smoothed_loss is not None:
                    progress.set_postfix(loss=f"{smoothed_loss:.4f}")
                progress.set_description(
                    f"[{chunks}/{self.chunks_per_epoch}]", refresh=False)
                progress.update()
            if pending is not None:
                materialize(pending)
        return smoothed_loss, time.perf_counter() - t0

    def _get_valid_fn(self):
        """ONE jitted function per validation-batch shape: forward + loss
        (+ fused Viterbi decode for seqdist models) all on device —
        op-by-op dispatch through a remote-device tunnel makes an eager
        validation loop pathologically slow at real sizes."""
        if self._valid_fn is None:
            model = self.model
            criterion = self.criterion or self.model.loss
            emits_codes = hasattr(model, "seqdist")
            # prep-free TCN route (same gate as the train step, so
            # validation measures the path that trained)
            use_tcn = _use_tcn(model, self.criterion)

            use_amp = self.use_amp

            @jax.jit
            def step(params, data, targets, lengths):
                # match the train step's amp numerics (bf16 params+data):
                # an f32 validation forward costs ~2x device time and
                # measures numerics that match neither training nor the
                # deployed bf16 model
                if use_amp:
                    params = nn.cast_tree(params, jnp.bfloat16)
                    data = data.astype(jnp.bfloat16)
                if use_tcn:
                    from bonito_tpu.ops.decode import viterbi_decode_tcn
                    mv, blank = model.forward_tcn(params, data)
                    losses = model.loss_tcn(mv, blank, targets, lengths)
                    if not isinstance(losses, dict):
                        losses = {"loss": losses}
                    codes = viterbi_decode_tcn(
                        model.seqdist, mv, blank)["sequence"]
                    return losses, codes, None
                scores = model.apply(params, data)
                losses = criterion(scores, targets, lengths)
                if not isinstance(losses, dict):
                    losses = {"loss": losses}
                if emits_codes:
                    from bonito_tpu.ops.decode import viterbi_decode
                    codes = viterbi_decode(model.seqdist, scores)["sequence"]
                    return losses, codes, scores
                return losses, None, scores

            self._valid_fn = step
        return self._valid_fn

    def _dispatch_valid(self, batch):
        """Launch the jitted validation step; returns device arrays
        without synchronising."""
        data, targets, lengths = batch
        data = np.asarray(data, np.float32)
        if data.ndim == 2:
            data = data[..., None]
        if self.mesh is not None and jax.process_count() > 1:
            # params are global arrays; batches must be too — each host
            # scores its own rows in _finish_valid
            from bonito_tpu import parallel
            sharding = parallel.batch_sharding(self.mesh)
            data, targets, lengths = (
                jax.make_array_from_process_local_data(sharding,
                                                       np.asarray(b))
                for b in (data, targets, lengths))
        return self._get_valid_fn()(
            self.model.params, jnp.asarray(data),
            jnp.asarray(targets), jnp.asarray(lengths))

    @staticmethod
    def _local_rows(arr):
        """This host's rows of a batch-sharded global array (the whole
        array when it is addressable)."""
        if isinstance(arr, jax.Array) and not arr.is_fully_addressable:
            shards = sorted(arr.addressable_shards,
                            key=lambda s: s.index[0].start or 0)
            return np.concatenate([np.asarray(s.data) for s in shards])
        return np.asarray(arr)

    def _finish_valid(self, outputs, batch):
        """Host side of one validation batch: fetch device outputs, decode
        to strings, score accuracies (this host's rows only)."""
        _, targets, lengths = batch
        losses, codes, scores = outputs
        losses = {k: float(v) for k, v in losses.items()}
        if codes is not None:
            codes = self._local_rows(codes)
        elif scores is not None:
            scores = self._local_rows(scores)
        if codes is not None:
            seqs = [self.model.seqdist.path_to_str(p)
                    for p in np.asarray(codes)]
        else:
            seqs = self.model.decode_batch(scores)
        refs = [decode_ref(t[:l], self.model.alphabet)
                for t, l in zip(np.asarray(targets), np.asarray(lengths))]
        n_pre = getattr(self.model, "n_pre_context_bases", 0)
        n_post = getattr(self.model, "n_post_context_bases", 0)
        if n_pre or n_post:
            refs = [r[n_pre:len(r) - n_post if n_post else len(r)] for r in refs]
        accs = [accuracy(ref, seq, min_coverage=0.5) if len(seq) else 0.0
                for ref, seq in zip(refs, seqs)]
        return seqs, refs, accs, losses

    def validate_one_step(self, batch):
        return self._finish_valid(self._dispatch_valid(batch), batch)

    def validate_one_epoch(self):
        """One-batch pipelining: batch i+1's device step is dispatched
        before batch i's host work (decode-to-string + accuracy scoring),
        so alignment scoring overlaps device compute."""
        accs, losses = [], []
        pending = None

        def finish(outputs, batch):
            _, _, a, l = self._finish_valid(outputs, batch)
            accs.extend(a)
            losses.append(l.get("total_loss", l["loss"]))

        if jax.process_count() > 1:
            # every host must issue the same jitted calls (they contain
            # collectives): keep only full-size batches and truncate to
            # the cross-host minimum count
            from jax.experimental import multihost_utils
            full = [b for b in self.valid_loader
                    if not self.batch_size or b[0].shape[0] == self.batch_size]
            n = int(multihost_utils.process_allgather(
                np.asarray(len(full))).min())
            loader = full[:n]
        else:
            loader = self.valid_loader

        for batch in loader:
            outputs = self._dispatch_valid(batch)
            if pending is not None:
                finish(*pending)
            pending = (outputs, batch)
        if pending is not None:
            finish(*pending)

        if jax.process_count() > 1:
            # gather every host's accuracies (loss is already a global
            # mean); hosts may hold different chunk counts, so pad to the
            # gathered max and mask
            from jax.experimental import multihost_utils
            n = int(multihost_utils.process_allgather(
                np.asarray(len(accs))).max())
            padded = np.full(n, np.nan)
            padded[:len(accs)] = accs
            gathered = np.asarray(
                multihost_utils.process_allgather(padded)).ravel()
            accs = gathered[~np.isnan(gathered)]
        return float(np.mean(losses)), float(np.mean(accs)), float(np.median(accs))

    def fit(self, workdir, epochs=1, lr=2e-3, **optim_kwargs):
        workdir = Path(workdir)
        workdir.mkdir(parents=True, exist_ok=True)
        if self.steps_per_epoch is None:
            raise ValueError("chunks_per_epoch/batch_size must be set before fit")

        if (self.grad_accum_split > 1 and self.batch_size
                and self.batch_size % self.grad_accum_split):
            raise ValueError(
                f"batch size {self.batch_size} must divide by "
                f"--grad-accum-split {self.grad_accum_split} (the "
                f"accumulation scan needs equal microbatches; pick a "
                f"divisor of the batch size)")
        # logged 'lr' must be the REAL learning rate (schedule multiplier
        # x base), matching the reference's get_last_lr() CSV column
        self._base_lr = (lr[0] if isinstance(lr, (list, tuple)) else lr)
        last_epoch, opt_state = load_state(
            workdir, self.model, want_optim=self.restore_optim)
        if self.model.params is None:
            self.model.init()
        self.init_optimizer(lr, **optim_kwargs)
        if self.restore_optim and opt_state is not None:
            self.opt_state = opt_state
        self._lr_schedule = None
        self._sched_step = 0   # actual batches run since the resume point
        self._step_fn = make_train_step(
            self.model, self.optimizer, use_amp=self.use_amp,
            grad_accum_split=self.grad_accum_split, criterion=self.criterion)

        # data-parallel training: batch sharded over the mesh's data axis,
        # params/optimizer replicated — GSPMD inserts the grad psums
        if self.mesh is None and jax.device_count() > 1:
            from bonito_tpu import parallel
            n = jax.device_count()
            # multi-host: the per-host batch must split over the *local*
            # devices (the global batch is per-host-batch x process_count)
            n_div = (jax.local_device_count()
                     if jax.process_count() > 1 else n)
            if self.batch_size and self.batch_size % n_div == 0:
                self.mesh = parallel.make_mesh(n_data=n)
        if self.mesh is not None:
            from bonito_tpu import parallel
            if jax.process_count() > 1:
                from jax.sharding import PartitionSpec
                from jax.experimental import multihost_utils
                to_global = lambda tree: (
                    multihost_utils.host_local_array_to_global_array(
                        jax.tree.map(np.asarray, tree), self.mesh,
                        PartitionSpec()))
                self.model.params = to_global(self.model.params)
                self.opt_state = to_global(self.opt_state)
            else:
                rep = parallel.replicated(self.mesh)
                self.model.params = jax.device_put(self.model.params, rep)
                self.opt_state = jax.device_put(self.opt_state, rep)

        # under multi-host every process trains the same SPMD step;
        # checkpoints/logs are written once, by process 0 (the workdir may
        # be on a shared filesystem)
        is_writer = jax.process_index() == 0

        # `epochs` is the absolute target: resuming from epoch 3 with
        # epochs=5 trains 2 more (reference: bonito/training.py:248)
        for epoch in range(last_epoch + 1, epochs + 1):
            if is_writer:
                with CSVLogger(workdir / f"losses_{epoch}.csv") as loss_log:
                    train_loss, duration = self.train_one_epoch(
                        loss_log, epoch, epochs, last_epoch)
            else:
                train_loss, duration = self.train_one_epoch(
                    None, epoch, epochs, last_epoch)

            if is_writer:
                save_checkpoint(
                    workdir, epoch, self.model.params,
                    self.opt_state if epoch % self.save_optim_every == 0
                    else None)

            val_loss, val_mean, val_median = (
                self.validate_one_epoch() if self.valid_loader is not None
                else (float("nan"),) * 3)

            if is_writer:
                with CSVLogger(workdir / "training.csv") as log:
                    log.append({
                        "time": time.strftime("%Y-%m-%d %H:%M:%S"),
                        "duration": int(duration),
                        "epoch": epoch,
                        "train_loss": train_loss,
                        "validation_loss": val_loss,
                        "validation_mean": val_mean,
                        "validation_median": val_median,
                    })
                print(f"[epoch {epoch}] train loss {train_loss:.4f} "
                      f"val loss {val_loss:.4f} val acc mean {val_mean:.2f}% "
                      f"median {val_median:.2f}% ({duration:.0f}s)")
