"""Trainer: loss decreases on a learnable toy problem, checkpoints/resume,
LR schedules, grad clipping."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bonito_tpu import schedule as sched


class TestSchedules:
    def test_linear_warmup_cosine_decay(self):
        fn = sched.linear_warmup_cosine_decay(
            end_ratio=0.1, warmup_steps=10)(steps_per_epoch=50, epochs=2)
        assert fn(0) < 0.2
        assert abs(fn(10) - 1.0) < 0.05
        assert abs(fn(100) - 0.1) < 0.01
        # monotone decay after warmup
        vals = [fn(s) for s in range(10, 100, 10)]
        assert all(a >= b for a, b in zip(vals, vals[1:]))

    def test_inverse_sqrt_schedule(self):
        fn = sched.linear_warmup_const_inverse_sqrt_decay(
            warmup_steps=5, decay_start_epoch=1)(steps_per_epoch=10, epochs=4)
        assert fn(0) == 0.0
        assert abs(fn(5) - 1.0) < 0.01
        assert abs(fn(9) - 1.0) < 0.01
        assert fn(39) < 1.0

    def test_linear_cooldown(self):
        fn = sched.linear_cooldown(end_ratio=0.0)(steps_per_epoch=10, epochs=1)
        assert abs(fn(0) - 1.0) < 1e-6
        assert fn(10) < 1e-6

    def test_resume_offset(self):
        build = sched.linear_warmup_cosine_decay(warmup_steps=0)
        fresh = build(10, 10, last_epoch=0)
        resumed = build(10, 10, last_epoch=5)
        assert abs(resumed(0) - fresh(50)) < 1e-9


class TestClipGrad:
    def test_quantile_buffer(self):
        from bonito_tpu.training import ClipGrad
        clip = ClipGrad(quantile=0.5, factor=2.0, buffer_size=10)
        assert clip.max_norm() == pytest.approx(2e6)
        for _ in range(10):
            clip.update(1.0)
        assert clip.max_norm() == pytest.approx(2.0)
        clip.update(float("nan"))  # ignored
        assert clip.max_norm() == pytest.approx(2.0)


class TestTrainerFit:
    @pytest.fixture(scope="class")
    def setup(self):
        """Tiny CRF model + synthetic dataset where signal encodes the
        target (learnable)."""
        from bonito_tpu.crf.model import Model
        from bonito_tpu.models import lstm_crf_config
        from bonito_tpu.data import ChunkDataSet, NumpyBatchLoader

        cfg = lstm_crf_config(features=48, num_layers=1, state_len=1,
                              stride=5, clamp=None)
        model = Model(cfg)
        model.init(jax.random.PRNGKey(0))

        rng = np.random.default_rng(0)
        N, T = 32, 200
        L = T // 5 - 2
        targets = rng.integers(1, 5, size=(N, L)).astype(np.int32)
        # signal: one 5-sample level per target base
        levels = np.array([-1.5, -0.5, 0.5, 1.5], np.float32)
        sig = levels[np.repeat(targets - 1, 5, axis=1)]
        sig = np.pad(sig, ((0, 0), (0, T - sig.shape[1])))
        sig += 0.05 * rng.normal(size=sig.shape).astype(np.float32)

        train = ChunkDataSet(sig[:24], targets[:24], np.full(24, L))
        valid = ChunkDataSet(sig[24:], targets[24:], np.full(8, L))
        return model, train, valid

    def test_fit_learns_and_checkpoints(self, setup, tmp_path):
        from bonito_tpu.data import NumpyBatchLoader
        from bonito_tpu.training import Trainer, load_state

        model, train, valid = setup
        trainer = Trainer(
            model,
            NumpyBatchLoader(train, 8, seed=1),
            NumpyBatchLoader(valid, 8, shuffle=False, drop_last=False),
            use_amp=False, quantile_grad_clip=True,
            chunks_per_epoch=24, batch_size=8,
        )
        trainer.fit(tmp_path, epochs=3, lr=5e-3)

        assert (tmp_path / "weights_3.npz").exists()
        assert (tmp_path / "training.csv").exists()
        assert (tmp_path / "losses_1.csv").exists()

        rows = (tmp_path / "training.csv").read_text().strip().split("\n")
        header = rows[0].split(",")
        first = dict(zip(header, rows[1].split(",")))
        last = dict(zip(header, rows[-1].split(",")))
        assert float(last["train_loss"]) < float(first["train_loss"])

        # resume picks the latest epoch
        epoch, _ = load_state(tmp_path, model)
        assert epoch == 3


class TestDataParallelFit:
    def test_fit_on_mesh_matches_semantics(self, tmp_path):
        """Trainer.fit auto-meshes over the 8 virtual devices (batch 16 is
        divisible) and still learns / checkpoints."""
        import jax
        from bonito_tpu.crf.model import Model
        from bonito_tpu.models import lstm_crf_config
        from bonito_tpu.data import ChunkDataSet, NumpyBatchLoader
        from bonito_tpu.training import Trainer

        cfg = lstm_crf_config(features=48, num_layers=1, state_len=1,
                              stride=5, clamp=None)
        model = Model(cfg)
        model.init(jax.random.PRNGKey(0))

        rng = np.random.default_rng(0)
        N, T = 32, 200
        L = T // 5 - 2
        targets = rng.integers(1, 5, size=(N, L)).astype(np.int32)
        levels = np.array([-1.5, -0.5, 0.5, 1.5], np.float32)
        sig = levels[np.repeat(targets - 1, 5, axis=1)]
        sig = np.pad(sig, ((0, 0), (0, T - sig.shape[1])))

        train = ChunkDataSet(sig[:24], targets[:24], np.full(24, L))
        trainer = Trainer(
            model, NumpyBatchLoader(train, 16, seed=1), None,
            use_amp=False, chunks_per_epoch=24, batch_size=16,
        )
        trainer.fit(tmp_path, epochs=2, lr=5e-3)
        assert trainer.mesh is not None  # auto-meshed over 8 CPU devices
        assert (tmp_path / "weights_2.npz").exists()
        rows = (tmp_path / "training.csv").read_text().strip().split("\n")
        header = rows[0].split(",")
        losses = [float(dict(zip(header, r.split(",")))["train_loss"])
                  for r in rows[1:]]
        assert losses[-1] < losses[0] * 1.5  # training proceeds sanely


class TestGradAccum:
    def test_grad_accum_step_runs_and_matches_fullbatch(self):
        """grad_accum_split > 1 previously failed at trace time (the
        scan carry started as (zeros, {}) while the body emitted a keyed
        losses dict). Pin: it compiles, runs, and the accumulated
        gradient step tracks the full-batch step closely."""
        import optax
        from bonito_tpu.crf.model import Model
        from bonito_tpu.models import lstm_crf_config
        from bonito_tpu.training import make_train_step

        cfg = lstm_crf_config(features=32, num_layers=1, state_len=1,
                              stride=5, clamp=None)
        model = Model(cfg)
        model.init(jax.random.PRNGKey(0))
        tx = optax.sgd(1e-2)
        opt = tx.init(model.params)

        rng = np.random.default_rng(0)
        N, T = 4, 200
        L = T // 5 - 2
        data = jnp.asarray(rng.normal(size=(N, T, 1)), jnp.float32)
        targets = jnp.asarray(rng.integers(1, 5, (N, L)), jnp.int32)
        lengths = jnp.full((N,), L, jnp.int32)
        batch = (data, targets, lengths)

        fresh = lambda t: jax.tree.map(jnp.array, t)  # step donates args
        step1 = make_train_step(model, tx, grad_accum_split=1)
        pa, _, la, _ = step1(fresh(model.params), tx.init(model.params),
                             batch, jnp.float32(1.0), jnp.float32(1e9))
        step2 = make_train_step(model, tx, grad_accum_split=2)
        pb, _, lb, _ = step2(fresh(model.params), tx.init(model.params),
                             batch, jnp.float32(1.0), jnp.float32(1e9))
        assert np.isfinite(float(lb["loss"]))
        # mean-of-micro losses == full-batch loss (same chunks)
        assert float(lb["loss"]) == pytest.approx(float(la["loss"]),
                                                  rel=1e-3)
        # parameters move in the same direction to close tolerance
        fa = jax.tree_util.tree_leaves(pa)[0]
        fb = jax.tree_util.tree_leaves(pb)[0]
        assert np.allclose(np.asarray(fa, np.float32),
                           np.asarray(fb, np.float32), atol=1e-3)


class TestResumeLrOffset:
    def test_epoch_steps_are_relative_to_resume(self):
        """On resume the schedule already offsets by last_epoch *
        steps_per_epoch; the per-epoch step base must be RELATIVE to the
        resume point or completed epochs are double-counted and the LR
        collapses to its floor (found in review)."""
        from bonito_tpu import schedule as s
        build = s.linear_warmup_cosine_decay(warmup_steps=0, end_ratio=0.1)
        spe, epochs = 10, 10
        fresh = build(spe, epochs, last_epoch=0)
        resumed = build(spe, epochs, last_epoch=5)
        # trainer: step0 = (epoch - 1 - last_epoch) * spe; at epoch 6,
        # step i of the resumed run must equal absolute step 50 + i
        for i in range(10):
            assert resumed(0 * spe + i) == pytest.approx(fresh(50 + i))


class TestScheduleEdgeCases:
    def test_inverse_sqrt_short_run_and_zero_warmup(self):
        """epochs shorter than decay_start+cooldown previously produced
        unsorted knots (searchsorted mis-routing) and sqrt of a negative
        span; warmup_steps=0 divided by zero at step 0."""
        from bonito_tpu import schedule as s
        fn = s.linear_warmup_const_inverse_sqrt_decay(
            warmup_steps=0, decay_start_epoch=10,
            linear_cooldown_n_epochs=2)(steps_per_epoch=10, epochs=5)
        vals = [fn(i) for i in range(0, 50, 5)]
        assert all(np.isfinite(vals)), vals
        assert all(0.0 <= v <= 1.0 for v in vals), vals
        fn2 = s.linear_warmup_const_inverse_sqrt_decay(
            warmup_steps=0)(steps_per_epoch=10, epochs=20)
        assert np.isfinite(fn2(0))


class TestDropout:
    def test_ctc_dropout_live_and_per_key(self):
        """Round-5 fix: the trainer now threads a per-step dropout key
        (QuartzNet configs train with dropout in the reference); masks
        must differ per key and per site, and rng=None (bench/dryrun
        callers) must keep the old deterministic behaviour."""
        import jax
        import jax.numpy as jnp
        import numpy as np
        import optax
        from bonito_tpu.models import conv_ctc_config
        from bonito_tpu.ctc.model import Model
        from bonito_tpu.training import make_train_step

        m = Model(conv_ctc_config(chunksize=600))
        m.init()
        tx = optax.adamw(1e-3)
        step = make_train_step(m, tx, use_amp=True)
        rng0 = np.random.default_rng(0)
        batch = (jnp.asarray(rng0.normal(0, 1, (2, 600, 1)), jnp.float32),
                 jnp.asarray(rng0.integers(1, 5, (2, 40)), jnp.int32),
                 jnp.full((2,), 40, jnp.int32))

        def run(key):
            p = jax.tree.map(jnp.copy, m.params)
            _, _, losses, _ = step(p, tx.init(p), batch,
                                   jnp.float32(1.0), jnp.float32(1e9), key)
            return float(losses["loss"])

        l1 = run(jax.random.PRNGKey(1))
        l2 = run(jax.random.PRNGKey(2))
        ln = run(None)
        assert l1 != l2, "dropout masks must differ per step key"
        assert l1 != ln, "a provided key must activate dropout"
        assert np.isfinite([l1, l2, ln]).all()


class TestScheduleKnotClamp:
    def test_short_run_knots_stay_sorted(self):
        """Round-5 fix: knot clamping read the ORIGINAL unclamped list,
        so a warmup longer than the decay start produced unsorted knots
        and searchsorted mis-routed segments (LR jumped mid-training).
        The multiplier must be monotone-sane and continuous-ish."""
        import numpy as np
        from bonito_tpu import schedule as s
        fn = s.linear_warmup_const_inverse_sqrt_decay(
            warmup_steps=1000, decay_start_epoch=1,
            linear_cooldown_n_epochs=8)(110, 10, 0)
        ts = np.arange(1100)
        vals = np.array([fn(t) for t in ts], dtype=np.float64)
        assert np.all(np.isfinite(vals))
        assert vals.min() >= 0.0 and vals.max() <= 1.0 + 1e-9
        # sane routing: one warmup rise to the peak, then never rises
        # again (the unsorted knots produced a decay followed by a jump
        # BACK UP mid-training). A downward step at the degenerate
        # segment boundary is inherent to this contradictory config.
        peak = int(vals.argmax())
        assert np.all(np.diff(vals[peak:]) <= 1e-9)
