"""Full-loop integration: train -> basecall -> align -> accuracy.

A tiny LSTM-CRF model is trained on synthetic signal (one 5-sample level
per base). It must then basecall a held-out synthetic read through the
real pipeline (chunk/batch/device-step/stitch) accurately enough that the
native aligner maps the call back to the true sequence.
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bonito_tpu.crf.model import Model
from bonito_tpu.data import ChunkDataSet, NumpyBatchLoader
from bonito_tpu.models import lstm_crf_config
from bonito_tpu.training import Trainer
from bonito_tpu.util import accuracy, decode_ref

LEVELS = np.array([-1.5, -0.5, 0.5, 1.5], np.float32)
STRIDE = 5


def signal_for(targets, rng, noise=0.08):
    """One 5-sample level per base + noise."""
    sig = LEVELS[np.asarray(targets) - 1].repeat(STRIDE, axis=-1)
    return (sig + noise * rng.normal(size=sig.shape)).astype(np.float32)


@pytest.fixture(scope="module")
def trained_model(tmp_path_factory):
    cfg = lstm_crf_config(features=64, num_layers=2, state_len=2,
                          stride=STRIDE, clamp=None,
                          scaling_strategy="quantile")
    model = Model(cfg)
    model.init(jax.random.PRNGKey(0))

    rng = np.random.default_rng(1)
    N, L = 160, 40
    T = L * STRIDE
    targets = rng.integers(1, 5, size=(N, L)).astype(np.int32)
    chunks = signal_for(targets, rng)
    train = ChunkDataSet(chunks[:144], targets[:144], np.full(144, L))
    valid = ChunkDataSet(chunks[144:], targets[144:], np.full(16, L))

    trainer = Trainer(
        model,
        NumpyBatchLoader(train, 16, seed=2),
        NumpyBatchLoader(valid, 16, shuffle=False, drop_last=False),
        use_amp=False, chunks_per_epoch=144, batch_size=16,
    )
    trainer.fit(tmp_path_factory.mktemp("workdir"), epochs=30, lr=3e-3)
    return model


class TestEndToEnd:
    def test_validation_accuracy(self, trained_model):
        rng = np.random.default_rng(7)
        targets = rng.integers(1, 5, size=(8, 40)).astype(np.int32)
        chunks = signal_for(targets, rng)
        scores = trained_model.forward(jnp.asarray(chunks)[..., None])
        seqs = trained_model.decode_batch(scores)
        accs = [accuracy(decode_ref(t, trained_model.alphabet), s,
                         min_coverage=0.3) if s else 0.0
                for t, s in zip(targets, seqs)]
        assert np.mean(accs) > 80.0, accs

    def test_basecall_pipeline_and_alignment(self, trained_model, tmp_path):
        from bonito_tpu.aligner import Aligner, align_map
        from bonito_tpu.crf.basecall import basecall

        rng = np.random.default_rng(9)
        true_bases = rng.integers(1, 5, size=1200).astype(np.int32)
        true_seq = decode_ref(true_bases, trained_model.alphabet)
        signal = signal_for(true_bases[None], rng)[0]

        class R:
            read_id = "e2e-read"
        read = R()
        read.signal = signal

        results = list(basecall(
            trained_model, iter([read]), chunksize=1000, overlap=200,
            batchsize=4))
        assert len(results) == 1
        _, res = results[0]
        called = res["sequence"]
        assert len(called) > 800

        # chunk-stitched call must align to the truth with high identity
        ref_path = tmp_path / "truth.fasta"
        ref_path.write_text(f">truth\n{true_seq}\n")
        aligner = Aligner(ref_path)
        results = align_map(aligner, iter([(read, res)]), n_thread=1)
        _, res = next(iter(results))
        m = res["mapping"]
        assert m is not None, "called read did not map to the truth"
        counts = m.cigar_counts
        total = sum(counts.values())
        identity = counts.get("=", 0) / max(total, 1)
        assert identity > 0.8, (identity, m.cigar_str[:100])


class TestSaveCTCCLI:
    def test_save_ctc_via_cli(self, trained_model, tmp_path, monkeypatch):
        """`basecaller --reference ... --save-ctc` through the real CLI:
        fast5 reader procs -> pa standardisation -> chunked basecall ->
        native aligner -> CTCWriter npy emission (reference flow:
        bonito/cli/basecaller.py:118-126 + io.py:513-619)."""
        import copy
        import io as _io
        import h5py

        from bonito_tpu.checkpoint import save_params
        from bonito_tpu.cli import basecaller as basecaller_cli
        from bonito_tpu.config import save_config

        # model dir: trained weights + a pa/no-standardise scaling config
        # so the CLI reader hands the model the raw synthetic levels
        cfg = copy.deepcopy(trained_model.config)
        cfg["scaling"] = {"strategy": "pa"}
        cfg["standardisation"] = {"standardise": 0}
        mdir = tmp_path / "model"
        mdir.mkdir()
        save_config(cfg, mdir / "config.toml")
        save_params(mdir / "weights_1.npz", trained_model.params)

        # two synthetic reads as fast5; calibration scale 0.01 undoes the
        # x100 int16 encoding
        rng = np.random.default_rng(11)
        rdir = tmp_path / "reads"
        rdir.mkdir()
        truths = []
        with h5py.File(rdir / "batch0.fast5", "w") as f:
            for i in range(2):
                true_bases = rng.integers(1, 5, size=900 + 100 * i)
                truths.append(decode_ref(true_bases, trained_model.alphabet))
                sig = signal_for(true_bases[None], rng)[0]
                g = f.create_group(f"read_e2e{i}")
                raw = g.create_group("Raw")
                raw.create_dataset(
                    "Signal", data=np.round(sig * 100).astype(np.int16))
                raw.attrs["read_id"] = f"e2e-ctc-{i}"
                raw.attrs["read_number"] = i
                raw.attrs["start_mux"] = 1
                raw.attrs["start_time"] = 0
                ch = g.create_group("channel_id")
                ch.attrs["channel_number"] = "1"
                ch.attrs["digitisation"] = 8192.0
                ch.attrs["offset"] = 0.0
                ch.attrs["range"] = 81.92
                ch.attrs["sampling_rate"] = 5000.0
                tr = g.create_group("tracking_id")
                tr.attrs["run_id"] = "e2e-run"
                tr.attrs["exp_start_time"] = "2026-01-01T00:00:00Z"
                tr.attrs["flow_cell_id"] = "FC"
                tr.attrs["device_id"] = "D"
                tr.attrs["sample_id"] = "S"

        ref_path = tmp_path / "truth.fasta"
        ref_path.write_text("".join(
            f">truth{i}\n{s}\n" for i, s in enumerate(truths)))

        out = tmp_path / "ctc_out"
        out.mkdir()
        argv = [
            str(mdir), str(rdir),
            "--reference", str(ref_path),
            "--save-ctc", "--no-trim",
            "--chunksize", "1000", "--overlap", "200", "--batchsize", "4",
            "--min-accuracy-save-ctc", "0.8",
            "--output-dir", str(out),
            "--n-proc", "1",
        ]
        args = basecaller_cli.argparser().parse_args(argv)
        monkeypatch.setattr(sys, "stdout", _io.StringIO())
        basecaller_cli.main(args)

        chunks = np.load(out / "chunks.npy")
        refs = np.load(out / "references.npy")
        lens = np.load(out / "reference_lengths.npy")
        assert len(chunks) >= 4, "too few accepted ctc chunks"
        assert chunks.shape[1] == 1000 and chunks.dtype == np.float16
        assert refs.dtype == np.uint8 and refs.min() >= 0 and refs.max() <= 4
        assert (lens > 100).all() and (lens <= refs.shape[1]).all()


class TestReverseBasecall:
    def test_reverse_matches_revcomp_of_forward(self, trained_model):
        """reverse=True (duplex complement strands): score-space
        reverse-complement on device + reversed stitching. On a sharp
        (trained) model the called sequence must be the reverse
        complement of the forward call up to the state_len k-mer shift
        and chunk-junction frames (reference semantics:
        bonito/crf/model.py:84-96, crf/basecall.py:34-35)."""
        from bonito_tpu.alignment import edit_align
        from bonito_tpu.crf.basecall import basecall

        rng = np.random.default_rng(21)
        true_bases = rng.integers(1, 5, size=800).astype(np.int32)
        signal = signal_for(true_bases[None], rng)[0]

        class R:
            read_id = "rev-read"
        read = R()
        read.signal = signal

        def call(reverse):
            [(_, res)] = list(basecall(
                trained_model, iter([read]), chunksize=1000, overlap=200,
                batchsize=4, reverse=reverse))
            return res["sequence"]

        fwd, rev = call(False), call(True)
        assert len(rev) > 700
        comp = str.maketrans("ACGT", "TGCA")
        d, _ = edit_align(fwd, rev[::-1].translate(comp))
        assert d <= 20, (d, len(fwd), len(rev))


class TestPod5BasecallCLI:
    def test_pod5_reads_through_cli(self, trained_model, tmp_path,
                                    monkeypatch):
        """pod5 input through the real basecaller CLI: container parse ->
        VBZ decode -> calibration -> chunked basecall -> fastq."""
        import copy
        import io as _io
        import uuid

        from bonito_tpu.checkpoint import save_params
        from bonito_tpu.cli import basecaller as basecaller_cli
        from bonito_tpu.config import save_config
        from bonito_tpu.pod5 import write_pod5

        cfg = copy.deepcopy(trained_model.config)
        cfg["scaling"] = {"strategy": "pa"}
        cfg["standardisation"] = {"standardise": 0}
        mdir = tmp_path / "model"
        mdir.mkdir()
        save_config(cfg, mdir / "config.toml")
        save_params(mdir / "weights_1.npz", trained_model.params)

        rng = np.random.default_rng(31)
        true_bases = rng.integers(1, 5, size=900).astype(np.int32)
        sig = signal_for(true_bases[None], rng)[0]
        rdir = tmp_path / "reads"
        rdir.mkdir()
        write_pod5(rdir / "r.pod5", [{
            "read_id": str(uuid.UUID(int=7)),
            "signal": np.round(sig * 100).astype(np.int16),
            "channel": 1,
            "read_number": 0,
            "calibration_offset": 0.0,
            "calibration_scale": 0.01,
        }])

        args = basecaller_cli.argparser().parse_args(
            [str(mdir), str(rdir), "--no-trim", "--n-proc", "1",
             "--output-dir", str(tmp_path)])
        fake_out = _io.StringIO()
        monkeypatch.setattr(sys, "stdout", fake_out)
        basecaller_cli.main(args)
        lines = fake_out.getvalue().splitlines()
        assert lines and lines[0].startswith("@" + str(uuid.UUID(int=7)))
        called = lines[1]
        # the trained model should call this synthetic read accurately
        from bonito_tpu.alignment import edit_align
        truth = decode_ref(true_bases, trained_model.alphabet)
        d, _ = edit_align(called, truth)
        assert d <= 0.2 * len(truth), (d, len(called), len(truth))


class TestCorruptInputResilience:
    def test_corrupt_fast5_warns_and_continues(self, tmp_path, capfd):
        """A garbage .fast5 among good files must produce a warning and
        be skipped, not kill the read stream (reference behavior:
        bonito/fast5.py:98-100 warns and continues)."""
        import h5py
        from bonito_tpu.fast5 import get_reads

        rdir = tmp_path / "reads"
        rdir.mkdir()
        rng = np.random.default_rng(3)
        with h5py.File(rdir / "good.fast5", "w") as f:
            for i in range(3):
                g = f.create_group(f"read_ok{i}")
                raw = g.create_group("Raw")
                raw.create_dataset(
                    "Signal", data=rng.integers(0, 100, 4000).astype(np.int16))
                raw.attrs["read_id"] = f"ok{i}"
                raw.attrs["read_number"] = i
                raw.attrs["start_mux"] = 1
                raw.attrs["start_time"] = 0
                ch = g.create_group("channel_id")
                ch.attrs["channel_number"] = "1"
                ch.attrs["digitisation"] = 8192.0
                ch.attrs["offset"] = 0.0
                ch.attrs["range"] = 81.92
                ch.attrs["sampling_rate"] = 5000.0
                tr = g.create_group("tracking_id")
                tr.attrs["run_id"] = "r"
                tr.attrs["exp_start_time"] = "2026-01-01T00:00:00Z"
                tr.attrs["flow_cell_id"] = "FC"
                tr.attrs["device_id"] = "D"
                tr.attrs["sample_id"] = "S"
        (rdir / "corrupt.fast5").write_bytes(b"\x89HDF-not-really" * 64)

        reads = list(get_reads(rdir, n_proc=0))
        assert sorted(r.read_id for r in reads) == ["ok0", "ok1", "ok2"]
        err = capfd.readouterr().err
        assert "warning" in err and "corrupt.fast5" in err
