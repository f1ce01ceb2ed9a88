"""End-to-end basecall generator pipeline, incl. multi-device sharding
(8 virtual CPU devices from conftest)."""

import numpy as np
import jax
import pytest

from bonito_tpu import parallel
from bonito_tpu.crf.basecall import basecall
from bonito_tpu.crf.model import Model
from bonito_tpu.models import lstm_crf_config


class FakeRead:
    def __init__(self, read_id, signal):
        self.read_id = read_id
        self.signal = signal


@pytest.fixture(scope="module")
def model():
    cfg = lstm_crf_config(
        features=64, num_layers=2, state_len=2, stride=5,
        batchsize=4, chunksize=1000, overlap=200)
    m = Model(cfg)
    m.init(jax.random.PRNGKey(0))
    # amplify CRF head (layer 6: conv,conv,conv,permute,lstm,lstm,crf) so a
    # random model emits moves
    m.params["encoder"]["6"]["w"] = m.params["encoder"]["6"]["w"] * 40
    return m


@pytest.fixture(scope="module")
def reads():
    rng = np.random.default_rng(0)
    return [FakeRead(f"r{i}", rng.normal(size=2400 + 700 * i).astype(np.float32))
            for i in range(3)]


def run(model, reads, mesh):
    out = {}
    for read, res in basecall(model, iter(reads), chunksize=1000,
                              overlap=200, batchsize=8, mesh=mesh):
        out[read.read_id] = res
    return out


class TestBasecallPipeline:
    def test_multi_device_matches_single(self, model, reads):
        mesh1 = parallel.make_mesh(n_data=1, devices=jax.devices()[:1])
        mesh8 = parallel.make_mesh(n_data=8)
        single = run(model, reads, mesh1)
        multi = run(model, reads, mesh8)
        assert single.keys() == multi.keys()
        for rid in single:
            assert single[rid]["sequence"] == multi[rid]["sequence"]
            assert single[rid]["qstring"] == multi[rid]["qstring"]

    def test_result_contract(self, model, reads):
        mesh = parallel.make_mesh(n_data=8)
        results = run(model, reads, mesh)
        for rid, res in results.items():
            assert set(res) >= {"sequence", "qstring", "moves", "stride"}
            assert res["stride"] == model.stride
            assert len(res["sequence"]) == len(res["qstring"])
            assert res["moves"].sum() == len(res["sequence"])

    def test_stitch_lengths(self, model, reads):
        """Stitched frame count equals floor(samples/stride) whole-pipeline."""
        mesh = parallel.make_mesh(n_data=8)
        for read, res in basecall(model, iter(reads), chunksize=1000,
                                  overlap=200, batchsize=8, mesh=mesh):
            n_frames = len(res["moves"])
            expected = len(read.signal) // model.stride
            assert abs(n_frames - expected) <= 1



class TestRNABasecall:
    def test_rna_reverses_sequence_and_qstring(self, model, reads):
        """--rna: called 3'->5' sequence/qstring are emitted reversed
        (reference: bonito/crf/basecall.py:48-55)."""
        dna = dict((r.read_id, res) for r, res in basecall(
            model, iter(reads), chunksize=1000, overlap=200, batchsize=8))
        rna = dict((r.read_id, res) for r, res in basecall(
            model, iter(reads), chunksize=1000, overlap=200, batchsize=8,
            rna=True))
        for rid in dna:
            assert rna[rid]["sequence"] == dna[rid]["sequence"][::-1]
            assert rna[rid]["qstring"] == dna[rid]["qstring"][::-1]
