"""Checkpoint import fidelity: a torch model with reference-format
parameter names must produce the same activations as our model after
import (SURVEY.md §7 'hard parts': conv layouts, LSTM gate order, BN
folding must be reconciled with activation-diff tests)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as tnn

from bonito_tpu.checkpoint import import_torch_checkpoint
from bonito_tpu.crf.model import Model
from bonito_tpu.models import lstm_crf_config


class _RefBatchNorm(tnn.Module):
    """Reference BatchNorm wraps an inner torch module named `bn`
    (bonito/nn.py:191-197), so state-dict keys are <path>.norm.bn.*."""

    def __init__(self, n):
        super().__init__()
        self.bn = tnn.BatchNorm1d(n)

    def forward(self, x):
        return self.bn(x)


class TorchHacLike(tnn.Module):
    """Reference-architecture torch model (bonito module naming) for a
    small hac-style config: conv(+BN+swish) x2, conv(+BN+tanh) stride 5,
    2x LSTM (reverse, forward), LinearCRFEncoder."""

    def __init__(self, features=64, state_len=2):
        super().__init__()

        def conv_block(cin, cout, k, stride, act):
            m = tnn.Module()
            m.conv = tnn.Conv1d(cin, cout, k, stride=stride, padding=k // 2)
            m.norm = _RefBatchNorm(cout)
            m.act = act
            return m

        self.blocks = tnn.ModuleList([
            conv_block(1, 16, 5, 1, torch.nn.functional.silu),
            conv_block(16, 16, 5, 1, torch.nn.functional.silu),
            conv_block(16, features, 19, 5, torch.tanh),
        ])
        self.rnn1 = tnn.LSTM(features, features, batch_first=False)
        self.rnn2 = tnn.LSTM(features, features, batch_first=False)
        size = 4 ** (state_len + 1)
        self.linear = tnn.Linear(features, size, bias=False)
        with torch.no_grad():
            self.rnn1.bias_hh_l0.zero_()
            self.rnn2.bias_hh_l0.zero_()

    def forward(self, x):
        # x: [N, T, 1] -> torch conv NCT
        h = x.permute(0, 2, 1)
        for b in self.blocks:
            h = b.act(b.norm(b.conv(h)))
        h = h.permute(2, 0, 1)                     # [T, N, C]
        # config builder order for num_layers=2: forward, then reverse
        h, _ = self.rnn1(h)
        h, _ = self.rnn2(h.flip(0))
        h = h.flip(0)
        scores = torch.tanh(self.linear(h)) * 5.0
        return h.permute(1, 0, 2), scores.permute(1, 0, 2)


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    torch.manual_seed(0)
    tmodel = TorchHacLike().eval()
    # re-key the state dict into the reference's serialized-encoder naming
    sd = tmodel.state_dict()
    mapping = {}
    for i in range(3):
        for suffix in ("weight", "bias", "running_mean", "running_var",
                       "num_batches_tracked"):
            for part in ("conv", "norm.bn"):
                k = f"blocks.{i}.{part}.{suffix}"
                if k in sd:
                    mapping[f"encoder.{i}.{part}.{suffix}"] = sd[k]
    for name, idx in (("rnn1", 4), ("rnn2", 5)):
        for suffix in ("weight_ih_l0", "weight_hh_l0", "bias_ih_l0",
                       "bias_hh_l0"):
            mapping[f"encoder.{idx}.rnn.{suffix}"] = sd[f"{name}.{suffix}"]
    mapping["encoder.6.linear.weight"] = sd["linear.weight"]

    path = tmp_path_factory.mktemp("ckpt") / "weights_1.tar"
    torch.save(mapping, path)

    cfg = lstm_crf_config(features=64, num_layers=2, state_len=2, stride=5,
                          scale=5.0, clamp=None)
    model = Model(cfg)
    model.init(jax.random.PRNGKey(0))
    model.params = import_torch_checkpoint(path, model)
    return tmodel, model


class TestActivationParity:
    def test_scores_match(self, pair):
        tmodel, model = pair
        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 400, 1)).astype(np.float32)

        with torch.no_grad():
            _, t_scores = tmodel(torch.tensor(x))
        j_scores = model.forward(jnp.asarray(x))

        t = t_scores.numpy()
        j = np.asarray(j_scores, np.float32)
        # our LinearCRFEncoder expands fixed blank columns; compare the
        # learned move columns
        S = 4 ** 2
        j_moves = j.reshape(*j.shape[:2], S, 5)[..., 1:].reshape(
            j.shape[0], j.shape[1], -1)
        np.testing.assert_allclose(j_moves, t, rtol=2e-4, atol=2e-4)

    def test_blank_columns_fixed(self, pair):
        _, model = pair
        x = jnp.asarray(np.zeros((1, 100, 1), np.float32))
        scores = np.asarray(model.forward(x))
        S = 4 ** 2
        blanks = scores.reshape(1, -1, S, 5)[..., 0]
        np.testing.assert_allclose(blanks, 2.0, atol=1e-6)
