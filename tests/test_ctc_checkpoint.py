"""conv-CTC checkpoint import fidelity: reference QuartzNet torch module
(Block/TCSConv/Encoder/Decoder naming) -> our importer -> same outputs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as tnn

from bonito_tpu.checkpoint import import_torch_checkpoint
from bonito_tpu.ctc.model import Model
from bonito_tpu.models import conv_ctc_config


def tcs(cin, cout, k, stride=1, padding=0, separable=False):
    m = tnn.Module()
    if separable:
        m.depthwise = tnn.Conv1d(cin, cin, k, stride=stride, padding=padding,
                                 bias=False, groups=cin)
        m.pointwise = tnn.Conv1d(cin, cout, 1, bias=False)
        m.forward = lambda x: m.pointwise(m.depthwise(x))
    else:
        m.conv = tnn.Conv1d(cin, cout, k, stride=stride, padding=padding,
                            bias=False)
        m.forward = lambda x: m.conv(x)
    return m


class TorchBlock(tnn.Module):
    def __init__(self, cin, cout, repeat, k, stride, separable, residual):
        super().__init__()
        pad = k // 2
        self.use_res = residual
        self.conv = tnn.ModuleList()
        c = cin
        for _ in range(repeat - 1):
            self.conv.append(tcs(c, cout, k, stride, pad, separable))
            self.conv.append(tnn.BatchNorm1d(cout, eps=1e-3))
            self.conv.append(tnn.SiLU())
            self.conv.append(tnn.Dropout(0.0))
            c = cout
        self.conv.append(tcs(c, cout, k, stride, pad, separable))
        self.conv.append(tnn.BatchNorm1d(cout, eps=1e-3))
        if residual:
            self.residual = tnn.Sequential(
                tcs(cin, cout, 1), tnn.BatchNorm1d(cout, eps=1e-3))
        self.act = tnn.SiLU()

    def forward(self, x):
        h = x
        for m in self.conv:
            h = m(h)
        if self.use_res:
            h = h + self.residual(x)
        return self.act(h)


class TorchQuartz(tnn.Module):
    """Matches conv_ctc_config blocks shrunk for tests."""

    def __init__(self, blocks, n_classes):
        super().__init__()
        enc = tnn.Module()
        enc.encoder = tnn.Sequential(*blocks)
        self.encoder = enc
        dec = tnn.Module()
        dec.layers = tnn.Sequential(
            tnn.Conv1d(blocks[-1].conv[-2].conv.out_channels
                       if hasattr(blocks[-1].conv[-2], "conv")
                       else blocks[-1].conv[-2].pointwise.out_channels,
                       n_classes, 1, bias=True))
        self.decoder = dec

    def forward(self, x):
        h = self.encoder.encoder(x)
        return torch.log_softmax(self.decoder.layers(h).permute(0, 2, 1), -1)


@pytest.fixture(scope="module")
def pair():
    cfg = conv_ctc_config()
    # shrink
    for b in cfg["block"]:
        b["filters"] = 32
        b["repeat"] = min(b["repeat"], 2)
        b["kernel"] = [min(b["kernel"][0], 9)]
        b["dropout"] = 0.0

    torch.manual_seed(1)
    tblocks = []
    cin = 1
    for b in cfg["block"]:
        tblocks.append(TorchBlock(
            cin, b["filters"], b["repeat"], b["kernel"][0], b["stride"][0],
            b["separable"], b["residual"]))
        cin = b["filters"]
    tmodel = TorchQuartz(tblocks, 5).eval()

    model = Model(cfg)
    model.init(jax.random.PRNGKey(0))
    return tmodel, model, cfg


class TestCTCImport:
    def test_outputs_match(self, pair, tmp_path):
        tmodel, model, cfg = pair
        path = tmp_path / "weights_1.tar"
        torch.save(tmodel.state_dict(), path)
        model.params = import_torch_checkpoint(path, model)

        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 300, 1)).astype(np.float32)
        with torch.no_grad():
            t_out = tmodel(torch.tensor(x).permute(0, 2, 1)).numpy()
        j_out = np.asarray(model.forward(jnp.asarray(x)), np.float32)
        np.testing.assert_allclose(j_out, t_out, rtol=2e-4, atol=2e-4)


class TestCtcTorchExportRoundTrip:
    def test_export_import_bit_identical(self, tmp_path):
        """Round-5 fix: exported CTC checkpoints must carry the
        reference decoder key layout (decoder.layers.0.*) so they
        re-import — and load in reference bonito."""
        import jax
        import numpy as np
        import torch
        from bonito_tpu.models import conv_ctc_config
        from bonito_tpu.ctc.model import Model
        from bonito_tpu.cli.export import _torch_state_dict
        from bonito_tpu.checkpoint import import_torch_checkpoint

        m = Model(conv_ctc_config(chunksize=600))
        m.init()
        state = _torch_state_dict(m)
        assert any(k.startswith("decoder.layers.0.") for k in state)
        torch.save(state, tmp_path / "weights_1.tar")
        m2 = Model(conv_ctc_config(chunksize=600))
        params = import_torch_checkpoint(str(tmp_path / "weights_1.tar"), m2)
        for a, b in zip(jax.tree.leaves(m.params), jax.tree.leaves(params)):
            np.testing.assert_array_equal(
                np.asarray(a, np.float32), np.asarray(b, np.float32))
