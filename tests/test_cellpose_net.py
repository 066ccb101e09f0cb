"""CPnet JAX forward vs a torch oracle with cellpose's exact state_dict
schema (cellpose/resnet_torch.py — the checkpoints the reference loads at
cellpose_wsi_inference.py:148 are state_dicts of that module tree)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from mipheivit_tpu.models.cellpose_net import (  # noqa: E402
    cellpose_params_from_torch,
    cpnet_forward,
    eval_flows,
)


# ---------------------------------------------------------------------------
# torch oracle: module tree + key names identical to cellpose's CPnet


def batchconv(cin, cout, sz):
    return nn.Sequential(
        nn.BatchNorm2d(cin, eps=1e-5, momentum=0.05),
        nn.ReLU(inplace=True),
        nn.Conv2d(cin, cout, sz, padding=sz // 2),
    )


def batchconv0(cin, cout, sz):
    return nn.Sequential(
        nn.BatchNorm2d(cin, eps=1e-5, momentum=0.05),
        nn.Conv2d(cin, cout, sz, padding=sz // 2),
    )


class resdown(nn.Module):
    def __init__(self, cin, cout, sz):
        super().__init__()
        self.conv = nn.Sequential()
        self.proj = batchconv0(cin, cout, 1)
        for t in range(4):
            self.conv.add_module(
                f"conv_{t}",
                batchconv(cin if t == 0 else cout, cout, sz))

    def forward(self, x):
        x = self.proj(x) + self.conv[1](self.conv[0](x))
        x = x + self.conv[3](self.conv[2](x))
        return x


class batchconvstyle(nn.Module):
    def __init__(self, cin, cout, style_channels, sz):
        super().__init__()
        self.conv = batchconv(cin, cout, sz)
        self.full = nn.Linear(style_channels, cout)

    def forward(self, style, x, y=None):
        if y is not None:
            x = x + y
        feat = self.full(style)
        y = x + feat.unsqueeze(-1).unsqueeze(-1)
        return self.conv(y)


class resup(nn.Module):
    def __init__(self, cin, cout, style_channels, sz):
        super().__init__()
        self.conv = nn.Sequential()
        self.conv.add_module("conv_0", batchconv(cin, cout, sz))
        for t in (1, 2, 3):
            self.conv.add_module(
                f"conv_{t}", batchconvstyle(cout, cout, style_channels, sz))
        self.proj = batchconv0(cin, cout, 1)

    def forward(self, x, y, style):
        x = self.proj(x) + self.conv[1](style, self.conv[0](x), y=y)
        x = x + self.conv[3](style, self.conv[2](style, x))
        return x


class downsample(nn.Module):
    def __init__(self, nbase, sz):
        super().__init__()
        self.down = nn.Sequential()
        self.maxpool = nn.MaxPool2d(2, stride=2)
        for n in range(len(nbase) - 1):
            self.down.add_module(f"res_down_{n}",
                                 resdown(nbase[n], nbase[n + 1], sz))

    def forward(self, x):
        xd = []
        for n in range(len(self.down)):
            y = self.maxpool(xd[n - 1]) if n > 0 else x
            xd.append(self.down[n](y))
        return xd


class make_style(nn.Module):
    def forward(self, x0):
        style = torch.nn.functional.avg_pool2d(
            x0, kernel_size=(x0.shape[-2], x0.shape[-1]))
        style = style.flatten(start_dim=1)
        return style / torch.sum(style ** 2, axis=1, keepdim=True) ** 0.5


class upsample(nn.Module):
    def __init__(self, nbase, sz):
        super().__init__()
        self.upsampling = nn.Upsample(scale_factor=2, mode="nearest")
        self.up = nn.Sequential()
        for n in range(1, len(nbase)):
            self.up.add_module(f"res_up_{n - 1}",
                               resup(nbase[n], nbase[n - 1], nbase[-1], sz))

    def forward(self, style, xd):
        x = self.up[-1](xd[-1], xd[-1], style)
        for n in range(len(self.up) - 2, -1, -1):
            x = self.upsampling(x)
            x = self.up[n](x, xd[n], style)
        return x


class OracleCPnet(nn.Module):
    def __init__(self, nbase=(2, 8, 12, 16, 24), nout=3, sz=3):
        super().__init__()
        self.downsample = downsample(nbase, sz)
        nbaseup = list(nbase[1:]) + [nbase[-1]]
        self.upsample = upsample(nbaseup, sz)
        self.make_style = make_style()
        self.output = batchconv(nbaseup[0], nout, 1)
        self.register_buffer("diam_mean", torch.ones(1) * 30.0)
        self.register_buffer("diam_labels", torch.ones(1) * 17.0)

    def forward(self, data):
        T0 = self.downsample(data)
        style = self.make_style(T0[-1])
        T1 = self.upsample(style, T0)
        return self.output(T1), style


def _randomized(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in model.named_parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.2)
        for name, b in model.named_buffers():
            if name.endswith("running_mean"):
                b.copy_(torch.randn(b.shape, generator=g) * 0.1)
            elif name.endswith("running_var"):
                b.copy_(torch.rand(b.shape, generator=g) * 0.5 + 0.7)
    return model.eval()


@pytest.fixture(scope="module")
def oracle():
    return _randomized(OracleCPnet())


def test_cpnet_forward_parity(oracle):
    state = {k: v.numpy() for k, v in oracle.state_dict().items()}
    params = cellpose_params_from_torch(state)
    assert params["diam_mean"] == 30.0 and params["diam_labels"] == 17.0

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 48, 64, 2)).astype(np.float32)
    with torch.no_grad():
        ref_y, ref_style = oracle(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    y, style = cpnet_forward(params, x)
    np.testing.assert_allclose(np.asarray(style), ref_style.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(y), np.transpose(ref_y.numpy(), (0, 2, 3, 1)),
        rtol=1e-3, atol=1e-3)


def test_eval_flows_tiling_seam_free(oracle):
    """Tiled taper-averaged evaluation ~= one whole-image pass (interior
    agreement; the style vector differs per tile so only approximate —
    assert tight correlation and bounded deviation)."""
    state = {k: v.numpy() for k, v in oracle.state_dict().items()}
    params = cellpose_params_from_torch(state)
    rng = np.random.default_rng(2)
    img = rng.random((112, 176)).astype(np.float32)

    dp_t, prob_t = eval_flows(params, img, tile=64, overlap=24, batch_size=8)
    whole, _ = cpnet_forward(params, np.pad(
        img, ((0, 0), (0, 0)))[None, ..., None].repeat(2, -1) * np.array(
            [1.0, 0.0], np.float32))
    whole = np.transpose(np.asarray(whole)[0], (2, 0, 1))
    assert dp_t.shape == (2, 112, 176) and prob_t.shape == (112, 176)
    c = np.corrcoef(prob_t.ravel(), whole[2].ravel())[0, 1]
    assert c > 0.95, c


def test_jax_backend_from_checkpoint_file(oracle, tmp_path):
    """Production wiring: torch .pth checkpoint -> cellpose_jax_flow_factory
    (reference normalize99/rescale/niter semantics) and the per-tile
    jax_segment_factory label contract."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent.parent
                           / "preprocessings" / "nuclei_segmentation"))
    from backends import get_backend
    from flow_wsi import cellpose_jax_flow_factory

    ckpt = tmp_path / "cp_nuclei.pth"
    torch.save(oracle.state_dict(), ckpt)

    flow_fn, masks_fn = cellpose_jax_flow_factory(str(ckpt), tile=64,
                                                  batch_size=8)
    dapi = (np.random.default_rng(4).random((80, 100)) * 255).astype(
        np.uint8)
    dp, prob = flow_fn(dapi)
    # rescale = diam_mean/diam_labels = 30/17 internally; outputs must come
    # back at the input geometry
    assert dp.shape == (2, 80, 100) and prob.shape == (80, 100)
    assert np.isfinite(dp).all() and np.isfinite(prob).all()
    labels = masks_fn(dp, prob)
    assert labels.shape == (80, 100)

    seg = get_backend("jax", cellpose_ckpt=str(ckpt))
    out = seg(dapi)
    assert out.shape == (80, 100) and out.dtype == np.int32


def test_eval_flows_drives_compute_masks(oracle):
    """e2e sanity: network flows (random net) feed the first-party
    dynamics without shape/NaN issues."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent.parent
                           / "preprocessings" / "nuclei_segmentation"))
    from flow_dynamics import compute_masks

    state = {k: v.numpy() for k, v in oracle.state_dict().items()}
    params = cellpose_params_from_torch(state)
    img = np.random.default_rng(3).random((96, 96)).astype(np.float32)
    dp, prob = eval_flows(params, img, tile=96, overlap=24, batch_size=4)
    labels = compute_masks(dp, prob, cellprob_threshold=float(prob.mean()),
                           n_iter=20)
    assert labels.shape == (96, 96) and labels.dtype == np.int32
