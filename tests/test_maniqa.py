"""MANIQA native port: math parity against an independent torch
implementation of the published architecture (same approach as
test_lpips_parity — pretrained weights are unobtainable offline, so a
random-weight torch oracle validates every layer's numerics; numeric parity
vs pyiqa itself is asserted by tools/convert_maniqa.py at conversion time)."""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax.numpy as jnp

from evreal_tpu.metrics import maniqa as m

# small but structurally faithful: 10 ViT blocks (features tapped at 6-9),
# 12 heads, 28x28 token grid, 2x2 swin blocks per stage, window 4
VIT_DIM = 24
SWIN1_DIM = 8
SWIN2_DIM = 4
HEADS = 4
WS = 4


def _rel_index(ws):
    return torch.as_tensor(m._rel_position_index(ws), dtype=torch.long)


class TorchViTBlock(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = nn.Module()
        self.attn.qkv = nn.Linear(dim, dim * 3)
        self.attn.proj = nn.Linear(dim, dim)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(dim, dim * 4)
        self.mlp.fc2 = nn.Linear(dim * 4, dim)
        self.heads = heads

    def forward(self, x):
        b, n, c = x.shape
        h = self.norm1(x)
        qkv = self.attn.qkv(h).reshape(b, n, 3, self.heads, c // self.heads)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        a = torch.softmax(q @ k.transpose(-2, -1)
                          * (c // self.heads) ** -0.5, -1)
        h = (a @ v).transpose(1, 2).reshape(b, n, c)
        x = x + self.attn.proj(h)
        h = self.norm2(x)
        return x + self.mlp.fc2(nn.functional.gelu(self.mlp.fc1(h)))


class TorchViT(nn.Module):
    def __init__(self, dim, depth=10):
        super().__init__()
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, dim, 8, 8)
        self.cls_token = nn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.pos_embed = nn.Parameter(torch.randn(1, 28 * 28 + 1, dim) * 0.02)
        self.blocks = nn.ModuleList(
            [TorchViTBlock(dim, 12) for _ in range(depth)])

    def forward(self, x):  # NCHW
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(x.shape[0], -1, -1), x], 1)
        x = x + self.pos_embed
        feats = []
        for i, blk in enumerate(self.blocks):
            x = blk(x)
            if i in m._FEATURE_BLOCKS:
                feats.append(x[:, 1:])
        return torch.cat(feats, -1)


class TorchTABlock(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.c_q = nn.Linear(dim, dim)
        self.c_k = nn.Linear(dim, dim)
        self.c_v = nn.Linear(dim, dim)

    def forward(self, x):
        _x = x
        b, c, n = x.shape
        q, k, v = self.c_q(x), self.c_k(x), self.c_v(x)
        attn = torch.softmax(q @ k.transpose(-2, -1) * n ** -0.5, -1)
        # official layout quirk (maniqa_arch TABlock)
        x = (attn @ v).transpose(-2, -1).reshape(b, c, n)
        return x + _x


class TorchWindowAttention(nn.Module):
    def __init__(self, dim, heads, ws):
        super().__init__()
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)
        self.relative_position_bias_table = nn.Parameter(
            torch.randn((2 * ws - 1) ** 2, heads) * 0.02)
        self.heads, self.ws = heads, ws

    def forward(self, x, mask):  # (nB, N, C) windows
        nb, n, c = x.shape
        qkv = self.qkv(x).reshape(nb, n, 3, self.heads, c // self.heads)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        attn = q @ k.transpose(-2, -1) * (c // self.heads) ** -0.5
        bias = self.relative_position_bias_table[
            _rel_index(self.ws).reshape(-1)].reshape(n, n, self.heads)
        attn = attn + bias.permute(2, 0, 1)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.view(nb // nw, nw, self.heads, n, n) \
                + mask[None, :, None]
            attn = attn.view(nb, self.heads, n, n)
        attn = attn.softmax(-1)
        return self.proj((attn @ v).transpose(1, 2).reshape(nb, n, c))


class TorchSwinBlock(nn.Module):
    def __init__(self, dim, heads, ws, shift, hw, scale):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn = TorchWindowAttention(dim, heads, ws)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(dim, dim * 2)
        self.mlp.fc2 = nn.Linear(dim * 2, dim)
        self.ws, self.shift, self.hw, self.scale = ws, shift, hw, scale

    def forward(self, x):  # (B, N, C)
        b, n, c = x.shape
        hw, ws = self.hw, self.ws
        shortcut = x
        x = self.norm1(x).view(b, hw, hw, c)
        mask = None
        if self.shift:
            x = torch.roll(x, (-self.shift, -self.shift), dims=(1, 2))
            mask = torch.as_tensor(m._shift_mask(hw, ws, self.shift))
        x = x.view(b, hw // ws, ws, hw // ws, ws, c)
        x = x.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)
        x = self.attn(x, mask)
        x = x.view(b, hw // ws, hw // ws, ws, ws, c)
        x = x.permute(0, 1, 3, 2, 4, 5).reshape(b, hw, hw, c)
        if self.shift:
            x = torch.roll(x, (self.shift, self.shift), dims=(1, 2))
        x = shortcut + self.scale * x.view(b, n, c)
        h = self.mlp.fc2(nn.functional.gelu(self.mlp.fc1(self.norm2(x))))
        return x + self.scale * h


class TorchSwinStage(nn.Module):
    def __init__(self, dim, heads, ws, hw, scale, depths=(2, 2)):
        super().__init__()
        self.layers = nn.ModuleList()
        for d in depths:
            layer = nn.Module()
            layer.blocks = nn.ModuleList(
                [TorchSwinBlock(dim, heads, ws, 0 if j % 2 == 0 else ws // 2,
                                hw, scale) for j in range(d)])
            self.layers.append(layer)

    def forward(self, x):  # (B, C, H, W)
        b, c, hw, _ = x.shape
        x = x.flatten(2).transpose(1, 2)
        for layer in self.layers:
            for blk in layer.blocks:
                x = blk(x)
        return x.transpose(1, 2).reshape(b, c, hw, hw)


class TorchMANIQA(nn.Module):
    def __init__(self, scale=0.8):
        super().__init__()
        self.vit = TorchViT(VIT_DIM)
        self.tablock1 = nn.ModuleList([TorchTABlock(784) for _ in range(2)])
        self.conv1 = nn.Conv2d(VIT_DIM * 4, SWIN1_DIM, 1)
        self.swintransformer1 = TorchSwinStage(SWIN1_DIM, HEADS, WS, 28,
                                               scale)
        self.tablock2 = nn.ModuleList([TorchTABlock(784) for _ in range(2)])
        self.conv2 = nn.Conv2d(SWIN1_DIM, SWIN2_DIM, 1)
        self.swintransformer2 = TorchSwinStage(SWIN2_DIM, HEADS, WS, 28,
                                               scale)
        self.fc_score = nn.Sequential(
            nn.Linear(SWIN2_DIM, SWIN2_DIM), nn.ReLU(), nn.Dropout(0.0),
            nn.Linear(SWIN2_DIM, 1), nn.ReLU())
        self.fc_weight = nn.Sequential(
            nn.Linear(SWIN2_DIM, SWIN2_DIM), nn.ReLU(), nn.Dropout(0.0),
            nn.Linear(SWIN2_DIM, 1), nn.Sigmoid())

    def forward(self, x):  # (B, 3, 224, 224) normalized
        x = self.vit(x)  # (B, 784, 4*VIT_DIM)
        b = x.shape[0]
        x = x.transpose(1, 2)  # (B, C, N)
        for tab in self.tablock1:
            x = tab(x)
        x = x.reshape(b, -1, 28, 28)
        x = self.conv1(x)
        x = self.swintransformer1(x)
        x = x.flatten(2)
        for tab in self.tablock2:
            x = tab(x)
        x = x.reshape(b, -1, 28, 28)
        x = self.conv2(x)
        x = self.swintransformer2(x)
        x = x.flatten(2).transpose(1, 2)  # (B, N, C)
        s = self.fc_score(x)[..., 0]
        w = self.fc_weight(x)[..., 0]
        return (s * w).sum(1) / w.sum(1)


@pytest.fixture(scope="module")
def model_and_params():
    torch.manual_seed(0)
    net = TorchMANIQA().eval()
    # lift the score head's bias so its final ReLU isn't stuck at 0 for
    # random weights (pretrained heads produce positive scores)
    with torch.no_grad():
        net.fc_score[3].bias += 1.0
    params = {k: jnp.asarray(v.detach().numpy())
              for k, v in net.state_dict().items()}
    return net, params


def test_scores_match_torch_oracle(model_and_params):
    net, params = model_and_params
    g = torch.Generator().manual_seed(1)
    x = torch.randn(2, 3, 224, 224, generator=g)
    with torch.no_grad():
        ref = net(x).numpy()
    ours = np.asarray(m.maniqa_scores(
        params, jnp.asarray(x.permute(0, 2, 3, 1).numpy()),
        window_size=WS, scale=0.8))
    np.testing.assert_allclose(ours, ref, rtol=0, atol=2e-4)


def test_scale_changes_swin_residuals(model_and_params):
    net, params = model_and_params
    g = torch.Generator().manual_seed(2)
    x = jnp.asarray(torch.randn(1, 224, 224, 3, generator=g).numpy())
    a = float(m.maniqa_scores(params, x, window_size=WS, scale=0.8)[0])
    b = float(m.maniqa_scores(params, x, window_size=WS, scale=0.2)[0])
    assert a != b


def test_full_metric_on_ecd_sized_gray(model_and_params):
    """180x240 (< 224 tall) grayscale: upscaled, cropped, deterministic."""
    _, params = model_and_params
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(180, 240)).astype(np.float32)
    s1 = float(m.maniqa(params, jnp.asarray(img), n_crops=3))
    s2 = float(m.maniqa(params, jnp.asarray(img), n_crops=3))
    assert np.isfinite(s1) and s1 == s2
    other = float(m.maniqa(params, jnp.asarray(1.0 - img), n_crops=3))
    assert other != s1


def test_registry_gating(tmp_path, monkeypatch, model_and_params):
    net, _ = model_and_params
    arrs = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    arrs["_meta_scale"] = np.float64(0.8)
    arrs["_meta_window"] = np.int64(WS)
    path = tmp_path / "maniqa.npz"
    np.savez(path, **arrs)
    monkeypatch.setenv("EVREAL_MANIQA_PARAMS", str(path))
    monkeypatch.setenv("EVREAL_MANIQA_CROPS", "2")
    assert m.params_available()
    from evreal_tpu.metrics import registry
    assert m.register_if_available()
    (spec,) = registry.resolve(["maniqa"])
    assert spec.no_ref
    assert spec.params is not None  # weights cross jit as args, not consts
    rng = np.random.default_rng(1)
    val = float(spec.bound()(jnp.asarray(rng.uniform(size=(64, 240))
                                         .astype(np.float32))))
    assert np.isfinite(val)


def test_maniqa_through_harness_vmap(model_and_params):
    """The registered fn must trace under the runner's chunk-vmap
    (runner.metric_scores vmaps NR metrics over (T, H, W))."""
    import jax

    _, params = model_and_params
    fn = lambda img: m.maniqa(params, img, n_crops=2, window_size=WS)  # noqa: E731
    rng = np.random.default_rng(4)
    chunk = jnp.asarray(rng.uniform(size=(3, 180, 240)).astype(np.float32))
    vals = np.asarray(jax.jit(jax.vmap(fn))(chunk))
    assert vals.shape == (3,) and np.isfinite(vals).all()
    # matches per-frame evaluation
    solo = np.array([float(fn(chunk[i])) for i in range(3)])
    np.testing.assert_allclose(vals, solo, atol=1e-5)


def test_malformed_crops_env_contained_at_trace(tmp_path, monkeypatch,
                                                model_and_params):
    """EVREAL_MANIQA_CROPS is validated at first TRACE, not registration:
    registration runs for every eval via the registry's _ensure_builtins,
    and a stale malformed export must not kill an eval that never
    requested maniqa (per-metric containment contract). When maniqa IS
    requested, the trace raises loudly and the registry drops it with the
    message."""
    net, _ = model_and_params
    arrs = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    path = tmp_path / "maniqa.npz"
    np.savez(path, **arrs)
    monkeypatch.setenv("EVREAL_MANIQA_PARAMS", str(path))
    for bad in ("twenty", "0"):
        monkeypatch.setenv("EVREAL_MANIQA_CROPS", bad)
        assert m.register_if_available()  # registration must NOT raise
        from evreal_tpu.metrics import registry

        spec = registry._REGISTRY["maniqa"]
        import jax

        with pytest.raises(ValueError, match="EVREAL_MANIQA_CROPS"):
            jax.eval_shape(spec.fn, spec.loaded(),
                           np.zeros((32, 32), np.float32))
