"""Numerical oracle for the Conformer head: hand-written torch lucidrains
ConformerBlock vs our flax implementation.

The reference's Conformer models are thin wrappers over the ``conformer``
pip package (lucidrains), absent in this environment
(/root/reference/models/conformer_baseline.py:1-29). Same pattern as
``test_w2v_parity.py``: the oracle below implements the package's exact math
in torch — Scale(0.5, PreNorm(FeedForward)), PreNorm(Attention with Shaw
relative positions, max_pos_emb=512), ConformerConvModule
(LN -> pointwise -> GLU -> depthwise with calc_same_padding -> BN -> Swish
-> pointwise), 0.5-FF sandwich, post-LayerNorm — with the package's module
tree so ``convert_conformer_backend`` consumes its ``state_dict()``
unchanged. Checked: eval forward, train-mode forward (all lucidrains
dropouts default to 0), and train-mode BN stat updates including the
torch-unbiased/flax-biased running-var relationship.
"""

import copy
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402
from torch import nn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from rtdsd_tpu.models.conformer import ConformerBackend, ConformerBlock  # noqa: E402
from rtdsd_tpu.models.convert_fairseq import convert_conformer_backend  # noqa: E402

MAX_POS_EMB = 512


# ------------------------------------------------------------ torch oracle
# Mirrors lucidrains/conformer (conformer/conformer.py) exactly, including
# module attribute names so state_dict keys match the pip package's.

def calc_same_padding(kernel_size):
    pad = kernel_size // 2
    return (pad, pad - (kernel_size + 1) % 2)


class Swish(nn.Module):
    def forward(self, x):
        return x * torch.sigmoid(x)


class GLU(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.dim = dim

    def forward(self, x):
        out, gate = x.chunk(2, dim=self.dim)
        return out * gate.sigmoid()


class DepthWiseConv1d(nn.Module):
    def __init__(self, chan_in, chan_out, kernel_size, padding):
        super().__init__()
        self.padding = padding
        self.conv = nn.Conv1d(chan_in, chan_out, kernel_size, groups=chan_in)

    def forward(self, x):
        x = F.pad(x, self.padding)
        return self.conv(x)


class Scale(nn.Module):
    def __init__(self, scale, fn):
        super().__init__()
        self.fn = fn
        self.scale = scale

    def forward(self, x, **kwargs):
        return self.fn(x, **kwargs) * self.scale


class PreNorm(nn.Module):
    def __init__(self, dim, fn):
        super().__init__()
        self.fn = fn
        self.norm = nn.LayerNorm(dim)

    def forward(self, x, **kwargs):
        return self.fn(self.norm(x), **kwargs)


class Attention(nn.Module):
    def __init__(self, dim, heads, dim_head, max_pos_emb=MAX_POS_EMB):
        super().__init__()
        inner_dim = dim_head * heads
        self.heads = heads
        self.scale = dim_head ** -0.5
        self.to_q = nn.Linear(dim, inner_dim, bias=False)
        self.to_kv = nn.Linear(dim, inner_dim * 2, bias=False)
        self.to_out = nn.Linear(inner_dim, dim)
        self.max_pos_emb = max_pos_emb
        self.rel_pos_emb = nn.Embedding(2 * max_pos_emb + 1, dim_head)

    def forward(self, x):
        b, n, _ = x.shape
        h = self.heads
        q = self.to_q(x)
        k, v = self.to_kv(x).chunk(2, dim=-1)
        q, k, v = (t.reshape(b, n, h, -1).transpose(1, 2) for t in (q, k, v))
        dots = torch.einsum("bhid,bhjd->bhij", q, k) * self.scale

        seq = torch.arange(n)
        dist = (seq.view(-1, 1) - seq.view(1, -1)).clamp(
            -self.max_pos_emb, self.max_pos_emb) + self.max_pos_emb
        rel_pos_emb = self.rel_pos_emb(dist)
        pos_attn = torch.einsum("bhnd,nrd->bhnr", q, rel_pos_emb) * self.scale
        dots = dots + pos_attn

        attn = dots.softmax(dim=-1)
        out = torch.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(1, 2).reshape(b, n, -1)
        return self.to_out(out)


class FeedForward(nn.Module):
    def __init__(self, dim, mult=4):
        super().__init__()
        self.net = nn.Sequential(
            nn.Linear(dim, dim * mult), Swish(), nn.Dropout(0.0),
            nn.Linear(dim * mult, dim), nn.Dropout(0.0))

    def forward(self, x):
        return self.net(x)


class _T(nn.Module):  # Rearrange('b n c -> b c n')
    def forward(self, x):
        return x.transpose(1, 2)


class ConformerConvModule(nn.Module):
    def __init__(self, dim, expansion_factor=2, kernel_size=31):
        super().__init__()
        inner_dim = dim * expansion_factor
        self.net = nn.Sequential(
            nn.LayerNorm(dim),                                          # 0
            _T(),                                                       # 1
            nn.Conv1d(dim, inner_dim * 2, 1),                           # 2
            GLU(dim=1),                                                 # 3
            DepthWiseConv1d(inner_dim, inner_dim, kernel_size,          # 4
                            calc_same_padding(kernel_size)),
            nn.BatchNorm1d(inner_dim),                                  # 5
            Swish(),                                                    # 6
            nn.Conv1d(inner_dim, dim, 1),                               # 7
            _T(),                                                       # 8
            nn.Dropout(0.0))                                            # 9

    def forward(self, x):
        return self.net(x)


class RefConformerBlock(nn.Module):
    def __init__(self, dim, dim_head, heads, ff_mult=4,
                 conv_expansion_factor=2, conv_kernel_size=31):
        super().__init__()
        self.ff1 = Scale(0.5, PreNorm(dim, FeedForward(dim, ff_mult)))
        self.attn = PreNorm(dim, Attention(dim, heads, dim_head))
        self.conv = ConformerConvModule(dim, conv_expansion_factor,
                                        conv_kernel_size)
        self.ff2 = Scale(0.5, PreNorm(dim, FeedForward(dim, ff_mult)))
        self.post_norm = nn.LayerNorm(dim)

    def forward(self, x):
        x = self.ff1(x) + x
        x = self.attn(x) + x
        x = self.conv(x) + x
        x = self.ff2(x) + x
        return self.post_norm(x)


class RefMyConformer(nn.Module):
    """conformer_baseline.py:8-29 — incl. _get_clones deepcopy semantics."""

    def __init__(self, emb_size, heads, kernel_size, n_encoders, ffmult=4,
                 exp_fac=2):
        super().__init__()
        block = RefConformerBlock(emb_size, emb_size // heads, heads,
                                  ffmult, exp_fac, kernel_size)
        self.encoder_blocks = nn.ModuleList(
            [copy.deepcopy(block) for _ in range(n_encoders)])
        self.class_token = nn.Parameter(torch.rand(1, emb_size))
        self.fc5 = nn.Linear(emb_size, 2)

    def forward(self, x):
        x = torch.stack([torch.vstack((self.class_token, x[i]))
                         for i in range(len(x))])
        for layer in self.encoder_blocks:
            x = layer(x)
        embedding = x[:, 0, :]
        return self.fc5(embedding), embedding


class RefConformerModel(nn.Module):
    """conformer_baseline.py:31-64 downstream of extract_feat."""

    def __init__(self, feat_dim, emb_size, heads, kernel_size, n_encoders):
        super().__init__()
        self.LL = nn.Linear(feat_dim, emb_size)
        self.first_bn = nn.BatchNorm2d(num_features=1)
        self.selu = nn.SELU(inplace=True)
        self.conformer = RefMyConformer(emb_size, heads, kernel_size,
                                        n_encoders)

    def forward(self, feats):
        x = self.LL(feats)
        x = x.unsqueeze(dim=1)
        x = self.first_bn(x)
        x = self.selu(x)
        x = x.squeeze(dim=1)
        out, _ = self.conformer(x)
        return out


# ----------------------------------------------------------------- helpers

def _randomize(module, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.2)
        for name, b in module.named_buffers():
            if b.dtype.is_floating_point:
                if name.endswith("running_var"):
                    b.copy_(torch.rand(b.shape, generator=g) + 0.5)
                else:
                    b.copy_(torch.randn(b.shape, generator=g) * 0.1)


def _variables(model, n_encoders):
    sd = {k: v.detach().numpy().copy()
          for k, v in model.state_dict().items()}
    params, stats = convert_conformer_backend(sd, n_encoders=n_encoders)
    return {"params": params, "batch_stats": stats}


# ------------------------------------------------------------------- tests

@pytest.mark.parametrize("kernel_size", [16, 31])
def test_conformer_block_oracle_eval(kernel_size):
    """Single block: Shaw rel-pos sign/clip, GLU, calc_same_padding trim."""
    dim, heads = 24, 4
    t = RefConformerBlock(dim, dim // heads, heads,
                          conv_kernel_size=kernel_size)
    _randomize(t, 31)
    t.eval()
    x = torch.randn(2, 11, dim, generator=torch.Generator().manual_seed(8))
    with torch.no_grad():
        want = t(x.clone())

    sd = {f"conformer.encoder_blocks.0.{k}": v.detach().numpy().copy()
          for k, v in t.state_dict().items()}
    # convert via the block branch of convert_conformer_backend
    sd["conformer.class_token"] = np.zeros((1, dim), np.float32)
    sd["conformer.fc5.weight"] = np.zeros((2, dim), np.float32)
    sd["conformer.fc5.bias"] = np.zeros((2,), np.float32)
    sd["LL.weight"] = np.zeros((dim, 4), np.float32)
    sd["LL.bias"] = np.zeros((dim,), np.float32)
    sd["first_bn.weight"] = np.ones((1,), np.float32)
    sd["first_bn.bias"] = np.zeros((1,), np.float32)
    sd["first_bn.running_mean"] = np.zeros((1,), np.float32)
    sd["first_bn.running_var"] = np.ones((1,), np.float32)
    params, stats = convert_conformer_backend(sd, n_encoders=1)

    block = ConformerBlock(dim=dim, heads=heads, dim_head=dim // heads,
                           conv_kernel_size=kernel_size)
    got = block.apply(
        {"params": params["conformer"]["block_0"],
         "batch_stats": stats["conformer"]["block_0"]},
        jnp.asarray(x.numpy()), train=False)
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(),
                               atol=2e-5, rtol=1e-5)


def test_conformer_backend_oracle_eval():
    """Full reference head (Model.forward downstream of extract_feat):
    LL -> BatchNorm2d(1) -> SELU -> class token -> 2 blocks -> fc5."""
    feat_dim, emb, heads, n_enc = 40, 24, 4, 2
    model = RefConformerModel(feat_dim, emb, heads, 16, n_enc)
    _randomize(model, 32)
    model.eval()
    feats = torch.randn(3, 10, feat_dim,
                        generator=torch.Generator().manual_seed(9))
    with torch.no_grad():
        want = model(feats.clone())

    backend = ConformerBackend(emb_size=emb, heads=heads, kernel_size=16,
                               n_encoders=n_enc)
    got = backend.apply(_variables(model, n_enc), jnp.asarray(feats.numpy()),
                        train=False)
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(),
                               atol=2e-5, rtol=1e-5)


def test_conformer_backend_oracle_train_mode():
    """Train-mode logits + BN running-stat updates.

    All lucidrains dropouts are 0 by construction (the reference never
    overrides them), so train mode differs only in BatchNorm batch stats.
    Also pins the grad-safe depthwise-conv form used in training
    (ops/groupedconv.py) against torch's native grouped conv. Running-var:
    torch tracks unbiased, flax biased — exact n/(n-1) asserted.
    """
    feat_dim, emb, heads, n_enc = 40, 24, 4, 2
    model = RefConformerModel(feat_dim, emb, heads, 16, n_enc)
    _randomize(model, 33)
    model.train()
    variables = _variables(model, n_enc)  # copy BEFORE torch mutates stats

    feats = torch.randn(3, 10, feat_dim,
                        generator=torch.Generator().manual_seed(10))
    with torch.no_grad():
        want = model(feats.clone())

    backend = ConformerBackend(emb_size=emb, heads=heads, kernel_size=16,
                               n_encoders=n_enc)
    got, updates = backend.apply(variables, jnp.asarray(feats.numpy()),
                                 train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(),
                               atol=5e-5, rtol=1e-4)

    sd_after = {k: v.detach().numpy().copy()
                for k, v in model.state_dict().items()}
    new = updates["batch_stats"]

    # first_bn: BatchNorm2d(1) over (B,1,T,E): n = 3*11*24 elements...
    # note torch sees (B,1,10,24) pre-class-token -> n = 3*10*24
    n = 3 * 10 * emb
    old = variables["batch_stats"]["first_bn"]
    np.testing.assert_allclose(np.asarray(new["first_bn"]["mean"]),
                               sd_after["first_bn.running_mean"],
                               atol=1e-5, rtol=1e-5)
    unbiased_contrib = (sd_after["first_bn.running_var"]
                        - 0.9 * np.asarray(old["var"]))
    np.testing.assert_allclose(
        np.asarray(new["first_bn"]["var"]),
        0.9 * np.asarray(old["var"]) + unbiased_contrib * (n - 1) / n,
        atol=1e-5, rtol=1e-5)

    # conv-module BN (block 0): BatchNorm1d(inner) over (B, C, T+1)
    n = 3 * 11
    bp = "conformer.encoder_blocks.0.conv.net.5"
    old = variables["batch_stats"]["conformer"]["block_0"]["conv"]["bn"]
    got_bn = new["conformer"]["block_0"]["conv"]["bn"]
    np.testing.assert_allclose(np.asarray(got_bn["mean"]),
                               sd_after[f"{bp}.running_mean"],
                               atol=1e-5, rtol=1e-5)
    unbiased_contrib = (sd_after[f"{bp}.running_var"]
                        - 0.9 * np.asarray(old["var"]))
    np.testing.assert_allclose(
        np.asarray(got_bn["var"]),
        0.9 * np.asarray(old["var"]) + unbiased_contrib * (n - 1) / n,
        atol=1e-5, rtol=1e-5)
