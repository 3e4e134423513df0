"""Minimal torch re-implementation of the Whisper architecture, used only as
an independent numerical oracle for the JAX model (tests). Mirrors the
published OpenAI architecture: pre-LN transformer, qk-scaling by d_h**-0.25,
k-projection without bias, exact GELU, sinusoidal encoder positions."""

import math

import numpy as np
import torch
import torch.nn.functional as F


def sinusoids(length, channels):
    log_inc = np.log(10000) / (channels // 2 - 1)
    inv = torch.exp(-log_inc * torch.arange(channels // 2))
    t = torch.arange(length)[:, None] * inv[None, :]
    return torch.cat([torch.sin(t), torch.cos(t)], dim=1)


def t(x):  # jax [in,out] -> torch linear does x @ w.T, so keep [in,out] and matmul
    return torch.from_numpy(np.asarray(x))


def linear(p, x):
    y = x @ t(p["w"])
    if "b" in p:
        y = y + t(p["b"])
    return y


def layer_norm(p, x):
    return F.layer_norm(x, x.shape[-1:], weight=t(p["scale"]), bias=t(p["bias"]), eps=1e-5)


def attention(p, x, n_head, xa=None, causal=False):
    b, s, d = x.shape
    scale = (d // n_head) ** -0.25
    src = x if xa is None else xa
    q = linear(p["q"], x).view(b, s, n_head, d // n_head) * scale
    k = linear(p["k"], src).view(b, src.shape[1], n_head, d // n_head) * scale
    v = linear(p["v"], src).view(b, src.shape[1], n_head, d // n_head)
    logits = torch.einsum("bqhd,bkhd->bhqk", q, k)
    if causal:
        mask = torch.full((s, s), float("-inf")).triu(1)
        logits = logits + mask
    w = logits.softmax(-1)
    out = torch.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, s, d)
    return linear(p["out"], out)


def mlp(block, x):
    return linear(block["mlp_fc2"], F.gelu(linear(block["mlp_fc1"], x)))


def encoder_block(block, x, n_head):
    x = x + attention(block["attn"], layer_norm(block["attn_ln"], x), n_head)
    x = x + mlp(block, layer_norm(block["mlp_ln"], x))
    return x


def decoder_block(block, x, xa, n_head):
    x = x + attention(block["attn"], layer_norm(block["attn_ln"], x), n_head, causal=True)
    x = x + attention(block["cross_attn"], layer_norm(block["cross_attn_ln"], x), n_head, xa=xa)
    x = x + mlp(block, layer_norm(block["mlp_ln"], x))
    return x


def encode_audio(params, cfg, mel):
    enc = params["encoder"]
    x = torch.from_numpy(np.asarray(mel))
    x = F.gelu(F.conv1d(x, t(enc["conv1"]["w"]), t(enc["conv1"]["b"]), padding=1))
    x = F.gelu(F.conv1d(x, t(enc["conv2"]["w"]), t(enc["conv2"]["b"]), stride=2, padding=1))
    x = x.permute(0, 2, 1)
    x = x + sinusoids(cfg.n_audio_ctx, cfg.n_audio_state)[: x.shape[1]]
    for block in enc["blocks"]:
        x = encoder_block(block, x, cfg.n_audio_head)
    return layer_norm(enc["ln_post"], x)


def decoder_logits(params, cfg, tokens, xa):
    dec = params["decoder"]
    tokens = torch.from_numpy(np.asarray(tokens))
    emb = t(dec["token_embedding"])
    x = emb[tokens] + t(dec["positional_embedding"])[: tokens.shape[1]]
    for block in dec["blocks"]:
        x = decoder_block(block, x, xa, cfg.n_text_head)
    x = layer_norm(dec["ln"], x)
    return x @ emb.T
