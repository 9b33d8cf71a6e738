"""Name-faithful torch replica of the reference VCVITS generator graph.

Test-only helper: an independent PyTorch implementation of the
architecture documented in SURVEY.md §2.4 whose state_dict() keys match
the reference checkpoint layout (net_g.* minus the prefix), so the
converter (vcvits_tpu/convert/vcvits_torch.py) can be validated end-to-end
without a real trained checkpoint.
"""

from __future__ import annotations

import math

import torch
from torch import nn
from torch.nn import functional as F
from torch.nn.utils import weight_norm


class LayerNormCF(nn.Module):
    """Channel-first LayerNorm with gamma/beta names (modules.py:19-31)."""

    def __init__(self, channels):
        super().__init__()
        self.channels = channels
        self.gamma = nn.Parameter(torch.ones(channels))
        self.beta = nn.Parameter(torch.zeros(channels))

    def forward(self, x):
        x = x.transpose(1, -1)
        x = F.layer_norm(x, (self.channels,), self.gamma, self.beta, 1e-5)
        return x.transpose(1, -1)


class RelAttn(nn.Module):
    """Relative-position MHA, window 4, heads shared."""

    def __init__(self, channels, n_heads, window_size=4):
        super().__init__()
        self.n_heads = n_heads
        self.k_channels = channels // n_heads
        self.window_size = window_size
        self.conv_q = nn.Conv1d(channels, channels, 1)
        self.conv_k = nn.Conv1d(channels, channels, 1)
        self.conv_v = nn.Conv1d(channels, channels, 1)
        self.conv_o = nn.Conv1d(channels, channels, 1)
        std = self.k_channels**-0.5
        self.emb_rel_k = nn.Parameter(torch.randn(1, 2 * window_size + 1, self.k_channels) * std)
        self.emb_rel_v = nn.Parameter(torch.randn(1, 2 * window_size + 1, self.k_channels) * std)

    def _rel_slice(self, emb, length):
        ws = self.window_size
        pad = max(length - (ws + 1), 0)
        start = max((ws + 1) - length, 0)
        if pad > 0:
            emb = F.pad(emb, (0, 0, pad, pad))
        return emb[:, start : start + 2 * length - 1]

    @staticmethod
    def _rel_to_abs(x):
        b, h, l, _ = x.size()
        x = F.pad(x, (0, 1))
        x = x.view(b, h, l * 2 * l)
        x = F.pad(x, (0, l - 1))
        return x.view(b, h, l + 1, 2 * l - 1)[:, :, :l, l - 1 :]

    @staticmethod
    def _abs_to_rel(x):
        b, h, l, _ = x.size()
        x = F.pad(x, (0, l - 1))
        x = x.view(b, h, l * l + l * (l - 1))
        x = F.pad(x, (l, 0))
        return x.view(b, h, l, 2 * l)[:, :, :, 1:]

    def forward(self, x, attn_mask):
        b, c, t = x.size()
        h, d = self.n_heads, self.k_channels
        q = self.conv_q(x).view(b, h, d, t).transpose(2, 3)
        k = self.conv_k(x).view(b, h, d, t).transpose(2, 3)
        v = self.conv_v(x).view(b, h, d, t).transpose(2, 3)
        scores = torch.matmul(q / math.sqrt(d), k.transpose(-2, -1))
        rel_k = self._rel_slice(self.emb_rel_k, t)
        rel_logits = torch.matmul(q / math.sqrt(d), rel_k.unsqueeze(0).transpose(-2, -1))
        scores = scores + self._rel_to_abs(rel_logits)
        scores = scores.masked_fill(attn_mask == 0, -1e4)
        p = F.softmax(scores, dim=-1)
        out = torch.matmul(p, v)
        rel_w = self._abs_to_rel(p)
        rel_v = self._rel_slice(self.emb_rel_v, t)
        out = out + torch.matmul(rel_w, rel_v.unsqueeze(0))
        out = out.transpose(2, 3).contiguous().view(b, c, t)
        return self.conv_o(out)


class FFNRef(nn.Module):
    def __init__(self, channels, filter_channels, kernel_size):
        super().__init__()
        self.kernel_size = kernel_size
        self.conv_1 = nn.Conv1d(channels, filter_channels, kernel_size)
        self.conv_2 = nn.Conv1d(filter_channels, channels, kernel_size)

    def _pad(self, x):
        if self.kernel_size == 1:
            return x
        return F.pad(x, ((self.kernel_size - 1) // 2, self.kernel_size // 2))

    def forward(self, x, x_mask):
        x = self.conv_1(self._pad(x * x_mask))
        x = torch.relu(x)
        x = self.conv_2(self._pad(x * x_mask))
        return x * x_mask


class EncoderRef(nn.Module):
    def __init__(self, hidden, filter_channels, n_heads, n_layers, kernel_size):
        super().__init__()
        self.n_layers = n_layers
        self.attn_layers = nn.ModuleList()
        self.norm_layers_1 = nn.ModuleList()
        self.ffn_layers = nn.ModuleList()
        self.norm_layers_2 = nn.ModuleList()
        for _ in range(n_layers):
            self.attn_layers.append(RelAttn(hidden, n_heads))
            self.norm_layers_1.append(LayerNormCF(hidden))
            self.ffn_layers.append(FFNRef(hidden, filter_channels, kernel_size))
            self.norm_layers_2.append(LayerNormCF(hidden))

    def forward(self, x, x_mask):
        attn_mask = x_mask.unsqueeze(2) * x_mask.unsqueeze(-1)
        x = x * x_mask
        for i in range(self.n_layers):
            y = self.attn_layers[i](x, attn_mask)
            x = self.norm_layers_1[i](x + y)
            y = self.ffn_layers[i](x, x_mask)
            x = self.norm_layers_2[i](x + y)
        return x * x_mask


class WNRef(nn.Module):
    def __init__(self, hidden, kernel_size, n_layers, gin):
        super().__init__()
        self.hidden = hidden
        self.n_layers = n_layers
        self.in_layers = nn.ModuleList()
        self.res_skip_layers = nn.ModuleList()
        self.cond_layer = weight_norm(nn.Conv1d(gin, 2 * hidden * n_layers, 1))
        for i in range(n_layers):
            self.in_layers.append(
                weight_norm(nn.Conv1d(hidden, 2 * hidden, kernel_size,
                                      padding=(kernel_size - 1) // 2))
            )
            out_ch = 2 * hidden if i < n_layers - 1 else hidden
            self.res_skip_layers.append(weight_norm(nn.Conv1d(hidden, out_ch, 1)))

    def forward(self, x, x_mask, g):
        out = torch.zeros_like(x)
        gc = self.cond_layer(g)
        h = self.hidden
        for i in range(self.n_layers):
            xin = self.in_layers[i](x)
            gl = gc[:, i * 2 * h : (i + 1) * 2 * h]
            acts = torch.tanh(xin[:, :h] + gl[:, :h]) * torch.sigmoid(xin[:, h:] + gl[:, h:])
            rs = self.res_skip_layers[i](acts)
            if i < self.n_layers - 1:
                x = (x + rs[:, :h]) * x_mask
                out = out + rs[:, h:]
            else:
                out = out + rs
        return out * x_mask


class CouplingRef(nn.Module):
    def __init__(self, channels, hidden, kernel_size, n_layers, gin):
        super().__init__()
        self.half = channels // 2
        self.pre = nn.Conv1d(self.half, hidden, 1)
        self.enc = WNRef(hidden, kernel_size, n_layers, gin)
        self.post = nn.Conv1d(hidden, self.half, 1)
        self.post.weight.data.zero_()
        self.post.bias.data.zero_()

    def forward(self, x, x_mask, g, reverse=False):
        x0, x1 = x[:, : self.half], x[:, self.half :]
        h = self.pre(x0) * x_mask
        h = self.enc(h, x_mask, g)
        m = self.post(h) * x_mask
        if not reverse:
            x1 = (m + x1) * x_mask
        else:
            x1 = (x1 - m) * x_mask
        return torch.cat([x0, x1], 1)


class FlipRef(nn.Module):
    def forward(self, x, *a, **k):
        return torch.flip(x, [1])


class FlowRef(nn.Module):
    def __init__(self, channels, hidden, gin, n_flows=4):
        super().__init__()
        self.flows = nn.ModuleList()
        for _ in range(n_flows):
            self.flows.append(CouplingRef(channels, hidden, 5, 4, gin))
            self.flows.append(FlipRef())

    def forward(self, x, x_mask, g, reverse=False):
        if not reverse:
            for f in self.flows:
                x = f(x, x_mask, g)
        else:
            for f in reversed(self.flows):
                x = f(x, x_mask, g, reverse=True)
        return x


class PosteriorRef(nn.Module):
    def __init__(self, in_ch, out_ch, hidden, gin, n_layers=16):
        super().__init__()
        self.out_ch = out_ch
        self.pre = nn.Conv1d(in_ch, hidden, 1)
        self.enc = WNRef(hidden, 5, n_layers, gin)
        self.proj = nn.Conv1d(hidden, out_ch * 2, 1)

    def forward(self, x, x_mask, g):
        h = self.pre(x) * x_mask
        h = self.enc(h, x_mask, g)
        stats = self.proj(h) * x_mask
        return stats[:, : self.out_ch], stats[:, self.out_ch :]


class ResBlock1Ref(nn.Module):
    def __init__(self, ch, k, dilations):
        super().__init__()
        self.convs1 = nn.ModuleList([
            weight_norm(nn.Conv1d(ch, ch, k, dilation=d, padding=(k * d - d) // 2))
            for d in dilations
        ])
        self.convs2 = nn.ModuleList([
            weight_norm(nn.Conv1d(ch, ch, k, padding=(k - 1) // 2)) for _ in dilations
        ])

    def forward(self, x):
        for c1, c2 in zip(self.convs1, self.convs2):
            xt = F.leaky_relu(x, 0.1)
            xt = c1(xt)
            xt = F.leaky_relu(xt, 0.1)
            xt = c2(xt)
            x = xt + x
        return x


class HiFiGANRef(nn.Module):
    def __init__(self, in_ch, up_init, rates, kernels, rk, rd):
        super().__init__()
        self.num_kernels = len(rk)
        self.conv_pre = weight_norm(nn.Conv1d(in_ch, up_init, 7, padding=3))
        self.ups = nn.ModuleList()
        self.resblocks = nn.ModuleList()
        ch = up_init
        for u, k in zip(rates, kernels):
            self.ups.append(weight_norm(nn.ConvTranspose1d(ch, ch // 2, k, u, padding=(k - u) // 2)))
            ch //= 2
            for kk, dd in zip(rk, rd):
                self.resblocks.append(ResBlock1Ref(ch, kk, dd))
        self.conv_post = weight_norm(nn.Conv1d(ch, 1, 7, padding=3))

    def forward(self, x):
        x = self.conv_pre(x)
        for i, up in enumerate(self.ups):
            x = F.leaky_relu(x, 0.1)
            x = up(x)
            xs = 0
            for j in range(self.num_kernels):
                xs = xs + self.resblocks[i * self.num_kernels + j](x)
            x = xs / self.num_kernels
        x = F.leaky_relu(x)
        x = self.conv_post(x)
        return torch.tanh(x)


class ContentEncoderRef(nn.Module):
    """hubert (transformers) + proj + pitch emb + rel-attn encoder + proj."""

    def __init__(self, hubert, hubert_ch, hidden, filter_channels, n_heads,
                 n_layers, kernel_size, num_pitch, out_ch):
        super().__init__()
        self.out_ch = out_ch
        self.hubert = hubert
        self.hubert_proj = nn.Linear(hubert_ch, hidden)
        self.emb_pitch = nn.Embedding(num_pitch, hidden)
        self.encoder = EncoderRef(hidden, filter_channels, n_heads, n_layers, kernel_size)
        self.proj = nn.Conv1d(hidden, out_ch * 2, 1)

    def forward(self, wav, pitch):
        wav = F.pad(wav, (40, 40))
        feats = self.hubert(wav).last_hidden_state  # [B, T50, C]
        h = self.hubert_proj(feats).transpose(1, 2)  # [B, hidden, T50]
        h = h + self.emb_pitch(pitch[:, : h.size(2)]).transpose(1, 2)
        x_mask = torch.ones(h.size(0), 1, h.size(2))
        x = self.encoder(h, x_mask)
        stats = self.proj(x) * x_mask
        return stats[:, : self.out_ch], stats[:, self.out_ch :], x_mask


class SynthesizerRef(nn.Module):
    """Deterministic (noise_scale=0) end-to-end reference graph."""

    def __init__(self, hubert, hubert_ch, spec_ch, inter, hidden, filter_channels,
                 n_heads, n_layers, kernel_size, num_pitch, n_speakers, gin,
                 rates, kernels, rk, rd, up_init):
        super().__init__()
        self.enc_p = ContentEncoderRef(hubert, hubert_ch, hidden, filter_channels,
                                       n_heads, n_layers, kernel_size, num_pitch, inter)
        self.enc_q = PosteriorRef(spec_ch, inter, hidden, gin)
        self.flow = FlowRef(inter, hidden, gin)
        self.dec = HiFiGANRef(inter, up_init, rates, kernels, rk, rd)
        self.emb_g = nn.Embedding(n_speakers, gin)

    def infer_deterministic(self, wav, pitch, sid, t_out):
        m_p, logs_p, x_mask = self.enc_p(wav, pitch)
        g = self.emb_g(sid).unsqueeze(-1)
        m_p = F.interpolate(m_p, size=(t_out,), mode="nearest")
        z_p = m_p  # noise_scale = 0
        y_mask = torch.ones(z_p.size(0), 1, t_out)
        z = self.flow(z_p, y_mask, g, reverse=True)
        return self.dec(z * y_mask)
