"""Incremental streaming with cached conv state (ring buffers).

Round-1 VERDICT weak #5 follow-up: the windowed StreamingConverter
re-renders its left context every chunk. This module removes that for the
expensive 75% of inference — the flow reverse + HiFi-GAN decoder (pure
conv stacks) — by streaming them EXACTLY with per-layer cached state:

* every conv keeps a ring buffer of its last (k-1)*dilation input frames
  (the halo), so each chunk is one valid (pad-free) convolution over
  [cache | chunk] — zero recompute of past frames;
* residual/skip paths carry explicit delay buffers so streams stay
  frame-aligned (a conv delays its output by `halo - left_pad` frames);
* a zero-invariant is maintained: every stream's values at offline
  coordinates < 0 are zeros, which makes the cached-state computation
  bit-equivalent to the offline zero-padded ("same") convolution — the
  stream equals the offline output delayed by `delay_samples`
  (tests/test_streaming_conv.py asserts this to float tolerance);
* transposed convs stream as zero-stuffing + a valid conv of the flipped
  kernel (torch ConvTranspose1d arithmetic, layers.py:ConvTranspose1d).

The content encoder (HuBERT + relative-attention transformer) stays
windowed in StreamingConverter — its attention is global (every frame
attends to all frames, modules reference attentions.py), so exact
incremental evaluation does not exist for it; it is also the cheap ~25%
of device time (ROADMAP stage timings).

Everything here is a pure function of (params, state, chunk): ONE jitted
step program, static shapes, state as a flat dict of fixed-size buffers.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from vcvits_tpu.models.layers import LRELU_SLOPE, conv_precision, leaky_relu


class S(NamedTuple):
    """A stream chunk: values + static alignment metadata.

    x: [B, F, C]; D: delay (stream index j holds offline coordinate j - D);
    F: frames per chunk at this stage's rate (static); R: rate multiplier
    relative to the pipeline's input frames (grows through upsampling).
    """

    x: jax.Array
    D: int
    F: int
    R: int = 1


def _fold_weight_norm(p: Dict, dtype) -> jax.Array:
    """Materialize kernel = g * v / ||v|| (layers.py weight-norm semantics:
    L2 norm over all axes except the trailing one)."""
    v = p["v"].astype(jnp.float32)
    g = p["g"].astype(jnp.float32)
    sq = jnp.sum(jnp.square(v), axis=tuple(range(v.ndim - 1)), keepdims=True)
    return (g * v / jnp.maximum(jnp.sqrt(sq), 1e-12)).astype(dtype)


def _conv1d_kernel(p: Dict, dtype) -> Tuple[jax.Array, jax.Array]:
    """Conv1d params -> ([k, in, out] kernel, bias), weight-normed or plain."""
    if "v" in p:
        kernel = _fold_weight_norm(p, dtype)
    else:
        kernel = p["kernel"].astype(dtype)
    bias = p.get("bias")
    bias = jnp.zeros((kernel.shape[-1],), dtype) if bias is None else bias.astype(dtype)
    return kernel, bias


def _convtranspose1d_kernel(p: Dict, dtype) -> Tuple[jax.Array, jax.Array]:
    """ConvTranspose1d params ([k, out, in], wn over trailing `in` axis) ->
    the equivalent forward-conv kernel [k, in, out] (flip + transpose)."""
    kernel = _fold_weight_norm(p, dtype) if "v" in p else p["kernel"].astype(dtype)
    kernel = jnp.transpose(jnp.flip(kernel, axis=0), (0, 2, 1))
    bias = p.get("bias")
    bias = jnp.zeros((kernel.shape[-1],), dtype) if bias is None else bias.astype(dtype)
    return kernel, bias


class _Ctx:
    """Threads the buffer state through one streamed step.

    state=None -> spec-collection mode (records buffer shapes; used once
    under jax.eval_shape to build the initial all-zeros state)."""

    def __init__(self, state: Optional[Dict], n, batch: int, dtype, spec: Dict,
                 total_frames=None):
        self.state = state
        self.new: Dict[str, jax.Array] = {}
        self.n = n  # chunk counter (traced int32 scalar)
        self.B = batch
        self.dtype = dtype
        self.spec = spec
        # Total input frames in the finite stream (traced int32). Huge while
        # streaming; the true length during flush, so coords >= L are zeroed
        # exactly like the offline right padding.
        self.L = total_frames

    def pull(self, name: str, frames: int, ch: int) -> jax.Array:
        if self.state is None:
            self.spec[name] = (self.B, frames, ch)
            return jnp.zeros((self.B, frames, ch), self.dtype)
        return self.state[name]

    def push(self, name: str, val: jax.Array) -> None:
        self.new[name] = val


def _mask_neg(ctx: _Ctx, s: S) -> S:
    """Zero values at offline coordinates outside [0, L*R) — the
    zero-invariant: those positions stand in for the offline conv's zero
    padding (left pad while warming up, right pad while flushing)."""
    t = ctx.n * s.F + jnp.arange(s.F) - s.D
    keep = (t >= 0) & (t < ctx.L * s.R)
    return S(jnp.where(keep[None, :, None], s.x, jnp.zeros_like(s.x)),
             s.D, s.F, s.R)


def _sconv(ctx: _Ctx, s: S, name: str, kernel: jax.Array, bias: jax.Array,
           dilation: int = 1, pl: Optional[int] = None) -> S:
    """Streaming conv: valid conv over [cache | chunk], cache <- last halo
    frames. pl = the offline left padding (default: torch 'same'); output
    delay grows by halo - pl."""
    k = kernel.shape[0]
    halo = (k - 1) * dilation
    if pl is None:
        pl = halo // 2
    prec = conv_precision(ctx.dtype)
    if halo == 0:
        y = jax.lax.conv_general_dilated(
            s.x, kernel, (1,), [(0, 0)],
            dimension_numbers=("NHC", "HIO", "NHC"), precision=prec) + bias
        return _mask_neg(ctx, S(y, s.D, s.F, s.R))
    buf = ctx.pull(name, halo, s.x.shape[-1])
    xin = jnp.concatenate([buf, s.x], axis=1)
    ctx.push(name, xin[:, xin.shape[1] - halo:])
    y = jax.lax.conv_general_dilated(
        xin, kernel, (1,), [(0, 0)], rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"), precision=prec) + bias
    return _mask_neg(ctx, S(y, s.D + (halo - pl), s.F, s.R))


def _sdelay(ctx: _Ctx, s: S, name: str, nfr: int) -> S:
    """Delay a stream by nfr frames through a FIFO buffer (skip-path
    alignment). Prefill zeros land at offline coords < 0 (invariant-safe)."""
    if nfr == 0:
        return s
    buf = ctx.pull(name, nfr, s.x.shape[-1])
    full = jnp.concatenate([buf, s.x], axis=1)
    ctx.push(name, full[:, s.F:])
    return S(full[:, : s.F], s.D + nfr, s.F, s.R)


def _sstuff(s: S, u: int) -> S:
    """Zero-stuff upsampling (the lhs-dilation half of a transposed conv)."""
    if u == 1:
        return s
    b, f, c = s.x.shape
    y = jnp.concatenate(
        [s.x[:, :, None, :], jnp.zeros((b, f, u - 1, c), s.x.dtype)], axis=2
    ).reshape(b, f * u, c)
    return S(y, s.D * u, s.F * u, s.R * u)


def _add_aligned(ctx: _Ctx, tag: str, streams) -> S:
    """Sum streams after equalizing their delays with FIFO buffers."""
    dm = max(s.D for s in streams)
    total = None
    for i, s in enumerate(streams):
        a = _sdelay(ctx, s, f"{tag}/al_{i}", dm - s.D)
        total = a.x if total is None else total + a.x
    return S(total, dm, streams[0].F, streams[0].R)


# --------------------------------------------------------------------- WN

def _wn_stream(ctx: _Ctx, s: S, p: Dict, cond: Optional[jax.Array], tag: str,
               hidden: int, kernel_size: int, dilation_rate: int,
               n_layers: int) -> S:
    """Streaming WN (models/wavenet.py): gated dilated convs, res/skip 1x1.
    cond: [B, 1, 2*hidden*n_layers] precomputed from the global embedding."""
    out = S(jnp.zeros((s.x.shape[0], s.F, hidden), s.x.dtype), s.D, s.F, s.R)
    for i in range(n_layers):
        d = dilation_rate ** i
        kin, bin_ = _conv1d_kernel(p[f"in_{i}"], ctx.dtype)
        x_in = _sconv(ctx, s, f"{tag}/in_{i}", kin, bin_, dilation=d)
        if cond is not None:
            g_l = cond[:, :, i * 2 * hidden: (i + 1) * 2 * hidden]
        else:
            g_l = jnp.zeros((1, 1, 2 * hidden), ctx.dtype)
        acts = jnp.tanh(x_in.x[..., :hidden] + g_l[..., :hidden]) * \
            jax.nn.sigmoid(x_in.x[..., hidden:] + g_l[..., hidden:])
        acts = _mask_neg(ctx, S(acts, x_in.D, s.F, s.R))
        krs, brs = _conv1d_kernel(p[f"res_skip_{i}"], ctx.dtype)
        res_skip = _sconv(ctx, acts, f"{tag}/rs_{i}", krs, brs)
        if i < n_layers - 1:
            x_al = _sdelay(ctx, s, f"{tag}/res_{i}", res_skip.D - s.D)
            s = S(x_al.x + res_skip.x[..., :hidden], res_skip.D, s.F, s.R)
            out_al = _sdelay(ctx, out, f"{tag}/out_{i}", res_skip.D - out.D)
            out = S(out_al.x + res_skip.x[..., hidden:], res_skip.D, s.F, s.R)
        else:
            out_al = _sdelay(ctx, out, f"{tag}/out_{i}", res_skip.D - out.D)
            out = S(out_al.x + res_skip.x, res_skip.D, s.F, s.R)
    return out


# ------------------------------------------------------------------- flow

def _flow_reverse_stream(ctx: _Ctx, s: S, params: Dict, g: Optional[jax.Array],
                         channels: int, hidden: int, kernel_size: int,
                         dilation_rate: int, n_layers: int, n_flows: int) -> S:
    """Streaming ResidualCouplingBlock reverse (models/flow.py:90-105)."""
    half = channels // 2
    for i in reversed(range(n_flows)):
        s = S(jnp.flip(s.x, axis=-1), s.D, s.F, s.R)  # Flip flow, stateless
        p = params[f"flow_{i}"]
        x0 = S(s.x[..., :half], s.D, s.F, s.R)
        x1 = S(s.x[..., half:], s.D, s.F, s.R)
        kpre, bpre = _conv1d_kernel(p["pre"], ctx.dtype)
        h = _sconv(ctx, x0, f"flow{i}/pre", kpre, bpre)
        cond = None
        if g is not None and "cond_layer" in p["enc"]:
            kc, bc = _conv1d_kernel(p["enc"]["cond_layer"], ctx.dtype)
            cond = jnp.einsum("bc,ico->bo", g.astype(ctx.dtype), kc)[:, None, :] + bc
        h = _wn_stream(ctx, h, p["enc"], cond, f"flow{i}/enc",
                       hidden, kernel_size, dilation_rate, n_layers)
        kpost, bpost = _conv1d_kernel(p["post"], ctx.dtype)
        m = _sconv(ctx, h, f"flow{i}/post", kpost, bpost)
        x1a = _sdelay(ctx, x1, f"flow{i}/x1", m.D - x1.D)
        x0a = _sdelay(ctx, x0, f"flow{i}/x0", m.D - x0.D)
        s = S(jnp.concatenate([x0a.x, x1a.x - m.x], axis=-1), m.D, s.F, s.R)
    return s


# ---------------------------------------------------------------- decoder

def _resblock_stream(ctx: _Ctx, s: S, p: Dict, resblock: str, kernel: int,
                     dilations, tag: str) -> S:
    if resblock == "1":
        for i, d in enumerate(dilations):
            xt = S(leaky_relu(s.x, LRELU_SLOPE), s.D, s.F, s.R)
            k1, b1 = _conv1d_kernel(p[f"c1_{i}"], ctx.dtype)
            t1 = _sconv(ctx, xt, f"{tag}/c1_{i}", k1, b1, dilation=d)
            t1 = S(leaky_relu(t1.x, LRELU_SLOPE), t1.D, t1.F, t1.R)
            k2, b2 = _conv1d_kernel(p[f"c2_{i}"], ctx.dtype)
            t2 = _sconv(ctx, t1, f"{tag}/c2_{i}", k2, b2)
            sk = _sdelay(ctx, s, f"{tag}/sk_{i}", t2.D - s.D)
            s = S(t2.x + sk.x, t2.D, s.F, s.R)
    else:
        for i, d in enumerate(dilations):
            xt = S(leaky_relu(s.x, LRELU_SLOPE), s.D, s.F, s.R)
            k1, b1 = _conv1d_kernel(p[f"c_{i}"], ctx.dtype)
            t1 = _sconv(ctx, xt, f"{tag}/c_{i}", k1, b1, dilation=d)
            sk = _sdelay(ctx, s, f"{tag}/sk_{i}", t1.D - s.D)
            s = S(t1.x + sk.x, t1.D, s.F, s.R)
    return s


def _decoder_stream(ctx: _Ctx, s: S, p: Dict, g: Optional[jax.Array],
                    model) -> S:
    """Streaming HiFiGANGenerator (models/hifigan.py), unfolded layout
    (identical params to the folded production path)."""
    kpre, bpre = _conv1d_kernel(p["conv_pre"], ctx.dtype)
    s = _sconv(ctx, s, "dec/pre", kpre, bpre)
    if g is not None and "cond" in p:
        cond = g.astype(ctx.dtype) @ p["cond"]["kernel"].astype(ctx.dtype) \
            + p["cond"]["bias"].astype(ctx.dtype)
        s = _mask_neg(ctx, S(s.x + cond[:, None, :], s.D, s.F, s.R))
    num_kernels = len(model.resblock_kernel_sizes)
    for i, (u, k) in enumerate(zip(model.upsample_rates,
                                   model.upsample_kernel_sizes)):
        s = S(leaky_relu(s.x, LRELU_SLOPE), s.D, s.F, s.R)
        s = _sstuff(s, u)
        kup, bup = _convtranspose1d_kernel(p[f"up_{i}"], ctx.dtype)
        pad = (k - u) // 2
        s = _sconv(ctx, s, f"dec/up{i}", kup, bup, pl=k - 1 - pad)
        branches = [
            _resblock_stream(ctx, s, p[f"res_{i}_{j}"], model.resblock, rk,
                             rd, f"dec/res{i}_{j}")
            for j, (rk, rd) in enumerate(zip(model.resblock_kernel_sizes,
                                             model.resblock_dilation_sizes))
        ]
        s = _add_aligned(ctx, f"dec/mrf{i}", branches)
        s = S(s.x / num_kernels, s.D, s.F, s.R)
    s = S(leaky_relu(s.x, 0.01), s.D, s.F, s.R)  # torch default final slope
    kpo, bpo = _conv1d_kernel(p["conv_post"], ctx.dtype)
    s = _sconv(ctx, s, "dec/post", kpo, bpo)
    return S(jnp.tanh(s.x), s.D, s.F, s.R)


# ------------------------------------------------------------------ facade

class StreamingFlowDecoder:
    """Stateful incremental flow-reverse + decoder.

    Usage:
        sfd = StreamingFlowDecoder(model, params, chunk_frames)
        state = sfd.init_state()
        for each z_p chunk [B, F, C]:
            wav, state = sfd.step(state, z_p_chunk, sid)
        # then feed sfd.flush_chunks() all-zero chunks to drain the tail
    The concatenated output, after dropping the first `delay_samples`
    samples, equals the offline flow.reverse + dec rendering exactly.
    """

    def __init__(self, model, params: Dict, chunk_frames: int, batch: int = 1,
                 dtype=jnp.float32):
        self.model = model
        self.chunk_frames = int(chunk_frames)
        self.batch = batch
        self.dtype = dtype
        self.upsample = 1
        for u in model.upsample_rates:
            self.upsample *= u

        def run(params, state, n, total_frames, z_p, g):
            spec: Dict = {}
            ctx = _Ctx(state, n, batch, dtype, spec, total_frames)
            s = S(z_p.astype(dtype), 0, self.chunk_frames, 1)
            # (kernel 5, dilation 1, 4 WN layers, 4 flows) — the fixed flow
            # topology SynthesizerSVC builds (models/synthesizer.py:123-126).
            s = _flow_reverse_stream(
                ctx, s, params["flow"], g, model.inter_channels,
                model.hidden_channels, 5, 1, 4, 4)
            s = _decoder_stream(ctx, s, params["dec"], g, model)
            return s.x, ctx.new, s.D, spec

        self._spec: Dict[str, Tuple[int, ...]] = {}
        self._params: Optional[Dict] = None
        self._run = run
        self._jit_step = jax.jit(
            lambda params, state, n, total, z_p, g:
            run(params, state, n, total, z_p, g)[:2])
        self.delay_samples: Optional[int] = None

    def prepare(self, params: Dict, has_g: bool = True) -> None:
        """Trace once (no compute) to size the state buffers + delay."""
        if self.delay_samples is None:
            def collect(params, z_p, g):
                y, new, d, spec = self._run(params, None,
                                            jnp.zeros((), jnp.int32),
                                            jnp.zeros((), jnp.int32), z_p, g)
                self._spec.update(spec)
                self.delay_samples = d
                return y, new
            dummy_zp = jax.ShapeDtypeStruct(
                (self.batch, self.chunk_frames, self.model.inter_channels),
                self.dtype)
            dummy_g = (jax.ShapeDtypeStruct(
                (self.batch, self.model.gin_channels), self.dtype)
                if has_g else None)
            jax.eval_shape(collect, params, dummy_zp, dummy_g)

    def init_state(self) -> Dict:
        assert self.delay_samples is not None, "call prepare(params) first"
        bufs = {k: jnp.zeros(v, self.dtype) for k, v in self._spec.items()}
        bufs["__n"] = jnp.zeros((), jnp.int32)
        bufs["__n_host"] = 0  # host-mirrored chunk counter (no device sync)
        return bufs

    def flush_chunks(self) -> int:
        """How many all-zero z_p chunks drain the pipeline tail."""
        assert self.delay_samples is not None
        per_chunk = self.chunk_frames * self.upsample
        return -(-self.delay_samples // per_chunk)

    def step(self, state: Dict, z_p_chunk: jax.Array,
             g: Optional[jax.Array],
             total_frames: Optional[int] = None) -> Tuple[jax.Array, Dict]:
        """Process one z_p chunk. Pass total_frames (the finite stream's
        total input-frame count) on flush calls so outputs at coordinates
        beyond the end reproduce the offline right zero-padding; leave None
        while the stream is still live."""
        assert self._params is not None, "call bind(params) first"
        n = state["__n"]
        n_host = int(state.get("__n_host", 0))
        bufs = {k: v for k, v in state.items()
                if k not in ("__n", "__n_host")}
        # sentinel kept small enough that L * R (R <= 512) stays in int32;
        # 2^21 input frames ≈ 6 h of audio at 48 kHz / hop 512. Past it the
        # zero-invariant masking would emit silence, so fail LOUDLY first
        # (checked against the host-mirrored counter — no device sync).
        if total_frames is None and (n_host + 1) * self.chunk_frames >= 2 ** 21:
            raise RuntimeError(
                f"live stream exceeded {2**21} input frames (~6 h): the "
                f"int32 coordinate sentinel would zero further output. "
                f"Finalize this stream (pass total_frames) and start a "
                f"fresh init_state() — cached conv state does not carry "
                f"meaningful context across a 6-hour boundary."
            )
        total = jnp.asarray(total_frames if total_frames is not None
                            else 2 ** 21, jnp.int32)
        y, new = self._jit_step(self._params, bufs, n, total, z_p_chunk, g)
        new = dict(new)
        new["__n"] = n + 1
        new["__n_host"] = n_host + 1
        return y, new

    def bind(self, params: Dict) -> "StreamingFlowDecoder":
        """Bind model params (the {'flow','dec'} subtrees) and size state."""
        self._params = {"flow": params["flow"], "dec": params["dec"]}
        self.prepare(self._params, has_g=self.model.gin_channels > 0)
        return self
