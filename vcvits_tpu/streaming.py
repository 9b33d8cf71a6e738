"""Streaming chunked 48 kHz voice conversion.

The capability the reference LACKS: its inference truncates at
max_len=2000 frames ≈ 21.3 s (/root/reference/infer.py:86, SURVEY.md §5.7)
and long inputs are silently cut. BASELINE.json config 5 asks for streaming
chunked conversion for real-time serving.

Design (windowed-overlap streaming):
* Source audio arrives in arbitrary-size pieces; an internal buffer cuts
  it into fixed chunks (static XLA shapes -> ONE compiled program reused
  for every chunk).
* Each chunk is converted inside a window [left_ctx | chunk | right_ctx]
  so HuBERT's receptive field, the relative-attention window (±4 frames),
  and the decoder's conv halo all see real context; only the center is
  emitted.
* Consecutive emissions are equal-power cross-faded over `crossfade_ms`
  to hide any residual boundary phase mismatch from the prior-noise
  resampling.
* Pitch (pYIN) runs host-side per window on the fly.

Latency = chunk + right context (default 2.16 s); throughput is the
chunk RTF of the jitted infer program.

`incremental=True` (round-2) switches the flow reverse + decoder — the
expensive ~75% of device time — to TRUE incremental streaming with cached
conv state (vcvits_tpu/streaming_conv.py): per-layer ring buffers instead
of left-context recompute, exact continuation (no crossfade on the decode
side). Only the content encoder stays windowed (its attention is global).
The prior noise is drawn per GLOBAL frame index (counter-based PRNG), so
the z_p stream is invariant to how the audio was chunked.
"""

from __future__ import annotations

from functools import partial
from typing import Iterator, Optional

import numpy as np

from vcvits_tpu.data.collate import alignment_unit
from vcvits_tpu.dsp.pitch import coarse_f0, estimate_pitch
from vcvits_tpu.infer import VoiceConverter


class StreamingConverter:
    def __init__(
        self,
        converter: VoiceConverter,
        speaker_id: int,
        chunk_seconds: float = 2.0,
        context_seconds: float = 0.16,
        crossfade_ms: float = 20.0,
        noise_scale: float = 1.0,
        rng_seed: int = 0,
        incremental: bool = False,
    ):
        self.vc = converter
        self.sid = speaker_id
        self.noise_scale = noise_scale
        self.rng_seed = rng_seed
        cfg = converter.cfg.data
        self.src_sr = cfg.source_sampling_rate
        self.tgt_sr = cfg.target_sampling_rate
        self.ratio = self.tgt_sr // self.src_sr

        unit = alignment_unit(cfg)
        self.chunk = max(unit, int(round(chunk_seconds * self.src_sr / unit)) * unit)
        if incremental:
            # the incremental encoder slices m_p at ctx's frame offset, so
            # ctx must be a whole number of spec frames -> unit-aligned
            self.ctx = max(unit, int(round(context_seconds * self.src_sr / unit)) * unit)
        else:
            # windowed mode: the emit offset is sample-granular; only the
            # TOTAL window (ctx+chunk+ctx) must stay unit-aligned and ctx
            # must hold whole pitch frames (hubert_downsample). This makes
            # sub-unit right context (the <300 ms low-latency operating
            # points, docs/streaming.md) expressible: e.g. chunk 0.16 s +
            # ctx 0.08 s = 240 ms algorithmic latency.
            ds = cfg.hubert_downsample
            ctx = max(ds, int(round(context_seconds * self.src_sr / ds)) * ds)
            while (self.chunk + 2 * ctx) % unit:
                ctx += ds
            self.ctx = ctx
        self.xfade = int(crossfade_ms / 1000.0 * self.tgt_sr)

        self._buf = np.zeros(0, np.float32)
        self._left = np.zeros(self.ctx, np.float32)  # left context (zeros at start)
        self._tail: Optional[np.ndarray] = None  # pending crossfade tail @48k
        self._chunk_index = 0

        self.incremental = incremental
        if incremental:
            self._init_incremental(cfg)

    # ------------------------------------------------- incremental machinery
    def _frames(self, samples: int) -> int:
        """Source samples -> spec frames (exact at alignment-unit multiples)."""
        d = self.vc.cfg.data
        return samples * self.tgt_sr // (self.src_sr * d.hop_length)

    def _init_incremental(self, cfg) -> None:
        import jax
        import jax.numpy as jnp

        from vcvits_tpu.models.synthesizer import nearest_interp
        from vcvits_tpu.streaming_conv import StreamingFlowDecoder

        gen = self.vc.gen
        d = self.vc.cfg.data
        self._F = self._frames(self.chunk)          # z_p frames per chunk
        self._ctx_frames = self._frames(self.ctx)
        self._sfd = StreamingFlowDecoder(gen, None, self._F).bind(self.vc.g_params)
        self._dec_state = self._sfd.init_state()
        self._frames_in = 0      # z_p frames fed so far
        self._src_true = 0       # true (un-padded) source samples pushed
        self._drop = self._sfd.delay_samples  # warmup samples to discard

        tgt, src, hop = self.tgt_sr, self.src_sr, d.hop_length

        def enc(p, w, l, pi):
            def m_fn(m, w, l, pi):
                _, m_p, logs_p, _ = m.enc_p(w, l, pi)
                t_out = w.shape[1] * tgt // (src * hop)
                return nearest_interp(m_p, t_out), nearest_interp(logs_p, t_out)
            return gen.apply({"params": p}, w, l, pi, method=m_fn)

        self._enc = jax.jit(enc)

        @partial(jax.jit, static_argnums=(2, 3))
        def frame_noise(key, start, n, c):
            keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
                start + jnp.arange(n))
            return jax.vmap(lambda k: jax.random.normal(k, (c,)))(keys)

        self._frame_noise = frame_noise
        if gen.n_speakers >= 1 and gen.gin_channels > 0:
            emb = self.vc.g_params["emb_g"]["embedding"]
            self._g = jnp.asarray(emb)[self.sid][None, :]
        else:
            self._g = None

    def _convert_chunk_incremental(
        self, window: np.ndarray, total_frames: Optional[int]
    ) -> np.ndarray:
        """[left_ctx | chunk | right_ctx] source -> the chunk's converted
        samples, continuing the cached decoder/flow state exactly."""
        import jax
        import jax.numpy as jnp

        f0 = estimate_pitch(
            window, sr=self.src_sr, n_fft=self.vc.cfg.data.filter_length,
            win_length=self.vc.cfg.data.win_length, hop_length=320,
        )
        pitch = coarse_f0(f0, f0_bin=self.vc.cfg.data.num_pitch)
        m_p, logs_p = self._enc(
            self.vc.g_params, jnp.asarray(window)[None, :],
            jnp.asarray([len(window)], jnp.int32), jnp.asarray(pitch)[None, :],
        )
        sl = self._ctx_frames
        m_c = m_p[:, sl: sl + self._F]
        logs_c = logs_p[:, sl: sl + self._F]
        eps = self._frame_noise(
            jax.random.PRNGKey(self.rng_seed), self._frames_in, self._F,
            m_c.shape[-1])[None]
        z_p = m_c + eps.astype(m_c.dtype) * jnp.exp(logs_c) * self.noise_scale
        y, self._dec_state = self._sfd.step(
            self._dec_state, z_p, self._g, total_frames=total_frames)
        self._frames_in += self._F
        piece = np.asarray(y)[0, :, 0]
        drop = min(self._drop, len(piece))
        self._drop -= drop
        return piece[drop:]

    # ----------------------------------------------------------------- core
    def _convert_window(self, window: np.ndarray, emit_src_len: int) -> np.ndarray:
        """Convert [ctx | emit | ctx] (16 k); return the emit region @48k
        extended `xfade` samples into the left-context rendering (that span
        of time was also rendered at the END of the previous window — the
        two renderings are cross-faded in _emit)."""
        f0 = estimate_pitch(
            window, sr=self.src_sr, n_fft=self.vc.cfg.data.filter_length,
            win_length=self.vc.cfg.data.win_length, hop_length=320,
        )
        pitch = coarse_f0(f0, f0_bin=self.vc.cfg.data.num_pitch)
        out = self.vc.convert_array(
            window, pitch, self.sid, true_len=len(window),
            noise_scale=self.noise_scale, rng_seed=self.rng_seed,
        )
        start = self.ctx * self.ratio
        lead = min(self.xfade, start)
        return out[start - lead : start + emit_src_len * self.ratio]

    def _emit(self, piece: np.ndarray) -> Optional[np.ndarray]:
        """Overlap-crossfade `piece` (which leads with `xfade` samples of
        already-emitted time) against the held tail, hold back a new tail."""
        lead = min(self.xfade, max(len(piece) - 1, 0))
        if self._tail is not None and lead > 0:
            ramp = np.sin(0.5 * np.pi * np.linspace(0, 1, lead)) ** 2
            piece = piece.copy()
            piece[:lead] = ramp * piece[:lead] + (1 - ramp) * self._tail[-lead:]
        elif lead > 0:
            piece = piece[lead:]  # first chunk: no previous rendering
        if self.xfade > 0 and len(piece) > self.xfade:
            out, self._tail = piece[: -self.xfade], piece[-self.xfade :]
        else:
            out, self._tail = piece[:0], piece if len(piece) else None
        return out if len(out) else None

    # ------------------------------------------------------------------ api
    def push(self, samples: np.ndarray) -> Iterator[np.ndarray]:
        """Feed 16 kHz source samples; yields converted 48 kHz pieces."""
        self._buf = np.concatenate([self._buf, np.asarray(samples, np.float32)])
        if self.incremental:
            self._src_true += len(np.asarray(samples))
            while len(self._buf) >= self.chunk + self.ctx:
                chunk = self._buf[: self.chunk]
                right = self._buf[self.chunk: self.chunk + self.ctx]
                window = np.concatenate([self._left, chunk, right])
                piece = self._convert_chunk_incremental(window, None)
                self._left = np.concatenate([self._left, chunk])[-self.ctx:]
                self._buf = self._buf[self.chunk:]
                self._chunk_index += 1
                if len(piece):
                    yield piece
            return
        while len(self._buf) >= self.chunk + self.ctx:
            chunk = self._buf[: self.chunk]
            right = self._buf[self.chunk : self.chunk + self.ctx]
            window = np.concatenate([self._left, chunk, right])
            # window emit region includes the crossfade overlap on the left
            piece = self._convert_window(window, self.chunk)
            self._left = np.concatenate([self._left, chunk])[-self.ctx :]
            self._buf = self._buf[self.chunk :]
            self._chunk_index += 1
            out = self._emit(piece)
            if out is not None:
                yield out

    def flush(self) -> Iterator[np.ndarray]:
        """Convert whatever remains (right-padded with silence) and finish."""
        if self.incremental:
            yield from self._flush_incremental()
            return
        while len(self._buf) > 0:
            remain = min(len(self._buf), self.chunk)
            padded = np.zeros(self.chunk + self.ctx, np.float32)
            take = self._buf[: self.chunk + self.ctx]
            padded[: len(take)] = take
            window = np.concatenate([self._left, padded])
            piece = self._convert_window(window, self.chunk)
            lead = len(piece) - self.chunk * self.ratio  # crossfade overlap
            piece = piece[: lead + remain * self.ratio]
            self._left = np.concatenate([self._left, padded[: self.chunk]])[-self.ctx :]
            self._buf = self._buf[remain:]
            out = self._emit(piece)
            if out is not None:
                yield out
        if self._tail is not None:
            tail, self._tail = self._tail, None
            yield tail

    def _flush_incremental(self) -> Iterator[np.ndarray]:
        """Render the remaining buffered source, then drain the cached-state
        pipeline with zero chunks; outputs beyond the true stream length are
        masked inside StreamingFlowDecoder (offline right-pad semantics)."""
        import jax.numpy as jnp

        d = self.vc.cfg.data
        total_frames = max(self._frames(self._src_true), 1)
        target = total_frames * d.hop_length
        emitted = self._frames_in * d.hop_length - (
            self._sfd.delay_samples - self._drop)

        def cap(piece):
            nonlocal emitted
            take = min(len(piece), max(target - emitted, 0))
            emitted += take
            return piece[:take]

        while len(self._buf) > 0:
            remain = min(len(self._buf), self.chunk)
            padded = np.zeros(self.chunk + self.ctx, np.float32)
            take = self._buf[: self.chunk + self.ctx]
            padded[: len(take)] = take
            window = np.concatenate([self._left, padded])
            piece = cap(self._convert_chunk_incremental(window, total_frames))
            self._left = np.concatenate([self._left, padded[: self.chunk]])[-self.ctx:]
            self._buf = self._buf[remain:]
            if len(piece):
                yield piece
        zeros = jnp.zeros((1, self._F, self.vc.gen.inter_channels), jnp.float32)
        for _ in range(self._sfd.flush_chunks()):
            if emitted >= target:
                break
            y, self._dec_state = self._sfd.step(
                self._dec_state, zeros, self._g, total_frames=total_frames)
            self._frames_in += self._F
            piece = np.asarray(y)[0, :, 0]
            drop = min(self._drop, len(piece))
            self._drop -= drop
            piece = cap(piece[drop:])
            if len(piece):
                yield piece

    def convert_stream(
        self, pieces: Iterator[np.ndarray]
    ) -> Iterator[np.ndarray]:
        for p in pieces:
            yield from self.push(p)
        yield from self.flush()

    def reset(self) -> None:
        self._buf = np.zeros(0, np.float32)
        self._left = np.zeros(self.ctx, np.float32)
        self._tail = None
        self._chunk_index = 0
        if self.incremental:
            self._dec_state = self._sfd.init_state()
            self._frames_in = 0
            self._src_true = 0
            self._drop = self._sfd.delay_samples

    def set_speaker(self, speaker_id: int) -> None:
        """Re-target a (pooled, reset) converter to another speaker without
        re-tracing any jitted program: windowed mode passes sid as a traced
        argument; incremental mode only re-reads the embedding row host-side
        (serving.StreamPool reuses converters across connections)."""
        self.sid = int(speaker_id)
        if self.incremental and self._g is not None:
            import jax.numpy as jnp

            emb = self.vc.g_params["emb_g"]["embedding"]
            self._g = jnp.asarray(emb)[self.sid][None, :]
