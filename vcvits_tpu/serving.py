"""Concurrent serving daemon: micro-batching voice conversion.

The reference's only serving story is one-file-at-a-time inference
(/root/reference/infer.py:64-91). On this TPU setup the per-call cost is
dominated by the ~25-30 ms device->host tunnel sync (ROADMAP round-2
stage timing), so sequential serving leaves most of the chip idle. This
daemon is the capability layer above `VoiceConverter`:

* clients `submit()` requests concurrently (thread-safe, returns a
  Future);
* a single dispatcher thread admits requests from a queue and
  micro-batches them within a latency window (first request opens the
  window; it closes after `window_ms` or when `max_batch` is reached);
* each batch runs as ONE device program + ONE device sync — the tunnel
  round trip and dispatch overhead amortize across the batch;
* batch shapes are quantized (wav length to the alignment unit via
  `prepare_source`, batch size up to the next power of two) so the
  steady state reuses a small, bounded set of compiled programs;
* per-request latency (p50/p95) and batch-size statistics are tracked.

Requests with different `noise_scale` never share a batch (noise_scale
is a compile-time constant of the jitted program); sharing a batch pads
every member to the longest wav in it, which the per-row length masks
make exact.

Scale-out: pass a `jax.sharding.Mesh` with a "data" axis and each batch
is sharded row-wise over the chips of one host (params replicated once)
— the serving-layer counterpart of the trainer's data-parallel mesh.

RNG semantics: the flow-noise PRNG key for a batch is derived from the
batch HEAD's `rng_seed` — requests sharing a batch draw from one key
(each row still gets independent samples; only seed-exact reproducibility
of a specific request requires it to ride alone or lead its batch, or
`noise_scale=0.0` which is deterministic).
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from vcvits_tpu.infer import VoiceConverter


@dataclass
class _Request:
    wav16k: np.ndarray          # alignment-unit padded source
    pitch: np.ndarray
    true_len: int
    speaker_id: int
    noise_scale: float
    rng_seed: int
    future: Future = field(default_factory=Future)
    t_submit: float = field(default_factory=time.perf_counter)


def _next_batch_size(n: int, max_batch: int) -> int:
    """Quantize to powers of two (bounded compile set)."""
    b = 1
    while b < n:
        b *= 2
    return min(b, max_batch)


_MU = 255.0  # G.711-style mu-law companding constant


def _mulaw_encode(x, xp):
    """[-1, 1] float -> uint8 mu-law code (xp: numpy or jax.numpy).

    8-bit log-companded wire: quantization error scales with amplitude
    (~0.022*|x| waveform-domain) instead of being uniform — the standard
    telephony trade, used here as an opt-in d2h format that halves the
    output transfer vs i16 on transfer-bound links."""
    x = xp.clip(x, -1.0, 1.0)
    y = xp.sign(x) * xp.log1p(_MU * xp.abs(x)) / np.log1p(_MU)
    # midtread, 255 levels (code 127 == exact zero, sign-symmetric)
    return xp.round(y * 127.0 + 127.0).astype(xp.uint8)


def _mulaw_decode(q, xp):
    """uint8 mu-law code -> float32 in [-1, 1]."""
    y = (q.astype(xp.float32) - 127.0) / 127.0
    return (xp.sign(y) * (xp.power(1.0 + _MU, xp.abs(y)) - 1.0) / _MU
            ).astype(xp.float32)


class ServingDaemon:
    """Queueing micro-batch loop over a `VoiceConverter`.

    >>> daemon = ServingDaemon(vc, max_batch=16, window_ms=25)
    >>> fut = daemon.submit(wav16k, pitch, true_len, speaker_id=3)
    >>> out48k = fut.result()
    >>> daemon.close()
    """

    def __init__(
        self,
        vc: VoiceConverter,
        max_batch: int = 16,
        window_ms: float = 25.0,
        queue_size: int = 256,
        transfer: str = "f32",
        mesh=None,
    ):
        """transfer: wire format for the device->host audio (and, for
        "i16", also host->device sources). "f32" is exact; "f16" halves
        and "i16" quarters the transfer (i16 == PCM-16 precision, what
        most serving emits anyway); "mulaw" keeps i16 sources but ships
        the output as 8-bit mu-law (8x less than f32 — log-companded, so
        error scales with amplitude, ~0.022*|x|: telephony-grade, opt-in).
        On this setup the tunnel moves ~44 MB/s each way, so a 32 x 10 s
        f32 batch pays ~1.4 s in output transfer alone — compact wire
        formats are the difference between transfer-bound and
        compute-bound serving (output d2h is 3x the input h2d here:
        48 kHz out vs 16 kHz in).

        mesh: optional `jax.sharding.Mesh` with a ``"data"`` axis —
        each batch is sharded over that axis (data-parallel serving: one
        program, rows split across chips, params replicated once). The
        daemon then rounds every dispatch up to a multiple of the axis
        size, so `max_batch` must be >= the axis size. This is the
        serving-layer counterpart of the trainer's data-parallel mesh
        (parallel/mesh.py); the reference has no analog (its serving
        story is single-GPU infer.py)."""
        if transfer not in ("f32", "f16", "i16", "mulaw"):
            raise ValueError(
                f"transfer must be f32|f16|i16|mulaw, got {transfer!r}")
        if mesh is not None:
            n_data = int(mesh.shape["data"])  # KeyError if axis missing
            if n_data & (n_data - 1):
                raise ValueError(f"data axis must be a power of two for "
                                 f"the bounded compile set, got {n_data}")
            if max_batch < n_data:
                raise ValueError(f"max_batch {max_batch} < data axis "
                                 f"{n_data}: every batch must shard evenly")
        self.mesh = mesh
        self.vc = vc
        self.max_batch = int(max_batch)
        self.window_ms = float(window_ms)
        self.transfer = transfer
        self._q: "queue.Queue[Optional[_Request]]" = queue.Queue(maxsize=queue_size)
        self._deferred: List[_Request] = []  # noise_scale-mismatched leftovers
        self._lock = threading.Lock()
        self._latencies: List[float] = []
        self._batch_sizes: List[int] = []
        self._closed = False
        self._infer_cast = None  # built lazily in the dispatcher thread
        # resolver thread: device->host transfer + future resolution happen
        # OFF the dispatcher thread, so the next batch is gathered and
        # dispatched while the previous one's audio is still in flight.
        self._resolve_q: "queue.Queue" = queue.Queue(maxsize=2)
        self._resolver = threading.Thread(target=self._resolve_loop, daemon=True)
        self._resolver.start()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # ------------------------------------------------------------ client API
    def submit(
        self,
        wav16k: np.ndarray,
        pitch: np.ndarray,
        true_len: int,
        speaker_id: int,
        noise_scale: float = 1.0,
        rng_seed: int = 0,
    ) -> Future:
        """Enqueue a prepared source (see VoiceConverter.prepare_source).
        Returns a Future resolving to the converted 48 kHz waveform."""
        if self._closed:
            raise RuntimeError("daemon is closed")
        req = _Request(np.asarray(wav16k, np.float32), np.asarray(pitch),
                       int(true_len), int(speaker_id), float(noise_scale),
                       int(rng_seed))
        self._q.put(req)
        return req.future

    def submit_file(self, path: str, speaker_id: int, pitch_shift: int = 0,
                    noise_scale: float = 1.0, rng_seed: int = 0) -> Future:
        """Host-prepare (read/resample/pYIN — runs in the CALLER's thread,
        so concurrent clients parallelize their own prep) then enqueue."""
        wav, true_len, pitch = self.vc.prepare_source(path, pitch_shift)
        return self.submit(wav, pitch, true_len, speaker_id, noise_scale,
                           rng_seed)

    def convert_file(self, path: str, speaker_id: int, **kw) -> np.ndarray:
        """Blocking one-call client."""
        return self.submit_file(path, speaker_id, **kw).result()

    # ------------------------------------------------------------ statistics
    def stats(self) -> Dict[str, float]:
        with self._lock:
            lat = np.asarray(self._latencies, np.float64)
            bs = np.asarray(self._batch_sizes, np.float64)
        if not len(lat):
            return {"requests": 0}
        return {
            "requests": int(len(lat)),
            "batches": int(len(bs)),
            "mean_batch": round(float(bs.mean()), 2),
            "latency_p50_ms": round(float(np.percentile(lat, 50)) * 1e3, 1),
            "latency_p95_ms": round(float(np.percentile(lat, 95)) * 1e3, 1),
            "latency_max_ms": round(float(lat.max()) * 1e3, 1),
        }

    def reset_stats(self) -> None:
        with self._lock:
            self._latencies.clear()
            self._batch_sizes.clear()

    def close(self, timeout: float = 30.0) -> None:
        if not self._closed:
            self._closed = True
            self._q.put(None)
            self._thread.join(timeout=timeout)
            self._resolve_q.put(None)
            self._resolver.join(timeout=timeout)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ----------------------------------------------------------- dispatcher
    def _gather(self) -> Optional[List[_Request]]:
        """Admit one batch: first request opens the latency window; close
        it after window_ms or at max_batch. Requests whose noise_scale
        differs from the batch head's are deferred to the next batch."""
        batch: List[_Request] = []
        if self._deferred:
            batch.append(self._deferred.pop(0))
        else:
            head = self._q.get()
            if head is None:
                return None
            batch.append(head)
        ns = batch[0].noise_scale
        deadline = time.perf_counter() + self.window_ms / 1e3
        # absorb same-noise deferred requests first (FIFO fairness)
        i = 0
        while i < len(self._deferred) and len(batch) < self.max_batch:
            if self._deferred[i].noise_scale == ns:
                batch.append(self._deferred.pop(i))
            else:
                i += 1
        while len(batch) < self.max_batch:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                req = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            if req is None:
                self._q.put(None)  # re-post shutdown for the outer loop
                break
            if req.noise_scale != ns:
                self._deferred.append(req)
                continue
            batch.append(req)
        return batch

    def _build_infer(self):
        """Jitted batch program: inlines VoiceConverter's infer, computes
        per-row valid lengths on device, and casts the audio to the wire
        dtype so the d2h transfer is as small as the format allows.
        With a mesh, the batch dimension is sharded over the "data" axis
        and params are replicated once (device_put here, in the
        dispatcher thread, so client threads never pay it)."""
        import jax
        import jax.numpy as jnp

        vc = self.vc
        hop = vc.cfg.data.hop_length
        transfer = self.transfer

        def run(p, wav, lens, pitch, sids, key, noise_scale):
            if transfer in ("i16", "mulaw"):  # mulaw rides i16 sources
                wav = wav.astype(jnp.float32) / 32767.0
            o, y_mask, _ = vc._infer(p, wav, lens, pitch, sids, key,
                                     noise_scale)
            n_valid = y_mask.reshape(y_mask.shape[0], -1)\
                            .sum(axis=-1).astype(jnp.int32) * hop
            o = o[:, :, 0]
            if transfer == "f16":
                o = o.astype(jnp.float16)
            elif transfer == "i16":
                o = jnp.clip(o.astype(jnp.float32), -1.0, 1.0)
                o = jnp.round(o * 32767.0).astype(jnp.int16)
            elif transfer == "mulaw":
                o = _mulaw_encode(o.astype(jnp.float32), jnp)
            else:
                o = o.astype(jnp.float32)
            return o, n_valid

        if self.mesh is None:
            self._params = vc.g_params
            return jax.jit(run, static_argnames=("noise_scale",))
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(self.mesh, P())
        rows = NamedSharding(self.mesh, P("data"))
        self._params = jax.device_put(vc.g_params, repl)
        return jax.jit(
            run,
            static_argnames=("noise_scale",),
            # (params, wavs, lens, pitches, sids, key)
            in_shardings=(repl, rows, rows, rows, rows, repl),
            out_shardings=(rows, rows),
        )

    def _resolve_loop(self) -> None:
        while True:
            item = self._resolve_q.get()
            if item is None:
                break
            batch, o_dev, nv_dev = item
            try:
                # the one d2h transfer for the whole batch (wire dtype)
                o_host = np.asarray(o_dev)
                nv = np.asarray(nv_dev)
                t_done = time.perf_counter()
                for row, r in enumerate(batch):
                    out = o_host[row, : nv[row]]
                    if self.transfer == "f16":
                        out = out.astype(np.float32)
                    elif self.transfer == "i16":
                        out = out.astype(np.float32) / 32767.0
                    elif self.transfer == "mulaw":
                        out = _mulaw_decode(out, np)
                    r.future.set_result(out)
                with self._lock:
                    self._batch_sizes.append(len(batch))
                    self._latencies.extend(t_done - r.t_submit for r in batch)
            except BaseException as e:
                for r in batch:
                    if not r.future.done():
                        r.future.set_exception(e)

    def _loop(self) -> None:
        import jax
        import jax.numpy as jnp

        vc = self.vc
        hubert_ds = 320  # source samples per content frame (HuBERT cadence)
        infer = self._build_infer()
        n_data = int(self.mesh.shape["data"]) if self.mesh is not None else 1
        while True:
            batch = self._gather()
            if batch is None:
                break
            try:
                n = len(batch)
                # a power of two >= the mesh data axis always shards evenly
                bsz = max(_next_batch_size(n, self.max_batch), n_data)
                pad_len = max(len(r.wav16k) for r in batch)
                wav_dtype = (np.int16 if self.transfer in ("i16", "mulaw")
                             else np.float32)
                wavs = np.zeros((bsz, pad_len), wav_dtype)
                pitches = np.zeros((bsz, pad_len // hubert_ds),
                                   batch[0].pitch.dtype)
                lens = np.zeros((bsz,), np.int32)
                sids = np.zeros((bsz,), np.int32)
                for row, r in enumerate(batch):
                    w = r.wav16k
                    if self.transfer in ("i16", "mulaw"):
                        w = np.round(np.clip(w, -1.0, 1.0) * 32767.0)\
                              .astype(np.int16)
                    wavs[row, : len(w)] = w
                    pitches[row, : len(r.pitch)] = r.pitch
                    lens[row] = r.true_len
                    sids[row] = r.speaker_id
                lens[n:] = 1  # batch-pad rows: minimal valid length
                key = jax.random.PRNGKey(batch[0].rng_seed)
                o_dev, nv_dev = infer(
                    self._params, jnp.asarray(wavs),
                    jnp.asarray(lens), jnp.asarray(pitches),
                    jnp.asarray(sids), key, batch[0].noise_scale,
                )
                # hand off to the resolver: the d2h transfer overlaps the
                # NEXT batch's gather + dispatch (bounded 2-deep)
                self._resolve_q.put((batch, o_dev, nv_dev))
            except BaseException as e:  # resolve futures, keep serving
                for r in batch:
                    if not r.future.done():
                        r.future.set_exception(e)


class StreamPool:
    """Reusable pool of StreamingConverter sessions for /stream connections.

    A fresh StreamingConverter per connection would re-trace its jitted
    programs (its closures are new function objects, so jax's jit cache
    misses); the pool hands out reset() converters keyed by the shape-
    determining knobs (chunk/context seconds, incremental) and re-targets
    speaker/noise/seed per connection — zero recompiles in steady state.
    `max_sessions` bounds live sessions across all keys (each incremental
    session holds per-layer conv state in device memory)."""

    def __init__(self, vc: VoiceConverter, max_sessions: int = 4):
        from vcvits_tpu.streaming import StreamingConverter

        self._cls = StreamingConverter
        self.vc = vc
        self.max_sessions = max_sessions
        self._idle: Dict[tuple, List] = {}
        self._live = 0
        self._lock = threading.Lock()

    def acquire(self, speaker_id: int, chunk_seconds: float = 2.0,
                context_seconds: float = 0.16, incremental: bool = False,
                noise_scale: float = 1.0, rng_seed: int = 0):
        """A ready session, or None when max_sessions are already live."""
        key = (round(chunk_seconds, 6), round(context_seconds, 6),
               bool(incremental))
        with self._lock:
            pool = self._idle.setdefault(key, [])
            conv = pool.pop() if pool else None
            if conv is None:
                if self._live >= self.max_sessions:
                    # capacity counts existing converters, idle included —
                    # evict an idle one of another key so idle sessions
                    # never starve differently-shaped requests; only
                    # truly-in-use sessions can produce a 503
                    for other in self._idle.values():
                        if other:
                            other.pop()  # dropped; GC frees device state
                            self._live -= 1
                            break
                    if self._live >= self.max_sessions:
                        return None
                self._live += 1
        if conv is None:
            try:
                conv = self._cls(self.vc, speaker_id=speaker_id,
                                 chunk_seconds=chunk_seconds,
                                 context_seconds=context_seconds,
                                 incremental=incremental,
                                 noise_scale=noise_scale, rng_seed=rng_seed)
            except BaseException:
                with self._lock:
                    self._live -= 1
                raise
            conv._pool_key = key
        else:
            conv.set_speaker(speaker_id)
            conv.noise_scale = noise_scale
            conv.rng_seed = rng_seed
        return conv

    def release(self, conv) -> None:
        conv.reset()
        with self._lock:
            self._idle[conv._pool_key].append(conv)


def _quantize_noise(x: float) -> float:
    """noise_scale is a *static* jit argument (a Python float baked into the
    compiled program, infer.py `_infer`): quantize client-supplied values to
    a 0.05 grid in [0, 2] so a free-form query param cannot grow the compile
    cache without bound (at most 41 program variants per shape)."""
    return min(max(round(float(x) * 20.0) / 20.0, 0.0), 2.0)


def _iter_request_body(handler, block: int = 32768):
    """Yield raw body bytes from a BaseHTTPRequestHandler request, handling
    both Content-Length and Transfer-Encoding: chunked (stdlib's rfile is a
    plain stream — chunk framing must be parsed by hand)."""
    te = (handler.headers.get("Transfer-Encoding") or "").lower()
    if "chunked" in te:
        while True:
            line = handler.rfile.readline(1024).strip()
            if not line:
                return
            size = int(line.split(b";")[0], 16)
            if size == 0:
                handler.rfile.readline(1024)  # trailing CRLF (no trailers)
                return
            remaining = size
            while remaining > 0:
                piece = handler.rfile.read(min(block, remaining))
                if not piece:
                    return
                remaining -= len(piece)
                yield piece
            handler.rfile.read(2)  # chunk-terminating CRLF
    else:
        remaining = int(handler.headers.get("Content-Length", 0))
        while remaining > 0:
            piece = handler.rfile.read(min(block, remaining))
            if not piece:
                return
            remaining -= len(piece)
            yield piece


def serve_http(daemon: ServingDaemon, host: str = "127.0.0.1",
               port: int = 8300, max_stream_sessions: int = 4):
    """Minimal stdlib HTTP front-end. Returns the threading server; call
    serve_forever().

    * `POST /convert?sid=N` — wav body -> converted wav (micro-batched
      through the daemon with every other in-flight request).
    * `POST /stream?sid=N[&chunk_seconds=2.0][&context_seconds=0.16]
      [&incremental=1][&noise_scale=1.0][&seed=0][&format=i16|f32]` —
      live streaming: raw mono PCM at the source rate (16 kHz) in,
      chunked-transfer raw PCM at 48 kHz out; output chunks are written
      as soon as each audio chunk converts, while the request body is
      still uploading. Sessions come from a compiled-converter pool
      (`StreamPool`); 503 when `max_stream_sessions` are live.
    """
    import os
    import tempfile
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from vcvits_tpu.utils.audio_io import read_wav, write_wav

    vc = daemon.vc
    stream_pool = StreamPool(vc, max_sessions=max_stream_sessions)

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"  # chunked responses for /stream
        # socket inactivity bound: a stalled client must not hold a pooled
        # /stream session (or a worker thread) forever — BaseRequestHandler
        # applies this as the connection timeout; the read raises and the
        # finally-block recycles the session
        timeout = 600
        def do_POST(self):
            try:
                from urllib.parse import parse_qs, urlparse

                u = urlparse(self.path)
                if u.path == "/stream":
                    self._do_stream(parse_qs(u.query))
                    return
                if u.path != "/convert":
                    self.send_error(404)
                    return
                q = parse_qs(u.query)
                sid = int(q.get("sid", ["0"])[0])
                shift = int(q.get("pitch_shift", ["0"])[0])
                noise = _quantize_noise(q.get("noise_scale", ["1.0"])[0])
                # handles both Content-Length and chunked uploads — the
                # handler advertises HTTP/1.1, so compliant clients may
                # legally send Transfer-Encoding: chunked here too
                body = b"".join(_iter_request_body(self))
                # in-repo RIFF parser (utils/audio_io.py — no soundfile dep)
                with tempfile.NamedTemporaryFile(suffix=".wav",
                                                 delete=False) as tf:
                    tf.write(body)
                    tmp_in = tf.name
                try:
                    wav, sr = read_wav(tmp_in)
                finally:
                    os.unlink(tmp_in)
                from vcvits_tpu.dsp.pitch import coarse_f0, estimate_pitch
                from vcvits_tpu.dsp.pitch_shift import pitch_shift as _ps
                from vcvits_tpu.dsp.resample import resample

                d = vc.cfg.data
                wav = resample(wav, sr, d.source_sampling_rate)
                if shift:
                    wav = _ps(wav, d.source_sampling_rate, shift)
                true_len = len(wav)
                padded = int(np.ceil(max(true_len, 1) / vc.unit) * vc.unit)
                wav = np.pad(wav, (0, padded - true_len)).astype(np.float32)
                f0 = estimate_pitch(wav, sr=d.source_sampling_rate,
                                    n_fft=d.filter_length,
                                    win_length=d.win_length, hop_length=320)
                pitch = coarse_f0(f0, f0_bin=d.num_pitch)
                out = daemon.submit(wav, pitch, true_len, sid,
                                    noise_scale=noise).result()
                with tempfile.NamedTemporaryFile(suffix=".wav",
                                                 delete=False) as tf:
                    tmp_out = tf.name
                try:
                    write_wav(tmp_out, out, d.target_sampling_rate,
                              subtype="PCM_24")
                    with open(tmp_out, "rb") as fh:
                        data = fh.read()
                finally:
                    os.unlink(tmp_out)
                self.send_response(200)
                self.send_header("Content-Type", "audio/wav")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)
            except Exception as e:  # noqa: BLE001
                self.send_error(500, str(e))

        def _do_stream(self, q):
            d = vc.cfg.data
            sid = int(q.get("sid", ["0"])[0])
            fmt = q.get("format", ["i16"])[0]
            if fmt not in ("i16", "f32"):
                self.send_error(400, f"unknown format {fmt!r}")
                return
            rate = int(q.get("rate", [str(d.source_sampling_rate)])[0])
            if rate != d.source_sampling_rate:
                self.send_error(
                    400, f"stream input must be {d.source_sampling_rate} Hz "
                         "mono PCM (resample client-side)")
                return
            conv = stream_pool.acquire(
                sid,
                chunk_seconds=float(q.get("chunk_seconds", ["2.0"])[0]),
                context_seconds=float(q.get("context_seconds", ["0.16"])[0]),
                incremental=q.get("incremental", ["0"])[0] in ("1", "true"),
                noise_scale=_quantize_noise(q.get("noise_scale", ["1.0"])[0]),
                rng_seed=int(q.get("seed", ["0"])[0]),
            )
            if conv is None:
                self.send_error(503, "all streaming sessions busy")
                return

            width = 2 if fmt == "i16" else 4

            def encode(piece: np.ndarray) -> bytes:
                if fmt == "i16":
                    return (np.clip(piece, -1.0, 1.0) * 32767.0) \
                        .astype("<i2").tobytes()
                return piece.astype("<f4").tobytes()

            def write_chunk(data: bytes) -> None:
                if data:
                    self.wfile.write(f"{len(data):x}\r\n".encode())
                    self.wfile.write(data)
                    self.wfile.write(b"\r\n")

            try:
                self.send_response(200)
                self.send_header("Content-Type", "application/octet-stream")
                self.send_header("Transfer-Encoding", "chunked")
                self.send_header("X-Sample-Rate", str(d.target_sampling_rate))
                self.send_header("X-Format", fmt)
                self.end_headers()
                carry = b""
                for body_piece in _iter_request_body(self):
                    carry += body_piece
                    usable = len(carry) // width * width
                    if not usable:
                        continue
                    samples = np.frombuffer(carry[:usable],
                                            dtype="<i2" if fmt == "i16"
                                            else "<f4")
                    carry = carry[usable:]
                    if fmt == "i16":
                        samples = samples.astype(np.float32) / 32767.0
                    for piece in conv.push(samples):
                        write_chunk(encode(piece))
                for piece in conv.flush():
                    write_chunk(encode(piece))
                self.wfile.write(b"0\r\n\r\n")
            except Exception:  # noqa: BLE001
                # Any mid-stream failure — client hang-up, socket timeout,
                # malformed chunk framing, converter error — lands here
                # AFTER the 200 + chunked headers went out, so a 500 can't
                # be sent (its bytes would corrupt the open chunked body);
                # the response is unterminated, so drop the connection.
                self.close_connection = True
            finally:
                stream_pool.release(conv)

        def do_GET(self):
            if self.path == "/stats":
                import json

                data = json.dumps(daemon.stats()).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)
            else:
                self.send_error(404)

        def log_message(self, *a):  # quiet
            pass

    return ThreadingHTTPServer((host, port), Handler)
