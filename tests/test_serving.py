"""Serving daemon (vcvits_tpu/serving.py): micro-batching correctness.

The capability layer above the reference's one-shot inference
(/root/reference/infer.py:64-91). Invariants: batched daemon output ==
direct convert_array output for the same request; concurrent clients are
all answered; noise_scale never mixes within a batch; stats report p50/p95.
"""

import threading

import numpy as np
import pytest

from vcvits_tpu.serving import ServingDaemon, _next_batch_size
from tests.test_streaming import converter  # noqa: F401 (fixture)


def _prep(converter, freq, seconds=0.4, shift=0):  # noqa: F811
    sr = converter.cfg.data.source_sampling_rate
    t = np.arange(int(sr * seconds)) / sr
    wav = (0.4 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    true_len = len(wav)
    padded = int(np.ceil(true_len / converter.unit) * converter.unit)
    wav = np.pad(wav, (0, padded - true_len))
    from vcvits_tpu.dsp.pitch import coarse_f0, estimate_pitch

    d = converter.cfg.data
    f0 = estimate_pitch(wav, sr=sr, n_fft=d.filter_length,
                        win_length=d.win_length, hop_length=320)
    return wav, coarse_f0(f0, f0_bin=d.num_pitch), true_len


def test_next_batch_size():
    assert [_next_batch_size(n, 16) for n in (1, 2, 3, 5, 9, 16, 40)] == \
        [1, 2, 4, 8, 16, 16, 16]


def test_daemon_matches_direct(converter):  # noqa: F811
    wav, pitch, tl = _prep(converter, 220.0)
    direct = converter.convert_array(wav, pitch, 1, tl, noise_scale=0.0)
    with ServingDaemon(converter, max_batch=4, window_ms=5) as daemon:
        out = daemon.submit(wav, pitch, tl, 1, noise_scale=0.0).result(timeout=120)
    np.testing.assert_allclose(out, direct, atol=1e-5)
    assert len(out) == len(direct)


def test_concurrent_clients_all_answered_and_batched(converter):  # noqa: F811
    reqs = [_prep(converter, f) for f in (220.0, 277.0, 330.0, 392.0)]
    directs = [converter.convert_array(w, p, i % 4, tl, noise_scale=0.0)
               for i, (w, p, tl) in enumerate(reqs)]
    with ServingDaemon(converter, max_batch=4, window_ms=200) as daemon:
        results = [None] * len(reqs)

        def client(i):
            w, p, tl = reqs[i]
            results[i] = daemon.submit(w, p, tl, i % 4,
                                       noise_scale=0.0).result(timeout=180)

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(len(reqs))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=180)
        stats = daemon.stats()
    for got, want in zip(results, directs):
        np.testing.assert_allclose(got, want, atol=1e-5)
    assert stats["requests"] == 4
    # the 200 ms window must have coalesced at least one multi-request batch
    assert stats["mean_batch"] > 1.0
    assert stats["latency_p95_ms"] >= stats["latency_p50_ms"] > 0


def test_noise_scale_never_mixes(converter):  # noqa: F811
    wav, pitch, tl = _prep(converter, 220.0)
    with ServingDaemon(converter, max_batch=8, window_ms=100) as daemon:
        f_a = daemon.submit(wav, pitch, tl, 0, noise_scale=0.0)
        f_b = daemon.submit(wav, pitch, tl, 0, noise_scale=0.5)
        f_c = daemon.submit(wav, pitch, tl, 0, noise_scale=0.0)
        a, b, c = (f.result(timeout=180) for f in (f_a, f_b, f_c))
        stats = daemon.stats()
    # deterministic requests in (possibly) one batch agree exactly
    np.testing.assert_allclose(a, c, atol=1e-5)
    assert stats["batches"] >= 2  # 0.0-batch and 0.5-batch separated


@pytest.mark.slow
def test_mixed_lengths_pad_exactly(converter):  # noqa: F811
    short = _prep(converter, 220.0, seconds=0.3)
    long = _prep(converter, 330.0, seconds=0.6)
    d_short = converter.convert_array(short[0], short[1], 1, short[2],
                                      noise_scale=0.0)
    d_long = converter.convert_array(long[0], long[1], 2, long[2],
                                     noise_scale=0.0)
    with ServingDaemon(converter, max_batch=4, window_ms=300) as daemon:
        f1 = daemon.submit(*short, 1, noise_scale=0.0)
        f2 = daemon.submit(*long, 2, noise_scale=0.0)
        o1, o2 = f1.result(timeout=180), f2.result(timeout=180)
    assert len(o1) == len(d_short) and len(o2) == len(d_long)
    # the short request was padded to the long one's length inside the
    # batch; masking must keep the result length-exact. (Values can differ
    # slightly from the solo program: attention sees more masked frames.)
    np.testing.assert_allclose(o2, d_long, atol=1e-5)


def test_compact_transfer_modes_close_to_exact(converter):  # noqa: F811
    """f16/i16 wire formats trade exactness for 2x/4x less tunnel traffic;
    outputs must stay within the wire format's quantization error."""
    wav, pitch, tl = _prep(converter, 220.0)
    direct = converter.convert_array(wav, pitch, 1, tl, noise_scale=0.0)
    for mode, atol in (("f16", 2e-3), ("i16", 2e-3)):
        with ServingDaemon(converter, max_batch=2, window_ms=5,
                           transfer=mode) as daemon:
            out = daemon.submit(wav, pitch, tl, 1,
                                noise_scale=0.0).result(timeout=180)
        assert out.dtype == np.float32
        assert len(out) == len(direct)
        np.testing.assert_allclose(out, direct, atol=atol,
                                   err_msg=f"transfer={mode}")
    # mulaw: 8-bit log-companded output — error bound is amplitude-relative
    # (half a code step in the companded domain, + the i16 source path)
    with ServingDaemon(converter, max_batch=2, window_ms=5,
                       transfer="mulaw") as daemon:
        out = daemon.submit(wav, pitch, tl, 1,
                            noise_scale=0.0).result(timeout=180)
    assert out.dtype == np.float32 and len(out) == len(direct)
    bound = 0.0225 * np.abs(direct) + 3e-3
    assert np.all(np.abs(out - direct) <= bound), (
        f"mulaw wire error exceeds companding bound: "
        f"max excess {np.max(np.abs(out - direct) - bound):.4g}")
    with pytest.raises(ValueError, match="transfer"):
        ServingDaemon(converter, transfer="i8")


def test_mulaw_codec_roundtrip():
    """Standalone mu-law codec contract: uint8 wire, amplitude-relative
    error, exact at 0, sign-symmetric."""
    from vcvits_tpu.serving import _mulaw_decode, _mulaw_encode

    x = np.linspace(-1.0, 1.0, 4097, dtype=np.float32)
    q = _mulaw_encode(x, np)
    assert q.dtype == np.uint8
    y = _mulaw_decode(q, np)
    assert np.all(np.abs(y - x) <= 0.0225 * np.abs(x) + 2e-4)
    assert _mulaw_decode(_mulaw_encode(np.zeros(4, np.float32), np), np)[0] == 0
    np.testing.assert_allclose(_mulaw_decode(_mulaw_encode(-x, np), np), -y,
                               atol=1e-7)


def test_mesh_data_parallel_serving(converter):  # noqa: F811
    """Batches shard row-wise over a 4-device "data" mesh (params
    replicated): outputs must match the direct single-device program, and
    dispatch sizes must round up to the axis size."""
    import jax
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    reqs = [_prep(converter, f) for f in (220.0, 277.0, 330.0)]
    directs = [converter.convert_array(w, p, i, tl, noise_scale=0.0)
               for i, (w, p, tl) in enumerate(reqs)]
    with ServingDaemon(converter, max_batch=4, window_ms=200,
                       mesh=mesh) as daemon:
        futs = [daemon.submit(w, p, tl, i, noise_scale=0.0)
                for i, (w, p, tl) in enumerate(reqs)]
        outs = [f.result(timeout=180) for f in futs]
        stats = daemon.stats()
        # a lone request must still shard: 1 -> padded to the axis size 4
        solo = daemon.submit(*reqs[0], 0, noise_scale=0.0).result(timeout=180)
    for got, want in zip(outs, directs):
        np.testing.assert_allclose(got, want, atol=1e-5)
    np.testing.assert_allclose(solo, directs[0], atol=1e-5)
    assert stats["requests"] == 3
    # constructor contract: batches must shard evenly over the axis
    with pytest.raises(ValueError, match="max_batch"):
        ServingDaemon(converter, max_batch=2, mesh=mesh)
    with pytest.raises(ValueError, match="power of two"):
        ServingDaemon(converter, max_batch=8,
                      mesh=Mesh(np.array(jax.devices()[:3]), ("data",)))


def test_http_front_end_round_trip(converter, tmp_path):  # noqa: F811
    """POST a wav to serve_http's /convert, get a PCM_24 wav back; /stats
    returns JSON. Uses the in-repo RIFF I/O (no soundfile on this host)."""
    import json
    import threading as th
    import urllib.request

    from vcvits_tpu.serving import serve_http
    from vcvits_tpu.utils.audio_io import read_wav, write_wav

    sr = converter.cfg.data.source_sampling_rate
    t = np.arange(int(sr * 0.4)) / sr
    src = str(tmp_path / "in.wav")
    write_wav(src, (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32), sr)

    with ServingDaemon(converter, max_batch=2, window_ms=5) as daemon:
        server = serve_http(daemon, host="127.0.0.1", port=0)
        port = server.server_address[1]
        thread = th.Thread(target=server.serve_forever, daemon=True)
        thread.start()
        try:
            body = open(src, "rb").read()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/convert?sid=1&noise_scale=0.0",
                data=body, method="POST")
            with urllib.request.urlopen(req, timeout=300) as resp:
                assert resp.status == 200
                out_bytes = resp.read()
            out_path = str(tmp_path / "out.wav")
            open(out_path, "wb").write(out_bytes)
            out, out_sr = read_wav(out_path)
            assert out_sr == converter.cfg.data.target_sampling_rate
            assert len(out) > 0 and np.isfinite(out).all()
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/stats", timeout=30) as resp:
                stats = json.loads(resp.read())
            assert stats["requests"] >= 1
        finally:
            server.shutdown()


def test_close_rejects_new_work(converter):  # noqa: F811
    daemon = ServingDaemon(converter, max_batch=2, window_ms=5)
    daemon.close()
    with pytest.raises(RuntimeError, match="closed"):
        daemon.submit(np.zeros(2560, np.float32), np.zeros(8, np.int64),
                      2560, 0)


@pytest.mark.slow
def test_http_stream_endpoint_matches_direct(converter):  # noqa: F811
    """POST /stream: chunk-uploaded raw PCM converts to chunked raw PCM
    equal to a direct StreamingConverter run; the session pool reuses the
    compiled converter across connections; over-capacity requests get 503."""
    import http.client
    import threading as th

    from vcvits_tpu.serving import serve_http
    from vcvits_tpu.streaming import StreamingConverter

    sr = converter.cfg.data.source_sampling_rate
    t = np.arange(int(sr * 1.0)) / sr
    src = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)

    direct_conv = StreamingConverter(converter, speaker_id=1,
                                     chunk_seconds=0.32, context_seconds=0.16,
                                     noise_scale=0.0)
    direct = np.concatenate(list(direct_conv.push(src))
                            + list(direct_conv.flush()))

    def stream_once(port, path, payload: bytes, piece=4096):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
        try:
            conn.putrequest("POST", path)
            conn.putheader("Transfer-Encoding", "chunked")
            conn.endheaders()
            for i in range(0, len(payload), piece):
                p = payload[i:i + piece]
                conn.send(f"{len(p):x}\r\n".encode() + p + b"\r\n")
            conn.send(b"0\r\n\r\n")
            resp = conn.getresponse()
            return resp.status, dict(resp.getheaders()), resp.read()
        finally:
            conn.close()

    with ServingDaemon(converter, max_batch=2, window_ms=5) as daemon:
        server = serve_http(daemon, host="127.0.0.1", port=0,
                            max_stream_sessions=1)
        port = server.server_address[1]
        thread = th.Thread(target=server.serve_forever, daemon=True)
        thread.start()
        try:
            path = ("/stream?sid=1&chunk_seconds=0.32&context_seconds=0.16"
                    "&noise_scale=0.0&format=f32")
            payload = src.astype("<f4").tobytes()
            status, headers, body = stream_once(port, path, payload)
            assert status == 200
            assert headers.get("X-Sample-Rate") == \
                str(converter.cfg.data.target_sampling_rate)
            got = np.frombuffer(body, dtype="<f4")
            np.testing.assert_allclose(got, direct, atol=1e-5)

            # second connection: pooled session is reset + reused -> same out
            status2, _, body2 = stream_once(port, path, payload)
            assert status2 == 200
            np.testing.assert_allclose(np.frombuffer(body2, dtype="<f4"),
                                       direct, atol=1e-5)

            # i16 wire: same audio within PCM-16 quantization
            status3, _, body3 = stream_once(
                port, path.replace("format=f32", "format=i16"),
                (np.clip(src, -1, 1) * 32767).astype("<i2").tobytes())
            got3 = np.frombuffer(body3, dtype="<i2").astype(np.float32) / 32767
            assert status3 == 200
            assert got3.shape == direct.shape
            # input AND output are PCM-16 quantized here; the net amplifies
            # the input's ~3e-5 step a little, so the bound is loose
            np.testing.assert_allclose(got3, direct, atol=2e-2)

            # wrong input rate -> 400
            status4, _, _ = stream_once(port, path + "&rate=8000", b"")
            assert status4 == 400
        finally:
            server.shutdown()


@pytest.mark.slow
def test_http_stream_busy_returns_503(converter):  # noqa: F811
    import http.client
    import threading as th

    from vcvits_tpu.serving import serve_http

    with ServingDaemon(converter, max_batch=2, window_ms=5) as daemon:
        server = serve_http(daemon, host="127.0.0.1", port=0,
                            max_stream_sessions=0)
        port = server.server_address[1]
        thread = th.Thread(target=server.serve_forever, daemon=True)
        thread.start()
        try:
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
            conn.request("POST", "/stream?sid=1", body=b"")
            resp = conn.getresponse()
            assert resp.status == 503
            conn.close()
        finally:
            server.shutdown()


def test_quantize_noise_bounds_compile_set():
    from vcvits_tpu.serving import _quantize_noise

    # noise_scale is a static jit arg: client floats must collapse onto a
    # bounded grid so query params cannot grow the compile cache unboundedly
    assert _quantize_noise(0.71) == 0.7
    assert _quantize_noise(0.7200001) == _quantize_noise(0.72) == 0.7
    assert _quantize_noise("0.33") == 0.35
    assert _quantize_noise(-5.0) == 0.0
    assert _quantize_noise(99.0) == 2.0
    grid = {_quantize_noise(x) for x in np.linspace(-1, 3, 4001)}
    assert len(grid) <= 41


def test_stream_pool_evicts_idle_other_key():
    """Idle sessions of one shape key must not 503 other keys (regression:
    release never freed capacity, so exact-key-only reuse starved B)."""
    from vcvits_tpu.serving import StreamPool

    class FakeConv:
        def __init__(self, vc, speaker_id, chunk_seconds, context_seconds,
                     incremental, noise_scale, rng_seed):
            self.chunk_seconds = chunk_seconds
            self.noise_scale = noise_scale
            self.rng_seed = rng_seed

        def reset(self):
            pass

        def set_speaker(self, sid):
            self.sid = sid

    pool = StreamPool.__new__(StreamPool)
    pool._cls, pool.vc, pool.max_sessions = FakeConv, None, 2
    pool._idle, pool._live = {}, 0
    pool._lock = threading.Lock()

    a1 = pool.acquire(0, chunk_seconds=2.0)
    a2 = pool.acquire(0, chunk_seconds=2.0)
    assert a1 is not None and a2 is not None
    assert pool.acquire(0, chunk_seconds=2.0) is None  # truly at capacity
    pool.release(a1)
    pool.release(a2)
    # both idle under key A: a key-B acquire evicts one instead of 503ing
    b1 = pool.acquire(3, chunk_seconds=0.32)
    assert b1 is not None and b1.chunk_seconds == 0.32
    # and the remaining idle A session is still reusable (exact-key hit)
    a3 = pool.acquire(1, chunk_seconds=2.0)
    assert a3 is a1 or a3 is a2
    assert pool.acquire(0, chunk_seconds=2.0) is None  # 2 in use again
