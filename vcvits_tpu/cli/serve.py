#!/usr/bin/env python
"""Serving CLI: micro-batching voice-conversion daemon over HTTP.

The capability layer above the reference's one-shot inference
(/root/reference/infer.py:64-91): concurrent requests are micro-batched
within a latency window and run as one device program per batch
(vcvits_tpu/serving.py).

  python serve.py --workdir logs --port 8300 --max-batch 16 --window-ms 25
  # convert:
  curl -X POST --data-binary @source.wav \
      "http://127.0.0.1:8300/convert?sid=3" -o out.wav
  # live stream (raw 16 kHz mono i16 PCM in, chunked 48 kHz i16 PCM out):
  arecord -f S16_LE -r 16000 -c 1 -t raw | \
      curl -sN -X POST -H "Transfer-Encoding: chunked" -T - \
      "http://127.0.0.1:8300/stream?sid=3&incremental=1" | \
      aplay -f S16_LE -r 48000 -c 1 -t raw
  # observe:
  curl http://127.0.0.1:8300/stats
"""

from __future__ import annotations

import argparse
import logging
import os

# persistent XLA compile cache (jax.config route: this runtime pre-imports jax,
# so the env var alone is ignored — see vcvits_tpu/utils/compile_cache.py)
from vcvits_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--workdir", default="logs")
    parser.add_argument("-c", "--config", default=None)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8300)
    parser.add_argument("--max-batch", type=int, default=16)
    parser.add_argument("--window-ms", type=float, default=25.0,
                        help="micro-batch latency window")
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--int8-decoder", action="store_true",
                        help="int8 decoder convs (same checkpoint, small "
                             "quantization noise — see docs/quantization; "
                             "measured SLOWER than bf16 end-to-end on v5e)")
    parser.add_argument("--int8-decoder-mode", choices=("w8a8", "w8"),
                        default="w8a8",
                        help="w8a8 = dynamic int8 acts + weights on the "
                             "int8 MXU; w8 = weight-only int8, bf16 acts")
    parser.add_argument("--transfer", default="f32",
                        choices=("f32", "f16", "i16", "mulaw"),
                        help="device<->host wire format; i16 quarters the "
                             "transfer (PCM-16 precision) — the measured "
                             "winner on slow links; mulaw additionally "
                             "halves the output side (8-bit companded, "
                             "telephony-grade) (docs/serving.md)")
    parser.add_argument("--max-stream-sessions", type=int, default=4,
                        help="cap on live POST /stream sessions (each holds "
                             "a pooled compiled StreamingConverter; excess "
                             "connections get 503)")
    parser.add_argument("--data-parallel", type=int, default=0, metavar="N",
                        help="shard every batch over the first N local "
                             "devices (power of two; params replicated). "
                             "0 = single device")
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO)

    import jax.numpy as jnp

    from vcvits_tpu.config import load_config
    from vcvits_tpu.infer import VoiceConverter
    from vcvits_tpu.serving import ServingDaemon, serve_http

    cfg = load_config(args.config) if args.config else None
    vc = VoiceConverter.from_checkpoint(
        args.workdir, cfg=cfg,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        quant_int8=(args.int8_decoder
                    and (True if args.int8_decoder_mode == "w8a8"
                         else "w8")))
    mesh = None
    if args.data_parallel:
        import jax
        from jax.sharding import Mesh

        mesh = Mesh(jax.devices()[: args.data_parallel], ("data",))
    with ServingDaemon(vc, max_batch=args.max_batch,
                       window_ms=args.window_ms,
                       transfer=args.transfer, mesh=mesh) as daemon:
        server = serve_http(daemon, host=args.host, port=args.port,
                            max_stream_sessions=args.max_stream_sessions)
        logging.info("serving on http://%s:%d (max_batch=%d window=%.0fms)",
                     args.host, args.port, args.max_batch, args.window_ms)
        try:
            server.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            server.shutdown()


if __name__ == "__main__":
    main()
