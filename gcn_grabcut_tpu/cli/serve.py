"""Serving CLI — a dependency-free HTTP inference server.

The reference ships only batch CLIs; production use of a segmentation
model is request/response, so the TPU framework adds a serving layer
designed around the chip's economics:

* **One compile signature.** Every request is letterboxed to a fixed
  (size, size) canvas, so the whole fleet of requests reuses one cached
  device program (compiles over the tunnel cost seconds; resized masks
  are mapped back to the request geometry on the way out).
* **Micro-batching.** Concurrent requests are coalesced (up to
  --batch, waiting at most --batch-wait-ms) and run through the
  device-resident `segment_batch` program — the chip sees large batches,
  each client sees one round trip.
* **Warm start.** The program is compiled at startup (--no-warmup skips),
  so the first request pays milliseconds, not a cold compile.

Protocol (JSON in, JSON out; stdlib only on both sides):

  POST /segment     body: image file bytes (PNG/JPEG) or JSON
                    {"image_b64": ...}; optional query args threshold,
                    filter_radius, keep_largest.
                    → {"mask_png_b64": ..., "fg_ratio": ..., "timing_ms": ...}
  GET  /healthz     → {"ok": true, "pending": n, "served": n}

Usage:
  python -m gcn_grabcut_tpu.cli.serve --checkpoint ckpt/best_model.msgpack \
      --port 8021 --size 512 --batch 8
"""

from __future__ import annotations

import argparse
import base64
import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="HTTP segmentation server (micro-batched, warm-compiled)")
    p.add_argument("--checkpoint", required=True,
                   help="checkpoint path, or comma-separated paths to serve "
                        "the vmapped inference ensemble")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8021)
    p.add_argument("--size", type=int, default=512,
                   help="fixed canvas size (one compile signature)")
    p.add_argument("--n-segments", type=int, default=500)
    p.add_argument("--bg-connectivity", action="store_true",
                   help="geodesic boundary-connectivity bg prior cue "
                        "(match the checkpoint's training setting)")
    p.add_argument("--batch", type=int, default=8,
                   help="max requests coalesced into one device program")
    p.add_argument("--batch-wait-ms", type=float, default=25.0,
                   help="how long the batcher waits for co-travellers")
    p.add_argument("--threshold", type=float, default=0.65)
    p.add_argument("--filter-radius", type=int, default=4)
    p.add_argument("--no-warmup", action="store_true")
    p.add_argument("--cpu", action="store_true")
    return p.parse_args(argv)


def _letterbox(img: np.ndarray, size: int) -> tuple[np.ndarray, tuple]:
    """Resize the long edge to `size` and pad to (size, size).  Returns the
    canvas and (h, w, scaled_h, scaled_w) needed to undo it."""
    import cv2
    h, w = img.shape[:2]
    s = size / max(h, w)
    sh, sw = max(int(round(h * s)), 1), max(int(round(w * s)), 1)
    resized = cv2.resize(img, (sw, sh), interpolation=cv2.INTER_AREA)
    canvas = np.zeros((size, size, 3), np.uint8)
    canvas[:sh, :sw] = resized
    return canvas, (h, w, sh, sw)


def _unbox(mask: np.ndarray, geom: tuple) -> np.ndarray:
    import cv2
    h, w, sh, sw = geom
    return cv2.resize(mask[:sh, :sw], (w, h),
                      interpolation=cv2.INTER_NEAREST)


class _Request:
    __slots__ = ("image", "geom", "opts", "event", "result", "error")

    def __init__(self, image, geom, opts):
        self.image = image
        self.geom = geom
        self.opts = opts
        self.event = threading.Event()
        self.result = None
        self.error = None


class Batcher:
    """Coalesces concurrent requests into device-sized batches.

    Requests with identical post-processing options ride the same program
    call; mixed options fall back to per-option sub-batches (the program
    signature only depends on (B, H, W), so this costs no extra compiles).
    """

    def __init__(self, pipeline, size: int, max_batch: int, wait_ms: float,
                 defaults: dict):
        self.pipe = pipeline
        self.size = size
        self.max_batch = max_batch
        self.wait_s = wait_ms / 1000.0
        self.defaults = defaults
        self.q: "queue.Queue[_Request]" = queue.Queue()
        self.served = 0
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, image: np.ndarray, opts: dict) -> _Request:
        canvas, geom = _letterbox(image, self.size)
        req = _Request(canvas, geom, opts)
        self.q.put(req)
        return req

    def _drain(self) -> list:
        first = self.q.get()
        batch = [first]
        deadline = time.monotonic() + self.wait_s
        while len(batch) < self.max_batch:
            left = deadline - time.monotonic()
            if left <= 0:
                break
            try:
                batch.append(self.q.get(timeout=left))
            except queue.Empty:
                break
        return batch

    def _loop(self):
        while True:
            batch = self._drain()
            by_opts: dict[tuple, list] = {}
            for r in batch:
                by_opts.setdefault(tuple(sorted(r.opts.items())), []).append(r)
            for _, group in by_opts.items():
                self._run(group)

    def _run(self, group: list) -> None:
        opts = dict(self.defaults)
        opts.update(group[0].opts)
        imgs = [r.image for r in group]
        # Pad to the full batch size so the one cached program is reused.
        while len(imgs) < self.max_batch:
            imgs.append(imgs[-1])
        try:
            t0 = time.perf_counter()
            results = self.pipe.segment_batch(
                imgs, threshold_fg=opts["threshold"],
                threshold_bg=opts["threshold"],
                keep_largest=opts["keep_largest"],
                filter_radius=opts["filter_radius"],
                want_segments=False)   # serving returns masks only —
            # dropping the label map cuts the per-batch d2h pull ~6x.
            dt = time.perf_counter() - t0
            for r, res in zip(group, results):
                r.result = (_unbox(res.binary_mask, r.geom), dt)
                self.served += 1
        except Exception as exc:   # surface the failure to every waiter
            for r in group:
                r.error = repr(exc)
        finally:
            for r in group:
                r.event.set()


def make_handler(batcher: Batcher):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):   # quiet access log
            pass

        def _json(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if urlparse(self.path).path != "/healthz":
                return self._json(404, {"error": "unknown path"})
            self._json(200, {"ok": True, "pending": batcher.q.qsize(),
                             "served": batcher.served})

        def do_POST(self):
            import cv2
            parsed = urlparse(self.path)
            if parsed.path != "/segment":
                return self._json(404, {"error": "unknown path"})
            try:
                n = int(self.headers.get("Content-Length", 0))
                raw = self.rfile.read(n)
                ctype = self.headers.get("Content-Type", "")
                if "json" in ctype:
                    raw = base64.b64decode(json.loads(raw)["image_b64"])
                buf = np.frombuffer(raw, np.uint8)
                bgr = cv2.imdecode(buf, cv2.IMREAD_COLOR)
                if bgr is None:
                    return self._json(400, {"error": "undecodable image"})
                rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)

                qs = parse_qs(parsed.query)
                opts = {}
                if "threshold" in qs:
                    opts["threshold"] = float(qs["threshold"][0])
                if "filter_radius" in qs:
                    opts["filter_radius"] = int(qs["filter_radius"][0])
                if "keep_largest" in qs:
                    opts["keep_largest"] = qs["keep_largest"][0] in (
                        "1", "true", "True")

                req = batcher.submit(rgb, opts)
                if not req.event.wait(timeout=600):
                    return self._json(504, {"error": "batch timeout"})
                if req.error is not None:
                    return self._json(500, {"error": req.error})
                mask, dt = req.result
                ok, png = cv2.imencode(".png", mask * 255)
                self._json(200, {
                    "mask_png_b64": base64.b64encode(png.tobytes()).decode(),
                    "fg_ratio": float(mask.mean()),
                    "timing_ms": round(dt * 1000.0, 1),
                })
            except Exception as exc:
                self._json(500, {"error": repr(exc)})

    return Handler


def build_server(args) -> tuple:
    """(server, batcher) — split from main() so tests can drive it."""
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from ..utils import setup_compilation_cache
    setup_compilation_cache()
    from .. import GCNGrabCutPipeline, SuperpixelGraphConfig
    from ..train.checkpoints import load_model_auto

    model, variables, meta = load_model_auto(args.checkpoint)
    if meta.get("ensemble_size", 1) > 1:
        print(f"[Serve] ensemble of {meta['ensemble_size']} checkpoints")
    pipe = GCNGrabCutPipeline(
        model, variables,
        sp_config=SuperpixelGraphConfig(
            n_segments=args.n_segments,
            bg_connectivity=args.bg_connectivity))

    defaults = {"threshold": args.threshold,
                "filter_radius": args.filter_radius,
                "keep_largest": False}
    batcher = Batcher(pipe, args.size, args.batch, args.batch_wait_ms,
                      defaults)

    if not args.no_warmup:
        t0 = time.perf_counter()
        warm = [np.zeros((args.size, args.size, 3), np.uint8)
                + np.uint8(i * 7 + 30) for i in range(args.batch)]
        for i, w in enumerate(warm):   # give it structure: a bright square
            w[args.size // 4: args.size // 2,
              args.size // 4: args.size // 2] = 200 + i
        pipe.segment_batch(warm, threshold_fg=args.threshold,
                           threshold_bg=args.threshold,
                           filter_radius=args.filter_radius)
        print(f"[Serve] warm compile done in {time.perf_counter() - t0:.1f}s")

    server = ThreadingHTTPServer((args.host, args.port),
                                 make_handler(batcher))
    return server, batcher


def main(argv=None):
    args = parse_args(argv)
    server, _ = build_server(args)
    print(f"[Serve] listening on http://{args.host}:{args.port}  "
          f"(canvas {args.size}px, micro-batch {args.batch}, "
          f"wait {args.batch_wait_ms}ms)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()


if __name__ == "__main__":
    main()
