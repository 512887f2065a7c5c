"""Stdlib HTTP frontend for the restoration service.

Completes the production-serving story around ``serve.RestorationService``
(the reference has no serving layer at all — SURVEY.md §0): a dependency-free
``ThreadingHTTPServer`` where every request thread feeds the service's
asynchronous coalescing front-end (``RestorationService.submit``), so
concurrent HTTP clients share full-size compiled batch launches on the TPU
instead of serializing one-image batches.

Endpoints
---------
* ``GET /healthz``  — liveness + bound task/model manifest (JSON).
* ``GET /stats``    — request/image counters and latency aggregates (JSON).
* ``POST /restore`` — one restoration request.
    - ``Content-Type: application/x-npz``: body is an ``np.savez`` archive
      with ``image`` ((h, w, C) float [0, 1] degraded observation) and
      optional ``kernel`` ((kh, kw) PSF) / ``mask`` ((h, w[, C]) {0,1});
      response is an npz archive with ``restored``.
    - ``Content-Type: image/png``: body is the degraded PNG; response is the
      restored PNG (demo-friendly path; kernels/masks default per task).
    - optional ``?lambda=<float>&zeta=<float>`` query params set this
      request's operating point (data-fidelity weight / renoise mix);
      requests at different points still share one compiled program.

Run: ``python -m diffpir_tpu.server_http --opt configs/<task>.yaml --port 8000``
or embed via ``start_server(service, port)`` which returns the live
``http.server`` instance (``.shutdown()`` to stop).

Malformed requests return 400 with the ``serve.RequestError`` message; the
device path is never poisoned by a bad request (validation happens on the
submitting thread before enqueue).
"""

from __future__ import annotations

import io
import json
import os
import threading
import time
from collections import deque
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from diffpir_tpu.serve import RequestError, RestorationService

__all__ = ["start_server", "make_handler"]


class _Stats:
    """Request counters + latency aggregates incl. p50/p95/p99.

    Percentiles are computed over a bounded window of the most recent
    ``window`` request latencies (ring buffer) so /stats stays O(window)
    and memory-bounded on a long-lived server; avg_latency_s remains the
    exact all-time mean.
    """

    def __init__(self, window: int = 4096) -> None:
        self.lock = threading.Lock()
        self.requests = 0
        self.images = 0
        self.errors = 0
        self.latency_sum = 0.0
        self._window = deque(maxlen=window)

    def record(self, n_images: int, seconds: float) -> None:
        with self.lock:
            self.requests += 1
            self.images += n_images
            self.latency_sum += seconds
            self._window.append(seconds)

    def error(self) -> None:
        with self.lock:
            self.errors += 1

    def snapshot(self) -> dict:
        with self.lock:
            out = dict(
                requests=self.requests, images=self.images, errors=self.errors,
                avg_latency_s=(self.latency_sum / self.requests
                               if self.requests else 0.0))
            if self._window:
                lat = np.sort(np.asarray(self._window, np.float64))
                for name, q in (("p50", 50.0), ("p95", 95.0), ("p99", 99.0)):
                    out[f"{name}_latency_s"] = float(np.percentile(lat, q))
                out["latency_window"] = int(lat.size)
            return out


def _parse_npz(body: bytes):
    with np.load(io.BytesIO(body)) as z:
        if "image" not in z:
            raise RequestError("npz body must contain an 'image' array")
        image = np.asarray(z["image"], np.float32)
        kernel = np.asarray(z["kernel"], np.float32) if "kernel" in z else None
        mask = np.asarray(z["mask"], np.float32) if "mask" in z else None
    return image, kernel, mask


def _parse_png(body: bytes) -> np.ndarray:
    from PIL import Image

    img = Image.open(io.BytesIO(body)).convert("RGB")
    return np.asarray(img, np.float32) / 255.0


def _png_bytes(img01: np.ndarray) -> bytes:
    from PIL import Image

    u8 = np.clip(np.rint(img01 * 255.0), 0, 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(u8).save(buf, format="PNG")
    return buf.getvalue()


def make_handler(service: RestorationService, stats: _Stats,
                 timeout_s: float = 600.0,
                 max_body_bytes: int = 256 * 1024 * 1024):
    """Build the request-handler class bound to one service instance.

    max_body_bytes caps request bodies (413 before reading): Content-Length
    is attacker-controlled and ThreadingHTTPServer spawns a thread per
    connection, so unbounded reads let a few large concurrent POSTs exhaust
    host memory.  256 MB default fits any plausible single-image npz
    (a 4096x4096 fp32 RGB image + mask is ~400 MB only at absurd sizes)."""

    manifest = dict(
        status="ok", task=service.cfg.task, model=service.cfg.model_name,
        iter_num=service.cfg.iter_num, batch=service.batch,
        n_channels=service.cfg.n_channels,
        sf=service.cfg.sf if service.cfg.task == "sr" else 1)

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _send(self, code: int, body: bytes, ctype: str) -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _send_json(self, code: int, obj: dict) -> None:
            self._send(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self):
            if self.path == "/healthz":
                self._send_json(200, manifest)
            elif self.path == "/stats":
                self._send_json(200, stats.snapshot())
            else:
                self._send_json(404, {"error": f"no route {self.path}"})

        def do_POST(self):
            from urllib.parse import parse_qs, urlparse

            url = urlparse(self.path)
            if url.path != "/restore":
                self._send_json(404, {"error": f"no route {self.path}"})
                return
            t0 = time.perf_counter()
            try:
                length = int(self.headers.get("Content-Length", 0))
                if length > max_body_bytes:
                    stats.error()
                    self._send_json(413, {
                        "error": f"request body {length} bytes exceeds cap "
                                 f"{max_body_bytes}"})
                    return
                body = self.rfile.read(length)
                ctype = (self.headers.get("Content-Type") or "").split(";")[0]
                as_png = ctype == "image/png"
                if as_png:
                    image, kernel, mask = _parse_png(body), None, None
                elif ctype == "application/x-npz":
                    image, kernel, mask = _parse_npz(body)
                else:
                    raise RequestError(
                        f"unsupported Content-Type {ctype!r} (use "
                        "application/x-npz or image/png)")
                # per-request operating point: ?lambda=&zeta= query params
                # (free: the compiled program takes them as runtime args)
                q = parse_qs(url.query)

                def _qfloat(name):
                    if name not in q:
                        return None
                    try:
                        return float(q[name][0])
                    except ValueError:
                        raise RequestError(
                            f"query param {name}={q[name][0]!r} is not a float")

                # submit -> coalescing worker batches concurrent requests
                fut = service.submit(image, kernel=kernel, mask=mask,
                                     lambda_=_qfloat("lambda"),
                                     zeta=_qfloat("zeta"))
                restored = fut.result(timeout=timeout_s)
                stats.record(1, time.perf_counter() - t0)
                if as_png:
                    self._send(200, _png_bytes(restored), "image/png")
                else:
                    out = io.BytesIO()
                    np.savez(out, restored=restored)
                    self._send(200, out.getvalue(), "application/x-npz")
            except RequestError as e:
                stats.error()
                self._send_json(400, {"error": str(e)})
            except Exception as e:  # noqa: BLE001 — surface as 500, keep serving
                stats.error()
                self._send_json(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def start_server(service: RestorationService, port: int = 8000,
                 host: str = "127.0.0.1",
                 warmup_hw: Optional[tuple[int, int]] = None,
                 block: bool = False,
                 max_body_bytes: int = 256 * 1024 * 1024) -> ThreadingHTTPServer:
    """Serve the bound service over HTTP.

    ``block=False`` runs the accept loop in a daemon thread and returns the
    server (tests / embedding); ``.server_address`` has the bound port when
    ``port=0``.  ``warmup_hw`` pre-compiles the program for one input size so
    the first request doesn't pay compilation latency.  ``max_body_bytes``
    rejects oversized request bodies with 413 before reading them.
    """
    stats = _Stats()
    httpd = ThreadingHTTPServer(
        (host, port), make_handler(service, stats,
                                   max_body_bytes=max_body_bytes))
    httpd.daemon_threads = True
    if warmup_hw is not None:
        service.warmup(warmup_hw)
    if block:
        try:
            httpd.serve_forever()
        finally:
            service.close()
        return httpd
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    return httpd


def main(argv: Optional[list[str]] = None) -> None:
    import argparse

    from diffpir_tpu.config import load_config

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--opt", default=None, help="task YAML config")
    ap.add_argument("--bundle", default=None, metavar="DIR",
                    help="boot from an exported AOT bundle "
                         "(diffpir_tpu.export) instead of JIT-compiling a "
                         "Runner — no model code, no trace, and with an "
                         "aot.<platform>.bin sidecar no XLA compile at all")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--warmup", type=int, nargs=2, metavar=("H", "W"),
                    default=None, help="pre-compile for this input size")
    ap.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                    help="config override (repeatable)")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--allow-random-weights", action="store_true",
                    help="permit serving without a trained checkpoint "
                         "(test fixtures only)")
    args = ap.parse_args(argv)
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    # persistent XLA compile cache: a cold 256px serving program can take
    # minutes to compile through a remote-compile tunnel; cache it on disk
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/diffpir_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    overrides = {}
    for kv in args.set:
        k, _, v = kv.partition("=")
        try:
            v = json.loads(v)
        except json.JSONDecodeError:
            pass
        overrides[k] = v
    if args.bundle is not None:
        if args.opt is not None or overrides:
            raise SystemExit("--bundle is self-describing; drop --opt/--set")
        service = RestorationService(bundle_path=args.bundle)
    else:
        if args.opt is None:
            raise SystemExit("pass --opt <config.yaml> or --bundle <dir>")
        cfg = load_config(args.opt, overrides=overrides)
        service = RestorationService(
            cfg, allow_random_weights=args.allow_random_weights)
    cfg = service.cfg
    print(f"serving {cfg.task}/{cfg.model_name} on {args.host}:{args.port}"
          + (f" (AOT bundle {args.bundle})" if args.bundle else ""))
    start_server(service, args.port, host=args.host,
                 warmup_hw=tuple(args.warmup) if args.warmup else None,
                 block=True)


if __name__ == "__main__":
    main()
