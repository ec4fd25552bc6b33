"""HTTP serving front-end over the continuous-batching engine.

The reference ships interactive REPL scripts only (codes/
interactive_vqa_inferencer.py, interactive_image_generator.py — one request
at a time, no network surface). This module turns the ContinuousBatcher into
a long-running service:

  * :class:`ServingDaemon` — a background thread drives engine rounds
    (admission → t2i denoise segment → decode chunk) continuously; callers
    submit from any thread and block on per-request tickets. The engine
    itself is single-threaded — ONLY the daemon thread touches it; submits
    land in a host-side inbox drained at round boundaries, so HTTP handlers
    never wait on device work to enqueue.
  * :func:`make_server` — stdlib ThreadingHTTPServer exposing
      POST /v1/generate  {"prompt", "max_new_tokens"?, "image_png_b64"?,
                          "async"?} -> {"text"} (or 202 {"ticket"})
      POST /v1/images    {"prompt", "height"?, "width"?, gen knobs...,
                          "async"?} -> {"image_png_b64", ...} (or ticket)
      GET  /v1/result/<ticket>[?timeout=s] -> result | 202 pending
      POST /v1/cancel    {"ticket"} -> {"cancelled"}
      GET  /v1/health    -> {"ok", "queued", "stats"}
    Text and image requests share the one engine: report generation decodes
    in chunks between t2i denoise segments (unified serving). Cancellation
    reaches pending requests before any device work and in-flight requests
    at the next round boundary.

No third-party server dependency: stdlib ``http.server`` threads block on
daemon tickets, which is exactly the right shape for a single-accelerator
engine — concurrency comes from the slot pool, not from request threads.
"""

from __future__ import annotations

import base64
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional, Tuple

from PIL import Image

from unimedvl_tpu.inference.serving import ContinuousBatcher, Request


class ServingDaemon:
    """Continuous engine loop + thread-safe submit/await tickets."""

    def __init__(self, batcher: ContinuousBatcher, idle_wait_s: float = 0.02):
        self.batcher = batcher
        self.idle_wait_s = idle_wait_s
        self._cv = threading.Condition()
        self._inbox = []  # [(ticket, Request)] — drained by the loop thread
        self._results: Dict[int, Tuple[str, object]] = {}  # ticket -> (kind, value)
        self._tickets = iter(range(1 << 62)).__next__
        self._rid_to_ticket: Dict[int, int] = {}
        self._cancel_inbox = []  # tickets; resolved by the loop thread
        self._partials: Dict[int, str] = {}  # ticket -> text so far
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=self._loop, name="serving-daemon", daemon=True
        )
        batcher._reset_stats()

    # -- client side ----------------------------------------------------------
    def start(self) -> "ServingDaemon":
        self._thread.start()
        return self

    def stop(self, timeout: float = 30.0) -> None:
        self._stop.set()
        with self._cv:
            self._cv.notify_all()
        self._thread.join(timeout=timeout)

    def submit(self, request: Request) -> int:
        """Enqueue from any thread; returns a ticket immediately (never waits
        on device work)."""
        with self._cv:
            t = self._tickets()
            self._inbox.append((t, request))
            self._cv.notify_all()
            return t

    def result(self, ticket: int, timeout: Optional[float] = None):
        """Block until the ticket resolves. Returns (kind, value) with kind in
        {"ok", "error", "timeout"}; "ok" values are str (text) or PIL Image."""
        deadline = None if timeout is None else time.monotonic() + timeout
        with self._cv:
            while ticket not in self._results:
                remaining = None if deadline is None else deadline - time.monotonic()
                if remaining is not None and remaining <= 0:
                    return ("timeout", None)
                self._cv.wait(timeout=remaining if remaining is not None
                              else self.idle_wait_s)
                if self._stop.is_set() and ticket not in self._results:
                    return ("error", "daemon stopped")
            return self._results.pop(ticket)

    def cancel(self, ticket: int) -> bool:
        """Cancel from any thread. A ticket still in the daemon inbox is
        dropped immediately; one already in the engine is cancelled by the
        loop thread at the next round boundary (the awaiting result() then
        resolves to ("error", "cancelled ...")). Returns False only for a
        ticket whose result is already delivered."""
        with self._cv:
            for i, (t, _req) in enumerate(self._inbox):
                if t == ticket:
                    del self._inbox[i]
                    self._results[ticket] = ("error", "cancelled before start")
                    self._cv.notify_all()
                    return True
            if ticket in self._results:
                return False
            if ticket not in self._rid_to_ticket.values():
                return False  # already delivered (result was collected)
            self._cancel_inbox.append(ticket)
            self._cv.notify_all()
            return True

    def queued(self) -> int:
        with self._cv:
            return len(self._inbox) + len(self._rid_to_ticket)

    def partial(self, ticket: int) -> Optional[str]:
        """Text decoded so far for an in-flight ticket (None before the
        first token / for unknown tickets). Snapshotted by the loop thread
        at round boundaries — no device work on this path."""
        with self._cv:
            return self._partials.get(ticket)

    # -- loop thread ----------------------------------------------------------
    def _drain(self) -> None:
        with self._cv:
            inbox, self._inbox = self._inbox, []
            cancels, self._cancel_inbox = self._cancel_inbox, []
        for t, req in inbox:
            rid = self.batcher.submit(req)
            with self._cv:
                self._rid_to_ticket[rid] = t
        for t in cancels:
            for rid, tt in list(self._rid_to_ticket.items()):
                if tt == t:
                    self.batcher.cancel(rid)
        self._collect()  # synchronous rejections + cancellations

    def _collect(self) -> None:
        resolved = []
        done_rids = []
        for rid, t in list(self._rid_to_ticket.items()):
            if rid in self.batcher._done:
                resolved.append((t, ("ok", self.batcher._done.pop(rid))))
            elif rid in self.batcher.errors:
                resolved.append((t, ("error", self.batcher.errors[rid])))
            else:
                continue
            done_rids.append(rid)
        if resolved:
            with self._cv:
                for rid in done_rids:
                    del self._rid_to_ticket[rid]
                self._results.update(dict(resolved))
                self._cv.notify_all()

    def _publish_partials(self) -> None:
        """Snapshot in-flight decoded text (rid -> ticket keyed). Called at
        every round boundary — one engine round is one decode chunk, so
        partials advance chunk-by-chunk."""
        parts = self.batcher.partials()
        with self._cv:
            self._partials = {
                self._rid_to_ticket[rid]: txt
                for rid, txt in parts.items()
                if rid in self._rid_to_ticket
            }

    def _loop(self) -> None:
        eos = self.batcher.new_token_ids["eos_token_id"]
        while not self._stop.is_set():
            self._drain()
            if self.batcher.has_work():
                self.batcher._round(self.batcher.stats, eos)
                self._collect()
                self._publish_partials()
            else:
                with self._cv:
                    if not self._inbox and not self._stop.is_set():
                        self._cv.wait(timeout=self.idle_wait_s)


def _json_response(handler: BaseHTTPRequestHandler, code: int, obj) -> None:
    body = json.dumps(obj).encode()
    handler.send_response(code)
    handler.send_header("Content-Type", "application/json")
    handler.send_header("Content-Length", str(len(body)))
    handler.end_headers()
    handler.wfile.write(body)


def make_server(
    daemon: ServingDaemon,
    host: str = "127.0.0.1",
    port: int = 8000,
    request_timeout_s: float = 600.0,
) -> ThreadingHTTPServer:
    """Build (not start) the HTTP server; call .serve_forever() or drive it
    from a thread. Handlers block on daemon tickets, one thread per inflight
    HTTP request."""

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet: the engine logs itself
            pass

        def _read_json(self):
            n = int(self.headers.get("Content-Length", 0))
            raw = self.rfile.read(n) if n else b"{}"
            return json.loads(raw or b"{}")

        def _deliver(self, kind, value):
            if kind == "ok":
                if isinstance(value, Image.Image):
                    buf = io.BytesIO()
                    value.save(buf, format="PNG")
                    _json_response(self, 200, {
                        "image_png_b64": base64.b64encode(buf.getvalue()).decode(),
                        "height": value.size[1], "width": value.size[0],
                    })
                else:
                    _json_response(self, 200, {"text": value})
            elif kind == "timeout":
                _json_response(self, 504, {"error": "request timed out"})
            else:
                _json_response(self, 502, {"error": str(value)})

        def do_GET(self):
            if self.path == "/v1/health":
                _json_response(self, 200, {
                    "ok": True,
                    "queued": daemon.queued(),
                    "stats": daemon.batcher.stats,
                })
            elif self.path.startswith("/v1/result/"):
                # async retrieval: GET /v1/result/<ticket>[?timeout=s]
                rest = self.path[len("/v1/result/"):]
                ticket_s, _, query = rest.partition("?")
                try:
                    ticket = int(ticket_s)
                    wait = 0.5
                    if query.startswith("timeout="):
                        wait = float(query[len("timeout="):])
                except ValueError:
                    return _json_response(self, 400, {"error": "bad ticket"})
                kind, value = daemon.result(ticket, timeout=wait)
                if kind == "timeout":
                    part = daemon.partial(ticket)
                    _json_response(self, 202, {
                        "status": "pending", "ticket": ticket,
                        **({"partial": part} if part is not None else {}),
                    })
                else:
                    self._deliver(kind, value)
            else:
                _json_response(self, 404, {"error": f"no route {self.path}"})

        def do_POST(self):
            try:
                payload = self._read_json()
            except Exception as e:
                return _json_response(self, 400, {"error": f"bad json: {e}"})
            try:
                if self.path == "/v1/generate":
                    req = Request(
                        prompt=payload.get("prompt", ""),
                        max_new_tokens=int(payload.get("max_new_tokens", 128)),
                        prefix_id=(int(payload["prefix_id"])
                                   if "prefix_id" in payload else None),
                    )
                    if payload.get("image_png_b64"):
                        req.image = Image.open(io.BytesIO(
                            base64.b64decode(payload["image_png_b64"])
                        ))
                elif self.path == "/v1/prefixes":
                    # register a shared preamble ONCE (admin op — dispatches
                    # a prefill; do it at startup / low traffic). Later
                    # /v1/generate calls reference it via "prefix_id".
                    pid = daemon.batcher.register_prefix(
                        payload.get("text", ""))
                    return _json_response(self, 200, {"prefix_id": pid})
                elif self.path == "/v1/images":
                    knobs = {
                        k: payload[k] for k in (
                            "cfg_text_scale", "cfg_img_scale", "num_timesteps",
                            "timestep_shift", "cfg_renorm_min", "cfg_renorm_type",
                        ) if k in payload
                    }
                    req = Request(
                        prompt=payload.get("prompt", ""),
                        image_size=(int(payload.get("height", 512)),
                                    int(payload.get("width", 512))),
                        gen_params=knobs or None,
                    )
                elif self.path == "/v1/cancel":
                    ok = daemon.cancel(int(payload["ticket"]))
                    return _json_response(self, 200 if ok else 409, {
                        "cancelled": ok,
                        **({} if ok else {"error": "already finished"}),
                    })
                else:
                    return _json_response(
                        self, 404, {"error": f"no route {self.path}"}
                    )
            except Exception as e:
                return _json_response(self, 400, {"error": f"bad request: {e}"})

            ticket = daemon.submit(req)
            if payload.get("async"):
                # async submission: poll GET /v1/result/<ticket>, abort with
                # POST /v1/cancel {"ticket": N}
                return _json_response(self, 202, {"ticket": ticket})
            kind, value = daemon.result(ticket, timeout=request_timeout_s)
            self._deliver(kind, value)

    return ThreadingHTTPServer((host, port), Handler)
