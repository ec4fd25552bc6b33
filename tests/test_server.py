"""HTTP serving front-end: daemon loop + routes, driven end-to-end over the
tiny random model (unified text + t2i through one engine)."""

import base64
import io
import json
import threading
import time
import urllib.request

import jax
import numpy as np
import pytest
from PIL import Image

from unimedvl_tpu.data.imaging import ImageTransform
from unimedvl_tpu.inference import InterleaveInferencer
from unimedvl_tpu.inference.server import ServingDaemon, make_server
from unimedvl_tpu.inference.serving import ContinuousBatcher, Request
from unimedvl_tpu.models import bagel

from tests.test_pipeline import TINY, FakeTokenizer


@pytest.fixture(scope="module")
def served():
    params = bagel.init_params(jax.random.PRNGKey(0), TINY, llm2vae_zero=False)
    from unimedvl_tpu.data.tokenizer import add_special_tokens

    tok, ids, _ = add_special_tokens(FakeTokenizer())
    vit_t = ImageTransform(32, 8, 2, 1024)
    pipe = InterleaveInferencer(
        params, TINY, tok, ids,
        vae_transform=ImageTransform(32, 8, 8, 1024),
        vit_transform=vit_t, seed=3,
    )
    batcher = ContinuousBatcher(
        params, TINY, tok, ids, num_slots=2, capacity=512, chunk=4,
        vit_transform=vit_t, pipeline=pipe, gen_chunk=2,
    )
    daemon = ServingDaemon(batcher).start()
    server = make_server(daemon, host="127.0.0.1", port=0)  # ephemeral port
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    yield base, params, tok, ids
    server.shutdown()
    daemon.stop()


def _post(base, path, payload):
    req = urllib.request.Request(
        base + path, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=600) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


class TestHTTPServer:
    def test_generate_matches_engine(self, served):
        base, params, tok, ids = served
        vit_t = ImageTransform(32, 8, 2, 1024)
        ref = ContinuousBatcher(
            params, TINY, tok, ids, num_slots=2, capacity=128, chunk=4,
            vit_transform=vit_t,
        )
        rid = ref.submit(Request(prompt="alpha", max_new_tokens=6))
        want = ref.run()[rid]

        code, out = _post(base, "/v1/generate",
                          {"prompt": "alpha", "max_new_tokens": 6})
        assert code == 200, out
        assert out["text"] == want

    def test_concurrent_requests(self, served):
        base, *_ = served
        results = {}

        def go(p):
            results[p] = _post(base, "/v1/generate",
                               {"prompt": p, "max_new_tokens": 5})

        threads = [threading.Thread(target=go, args=(p,))
                   for p in ("one", "two two", "three")]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert set(results) == {"one", "two two", "three"}
        for code, out in results.values():
            assert code == 200 and isinstance(out["text"], str)

    def test_images_route(self, served):
        base, *_ = served
        code, out = _post(base, "/v1/images", {
            "prompt": "a chest x-ray", "height": 32, "width": 32,
            "num_timesteps": 5,
        })
        assert code == 200, out
        img = Image.open(io.BytesIO(base64.b64decode(out["image_png_b64"])))
        assert img.size == (32, 32)
        assert out["height"] == 32 and out["width"] == 32

    def test_generate_with_image_input(self, served):
        base, *_ = served
        rng = np.random.default_rng(0)
        pil = Image.fromarray(rng.integers(0, 255, (24, 28, 3), dtype=np.uint8))
        buf = io.BytesIO()
        pil.save(buf, format="PNG")
        code, out = _post(base, "/v1/generate", {
            "prompt": "what?", "max_new_tokens": 5,
            "image_png_b64": base64.b64encode(buf.getvalue()).decode(),
        })
        assert code == 200, out
        assert isinstance(out["text"], str)

    def test_async_submit_poll_cancel(self, served):
        """Async flow: submit -> 202 ticket; poll -> pending; cancel -> the
        awaiting result resolves as a cancellation error."""
        base, *_ = served
        code, out = _post(base, "/v1/generate", {
            "prompt": "long " * 4, "max_new_tokens": 400, "async": True,
        })
        assert code == 202 and "ticket" in out, (code, out)
        ticket = out["ticket"]
        code, out = _post(base, "/v1/cancel", {"ticket": ticket})
        # rarely the tiny model finishes first; both outcomes are valid HTTP
        if code == 200:
            assert out["cancelled"] is True
            try:
                with urllib.request.urlopen(
                    base + f"/v1/result/{ticket}?timeout=120", timeout=180
                ) as r:
                    r.read()  # finished before the cancel landed — acceptable
            except urllib.error.HTTPError as e:
                assert e.code == 502
                assert b"cancel" in e.read()
        else:
            assert code == 409

    def test_async_result_delivers(self, served):
        base, *_ = served
        code, out = _post(base, "/v1/generate",
                          {"prompt": "beta", "max_new_tokens": 5, "async": True})
        assert code == 202
        ticket = out["ticket"]
        deadline = 120
        import time as _t
        t0 = _t.time()
        while _t.time() - t0 < deadline:
            try:
                with urllib.request.urlopen(
                    base + f"/v1/result/{ticket}?timeout=5", timeout=60
                ) as r:
                    got = json.loads(r.read())
                    if r.status == 200:
                        assert isinstance(got["text"], str)
                        # cancelling a delivered ticket must refuse
                        code, out = _post(base, "/v1/cancel",
                                          {"ticket": ticket})
                        assert code == 409, (code, out)
                        return
            except urllib.error.HTTPError as e:
                raise AssertionError((e.code, e.read()))
        raise AssertionError("result never delivered")

    def test_health_and_bad_routes(self, served):
        base, *_ = served
        with urllib.request.urlopen(base + "/v1/health", timeout=60) as r:
            health = json.loads(r.read())
        assert health["ok"] is True
        code, out = _post(base, "/v1/nope", {})
        assert code == 404
        # over-capacity request surfaces as an engine error, not a hang
        code, out = _post(base, "/v1/generate",
                          {"prompt": "x", "max_new_tokens": 100000})
        assert code == 502 and "capacity" in out["error"]


class TestPrefixRoute:
    def test_register_and_use_prefix(self, served):
        base, params, tok, ids = served
        pre = "system preamble: "
        code, out = _post(base, "/v1/prefixes", {"text": pre})
        assert code == 200, out
        pid = out["prefix_id"]

        ref = ContinuousBatcher(
            params, TINY, tok, ids, num_slots=2, capacity=128, chunk=4,
            vit_transform=ImageTransform(32, 8, 2, 1024),
        )
        rid = ref.submit(Request(prompt=pre + "alpha", max_new_tokens=6))
        want = ref.run()[rid]

        code, out = _post(base, "/v1/generate", {
            "prompt": "alpha", "max_new_tokens": 6, "prefix_id": pid})
        assert code == 200, out
        assert out["text"] == want


class TestPartialResults:
    def test_partials_snapshot_mid_decode(self, served):
        """Engine-level determinism: drive the daemon loop BY HAND (no
        thread, no timing) and check the partials snapshot after each round
        is a growing prefix chain ending in the final text."""
        base, params, tok, ids = served
        vit_t = ImageTransform(32, 8, 2, 1024)
        batcher = ContinuousBatcher(
            params, TINY, tok, ids, num_slots=2, capacity=512, chunk=4,
            vit_transform=vit_t,
        )
        daemon = ServingDaemon(batcher)  # NOT started: manual rounds
        ticket = daemon.submit(Request(
            prompt="stream me a long answer please", max_new_tokens=48))
        eos = batcher.new_token_ids["eos_token_id"]
        snapshots = []
        for _ in range(64):
            daemon._drain()
            if not batcher.has_work():
                break
            batcher._round(batcher.stats, eos)
            daemon._collect()
            daemon._publish_partials()
            p = daemon.partial(ticket)
            if p:
                snapshots.append(p)
        kind, final = daemon.result(ticket, timeout=0)
        assert kind == "ok", (kind, final)
        # mid-flight snapshots were observed, grow monotonically, and each is
        # a prefix of the final text (one-token holdback discipline)
        assert snapshots, "no partials surfaced over a 12-round decode"
        for a, b in zip(snapshots, snapshots[1:]):
            assert b.startswith(a), (a, b)
        assert final.startswith(snapshots[-1]), (snapshots[-1], final)

    def test_pending_result_carries_partial_text(self, served):
        """HTTP surface: an async ticket polled mid-decode returns 202 with
        the text decoded so far. Deterministic: a dedicated daemon whose
        engine holds every round boundary open, so polls are GUARANTEED to
        land between rounds (the shared `served` engine is compile-cached by
        the time this test runs — all 12 rounds of a 48-token decode finish
        inside one 0.05 s poll window, which is why a poll-the-shared-server
        version of this test was flaky)."""
        base, params, tok, ids = served
        vit_t = ImageTransform(32, 8, 2, 1024)

        class SlowRoundBatcher(ContinuousBatcher):
            def _round(self, st, eos):
                super()._round(st, eos)
                time.sleep(0.25)  # hold the round boundary open for pollers

        batcher = SlowRoundBatcher(
            params, TINY, tok, ids, num_slots=2, capacity=512, chunk=4,
            vit_transform=vit_t,
        )
        daemon = ServingDaemon(batcher).start()
        server = make_server(daemon, host="127.0.0.1", port=0)
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()
        slow_base = f"http://127.0.0.1:{server.server_address[1]}"
        try:
            code, out = _post(slow_base, "/v1/generate", {
                "prompt": "stream me a long answer please",
                "max_new_tokens": 48, "async": True})
            assert code == 202
            ticket = out["ticket"]
            partial_seen = ""
            final = None
            for _ in range(600):
                with urllib.request.urlopen(
                    slow_base + f"/v1/result/{ticket}?timeout=0.05", timeout=60
                ) as r:
                    code, out = r.status, json.loads(r.read())
                if code == 200:
                    final = out["text"]
                    break
                if code == 202 and out.get("partial"):
                    partial_seen = out["partial"]
            assert final is not None
            # a mid-flight partial was observed and prefixes the final text
            assert partial_seen and final.startswith(partial_seen), (
                partial_seen, final)
        finally:
            server.shutdown()
            daemon.stop()
