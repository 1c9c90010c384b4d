"""Serving layer: dynamic micro-batching, variant grouping, HTTP front end.

Model-agnostic by construction — a fake runner stands in for the compiled
sampler (the reference's test pattern of driving the host path with fakes,
SURVEY.md section 4)."""

import http.client
import json
import threading
import time

import numpy as np
import pytest

from lanpaint_tpu.serve import (
    InpaintServer, Request, Variant, _decode_array, _encode_array,
    make_http_server, pipeline_runner,
)


def make_echo_runner(log, delay=0.0):
    def run(batch):
        if delay:
            time.sleep(delay)
        log.append([r.prompt for r in batch])
        return [f"out:{r.prompt}" for r in batch]

    return run


def test_batching_coalesces_same_variant():
    log = []
    srv = InpaintServer(make_echo_runner(log, delay=0.01),
                        batch_size=4, max_delay_s=0.2)
    futs = [srv.submit(Request(prompt=f"p{i}")) for i in range(4)]
    assert [f.result(5) for f in futs] == [f"out:p{i}" for i in range(4)]
    srv.close()
    # all four requests arrived within the window -> one batch
    assert any(len(b) == 4 for b in log)
    assert srv.stats.snapshot()["requests"] == 4


def test_variant_isolation():
    log = []
    srv = InpaintServer(make_echo_runner(log), batch_size=4, max_delay_s=0.1)
    va, vb = Variant(steps=20), Variant(steps=30)
    futs = [srv.submit(Request(prompt=f"a{i}", variant=va)) for i in range(2)]
    futs += [srv.submit(Request(prompt=f"b{i}", variant=vb)) for i in range(2)]
    assert sorted(f.result(5) for f in futs) == [
        "out:a0", "out:a1", "out:b0", "out:b1"]
    srv.close()
    # no batch mixes variants
    for b in log:
        kinds = {p[0] for p in b}
        assert len(kinds) == 1


def test_runner_error_fails_lanes_and_keeps_serving():
    calls = {"n": 0}

    def run(batch):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("boom")
        return ["ok"] * len(batch)

    srv = InpaintServer(run, batch_size=2, max_delay_s=0.05)
    bad = srv.submit(Request(prompt="x"))
    with pytest.raises(RuntimeError, match="boom"):
        bad.result(5)
    good = srv.submit(Request(prompt="y"))
    assert good.result(5) == "ok"
    srv.close()
    assert srv.stats.snapshot()["errors"] == 1


def test_stats_latency_percentiles():
    srv = InpaintServer(make_echo_runner([]), batch_size=1, max_delay_s=0.01)
    for i in range(5):
        srv.submit(Request(prompt=str(i))).result(5)
    snap = srv.stats.snapshot()
    srv.close()
    assert snap["batches"] == 5
    assert snap["latency_p50_s"] is not None
    assert snap["latency_p99_s"] >= snap["latency_p50_s"]


def test_http_roundtrip():
    def run(batch):
        return [np.asarray(r.image, np.float32) * 2.0 for r in batch]

    srv = InpaintServer(run, batch_size=2, max_delay_s=0.01)
    httpd = make_http_server(srv, port=0)  # ephemeral port
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        img = np.arange(12, dtype=np.float32).reshape(3, 2, 2)
        payload = {
            "prompt": "hi",
            "image": _encode_array(img),
            "mask": _encode_array(np.ones((2, 2), np.float32)),
            "variant": {"steps": 4},
        }
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
        conn.request("POST", "/inpaint", json.dumps(payload),
                     {"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.status == 200
        out = _decode_array(json.loads(resp.read())["image"])
        np.testing.assert_array_equal(out, img * 2.0)

        conn.request("GET", "/healthz")
        assert json.loads(conn.getresponse().read())["ok"] is True
        conn.request("GET", "/stats")
        assert json.loads(conn.getresponse().read())["requests"] == 1
    finally:
        httpd.shutdown()
        srv.close()


def test_http_hwc_layout_mirrored():
    """An HWC (browser-canvas) request gets an HWC response; the runner
    still sees the canonical CHW layout via _as_chw."""
    from lanpaint_tpu.serve import _as_chw

    seen = []

    def run(batch):
        for r in batch:
            seen.append(np.asarray(r.image).shape)
        return [_as_chw(np.asarray(r.image, np.float32)) * 2.0
                for r in batch]

    srv = InpaintServer(run, batch_size=1, max_delay_s=0.01)
    httpd = make_http_server(srv, port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        img_hwc = np.arange(24, dtype=np.float32).reshape(4, 2, 3)
        payload = {"image": _encode_array(img_hwc),
                   "mask": _encode_array(np.ones((4, 2), np.float32)),
                   "variant": {"steps": 2}}
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
        conn.request("POST", "/inpaint", json.dumps(payload),
                     {"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.status == 200
        out = _decode_array(json.loads(resp.read())["image"])
        assert out.shape == (4, 2, 3)  # mirrored back to HWC
        np.testing.assert_array_equal(out, img_hwc * 2.0)
    finally:
        httpd.shutdown()
        srv.close()


def test_validator_accepts_hwc():
    from lanpaint_tpu.serve import pipeline_validator

    v = Variant(height=8, width=6)
    req = Request(image=np.zeros((8, 6, 3), np.float32),
                  mask=np.zeros((8, 6), np.float32), variant=v)
    pipeline_validator(batch_size=1)(req)  # no raise
    bad = Request(image=np.zeros((6, 8, 3), np.float32),
                  mask=np.zeros((8, 6), np.float32), variant=v)
    with pytest.raises(ValueError):
        pipeline_validator(batch_size=1)(bad)


def test_web_ui_served_at_root():
    """GET / serves the browser front end; every Variant field is a form
    control (the web layer is the L5 analog of the reference's node UI)."""
    import dataclasses

    from lanpaint_tpu.serve import Variant

    srv = InpaintServer(lambda batch: [r.image for r in batch],
                        batch_size=1, max_delay_s=0.01)
    httpd = make_http_server(srv, port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
        conn.request("GET", "/")
        resp = conn.getresponse()
        assert resp.status == 200
        assert resp.getheader("Content-Type").startswith("text/html")
        html = resp.read().decode()
        assert "LanPaint TPU" in html
        # all Variant fields are editable except height/width (derived
        # from the canvas, but still present as inputs)
        for f in dataclasses.fields(Variant):
            assert f'id="{f.name}"' in html, f.name
        # the page talks the same wire format as the JSON API
        assert "/inpaint" in html and "/stats" in html
        assert "data_b64" in html
    finally:
        httpd.shutdown()
        srv.close()


def test_web_ui_lists_real_samplers_and_schedulers():
    """The UI's dropdowns stay in sync with the actual registries."""
    from lanpaint_tpu import webui
    from lanpaint_tpu.samplers import _SOLVERS
    from lanpaint_tpu.sigmas import SCHEDULERS

    for s in webui.SAMPLERS:
        assert s in _SOLVERS or s == "dpm_fast", s
        assert f'value="{s}"' in webui.INDEX_HTML
    for s in webui.SCHEDULERS:
        assert s in SCHEDULERS, s
        assert f'value="{s}"' in webui.INDEX_HTML


def test_pipeline_runner_stacks_and_pads():
    """pipeline_runner contract with a fake pipeline: per-lane prompts
    stacked into batched conds, lane-0 padding sliced off."""
    seen = {}

    class FakePipe:
        model = "M"
        vae_module = "V"
        vae_params = "P"

        def encode(self, prompt):
            return {"context": np.full((1, 3, 4), float(len(prompt)),
                                       np.float32)}

    import lanpaint_tpu.serve as serve_mod

    def fake_inpaint_image(model, vae_module, vae_params, *, image, mask,
                           positive, negative, **kw):
        seen["image"] = image
        seen["positive"] = positive
        return image * 0 + positive["context"][:, 0, 0][:, None, None, None]

    import lanpaint_tpu.api as api_mod

    orig = api_mod.inpaint_image
    api_mod.inpaint_image = fake_inpaint_image
    try:
        run = serve_mod.pipeline_runner(FakePipe(), batch_size=4)
        reqs = [Request(prompt="ab", image=np.zeros((3, 2, 2), np.float32),
                        mask=np.ones((2, 2), np.float32)),
                Request(prompt="abcd", image=np.ones((3, 2, 2), np.float32),
                        mask=np.ones((2, 2), np.float32))]
        outs = run(reqs)
    finally:
        api_mod.inpaint_image = orig

    assert len(outs) == 2                       # padding sliced off
    assert seen["image"].shape == (4, 3, 2, 2)  # padded to compiled batch
    assert seen["positive"]["context"].shape == (4, 3, 4)
    # per-lane conds: lane 0 encodes "ab" (len 2), lane 1 "abcd" (len 4)
    assert seen["positive"]["context"][0, 0, 0] == 2.0
    assert seen["positive"]["context"][1, 0, 0] == 4.0
    np.testing.assert_array_equal(outs[0], np.full((3, 2, 2), 2.0))
    np.testing.assert_array_equal(outs[1], np.full((3, 2, 2), 4.0))


def test_validator_rejects_only_bad_request():
    from lanpaint_tpu.serve import pipeline_validator

    srv = InpaintServer(lambda b: ["ok"] * len(b), batch_size=2,
                        max_delay_s=0.05, validator=pipeline_validator())
    v = Variant(height=16, width=16)
    good = Request(image=np.zeros((3, 16, 16), np.float32),
                   mask=np.zeros((16, 16), np.float32), variant=v)
    bad = Request(image=np.zeros((3, 8, 8), np.float32),
                  mask=np.zeros((16, 16), np.float32), variant=v)
    fb = srv.submit(bad)
    fg = srv.submit(good)
    with pytest.raises(ValueError, match="image shape"):
        fb.result(5)
    assert fg.result(5) == "ok"          # good lane unaffected
    srv.close()


def test_close_fails_queued_futures():
    import threading as _t

    gate = _t.Event()

    def slow_runner(batch):
        gate.wait(10)
        return ["done"] * len(batch)

    srv = InpaintServer(slow_runner, batch_size=1, max_delay_s=0.01)
    first = srv.submit(Request(prompt="a"))      # occupies the worker
    time.sleep(0.1)
    queued = srv.submit(Request(prompt="b"))     # waits in queue
    gate.set()
    srv.close(timeout=5)
    # graceful close: work accepted before close() still completes ...
    assert first.result(5) == "done"
    assert queued.result(5) == "done"
    # ... but submissions after close fail immediately instead of hanging
    late = srv.submit(Request(prompt="c"))
    with pytest.raises(RuntimeError, match="closed"):
        late.result(5)


def test_pipeline_runner_per_lane_seeds():
    """Distinct request seeds must produce distinct per-lane initial noise
    (review finding: batch[0].seed silently applied to every lane)."""
    seen = {}

    class FakePipe:
        model = type("M", (), {"latent_channels": 4})()
        vae_module = "V"
        vae_params = "P"

        def encode(self, prompt):
            return {"context": np.zeros((1, 2, 3), np.float32)}

    import lanpaint_tpu.api as api_mod
    import lanpaint_tpu.serve as serve_mod

    def fake_inpaint_image(model, vae_module, vae_params, *, image, mask,
                           positive, negative, noise=None, **kw):
        seen["noise"] = np.asarray(noise)
        return image

    orig = api_mod.inpaint_image
    api_mod.inpaint_image = fake_inpaint_image
    try:
        run = serve_mod.pipeline_runner(FakePipe(), batch_size=2)
        v = Variant(height=16, width=16)
        reqs = [Request(prompt="a", seed=1, variant=v,
                        image=np.zeros((3, 16, 16), np.float32),
                        mask=np.ones((16, 16), np.float32)),
                Request(prompt="b", seed=2, variant=v,
                        image=np.zeros((3, 16, 16), np.float32),
                        mask=np.ones((16, 16), np.float32))]
        run(reqs)
    finally:
        api_mod.inpaint_image = orig

    noise = seen["noise"]
    assert noise.shape == (2, 4, 2, 2)
    assert not np.allclose(noise[0], noise[1])   # per-lane seeds differ


def test_pipeline_runner_progress_and_preview():
    """Requests carrying a request_id get per-step progress + latent
    previews on the ProgressBoard; lanes without an id stay silent."""
    import lanpaint_tpu.api as api_mod
    import lanpaint_tpu.serve as serve_mod

    class FakePipe:
        model = type("M", (), {"latent_channels": 4})()
        vae_module = "V"
        vae_params = "P"

        def encode(self, prompt):
            return {"context": np.zeros((1, 2, 2), np.float32)}

    def fake_inpaint_image(model, vae_module, vae_params, *, image, mask,
                           positive, negative, callback=None, trace=None,
                           **kw):
        assert callback is not None
        # the runner passes a trace dict (think-loop accounting channel)
        assert trace is not None
        trace["steps_done"] = np.asarray([5, 5, 0])
        lat = np.arange(image.shape[0] * 4 * 2 * 2, dtype=np.float32
                        ).reshape(image.shape[0], 4, 2, 2)
        for i in range(3):
            callback(i, lat, lat)
        return image

    board = serve_mod.ProgressBoard()
    orig = api_mod.inpaint_image
    api_mod.inpaint_image = fake_inpaint_image
    try:
        run = serve_mod.pipeline_runner(FakePipe(), batch_size=2,
                                        progress=board)
        v = Variant(height=16, width=16, steps=3)
        reqs = [Request(prompt="a", image=np.zeros((3, 16, 16), np.float32),
                        mask=np.ones((16, 16), np.float32), variant=v,
                        extras={"request_id": "r1"}),
                Request(prompt="b", image=np.zeros((3, 16, 16), np.float32),
                        mask=np.ones((16, 16), np.float32), variant=v)]
        run(reqs)
    finally:
        api_mod.inpaint_image = orig

    e = board.get("r1")
    assert e is not None and e["done"]
    assert e["step"] == 3 and e["total"] == 3
    assert e["preview"] is not None and e["preview"]["shape"] == [2, 2, 3]
    # a served request can report the think iterations actually spent
    # (VERDICT r2 item 2 done-criterion)
    assert e["think_steps_done"] == [5, 5, 0]
    assert e["think_steps_total"] == 10
    assert board.get("") is None  # the id-less lane published nothing


def test_http_progress_endpoint():
    from lanpaint_tpu.serve import ProgressBoard

    board = ProgressBoard()
    done = threading.Event()

    def run(batch):
        for r in batch:
            rid = r.extras.get("request_id")
            if rid:
                board.update(rid, step=1, total=2)
        done.wait(5)
        return [np.zeros((3, 2, 2), np.float32) for _ in batch]

    srv = InpaintServer(run, batch_size=1, max_delay_s=0.01)
    httpd = make_http_server(srv, port=0, progress=board)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        payload = {"image": _encode_array(np.zeros((3, 2, 2), np.float32)),
                   "mask": _encode_array(np.ones((2, 2), np.float32)),
                   "variant": {"steps": 2}, "request_id": "xyz"}
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
        conn.request("POST", "/inpaint", json.dumps(payload),
                     {"Content-Type": "application/json"})
        # poll progress WHILE the request is blocked in the runner
        for _ in range(100):
            c2 = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
            c2.request("GET", "/progress?id=xyz")
            r2 = c2.getresponse()
            if r2.status == 200:
                prog = json.loads(r2.read())
                break
            r2.read()
            time.sleep(0.05)
        else:
            raise AssertionError("progress never appeared")
        assert prog["step"] == 1 and prog["total"] == 2
        done.set()
        assert conn.getresponse().status == 200
        c3 = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
        c3.request("GET", "/progress?id=nope")
        assert c3.getresponse().status == 404
    finally:
        done.set()
        httpd.shutdown()
        srv.close()
