"""tools/serve.py driven end-to-end over a real socket.

The serving surface is beyond the reference (whose inference surface is
the batch tools); the server must return tools/predict.py-shaped records
(1-indexed relations, rgb2id panseg PNG) through micro-batched device
scheduling.
"""

import base64
import http.client
import json
import os
import sys
import threading

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    import serve as serve_tool

    root = tmp_path_factory.mktemp("serve_psg")
    from tests.fixtures import make_fixture

    make_fixture(str(root), n_images=2, hw=(64, 96))

    args = serve_tool.parse_args(
        ["--config", os.path.join(REPO, "configs/psg/tiny_v4_ov.py"),
         "--host", "127.0.0.1", "--port", "0",
         "--img-scale", "64", "64", "--single-bucket",
         "--batch-size", "2", "--max-wait-ms", "200"]
    )
    httpd, service = serve_tool.make_server(args)
    service.warmup()
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        yield httpd.server_address[:2], str(root)
    finally:
        httpd.shutdown()
        service.stop()
        httpd.server_close()


def _post_image(addr, path):
    with open(path, "rb") as f:
        body = f.read()
    conn = http.client.HTTPConnection(*addr, timeout=600)
    conn.request("POST", "/infer", body=body)
    resp = conn.getresponse()
    out = (resp.status, json.loads(resp.read()))
    conn.close()
    return out


def test_healthz(server):
    addr, _ = server
    conn = http.client.HTTPConnection(*addr, timeout=60)
    conn.request("GET", "/healthz")
    resp = conn.getresponse()
    obj = json.loads(resp.read())
    conn.close()
    assert resp.status == 200
    assert obj["status"] == "ok"
    assert obj["batch_size"] == 2
    assert obj["buckets"] == [[64, 64]]


def test_infer_roundtrip(server):
    import cv2

    from openpsg_tpu.utils.panoptic import rgb2id

    addr, root = server
    status, rec = _post_image(addr, os.path.join(root, "images", "0.jpg"))
    assert status == 200
    # predict.py-shaped record
    assert set(rec) >= {
        "object_id_list", "relations", "relation_scores",
        "segments_info", "pan_seg_png",
    }
    for s, o, r in rec["relations"]:
        assert r >= 1  # 1-indexed predicate ids (reference infer.py:177-188)
    png = cv2.imdecode(
        np.frombuffer(base64.b64decode(rec["pan_seg_png"]), np.uint8),
        cv2.IMREAD_COLOR,
    )
    assert png.shape[:2] == (64, 96)  # original resolution, not the bucket
    ids = set(np.unique(rgb2id(png[..., ::-1])))
    for seg in rec["segments_info"]:
        assert seg["id"] in ids
        assert 1 <= seg["category_id"] <= 133


def test_concurrent_requests_batched(server):
    """Two concurrent posts of the SAME image must both succeed and
    return identical records — whether the micro-batcher grouped them
    into one device batch (infer_batch) or ran them as singles, the
    answer must not depend on scheduling.  (Random weights make
    per-image content assertions flaky, so determinism is the
    contract being tested.)"""
    addr, root = server
    path = os.path.join(root, "images", "0.jpg")
    results = [None, None]

    def hit(i):
        results[i] = _post_image(addr, path)

    ts = [threading.Thread(target=hit, args=(i,)) for i in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=600)
    recs = []
    for status, rec in results:
        assert status == 200
        assert "latency_ms" in rec
        rec.pop("latency_ms")
        recs.append(rec)
    assert recs[0] == recs[1]


def test_micro_batch_service(tmp_path):
    """--micro-batch: the batched device step runs the single-chip
    pipelined program (infer_microbatch) instead of vmap; two concurrent
    identical posts must both succeed with identical records."""
    import serve as serve_tool
    from tests.fixtures import make_fixture

    make_fixture(str(tmp_path), n_images=1, hw=(64, 96))
    args = serve_tool.parse_args(
        ["--config", os.path.join(REPO, "configs/psg/tiny_v4_ov.py"),
         "--host", "127.0.0.1", "--port", "0",
         "--img-scale", "64", "64", "--single-bucket",
         "--batch-size", "2", "--micro-batch", "--max-wait-ms", "200"]
    )
    httpd, service = serve_tool.make_server(args)
    assert service.micro_batch
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        addr = httpd.server_address[:2]
        path = os.path.join(str(tmp_path), "images", "0.jpg")
        results = [None, None]

        def hit(i):
            results[i] = _post_image(addr, path)

        ts = [threading.Thread(target=hit, args=(i,)) for i in range(2)]
        for th in ts:
            th.start()
        for th in ts:
            th.join(timeout=600)
        recs = []
        for status, rec in results:
            assert status == 200
            rec.pop("latency_ms")
            recs.append(rec)
        assert recs[0] == recs[1]
    finally:
        httpd.shutdown()
        service.stop()
        httpd.server_close()


def test_decode_trip_budget_flag(tmp_path):
    """--decode-trip-budget N: the tail-latency SLO knob reaches the model
    (runtime while_loop cap — serve requests decode at most N trips).
    Drive one request and verify the served record is well-formed and the
    model's realized decode trips honored the cap."""
    import serve as serve_tool
    from tests.fixtures import make_fixture

    make_fixture(str(tmp_path), n_images=1, hw=(64, 96))
    args = serve_tool.parse_args(
        ["--config", os.path.join(REPO, "configs/psg/tiny_v4_ov.py"),
         "--host", "127.0.0.1", "--port", "0",
         "--img-scale", "64", "64", "--single-bucket",
         "--decode-trip-budget", "2", "--no-warmup"]
    )
    httpd, service = serve_tool.make_server(args)
    assert service.model.decode_trip_budget == 2
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        addr = httpd.server_address[:2]
        path = os.path.join(str(tmp_path), "images", "0.jpg")
        status, rec = _post_image(addr, path)
        assert status == 200
        assert "relations" in rec and "pan_seg_png" in rec
        # the cap is a RUNTIME scalar: the same jitted program answers an
        # uncapped request after a knob flip without recompiling
        service.model.decode_trip_budget = None
        status2, rec2 = _post_image(addr, path)
        assert status2 == 200
    finally:
        httpd.shutdown()
        service.stop()
        httpd.server_close()
