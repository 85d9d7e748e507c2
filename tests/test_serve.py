"""HTTP serving layer: dynamic batching, JSON contract, error paths."""

import dataclasses
import io
import json
import threading
import urllib.request

import numpy as np
import pytest

from maskrcnn_tpu.core.config import tiny_test_config
from maskrcnn_tpu.evalkit.mask_rle import RLE, decode, from_coco_counts
from maskrcnn_tpu.pipeline.detector import MaskRCNNDetector
from maskrcnn_tpu.pipeline.serve import make_server

pytestmark = pytest.mark.slow  # compile-heavy (full-model jits / subprocess)


@pytest.fixture(scope="module")
def server():
    cfg = dataclasses.replace(tiny_test_config(),
                              detection_score_threshold=0.01)
    det = MaskRCNNDetector.from_random(cfg, seed=0)
    srv, worker = make_server(det, port=0, max_batch=4, window_ms=20.0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv, cfg
    srv.shutdown()
    worker.stop()
    srv.server_close()


def _url(srv, path):
    host, port = srv.server_address[:2]
    return f"http://{host}:{port}{path}"


def _png_bytes(img):
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    return buf.getvalue()


def _post_image(srv, img):
    req = urllib.request.Request(
        _url(srv, "/detect"), data=_png_bytes(img), method="POST")
    with urllib.request.urlopen(req, timeout=300) as r:
        return json.loads(r.read())


def test_healthz(server):
    srv, _ = server
    with urllib.request.urlopen(_url(srv, "/healthz"), timeout=30) as r:
        body = json.loads(r.read())
    assert body["status"] == "ok"
    assert body["max_batch"] == 4


def test_detect_json_contract(server):
    srv, cfg = server
    s = cfg.image_height
    img = np.random.default_rng(0).uniform(
        0, 255, (s, s, 3)).astype(np.uint8)
    body = _post_image(srv, img)
    assert body["latency_ms"] > 0
    assert len(body["detections"]) > 0
    d = body["detections"][0]
    assert d["class_id"] >= 1 and 0.0 < d["score"] <= 1.0
    y1, x1, y2, x2 = d["box_yxyx"]
    assert 0 <= y1 <= y2 <= s and 0 <= x1 <= x2 <= s
    # Compressed COCO RLE round-trips to a mask of the source-image size.
    rle = d["mask_rle"]
    assert isinstance(rle["counts"], str)
    mask = decode(from_coco_counts(rle["counts"],
                                   rle["size"][0], rle["size"][1]))
    assert mask.shape == (s, s)
    assert mask.sum() > 0


def test_concurrent_requests_share_batches(server):
    srv, cfg = server
    s = cfg.image_height
    rng = np.random.default_rng(1)
    imgs = [rng.uniform(0, 255, (s, s, 3)).astype(np.uint8)
            for _ in range(4)]
    results = [None] * 4

    def call(i):
        results[i] = _post_image(srv, imgs[i])

    before = srv.worker.batches
    threads = [threading.Thread(target=call, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(r is not None and "detections" in r for r in results)
    # 4 concurrent requests with a 20 ms window should need < 4 batches.
    assert srv.worker.batches - before <= 3


def test_bad_request_returns_500(server):
    srv, _ = server
    req = urllib.request.Request(
        _url(srv, "/detect"), data=b"not an image", method="POST")
    try:
        urllib.request.urlopen(req, timeout=30)
        raised = False
    except urllib.error.HTTPError as e:
        raised = True
        assert e.code == 500
        assert "error" in json.loads(e.read())
    assert raised
