"""HTTP serving front-end: health, recommendations, error paths."""

import copy
import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import jax
import numpy as np
import pytest

from diffmm_tpu.eval.serve_http import make_handler
from diffmm_tpu.eval.serving import build_index
from diffmm_tpu.train.coach import Coach

pytestmark = pytest.mark.slow  # every test here (or its shared fixture) takes >10s on a stock CPU box


@pytest.fixture(scope="module")
def server(tiny_config_module, tiny_data_module):
    coach = Coach(tiny_config_module, tiny_data_module)
    coach.train_epoch(0)
    index = build_index(coach)
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(index))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", tiny_data_module
    srv.shutdown()


@pytest.fixture(scope="module")
def tiny_config_module(request):
    import copy as _copy

    from diffmm_tpu.config import Config

    cfg = Config()
    cfg.base.seed = 7
    cfg.base.latdim = 16
    cfg.base.denoise_dim = "[32]"
    cfg.train.batch = 16
    cfg.train.test_batch = 8
    return cfg


@pytest.fixture(scope="module")
def tiny_data_module(tiny_config_module):
    from diffmm_tpu.data.synthetic import make_synthetic_host_data

    return make_synthetic_host_data(
        copy.deepcopy(tiny_config_module), user_num=50, item_num=40, seed=3
    )


def _get(url):
    try:
        with urllib.request.urlopen(url) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_health(server):
    base, data = server
    code, body = _get(base + "/health")
    assert code == 200
    assert body == {"status": "ok", "users": data.user_num, "items": data.item_num}


def test_recommend(server):
    base, data = server
    code, body = _get(base + "/recommend?user=3&k=5")
    assert code == 200
    assert body["user"] == 3
    assert len(body["items"]) == 5 and len(body["scores"]) == 5
    seen = set(np.nonzero(data.train_dense[3])[0])
    assert not (set(body["items"]) & seen)
    # unmasked may include seen items
    code, body = _get(base + "/recommend?user=3&k=5&mask_seen=0")
    assert code == 200


def test_error_paths(server):
    base, _ = server
    assert _get(base + "/recommend")[0] == 400          # missing user
    assert _get(base + "/recommend?user=9999&k=5")[0] == 400  # out of range
    assert _get(base + "/recommend?user=1&k=0")[0] == 400     # bad k
    assert _get(base + "/nope")[0] == 404


def test_concurrent_cold_requests(server):
    """Concurrent requests with DISTINCT k values (each a cold program
    variant) must all succeed: first-hit compiles are serialized behind the
    compile lock (serving.py), warm dispatches stay lock-free."""
    from concurrent.futures import ThreadPoolExecutor

    base, data = server
    # distinct power-of-two buckets -> distinct compiled variants, plus
    # repeats of a warm one; mix mask modes
    urls = [
        base + f"/recommend?user={u}&k={k}&mask_seen={m}"
        for u, k, m in [
            (1, 3, 1), (2, 5, 1), (3, 9, 1), (4, 17, 1),
            (5, 3, 0), (6, 5, 0), (7, 3, 1), (8, 3, 1),
            (9, 5, 1), (10, 9, 0), (11, 17, 0), (12, 3, 0),
        ]
    ]
    with ThreadPoolExecutor(max_workers=8) as pool:
        results = list(pool.map(_get, urls))
    for (code, body), url in zip(results, urls):
        assert code == 200, (url, body)
        k = int(url.split("k=")[1].split("&")[0])
        assert len(body["items"]) == k
        assert len(set(body["items"])) == k  # distinct recommendations


def test_warmup_precompiles(tiny_config_module, tiny_data_module):
    """warmup() registers both mask-mode variants per k bucket, so live
    requests with covered k values dispatch lock-free."""
    from diffmm_tpu.eval import serving

    coach = Coach(copy.deepcopy(tiny_config_module), tiny_data_module)
    coach.train_epoch(0)
    index = build_index(coach)
    index_shapes = serving._index_fingerprint(index)
    serving.warmup(index, ks=[7, 20])
    added = {
        v for v in serving._compiled_variants if v[0] == index_shapes
    }
    # k=7 -> bucket 8, k=20 -> bucket 32 (capped at item_num=40): both mask
    # modes for each bucket (variant = (index shapes, users shape, users
    # dtype, k_pad, mask_seen, approx, mesh))
    buckets = {(v[3], v[4]) for v in added}
    assert {(8, True), (8, False), (32, True), (32, False)} <= buckets
