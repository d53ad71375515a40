"""HTTP smoke tests for cli/serve.py (VERDICT r04 #8: direct coverage).

Drives the real stdlib HTTP server end-to-end on an ephemeral port:
healthz, metrics, one /predict on a synthetic PNG (including the
dynamic micro-batching path), and the 400/404 error contract. Tiny
synthetic body + 64px input keep this in the fast tier.
"""

import base64
import io
import json
import threading
import urllib.error
import urllib.request
from types import SimpleNamespace

import numpy as np
import pytest


def _png_b64(size=96, seed=0):
    from PIL import Image
    rng = np.random.RandomState(seed)
    img = Image.fromarray(rng.randint(0, 255, (size, size, 3), np.uint8))
    buf = io.BytesIO()
    img.save(buf, format='PNG')
    return base64.b64encode(buf.getvalue()).decode()


def _args(**over):
    base = dict(checkpoint=None, synthetic=True, dtype='float32',
                img_res=64, synthetic_num_verts=170, max_batch=2,
                batch_wait_ms=1.0, bn_fold=False, backbone='resnet50',
                host='127.0.0.1', port=0)
    base.update(over)
    return SimpleNamespace(**base)


@pytest.fixture(scope='module')
def server():
    from tuch_tpu.cli.serve import build_server
    httpd = build_server(_args())
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    url = f'http://127.0.0.1:{httpd.server_address[1]}'
    yield url
    httpd.shutdown()
    httpd.predictor.close()
    t.join(timeout=5)


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.status, json.loads(r.read())


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={'Content-Type': 'application/json'})
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_healthz(server):
    code, body = _get(server + '/healthz')
    assert code == 200
    assert body['status'] == 'ok'
    assert body['warm'] is True


def test_predict_roundtrip(server):
    code, body = _post(server + '/predict',
                       {'image_b64': _png_b64(), 'return_vertices': True})
    assert code == 200
    assert len(body['pose']) == 72
    assert len(body['betas']) == 10
    assert len(body['camera']) == 3
    assert len(body['cam_t']) == 3
    # synthetic topology rounds the requested vert count to its grid
    assert len(body['vertices']) > 100
    assert len(body['vertices'][0]) == 3
    assert all(np.isfinite(v).all() for v in
               (body['pose'], body['betas'], body['cam_t']))
    assert body['latency_ms'] > 0


def test_predict_concurrent_microbatch(server):
    # two concurrent requests through the max_batch=2 batcher; results
    # must match the sequential path per-sample
    results = {}

    def hit(i):
        results[i] = _post(server + '/predict',
                           {'image_b64': _png_b64(seed=i)})

    ts = [threading.Thread(target=hit, args=(i,)) for i in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=120)
    for i in range(2):
        code, body = results[i]
        assert code == 200, body
        assert len(body['pose']) == 72
    # sequential reference for sample 0
    _, seq = _post(server + '/predict', {'image_b64': _png_b64(seed=0)})
    np.testing.assert_allclose(results[0][1]['pose'], seq['pose'],
                               atol=1e-4)
    code, m = _get(server + '/metrics')
    assert code == 200
    assert m['requests_ok'] >= 3
    assert m['latency_samples'] >= 3


def test_predict_error_contract(server):
    code, body = _post(server + '/predict', {'image_b64': 'not base64!'})
    assert code == 400 and 'error' in body
    code, body = _post(server + '/predict',
                       {'image_b64': _png_b64(), 'center': [1, 2]})
    assert code == 400 and 'center' in body['error']
    code, body = _post(server + '/nope', {})
    assert code == 404
    code, body = _get(server + '/metrics')
    assert body['requests_client_error'] >= 2


def test_predictor_vit_backbone_with_checkpoint(tmp_path):
    # the exact path ADVICE r04 flagged: serve --backbone vit_* with a
    # matching checkpoint (BN-free tree through load_variables)
    import jax
    from flax import traverse_util
    from tuch_tpu.cli.serve import TuchPredictor
    from tuch_tpu.models import hmr as H
    from tuch_tpu import assets

    _, extras = assets.synthetic_smpl(num_verts=170)
    model = H.create_hmr(extras.mean_pose6d, extras.mean_shape,
                         extras.mean_cam, backbone='vit_t8')
    variables = H.init_hmr(model, jax.random.PRNGKey(0), img_res=64)
    flat = traverse_util.flatten_dict({'params': variables['params']})
    path = str(tmp_path / 'vit.npz')
    np.savez(path, **{'/'.join(k): np.asarray(v)
                      for k, v in flat.items()})

    p = TuchPredictor(checkpoint=path, synthetic=True, img_res=64,
                      num_verts=170, backbone='vit_t8')
    p.warmup()
    out = p.predict({'image_b64': _png_b64()})
    assert len(out['pose']) == 72 and np.isfinite(out['pose']).all()
    p.close()
