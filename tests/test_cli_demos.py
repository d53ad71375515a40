"""Process-level smokes for the demo CLIs at toy scale.

The demo entry points (demo_tuch, demo_smplify_dc) were previously only
driven manually; these tests pin their artifact sets and the
reference-compatible output locations (demo images land in the resolved
log dir like /root/reference/demo_smplify_dc.py:176 unless --out_dir
overrides).
"""

import glob
import os

import pytest


@pytest.mark.slow
def test_demo_tuch_cli_synthetic(tmp_path):
    # demo_tuch keeps the reference's own flag surface (fixed 224 input,
    # full topology) -- no toy-scale escape hatches, so this runs the
    # real demo path end to end
    from tuch_tpu.cli.demo_tuch import main as demo_main
    out = str(tmp_path / 'demo')
    demo_main(['--synthetic', '--outdir', out])
    produced = {os.path.basename(p)
                for p in glob.glob(os.path.join(out, '*'))}
    # reference artifact set per image: obj front/+-60deg, camera pkl,
    # rendered png (demo_tuch.py:148-218)
    assert {'synthetic_input.obj', 'synthetic_input_r60.obj',
            'synthetic_input_r300.obj', 'synthetic_input_camera.pkl',
            'synthetic_input.png'} <= produced


@pytest.mark.slow
def test_demo_smplify_dc_cli_synthetic(tmp_path):
    from tuch_tpu.cli.demo_smplify_dc import main as demo_main
    demo_main(['--name', 'dcsmoke', '--log_dir', str(tmp_path),
               '--synthetic', '--synthetic_num_verts', '170',
               '--img_res', '64', '--num_images', '2',
               '--num_smplify_iters', '2'])
    # renders land in the RESOLVED log dir (log_dir/name), reference
    # demo_smplify_dc.py:176 semantics
    out = tmp_path / 'dcsmoke'
    for i in range(2):
        assert (out / f'{i:04d}_fit.png').exists()
        assert (out / f'{i:04d}_opti.png').exists()


@pytest.mark.slow
def test_demo_smplify_dc_out_dir_override(tmp_path):
    from tuch_tpu.cli.demo_smplify_dc import main as demo_main
    override = tmp_path / 'renders'
    demo_main(['--name', 'dcsmoke2', '--log_dir', str(tmp_path / 'logs'),
               '--synthetic', '--synthetic_num_verts', '170',
               '--img_res', '64', '--num_images', '1',
               '--num_smplify_iters', '1', '--out_dir', str(override)])
    assert (override / '0000_fit.png').exists()


def test_serve_cli_synthetic():
    """End-to-end HTTP serving smoke: warm server, healthz, predict
    (with bbox crop + vertices), and the 400 contract for a bad request."""
    import base64
    import io
    import json
    import threading
    from http.client import HTTPConnection
    from types import SimpleNamespace

    import numpy as np
    from PIL import Image

    from tuch_tpu.cli import serve

    args = SimpleNamespace(checkpoint=None, synthetic=True,
                           host='127.0.0.1', port=0, img_res=64,
                           dtype='float32', synthetic_num_verts=170)
    httpd = serve.build_server(args)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    try:
        port = httpd.server_address[1]
        conn = HTTPConnection('127.0.0.1', port, timeout=120)

        conn.request('GET', '/healthz')
        r = conn.getresponse()
        health = json.loads(r.read())
        assert r.status == 200 and health['status'] == 'ok'
        assert health['warm'] is True

        img = (np.random.RandomState(0).rand(80, 80, 3) * 255
               ).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format='PNG')
        req = {'image_b64': base64.b64encode(buf.getvalue()).decode(),
               'bbox': [10, 10, 60, 60], 'return_vertices': True}
        conn.request('POST', '/predict', body=json.dumps(req),
                     headers={'Content-Type': 'application/json'})
        r = conn.getresponse()
        out = json.loads(r.read())
        assert r.status == 200, out
        assert len(out['pose']) == 72 and len(out['betas']) == 10
        assert len(out['camera']) == 3 and len(out['cam_t']) == 3
        verts = np.asarray(out['vertices'])
        # synthetic topology rounds the requested vert count (170 -> 158)
        assert verts.ndim == 2 and verts.shape[1] == 3
        assert 100 < verts.shape[0] <= 170
        assert np.isfinite(np.asarray(out['pose'])).all()
        assert out['latency_ms'] > 0

        # client-error contract: every malformed payload is a 400 (never
        # a 500, which deployment alerting treats as a server fault)
        bad_payloads = [
            'not json',                                       # bad body
            json.dumps({}),                                   # missing key
            json.dumps({'image_b64': '!!!'}),                 # bad base64
            json.dumps({'image_b64': base64.b64encode(
                b'not an image').decode()}),                  # not an image
            json.dumps({'image_b64': req['image_b64'],
                        'center': [32, 32]}),                 # half override
            json.dumps({'image_b64': req['image_b64'],
                        'bbox': [1, 2, 3]}),                  # bad bbox
        ]
        for body in bad_payloads:
            conn.request('POST', '/predict', body=body,
                         headers={'Content-Type': 'application/json'})
            r = conn.getresponse()
            err = json.loads(r.read())
            assert r.status == 400, (body, err)

        # observability endpoint reflects the traffic above
        conn.request('GET', '/metrics')
        r = conn.getresponse()
        m = json.loads(r.read())
        assert r.status == 200
        assert m['requests_ok'] == 1
        assert m['requests_client_error'] == len(bad_payloads)
        assert m['requests_server_error'] == 0
        assert m['latency_samples'] == 1
        assert m['forward_latency_ms_p50'] > 0
    finally:
        httpd.shutdown()
        httpd.server_close()


@pytest.mark.slow
def test_serve_predictor_bf16():
    """The --dtype bfloat16 serving path: predictor builds, warms, and
    returns finite fp32 outputs (backbone computes in bf16)."""
    import base64
    import io

    import numpy as np
    from PIL import Image

    from tuch_tpu.cli.serve import TuchPredictor

    p = TuchPredictor(synthetic=True, dtype='bfloat16', img_res=64,
                      num_verts=110)
    p.warmup()
    img = (np.random.RandomState(2).rand(64, 64, 3) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format='PNG')
    out = p.predict({'image_b64': base64.b64encode(buf.getvalue()).decode()})
    assert len(out['pose']) == 72 and len(out['betas']) == 10
    assert np.isfinite(np.asarray(out['pose'])).all()
    assert np.isfinite(np.asarray(out['cam_t'])).all()


@pytest.mark.slow
def test_serve_dynamic_batching():
    """Micro-batched serving: concurrent identical requests are grouped
    into one device forward, every response is correct and identical, and
    a follow-up sequential request (bucket 1) agrees numerically."""
    import base64
    import io
    import json
    import threading
    from http.client import HTTPConnection
    from types import SimpleNamespace

    import numpy as np
    from PIL import Image

    from tuch_tpu.cli import serve

    args = SimpleNamespace(checkpoint=None, synthetic=True,
                           host='127.0.0.1', port=0, img_res=64,
                           dtype='float32', synthetic_num_verts=170,
                           max_batch=4, batch_wait_ms=250.0)
    httpd = serve.build_server(args)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    try:
        port = httpd.server_address[1]
        img = (np.random.RandomState(1).rand(64, 64, 3) * 255
               ).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format='PNG')
        body = json.dumps(
            {'image_b64': base64.b64encode(buf.getvalue()).decode()})

        results = [None] * 4

        def fire(i):
            conn = HTTPConnection('127.0.0.1', port, timeout=300)
            conn.request('POST', '/predict', body=body,
                         headers={'Content-Type': 'application/json'})
            r = conn.getresponse()
            results[i] = (r.status, json.loads(r.read()))
            conn.close()

        threads = [threading.Thread(target=fire, args=(i,))
                   for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        assert all(st == 200 for st, _ in results), results
        poses = [np.asarray(out['pose']) for _, out in results]
        for p in poses[1:]:
            # usually one batch (identical rows); if the scheduler split
            # them across buckets, XLA layout may reassociate -> allclose
            np.testing.assert_allclose(poses[0], p, atol=1e-4)

        # sequential request rides the bucket-1 program; XLA layout may
        # reassociate, so compare numerically rather than bitwise
        conn = HTTPConnection('127.0.0.1', port, timeout=300)
        conn.request('POST', '/predict', body=body,
                     headers={'Content-Type': 'application/json'})
        single = json.loads(conn.getresponse().read())
        np.testing.assert_allclose(np.asarray(single['pose']), poses[0],
                                   atol=1e-4)

        conn.request('GET', '/metrics')
        m = json.loads(conn.getresponse().read())
        assert m['max_batch'] == 4
        assert m['batched_forwards'] >= 2
        assert m['batch_size_max'] >= 2, m  # grouping actually happened
        assert m['requests_ok'] == 5 and m['requests_server_error'] == 0
    finally:
        httpd.predictor.close()
        httpd.shutdown()
        httpd.server_close()
