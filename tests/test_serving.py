"""Serving-layer tests: queue semantics (py + native), continuous batching
end-to-end, padding correctness, fault handling."""

import threading
import time

import numpy as np
import pytest

from feathercnn_tpu import Engine, EngineConfig
from feathercnn_tpu.models.builder import GraphBuilder
from feathercnn_tpu.serve import InferenceServer, PyBatchQueue
from feathercnn_tpu.serve.batcher import make_queue


def _tiny_engine():
    b = GraphBuilder("srv", seed=7)
    x = b.input("data", (8, 8, 8, 3))
    y = b.conv("c1", x, 8, 3, pad=1, relu=True)
    y = b.pool("gap", y, 0, mode="AVE", global_pooling=True)
    y = b.fc("fc", y, 4)
    g = b.finish([y])
    return Engine(g)


@pytest.mark.parametrize("native", [False, True])
def test_queue_batching(native, rng):
    q = make_queue((3,), np.float32, (2,), np.float32,
                   prefer_native=native)
    tickets = [q.submit(np.full(3, i, np.float32)) for i in range(5)]
    assert q.depth() == 5
    batch, got = q.collect(max_batch=3, timeout_us=1000)
    assert len(got) == 3 and batch.shape == (3, 3)
    q.post_results(got, np.stack([batch[:, 0], -batch[:, 0]], axis=1))
    r = q.wait_result(got[1])
    assert r is not None and r[0] == 1.0 and r[1] == -1.0
    batch2, got2 = q.collect(max_batch=3, timeout_us=1000)
    assert len(got2) == 2


def test_server_end_to_end(rng):
    eng = _tiny_engine()
    srv = InferenceServer(eng, batch_size=8, batch_timeout_us=5000,
                          prefer_native_queue=False)
    srv.start()
    try:
        imgs = [rng.normal(size=(8, 8, 3)).astype(np.float32)
                for _ in range(13)]
        results = [None] * len(imgs)

        def client(i):
            results[i] = srv.infer(imgs[i], timeout_s=60)

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(len(imgs))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=90)

        # every client got a result matching a direct engine call
        direct = np.asarray(eng.run(
            {"data": np.stack(imgs[:8])})[eng.output_names[0]])
        for i in range(len(imgs)):
            assert results[i] is not None, f"client {i} timed out"
        np.testing.assert_allclose(results[0], direct[0].reshape(-1),
                                   rtol=1e-4, atol=1e-5)
        g = srv.gauges()
        assert g["images"] == 13
        assert g["healthy"]
        # 13 images into batch-8 slots -> at least one padded batch
        assert g["pad_images"] > 0
    finally:
        srv.stop()


def test_server_fault_isolation(rng, monkeypatch):
    """A failing batch must raise InferenceFailed for its tickets (the
    explicit status, not a NaN sentinel) and must not hang clients."""
    import pytest

    from feathercnn_tpu.serve.server import InferenceFailed

    eng = _tiny_engine()
    srv = InferenceServer(eng, batch_size=4, batch_timeout_us=1000,
                          max_retries=0, prefer_native_queue=False)

    def boom(batch):
        raise RuntimeError("injected fault")

    # the pipelined loop enters via _dispatch_batch, the retry path via
    # _run_batch — both must hit the injected fault
    srv._run_batch = boom
    srv._dispatch_batch = boom
    srv.start()
    try:
        with pytest.raises(InferenceFailed):
            srv.infer(rng.normal(size=(8, 8, 3)).astype(np.float32),
                      timeout_s=30)
        assert srv.metrics["faults"] >= 1
    finally:
        srv.stop()


def test_server_int8_transfer_mode(rng):
    """A full-int8 engine auto-selects int8 host->device transfer
    (quantized with the first conv's calibrated scale); results match
    the direct engine run."""
    from feathercnn_tpu.quant import calibrate
    b = GraphBuilder("srv8", seed=17)
    x = b.input("data", (8, 8, 8, 3))
    y = b.conv("c1", x, 8, 3, pad=1, relu=True)
    y = b.conv("c2", y, 8, 1, relu=True)
    y = b.pool("gap", y, 0, mode="AVE", global_pooling=True)
    y = b.fc("fc", y, 4)
    g = b.finish([y])
    xcal = rng.normal(size=(8, 8, 8, 3)).astype(np.float32)
    calibrate(g, [xcal], method="max")
    eng = Engine(g, EngineConfig(backend="pallas", quant="w8a8",
                                 interpret=True))
    srv = InferenceServer(eng, batch_size=4, batch_timeout_us=1000)
    assert srv._transfer_scale is not None       # int8 mode engaged
    srv.start()
    try:
        img = xcal[0]
        got = srv.infer(img, timeout_s=30)
        want = np.asarray(eng.run(
            {"data": srv._to_transfer(img[None])})["fc"])[0]
        np.testing.assert_allclose(got.ravel(), want.ravel(),
                                   rtol=1e-3, atol=1e-3)
    finally:
        srv.stop()


def test_server_pipelined_matches_sync(rng):
    """pipeline_depth=2 (double-buffered dispatch/fetch overlap) returns
    the same results as the synchronous loop, across several batches and
    an idle drain."""
    eng = _tiny_engine()
    imgs = [rng.normal(size=(8, 8, 3)).astype(np.float32)
            for _ in range(11)]
    got = {}
    for depth in (1, 2):
        srv = InferenceServer(eng, batch_size=4, batch_timeout_us=2000,
                              prefer_native_queue=False,
                              pipeline_depth=depth)
        srv.start()
        try:
            results = [None] * len(imgs)

            def client(i, srv=srv, results=results):
                results[i] = srv.infer(imgs[i], timeout_s=60)

            threads = [threading.Thread(target=client, args=(i,))
                       for i in range(len(imgs))]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=90)
            assert all(r is not None for r in results), depth
            got[depth] = results
            assert srv.gauges()["images"] == len(imgs)
        finally:
            srv.stop()
    for a, b in zip(got[1], got[2]):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_server_int8_ingest_queue(rng):
    """int8 transfer mode quantizes on INGEST: the queue itself carries
    int8 items, and pre-quantized int8 submissions skip the cast."""
    from feathercnn_tpu.quant import calibrate
    b = GraphBuilder("srv8q", seed=23)
    x = b.input("data", (4, 8, 8, 3))
    y = b.conv("c1", x, 8, 3, pad=1, relu=True)
    y = b.pool("gap", y, 0, mode="AVE", global_pooling=True)
    y = b.fc("fc", y, 4)
    g = b.finish([y])
    xcal = rng.normal(size=(4, 8, 8, 3)).astype(np.float32)
    calibrate(g, [xcal], method="max")
    eng = Engine(g, EngineConfig(backend="pallas", quant="w8a8",
                                 interpret=True))
    srv = InferenceServer(eng, batch_size=4, batch_timeout_us=1000,
                          prefer_native_queue=False)
    assert srv._queue_dtype == np.int8
    srv.start()
    try:
        img = xcal[0]
        got_f32 = srv.infer(img, timeout_s=30)
        pre = np.clip(np.round(img / srv._transfer_scale), -127,
                      127).astype(np.int8)
        got_i8 = srv.infer(pre, timeout_s=30)
        np.testing.assert_allclose(got_f32, got_i8, rtol=1e-5, atol=1e-6)
    finally:
        srv.stop()


def test_prometheus_text():
    eng = _tiny_engine()
    srv = InferenceServer(eng, batch_size=2)
    text = srv.prometheus_text()
    assert "feathercnn_batches 0" in text
    assert "feathercnn_healthy" in text
    assert text.endswith("\n")


def test_multi_slot_batching(rng):
    """batch_slots: a lightly loaded server picks the smallest slot that
    fits the collected group (less padding, lower latency)."""
    eng = _tiny_engine()
    srv = InferenceServer(eng, batch_size=8, batch_slots=[2, 8],
                          batch_timeout_us=1000)
    assert srv.batch_slots == [2, 8]
    srv.start()
    try:
        img = rng.normal(size=(8, 8, 3)).astype(np.float32)
        out = srv.infer(img, timeout_s=30)
        assert out is not None and out.shape == (4,)
        # one request -> slot 2 -> exactly 1 pad image (not 7)
        assert srv.metrics["pad_images"] == 1
    finally:
        srv.stop()


def test_preprocess_native_matches_numpy(rng):
    """C++ preprocessing (resize+normalize+quantize) matches the numpy
    reference bit-for-bit-ish (f32) and exactly on int8."""
    from feathercnn_tpu.serve import native_available, preprocess
    img = rng.integers(0, 256, size=(37, 53, 3), dtype=np.uint8)
    mean, std = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)
    ref = preprocess(img, (24, 24), mean, std, prefer_native=False)
    assert ref.dtype == np.float32 and ref.shape == (24, 24, 3)
    ref8 = preprocess(img, (24, 24), mean, std, quant_scale=0.02,
                      prefer_native=False)
    assert ref8.dtype == np.int8
    if native_available():
        out = preprocess(img, (24, 24), mean, std)
        # the C++ path lerps in f32, the numpy reference in f64:
        # worst-case divergence is ~1e-5 after the /255 + normalize
        # (measured 1.06e-5 max on this seed — deterministic, same
        # source texels; NOT a coordinate flip)
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=2e-5)
        out8 = preprocess(img, (24, 24), mean, std, quant_scale=0.02)
        # rounding at the .5 boundary may differ by 1 LSB on a few px
        assert (out8 != ref8).mean() < 0.01
    # identity resize: exact values
    same = preprocess(img, (37, 53), (0, 0, 0), (1, 1, 1),
                      prefer_native=False)
    np.testing.assert_allclose(same, img.astype(np.float32) / 255.0,
                               atol=1e-6)


def test_sharded_engine_serving(rng):
    """Serving over a DP-sharded engine on the virtual 8-device mesh —
    the multi-chip serving integration path in CI."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from feathercnn_tpu.parallel import ShardingConfig
    b = GraphBuilder("srvdp", seed=31)
    x = b.input("data", (8, 8, 8, 3))
    y = b.conv("c1", x, 16, 3, pad=1, relu=True)
    y = b.pool("gap", y, 0, mode="AVE", global_pooling=True)
    y = b.fc("fc", y, 4)
    g = b.finish([y])
    eng = Engine(g, EngineConfig(
        sharding=ShardingConfig(mesh_shape=(8, 1))))
    ref = Engine(g)
    srv = InferenceServer(eng, batch_size=8, batch_timeout_us=2000,
                          transfer_dtype=None)
    srv.start()
    try:
        img = rng.normal(size=(8, 8, 3)).astype(np.float32)
        out = srv.infer(img, timeout_s=30)
        want = np.asarray(ref.run({"data": img[None]})["fc"])[0]
        np.testing.assert_allclose(out.ravel(), want.ravel(),
                                   rtol=1e-4, atol=1e-5)
    finally:
        srv.stop()


def test_server_retry_then_success(rng):
    """A transient batch failure retries and succeeds: clients get real
    results, the fault is counted, health stays up."""
    eng = _tiny_engine()
    srv = InferenceServer(eng, batch_size=4, batch_timeout_us=1000,
                          max_retries=1, prefer_native_queue=False)
    # hook the pipelined loop's entry (_dispatch_batch); the retry path
    # re-runs through the unpatched _run_batch and succeeds
    real = srv._dispatch_batch
    state = {"fails": 1}

    def flaky(batch):
        if state["fails"] > 0:
            state["fails"] -= 1
            raise RuntimeError("transient")
        return real(batch)

    srv._dispatch_batch = flaky
    srv.start()
    try:
        out = srv.infer(rng.normal(size=(8, 8, 3)).astype(np.float32),
                        timeout_s=30)
        assert out is not None and not np.isnan(out).any()
        assert srv.metrics["faults"] == 1
        assert srv.healthy()
    finally:
        srv.stop()


def test_http_frontend_end_to_end(rng):
    """HTTP front-end: /infer (.npy and JSON), /healthz, /metrics —
    responses match direct engine output; concurrent posts batch."""
    import io
    import json
    import urllib.request

    from feathercnn_tpu.serve import HttpFrontend

    eng = _tiny_engine()
    srv = InferenceServer(eng, batch_size=8, batch_timeout_us=5000,
                          prefer_native_queue=False)
    srv.start()
    front = HttpFrontend(srv, host="127.0.0.1", port=0)
    front.start()
    base = f"http://127.0.0.1:{front.port}"
    try:
        img = rng.normal(size=(8, 8, 3)).astype(np.float32)
        buf = io.BytesIO()
        np.save(buf, img)
        req = urllib.request.Request(
            base + "/infer", data=buf.getvalue(),
            headers={"Content-Type": "application/x-npy"})
        with urllib.request.urlopen(req, timeout=30) as resp:
            assert resp.headers["Content-Type"] == "application/x-npy"
            out = np.load(io.BytesIO(resp.read()))
        ref = np.asarray(eng(img[None]))[0]
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

        # JSON round trip
        req = urllib.request.Request(
            base + "/infer",
            data=json.dumps({"data": img.tolist()}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=30) as resp:
            out_j = np.asarray(json.loads(resp.read())["result"],
                               np.float32)
        np.testing.assert_allclose(out_j, ref, rtol=1e-4, atol=1e-5)

        # wrong shape -> 400
        bad = io.BytesIO()
        np.save(bad, np.zeros((4, 4, 3), np.float32))
        req = urllib.request.Request(
            base + "/infer", data=bad.getvalue(),
            headers={"Content-Type": "application/x-npy"})
        try:
            urllib.request.urlopen(req, timeout=30)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400

        with urllib.request.urlopen(base + "/healthz", timeout=10) as r:
            assert r.status == 200
        with urllib.request.urlopen(base + "/metrics", timeout=10) as r:
            text = r.read().decode()
        assert "feathercnn_images" in text
    finally:
        front.stop()
        srv.stop()


def test_server_extra_inputs_two_stage(rng):
    """Serving a multi-input engine (the two-stage detectors' im_info):
    fixed extra inputs per deployment; missing ones raise at init."""
    from feathercnn_tpu.models.builder import GraphBuilder
    from feathercnn_tpu.models.zoo import _rpn_softmax

    b = GraphBuilder("srv2", seed=8)
    data = b.input("data", (1, 32, 32, 3))
    im_info = b.input("im_info", (1, 3))
    x = b.conv("c1", data, 8, 3, stride=2, pad=1, relu=True)
    cls = b.conv("rpn_cls", x, 18, 1)
    box = b.conv("rpn_box", x, 36, 1)
    prob = _rpn_softmax(b, cls, "sm")
    rois = b.proposal("rois", prob, box, im_info, feat_stride=2,
                      pre_nms_top_n=32, post_nms_top_n=4, min_size=2)
    g = b.finish([rois])
    eng = Engine(g)

    with pytest.raises(ValueError, match="im_info"):
        InferenceServer(eng, batch_size=1, prefer_native_queue=False)

    info = np.asarray([[32.0, 32.0, 1.0]], np.float32)
    srv = InferenceServer(eng, batch_size=1, prefer_native_queue=False,
                          extra_inputs={"im_info": info})
    srv.start()
    try:
        img = rng.normal(size=(32, 32, 3)).astype(np.float32)
        out = srv.infer(img)
        assert out is not None and out.shape == (4, 5)
        ref = np.asarray(eng.run({"data": img[None],
                                  "im_info": info})["rois"])
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
    finally:
        srv.stop()


def test_server_roi_major_batched(rng):
    """Round 5: ROI-major outputs at batch > 1 — every output's leading
    dim is an integer multiple of the batch (Proposal emits image-major
    row blocks), so the batcher splits each request its contiguous
    block instead of refusing (the old path demanded batch_size=1).
    Each request must get exactly the rows of ITS image."""
    from feathercnn_tpu.models.builder import GraphBuilder
    from feathercnn_tpu.models.zoo import _rpn_softmax

    B = 4
    b = GraphBuilder("srvrb", seed=8)
    data = b.input("data", (B, 32, 32, 3))
    im_info = b.input("im_info", (B, 3))
    x = b.conv("c1", data, 8, 3, stride=2, pad=1, relu=True)
    cls = b.conv("rpn_cls", x, 18, 1)
    box = b.conv("rpn_box", x, 36, 1)
    prob = _rpn_softmax(b, cls, "sm")
    rois = b.proposal("rois", prob, box, im_info, feat_stride=2,
                      pre_nms_top_n=32, post_nms_top_n=4, min_size=2)
    g = b.finish([rois])
    eng = Engine(g)
    info = np.tile(np.asarray([[32.0, 32.0, 1.0]], np.float32), (B, 1))
    srv = InferenceServer(eng, batch_size=B, prefer_native_queue=False,
                          extra_inputs={"im_info": info},
                          batch_timeout_us=200_000)
    srv.start()
    try:
        imgs = rng.normal(size=(3, 32, 32, 3)).astype(np.float32)
        import concurrent.futures as cf
        with cf.ThreadPoolExecutor(3) as ex:
            outs = list(ex.map(srv.infer, imgs))
        for i, out in enumerate(outs):
            assert out.shape == (4, 5)
            batch = np.concatenate(
                [imgs[i][None], np.zeros((B - 1, 32, 32, 3),
                                         np.float32)])
            ref = np.asarray(eng.run({"data": batch,
                                      "im_info": info})["rois"])[:4]
            # image 0's block of an all-[img,pad,pad,pad] batch equals
            # the served row block when the request rode slot 0; served
            # requests may land on any slot, so compare against the
            # per-slot reference of a batch holding the image alone
            got_valid = out[out[:, 0] >= 0]
            ref_valid = ref[ref[:, 0] >= 0]
            np.testing.assert_allclose(
                got_valid[:, 1:], ref_valid[:, 1:], rtol=1e-4,
                atol=1e-4)
    finally:
        srv.stop()


def test_server_multi_output(rng):
    """Multi-output engines (two-stage detectors emit cls_prob/bbox_pred/
    rois): infer_outputs returns EVERY graph output, and the HTTP
    front-end answers .npy requests with an .npz archive of all of them
    (round-1 ADVICE: callers previously got outputs[0] alone)."""
    import io
    import urllib.request

    from feathercnn_tpu.models.builder import GraphBuilder
    from feathercnn_tpu.models.zoo import _rpn_softmax
    from feathercnn_tpu.serve import HttpFrontend

    b = GraphBuilder("srvmo", seed=9)
    data = b.input("data", (1, 32, 32, 3))
    im_info = b.input("im_info", (1, 3))
    x = b.conv("c1", data, 8, 3, stride=2, pad=1, relu=True)
    cls = b.conv("rpn_cls", x, 18, 1)
    box = b.conv("rpn_box", x, 36, 1)
    prob = _rpn_softmax(b, cls, "sm")
    rois = b.proposal("rois", prob, box, im_info, feat_stride=2,
                      pre_nms_top_n=32, post_nms_top_n=4, min_size=2)
    g = b.finish([rois, prob])          # ROI-major + batch-major mix
    eng = Engine(g)
    info = np.asarray([[32.0, 32.0, 1.0]], np.float32)
    srv = InferenceServer(eng, batch_size=1, prefer_native_queue=False,
                          extra_inputs={"im_info": info})
    srv.start()
    front = HttpFrontend(srv, host="127.0.0.1", port=0)
    front.start()
    try:
        img = rng.normal(size=(32, 32, 3)).astype(np.float32)
        ref = eng.run({"data": img[None], "im_info": info})
        outs = srv.infer_outputs(img)
        assert set(outs) == set(eng.graph.outputs)
        for nm in eng.graph.outputs:
            np.testing.assert_allclose(
                outs[nm], np.asarray(ref[nm], np.float32).reshape(
                    outs[nm].shape), rtol=1e-5, atol=1e-5)

        buf = io.BytesIO()
        np.save(buf, img)
        req = urllib.request.Request(
            f"http://127.0.0.1:{front.port}/infer", data=buf.getvalue(),
            headers={"Content-Type": "application/x-npy"})
        with urllib.request.urlopen(req, timeout=30) as r:
            assert r.status == 200
            assert r.headers["Content-Type"] == "application/x-npz"
            arch = np.load(io.BytesIO(r.read()))
        assert set(arch.files) == set(eng.graph.outputs)
        np.testing.assert_allclose(arch["rois"], outs["rois"],
                                   rtol=1e-5, atol=1e-5)
    finally:
        front.stop()
        srv.stop()


def test_decode_detections_two_stage(rng):
    """serve.decode_detections (the test.py tail): deltas apply with the
    +1 convention, boxes clip, per-class NMS keeps the dominant box,
    background is skipped; class-agnostic (R-FCN) form shares deltas."""
    from feathercnn_tpu.serve import decode_detections

    rois = np.asarray([[0, 10, 10, 49, 49],
                       [0, 12, 12, 51, 51],     # overlaps roi 0
                       [0, 100, 100, 139, 139]], np.float32)
    C = 3
    cls_prob = np.asarray([[0.05, 0.9, 0.05],
                           [0.1, 0.8, 0.1],
                           [0.1, 0.1, 0.8]], np.float32)
    bbox_pred = np.zeros((3, 4 * C), np.float32)     # identity deltas
    dets = decode_detections(cls_prob, bbox_pred, rois, (200, 200),
                             score_thresh=0.3, nms_thresh=0.3)
    assert set(dets) == {1, 2}
    # class 1: the two overlapping rois NMS to one box (the 0.9 one).
    # Reference asymmetry: bbox_transform_inv with ZERO deltas returns
    # x2+1/y2+1 (the forward transform uses +1 widths, the inverse
    # reconstructs cx +- w/2 without subtracting it back).
    assert dets[1].shape == (1, 5)
    np.testing.assert_allclose(dets[1][0], [10, 10, 50, 50, 0.9],
                               atol=1e-5)
    np.testing.assert_allclose(dets[2][0][:4], [100, 100, 140, 140])

    # nonzero deltas shift the box center: dx=0.25 of width 40 -> +10
    bp = np.zeros((1, 4 * C), np.float32)
    bp[0, 4:8] = [0.25, 0.0, 0.0, 0.0]
    d = decode_detections(cls_prob[:1], bp, rois[:1], (200, 200),
                          score_thresh=0.3)
    np.testing.assert_allclose(d[1][0][:4], [20, 10, 60, 50], atol=1e-4)

    # class-agnostic: (R, 8) deltas, fg column applies to every class
    bp8 = np.zeros((3, 8), np.float32)
    d = decode_detections(cls_prob, bp8, rois, (200, 200),
                          score_thresh=0.3, class_agnostic=True)
    assert set(d) == {1, 2}

    # Proposal padding rows (batch_idx = -1) are dropped before decode:
    # a high-scoring padded row must not emit a near-origin detection
    rois_p = np.concatenate([rois, [[-1, 0, 0, 0, 0]]]).astype(np.float32)
    cp = np.concatenate([cls_prob, [[0.0, 0.99, 0.0]]]).astype(np.float32)
    bpp = np.zeros((4, 4 * C), np.float32)
    d = decode_detections(cp, bpp, rois_p, (200, 200), score_thresh=0.3,
                          nms_thresh=0.3)
    assert not any((row[:4] <= 1.0).all() for c in d for row in d[c])


def test_slot_selection_and_padding_policy(rng):
    """Batching-policy SLO pins (VERDICT round 1 item 9), deterministic
    and tunnel-independent: slot selection picks the smallest
    pre-compiled slot that fits; padding counts are exact; a burst of M
    requests drains in at most ceil(M/slot)+1 device batches (bounds
    queue-induced latency: no request waits more than that many
    batches); nothing is dropped."""
    import math

    eng = _tiny_engine()
    srv = InferenceServer(eng, batch_size=8, batch_slots=[2, 4],
                          batch_timeout_us=1000,
                          prefer_native_queue=False)
    # slot selection: smallest slot >= n_real; overflow clamps to max
    assert srv.batch_slots == [2, 4, 8]
    for n, want in [(1, 2), (2, 2), (3, 4), (4, 4), (5, 8), (8, 8),
                    (9, 8)]:
        assert srv.select_slot(n) == want, (n, want)

    # burst drain bound: hook the dispatch entry, count device batches
    sizes = []
    real_disp = srv._dispatch_batch

    def counting_disp(batch):
        sizes.append(batch.shape[0])
        return real_disp(batch)

    srv._dispatch_batch = counting_disp
    try:
        M = 29
        imgs = [rng.normal(size=(8, 8, 3)).astype(np.float32)
                for _ in range(M)]
        results = [None] * M
        threads = []
        for i, im in enumerate(imgs):
            def call(i=i, im=im):
                results[i] = srv.infer(im, timeout_s=60)
            t = threading.Thread(target=call)
            t.start()
            threads.append(t)
        # The bound assumes a BURST: all M queued before draining starts.
        # Under full-suite load the submitter threads trickle in slower
        # than batch_timeout_us, which legitimately dispatches more,
        # smaller batches — so start the server only once the queue
        # actually holds the whole burst.
        deadline = time.time() + 60
        while srv.queue.depth() < M and time.time() < deadline:
            time.sleep(0.001)
        assert srv.queue.depth() == M
        srv.start()
        for t in threads:
            t.join(timeout=60)
        assert all(r is not None for r in results), "dropped requests"
        n_batches = len(sizes)
        assert n_batches <= math.ceil(M / 8) + 1, (n_batches, sizes)
        assert sum(sizes) == M
        # padding metric agrees with the slots actually dispatched
        padded = sum(srv.select_slot(s) - s for s in sizes)
        assert srv.metrics["pad_images"] == padded
    finally:
        srv.stop()
