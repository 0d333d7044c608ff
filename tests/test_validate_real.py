"""Real-weights harness end-to-end on synthetic input (VERDICT r2 item
5): the bundled REAL deploy prototxts (tools/deploys/, layer names
verbatim from the published upstream files) + a wire-encoded synthetic
caffemodel run through tools/validate_real.py — convert, PIL image
preprocessing, fp32 top-1, int8 calibrate + gate.  Only genuine weight
bytes are missing; when they appear the same command validates them.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tools"))

DEPLOYS = os.path.join(ROOT, "tools", "deploys")


def _synth_model(deploy, tmp_path, seed=0):
    from synth_caffemodel import synth_net
    with open(deploy) as f:
        data = synth_net(f.read(), seed=seed)
    path = str(tmp_path / "synth.caffemodel")
    with open(path, "wb") as f:
        f.write(data)
    return path


def _png_images(tmp_path, n, seed=0):
    from PIL import Image
    rng = np.random.default_rng(seed)
    paths = []
    for i in range(n):
        arr = rng.integers(0, 256, size=(280, 300, 3), dtype=np.uint8)
        p = str(tmp_path / f"img{i}.png")
        Image.fromarray(arr).save(p)
        paths.append(p)
    return paths


def test_deploys_regen_match():
    """The committed prototxts are exactly what the generator emits."""
    import deploys.gen_deploys as gd
    for fn, gen in (("squeezenet_v11_deploy.prototxt", gd.squeezenet_v11),
                    ("resnet50_deploy.prototxt", gd.resnet50)):
        with open(os.path.join(DEPLOYS, fn)) as f:
            assert f.read() == gen(), fn


def test_validate_real_squeezenet_synthetic(tmp_path):
    """Full pipeline: PNG decode -> preprocess -> fp32 -> calibrate ->
    int8 -> gate fields, against the real SqueezeNet-v1.1 deploy."""
    from validate_real import validate
    deploy = os.path.join(DEPLOYS, "squeezenet_v11_deploy.prototxt")
    model = _synth_model(deploy, tmp_path)
    paths = _png_images(tmp_path, 6)
    res = validate(deploy, model, paths, batch=3, calib_n=3)
    assert res["images"] == 6
    fp = np.asarray(res["fp_top1_pred"])
    q = np.asarray(res["int8_top1_pred"])
    assert fp.shape == (6,) and (0 <= fp).all() and (fp < 1000).all()
    assert 0.0 <= res["fp_vs_int8_agree"] <= 1.0
    # labels leg: feed the fp predictions back as ground truth — the
    # label plumbing must report exactly 1.0 then, and the int8 drop is
    # the disagreement rate
    labels = {os.path.basename(p): int(v) for p, v in zip(paths, fp)}
    res2 = validate(deploy, model, paths, labels=labels, batch=3,
                    calib_n=3, gate=1.0)
    assert res2["fp_top1"] == 1.0
    assert res2["int8_top1"] == pytest.approx(float((fp == q).mean()))
    assert res2["gate_pass"]


def test_validate_real_resnet50_synthetic(tmp_path):
    """The ResNet-50 deploy (BN/Scale/Eltwise path) binds and runs the
    fp32 leg; npy preprocessed input path."""
    from validate_real import validate
    deploy = os.path.join(DEPLOYS, "resnet50_deploy.prototxt")
    model = _synth_model(deploy, tmp_path)
    rng = np.random.default_rng(1)
    paths = []
    for i in range(2):
        p = str(tmp_path / f"pre{i}.npy")
        np.save(p, rng.normal(0, 30, size=(224, 224, 3))
                .astype(np.float32))
        paths.append(p)
    res = validate(deploy, model, paths, batch=2, quant=None)
    fp = np.asarray(res["fp_top1_pred"])
    assert fp.shape == (2,) and (0 <= fp).all() and (fp < 1000).all()


def test_validate_real_cli(tmp_path):
    """The one-command CLI exits 0 and prints JSON on synthetic input."""
    deploy = os.path.join(DEPLOYS, "squeezenet_v11_deploy.prototxt")
    model = _synth_model(deploy, tmp_path)
    _png_images(tmp_path, 2)
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "validate_real.py"),
         deploy, model, "--images", str(tmp_path), "--batch", "2",
         "--quant", "none"],
        capture_output=True, text=True, env=env, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    import json
    res = json.loads(out.stdout)
    assert res["images"] == 2
