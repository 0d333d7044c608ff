"""Golden-logits regression fixtures (SURVEY.md §4 item 3).

Golden outputs are generated once from the seeded zoo models via the
pure-jnp oracle path on CPU and stored as compact fingerprints (first 8
values + argmax + sum) in-repo.  Any change to weight init, layout
transforms, fusion passes, or lowerings that alters numerics shows up
here — across rounds, not just within a session.

Coverage: every model in MODEL_BUILDERS (28 families).  Detection
graphs fingerprint the pre-NMS head tensors (loc/conf for SSD, the RPN
pair for two-stage) — the same rationale as tools/verify_tpu.py: NMS
row order is chaotic under near-tied random-weight scores, the pre-NMS
tensors are the numerically meaningful signal.  Heavy families shrink
spatial size / proposal counts so the whole sweep stays CI-sized;
drift detection doesn't need deploy-sized inputs.

Regenerate (only when an intentional numeric change lands):
    python tests/test_goldens.py --regen [model ...]
"""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from feathercnn_tpu import Engine
from feathercnn_tpu.models import MODEL_BUILDERS

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens.json")

# CI-sized builder overrides for the deploy-sized families (sizes must
# respect each family's stride constraints: pspnet 8x+1, fcn/deeplab as
# in test_models.py).
MODEL_KW = {
    "pspnet50": dict(size=89, num_classes=21),
    "deeplab_largefov": dict(size=65),
    "fcn32s": dict(size=96),
    "fcn16s": dict(size=96),
    "fcn8s": dict(size=96),
    "faster_rcnn_vgg16": dict(size=(96, 128), pre_nms_top_n=200,
                              post_nms_top_n=32),
    "rfcn_resnet101": dict(size=(96, 128), post_nms_top_n=32),
}
MODELS = sorted(MODEL_BUILDERS)


def _tensor_fp(arr) -> dict:
    out = np.asarray(arr, np.float32).ravel()
    # seeded random projection: a full-tensor checksum that first8/sum
    # can miss (e.g. a changed reduction order shifting mid-tensor
    # values while the sum compensates).  The projection vector is a
    # fixed function of the tensor length, so fingerprints are stable
    # across runs and regen is deterministic.
    v = np.random.default_rng(20260820 + out.size).standard_normal(
        out.size).astype(np.float32)
    return {
        "first8": [round(float(v_), 6) for v_ in out[:8]],
        "argmax": int(out.argmax()),
        "sum": round(float(out.sum()), 5),
        "proj": round(float(np.dot(out, v)), 5),
    }


def _fingerprint(name):
    import inspect

    builder = MODEL_BUILDERS[name]
    kw = dict(MODEL_KW.get(name, {}))
    if "with_softmax" in inspect.signature(builder).parameters:
        kw["with_softmax"] = False
    g = builder(**kw)
    eng = Engine(g)
    spec = next(iter(g.inputs.values()))
    x = np.random.default_rng(42).normal(size=spec.shape).astype(np.float32)
    inp = {next(iter(g.inputs)): x}
    if len(g.inputs) > 1:
        from feathercnn_tpu.utils.timing import default_extra_inputs
        inp.update(default_extra_inputs(g))
    det = next((n for n in g.nodes
                if n.op in ("DetectionOutput", "Proposal")), None)
    if det is not None:
        names = list(det.inputs[:2])     # pre-NMS loc/conf or RPN pair
        res = eng.run(inp, extract=names)
        return {nm: _tensor_fp(res[nm]) for nm in names}
    res = eng.run(inp)
    return {g.outputs[0]: _tensor_fp(res[g.outputs[0]])}


@pytest.mark.parametrize("name", MODELS)
def test_golden_logits(name):
    if not os.path.exists(GOLDEN_PATH):
        pytest.skip("no goldens.json (run --regen)")
    with open(GOLDEN_PATH) as f:
        goldens = json.load(f)
    if name not in goldens:
        pytest.skip(f"no golden for {name}")
    fp = _fingerprint(name)
    ref = goldens[name]
    assert set(fp) == set(ref), (set(fp), set(ref))
    for tname, t in fp.items():
        r = ref[tname]
        assert t["argmax"] == r["argmax"], (name, tname, t, r)
        np.testing.assert_allclose(t["first8"], r["first8"],
                                   rtol=1e-4, atol=1e-6,
                                   err_msg=f"{name}/{tname}")
        np.testing.assert_allclose(t["sum"], r["sum"], rtol=1e-4,
                                   err_msg=f"{name}/{tname}")
        # scale the projection tolerance by the tensor's norm proxy
        # (|sum| is a poor proxy for cancellation-heavy tensors, so use
        # an absolute floor derived from first8's magnitude too)
        np.testing.assert_allclose(
            t["proj"], r["proj"], rtol=1e-3,
            atol=1e-3 * (1.0 + max(abs(v) for v in t["first8"])),
            err_msg=f"{name}/{tname} random-projection checksum")


if __name__ == "__main__":
    if "--regen" in sys.argv:
        import time

        import jax
        jax.config.update("jax_platforms", "cpu")
        only = [a for a in sys.argv[1:] if a != "--regen"]
        out = {}
        if os.path.exists(GOLDEN_PATH):
            with open(GOLDEN_PATH) as f:
                out = json.load(f)
        for m in (only or MODELS):
            t0 = time.time()
            out[m] = _fingerprint(m)
            print(f"{m} ({time.time() - t0:.1f}s)", out[m])
        with open(GOLDEN_PATH, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
        print(f"wrote {GOLDEN_PATH}")
