"""Golden-logits regression fixtures (SURVEY.md §4 item 3).

Golden outputs are generated once from the seeded zoo models via the
pure-jnp oracle path on CPU and stored as compact fingerprints (first 8
logits + argmax + sum) in-repo.  Any change to weight init, layout
transforms, fusion passes, or lowerings that alters numerics shows up
here — across rounds, not just within a session.

Regenerate (only when an intentional numeric change lands):
    python tests/test_goldens.py --regen
"""

import json
import os
import sys

import numpy as np
import pytest

from feathercnn_tpu import Engine
from feathercnn_tpu.models import MODEL_BUILDERS

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens.json")
# vgg16 excluded: ~13 s/forward on the CPU CI backend
MODELS = ["squeezenet_v11", "mobilenet_v1", "resnet50", "googlenet"]


def _fingerprint(name):
    g = MODEL_BUILDERS[name]()
    eng = Engine(g)
    spec = next(iter(g.inputs.values()))
    x = np.random.default_rng(42).normal(size=spec.shape).astype(np.float32)
    out = np.asarray(eng(x), np.float32).ravel()
    return {
        "first8": [round(float(v), 6) for v in out[:8]],
        "argmax": int(out.argmax()),
        "sum": round(float(out.sum()), 5),
    }


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
    assert fp["argmax"] == ref["argmax"], (fp, ref)
    np.testing.assert_allclose(fp["first8"], ref["first8"],
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(fp["sum"], ref["sum"], rtol=1e-4)


if __name__ == "__main__":
    if "--regen" in sys.argv:
        import jax
        jax.config.update("jax_platforms", "cpu")
        out = {}
        for m in MODELS:
            out[m] = _fingerprint(m)
            print(m, out[m])
        with open(GOLDEN_PATH, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {GOLDEN_PATH}")