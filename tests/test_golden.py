"""Golden regression tests: fixed seeds -> fixed decode outputs.

The reference's implicit invariant-check style (SURVEY.md par.4): decode
outputs for frozen weights and a frozen input must never drift. Token
sequences are exact (cross-backend stable: CPU and TPU v5e produce identical
argmax paths at these sizes); scalar sums carry loose tolerances for
accumulation-order differences."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lrp_imagecaptioning_tpu.config import FlickrConfig
from lrp_imagecaptioning_tpu.infer.beam import beam_search
from lrp_imagecaptioning_tpu.infer.greedy import greedy_decode
from lrp_imagecaptioning_tpu.models.captioner import build_captioner

CFG = FlickrConfig(embedding_dim=16, hidden_dim=16, img_feature_length=4,
                   img_feature_dim=512, sentence_length=6, drop_rate=0.0)
VOCAB = 24

GOLDEN = {
    "adaptiveattention": {
        "greedy": [5, 1, 1, 5, 1, 1],
        "beam": [5, 1, 1, 1, 5, 1],
        "beam_score": -18.4702,
    },
    "gridTD": {
        "greedy": [21, 21, 13, 13, 14, 14],
        "beam": [21, 21, 13, 13, 14, 14],
        "beam_score": -18.908,
    },
    "aoa": {
        "greedy": [3, 3, 3, 22, 22, 22],
        "beam": [2, 0, 0, 0, 0, 0],
        "beam_score": -3.0557,
    },
}


@pytest.mark.parametrize("model_type", list(GOLDEN))
def test_decode_goldens(model_type):
    cap = build_captioner(model_type, CFG, VOCAB)
    params = cap.init_params(jax.random.PRNGKey(42))
    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    fg = cap.encode(params, img)
    toks_g, _ = greedy_decode(cap, params, fg, 1, 2, 6)
    toks_b, score = beam_search(cap, params, fg, 1, 2, 3, 6)
    g = GOLDEN[model_type]
    assert np.asarray(toks_g)[0].tolist() == g["greedy"]
    assert np.asarray(toks_b)[0].tolist() == g["beam"]
    np.testing.assert_allclose(float(score[0]), g["beam_score"], rtol=1e-3)
