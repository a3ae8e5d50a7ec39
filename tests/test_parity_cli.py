"""`cli parity` — the published-checkpoint parity harness (VERDICT r03 #4).

The real pretrained .hdf5 files (reference README.md:33) are not
downloadable here, so the harness is proven on a checkpoint we mint
ourselves in the reference's exact save_weights format
(save_reference_checkpoint_h5): record an expectation from one model, diff
it against the same model (PARITY OK) and against different weights
(PARITY FAIL, exit 1). Dims (vocab/hidden/embedding) must be inferred from
the .hdf5 — the command gets no dataset and no dims flags.
"""

import numpy as np
import pytest

import jax

from lrp_imagecaptioning_tpu import cli
from lrp_imagecaptioning_tpu.config import FlickrConfig
from lrp_imagecaptioning_tpu.models.captioner import build_captioner
from lrp_imagecaptioning_tpu.models.weights_io import (
    infer_h5_dims, save_reference_checkpoint_h5)

CFG = FlickrConfig(
    embedding_dim=16, hidden_dim=16, layer_name="block2_conv1",
    img_feature_length=16, img_feature_dim=128, image_size=(8, 8),
    sentence_length=5, drop_rate=0.0,
)
VOCAB = 16


def _mint_h5(tmp_path, model_type, seed, name):
    cap = build_captioner(model_type, CFG, VOCAB)
    params = cap.init_params(jax.random.PRNGKey(seed))
    path = str(tmp_path / name)
    save_reference_checkpoint_h5(path, params, model_type,
                                 arch=CFG.img_encoder, until=CFG.layer_name)
    return path


def _mint_image(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(7)
    arr = rng.uniform(0, 255, size=(12, 12, 3)).astype("uint8")
    p = str(tmp_path / "img.png")
    Image.fromarray(arr).save(p)
    return p


def _common():
    return ["--set", "image_size=8,8", "--set", "img_feature_length=16",
            "--set", "img_feature_dim=128", "--set", "layer_name=block2_conv1",
            "--set", "sentence_length=5", "--set", "drop_rate=0.0"]


@pytest.mark.parametrize("model_type", ["adaptiveattention", "gridTD"])
def test_parity_record_then_match(tmp_path, model_type, capsys):
    h5 = _mint_h5(tmp_path, model_type, seed=0, name="ref.h5")
    img = _mint_image(tmp_path)
    dims = infer_h5_dims(h5)
    assert dims == {"vocab_size": VOCAB, "hidden_dim": 16, "embedding_dim": 16}

    expect = str(tmp_path / "expect")
    cli.main(["parity", "--model", model_type, *_common(),
              "--h5", h5, "--image", img, "--beam-size", "2",
              "--out", expect])
    out = capsys.readouterr().out
    assert "recorded parity expectation" in out
    z = np.load(f"{expect}/parity-expected.npz")
    assert z["relevance_maps"].shape[1:] == (8, 8, 3)

    # same checkpoint against its own recording: token-exact, maps within tol
    cli.main(["parity", "--model", model_type, *_common(),
              "--h5", h5, "--image", img, "--beam-size", "2",
              "--expect", expect])
    out = capsys.readouterr().out
    assert "PARITY OK" in out


def test_parity_detects_mismatch(tmp_path, capsys):
    h5_a = _mint_h5(tmp_path, "adaptiveattention", seed=0, name="a.h5")
    h5_b = _mint_h5(tmp_path, "adaptiveattention", seed=1, name="b.h5")
    img = _mint_image(tmp_path)
    expect = str(tmp_path / "expect")
    cli.main(["parity", "--model", "adaptiveattention", *_common(),
              "--h5", h5_a, "--image", img, "--beam-size", "2", "--out", expect])
    capsys.readouterr()
    with pytest.raises(SystemExit) as ei:
        cli.main(["parity", "--model", "adaptiveattention", *_common(),
                  "--h5", h5_b, "--image", img, "--beam-size", "2",
                  "--expect", expect])
    assert "PARITY FAIL" in str(ei.value)


def test_parity_diff_zero_word_record():
    """A recorded expectation with ZERO explained words (immediate-EOS
    decode — the exact degenerate case a weight-import bug produces) must
    compare by shape instead of crashing numpy's empty reduction."""
    empty = {
        "tokens_1based": np.zeros((0,), np.int32),
        "relevance_maps": np.zeros((0, 8, 8, 3), np.float32),
        "attentions": np.zeros((0, 4, 4), np.float32),
    }
    assert cli.parity_diff(empty, dict(empty), tol=1e-4) == []
    # and a shape mismatch against the empty record still fails loudly
    got = dict(empty, relevance_maps=np.zeros((2, 8, 8, 3), np.float32))
    fails = cli.parity_diff(got, dict(empty), tol=1e-4)
    assert any("relevance_maps shape" in f for f in fails)
