"""HDF5 weight-import tests against a synthetic Keras-layout checkpoint."""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from lrp_imagecaptioning_tpu.models.weights_io import load_reference_decoder_h5


def _make_ref_h5(path, V=20, E=8, H=8, D=16):
    rng = np.random.default_rng(0)

    def w(shape):
        return rng.normal(size=shape).astype(np.float32)

    with h5py.File(path, "w") as f:
        mw = f.create_group("model_weights")

        def dense(name):
            g = mw.create_group(name).create_group(name)
            g.create_dataset("kernel:0", data=w((D if name == "image_features" else
                                                 D if name == "global_img_feature" else H,
                                                 H if name == "image_features" else
                                                 E if name == "global_img_feature" else V)))
            g.create_dataset("bias:0", data=w((H if name == "image_features" else
                                               E if name == "global_img_feature" else V,)))

        dense("image_features")
        dense("global_img_feature")
        dense("output")
        emb = mw.create_group("embedding_1").create_group("embedding_1")
        emb.create_dataset("embeddings:0", data=w((V, E)))

        wrap = mw.create_group("external_attention_rnn_wrapper_local_attention_v3_1")
        lstm = wrap.create_group("lstm_1")
        lstm.create_dataset("kernel:0", data=w((2 * E, 4 * H)))
        lstm.create_dataset("recurrent_kernel:0", data=w((H, 4 * H)))
        lstm.create_dataset("bias:0", data=w((4 * H,)))
        for nm, shape in [("_Wv", (H, H)), ("_Wg", (H, H)), ("_Wx", (2 * E, H)),
                          ("_Wh", (H, H)), ("_Ws", (H, H)), ("_V", (H, 1))]:
            wrap.create_dataset(
                f"external_attention_rnn_wrapper_local_attention_v3_1{nm}:0", data=w(shape)
            )
    return path


def test_adaptive_decoder_import(tmp_path):
    p = _make_ref_h5(str(tmp_path / "ref.h5"))
    params = load_reference_decoder_h5(p, "adaptiveattention")
    V, E, H, D = 20, 8, 8, 16
    assert params["embedding"].shape == (V, E)
    assert params["lstm"]["wi"].shape == (2 * E, 4 * H)
    assert params["lstm"]["wh"].shape == (H, 4 * H)
    assert params["lstm"]["b"].shape == (4 * H,)
    assert params["attn"]["Wv"].shape == (H, H)
    assert params["attn"]["V"].shape == (H, 1)
    assert params["output"]["kernel"].shape == (H, V)
    assert params["image_features"]["kernel"].shape == (D, H)
