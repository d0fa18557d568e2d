"""Shape-adaptive checkpoint surgery rules (reference train.py:161-238):
hidden-dim-doubling repeats for norms/attention/linear2/input_proj,
fresh-init for linear1/query_embed, reference_points prefix copy,
class-head slicing, and the `resume_shift_neuron` class rotation.
"""
import numpy as np

from trackformer_tpu.utils.checkpoint import adapt_params

C, C2 = 8, 16


def test_norm_repeat():
    src = {"decoder_layers_0/norm1/scale": np.arange(C, dtype=np.float32)}
    tgt = {"decoder_layers_0/norm1/scale": np.zeros(C2, np.float32)}
    out = adapt_params(src, tgt, verbose=False)
    np.testing.assert_array_equal(
        out["decoder_layers_0/norm1/scale"],
        np.tile(np.arange(C, dtype=np.float32), 2))


def test_attention_repeat_all_dims():
    k = "transformer/decoder_layer_0/self_attn/q_proj/kernel"
    src = {k: np.random.default_rng(0).normal(size=(C, C)).astype(np.float32)}
    tgt = {k: np.zeros((C2, C2), np.float32)}
    out = adapt_params(src, tgt, verbose=False)
    np.testing.assert_array_equal(out[k], np.tile(src[k], (2, 2)))


def test_linear1_and_query_embed_fresh():
    rng = np.random.default_rng(1)
    keys = ["encoder/layer_0/linear1/kernel", "query_embed"]
    src = {keys[0]: rng.normal(size=(C, 32)).astype(np.float32),
           keys[1]: rng.normal(size=(10, C)).astype(np.float32)}
    fresh = {keys[0]: rng.normal(size=(C2, 32)).astype(np.float32),
             keys[1]: rng.normal(size=(10, C2)).astype(np.float32)}
    out = adapt_params(src, dict(fresh), verbose=False)
    for k in keys:  # mismatch -> keep the fresh init (reference :181-184)
        np.testing.assert_array_equal(out[k], fresh[k])


def test_linear2_and_input_proj_repeat_out_axis():
    rng = np.random.default_rng(2)
    lin = "encoder/layer_0/linear2/kernel"       # ours: (ffn_in, C_out)
    conv = "input_proj_0/conv/kernel"            # ours: HWIO
    src = {lin: rng.normal(size=(32, C)).astype(np.float32),
           conv: rng.normal(size=(1, 1, 4, C)).astype(np.float32)}
    tgt = {lin: np.zeros((32, C2), np.float32),
           conv: np.zeros((1, 1, 4, C2), np.float32)}
    out = adapt_params(src, tgt, verbose=False)
    np.testing.assert_array_equal(out[lin], np.tile(src[lin], (1, 2)))
    np.testing.assert_array_equal(out[conv], np.tile(src[conv],
                                                     (1, 1, 1, 2)))


def test_reference_points_prefix():
    k = "reference_points/kernel"  # ours: (C_in, out)
    src = {k: np.ones((C, 2), np.float32)}
    tgt = {k: np.full((C, 4), 5.0, np.float32)}
    out = adapt_params(src, tgt, verbose=False)
    np.testing.assert_array_equal(out[k][:, :2], np.ones((C, 2)))
    np.testing.assert_array_equal(out[k][:, 2:], np.full((C, 2), 5.0))


def test_class_embed_slice():
    k = "class_embed/kernel"  # ours: (C_in, num_classes)
    src = {k: np.arange(C * 92, dtype=np.float32).reshape(C, 92)}
    tgt = {k: np.zeros((C, 21), np.float32)}
    out = adapt_params(src, tgt, verbose=False)
    np.testing.assert_array_equal(out[k], src[k][:, :21])


def test_resume_shift_neuron():
    """Equal shapes: class neurons rotate so label 0 sits at neuron 0
    (reference train.py:214-223: new[:-1]=old[1:], new[-2]=old[0])."""
    n = 5
    kk = "class_embed/kernel"
    kb = "class_embed/bias"
    src = {kk: np.tile(np.arange(n, dtype=np.float32), (C, 1)),
           kb: np.arange(n, dtype=np.float32)}
    tgt = {kk: np.zeros((C, n), np.float32), kb: np.zeros(n, np.float32)}
    out = adapt_params(src, tgt, resume_shift_neuron=True, verbose=False)
    expected = np.array([1, 2, 3, 0, 4], np.float32)
    np.testing.assert_array_equal(out[kb], expected)
    np.testing.assert_array_equal(out[kk], np.tile(expected, (C, 1)))


def test_shift_neuron_off_copies_through():
    kb = "class_embed/bias"
    src = {kb: np.arange(5, dtype=np.float32)}
    tgt = {kb: np.zeros(5, np.float32)}
    out = adapt_params(src, tgt, resume_shift_neuron=False, verbose=False)
    np.testing.assert_array_equal(out[kb], src[kb])
