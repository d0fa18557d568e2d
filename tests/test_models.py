"""Forward smoke tests for every model family (8-way factory matrix plus
encoder modes), tiny configs on CPU."""
import jax
import jax.numpy as jnp

from trackformer_tpu.models import build_model
from trackformer_tpu.structures import FrameBatch, empty_targets
from trackformer_tpu.utils.config import load_config, nested_namespace

TINY = {"enc_layers": 1, "dec_layers": 2, "hidden_dim": 96, "nheads": 4,
        "dim_feedforward": 128, "num_queries": 10, "dataset": "mot"}


def run(named, over=None, with_tq=False):
    cfg = load_config("train.yaml", named, {**TINY, **(over or {})})
    cfg["tpu"]["compute_dtype"] = "float32"
    args = nested_namespace(cfg)
    model, crit_cfg, post, track_cfg = build_model(args)
    rng = jax.random.PRNGKey(0)
    batch = FrameBatch.from_images(
        jax.random.normal(rng, (1, 64, 96, 3)), jnp.array([[60, 90]]))
    targets = None
    if with_tq:
        targets = empty_targets(1, 1).with_track_queries(
            jnp.zeros((1, 4, args.hidden_dim)),
            jnp.full((1, 4, 4), 0.5), jnp.ones((1, 4), bool))
    params = jax.jit(model.init)(rng, batch, targets)
    out = jax.jit(lambda p: model.apply(p, batch, targets,
                                        deterministic=True)[0])(params)
    return args, out


def test_detr_plain():
    args, out = run([])
    assert out["pred_logits"].shape == (1, 10, 21)
    assert out["pred_boxes"].shape == (1, 10, 4)


def test_detr_pre_norm_track_attention():
    _, out = run([], {"pre_norm": True, "track_attention": True},
                 with_tq=True)
    assert out["pred_logits"].shape == (1, 14, 21)


def test_deformable_box_refine():
    _, out = run(["deformable"], {"num_queries": 10})
    assert out["pred_logits"].shape == (1, 10, 20)  # focal: C classes
    assert len(out["aux_outputs"]) == 1


def test_deformable_two_stage():
    _, out = run(["deformable"], {"two_stage": True, "num_queries": 10})
    assert "enc_outputs" in out


def test_deformable_multiframe_track_queries():
    _, out = run(["deformable", "tracking", "multi_frame"],
                 {"num_queries": 10, "hidden_dim": 96, "nheads": 4},
                 with_tq=True)
    assert out["pred_logits"].shape == (1, 14, 20)
    assert bool(jnp.all(jnp.isfinite(out["pred_logits"])))


def test_windowed_encoder_mode():
    _, out = run(["deformable", "tracking", "multi_frame"],
                 {"num_queries": 10, "tpu.encoder_attention": "windowed"},
                 with_tq=True)
    assert out["pred_logits"].shape == (1, 14, 20)
    assert bool(jnp.all(jnp.isfinite(out["pred_logits"])))


def test_segm_masks():
    _, out = run([], {"masks": True, "hidden_dim": 128, "nheads": 8})
    assert out["pred_masks"].shape[:2] == (1, 10)


def test_dense_decoder_mode():
    _, out = run(["deformable", "tracking", "multi_frame"],
                 {"num_queries": 10, "tpu.encoder_attention": "windowed",
                  "tpu.decoder_attention": "dense"}, with_tq=True)
    assert out["pred_logits"].shape == (1, 14, 20)
    assert bool(jnp.all(jnp.isfinite(out["pred_logits"])))


def test_nearest_resize_fast_paths():
    """The fusion resize fast paths (strided slice down / 2x repeat up)
    must match jax.image.resize nearest exactly, and non-exact factors
    must still route through the general path."""
    from trackformer_tpu.models.windowed_encoder import _nearest_resize
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 50, 84, 3))
    for target in [(2, 25, 42, 3),     # exact /2 -> strided slice
                   (2, 100, 168, 3),   # exact x2 -> repeat
                   (2, 13, 21, 3),     # non-exact -> general gather
                   (2, 25, 41, 3)]:    # mixed-exactness -> general
        ours = _nearest_resize(x, target)
        ref = jax.image.resize(x, target, "nearest")
        assert ours.shape == tuple(target)
        assert bool(jnp.all(ours == ref)), target


def test_window_gather_layout_equivalence():
    """The gather-layout windowed encoder (token-permutation row-gathers)
    must produce the same outputs as the transpose-chain layout: the
    permutation encodes exactly roll -> pad -> partition, and all
    window-local math is order-invariant."""
    from trackformer_tpu.models import windowed_encoder as we

    rng = jax.random.PRNGKey(0)
    b, c = 2, 32
    shapes = [(10, 14), (5, 7), (3, 4)]
    keys = jax.random.split(rng, 2 * len(shapes))
    srcs = [jax.random.normal(keys[i], (b, h, w, c))
            for i, (h, w) in enumerate(shapes)]
    poses = [jax.random.normal(keys[len(shapes) + i], (b, h, w, c))
             for i, (h, w) in enumerate(shapes)]
    # image-padding masks (True = pad): last rows/cols padded on item 1
    masks = []
    for h, w in shapes:
        m = jnp.zeros((b, h, w), bool)
        m = m.at[1, h - max(1, h // 4):, :].set(True)
        m = m.at[1, :, w - max(1, w // 4):].set(True)
        masks.append(m)

    enc = we.WindowedEncoder(c, num_layers=2, nheads=4, dim_feedforward=64,
                             window=8)
    prev = we.GATHER_LAYOUT
    try:
        we.GATHER_LAYOUT = False
        params = enc.init(jax.random.PRNGKey(1), srcs, masks, poses)
        out0 = enc.apply(params, srcs, masks, poses)
        we.GATHER_LAYOUT = True
        out1 = enc.apply(params, srcs, masks, poses)
    finally:
        we.GATHER_LAYOUT = prev
    assert out0.shape == out1.shape
    assert bool(jnp.max(jnp.abs(out0 - out1)) < 1e-5), float(
        jnp.max(jnp.abs(out0 - out1)))


def test_nearest_idx_matches_resize():
    """The static 1-D index maps behind the batched cross-level fusion must
    reproduce `_nearest_resize` exactly for every ladder geometry in play:
    exact factor-2 up/down and the odd general cases (25<->13, 13<->7)."""
    import numpy as np

    from trackformer_tpu.models import windowed_encoder as we

    rng = jax.random.PRNGKey(0)
    pairs = [((100, 168), (50, 84)), ((50, 84), (100, 168)),
             ((25, 42), (13, 21)), ((13, 21), (25, 42)),
             ((13, 21), (7, 11)), ((7, 11), (13, 21)),
             ((10, 14), (5, 7)), ((3, 4), (5, 7)), ((5, 7), (3, 4))]
    for (hi, wi), (ho, wo) in pairs:
        x = jax.random.normal(rng, (2, hi, wi, 3))
        want = we._nearest_resize(x, (2, ho, wo, 3))
        r = we._nearest_idx(ho, hi)
        c = we._nearest_idx(wo, wi)
        got = x[:, r][:, :, c]
        assert bool(jnp.all(want == got)), ((hi, wi), (ho, wo))
        assert np.all(r >= 0) and np.all(r < hi)
        assert np.all(c >= 0) and np.all(c < wi)


def test_fused_smallops_equivalence():
    """Batched cross-level fusion + fused q/k projection must (a) create the
    exact same parameter pytree as the per-module formulation and (b) agree
    numerically (float reassociation tolerance only)."""
    from trackformer_tpu.models import attention as att
    from trackformer_tpu.models import windowed_encoder as we

    rng = jax.random.PRNGKey(0)
    b, c = 2, 32
    shapes = [(10, 14), (5, 7), (3, 4)]
    keys = jax.random.split(rng, 2 * len(shapes))
    srcs = [jax.random.normal(keys[i], (b, h, w, c))
            for i, (h, w) in enumerate(shapes)]
    poses = [jax.random.normal(keys[len(shapes) + i], (b, h, w, c))
             for i, (h, w) in enumerate(shapes)]
    masks = []
    for h, w in shapes:
        m = jnp.zeros((b, h, w), bool)
        m = m.at[1, h - max(1, h // 4):, :].set(True)
        masks.append(m)

    enc = we.WindowedEncoder(c, num_layers=2, nheads=4, dim_feedforward=64,
                             window=8)
    prev = (we.FUSION_IMPL, att.QK_FUSED)
    try:
        we.FUSION_IMPL, att.QK_FUSED = "perlevel", False
        params = enc.init(jax.random.PRNGKey(1), srcs, masks, poses)
        out0 = enc.apply(params, srcs, masks, poses)
        we.FUSION_IMPL, att.QK_FUSED = "batched", True
        params1 = enc.init(jax.random.PRNGKey(1), srcs, masks, poses)
        # identical tree structure AND identical leaf values (same init rng
        # folding per path) -> checkpoints interchangeable between impls
        flat0 = jax.tree_util.tree_flatten_with_path(params)
        flat1 = jax.tree_util.tree_flatten_with_path(params1)
        assert [p for p, _ in flat0[0]] == [p for p, _ in flat1[0]]
        assert flat0[1] == flat1[1]
        for (p0, l0), (_, l1) in zip(flat0[0], flat1[0]):
            assert l0.shape == l1.shape and bool(jnp.all(l0 == l1)), p0
        out1 = enc.apply(params, srcs, masks, poses)
    finally:
        we.FUSION_IMPL, att.QK_FUSED = prev
    err = float(jnp.max(jnp.abs(out0 - out1)))
    assert err < 1e-5, err
