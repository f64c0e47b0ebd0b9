"""fp32 parity: our VideoMAEModel vs HF VideoMAEModel (torch CPU), including
bool_masked_pos visible-token gathering, plus the balanced-mask op.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
from transformers import VideoMAEConfig, VideoMAEModel as HFVideoMAE  # noqa: E402

from mme_tpu.models.layers import EncoderSpec
from mme_tpu.models.video import TubeletEmbed, VideoMAEModel, VideoMAESpec
from mme_tpu.models.hf_import import convert_videomae
from mme_tpu.ops.video import balanced_keep_mask, gather_visible

ATOL = 3e-5


def _tiny():
    spec = VideoMAESpec(
        image_size=32, patch_size=8, num_frames=4, tubelet_size=2,
        encoder=EncoderSpec(hidden=24, heads=4, layers=2, intermediate=48,
                            ln_style="pre", qkv_bias="qv", ln_eps=1e-12))
    cfg = VideoMAEConfig(
        image_size=32, patch_size=8, num_frames=4, tubelet_size=2,
        hidden_size=24, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=48, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, qkv_bias=True,
        use_mean_pooling=True)
    return spec, cfg


def _video(seed, batch, spec):
    rng = np.random.RandomState(seed)
    return rng.randn(batch, spec.num_frames, spec.image_size,
                     spec.image_size, 3).astype(np.float32)


def test_videomae_parity_unmasked():
    spec, cfg = _tiny()
    torch.manual_seed(4)
    hf = HFVideoMAE(cfg).eval()
    vid = _video(9, 2, spec)
    # HF expects [B, T, C, H, W]
    with torch.no_grad():
        ref = hf(torch.tensor(vid.transpose(0, 1, 4, 2, 3))
                 ).last_hidden_state.numpy()
    params = convert_videomae(hf, spec)
    ours = VideoMAEModel(spec).apply({"params": params}, jnp.asarray(vid))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=ATOL)


def test_videomae_parity_masked():
    """bool_masked_pos path: HF keeps ~masked tokens; we pass the keep-mask
    complement (the reference's convention, models/tav.py:368)."""
    spec, cfg = _tiny()
    torch.manual_seed(5)
    hf = HFVideoMAE(cfg).eval()
    vid = _video(11, 2, spec)
    N = spec.num_patches
    keep_k = N // 3
    rng = np.random.RandomState(0)
    keep = np.zeros((2, N), bool)
    for b in range(2):
        keep[b, rng.choice(N, keep_k, replace=False)] = True
    with torch.no_grad():
        ref = hf(torch.tensor(vid.transpose(0, 1, 4, 2, 3)),
                 bool_masked_pos=torch.tensor(~keep)).last_hidden_state.numpy()
    params = convert_videomae(hf, spec)
    ours = VideoMAEModel(spec).apply({"params": params}, jnp.asarray(vid),
                                     jnp.asarray(keep), keep_k)
    assert ours.shape == (2, keep_k, 24)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=ATOL)


def test_balanced_keep_mask_exact_count():
    rng = jax.random.PRNGKey(3)
    m = balanced_keep_mask(rng, 5, 1568, 104)
    counts = np.asarray(m).sum(axis=1)
    np.testing.assert_array_equal(counts, np.full(5, 104))


def test_gather_visible_preserves_order():
    x = jnp.arange(2 * 6 * 1, dtype=jnp.float32).reshape(2, 6, 1)
    keep = jnp.asarray([[True, False, True, False, True, False],
                        [False, False, True, True, False, True]])
    out = np.asarray(gather_visible(x, keep, 3)).squeeze(-1)
    np.testing.assert_array_equal(out, [[0, 2, 4], [8, 9, 11]])


def test_tubelet_embed_conv2d_matches_matmul_formulation():
    """TubeletEmbed is applied as summed stride-p conv2ds (round 3 — the
    reshape+8D-transpose formulation materialized a 47 GiB/s copy, see
    scripts/patchify_bench.py) but stores the SAME [(t,p,p,C), hidden]
    matmul kernel. Pin equivalence to the matmul formulation."""
    spec = VideoMAESpec(image_size=32, patch_size=16, num_frames=4,
                        tubelet_size=2)
    m = TubeletEmbed(spec)
    v = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 32, 32, 3))
    params = m.init(jax.random.PRNGKey(1), v)
    out = m.apply(params, v)
    k = params["params"]["proj"]["kernel"]
    b = params["params"]["proj"]["bias"]
    assert k.shape == (2 * 16 * 16 * 3, 768)  # HF-import layout unchanged
    B, T, H, W, C = v.shape
    t = p = None
    t, p = 2, 16
    x = v.reshape(B, T // t, t, H // p, p, W // p, p, C)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    x = x.reshape(B, (T // t) * (H // p) * (W // p), t * p * p * C)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x @ k + b),
                               atol=2e-5)
