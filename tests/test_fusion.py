"""Shape/behavior tests for the TAV fusion stack (tiny config on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mme_tpu.models.fusion import PreFormer, TAVModel, TAVFormer, TAVSpec
from mme_tpu.ops.video import balanced_keep_mask


@pytest.fixture(scope="module")
def tiny():
    return TAVSpec(output_dim=7).tiny()


def _batch(spec, B=2, T=400, rng=None):
    rng = np.random.RandomState(0 if rng is None else rng)
    key = jax.random.PRNGKey(1)
    text_len = 12
    wave_lens = [T, T // 2]
    return {
        "input_ids": jnp.asarray(
            rng.randint(2, spec.text.vocab_size, size=(B, text_len))),
        "text_mask": jnp.ones((B, text_len), jnp.int32),
        "waveform": jnp.asarray(rng.randn(B, T).astype(np.float32)),
        "audio_mask": jnp.asarray(
            (np.arange(T)[None, :] < np.array(wave_lens)[:, None])
            .astype(np.int32)),
        "video": jnp.asarray(rng.randn(
            B, spec.video.num_frames, spec.video.image_size,
            spec.video.image_size, 3).astype(np.float32)),
        "video_keep": balanced_keep_mask(key, B, spec.video.num_patches,
                                         spec.video_keep_k),
    }


def test_preformer_shapes_and_mask(tiny):
    b = _batch(tiny)
    pf = PreFormer(tiny)
    params = pf.init(jax.random.PRNGKey(0), **b)
    fused, type_ids, keep = pf.apply(params, **b)
    t_len = b["input_ids"].shape[1]
    assert fused.shape[0] == 2 and fused.shape[2] == tiny.hidden
    # modality ids: 0 then 1 then 2, lengths consistent
    ids = np.asarray(type_ids[0])
    assert (ids[:t_len] == 0).all()
    assert ids[-tiny.video_keep_k:].tolist() == [2] * tiny.video_keep_k
    assert fused.shape[1] == type_ids.shape[1] == keep.shape[1]
    # audio part of keep follows the conv-downsampled lengths: row 1 has
    # half the waveform, so fewer attended audio frames than row 0
    a_keep = np.asarray(keep)[:, t_len:-tiny.video_keep_k]
    assert a_keep[1].sum() < a_keep[0].sum()


def test_tav_model_forward_and_grad(tiny):
    b = _batch(tiny)
    model = TAVModel(tiny)
    params = model.init(jax.random.PRNGKey(0), b)
    logits = model.apply(params, b)
    assert logits.shape == (2, 7)
    assert np.isfinite(np.asarray(logits)).all()

    # train mode: dropout + spec-augment rngs, grads flow to every tower
    def loss_fn(p):
        out = model.apply(p, b, deterministic=False,
                          rngs={"dropout": jax.random.PRNGKey(2),
                                "spec_augment": jax.random.PRNGKey(3)})
        return (out ** 2).mean()

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_leaves_with_path(grads)
    nonzero = {jax.tree_util.keystr(k): float(jnp.abs(v).sum())
               for k, v in flat}
    for tower in ["preformer", "model"]:
        total = sum(v for k, v in nonzero.items() if tower in k)
        assert total > 0, f"no gradient reached {tower}"


def test_tavformer_alternative(tiny):
    b = _batch(tiny)
    model = TAVFormer(tiny)
    params = model.init(jax.random.PRNGKey(0), b)
    logits = model.apply(params, b)
    assert logits.shape == (2, 7)
    assert np.isfinite(np.asarray(logits)).all()


def test_padding_invariance(tiny):
    """Masked design contract: extending the audio pad region must not change
    the logits (the reference's numerics depend on batch padding; ours must
    not)."""
    b = _batch(tiny)
    model = TAVModel(tiny)
    params = model.init(jax.random.PRNGKey(0), b)
    logits1 = model.apply(params, b)

    T = b["waveform"].shape[1]
    pad = 57
    b2 = dict(b)
    b2["waveform"] = jnp.pad(b["waveform"], ((0, 0), (0, pad)))
    b2["audio_mask"] = jnp.pad(b["audio_mask"], ((0, 0), (0, pad)))
    logits2 = model.apply(params, b2)
    np.testing.assert_allclose(np.asarray(logits1), np.asarray(logits2),
                               atol=2e-4)
