"""fp32 parity: our Wav2Vec2Model vs HF Wav2Vec2Model (torch CPU), both
feature-extractor norm modes + the conv length/mask formulas.

Covers the reference audio stack: SingleModels/models/audio.py (base model)
and the PreFormer large-model path (models/tav.py:308-342 mask math).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
from transformers import Wav2Vec2Config, Wav2Vec2Model as HFWav2Vec2  # noqa: E402

from mme_tpu.models.audio import Wav2Vec2Model, Wav2Vec2Spec
from mme_tpu.models.layers import EncoderSpec
from mme_tpu.models.hf_import import convert_wav2vec2
from mme_tpu.ops.audio import (conv_output_lengths,
                               feature_vector_attention_mask,
                               masked_mean_pool, spec_augment_mask)

ATOL = 3e-5


def _tiny_cfg(stable: bool):
    return Wav2Vec2Config(
        vocab_size=32,
        hidden_size=24, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=48,
        conv_dim=(8, 8, 8), conv_kernel=(10, 3, 3), conv_stride=(5, 2, 2),
        conv_bias=stable,
        feat_extract_norm="layer" if stable else "group",
        do_stable_layer_norm=stable,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        feat_proj_dropout=0.0, layerdrop=0.0,
        apply_spec_augment=False,
    )


def _tiny_spec(stable: bool):
    return Wav2Vec2Spec(
        conv_dims=(8, 8, 8), conv_kernels=(10, 3, 3), conv_strides=(5, 2, 2),
        conv_bias=stable,
        feat_extract_norm="layer" if stable else "group",
        do_stable_layer_norm=stable,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        encoder=EncoderSpec(hidden=24, heads=4, layers=2, intermediate=48,
                            ln_style="pre" if stable else "post",
                            ln_eps=1e-5, final_ln=stable))


def _wave_inputs(seed, batch, T):
    rng = np.random.RandomState(seed)
    wave = rng.randn(batch, T).astype(np.float32)
    lengths = rng.randint(T // 2, T + 1, size=batch)
    lengths[0] = T  # one full-length row
    mask = (np.arange(T)[None, :] < lengths[:, None]).astype(np.int64)
    return (wave * mask).astype(np.float32), mask


@pytest.mark.parametrize("stable", [False, True])
def test_wav2vec2_parity(stable):
    cfg, spec = _tiny_cfg(stable), _tiny_spec(stable)
    torch.manual_seed(3 + stable)
    hf = HFWav2Vec2(cfg).eval()
    wave, mask = _wave_inputs(5, 2, 400)
    with torch.no_grad():
        ref = hf(torch.tensor(wave),
                 attention_mask=torch.tensor(mask)).last_hidden_state.numpy()

    params = convert_wav2vec2(hf, spec)
    hidden, _, feat_mask = Wav2Vec2Model(spec).apply(
        {"params": params}, jnp.asarray(wave), jnp.asarray(mask))
    fm = np.asarray(feat_mask)[..., None].astype(bool)
    np.testing.assert_allclose(np.where(fm, np.asarray(hidden), 0),
                               np.where(fm, ref, 0), atol=ATOL)


def test_conv_length_formula_matches_hf():
    cfg = _tiny_cfg(False)
    hf = HFWav2Vec2(cfg)
    lens = np.array([400, 181, 57, 10])
    ref = hf._get_feat_extract_output_lengths(torch.tensor(lens)).numpy()
    ours = conv_output_lengths(jnp.asarray(lens),
                               cfg.conv_kernel, cfg.conv_stride)
    np.testing.assert_array_equal(np.asarray(ours), ref)


def test_feature_mask_matches_hf():
    cfg = _tiny_cfg(False)
    hf = HFWav2Vec2(cfg)
    _, mask = _wave_inputs(7, 4, 400)
    feat_len = int(hf._get_feat_extract_output_lengths(torch.tensor(400)))
    ref = hf._get_feature_vector_attention_mask(
        feat_len, torch.tensor(mask)).numpy()
    # full wav2vec2 kernel geometry not needed: pass the tiny one explicitly
    from mme_tpu.ops import audio as audio_ops
    lengths = audio_ops.conv_output_lengths(jnp.asarray(mask).sum(-1),
                                            cfg.conv_kernel, cfg.conv_stride)
    idx = jnp.arange(feat_len)[None, :]
    ours = (idx < lengths[:, None]).astype(np.int64)
    np.testing.assert_array_equal(np.asarray(ours), ref)


def test_masked_mean_pool_matches_ragged_mean():
    rng = np.random.RandomState(0)
    x = rng.randn(3, 10, 4).astype(np.float32)
    lengths = [10, 6, 3]
    mask = (np.arange(10)[None, :] < np.array(lengths)[:, None]).astype(np.int32)
    pooled = masked_mean_pool(jnp.asarray(x), jnp.asarray(mask))
    for b, L in enumerate(lengths):
        np.testing.assert_allclose(np.asarray(pooled)[b], x[b, :L].mean(0),
                                   atol=1e-6)


def test_spec_augment_mask_properties():
    rng = jax.random.PRNGKey(0)
    B, S, p, L = 8, 200, 0.2, 10
    lengths = np.array([200, 200, 150, 150, 100, 100, 50, 20])
    amask = (np.arange(S)[None, :] < lengths[:, None]).astype(np.int32)
    m = np.asarray(spec_augment_mask(rng, B, S, p, L, jnp.asarray(amask),
                                     min_masks=2))
    # never masks padding
    assert not (m & (amask == 0)).any()
    # masked fraction in a sane band around p for long rows
    frac = m[:2].mean()
    assert 0.05 < frac < 0.5
    # spans are contiguous runs of length >= 1; at least min_masks spans fire
    assert m[:6].any(axis=1).all()
