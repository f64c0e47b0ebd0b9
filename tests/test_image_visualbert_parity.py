"""fp32 parity: ResNet50 vs torchvision; VisualBertForPreTraining vs HF."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from mme_tpu.models.image import ResNet50
from mme_tpu.models.layers import EncoderSpec
from mme_tpu.models.visualbert import (VisualBertForPreTraining,
                                       VisualBertSpec)
from mme_tpu.models.hf_import import (convert_resnet50,
                                      convert_visualbert_pretraining)

ATOL = 1e-4  # deep CNN/12-layer stacks accumulate a bit more fp32 noise


def test_resnet50_parity():
    from transformers import ResNetConfig, ResNetForImageClassification
    cfg = ResNetConfig(embedding_size=64,
                       hidden_sizes=[256, 512, 1024, 2048],
                       depths=[3, 4, 6, 3], layer_type="bottleneck",
                       num_labels=10)
    torch.manual_seed(6)
    hf = ResNetForImageClassification(cfg).eval()
    rng = np.random.RandomState(13)
    x = rng.randn(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.tensor(x.transpose(0, 3, 1, 2))).logits.numpy()
    variables = convert_resnet50(hf)
    variables["params"]["fc"]["kernel"] = \
        variables["params"]["fc"]["kernel"]  # fc imported from classifier.1
    logits, pooled = ResNet50(num_classes=10).apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), train=False)
    assert pooled.shape == (2, 2048)
    np.testing.assert_allclose(np.asarray(logits), ref, atol=ATOL)


def test_visualbert_pretraining_parity():
    from transformers import VisualBertConfig, VisualBertForPreTraining as HFVB
    cfg = VisualBertConfig(
        vocab_size=99, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=40, type_vocab_size=2,
        visual_embedding_dim=20, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, layer_norm_eps=1e-12,
        special_visual_initialize=False)
    spec = VisualBertSpec(
        vocab_size=99, max_positions=40, type_vocab_size=2,
        visual_embedding_dim=20,
        encoder=EncoderSpec(hidden=32, heads=4, layers=2, intermediate=64,
                            ln_style="post", ln_eps=1e-12))
    torch.manual_seed(7)
    hf = HFVB(cfg).eval()

    rng = np.random.RandomState(17)
    B, S, V = 2, 12, 3
    ids = rng.randint(0, 99, size=(B, S))
    mask = np.ones((B, S), np.int64)
    mask[1, 9:] = 0
    tt = np.zeros((B, S), np.int64)
    vis = rng.randn(B, V, 20).astype(np.float32)
    vmask = np.ones((B, V), np.int64)
    vtt = np.ones((B, V), np.int64)

    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(mask),
                 token_type_ids=torch.tensor(tt),
                 visual_embeds=torch.tensor(vis),
                 visual_attention_mask=torch.tensor(vmask),
                 visual_token_type_ids=torch.tensor(vtt)
                 ).prediction_logits.numpy()

    params = convert_visualbert_pretraining(hf, spec)
    ours = VisualBertForPreTraining(spec).apply(
        {"params": params}, jnp.asarray(ids),
        attention_mask=jnp.asarray(mask), token_type_ids=jnp.asarray(tt),
        visual_embeds=jnp.asarray(vis),
        visual_attention_mask=jnp.asarray(vmask),
        visual_token_type_ids=jnp.asarray(vtt))
    # compare at attended positions (text real + all visual)
    keep = np.concatenate([mask, vmask], axis=1).astype(bool)[..., None]
    np.testing.assert_allclose(np.where(keep, np.asarray(ours), 0),
                               np.where(keep, ref, 0), atol=ATOL)
