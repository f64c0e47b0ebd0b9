"""fp32 logit parity: our TextEncoder vs HF RobertaModel/BertModel (torch CPU).

This is the BASELINE.json quality contract ("output logits to fp32 tolerance
for each ported encoder"). Uses tiny random-initialized HF configs — no
network access needed.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from mme_tpu.models.layers import EncoderSpec
from mme_tpu.models.text import TextEncoder, TextEncoderSpec
from mme_tpu.models.hf_import import convert_text_encoder

ATOL = 2e-5


def _tiny_spec(position_style, type_vocab, pad_id, ln_eps):
    return TextEncoderSpec(
        vocab_size=97, max_positions=40, type_vocab_size=type_vocab,
        pad_token_id=pad_id, position_style=position_style,
        encoder=EncoderSpec(hidden=32, heads=4, layers=3, intermediate=64,
                            ln_style="post", ln_eps=ln_eps))


def _inputs(seed, batch, seq, vocab, pad_id):
    rng = np.random.RandomState(seed)
    ids = rng.randint(0, vocab, size=(batch, seq))
    lengths = rng.randint(seq // 2, seq + 1, size=batch)
    mask = (np.arange(seq)[None, :] < lengths[:, None]).astype(np.int64)
    ids = np.where(mask == 1, ids, pad_id)
    return ids, mask


def test_roberta_parity():
    from transformers import RobertaConfig, RobertaModel
    spec = _tiny_spec("roberta", 1, 1, 1e-5)
    cfg = RobertaConfig(
        vocab_size=97, hidden_size=32, num_hidden_layers=3,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=40, type_vocab_size=1, pad_token_id=1,
        layer_norm_eps=1e-5, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    hf = RobertaModel(cfg).eval()

    ids, mask = _inputs(1, 3, 24, 97, pad_id=1)
    with torch.no_grad():
        out = hf(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(mask))
    ref_seq = out.last_hidden_state.numpy()
    ref_pool = out.pooler_output.numpy()

    params = convert_text_encoder(hf, spec)
    model = TextEncoder(spec)
    seq, pool = model.apply({"params": params}, jnp.asarray(ids),
                            jnp.asarray(mask))
    # only non-pad positions are contractually meaningful
    m = mask[..., None].astype(bool)
    np.testing.assert_allclose(np.where(m, np.asarray(seq), 0),
                               np.where(m, ref_seq, 0), atol=ATOL)
    np.testing.assert_allclose(np.asarray(pool), ref_pool, atol=ATOL)


def test_bert_parity_with_token_types():
    from transformers import BertConfig, BertModel
    spec = _tiny_spec("bert", 2, 0, 1e-12)
    cfg = BertConfig(
        vocab_size=97, hidden_size=32, num_hidden_layers=3,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=40, type_vocab_size=2, pad_token_id=0,
        layer_norm_eps=1e-12, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0)
    torch.manual_seed(1)
    hf = BertModel(cfg).eval()

    ids, mask = _inputs(2, 2, 16, 97, pad_id=0)
    tt = (np.arange(16)[None, :] >= 8).astype(np.int64) * np.ones((2, 1), np.int64)
    with torch.no_grad():
        out = hf(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(mask),
                 token_type_ids=torch.tensor(tt))
    params = convert_text_encoder(hf, spec)
    seq, pool = TextEncoder(spec).apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(mask),
        jnp.asarray(tt))
    m = mask[..., None].astype(bool)
    np.testing.assert_allclose(np.where(m, np.asarray(seq), 0),
                               np.where(m, out.last_hidden_state.numpy(), 0),
                               atol=ATOL)
    np.testing.assert_allclose(np.asarray(pool), out.pooler_output.numpy(),
                               atol=ATOL)


def test_embed_only_matches_hf_embeddings():
    """PreFormer uses the embedding stage alone (models/tav.py:349)."""
    from transformers import RobertaConfig, RobertaModel
    spec = _tiny_spec("roberta", 1, 1, 1e-5)
    cfg = RobertaConfig(
        vocab_size=97, hidden_size=32, num_hidden_layers=1,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=40, type_vocab_size=1, pad_token_id=1,
        layer_norm_eps=1e-5, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0)
    spec = TextEncoderSpec(vocab_size=97, max_positions=40,
                           type_vocab_size=1, pad_token_id=1,
                           position_style="roberta",
                           encoder=EncoderSpec(hidden=32, heads=4, layers=1,
                                               intermediate=64,
                                               ln_style="post", ln_eps=1e-5))
    torch.manual_seed(2)
    hf = RobertaModel(cfg).eval()
    ids, mask = _inputs(3, 2, 12, 97, pad_id=1)
    with torch.no_grad():
        ref = hf.embeddings(input_ids=torch.tensor(ids)).numpy()
    from mme_tpu.models.text import text_embed_only
    params = convert_text_encoder(hf, spec)
    emb = text_embed_only(spec, params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(emb), ref, atol=ATOL)
